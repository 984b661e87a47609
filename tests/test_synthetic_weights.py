"""APEX_SYNTHETIC_WEIGHTS: the engine builds components abstractly and
materializes random weights on device (bench_e2e.py's load path) — the full
run must work end-to-end without any checkpoint files."""

import numpy as np
import pytest


def test_tiny_zimage_runs_with_synthetic_weights(tmp_path, monkeypatch):
    import yaml

    from tests.test_engine_zimage import TINY_MANIFEST, make_tokenizer

    monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
    monkeypatch.setenv("APEX_SYNTHETIC_WEIGHTS", "bf16")
    p = tmp_path / "z.yml"
    p.write_text(yaml.safe_dump(TINY_MANIFEST))

    from apex_studio_tpu.engine.registry import UniversalEngine

    engine = UniversalEngine(str(p), model_type="t2i")
    spec = engine._spec_for_type("text_encoder")
    spec["tokenizer"] = make_tokenizer()
    frames = engine.run(prompt="a cat", height=32, width=32,
                        num_inference_steps=2, seed=0)
    assert len(frames) == 1
    assert frames[0].shape == (32, 32, 3)
    assert np.all(np.isfinite(frames[0]))


def test_release_text_encoders_reencode_uses_disk_cache(tmp_path, monkeypatch):
    """After release_text_encoders a repeat prompt must NOT rebuild the
    encoder (disk cache hit) — the staged-memory invariant bench_e2e and
    single-chip serving rely on."""
    import yaml

    from tests.test_engine_zimage import TINY_MANIFEST, make_tokenizer

    monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
    monkeypatch.setenv("APEX_SYNTHETIC_WEIGHTS", "bf16")
    p = tmp_path / "z.yml"
    p.write_text(yaml.safe_dump(TINY_MANIFEST))

    from apex_studio_tpu.engine.registry import UniversalEngine

    engine = UniversalEngine(str(p), model_type="t2i")
    spec = engine._spec_for_type("text_encoder")
    spec["tokenizer"] = make_tokenizer()
    engine.run(prompt="a cat", height=32, width=32, num_inference_steps=1, seed=0)
    engine.release_text_encoders()
    assert engine.text_encoder.model is None
    # identical prompt → disk-cache hit → no rebuild
    engine.run(prompt="a cat", height=32, width=32, num_inference_steps=1, seed=0)
    assert engine.text_encoder.model is None
