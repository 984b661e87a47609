"""Wan Phantom (subject reference) + Fun-Control engines on tiny weights
(reference: src/engine/wan/phantom.py, fun_control.py; transformer
src/transformer/wan/fun/model.py subject-ref path)."""

import copy

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer


def _manifest(model_type, in_channels=4):
    m = copy.deepcopy(WAN_TINY)
    m["metadata"]["id"] = f"wan-{model_type}-tiny-test"
    m["spec"]["model_type"] = model_type
    tf = next(c for c in m["spec"]["components"] if c["type"] == "transformer")
    tf["base"] = "wan.fun"
    tf["config"]["in_channels"] = in_channels
    return m


def _engine(tmp_path_factory, model_type, in_channels=4):
    path = tmp_path_factory.mktemp("m") / f"wan-{model_type}.yml"
    path.write_text(yaml.safe_dump(_manifest(model_type, in_channels)))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestPhantom:
    def test_subject_refs_condition_generation(self, tmp_path_factory):
        eng = _engine(tmp_path_factory, "phantom")
        rng = np.random.default_rng(0)
        ref = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        common = dict(prompt="same cat", height=32, width=32, num_frames=5,
                      num_inference_steps=2, guidance_scale=1.0, seed=1,
                      return_latents=True)
        with_ref = np.asarray(eng.run(subject_reference_images=[ref], **common))
        without = np.asarray(eng.run(**common))
        assert with_ref.shape == without.shape
        assert np.abs(with_ref - without).max() > 1e-5
        assert np.isfinite(with_ref).all()

    def test_multiple_refs(self, tmp_path_factory):
        eng = _engine(tmp_path_factory, "phantom")
        rng = np.random.default_rng(1)
        refs = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
                for _ in range(2)]
        frames = eng.run(prompt="two subjects", subject_reference_images=refs,
                         height=32, width=32, num_frames=5,
                         num_inference_steps=2, guidance_scale=2.0, seed=0)
        assert len(frames) == 5 and frames[0].shape == (32, 32, 3)


class TestFunControl:
    def test_control_video_channel_concat(self, tmp_path_factory):
        # in_channels = noise z (4) + control z (4)
        eng = _engine(tmp_path_factory, "fun_control", in_channels=8)
        rng = np.random.default_rng(2)
        ctl = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
               for _ in range(5)]
        lat = eng.run(prompt="follow the pose", control_video=ctl,
                      height=32, width=32, num_frames=5,
                      num_inference_steps=2, guidance_scale=1.0, seed=3,
                      return_latents=True)
        lat = np.asarray(lat)
        assert lat.shape[1] == 4  # output is the noise stream only
        assert np.isfinite(lat).all()

    def test_with_reference_image(self, tmp_path_factory):
        eng = _engine(tmp_path_factory, "fun_control", in_channels=8)
        rng = np.random.default_rng(3)
        ctl = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
               for _ in range(5)]
        ref = np.full((32, 32, 3), 80, np.uint8)
        frames = eng.run(prompt="styled", control_video=ctl, ref_image=ref,
                        height=32, width=32, num_frames=5,
                        num_inference_steps=2, guidance_scale=2.0, seed=4)
        assert len(frames) == 5


class TestWanFunSubject:
    def test_fun_start_end_and_subject_refs(self, tmp_path, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        import yaml

        # noise z(4) + control(4) + start block(4) = 12 in_channels
        doc = _manifest("fun", in_channels=12)
        path = tmp_path / "fun.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(str(path))
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        start = np.full((32, 32, 3), 40, np.uint8)
        end = np.full((32, 32, 3), 200, np.uint8)
        refs = [np.full((32, 32, 3), 90, np.uint8)]
        lat = eng.run(prompt="subject", start_image=start, end_image=end,
                      subject_reference_images=refs, height=32, width=32,
                      num_frames=5, num_inference_steps=2, guidance_scale=1.0,
                      seed=0, return_latents=True)
        assert np.isfinite(np.asarray(lat)).all()
