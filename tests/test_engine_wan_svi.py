"""Wan SVI (stable infinite video) + Holocine multi-shot engines on tiny
weights (reference: src/engine/wan/svi.py, holocine.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer


def _engine(tmp_path, model_type):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    doc["metadata"]["id"] = f"wan-{model_type}-tiny"
    doc["spec"]["model_type"] = model_type
    tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
    tf["config"]["in_channels"] = 10  # 4 noise + 2 mask + 4 cond latents
    tf["config"]["image_dim"] = 16
    tf["config"]["added_kv_proj_dim"] = 48
    doc["spec"]["components"].append(
        {"type": "helper", "name": "image_encoder", "base": "CLIPVisionModel",
         "config": {"hidden_size": 16, "intermediate_size": 32,
                    "num_hidden_layers": 2, "num_attention_heads": 2,
                    "image_size": 28, "patch_size": 14}})
    path = tmp_path / f"wan-{model_type}.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestSVI:
    def test_multi_segment_generation(self, tmp_path):
        eng = _engine(tmp_path, "svi")
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        frames = eng.run(
            image=img, prompts=["sunrise", "sunset"], height=32, width=32,
            num_frames=17, num_frames_per_segment=9, num_inference_steps=2,
            guidance_scale=1.0, seed=3, num_overlap_frames=2,
        )
        assert len(frames) == 17
        assert all(f.shape == (32, 32, 3) for f in frames)

    def test_holocine_joint_multishot(self, tmp_path):
        """Joint multi-shot denoise: reference prompt structure, per-shot
        cross-attention routing, per-shot token embeddings."""
        doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
        doc["metadata"]["id"] = "wan-holocine-tiny"
        doc["spec"]["model_type"] = "holocine"
        tf = next(c for c in doc["spec"]["components"]
                  if c["type"] == "transformer")
        tf["base"] = "wan.holocine"
        path = tmp_path / "wan-holocine.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path)
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        frames = eng.run(
            global_caption="a scene", shot_captions=["wide shot", "close up"],
            height=32, width=32, num_frames=17, num_inference_steps=2,
            guidance_scale=1.0, seed=5,
        )
        assert len(frames) == 17

        # prompt/cut preparation contract (holocine.py prepare_multishot_inputs)
        prompt, cuts = eng.prepare_multishot_inputs("a scene", ["a", "b"], 17)
        assert prompt.startswith("[global caption] a scene This scene contains 2 shots.")
        assert "[per shot caption] a [shot cut] b" in prompt
        assert cuts == [8]

    def test_holocine_shot_mask_channel(self, tmp_path):
        doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
        doc["metadata"]["id"] = "wan-holocine-mask-tiny"
        doc["spec"]["model_type"] = "holocine"
        tf = next(c for c in doc["spec"]["components"]
                  if c["type"] == "transformer")
        tf["base"] = "wan.holocine"
        tf["config"] = dict(tf["config"])
        tf["config"]["in_channels"] = 5  # 4 latent + 1 shot-mask channel
        path = tmp_path / "wan-holocine-mask.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path)
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        lat = eng.run(
            shot_captions=["shot one", "shot two"], prompt="scene",
            shot_mask_type="normalized", height=32, width=32, num_frames=17,
            num_inference_steps=2, guidance_scale=1.5, seed=6,
            return_latents=True,
        )
        assert np.isfinite(np.asarray(lat)).all()
