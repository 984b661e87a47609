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

    def test_holocine_shot_splitting(self, tmp_path):
        eng = _engine(tmp_path, "holocine")
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        frames = eng.run(
            image=img, prompt="wide shot | close up", height=32, width=32,
            num_frames=17, num_frames_per_segment=9, num_inference_steps=2,
            guidance_scale=1.0, seed=5,
        )
        assert len(frames) == 17
