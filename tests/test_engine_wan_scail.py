"""Wan SCAIL model + engine on tiny weights (reference:
src/engine/wan/scail.py, src/transformer/wan/scail/model.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer

_TF_CFG = {
    "in_dim": 6,  # 4 latents + 2 mask channels (tiny z=4)
    "dim": 24, "ffn_dim": 48, "freq_dim": 32, "text_dim": 32, "text_len": 8,
    "out_dim": 4, "num_heads": 2, "num_layers": 2, "image_dim": 16,
    "pose_rope_shift": [0, 64, 64],
}


def _engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    doc["metadata"]["id"] = "wan-scail-tiny"
    doc["spec"]["model_type"] = "scail"
    comps = doc["spec"]["components"]
    comps[:] = [c for c in comps if c["type"] != "transformer"]
    comps.append({"type": "transformer", "base": "wan.scail",
                  "config": dict(_TF_CFG)})
    comps.append({"type": "helper", "name": "image_encoder",
                  "base": "CLIPVisionModel",
                  "config": {"hidden_size": 16, "intermediate_size": 32,
                             "num_hidden_layers": 2, "num_attention_heads": 2,
                             "image_size": 28, "patch_size": 14}})
    path = tmp_path / "wan-scail.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestScailModel:
    def _model(self):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.wan_scail import (
            SCAILModel,
            WanScailConfig,
        )

        cfg = WanScailConfig(**_TF_CFG)
        return SCAILModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                          rngs=nnx.Rngs(0))

    def _inputs(self, t_lat=3):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        j = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
        x = j(1, 4, t_lat, 8, 8)
        ctx = j(1, 5, 32)
        pose = j(1, 4, t_lat, 4, 4)
        ref = j(1, 4, 1, 8, 8)
        clip = j(1, 3, 16)
        return x, ctx, pose, ref, clip

    def test_forward_shape(self):
        import jax.numpy as jnp

        m = self._model()
        x, ctx, pose, ref, clip = self._inputs()
        out = m(x, jnp.full((1,), 500.0), ctx, pose, ref, clip)
        assert out.shape == (1, 4, 3, 8, 8)

    def test_pose_and_reference_condition(self):
        import jax.numpy as jnp

        m = self._model()
        x, ctx, pose, ref, clip = self._inputs()
        t = jnp.full((1,), 500.0)
        base = m(x, t, ctx, pose, ref, clip)
        other_pose = m(x, t, ctx, pose * 2.0, ref, clip)
        other_ref = m(x, t, ctx, pose, ref * 2.0, clip)
        shifted = m(x, t, ctx, pose, ref, clip, rope_t_shift=3)
        assert not np.allclose(np.asarray(base), np.asarray(other_pose))
        assert not np.allclose(np.asarray(base), np.asarray(other_ref))
        assert not np.allclose(np.asarray(base), np.asarray(shifted))

    def test_downsampled_rope_tables(self):
        m = self._model()
        cos, sin = m.rope_tables(2, 4, 4)
        # ref (1·4·4) + video (2·4·4) + pose (2·2·2)
        assert cos.shape[1] == 16 + 32 + 8


class TestScailEngine:
    def test_pose_driven_generation(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        pose = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
                for _ in range(5)]
        frames = eng.run(
            image=img, pose_video=pose, prompt="a dancer",
            height=32, width=32, num_inference_steps=2, guidance_scale=1.0,
            seed=3,
        )
        assert len(frames) == 5
        assert frames[0].shape == (32, 32, 3)
