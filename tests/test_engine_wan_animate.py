"""Wan Animate model + engine on tiny weights (reference:
src/engine/wan/animate.py, src/transformer/wan/animate/model.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer

_TF_CFG = {
    "in_channels": 10,  # 4 noise + 2 mask + 4 cond (tiny z=4, t_scale=2)
    "out_channels": 4,
    "num_attention_heads": 2, "attention_head_dim": 12,
    "text_dim": 32, "freq_dim": 32, "ffn_dim": 48, "num_layers": 2,
    "image_dim": 16,
    "motion_encoder_size": 32, "motion_style_dim": 16, "motion_dim": 4,
    "motion_encoder_dim": 16, "face_encoder_hidden_dim": 8,
    "face_encoder_num_heads": 2, "inject_face_latents_blocks": 2,
}


def _engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    doc["metadata"]["id"] = "wan-animate-tiny"
    doc["spec"]["model_type"] = "animate"
    comps = doc["spec"]["components"]
    comps[:] = [c for c in comps if c["type"] != "transformer"]
    comps.append({"type": "transformer", "base": "wan.animate",
                  "config": dict(_TF_CFG)})
    comps.append({"type": "helper", "name": "image_encoder",
                  "base": "CLIPVisionModel",
                  "config": {"hidden_size": 16, "intermediate_size": 32,
                             "num_hidden_layers": 2, "num_attention_heads": 2,
                             "image_size": 28, "patch_size": 14}})
    path = tmp_path / "wan-animate.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestAnimateModel:
    def _model(self):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.wan_animate import (
            WanAnimateConfig,
            WanAnimateTransformer3DModel,
        )

        cfg = WanAnimateConfig(**_TF_CFG)
        return WanAnimateTransformer3DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def _inputs(self, t_lat=3):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        j = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
        x = j(1, 10, t_lat + 1, 8, 8)  # slot 0 = reference
        text = j(1, 5, 32)
        img = j(1, 3, 16)
        pose = j(1, 4, t_lat, 8, 8)
        # face frames: stride-4 causal stack maps 4·t_lat frames → t_lat
        face = j(1, 3, 4 * t_lat, 32, 32)
        return x, text, img, pose, face

    def test_forward_shape(self):
        import jax.numpy as jnp

        m = self._model()
        x, text, img, pose, face = self._inputs()
        out = m(x, jnp.full((1,), 500.0), text, img, pose, face)
        assert out.shape == x.shape[:1] + (4,) + x.shape[2:]

    def test_face_and_pose_condition(self):
        import jax.numpy as jnp

        m = self._model()
        x, text, img, pose, face = self._inputs()
        t = jnp.full((1,), 500.0)
        base = m(x, t, text, img, pose, face)
        other_face = m(x, t, text, img, pose, face * 0.5)
        other_pose = m(x, t, text, img, pose * 2.0, face)
        no_face = m(x, t, text, img, pose, None)
        assert not np.allclose(np.asarray(base), np.asarray(other_face))
        assert not np.allclose(np.asarray(base), np.asarray(other_pose))
        assert not np.allclose(np.asarray(base), np.asarray(no_face))

    def test_motion_encoder_orthobasis(self):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.wan_animate import (
            WanAnimateConfig,
            WanAnimateMotionEncoder,
        )

        cfg = WanAnimateConfig(**_TF_CFG)
        enc = WanAnimateMotionEncoder(cfg, rngs=nnx.Rngs(0))
        rng = np.random.default_rng(1)
        faces = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        vec = enc(faces)
        assert vec.shape == (2, 16)


class TestAnimateEngine:
    def test_animate_segments(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        pose = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
                for _ in range(9)]
        face = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
                for _ in range(9)]
        frames = eng.run(
            image=img, pose_video=pose, face_video=face,
            prompt="a dancer", height=32, width=32,
            segment_frame_length=5, prev_segment_conditioning_frames=1,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 9
        assert frames[0].shape == (32, 32, 3)

    def test_replace_mode(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        pose = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
                for _ in range(5)]
        face = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
                for _ in range(5)]
        bg = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
              for _ in range(5)]
        mask = [np.full((32, 32), 255, np.uint8) for _ in range(5)]
        frames = eng.run(
            image=img, pose_video=pose, face_video=face,
            background_video=bg, mask_video=mask, mode="replace",
            prompt="replace subject", height=32, width=32,
            segment_frame_length=5, num_inference_steps=1,
            guidance_scale=1.0, seed=4,
        )
        assert len(frames) == 5
