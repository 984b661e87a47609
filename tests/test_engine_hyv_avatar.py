"""HunyuanVideo Avatar on tiny random weights (reference
src/engine/hunyuanvideo/avatar.py, src/transformer/hunyuanvideo/avatar/
model.py, src/helpers/hunyuanvideo/avatar.py)."""

import copy

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_hunyuanvideo import HYV_ORIG_TINY
from tests.test_engine_zimage import make_tokenizer

AVATAR_CFG = {
    "in_channels": 4, "out_channels": 4, "num_attention_heads": 2,
    "attention_head_dim": 24, "num_layers": 2, "num_single_layers": 1,
    "num_refiner_layers": 1, "mlp_ratio": 2.0, "patch_size": 2,
    "patch_size_t": 1, "text_embed_dim": 32, "pooled_projection_dim": 24,
    "rope_axes_dim": [8, 8, 8],
    "audio_seq_len": 4, "audio_blocks": 2, "audio_channels": 6,
    "audio_intermediate_dim": 16, "audio_output_dim": 48,
    "audio_context_tokens": 4, "double_stream_list": [1],
}


def _avatar_manifest():
    m = copy.deepcopy(HYV_ORIG_TINY)
    m["metadata"]["id"] = "hyv-avatar-tiny-test"
    m["spec"]["model_type"] = "avatar"
    tf = next(c for c in m["spec"]["components"] if c["type"] == "transformer")
    tf["base"] = "hunyuanvideo.avatar"
    tf["config"] = dict(AVATAR_CFG)
    return m


class TestAvatarModel:
    def test_forward_shapes_with_audio_and_facemask(self):
        from apex_studio_tpu.models.transformers.hunyuanvideo_avatar import (
            HunyuanAvatarConfig, HunyuanAvatarVideoModel)

        cfg = HunyuanAvatarConfig.from_dict(AVATAR_CFG)
        cfg.double_stream_list = (1,)
        m = HunyuanAvatarVideoModel(cfg, dtype=jnp.float32,
                                    param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 3, 8, 8)), jnp.float32)
        ref = jnp.asarray(rng.normal(size=(1, 4, 3, 8, 8)), jnp.float32)
        audio = jnp.asarray(rng.normal(size=(1, 9, 4, 2, 6)), jnp.float32)
        out = m(x, jnp.ones((1,)) * 500.0,
                jnp.asarray(rng.normal(size=(1, 5, 32)), jnp.float32),
                text_mask=jnp.ones((1, 5)),
                pooled=jnp.zeros((1, 24)),
                guidance=jnp.ones((1,)) * 6000.0,
                ref_latents=ref, audio=audio,
                face_mask=jnp.ones((1, 1, 1, 8, 8)),
                motion_exp=jnp.full((1, 4), 30.0),
                motion_pose=jnp.full((1, 4), 25.0),
                fps=jnp.full((1,), 25.0))
        assert out.shape == (1, 4, 3, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_zero_init_adapter_is_noop_on_audio(self):
        """to_out zero-init (model.py:180): with random weights elsewhere,
        changing the audio features must not change the output."""
        from apex_studio_tpu.models.transformers.hunyuanvideo_avatar import (
            HunyuanAvatarConfig, HunyuanAvatarVideoModel)

        cfg = HunyuanAvatarConfig.from_dict(AVATAR_CFG)
        cfg.double_stream_list = (1,)
        m = HunyuanAvatarVideoModel(cfg, dtype=jnp.float32,
                                    param_dtype=jnp.float32, rngs=nnx.Rngs(1))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        ref = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        txt = jnp.asarray(rng.normal(size=(1, 4, 32)), jnp.float32)
        kw = dict(text_mask=jnp.ones((1, 4)), pooled=jnp.zeros((1, 24)),
                  ref_latents=ref, fps=jnp.full((1,), 25.0))
        a1 = jnp.zeros((1, 5, 4, 2, 6))
        a2 = jnp.asarray(rng.normal(size=(1, 5, 4, 2, 6)), jnp.float32)
        o1 = m(x, jnp.ones((1,)) * 400.0, txt, audio=a1, **kw)
        o2 = m(x, jnp.ones((1,)) * 400.0, txt, audio=a2, **kw)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    def test_timecat_rope_has_ref_prefix(self):
        from apex_studio_tpu.models.transformers.hunyuanvideo_avatar import (
            HunyuanAvatarConfig, HunyuanAvatarVideoModel)

        cfg = HunyuanAvatarConfig.from_dict(AVATAR_CFG)
        m = HunyuanAvatarVideoModel(cfg, rngs=nnx.Rngs(0))
        cos, _ = m.rope_tables(3, 4, 4)
        # 1 ref frame + 3 frames of 4×4 tokens
        assert cos.shape[1] == 4 * 4 * 4


class TestAvatarEngine:
    def test_windowed_generation(self, tmp_path):
        path = tmp_path / "avatar.yml"
        path.write_text(yaml.safe_dump(_avatar_manifest()))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="avatar")
        for name in ("text_encoder", "text_encoder_2"):
            spec = eng.component_specs.get(name)
            if spec is not None:
                spec["tokenizer"] = make_tokenizer()
        img = np.full((32, 32, 3), 127, np.uint8)
        frames = eng.run(
            image=img, prompt="talking head", height=32, width=32,
            num_frames=9, fps=25.0, num_inference_steps=2,
            guidance_scale=2.0, frame_per_batch=3, shift_offset=1, seed=0)
        assert len(frames) >= 9
        assert frames[0].shape == (32, 32, 3)

    def test_waveform_audio_input_and_latents(self, tmp_path):
        path = tmp_path / "avatar2.yml"
        path.write_text(yaml.safe_dump(_avatar_manifest()))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="avatar")
        for name in ("text_encoder", "text_encoder_2"):
            spec = eng.component_specs.get(name)
            if spec is not None:
                spec["tokenizer"] = make_tokenizer()
        img = np.full((32, 32, 3), 80, np.uint8)
        wav = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
        lat = eng.run(
            image=img, audio=(wav, 16000), prompt="sings", height=32,
            width=32, num_frames=5, fps=25.0, num_inference_steps=1,
            guidance_scale=1.0, negative_prompt=None, frame_per_batch=3,
            shift_offset=1, seed=1, return_latents=True)
        lat = np.asarray(lat)
        assert lat.shape[0] == 1 and lat.shape[1] == 4
        assert np.isfinite(lat).all()
