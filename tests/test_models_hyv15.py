import numpy as np
import pytest

import jax
import jax.numpy as jnp

from apex_studio_tpu.models.text_encoders.qwen2 import Qwen2Config, Qwen2TextEncoder
from apex_studio_tpu.models.transformers.hunyuanvideo15 import (
    HYV15Config,
    HunyuanVideo15Transformer3DModel,
)
from apex_studio_tpu.models.vaes.hunyuanvideo15_vae import (
    AutoencoderKLHunyuanVideo15,
    HYV15VAEConfig,
)


@pytest.fixture(scope="module")
def tiny_hyv():
    cfg = HYV15Config(
        in_channels=9,  # 4 noise + 4 cond + 1 mask
        out_channels=4,
        num_attention_heads=2,
        attention_head_dim=24,
        num_layers=2,
        num_refiner_layers=1,
        mlp_ratio=2.0,
        text_embed_dim=32,
        text_embed_2_dim=16,
        image_embed_dim=16,
        rope_axes_dim=(8, 8, 8),
    )
    return HunyuanVideo15Transformer3DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_hyv_vae():
    cfg = HYV15VAEConfig(
        latent_channels=4,
        block_out_channels=(8, 16, 32),
        layers_per_block=1,
        spatial_compression_ratio=4,
        temporal_compression_ratio=2,
        scaling_factor=1.0,
    )
    return AutoencoderKLHunyuanVideo15(cfg)


class TestHYV15Transformer:
    def _inputs(self, cfg, b=1, t=2, h=4, w=4, lt=8, lb=4, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        x = jax.random.normal(ks[0], (b, cfg.in_channels, t, h, w))
        text = jax.random.normal(ks[1], (b, lt, cfg.text_embed_dim))
        text2 = jax.random.normal(ks[2], (b, lb, cfg.text_embed_2_dim))
        tt = jnp.full((b,), 500.0)
        mask = jnp.ones((b, lt), jnp.int32)
        mask2 = jnp.ones((b, lb), jnp.int32)
        return x, tt, text, mask, text2, mask2

    def test_forward_shape(self, tiny_hyv):
        x, t, text, mask, text2, mask2 = self._inputs(tiny_hyv.cfg)
        out = tiny_hyv(x, t, text, mask, text2, mask2)
        assert out.shape == (1, 4, 2, 4, 4)

    def test_text_conditioning(self, tiny_hyv):
        x, t, text, mask, text2, mask2 = self._inputs(tiny_hyv.cfg)
        a = tiny_hyv(x, t, text, mask, text2, mask2)
        b = tiny_hyv(x, t, text * 2 + 1, mask, text2, mask2)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5

    def test_glyph_conditioning(self, tiny_hyv):
        x, t, text, mask, text2, mask2 = self._inputs(tiny_hyv.cfg)
        a = tiny_hyv(x, t, text, mask, text2, mask2)
        # NB: the byT5 branch starts with LayerNorm, so affine changes (3x+1)
        # are invariant — use genuinely different features.
        other = jax.random.normal(jax.random.PRNGKey(99), text2.shape)
        b = tiny_hyv(x, t, text, mask, other, mask2)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5

    def test_image_embeds_optional(self, tiny_hyv):
        x, t, text, mask, text2, mask2 = self._inputs(tiny_hyv.cfg)
        img = jax.random.normal(jax.random.PRNGKey(9), (1, 4, tiny_hyv.cfg.image_embed_dim))
        out = tiny_hyv(x, t, text, mask, text2, mask2, image_embeds=img)
        assert np.isfinite(np.asarray(out)).all()


class TestHYV15VAE:
    def test_encode_shapes(self, tiny_hyv_vae):
        # 3 frames, temporal 2x (one temporal stage) → 2 latent frames; spatial /4.
        video = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 3, 16, 16))
        z = tiny_hyv_vae.encode(video)
        assert z.shape == (1, 4, 2, 4, 4)

    def test_decode_shapes(self, tiny_hyv_vae):
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 4, 4))
        video = tiny_hyv_vae.decode(z)
        assert video.shape == (1, 3, 3, 16, 16)

    def test_single_frame(self, tiny_hyv_vae):
        img = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 1, 16, 16))
        z = tiny_hyv_vae.encode(img)
        assert z.shape == (1, 4, 1, 4, 4)
        out = tiny_hyv_vae.decode(z)
        assert out.shape == (1, 3, 1, 16, 16)

    def test_causality(self, tiny_hyv_vae):
        v1 = jnp.zeros((1, 3, 5, 16, 16))
        v2 = v1.at[:, :, 4].set(1.0)
        z1 = np.asarray(tiny_hyv_vae.encode(v1))
        z2 = np.asarray(tiny_hyv_vae.encode(v2))
        np.testing.assert_allclose(z1[:, :, 0], z2[:, :, 0], atol=1e-5)


class TestQwen2Encoder:
    @pytest.fixture(scope="class")
    def tiny_qwen2(self):
        cfg = Qwen2Config(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        )
        return Qwen2TextEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)

    def test_forward_shape(self, tiny_qwen2):
        out = tiny_qwen2(jnp.arange(8)[None] % 64)
        assert out.shape == (1, 8, 32)

    def test_skip_layers_changes_output(self, tiny_qwen2):
        ids = jnp.arange(8)[None] % 64
        a = np.asarray(tiny_qwen2(ids, num_hidden_layers_to_skip=0))
        b = np.asarray(tiny_qwen2(ids, num_hidden_layers_to_skip=2))
        assert np.abs(a - b).max() > 1e-6

    def test_text_config_nesting(self):
        cfg = Qwen2Config.from_dict(
            {"text_config": {"hidden_size": 16, "num_attention_heads": 2,
                             "num_key_value_heads": 2, "num_hidden_layers": 1,
                             "intermediate_size": 32, "vocab_size": 32}}
        )
        assert cfg.hidden_size == 16


class TestGlyphExtraction:
    def test_extracts_quoted(self):
        from apex_studio_tpu.engine.hunyuanvideo15 import extract_glyph_text

        assert extract_glyph_text('a sign saying "HELLO" and "WORLD"') == "HELLO. WORLD"
        assert extract_glyph_text("no quotes here") is None
