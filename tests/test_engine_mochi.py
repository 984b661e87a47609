import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from tests.test_engine_zimage import make_tokenizer

MOCHI_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "mochi-tiny-test", "name": "Mochi Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "mochi",
        "model_type": "t2v",
        "engine_type": "jax",
        "components": [
            {"type": "scheduler", "base": "FlowMatchEulerDiscreteScheduler",
             "config": {"num_train_timesteps": 1000}},
            {
                "type": "vae",
                "base": "mochi.base",
                "config": {
                    "latent_channels": 4,
                    "block_out_channels": [8, 16, 24],
                    "layers_per_block": [1, 1, 1],
                    "temporal_expansions": [1, 2],
                    "spatial_expansions": [2, 2],
                    "norm_num_groups": 4,
                },
            },
            {
                "type": "text_encoder",
                "base": "T5EncoderModel",
                "config": {"vocab_size": 64, "d_model": 32, "d_kv": 8, "d_ff": 48,
                            "num_layers": 1, "num_heads": 4},
            },
            {
                "type": "transformer",
                "base": "mochi.base",
                "config": {
                    "num_attention_heads": 2,
                    "attention_head_dim": 16,
                    "in_channels": 4,
                    "out_channels": 4,
                    "num_layers": 2,
                    "text_embed_dim": 32,
                    "pooled_projection_dim": 16,
                    "time_embed_dim": 32,
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 4.5}},
    },
}


def make_engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(MOCHI_TINY))
    path = tmp_path / "mochi-tiny.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path, model_type="t2v")
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestMochiModel:
    def test_forward_shape(self):
        from apex_studio_tpu.models.transformers.mochi import (
            MochiConfig,
            MochiTransformer3DModel,
        )

        cfg = MochiConfig(
            num_attention_heads=2, attention_head_dim=16, in_channels=4,
            out_channels=4, num_layers=2, text_embed_dim=32,
            pooled_projection_dim=16, time_embed_dim=32,
        )
        m = MochiTransformer3DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 3, 8, 8))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 32))
        mask = jnp.ones((1, 7))
        out = m(x, jnp.asarray([500.0]), txt, encoder_attention_mask=mask)
        assert out.shape == (1, 4, 3, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_text_mask_changes_conditioning(self):
        from apex_studio_tpu.models.transformers.mochi import (
            MochiConfig,
            MochiTransformer3DModel,
        )

        cfg = MochiConfig(
            num_attention_heads=2, attention_head_dim=16, in_channels=4,
            out_channels=4, num_layers=1, text_embed_dim=32,
            pooled_projection_dim=16, time_embed_dim=32,
        )
        m = MochiTransformer3DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 1, 4, 4))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32))
        a = m(x, jnp.asarray([10.0]), txt, encoder_attention_mask=jnp.ones((1, 6)))
        half = jnp.concatenate([jnp.ones((1, 3)), jnp.zeros((1, 3))], axis=1)
        b = m(x, jnp.asarray([10.0]), txt, encoder_attention_mask=half)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_vae_decode_shape(self):
        from apex_studio_tpu.models.vaes.mochi_vae import AutoencoderKLMochi, MochiVAEConfig

        cfg = MochiVAEConfig(
            latent_channels=4, block_out_channels=(8, 16, 24),
            layers_per_block=(1, 1, 1), temporal_expansions=(1, 2),
            spatial_expansions=(2, 2), norm_num_groups=4,
        )
        vae = AutoencoderKLMochi(cfg)
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 3, 4, 4))
        out = vae.decode(z)
        # T: 1 + (3-1)·2 = 5, HW: ×4
        assert out.shape == (1, 3, 5, 16, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_vae_encode_shape(self):
        """Encoder (fourier features → attended causal downsampling) produces
        latents at the configured compression (numerics vs the reference:
        tests/test_parity_mochi_vae.py)."""
        from apex_studio_tpu.models.vaes.mochi_vae import AutoencoderKLMochi, MochiVAEConfig

        vae = AutoencoderKLMochi(MochiVAEConfig(latent_channels=4,
                                                norm_num_groups=4,
                                                block_out_channels=(8, 16),
                                                layers_per_block=(1, 1),
                                                temporal_expansions=(2,),
                                                spatial_expansions=(2,)))
        z = vae.encode(jnp.zeros((1, 3, 3, 8, 8)))
        assert z.shape == (1, 4, 2, 4, 4)
        assert np.isfinite(np.asarray(z)).all()


class TestMochiEngine:
    def test_t2v_produces_frames(self, tmp_path):
        eng = make_engine(tmp_path)
        frames = eng.run(
            prompt="a dog", height=16, width=16, num_frames=5,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 5
        assert frames[0].shape == (16, 16, 3) and frames[0].dtype == np.uint8

    def test_cfg_on(self, tmp_path):
        eng = make_engine(tmp_path)
        lat = eng.run(
            prompt="a dog", negative_prompt="bad", height=16, width=16,
            num_frames=3, num_inference_steps=2, guidance_scale=4.5,
            seed=3, return_latents=True,
        )
        assert np.isfinite(np.asarray(lat)).all()

    def test_seed_determinism(self, tmp_path):
        eng = make_engine(tmp_path)
        kw = dict(prompt="x", height=16, width=16, num_frames=3,
                  num_inference_steps=2, guidance_scale=1.0, seed=11,
                  return_latents=True)
        a, b = eng.run(**kw), eng.run(**kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
