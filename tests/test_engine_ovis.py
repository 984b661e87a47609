"""Ovis-Image t2i engine + model on tiny weights (reference:
src/engine/ovis/t2i.py, src/transformer/ovis/base/model.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_zimage import make_tokenizer

OVIS_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "ovis-tiny-test", "name": "Ovis Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "ovis",
        "model_type": "t2i",
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "FlowMatchEulerDiscreteScheduler",
                "config": {"num_train_timesteps": 1000, "use_dynamic_shifting": True},
            },
            {
                "type": "vae",
                "base": "AutoencoderKL",
                "config": {
                    "latent_channels": 4,
                    "block_out_channels": [8, 16],
                    "layers_per_block": 1,
                    "norm_num_groups": 4,
                    "scaling_factor": 1.0,
                    "shift_factor": None,
                },
            },
            {
                "type": "text_encoder",
                "base": "Qwen3ForCausalLM",
                "config": {
                    "vocab_size": 64,
                    "hidden_size": 48,
                    "intermediate_size": 96,
                    "num_hidden_layers": 2,
                    "num_attention_heads": 4,
                    "num_key_value_heads": 2,
                    "head_dim": 16,
                },
            },
            {
                "type": "transformer",
                "base": "ovis.base",
                "config": {
                    "in_channels": 16,
                    "out_channels": 16,
                    "num_layers": 1,
                    "num_single_layers": 1,
                    "attention_head_dim": 16,
                    "num_attention_heads": 2,
                    "joint_attention_dim": 48,
                    "axes_dims_rope": [4, 6, 6],
                    "mlp_ratio": 2.0,
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 1.0}},
    },
}


def _engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(OVIS_TINY))
    path = tmp_path / "ovis.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestOvisModel:
    def _model(self):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.ovis import (
            OvisConfig,
            OvisImageTransformer2DModel,
        )

        cfg = OvisConfig(
            in_channels=16, out_channels=16, num_layers=1, num_single_layers=1,
            attention_head_dim=16, num_attention_heads=2,
            joint_attention_dim=48, axes_dims_rope=(4, 6, 6), mlp_ratio=2.0)
        return OvisImageTransformer2DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def test_forward_shape(self):
        import jax.numpy as jnp

        m = self._model()
        x = jnp.ones((1, 16, 16))  # 4x4 grid of packed tokens
        ctx = jnp.ones((1, 5, 48))
        t = jnp.full((1,), 0.5)
        out = m(x, ctx, t, grid_hw=(4, 4))
        assert out.shape == (1, 16, 16)

    def test_pack_roundtrip(self):
        import jax.numpy as jnp

        m = self._model()
        z = jnp.arange(4 * 8 * 8, dtype=jnp.float32).reshape(1, 4, 8, 8)
        packed = m.pack_latents(z)
        assert packed.shape == (1, 16, 16)
        assert np.allclose(np.asarray(m.unpack_latents(packed, 8, 8)), np.asarray(z))

    def test_text_changes_output(self):
        import jax.numpy as jnp

        m = self._model()
        x = jnp.ones((1, 16, 16))
        t = jnp.full((1,), 0.5)
        rng = np.random.default_rng(0)
        a = m(x, jnp.asarray(rng.standard_normal((1, 5, 48)), jnp.float32),
              t, grid_hw=(4, 4))
        b = m(x, jnp.asarray(rng.standard_normal((1, 5, 48)), jnp.float32),
              t, grid_hw=(4, 4))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestOvisEngine:
    def test_t2i_generation(self, tmp_path):
        eng = _engine(tmp_path)
        frames = eng.run(
            prompt="a red cube", height=32, width=32,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 1
        assert frames[0].shape == (32, 32, 3)

    def test_t2i_cfg(self, tmp_path):
        eng = _engine(tmp_path)
        lat = eng.run(
            prompt="a cat", negative_prompt="dog", height=32, width=32,
            num_inference_steps=1, guidance_scale=4.0, seed=1,
            return_latents=True,
        )
        assert np.asarray(lat).shape == (1, 64, 16)
