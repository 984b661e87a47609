"""Bria FIBO ti2i engine + model on tiny weights (reference:
src/engine/fibo/ti2i.py, src/transformer/fibo/base/model.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_zimage import make_tokenizer

FIBO_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "fibo-tiny-test", "name": "Fibo Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "fibo",
        "model_type": "ti2i",
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
                    "latent_channels": 8,
                    "block_out_channels": [8, 16],
                    "layers_per_block": 1,
                    "norm_num_groups": 4,
                    "scaling_factor": 1.0,
                    "shift_factor": None,
                },
            },
            {
                "type": "text_encoder",
                "base": "LlamaModel",
                "config": {
                    "vocab_size": 64,
                    "hidden_size": 12,
                    "intermediate_size": 24,
                    "num_hidden_layers": 2,
                    "num_attention_heads": 2,
                    "num_key_value_heads": 1,
                    "head_dim": 6,
                    "stack_layers": [0, 1, 2],
                },
            },
            {
                "type": "transformer",
                "base": "fibo.base",
                "config": {
                    "in_channels": 8,
                    "num_layers": 1,
                    "num_single_layers": 2,
                    "attention_head_dim": 16,
                    "num_attention_heads": 2,
                    "joint_attention_dim": 24,
                    "text_encoder_dim": 12,
                    "axes_dims_rope": [4, 6, 6],
                    "mlp_ratio": 2.0,
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 1.0}},
    },
}


def _engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(FIBO_TINY))
    path = tmp_path / "fibo.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestFiboModel:
    def _model(self):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.fibo import (
            BriaFiboTransformer2DModel,
            FiboConfig,
        )

        cfg = FiboConfig(
            in_channels=8, num_layers=1, num_single_layers=2,
            attention_head_dim=16, num_attention_heads=2,
            joint_attention_dim=24, text_encoder_dim=12,
            axes_dims_rope=(4, 6, 6), mlp_ratio=2.0)
        return BriaFiboTransformer2DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def test_forward_shape_and_layer_padding(self):
        import jax.numpy as jnp

        m = self._model()
        x = jnp.ones((1, 16, 8))
        ctx = jnp.ones((1, 5, 24))
        # fewer layers than blocks → last layer duplicated (ti2i.py:551)
        layers = [jnp.ones((1, 5, 12)), jnp.ones((1, 5, 12)) * 2.0]
        t = jnp.full((1,), 500.0)
        out = m(x, ctx, layers, t, text_mask=jnp.ones((1, 5), jnp.int32),
                grid_hw=(4, 4))
        assert out.shape == (1, 16, 8)

    def test_per_block_layers_matter(self):
        import jax.numpy as jnp

        m = self._model()
        x = jnp.ones((1, 16, 8))
        ctx = jnp.ones((1, 5, 24))
        t = jnp.full((1,), 500.0)
        rng = np.random.default_rng(0)
        base = [jnp.asarray(rng.standard_normal((1, 5, 12)), jnp.float32)
                for _ in range(3)]
        a = m(x, ctx, base, t, grid_hw=(4, 4))
        changed = list(base)
        changed[1] = jnp.asarray(rng.standard_normal((1, 5, 12)), jnp.float32)
        b = m(x, ctx, changed, t, grid_hw=(4, 4))
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_text_mask_matters(self):
        import jax.numpy as jnp

        m = self._model()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 16, 8)), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((1, 5, 24)), jnp.float32)
        layers = [jnp.asarray(rng.standard_normal((1, 5, 12)), jnp.float32)]
        t = jnp.full((1,), 500.0)
        full = m(x, ctx, layers, t, text_mask=jnp.ones((1, 5), jnp.int32),
                 grid_hw=(4, 4))
        half = m(x, ctx, layers, t,
                 text_mask=jnp.asarray([[1, 1, 0, 0, 0]], jnp.int32),
                 grid_hw=(4, 4))
        assert not np.allclose(np.asarray(full), np.asarray(half))


class TestFiboEngine:
    def test_default_negative_prompt(self):
        from apex_studio_tpu.engine.fibo import default_negative_prompt

        assert default_negative_prompt({"style_medium": "Photograph"}) != ""
        assert default_negative_prompt({"style_medium": "watercolor"}) == ""

    def test_t2i_generation(self, tmp_path):
        eng = _engine(tmp_path)
        frames = eng.run(
            prompt='{"subject": "a red cube", "style_medium": "photo"}',
            height=32, width=32, num_inference_steps=2, guidance_scale=1.0,
            seed=3,
        )
        assert len(frames) == 1
        assert frames[0].shape == (32, 32, 3)

    def test_cfg_latents(self, tmp_path):
        eng = _engine(tmp_path)
        lat = eng.run(
            prompt="a cat", height=32, width=32, num_inference_steps=1,
            guidance_scale=3.0, seed=1, return_latents=True,
        )
        assert np.asarray(lat).shape == (1, 8, 16, 16)
