"""Chroma family tests: pruned-modulation MMDiT + t2i engine end-to-end."""

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_zimage import make_tokenizer

CHROMA_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "chroma-tiny-test", "name": "Chroma Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "chroma",
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
                },
            },
            {
                "type": "text_encoder",
                "base": "T5EncoderModel",
                "config": {
                    "vocab_size": 64,
                    "d_model": 16,
                    "d_kv": 4,
                    "d_ff": 32,
                    "num_layers": 1,
                    "num_heads": 4,
                },
            },
            {
                "type": "transformer",
                "base": "chroma.base",
                "config": {
                    "in_channels": 16,
                    "out_channels": 16,
                    "num_layers": 2,
                    "num_single_layers": 2,
                    "attention_head_dim": 8,
                    "num_attention_heads": 2,
                    "joint_attention_dim": 16,
                    "axes_dims_rope": [2, 2, 4],
                    "approximator_num_channels": 8,
                    "approximator_hidden_dim": 32,
                    "approximator_layers": 2,
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2}},
    },
}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "chroma-tiny.yml"
    path.write_text(yaml.safe_dump(CHROMA_TINY))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


class TestChromaTransformer:
    def _model(self):
        from apex_studio_tpu.models.transformers.chroma import (
            ChromaConfig, ChromaTransformer2DModel)

        cfg = ChromaConfig(
            in_channels=16, out_channels=16, num_layers=2, num_single_layers=2,
            attention_head_dim=8, num_attention_heads=2, joint_attention_dim=16,
            axes_dims_rope=(2, 2, 4), approximator_num_channels=8,
            approximator_hidden_dim=32, approximator_layers=2,
        )
        return ChromaTransformer2DModel(cfg, dtype=jnp.float32, rngs=nnx.Rngs(0))

    def test_mod_row_budget(self):
        m = self._model()
        cfg = m.cfg
        # 3 per single + 12 per double + 2 final (model.py:487)
        assert cfg.num_mod_rows == 3 * 2 + 12 * 2 + 2

    def test_text_mask_blocks_padding(self):
        m = self._model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 16, 16)), jnp.float32)
        txt = jnp.asarray(rng.normal(size=(1, 6, 16)), jnp.float32)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
        t = jnp.full((1,), 0.5, jnp.float32)
        a = m(x, txt, t, attention_mask=mask, grid_hw=(4, 4))
        b = m(x, txt.at[:, 4:].set(50.0), t, attention_mask=mask, grid_hw=(4, 4))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_timestep_changes_all_modulations(self):
        m = self._model()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 16, 16)), jnp.float32)
        txt = jnp.asarray(rng.normal(size=(1, 4, 16)), jnp.float32)
        a = m(x, txt, jnp.full((1,), 0.1), grid_hw=(4, 4))
        b = m(x, txt, jnp.full((1,), 0.9), grid_hw=(4, 4))
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_approximator_residual_structure(self):
        from apex_studio_tpu.models.transformers.chroma import chroma_input_vec

        vec = chroma_input_vec(jnp.asarray([0.5]), 8, 32)
        assert vec.shape == (1, 32, 32)  # [B, rows, 4·num_channels]
        # timestep/guidance half repeats per row; mod half differs per row
        v = np.asarray(vec)
        np.testing.assert_allclose(v[0, 0, :16], v[0, 5, :16])
        assert not np.allclose(v[0, 0, 16:], v[0, 5, 16:])


class TestChromaEngine:
    def test_t2i_end_to_end(self, engine):
        frames = engine.run(prompt="a photo", height=32, width=32,
                            num_inference_steps=2, guidance_scale=1.0,
                            use_cfg_guidance=False, seed=5)
        assert len(frames) == 1
        assert frames[0].shape == (32, 32, 3)

    def test_true_cfg_path(self, engine):
        kw = dict(prompt="a", height=32, width=32, num_inference_steps=2,
                  seed=5, return_latents=True)
        no_cfg = np.asarray(engine.run(use_cfg_guidance=False, **kw))
        cfg = np.asarray(engine.run(negative_prompt="b", guidance_scale=4.0, **kw))
        assert no_cfg.shape == cfg.shape
        assert not np.allclose(no_cfg, cfg)

    def test_seed_determinism(self, engine):
        kw = dict(prompt="x", height=32, width=32, num_inference_steps=2,
                  use_cfg_guidance=False, seed=11, return_latents=True)
        a = np.asarray(engine.run(**kw))
        b = np.asarray(engine.run(**kw))
        np.testing.assert_allclose(a, b, atol=1e-6)
