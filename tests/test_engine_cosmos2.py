"""Cosmos (Predict2) family on tiny random weights (reference:
src/engine/cosmos2/, src/transformer/cosmos/base/model.py)."""

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_zimage import make_tokenizer

COSMOS_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "cosmos-tiny-test", "name": "Cosmos Tiny",
                 "version": "1.0.0"},
    "spec": {
        "engine": "cosmos2",
        "model_type": ["i2v", "v2v"],
        "engine_type": "jax",
        "components": [
            {"type": "scheduler", "base": "FlowMatchEulerDiscreteScheduler",
             "config": {"num_train_timesteps": 1000}},
            {"type": "vae", "base": "wan.base",
             "config": {"base_dim": 8, "z_dim": 4, "dim_mult": [1, 2],
                        "num_res_blocks": 1, "temperal_downsample": [True],
                        "latents_mean": [0.0] * 4, "latents_std": [1.0] * 4}},
            {"type": "text_encoder", "base": "T5EncoderModel",
             "config": {"vocab_size": 64, "d_model": 16, "d_kv": 8,
                        "d_ff": 32, "num_layers": 1, "num_heads": 2,
                        "per_layer_relative_bias": True}},
            {"type": "transformer", "base": "cosmos.base",
             "config": {"in_channels": 5, "out_channels": 4,  # z + condition mask
                        "num_attention_heads": 2, "attention_head_dim": 12,
                        "num_layers": 1, "text_embed_dim": 16,
                        "adaln_lora_dim": 8, "max_size": [16, 32, 32],
                        "patch_size": [1, 2, 2]}},
        ],
        "defaults": {"run": {"num_inference_steps": 2}},
    },
}


def _engine(tmp_path_factory, model_type):
    path = tmp_path_factory.mktemp("m") / f"cosmos-{model_type}.yml"
    path.write_text(yaml.safe_dump(COSMOS_TINY))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path, model_type=model_type)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestCosmosModel:
    def _model(self):
        from apex_studio_tpu.models.transformers.cosmos import (
            CosmosConfig, CosmosTransformer3DModel)

        cfg = CosmosConfig.from_dict(
            COSMOS_TINY["spec"]["components"][3]["config"])
        return CosmosTransformer3DModel(cfg, dtype=jnp.float32,
                                        param_dtype=jnp.float32,
                                        rngs=nnx.Rngs(0))

    def test_forward_scalar_and_per_frame_t(self):
        m = self._model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 5, 3, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 16)), jnp.float32)
        out = m(x, jnp.asarray([0.5]), ctx)
        assert out.shape == (1, 4, 3, 8, 8)
        t_pf = jnp.asarray([[0.0, 0.5, 0.5]], jnp.float32)
        out2 = m(x, t_pf, ctx)
        assert out2.shape == (1, 4, 3, 8, 8)
        assert np.abs(np.asarray(out - out2)).max() > 1e-6

    def test_condition_mask_channel(self):
        m = self._model()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 16)), jnp.float32)
        cm0 = jnp.zeros((1, 1, 2, 8, 8), jnp.float32)  # completes 5 channels
        cm1 = cm0.at[:, :, :1].set(1.0)
        a = m(x, jnp.asarray([0.5]), ctx, condition_mask=cm0)
        b = m(x, jnp.asarray([0.5]), ctx, condition_mask=cm1)
        assert np.abs(np.asarray(a - b)).max() > 1e-6


class TestCosmosEngines:
    def test_i2v_pins_conditioning_frame(self, tmp_path_factory):
        eng = _engine(tmp_path_factory, "i2v")
        image = np.full((32, 32, 3), 150, np.uint8)
        lat = eng.run(image=image, prompt="a scene unfolds", height=32,
                      width=32, num_frames=5, num_inference_steps=2,
                      guidance_scale=1.0, seed=0, return_latents=True)
        lat = np.asarray(lat)
        assert lat.shape[2] == 3
        assert np.isfinite(lat).all()
        # frame 0 equals the conditioning latent regardless of seed
        lat2 = np.asarray(eng.run(image=image, prompt="a scene unfolds",
                                  height=32, width=32, num_frames=5,
                                  num_inference_steps=2, guidance_scale=1.0,
                                  seed=77, return_latents=True))
        np.testing.assert_allclose(lat[:, :, 0], lat2[:, :, 0], atol=1e-5)

    def test_v2v_frames(self, tmp_path_factory):
        eng = _engine(tmp_path_factory, "v2v")
        rng = np.random.default_rng(2)
        vid = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
               for _ in range(3)]
        frames = eng.run(video=vid, prompt="continue", height=32, width=32,
                         num_frames=5, num_inference_steps=2,
                         guidance_scale=2.0, seed=1, conditioning_frames=3)
        assert len(frames) == 5 and frames[0].shape == (32, 32, 3)
