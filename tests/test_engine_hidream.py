"""HiDream-I1 (MoE MMDiT) on tiny random weights (reference:
src/transformer/hidream/base/model.py, src/engine/hidream/)."""

import jax
import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_zimage import make_tokenizer

HIDREAM_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "hidream-tiny-test", "name": "HiDream Tiny",
                 "version": "1.0.0"},
    "spec": {
        "engine": "hidream",
        "model_type": ["t2i", "edit"],
        "engine_type": "jax",
        "components": [
            {"type": "scheduler", "base": "FlowMatchEulerDiscreteScheduler",
             "config": {"num_train_timesteps": 1000, "shift": 3.0}},
            {"type": "vae", "base": "auto",
             "config": {"in_channels": 3, "out_channels": 3,
                        "latent_channels": 4, "block_out_channels": [8, 16],
                        "layers_per_block": 1, "norm_num_groups": 4,
                        "scaling_factor": 1.0}},
            {"type": "text_encoder", "name": "text_encoder",
             "base": "CLIPTextModel",
             "config": {"vocab_size": 64, "hidden_size": 8,
                        "intermediate_size": 16, "num_hidden_layers": 1,
                        "num_attention_heads": 2,
                        "max_position_embeddings": 77, "projection_dim": 8}},
            {"type": "text_encoder", "name": "text_encoder_2",
             "base": "CLIPTextModel",
             "config": {"vocab_size": 64, "hidden_size": 8,
                        "intermediate_size": 16, "num_hidden_layers": 1,
                        "num_attention_heads": 2,
                        "max_position_embeddings": 77, "projection_dim": 8}},
            {"type": "text_encoder", "name": "text_encoder_3",
             "base": "T5EncoderModel",
             "config": {"vocab_size": 64, "d_model": 12, "d_kv": 6,
                        "d_ff": 24, "num_layers": 1, "num_heads": 2,
                        "per_layer_relative_bias": True}},
            {"type": "text_encoder", "name": "text_encoder_4",
             "base": "LlamaModel",
             "config": {"vocab_size": 64, "hidden_size": 12,
                        "intermediate_size": 24, "num_hidden_layers": 2,
                        "num_attention_heads": 2, "num_key_value_heads": 1,
                        "head_dim": 6, "stack_layers": [1, 2]}},
            {"type": "transformer", "base": "hidream.base",
             "config": {"patch_size": 2, "in_channels": 4, "out_channels": 4,
                        "num_layers": 1, "num_single_layers": 1,
                        "attention_head_dim": 8, "num_attention_heads": 2,
                        "text_emb_dim": 16, "caption_dim": 12,
                        "num_routed_experts": 3, "num_activated_experts": 2,
                        "axes_dims_rope": [4, 4], "llama_layers": [1, 2]}},
        ],
        "defaults": {"run": {"num_inference_steps": 2}},
    },
}


class TestHiDreamModel:
    def _model(self):
        from apex_studio_tpu.models.transformers.hidream import (
            HiDreamConfig, HiDreamImageTransformer2DModel)

        cfg = HiDreamConfig.from_dict(
            HIDREAM_TINY["spec"]["components"][6]["config"])
        return HiDreamImageTransformer2DModel(cfg, dtype=jnp.float32,
                                              param_dtype=jnp.float32,
                                              rngs=nnx.Rngs(0))

    def test_forward_and_per_block_llama(self):
        m = self._model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), jnp.float32)
        t5 = jnp.asarray(rng.normal(size=(1, 5, 12)), jnp.float32)
        ll = [jnp.asarray(rng.normal(size=(1, 4, 12)), jnp.float32)
              for _ in range(2)]
        pooled = jnp.asarray(rng.normal(size=(1, 16)), jnp.float32)
        t = jnp.asarray([500.0], jnp.float32)
        out = m(x, t, t5, ll, pooled)
        assert out.shape == (1, 4, 8, 8)
        # per-block llama states matter independently
        ll2 = [ll[0], ll[1] + 1.0]
        out2 = m(x, t, t5, ll2, pooled)
        assert np.abs(np.asarray(out - out2)).max() > 1e-6

    def test_moe_gate_unnormalized_topk(self):
        from apex_studio_tpu.models.transformers.hidream import _MoESwiGLU

        moe = _MoESwiGLU(8, 16, 3, 2, dtype=jnp.float32, rngs=nnx.Rngs(0))
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 8)),
                        jnp.float32)
        out = moe(x)
        assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


class TestHiDreamEngine:
    def _engine(self, tmp_path_factory, model_type="t2i"):
        path = tmp_path_factory.mktemp("m") / "hidream.yml"
        path.write_text(yaml.safe_dump(HIDREAM_TINY))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type=model_type)
        for spec in eng.component_specs.values():
            if spec.get("type") == "text_encoder":
                spec["tokenizer"] = make_tokenizer()
        return eng

    def test_t2i(self, tmp_path_factory):
        eng = self._engine(tmp_path_factory)
        frames = eng.run(prompt="a glass sculpture", height=32, width=32,
                         num_inference_steps=2, guidance_scale=2.0, seed=0)
        assert len(frames) == 1
        assert frames[0].shape == (32, 32, 3) and frames[0].dtype == np.uint8

    def test_edit_from_image(self, tmp_path_factory):
        eng = self._engine(tmp_path_factory, "edit")
        img = np.full((32, 32, 3), 90, np.uint8)
        lat = eng.run(prompt="make it red", image=img, height=32, width=32,
                      num_inference_steps=4, guidance_scale=1.0, seed=1,
                      image_strength=0.5, return_latents=True)
        assert np.isfinite(np.asarray(lat)).all()
