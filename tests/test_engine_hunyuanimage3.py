"""HunyuanImage-3.0 (causal multimodal MoE) on tiny random weights
(reference: src/transformer/hunyuanimage3/base/model.py:1292 MoE,
src/engine/hunyuanimage3/t2i.py)."""

import jax
import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_zimage import make_tokenizer

HYI3_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "hyi3-tiny-test", "name": "HYI3 Tiny",
                 "version": "1.0.0"},
    "spec": {
        "engine": "hunyuanimage3",
        "model_type": "t2i",
        "engine_type": "jax",
        "components": [
            {"type": "scheduler", "base": "FlowMatchEulerDiscreteScheduler",
             "config": {"num_train_timesteps": 1000, "shift": 3.0}},
            {"type": "vae", "base": "auto",
             "config": {"in_channels": 3, "out_channels": 3,
                        "latent_channels": 4,
                        "block_out_channels": [8, 16],
                        "layers_per_block": 1, "norm_num_groups": 4,
                        "scaling_factor": 1.0}},
            {"type": "text_encoder", "config": {}},
            {"type": "transformer", "base": "hunyuanimage3.base",
             "config": {"vocab_size": 64, "hidden_size": 64,
                        "intermediate_size": 96, "moe_intermediate_size": 32,
                        "num_hidden_layers": 2, "num_attention_heads": 2,
                        "num_key_value_heads": 1, "attention_head_dim": 32,
                        "num_experts": 4, "moe_topk": 2,
                        "moe_layer_num_skipped": 1, "use_mixed_mlp_moe": True,
                        "patch_embed_hidden_dim": 32,
                        "img_in_channels": 4, "img_out_channels": 4,
                        "patch_size": 2}},
        ],
        "defaults": {"run": {"num_inference_steps": 2}},
    },
}


class TestHYI3Model:
    def _model(self):
        from apex_studio_tpu.models.transformers.hunyuanimage3 import (
            HunyuanImage3Config, HunyuanImage3ForCausalMM)

        cfg = HunyuanImage3Config.from_dict(
            HYI3_TINY["spec"]["components"][3]["config"])
        return HunyuanImage3ForCausalMM(cfg, dtype=jnp.float32,
                                        param_dtype=jnp.float32,
                                        rngs=nnx.Rngs(0))

    def test_forward_shapes_and_text_conditioning(self):
        m = self._model()
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, 64, size=(1, 6)), jnp.int32)
        ids2 = jnp.asarray(rng.integers(0, 64, size=(1, 6)), jnp.int32)
        t = jnp.asarray([500.0], jnp.float32)
        out = m(img, t, ids)
        assert out.shape == (1, 4, 8, 8)
        out2 = m(img, t, ids2)
        assert np.abs(np.asarray(out - out2)).max() > 1e-6

    def test_moe_routing_normalized_and_selective(self):
        from apex_studio_tpu.models.transformers.hunyuanimage3 import (
            _HYMoE, HunyuanImage3Config)

        cfg = HunyuanImage3Config.from_dict(
            HYI3_TINY["spec"]["components"][3]["config"])
        moe = _HYMoE(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                     rngs=nnx.Rngs(0))
        rng = np.random.default_rng(1)
        # force a decisive router so top-k selection is observable
        moe.gate.wg.kernel.value = jnp.asarray(
            rng.normal(size=moe.gate.wg.kernel.value.shape) * 5.0, jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 8, 64)), jnp.float32)
        out = moe(x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
        # zeroing an expert that routing never picks must not change output
        logits = np.asarray(moe.gate.wg(x))
        never = int(np.argmin(np.max(
            np.asarray(jax.nn.softmax(jnp.asarray(logits))), axis=(0, 1))))
        k = moe.experts[never].down_proj.kernel
        saved = k.value
        k.value = jnp.zeros_like(saved)
        out_some = moe(x)
        k.value = saved
        # output changes by at most the (small) routed weight of that expert
        delta = np.abs(np.asarray(out - out_some)).max()
        assert delta < np.abs(np.asarray(out)).max()

    def test_moe_skipped_layers_are_dense(self):
        from apex_studio_tpu.models.transformers.hunyuanimage3 import (
            _HYMLP, _HYMoE)

        m = self._model()
        assert isinstance(m.layers[0].mlp, _HYMLP)  # skipped → dense
        assert isinstance(m.layers[1].mlp, _HYMoE)


class TestHYI3Engine:
    def test_t2i(self, tmp_path_factory):
        path = tmp_path_factory.mktemp("m") / "hyi3.yml"
        path.write_text(yaml.safe_dump(HYI3_TINY))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path)
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        frames = eng.run(prompt="a lighthouse", height=32, width=32,
                         num_inference_steps=2, guidance_scale=2.0, seed=0)
        assert len(frames) == 1
        assert frames[0].shape == (32, 32, 3) and frames[0].dtype == np.uint8

    def test_latents_deterministic(self, tmp_path_factory):
        path = tmp_path_factory.mktemp("m") / "hyi3b.yml"
        path.write_text(yaml.safe_dump(HYI3_TINY))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path)
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        common = dict(prompt="x", height=32, width=32, num_inference_steps=2,
                      guidance_scale=1.0, seed=4, return_latents=True)
        a = np.asarray(eng.run(**common))
        b = np.asarray(eng.run(**common))
        np.testing.assert_array_equal(a, b)
