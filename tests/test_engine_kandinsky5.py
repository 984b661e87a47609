"""Kandinsky 5.0 family on tiny random weights (reference:
src/engine/kandinsky5/, src/transformer/kandinsky5/base/model.py)."""

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_zimage import make_tokenizer

K5_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "k5-tiny-test", "name": "K5 Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "kandinsky5",
        "model_type": ["t2v", "i2v"],
        "engine_type": "jax",
        "components": [
            {"type": "scheduler", "base": "FlowMatchEulerDiscreteScheduler",
             "config": {"num_train_timesteps": 1000, "shift": 3.0}},
            {"type": "vae", "base": "wan.base",
             "config": {"base_dim": 8, "z_dim": 4, "dim_mult": [1, 2],
                        "num_res_blocks": 1, "temperal_downsample": [True],
                        "latents_mean": [0.0] * 4, "latents_std": [1.0] * 4}},
            {"type": "text_encoder", "name": "text_encoder",
             "base": "Qwen2ForCausalLM",
             "config": {"vocab_size": 64, "hidden_size": 16,
                        "intermediate_size": 32, "num_hidden_layers": 1,
                        "num_attention_heads": 2, "num_key_value_heads": 1,
                        "head_dim": 8}},
            {"type": "text_encoder", "name": "text_encoder_2",
             "base": "CLIPTextModel",
             "config": {"vocab_size": 64, "hidden_size": 12,
                        "intermediate_size": 24, "num_hidden_layers": 1,
                        "num_attention_heads": 2, "max_position_embeddings": 77,
                        "projection_dim": 12}},
            {"type": "transformer", "base": "kandinsky5.base",
             "config": {"in_visual_dim": 4, "out_visual_dim": 4,
                        "in_text_dim": 16, "in_text_dim2": 12, "time_dim": 16,
                        "model_dim": 16, "ff_dim": 32, "num_text_blocks": 1,
                        "num_visual_blocks": 1, "axes_dims": [4, 2, 2]}},
        ],
        "defaults": {"run": {"num_inference_steps": 2}},
    },
}


def _engine(tmp_path_factory, model_type, visual_cond=False):
    import copy

    doc = copy.deepcopy(K5_TINY)
    if visual_cond:
        tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
        tf["config"]["visual_cond"] = True
    path = tmp_path_factory.mktemp("m") / f"k5-{model_type}.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path, model_type=model_type)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


class TestK5Model:
    def test_forward_and_pooled_conditioning(self):
        from apex_studio_tpu.models.transformers.kandinsky5 import (
            Kandinsky5Config, Kandinsky5Transformer3DModel)

        cfg = Kandinsky5Config.from_dict(
            K5_TINY["spec"]["components"][4]["config"])
        m = Kandinsky5Transformer3DModel(cfg, dtype=jnp.float32,
                                         param_dtype=jnp.float32,
                                         rngs=nnx.Rngs(0))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 16)), jnp.float32)
        pooled = jnp.asarray(rng.normal(size=(1, 12)), jnp.float32)
        t = jnp.asarray([500.0], jnp.float32)
        # modulations are zero-init (checkpoint fills them); give them values
        # so the conditioning paths are exercised
        for blk in m.visual_transformer_blocks:
            k = blk.visual_modulation.out_layer.kernel
            k.value = jnp.asarray(rng.normal(size=k.value.shape) * 0.02,
                                  jnp.float32)
        out = m(x, t, ctx, pooled)
        assert out.shape == (1, 4, 2, 8, 8)
        out2 = m(x, t, ctx, pooled + 1.0)
        assert np.abs(np.asarray(out - out2)).max() > 1e-6

    def test_zero_init_modulation(self):
        from apex_studio_tpu.models.transformers.kandinsky5 import _Modulation

        mod = _Modulation(8, 4, 3, dtype=jnp.float32, rngs=nnx.Rngs(0))
        outs = mod(jnp.ones((1, 8)))
        assert len(outs) == 3
        # zero-init kernel → bias only (zeros) at init
        assert all(float(jnp.abs(o).max()) == 0.0 for o in outs)


class TestK5Engines:
    def test_t2v(self, tmp_path_factory):
        eng = _engine(tmp_path_factory, "t2v")
        frames = eng.run(prompt="a fox", height=32, width=32, num_frames=5,
                         num_inference_steps=2, guidance_scale=2.0, seed=0)
        assert len(frames) == 5 and frames[0].shape == (32, 32, 3)

    def test_i2v_visual_cond(self, tmp_path_factory):
        eng = _engine(tmp_path_factory, "i2v", visual_cond=True)
        image = np.full((32, 32, 3), 100, np.uint8)
        lat = eng.run(image=image, prompt="animate", height=32, width=32,
                      num_frames=5, num_inference_steps=2, guidance_scale=1.0,
                      seed=1, return_latents=True)
        lat = np.asarray(lat)
        assert lat.shape == (1, 4, 3, 16, 16)
        assert np.isfinite(lat).all()
