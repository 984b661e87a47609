"""HunyuanImage 2.1 t2i engine + model on tiny weights (reference:
src/engine/hunyuanimage/t2i.py, src/transformer/hunyuanimage/base/model.py,
src/vae/hunyuanimage/model.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_zimage import make_tokenizer

HYI_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "hyi-tiny-test", "name": "HunyuanImage Tiny",
                 "version": "1.0.0"},
    "spec": {
        "engine": "hunyuanimage",
        "model_type": "t2i",
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "FlowMatchEulerDiscreteScheduler",
                "config": {"num_train_timesteps": 1000},
            },
            {
                "type": "vae",
                "base": "hunyuanimage.vae",
                "config": {
                    "latent_channels": 4,
                    "block_out_channels": [8, 16, 32],
                    "layers_per_block": 1,
                    "spatial_compression_ratio": 4,
                    "scaling_factor": 1.0,
                },
            },
            {
                "type": "text_encoder",
                "name": "text_encoder",
                "base": "Qwen2_5_VLForConditionalGeneration",
                "config": {
                    "vocab_size": 64,
                    "hidden_size": 32,
                    "intermediate_size": 64,
                    "num_hidden_layers": 3,
                    "num_attention_heads": 4,
                    "num_key_value_heads": 2,
                },
            },
            {
                "type": "text_encoder",
                "name": "text_encoder_2",
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
                "base": "hunyuanimage.base",
                "config": {
                    "in_channels": 4,
                    "out_channels": 4,
                    "num_attention_heads": 2,
                    "attention_head_dim": 16,
                    "num_layers": 1,
                    "num_single_layers": 1,
                    "num_refiner_layers": 1,
                    "mlp_ratio": 2.0,
                    "patch_size": [1, 1],
                    "text_embed_dim": 32,
                    "text_embed_2_dim": 16,
                    "rope_axes_dim": [8, 8],
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 1.0}},
    },
}


def _engine(tmp_path, **tf_overrides):
    doc = yaml.safe_load(yaml.safe_dump(HYI_TINY))
    tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
    tf["config"].update(tf_overrides)
    path = tmp_path / "hyi.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    tok = make_tokenizer()
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = tok
    return eng


class TestHunyuanImageModel:
    def _model(self, **over):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.hunyuanimage import (
            HunyuanImageConfig,
            HunyuanImageTransformer2DModel,
        )

        cfg = HunyuanImageConfig(
            in_channels=4, out_channels=4, num_attention_heads=2,
            attention_head_dim=16, num_layers=1, num_single_layers=1,
            num_refiner_layers=1, mlp_ratio=2.0, patch_size=(1, 1),
            text_embed_dim=32, text_embed_2_dim=16, rope_axes_dim=(8, 8),
            **over)
        return HunyuanImageTransformer2DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def test_forward_shape(self):
        import jax.numpy as jnp

        m = self._model()
        x = jnp.ones((1, 4, 8, 8))
        t = jnp.ones((1,)) * 500
        txt = jnp.ones((1, 6, 32))
        mask = jnp.ones((1, 6), jnp.int32)
        t2 = jnp.ones((1, 3, 16))
        out = m(x, t, txt, mask, t2, jnp.ones((1, 3), jnp.int32))
        assert out.shape == (1, 4, 8, 8)

    def test_meanflow_and_guidance(self):
        import jax.numpy as jnp

        m = self._model(use_meanflow=True, guidance_embeds=True)
        x = jnp.ones((1, 4, 8, 8))
        t = jnp.ones((1,)) * 500
        txt = jnp.ones((1, 6, 32))
        mask = jnp.ones((1, 6), jnp.int32)
        base = m(x, t, txt, mask, guidance=jnp.ones((1,)) * 3000.0,
                 t_r=jnp.zeros((1,)))
        other = m(x, t, txt, mask, guidance=jnp.ones((1,)) * 3000.0,
                  t_r=jnp.ones((1,)) * 400.0)
        assert base.shape == (1, 4, 8, 8)
        assert not np.allclose(np.asarray(base), np.asarray(other))

    def test_glyph_branch_changes_output(self):
        import jax.numpy as jnp

        m = self._model()
        x = jnp.ones((1, 4, 8, 8))
        t = jnp.ones((1,)) * 500
        txt = jnp.ones((1, 6, 32))
        mask = jnp.ones((1, 6), jnp.int32)
        no_glyph = m(x, t, txt, mask,
                     jnp.zeros((1, 3, 16)), jnp.zeros((1, 3), jnp.int32))
        glyph = m(x, t, txt, mask,
                  jnp.ones((1, 3, 16)) * 2.0, jnp.ones((1, 3), jnp.int32))
        assert not np.allclose(np.asarray(no_glyph), np.asarray(glyph))


class TestHunyuanImageVAE:
    def test_roundtrip_shapes(self):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.vaes.hunyuanimage_vae import (
            AutoencoderKLHunyuanImage,
            HunyuanImageVAEConfig,
        )

        cfg = HunyuanImageVAEConfig(
            latent_channels=4, block_out_channels=(8, 16, 32),
            layers_per_block=1, spatial_compression_ratio=4,
            scaling_factor=1.0)
        vae = AutoencoderKLHunyuanImage(cfg, rngs=nnx.Rngs(0))
        x = jnp.ones((1, 3, 32, 32))
        z = vae.encode(x)
        assert z.shape == (1, 4, 8, 8)
        y = vae.decode(z)
        assert y.shape == (1, 3, 32, 32)


class TestAPG:
    def test_apg_matches_cfg_at_eta_one_no_clip(self):
        from apex_studio_tpu.engine.hunyuanimage import apg_mix
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
        neg = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
        out = apg_mix(pos, neg, 3.0, eta=1.0, norm_threshold=0.0)
        ref = neg + 3.0 * (pos - neg)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_apg_norm_clip_bounds_delta(self):
        from apex_studio_tpu.engine.hunyuanimage import apg_mix
        import jax.numpy as jnp

        pos = jnp.ones((1, 4, 4, 4), jnp.float32) * 100.0
        neg = jnp.zeros((1, 4, 4, 4), jnp.float32)
        out = apg_mix(pos, neg, 2.0, eta=1.0, norm_threshold=1.0)
        delta = np.linalg.norm(np.asarray(out - pos).ravel())
        assert delta <= 1.0 + 1e-4


class TestHunyuanImageEngine:
    def test_t2i_generation(self, tmp_path):
        eng = _engine(tmp_path)
        frames = eng.run(
            prompt='a poster saying "HELLO"', height=32, width=32,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 1
        assert frames[0].shape == (32, 32, 3)

    def test_t2i_cfg_apg(self, tmp_path):
        eng = _engine(tmp_path)
        lat = eng.run(
            prompt="a cat", negative_prompt="blurry", height=32, width=32,
            num_inference_steps=1, guidance_scale=3.0, seed=1,
            return_latents=True,
        )
        assert np.asarray(lat).shape == (1, 4, 8, 8)
