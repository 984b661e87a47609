"""LongCat-Video engines + model on tiny weights (reference:
src/engine/longcat/*, src/transformer/longcat/base/model.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_zimage import make_tokenizer

LONGCAT_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "longcat-tiny-test", "name": "LongCat Tiny",
                 "version": "1.0.0"},
    "spec": {
        "engine": "longcat",
        "model_type": "t2v",
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "FlowMatchEulerDiscreteScheduler",
                "config": {"num_train_timesteps": 1000},
            },
            {
                "type": "vae",
                "base": "wan.base",
                "config": {
                    "base_dim": 8,
                    "z_dim": 4,
                    "dim_mult": [1, 2],
                    "num_res_blocks": 1,
                    "temperal_downsample": [True],
                    "latents_mean": [0.0] * 4,
                    "latents_std": [1.0] * 4,
                },
            },
            {
                "type": "text_encoder",
                "base": "UMT5EncoderModel",
                "config": {
                    "vocab_size": 64,
                    "d_model": 24,
                    "d_kv": 6,
                    "d_ff": 48,
                    "num_layers": 1,
                    "num_heads": 4,
                },
            },
            {
                "type": "transformer",
                "base": "longcat.base",
                "config": {
                    "in_channels": 4,
                    "out_channels": 4,
                    "hidden_size": 48,
                    "depth": 2,
                    "num_heads": 2,
                    "caption_channels": 24,
                    "mlp_ratio": 2.0,
                    "adaln_tembed_dim": 16,
                    "patch_size": [1, 2, 2],
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 1.0}},
    },
}


def _engine(tmp_path, model_type="t2v"):
    doc = yaml.safe_load(yaml.safe_dump(LONGCAT_TINY))
    doc["metadata"]["id"] = f"longcat-{model_type}-tiny"
    doc["spec"]["model_type"] = model_type
    path = tmp_path / f"longcat-{model_type}.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestLongCatModel:
    def _model(self):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.longcat import (
            LongCatConfig,
            LongCatVideoTransformer3DModel,
        )

        cfg = LongCatConfig(
            in_channels=4, out_channels=4, hidden_size=48, depth=2,
            num_heads=2, caption_channels=24, mlp_ratio=2.0,
            adaln_tembed_dim=16)
        return LongCatVideoTransformer3DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def test_forward_shape(self):
        import jax.numpy as jnp

        m = self._model()
        x = jnp.ones((1, 4, 3, 8, 8))
        out = m(x, jnp.full((1,), 500.0), jnp.ones((1, 5, 24)),
                jnp.ones((1, 5), jnp.int32))
        assert out.shape == (1, 4, 3, 8, 8)

    def test_rope_dims_sum_to_head_dim(self):
        m = self._model()
        assert sum(m.cfg.rope_dims) == m.cfg.head_dim

    def test_per_frame_timestep(self):
        import jax.numpy as jnp

        m = self._model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)), jnp.float32)
        txt = jnp.asarray(rng.standard_normal((1, 5, 24)), jnp.float32)
        uniform = m(x, jnp.full((1,), 500.0), txt)
        per_frame = m(x, jnp.asarray([[0.0, 500.0, 500.0]]), txt)
        assert not np.allclose(np.asarray(uniform), np.asarray(per_frame))

    def test_cond_isolated_attention(self):
        """Conditioning frames must be unaffected by the noise frames."""
        import jax.numpy as jnp

        m = self._model()
        rng = np.random.default_rng(1)
        cond = rng.standard_normal((1, 4, 1, 8, 8)).astype(np.float32)
        noise_a = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
        noise_b = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
        txt = jnp.asarray(rng.standard_normal((1, 5, 24)), jnp.float32)
        t = jnp.asarray([[0.0, 500.0, 500.0]])
        xa = jnp.asarray(np.concatenate([cond, noise_a], axis=2))
        xb = jnp.asarray(np.concatenate([cond, noise_b], axis=2))
        # cross-attn is skipped on cond tokens, but text still reaches noise;
        # cond output should be identical regardless of the noise frames
        oa = np.asarray(m(xa, t, txt, num_cond_latents=1))
        ob = np.asarray(m(xb, t, txt, num_cond_latents=1))
        assert np.allclose(oa[:, :, :1], ob[:, :, :1], atol=1e-5)
        assert not np.allclose(oa[:, :, 1:], ob[:, :, 1:])

    def test_kv_cache_matches_joint_forward(self):
        """KV-cached continuation ≡ non-cached cond forward on noise frames."""
        import jax.numpy as jnp

        m = self._model()
        rng = np.random.default_rng(2)
        cond = jnp.asarray(rng.standard_normal((1, 4, 1, 8, 8)), jnp.float32)
        noise = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)), jnp.float32)
        txt = jnp.asarray(rng.standard_normal((1, 5, 24)), jnp.float32)

        # joint (non-cached) pass
        x_full = jnp.concatenate([cond, noise], axis=2)
        t_full = jnp.asarray([[0.0, 500.0, 500.0]])
        joint = np.asarray(
            m(x_full, t_full, txt, num_cond_latents=1))[:, :, 1:]

        # cached: clean pass at t=0, then noise-only with the cache
        _, caches = m(cond, jnp.zeros((1,)), jnp.zeros_like(txt),
                      return_kv=True, skip_crs_attn=True)
        cached = np.asarray(
            m(noise, jnp.full((1,), 500.0), txt, kv_cache=caches,
              num_ctx_latents=1))
        assert np.allclose(joint, cached, atol=1e-4)


class TestLongCatEngines:
    def test_t2v(self, tmp_path):
        eng = _engine(tmp_path, "t2v")
        frames = eng.run(prompt="a cat", height=32, width=32, num_frames=5,
                         num_inference_steps=2, guidance_scale=1.0, seed=3)
        assert len(frames) == 5
        assert frames[0].shape == (32, 32, 3)

    def test_t2v_cfg_zero(self, tmp_path):
        eng = _engine(tmp_path, "t2v")
        lat = eng.run(prompt="a cat", negative_prompt="dog", height=32,
                      width=32, num_frames=3, num_inference_steps=1,
                      guidance_scale=4.0, seed=1, return_latents=True)
        assert np.asarray(lat).shape == (1, 4, 2, 16, 16)

    def test_i2v(self, tmp_path):
        eng = _engine(tmp_path, "i2v")
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        frames = eng.run(image=img, prompt="waves", height=32, width=32,
                         num_frames=5, num_inference_steps=2,
                         guidance_scale=1.0, seed=3)
        assert len(frames) == 5

    def test_vc_continuation_kv_cache(self, tmp_path):
        eng = _engine(tmp_path, "vc")
        rng = np.random.default_rng(1)
        vid = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
               for _ in range(5)]
        frames = eng.run(video=vid, prompt="keep going", height=32, width=32,
                         num_frames=5, num_cond_frames=3,
                         num_inference_steps=2, guidance_scale=1.0, seed=3)
        # 5 joint latent frames decode causally: 1 + 4*t_scale = 9 frames
        assert len(frames) == 9

    def test_long_video_segments(self, tmp_path):
        eng = _engine(tmp_path, "long_video")
        frames = eng.run(prompt="a walk", num_segments=1, height=32, width=32,
                         num_frames=5, num_cond_frames=3,
                         num_inference_steps=1, guidance_scale=1.0, seed=2)
        # 5 base + 6 new (joint causal decode of cond+new latents)
        assert len(frames) == 11

    def test_refine(self, tmp_path):
        eng = _engine(tmp_path, "refine")
        rng = np.random.default_rng(4)
        vid = [rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
               for _ in range(3)]
        frames = eng.run(video=vid, prompt="sharpen", height=32, width=32,
                         num_inference_steps=2, seed=5)
        assert len(frames) == 6  # 2x temporal upsample
        assert frames[0].shape == (32, 32, 3)

    def test_interactive_sentence_split(self):
        from apex_studio_tpu.engine.longcat import split_into_sentences

        out = split_into_sentences("A cat walks. Then it jumps! Done?")
        assert len(out) == 3
