"""LTX-Video family tests: DiT contract, causal VAE, rf scheduler per-token
steps, and the x2v engine end-to-end (t2v + first-frame i2v conditioning)."""

import numpy as np
import pytest
import yaml
import jax
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_zimage import make_tokenizer

LTX_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "ltx-tiny-test", "name": "LTX Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "ltx",
        "model_type": "x2v",
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "RectifiedFlowScheduler",
                "config": {"sampler": "LinearQuadratic", "shifting": "SD3"},
            },
            {
                "type": "vae",
                "base": "ltx_vae.base",
                "config": {
                    "latent_channels": 8,
                    "base_channels": 8,
                    "patch_size": 2,
                    "encoder_blocks": [
                        ["res_x", {"num_layers": 1}],
                        ["compress_all_res", {"multiplier": 2}],
                        ["res_x", {"num_layers": 1}],
                    ],
                    "decoder_blocks": [
                        ["res_x", {"num_layers": 1}],
                        ["compress_all", {"residual": True, "multiplier": 2}],
                        ["res_x", {"num_layers": 1}],
                    ],
                    "timestep_conditioning": True,
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
                "base": "ltx.base",
                "config": {
                    "in_channels": 8,
                    "out_channels": 8,
                    "num_layers": 2,
                    "num_attention_heads": 2,
                    "attention_head_dim": 12,
                    "caption_channels": 16,
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 1.0}},
    },
}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "ltx-tiny.yml"
    path.write_text(yaml.safe_dump(LTX_TINY))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


class TestLTXTransformer:
    def _model(self):
        from apex_studio_tpu.models.transformers.ltx import (
            LTXVideoConfig, LTXVideoTransformer3D)

        cfg = LTXVideoConfig(in_channels=8, out_channels=8, num_layers=2,
                             num_attention_heads=2, attention_head_dim=12,
                             caption_channels=16)
        return LTXVideoTransformer3D(cfg, dtype=jnp.float32, rngs=nnx.Rngs(0))

    def test_per_token_timesteps_match_scalar(self):
        m = self._model()
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.normal(size=(1, 32, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 8, 16)), jnp.float32)
        mask = jnp.ones((1, 8), jnp.int32)
        coords = jnp.asarray(rng.random((1, 3, 32)) * 10, jnp.float32)
        o1 = m(tokens, ctx, jnp.full((1, 1), 0.7), encoder_attention_mask=mask,
               video_coords=coords)
        o2 = m(tokens, ctx, jnp.full((1, 32), 0.7), encoder_attention_mask=mask,
               video_coords=coords)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    def test_context_mask_blocks_padding(self):
        m = self._model()
        rng = np.random.default_rng(1)
        tokens = jnp.asarray(rng.normal(size=(1, 16, 8)), jnp.float32)
        coords = jnp.asarray(rng.random((1, 3, 16)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 8, 16)), jnp.float32)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], jnp.int32)
        t = jnp.full((1, 1), 0.5)
        base = m(tokens, ctx, t, encoder_attention_mask=mask, video_coords=coords)
        ctx2 = ctx.at[:, 4:].set(99.0)  # masked positions must not matter
        out = m(tokens, ctx2, t, encoder_attention_mask=mask, video_coords=coords)
        np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-4)

    def test_stg_skip_changes_output(self):
        m = self._model()
        rng = np.random.default_rng(2)
        tokens = jnp.asarray(rng.normal(size=(1, 16, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 8, 16)), jnp.float32)
        coords = jnp.asarray(rng.random((1, 3, 16)), jnp.float32)
        t = jnp.full((1, 1), 0.5)
        mask = jnp.ones((1, 8), jnp.int32)
        a = m(tokens, ctx, t, encoder_attention_mask=mask, video_coords=coords)
        b = m(tokens, ctx, t, encoder_attention_mask=mask, video_coords=coords,
              skip_blocks=(0,))
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_rope_pads_leading_dims(self):
        from apex_studio_tpu.models.transformers.ltx import ltx_rope_freqs

        coords = jnp.asarray(np.random.rand(1, 3, 7), jnp.float32)
        cos, sin = ltx_rope_freqs(coords, 20, 10000.0, (20, 2048, 2048))
        # 20 % 6 == 2 leading pad lanes: cos=1, sin=0 (identity rotation)
        assert cos.shape == (1, 7, 20)
        np.testing.assert_allclose(np.asarray(cos[..., :2]), 1.0)
        np.testing.assert_allclose(np.asarray(sin[..., :2]), 0.0)


class TestLTXVAE:
    def _vae(self):
        from apex_studio_tpu.models.vaes.ltx_vae import AutoencoderKLLTX, LTXVAEConfig

        cfg = LTXVAEConfig(
            latent_channels=4, base_channels=8, patch_size=2,
            encoder_blocks=[("res_x", {"num_layers": 1}),
                            ("compress_all_res", {"multiplier": 2}),
                            ("res_x", {"num_layers": 1})],
            decoder_blocks=[("res_x", {"num_layers": 1}),
                            ("compress_all", {"residual": True, "multiplier": 2}),
                            ("res_x", {"num_layers": 1})],
        )
        return AutoencoderKLLTX(cfg, rngs=nnx.Rngs(0))

    def test_shapes_and_causal_frame_count(self):
        vae = self._vae()
        assert vae.cfg.spatial_scale == 4 and vae.cfg.temporal_scale == 2
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 5, 16, 16)),
                        jnp.float32)
        z = vae.encode(x)
        assert z.shape == (1, 4, 3, 4, 4)  # (5−1)/2+1 = 3 latent frames
        rec = vae.decode(z, timestep=jnp.zeros((1,), jnp.float32))
        assert rec.shape == (1, 3, 5, 16, 16)

    def test_encoder_temporal_causality(self):
        """Future frames must not influence earlier latents (causal convs)."""
        vae = self._vae()
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
        z1 = np.asarray(vae.encode(jnp.asarray(x)))
        x2 = x.copy()
        x2[:, :, 4:] += 10.0  # perturb the final frame only
        z2 = np.asarray(vae.encode(jnp.asarray(x2)))
        np.testing.assert_allclose(z1[:, :, 0], z2[:, :, 0], atol=1e-5)

    def test_latent_statistics_roundtrip(self):
        vae = self._vae()
        vae.std_of_means.value = jnp.asarray(np.linspace(0.5, 2.0, 4), jnp.float32)
        vae.mean_of_means.value = jnp.asarray(np.linspace(-1, 1, 4), jnp.float32)
        z = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 2, 3, 3)),
                        jnp.float32)
        back = vae.normalize_latents(vae.denormalize_latents(z))
        np.testing.assert_allclose(np.asarray(back), np.asarray(z), atol=1e-5)


class TestRFPerTokenStep:
    def test_step_tokens_matches_global_step(self):
        from apex_studio_tpu.schedulers import RectifiedFlowScheduler

        s = RectifiedFlowScheduler()
        s.set_timesteps(6)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 10, 4)), jnp.float32)
        v = jnp.asarray(np.random.default_rng(1).normal(size=(1, 10, 4)), jnp.float32)
        t0 = float(s.timesteps[0])
        per_tok = s.step_tokens(v, jnp.full((1, 10), t0), x)
        (global_,) = s.step(v, t0, x)
        np.testing.assert_allclose(np.asarray(per_tok), np.asarray(global_), atol=1e-6)

    def test_conditioned_tokens_hold_position(self):
        from apex_studio_tpu.schedulers import RectifiedFlowScheduler

        s = RectifiedFlowScheduler()
        s.set_timesteps(4)
        x = jnp.ones((1, 4, 2), jnp.float32)
        v = jnp.ones((1, 4, 2), jnp.float32)
        # token 0 is hard-conditioned (t_token = 0): no grid point lies below
        # it, so dt = 0 and it must not move.
        t_tok = jnp.asarray([[0.0, float(s.timesteps[0]),
                              float(s.timesteps[0]), float(s.timesteps[0])]])
        out = s.step_tokens(v, t_tok, x)
        np.testing.assert_allclose(np.asarray(out[0, 0]), 1.0, atol=1e-6)
        assert not np.allclose(np.asarray(out[0, 1]), 1.0)


class TestLTXEngine:
    def test_t2v_end_to_end(self, engine):
        frames = engine.run(
            prompt="a tiny video", height=16, width=16, num_frames=3,
            num_inference_steps=2, guidance_scale=2.0, seed=7,
        )
        assert len(frames) == 3
        assert frames[0].shape == (16, 16, 3)
        assert frames[0].dtype == np.uint8

    def test_return_latents_deterministic(self, engine):
        kw = dict(prompt="x", height=16, width=16, num_frames=3,
                  num_inference_steps=2, guidance_scale=1.0, seed=3,
                  return_latents=True)
        a = np.asarray(engine.run(**kw))
        b = np.asarray(engine.run(**kw))
        assert a.shape == (1, 8, 2, 4, 4)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_i2v_conditioning_pins_first_frame(self, engine):
        rng = np.random.default_rng(0)
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        lats = engine.run(
            prompt="x", image=img, height=16, width=16, num_frames=3,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
            image_cond_noise_scale=0.0, return_latents=True,
        )
        lats = np.asarray(lats)
        # the hard-conditioned first latent frame equals the encoded image
        z = np.asarray(engine._vae_encode_cond(
            engine._load_condition_media({"image": img}, 16, 16)))
        np.testing.assert_allclose(lats[:, :, :1], z, atol=1e-4)

    def test_stg_runs(self, engine):
        frames = engine.run(
            prompt="x", height=16, width=16, num_frames=3,
            num_inference_steps=2, guidance_scale=2.0, stg_scale=1.0,
            skip_block_list=[1], seed=1,
        )
        assert len(frames) == 3
