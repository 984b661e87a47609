import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from tests.test_engine_zimage import make_tokenizer

COG_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "cogvideox-tiny-test", "name": "CogVideoX Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "cogvideo",
        "model_type": ["t2v", "i2v", "v2v"],
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "CogVideoXDDIMScheduler",
                "config": {"num_train_timesteps": 1000, "snr_shift_scale": 3.0},
            },
            {
                "type": "vae",
                "base": "cogvideo.base",
                "config": {
                    "latent_channels": 4,
                    "block_out_channels": [8, 16],
                    "layers_per_block": 1,
                    "norm_num_groups": 4,
                    "temporal_compression_ratio": 2,
                },
            },
            {
                "type": "text_encoder",
                "base": "T5EncoderModel",
                "config": {
                    "vocab_size": 64,
                    "d_model": 32,
                    "d_kv": 8,
                    "d_ff": 48,
                    "num_layers": 1,
                    "num_heads": 4,
                },
            },
            {
                "type": "transformer",
                "base": "cogvideo.base",
                "config": {
                    "num_attention_heads": 2,
                    "attention_head_dim": 16,
                    "in_channels": 4,
                    "out_channels": 4,
                    "num_layers": 2,
                    "text_embed_dim": 32,
                    "time_embed_dim": 32,
                    "patch_size": 2,
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 6.0}},
    },
}


def make_engine(tmp_path, model_type, in_channels=None):
    doc = yaml.safe_load(yaml.safe_dump(COG_TINY))
    doc["spec"]["model_type"] = model_type
    if in_channels is not None:
        tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
        tf["config"]["in_channels"] = in_channels
    path = tmp_path / f"cog-tiny-{model_type}.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path, model_type=model_type)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestCogVideoXScheduler:
    def test_zero_terminal_snr(self):
        from apex_studio_tpu.schedulers.ddim import CogVideoXDDIMScheduler

        s = CogVideoXDDIMScheduler()
        assert s.alphas_cumprod[-1] == pytest.approx(0.0, abs=1e-12)
        assert s.alphas_cumprod[0] == pytest.approx(
            # snr-shifted first value survives the rescale
            s.alphas_cumprod[0], rel=1e-9
        )

    def test_trailing_spacing(self):
        from apex_studio_tpu.schedulers.ddim import CogVideoXDDIMScheduler

        s = CogVideoXDDIMScheduler()
        s.set_timesteps(4)
        assert s.timesteps[0] == 999.0 and len(s.timesteps) == 4
        assert (np.diff(s.timesteps) < 0).all()

    def test_v_prediction_recovers_clean_sample(self):
        """With the exact v = sqrt(a)·eps − sqrt(1−a)·x0, DDIM lands on x0."""
        from apex_studio_tpu.schedulers.ddim import CogVideoXDDIMScheduler

        s = CogVideoXDDIMScheduler(rescale_betas_zero_snr=True)
        s.set_timesteps(10)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
        a0 = float(s.alphas_cumprod[int(s.timesteps[0])])
        x = a0**0.5 * x0 + (1 - a0) ** 0.5 * eps
        for t in s.timesteps:
            i = s.index_for_timestep(float(t))
            a_t, _ = s._alpha_pair(i)
            v = a_t**0.5 * eps - (1 - a_t) ** 0.5 * x0
            (x,) = s.step(v, float(t), x)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)

    def test_add_noise_roundtrip_strength_zero(self):
        from apex_studio_tpu.schedulers.ddim import CogVideoXDDIMScheduler

        s = CogVideoXDDIMScheduler()
        s.set_timesteps(8)
        x0 = jnp.ones((2, 3))
        noisy = s.add_noise(x0, jnp.zeros_like(x0), s.timesteps[-1])
        # late timestep → low noise → close to x0
        assert float(jnp.abs(noisy - x0).max()) < 0.5


class TestCogVideoXModel:
    def test_forward_shape(self):
        from apex_studio_tpu.models.transformers.cogvideox import (
            CogVideoXConfig,
            CogVideoXTransformer3DModel,
        )

        cfg = CogVideoXConfig(
            num_attention_heads=2, attention_head_dim=16, in_channels=4,
            out_channels=4, num_layers=1, text_embed_dim=32, time_embed_dim=32,
        )
        m = CogVideoXTransformer3DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 3, 8, 8))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 32))
        out = m(x, jnp.asarray([500.0]), txt)
        assert out.shape == (1, 4, 3, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_vae_shapes(self):
        from apex_studio_tpu.models.vaes.cogvideox_vae import (
            AutoencoderKLCogVideoX,
            CogVideoXVAEConfig,
        )

        cfg = CogVideoXVAEConfig(
            latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
            norm_num_groups=4, temporal_compression_ratio=2,
        )
        vae = AutoencoderKLCogVideoX(cfg)
        video = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 5, 16, 16))
        z = vae.encode(video)
        assert z.shape == (1, 4, 3, 8, 8)  # T: 1+(5-1)/2, HW: /2
        out = vae.decode(z)
        assert out.shape == (1, 3, 5, 16, 16)
        assert np.isfinite(np.asarray(out)).all()


class TestCogVideoXEngines:
    def test_t2v_produces_frames(self, tmp_path):
        eng = make_engine(tmp_path, "t2v")
        frames = eng.run(
            prompt="a cat", height=16, width=16, num_frames=5,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 5
        assert frames[0].shape == (16, 16, 3) and frames[0].dtype == np.uint8

    def test_t2v_cfg_dynamic(self, tmp_path):
        eng = make_engine(tmp_path, "t2v")
        lat = eng.run(
            prompt="a cat", negative_prompt="bad", height=16, width=16,
            num_frames=3, num_inference_steps=2, guidance_scale=6.0,
            use_dynamic_cfg=True, seed=3, return_latents=True,
        )
        assert np.isfinite(np.asarray(lat)).all()

    def test_i2v_produces_frames(self, tmp_path):
        eng = make_engine(tmp_path, "i2v", in_channels=8)
        img = np.zeros((16, 16, 3), np.uint8)
        img[4:12, 4:12] = [200, 100, 50]
        frames = eng.run(
            image=img, prompt="animate", height=16, width=16, num_frames=5,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 5

    def test_v2v_produces_frames(self, tmp_path):
        eng = make_engine(tmp_path, "v2v")
        rng = np.random.default_rng(0)
        vid = [rng.integers(0, 255, (16, 16, 3), dtype=np.uint8) for _ in range(5)]
        frames = eng.run(
            video=vid, prompt="restyle", height=16, width=16, strength=0.5,
            num_inference_steps=4, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 5

    def test_seed_determinism(self, tmp_path):
        eng = make_engine(tmp_path, "t2v")
        kw = dict(prompt="x", height=16, width=16, num_frames=3,
                  num_inference_steps=2, guidance_scale=1.0, seed=9,
                  return_latents=True)
        a, b = eng.run(**kw), eng.run(**kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCogVideoXInpControl:
    def _engine(self, tmp_path, model_type, extra_in_channels, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        doc = yaml.safe_load(yaml.safe_dump(COG_TINY))
        doc["metadata"]["id"] = f"cog-{model_type}-tiny"
        doc["spec"]["model_type"] = model_type
        for c in doc["spec"]["components"]:
            if c["type"] == "transformer":
                c["config"] = dict(c["config"])
                c["config"]["in_channels"] = extra_in_channels
        path = tmp_path / f"cog-{model_type}.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine.registry import UniversalEngine
        from tests.test_engine_zimage import make_tokenizer

        eng = UniversalEngine(str(path))
        spec = eng._spec_for_type("text_encoder")
        if spec is not None:
            spec["tokenizer"] = make_tokenizer()
        return eng

    def test_control_runs(self, tmp_path, monkeypatch):
        # noise C=4 + control C=4 → in_channels 8
        eng = self._engine(tmp_path, "control", 8, monkeypatch)
        vid = [np.full((32, 32, 3), 90 + i, np.uint8) for i in range(9)]
        lat = eng.run(control_video=vid, prompt="c", height=32, width=32,
                      num_frames=9, num_inference_steps=2, guidance_scale=1.0,
                      seed=0, return_latents=True)
        assert np.isfinite(np.asarray(lat)).all()

    def test_inp_runs_and_mask_matters(self, tmp_path, monkeypatch):
        # noise C=4 + mask 1 + masked C=4 → in_channels 9
        eng = self._engine(tmp_path, "inp", 9, monkeypatch)
        vid = [np.full((32, 32, 3), 120, np.uint8) for _ in range(9)]
        mask = [np.zeros((32, 32), np.uint8) for _ in range(9)]
        for m in mask:
            m[8:24, 8:24] = 255
        common = dict(video=vid, prompt="fix", height=32, width=32,
                      num_frames=9, num_inference_steps=2, guidance_scale=1.0,
                      seed=1, return_latents=True)
        a = np.asarray(eng.run(mask_video=mask, **common))
        b = np.asarray(eng.run(mask_video=None, **common))
        assert np.isfinite(a).all() and np.isfinite(b).all()
        assert np.abs(a - b).max() > 1e-6
