"""LTX-2 family on tiny random weights: dual-stream audio-video DiT, the
LTX-2 VAE topology, and the ti2v engine (reference: src/engine/ltx2/ti2v.py,
src/transformer/ltx2/base/model.py, src/vae/ltx2/model.py)."""

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_zimage import make_tokenizer

LTX2_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "ltx2-tiny-test", "name": "LTX2 Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "ltx2",
        "model_type": "ti2v",
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "RectifiedFlowScheduler",
                "config": {"num_train_timesteps": 1000},
            },
            {
                "type": "vae",
                "base": "ltx2.base",
                "config": {
                    "latent_channels": 4,
                    "block_out_channels": [8, 16, 16, 16],
                    "decoder_block_out_channels": [32, 64, 128],
                    "layers_per_block": [1, 1, 1, 1, 1],
                    "decoder_layers_per_block": [1, 1, 1, 1],
                    "patch_size": 4,
                },
            },
            {
                "type": "text_encoder",
                "base": "UMT5EncoderModel",
                "config": {
                    "vocab_size": 64, "d_model": 12, "d_kv": 6, "d_ff": 24,
                    "num_layers": 1, "num_heads": 2,
                    "per_layer_relative_bias": True,
                },
            },
            {
                "type": "transformer",
                "base": "ltx2.base",
                "config": {
                    "in_channels": 4, "out_channels": 4,
                    "num_attention_heads": 2, "attention_head_dim": 8,
                    "cross_attention_dim": 16,
                    "audio_in_channels": 4, "audio_out_channels": 4,
                    "audio_num_attention_heads": 2, "audio_attention_head_dim": 4,
                    "audio_cross_attention_dim": 8,
                    "num_layers": 1, "caption_channels": 12,
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2}},
    },
}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "ltx2-tiny.yml"
    path.write_text(yaml.safe_dump(LTX2_TINY))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path, model_type="ti2v")
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestLTX2Model:
    def _model(self):
        from apex_studio_tpu.models.transformers.ltx2 import (
            LTX2Config, LTX2VideoTransformer3D)

        cfg = LTX2Config.from_dict(LTX2_TINY["spec"]["components"][3]["config"])
        return LTX2VideoTransformer3D(cfg, dtype=jnp.float32,
                                      param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def test_dual_stream_shapes(self):
        m = self._model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 2 * 4 * 4, 4)), jnp.float32)
        xa = jnp.asarray(rng.normal(size=(1, 5, 4)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 12)), jnp.float32)
        v, a = m(x, xa, jnp.asarray([0.5]), ctx, video_shape=(2, 4, 4))
        assert v.shape == (1, 32, 4) and a.shape == (1, 5, 4)
        assert np.isfinite(np.asarray(v)).all() and np.isfinite(np.asarray(a)).all()

    def test_audio_affects_video(self):
        """The a2v cross-attention couples the streams."""
        m = self._model()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 32, 4)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 12)), jnp.float32)
        xa1 = jnp.asarray(rng.normal(size=(1, 5, 4)), jnp.float32)
        xa2 = xa1 + 1.0
        v1, _ = m(x, xa1, jnp.asarray([0.5]), ctx, video_shape=(2, 4, 4))
        v2, _ = m(x, xa2, jnp.asarray([0.5]), ctx, video_shape=(2, 4, 4))
        assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 1e-5

    def test_per_token_timesteps(self):
        m = self._model()
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 32, 4)), jnp.float32)
        xa = jnp.asarray(rng.normal(size=(1, 5, 4)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 12)), jnp.float32)
        t_tok = jnp.full((1, 32), 0.5, jnp.float32).at[:, :16].set(0.0)
        v, a = m(x, xa, t_tok, ctx, video_shape=(2, 4, 4))
        assert np.isfinite(np.asarray(v)).all()


class TestLTX2VAE:
    def test_roundtrip_shapes(self):
        from apex_studio_tpu.models.vaes.ltx2_vae import (
            AutoencoderKLLTX2, LTX2VAEConfig)

        cfg = LTX2VAEConfig.from_dict(LTX2_TINY["spec"]["components"][1]["config"])
        vae = AutoencoderKLLTX2(cfg, rngs=nnx.Rngs(0))
        assert vae.spatial_compression_ratio == 32
        assert vae.temporal_compression_ratio == 8
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 9, 64, 64)),
                        jnp.float32)
        z = vae.encode(x)
        assert z.shape == (1, 4, 2, 2, 2)
        out = vae.decode(z)
        assert out.shape == (1, 3, 9, 64, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_uniform_logvar_channels(self):
        from apex_studio_tpu.models.vaes.ltx2_vae import (
            AutoencoderKLLTX2, LTX2VAEConfig)

        cfg = LTX2VAEConfig.from_dict(LTX2_TINY["spec"]["components"][1]["config"])
        vae = AutoencoderKLLTX2(cfg, rngs=nnx.Rngs(0))
        x = jnp.ones((1, 3, 9, 64, 64), jnp.float32)
        moments = vae.encoder(x)
        assert moments.shape[1] == 2 * cfg.latent_channels
        logvar = np.asarray(moments[0, cfg.latent_channels:])
        # uniform: every logvar channel equals the shared one (model.py:828)
        assert np.allclose(logvar, logvar[:1])


class TestLTX2Engine:
    def test_t2v_produces_frames(self, engine):
        frames = engine.run(
            prompt="waves on a shore", height=64, width=64, num_frames=9,
            num_inference_steps=2, guidance_scale=2.0, seed=0,
        )
        assert len(frames) == 9
        assert frames[0].shape == (64, 64, 3) and frames[0].dtype == np.uint8

    def test_i2v_conditioning_and_audio_latents(self, engine):
        image = np.full((64, 64, 3), 120, np.uint8)
        lat, audio = engine.run(
            prompt="hold", image=image, height=64, width=64, num_frames=9,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
            return_latents=True, return_audio_latents=True,
        )
        lat = np.asarray(lat)
        audio = np.asarray(audio)
        assert lat.shape[2] == 2 and np.isfinite(lat).all()
        assert audio.ndim == 3 and np.isfinite(audio).all()
        # frame-0 latents equal the conditioned image latents across seeds
        lat2 = np.asarray(engine.run(
            prompt="hold", image=image, height=64, width=64, num_frames=9,
            num_inference_steps=2, guidance_scale=1.0, seed=99,
            return_latents=True))
        np.testing.assert_allclose(lat[:, :, 0], lat2[:, :, 0], atol=1e-5)

    def test_seed_determinism(self, engine):
        common = dict(prompt="z", height=64, width=64, num_frames=9,
                      num_inference_steps=2, guidance_scale=1.0, seed=7,
                      return_latents=True)
        a = np.asarray(engine.run(**common))
        b = np.asarray(engine.run(**common))
        np.testing.assert_array_equal(a, b)


class TestLTX2Audio:
    def test_audio_vae_roundtrip_and_patchify(self):
        from apex_studio_tpu.models.vaes.ltx2_audio_vae import (
            AutoencoderKLLTX2Audio, LTX2AudioVAEConfig)

        cfg = LTX2AudioVAEConfig(base_channels=8, ch_mult=(1, 2, 4),
                                 num_res_blocks=1, latent_channels=4,
                                 mel_bins=16)
        vae = AutoencoderKLLTX2Audio(cfg, rngs=nnx.Rngs(0))
        mel = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 12, 16)),
                          jnp.float32)
        z = vae.encode(mel)
        assert z.shape == (1, 4, 3, 4)
        out = vae.decode(z)
        # causal sizing: 4·T' − 3 mel frames
        assert out.shape == (1, 2, 9, 16)
        tok = vae.patchify(z)
        assert tok.shape == (1, 3, 16)
        back = vae.unpatchify(tok, 4, 4)
        np.testing.assert_allclose(np.asarray(back), np.asarray(z))

    def test_vocoder_upsampling(self):
        from apex_studio_tpu.models.ltx2_vocoder import (
            LTX2Vocoder, LTX2VocoderConfig)

        cfg = LTX2VocoderConfig(in_channels=8, hidden_channels=16,
                                out_channels=2, upsample_kernel_sizes=(4, 4),
                                upsample_factors=(2, 2),
                                resnet_kernel_sizes=(3,),
                                resnet_dilations=((1, 3),))
        voc = LTX2Vocoder(cfg, rngs=nnx.Rngs(0))
        mel = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2, 6, 4)),
                          jnp.float32)
        wav = voc(mel)
        assert wav.shape == (1, 2, 24)  # ×4 total upsample
        assert float(jnp.abs(wav).max()) <= 1.0  # tanh bounded

    def test_engine_decodes_audio_when_components_present(self, tmp_path_factory):
        import copy

        m = copy.deepcopy(LTX2_TINY)
        m["metadata"]["id"] = "ltx2-tiny-audio-test"
        # align DiT audio stream with the audio VAE token dim: z 4 × mel' 4 = 16
        tf = next(c for c in m["spec"]["components"] if c["type"] == "transformer")
        tf["config"]["audio_in_channels"] = 16
        tf["config"]["audio_out_channels"] = 16
        m["spec"]["components"] += [
            {"type": "vae", "name": "audio_vae", "base": "ltx2audio",
             "config": {"base_channels": 8, "ch_mult": [1, 2, 4],
                        "num_res_blocks": 1, "latent_channels": 4,
                        "mel_bins": 16}},
            {"type": "helper", "name": "vocoder", "base": "ltx2.vocoder",
             "config": {"in_channels": 32, "hidden_channels": 16,
                        "out_channels": 2, "upsample_kernel_sizes": [4, 4],
                        "upsample_factors": [2, 2],
                        "resnet_kernel_sizes": [3],
                        "resnet_dilations": [[1, 3]]}},
        ]
        path = tmp_path_factory.mktemp("m") / "ltx2-audio.yml"
        path.write_text(yaml.safe_dump(m))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="ti2v")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        out = eng.run(prompt="sound of rain", height=64, width=64, num_frames=9,
                      num_inference_steps=2, guidance_scale=1.0, seed=0)
        assert isinstance(out, tuple) and len(out) == 3
        frames, wav, sr = out
        assert len(frames) == 9
        assert wav.ndim == 2 and wav.shape[0] == 2
        assert sr == 24000


class TestLTX2KeyframeEngines:
    @pytest.fixture()
    def kf_engine(self, tmp_path):
        path = tmp_path / "ltx2-tiny.yml"
        path.write_text(yaml.safe_dump(LTX2_TINY))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="keyframe_interpolation")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        return eng

    def test_keyframe_interpolation_holds_keyframes(self, kf_engine, tmp_path, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        img0 = np.full((64, 64, 3), 30, np.uint8)
        img1 = np.full((64, 64, 3), 220, np.uint8)
        frames = kf_engine.run(
            prompt="interpolate", image=[img0, img1],
            image_pixel_frame_indices=[0, 8], image_strengths=[1.0, 1.0],
            height=64, width=64, num_frames=9, num_inference_steps=2,
            guidance_scale=1.0, seed=0,
        )
        assert len(frames) == 9
        assert frames[0].shape == (64, 64, 3)

    def test_ic_lora_accepts_conditioning_video(self, tmp_path, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        path = tmp_path / "ltx2-tiny.yml"
        path.write_text(yaml.safe_dump(LTX2_TINY))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="ic_lora")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        vid = [np.full((64, 64, 3), 100 + 10 * i, np.uint8) for i in range(9)]
        lat = eng.run(
            prompt="control", conditioning_video=vid,
            conditioning_video_strength=1.0, height=64, width=64,
            num_frames=9, num_inference_steps=2, guidance_scale=1.0, seed=1,
            return_latents=True,
        )
        lat = np.asarray(lat)
        assert lat.shape[2] == 2 and np.isfinite(lat).all()

    def test_multimodal_guidance_runs_stg(self, tmp_path):
        path = tmp_path / "ltx2-tiny.yml"
        path.write_text(yaml.safe_dump(LTX2_TINY))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="multimodal_guidance")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        lat = eng.run(
            prompt="stg", height=64, width=64, num_frames=9,
            num_inference_steps=1, guidance_scale=2.0, stg_scale=1.0,
            stg_blocks=[0], modality_scale=1.5, guidance_rescale=0.5,
            seed=2, return_latents=True,
        )
        assert np.isfinite(np.asarray(lat)).all()
