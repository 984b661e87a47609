"""Ovi joint audio+video engine + OviModel fusion transformer on tiny weights
(reference: src/transformer/wan/ovi/model.py, src/engine/wan/ovi.py) and the
MMAudio audio VAE (src/vae/mmaudio/)."""

import copy

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer

OVI_STREAM_V = {"dim": 48, "in_dim": 4, "ffn_dim": 64, "out_dim": 4,
                "text_dim": 32, "freq_dim": 32, "num_heads": 2,
                "num_layers": 2, "patch_size": [1, 2, 2]}
OVI_STREAM_A = {"dim": 48, "in_dim": 6, "ffn_dim": 48, "out_dim": 6,
                "text_dim": 32, "freq_dim": 32, "num_heads": 2,
                "num_layers": 2, "patch_size": [1, 1, 1]}


class TestOviModel:
    def _model(self):
        from apex_studio_tpu.models.transformers.wan_ovi import OviConfig, OviModel

        cfg = OviConfig(video=OVI_STREAM_V, audio=OVI_STREAM_A)
        return OviModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                        rngs=nnx.Rngs(0))

    def test_joint_forward_shapes(self):
        m = self._model()
        rng = np.random.default_rng(0)
        vid = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        aud = jnp.asarray(rng.normal(size=(1, 7, 6)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 5, 32)), jnp.float32)
        t = jnp.asarray([500.0], jnp.float32)
        v, a = m(vid, aud, t, ctx, ctx)
        assert v.shape == vid.shape
        assert a.shape == aud.shape

    def test_fusion_couples_modalities(self):
        m = self._model()
        rng = np.random.default_rng(1)
        vid = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 5, 32)), jnp.float32)
        t = jnp.asarray([500.0], jnp.float32)
        a1 = jnp.asarray(rng.normal(size=(1, 7, 6)), jnp.float32)
        a2 = a1 + 1.0
        v1, _ = m(vid, a1, t, ctx, ctx)
        v2, _ = m(vid, a2, t, ctx, ctx)
        # audio changes must flow into the video stream via fusion attention
        assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 1e-6

    def test_first_frame_clean_and_slg(self):
        m = self._model()
        rng = np.random.default_rng(2)
        vid = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        aud = jnp.asarray(rng.normal(size=(1, 7, 6)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 5, 32)), jnp.float32)
        t = jnp.asarray([500.0], jnp.float32)
        v, a = m(vid, aud, t, ctx, ctx, first_frame_is_clean=True)
        assert np.isfinite(np.asarray(v)).all()
        v_slg, _ = m(vid, aud, t, ctx, ctx, slg_layer=0)
        assert np.abs(np.asarray(v) - np.asarray(v_slg)).max() > 1e-6


class TestOviEngine:
    def _manifest(self):
        m = copy.deepcopy(WAN_TINY)
        m["metadata"]["id"] = "wan-ovi-tiny-test"
        m["spec"]["model_type"] = "ovi"
        tf = next(c for c in m["spec"]["components"] if c["type"] == "transformer")
        tf["base"] = "wan.ovi"
        tf["config"] = {"video": OVI_STREAM_V, "audio": OVI_STREAM_A}
        m["spec"]["components"].append({
            "type": "vae", "name": "audio_vae", "base": "mmaudio",
            "config": {"data_dim": 8, "embed_dim": 6, "hidden_dim": 8,
                       "vocoder_channels": 16, "upsample_rates": [2, 2],
                       "upsample_kernel_sizes": [4, 4],
                       "resblock_kernel_sizes": [3],
                       "resblock_dilations": [1, 3]},
        })
        return m

    def test_joint_generation_with_audio(self, tmp_path, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        path = tmp_path / "ovi.yml"
        path.write_text(yaml.safe_dump(self._manifest()))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(str(path))
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        out = eng.run(prompt="a drum", height=32, width=32, num_frames=5,
                      num_inference_steps=2, guidance_scale=2.0,
                      audio_guidance_scale=2.0, seed=0)
        frames, waveform, sr = out
        assert len(frames) == 5
        assert waveform.ndim == 1 and np.isfinite(waveform).all()
        assert sr == 16000

    def test_i2v_latents(self, tmp_path, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        path = tmp_path / "ovi2.yml"
        path.write_text(yaml.safe_dump(self._manifest()))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(str(path))
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        img = np.full((32, 32, 3), 120, np.uint8)
        vid_lat, aud_lat = eng.run(prompt="speak", image=img, height=32,
                                   width=32, num_frames=5,
                                   num_inference_steps=2, guidance_scale=1.5,
                                   audio_guidance_scale=1.5, seed=1,
                                   return_latents=True)
        assert np.isfinite(np.asarray(vid_lat)).all()
        assert np.isfinite(np.asarray(aud_lat)).all()
