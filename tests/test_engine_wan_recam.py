"""Wan ReCamMaster (camera-controlled re-rendering) on tiny weights
(reference: src/engine/wan/recam.py, src/helpers/wan/recam.py)."""

import copy

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer


class TestCameraEmbedder:
    def test_presets_relative_to_first_frame(self):
        from apex_studio_tpu.models.camera import WanRecamCameraEmbedder

        emb = WanRecamCameraEmbedder(temporal_scale=2)
        out = emb("zoom_in", num_frames=9)
        assert out.shape == (1, 5, 12)
        # first frame is the identity pose
        np.testing.assert_allclose(
            out[0, 0].reshape(3, 4),
            np.eye(4, dtype=np.float32)[:3], atol=1e-6)
        assert np.abs(out[0, -1] - out[0, 0]).max() > 1e-3

    def test_array_passthrough(self):
        from apex_studio_tpu.models.camera import WanRecamCameraEmbedder

        emb = WanRecamCameraEmbedder(temporal_scale=2)
        arr = np.random.default_rng(0).normal(size=(5, 12)).astype(np.float32)
        out = emb(arr, num_frames=9)
        np.testing.assert_allclose(out[0], arr[:5])


class TestRecamModel:
    def test_camera_changes_output(self):
        from apex_studio_tpu.models.transformers.wan import (
            WanConfig, WanRecamTransformer3DModel)

        cfg = WanConfig(num_attention_heads=2, attention_head_dim=24,
                        in_channels=4, out_channels=4, text_dim=32,
                        freq_dim=32, ffn_dim=64, num_layers=1)
        m = WanRecamTransformer3DModel(cfg, dtype=jnp.float32,
                                       param_dtype=jnp.float32,
                                       rngs=nnx.Rngs(0))
        # zero-init cam encoders need weights to express the conditioning
        for blk in m.blocks:
            k = blk.cam_encoder.kernel
            k.value = jnp.asarray(
                np.random.default_rng(1).normal(size=k.value.shape) * 0.1,
                jnp.float32)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 32)), jnp.float32)
        t = jnp.asarray([500.0], jnp.float32)
        cam1 = jnp.asarray(rng.normal(size=(1, 2, 12)), jnp.float32)
        cam2 = cam1 + 1.0
        a = m(x, t, ctx, cam_emb=cam1)
        b = m(x, t, ctx, cam_emb=cam2)
        assert a.shape == (1, 4, 4, 8, 8)
        assert np.abs(np.asarray(a - b)).max() > 1e-6


class TestRecamEngine:
    def test_rerender_with_orbit(self, tmp_path):
        doc = copy.deepcopy(WAN_TINY)
        doc["metadata"]["id"] = "wan-recam-tiny"
        doc["spec"]["model_type"] = "recam"
        tf = next(c for c in doc["spec"]["components"]
                  if c["type"] == "transformer")
        tf["base"] = "wan.recam"
        path = tmp_path / "wan-recam.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path)
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        rng = np.random.default_rng(2)
        vid = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
               for _ in range(5)]
        frames = eng.run(video=vid, prompt="same scene, new camera",
                         camera="orbit", height=32, width=32, num_frames=5,
                         num_inference_steps=2, guidance_scale=1.0, seed=0)
        assert len(frames) == 5 and frames[0].shape == (32, 32, 3)
