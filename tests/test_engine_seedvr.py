"""SeedVR2 windowed NaDiT + upscale engine on tiny weights (reference:
src/transformer/seedvr/base_v2/, src/engine/seedvr/upscale.py)."""

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_zimage import make_tokenizer

SEEDVR_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "seedvr-tiny-test", "name": "SeedVR Tiny",
                 "version": "1.0.0"},
    "spec": {
        "engine": "seedvr",
        "model_type": "upscale",
        "engine_type": "jax",
        "components": [
            {"type": "scheduler", "base": "FlowMatchEulerDiscreteScheduler",
             "config": {"num_train_timesteps": 1000}},
            {"type": "vae", "base": "seedvr",
             "config": {"latent_channels": 4, "block_out_channels": [8, 16],
                        "layers_per_block": 1, "norm_num_groups": 4,
                        "temporal_scale_num": 1,
                        "use_quant_conv": False, "use_post_quant_conv": False,
                        "spatial_downsample_factor": 2,
                        "temporal_downsample_factor": 2}},
            {"type": "text_encoder", "base": "T5EncoderModel",
             "config": {"vocab_size": 64, "d_model": 12, "d_kv": 6,
                        "d_ff": 24, "num_layers": 1, "num_heads": 2,
                        "per_layer_relative_bias": True}},
            {"type": "transformer", "base": "seedvr.base",
             "config": {"vid_in_channels": 8, "vid_out_channels": 4,
                        "vid_dim": 16, "txt_in_dim": 12, "txt_dim": 16,
                        "emb_dim": 96, "heads": 2, "head_dim": 8,
                        "expand_ratio": 2, "num_layers": 2,
                        "patch_size": [1, 2, 2], "window": [2, 2, 2]}},
        ],
        "defaults": {"run": {"num_inference_steps": 1}},
    },
}


class TestSeedVRModel:
    def _model(self):
        from apex_studio_tpu.models.transformers.seedvr import (
            SeedVRConfig, SeedVR2Transformer3DModel)

        cfg = SeedVRConfig.from_dict(
            SEEDVR_TINY["spec"]["components"][3]["config"])
        return SeedVR2Transformer3DModel(cfg, dtype=jnp.float32,
                                         param_dtype=jnp.float32,
                                         rngs=nnx.Rngs(0))

    def test_forward_and_window_locality(self):
        m = self._model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 8, 3, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 5, 12)), jnp.float32)
        t = jnp.asarray([500.0], jnp.float32)
        out = m(x, t, ctx)
        assert out.shape == (1, 4, 3, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_odd_grid_padding(self):
        m = self._model()
        rng = np.random.default_rng(1)
        # 3 latent frames with window count 2 → uneven windows exercise pad
        x = jnp.asarray(rng.normal(size=(1, 8, 5, 12, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 5, 12)), jnp.float32)
        out = m(x, jnp.asarray([100.0]), ctx)
        assert out.shape == (1, 4, 5, 12, 8)

    def test_base_v2_variant(self):
        """3B-style knobs: mm_layers weight sharing, SwiGLU, mmrope3d,
        final rms + out-ada (reference seedvr2-3b.yml:134-159)."""
        from apex_studio_tpu.models.transformers.seedvr import (
            SeedVRConfig, SeedVR2Transformer3DModel)

        cfg = SeedVRConfig(
            vid_in_channels=8, vid_out_channels=4, vid_dim=16, txt_in_dim=12,
            txt_dim=16, emb_dim=96, heads=2, head_dim=8, expand_ratio=2,
            num_layers=3, mm_layers=1, mlp_type="swiglu",
            rope_type="mmrope3d", rope_dim=6, vid_out_norm="rms",
            patch_size=(1, 2, 2), window=(2, 2, 2))
        m = SeedVR2Transformer3DModel(cfg, dtype=jnp.float32,
                                      param_dtype=jnp.float32,
                                      rngs=nnx.Rngs(0))
        # layer 0 is multimodal (separate weights), layers 1-2 share
        assert m.blocks[0].attn.proj_qkv.all is None
        assert m.blocks[1].attn.proj_qkv.all is not None
        # last layer drops the txt mlp/ada branches (vid_only)
        assert m.blocks[2].vid_only
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(1, 8, 3, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 5, 12)), jnp.float32)
        out = m(x, jnp.asarray([500.0]), ctx)
        assert out.shape == (1, 4, 3, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_shifted_windows_ragged(self):
        """Shifted layers produce ragged edge windows (window.py:34
        make_shifted_720Pwindows_bysize) — partition must stay a permutation."""
        from apex_studio_tpu.models.transformers.seedvr import _build_windows

        win_idx, valid, coord, inv = _build_windows(4, 9, 7, (2, 2, 2), True)
        ids = win_idx[valid]
        assert sorted(ids.tolist()) == list(range(4 * 9 * 7))
        # inverse permutation round-trips
        import numpy as _np
        flat_slots = (_np.arange(win_idx.shape[0])[:, None] * win_idx.shape[1]
                      + _np.arange(win_idx.shape[1])[None, :])
        assert (flat_slots.reshape(-1)[inv] >= 0).all()


class TestSeedVREngine:
    def _engine(self, tmp_path):
        path = tmp_path / "seedvr.yml"
        path.write_text(yaml.safe_dump(SEEDVR_TINY))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path)
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        return eng

    def test_video_upscale_2x(self, tmp_path):
        eng = self._engine(tmp_path)
        rng = np.random.default_rng(2)
        vid = [rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
               for _ in range(5)]
        frames = eng.run(video=vid, upscale_factor=2.0,
                         num_inference_steps=1, seed=0)
        assert len(frames) == 5
        assert frames[0].shape == (32, 32, 3)

    def test_image_upscale(self, tmp_path):
        eng = self._engine(tmp_path)
        img = np.full((16, 16, 3), 128, np.uint8)
        frames = eng.run(image=img, upscale_factor=2.0,
                         num_inference_steps=2, guidance_scale=2.0, seed=1)
        assert len(frames) == 1 and frames[0].shape == (32, 32, 3)
