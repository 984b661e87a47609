"""LTX-2 latent upsampler: numeric parity against a torch oracle that
re-implements the reference semantics (src/helpers/ltx2/upsampler.py:197)
with reference state-dict naming, plus the engine's staged stage-2 path."""

import math

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from tests.test_engine_zimage import make_tokenizer


class _TRes(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv3d(ch, ch, 3, padding=1)
        self.norm1 = nn.GroupNorm(32, ch)
        self.conv2 = nn.Conv3d(ch, ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, ch)

    def forward(self, x):
        h = F.silu(self.norm1(self.conv1(x)))
        h = self.norm2(self.conv2(h))
        return F.silu(h + x)


class _TRational(nn.Module):
    def __init__(self, mid, num, den):
        super().__init__()
        self.num, self.den = num, den
        self.conv = nn.Conv2d(mid, num * num * mid, 3, padding=1)

    def forward(self, x):  # [BF, C, H, W]
        x = self.conv(x)
        x = F.pixel_shuffle(x, self.num)
        if self.den > 1:
            k = 5
            row = torch.tensor([math.comb(k - 1, i) for i in range(k)],
                               dtype=torch.float32)
            k2d = (row[:, None] @ row[None, :])
            k2d = k2d / k2d.sum()
            c = x.shape[1]
            w = k2d[None, None].expand(c, 1, k, k)
            x = F.conv2d(x, w, stride=self.den, padding=k // 2, groups=c)
        return x


class _TOracle(nn.Module):
    """Reference LTXLatentUpsamplerModel topology with reference key names."""

    def __init__(self, cin, mid, nblk, scale=2.0, temporal=False):
        super().__init__()
        self.temporal = temporal
        self.initial_conv = nn.Conv3d(cin, mid, 3, padding=1)
        self.initial_norm = nn.GroupNorm(32, mid)
        self.res_blocks = nn.ModuleList([_TRes(mid) for _ in range(nblk)])
        if temporal:
            self.upsampler = nn.Sequential(nn.Conv3d(mid, 2 * mid, 3, padding=1))
        else:
            num, den = {0.75: (3, 4), 1.5: (3, 2), 2.0: (2, 1),
                        4.0: (4, 1)}[scale]
            self.upsampler = _TRational(mid, num, den)
        self.post_upsample_res_blocks = nn.ModuleList(
            [_TRes(mid) for _ in range(nblk)])
        self.final_conv = nn.Conv3d(mid, cin, 3, padding=1)

    def forward(self, x):  # [B, C, F, H, W]
        b, _, f, _, _ = x.shape
        x = F.silu(self.initial_norm(self.initial_conv(x)))
        for blk in self.res_blocks:
            x = blk(x)
        if self.temporal:
            x = self.upsampler(x)
            # b (c p) f h w -> b c (f p) h w, then drop frame 0
            bb, cp, ff, hh, ww = x.shape
            x = (x.view(bb, cp // 2, 2, ff, hh, ww)
                 .permute(0, 1, 3, 2, 4, 5).reshape(bb, cp // 2, ff * 2, hh, ww))
            x = x[:, :, 1:]
        else:
            x = x.permute(0, 2, 1, 3, 4).flatten(0, 1)
            x = self.upsampler(x)
            h2, w2 = x.shape[-2:]
            x = x.view(b, f, -1, h2, w2).permute(0, 2, 1, 3, 4)
        for blk in self.post_upsample_res_blocks:
            x = blk(x)
        return self.final_conv(x)


def _jax_from_oracle(oracle, cfg):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.ltx2_upsampler import LTXLatentUpsampler

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    model = LTXLatentUpsampler(cfg, rngs=nnx.Rngs(0))
    missing, unexpected = apply_state_dict(
        model, convert_keys("ltx2_upsampler", sd), strict=False)
    assert not unexpected, unexpected[:5]
    assert not missing, missing[:5]
    return model


class TestUpsamplerParity:
    def test_rational_2x_matches_oracle(self):
        from apex_studio_tpu.models.ltx2_upsampler import LTX2UpsamplerConfig

        torch.manual_seed(0)
        oracle = _TOracle(4, 32, 1, scale=2.0).eval()
        model = _jax_from_oracle(oracle, LTX2UpsamplerConfig(
            in_channels=4, mid_channels=32, num_blocks_per_stage=1,
            spatial_scale=2.0))
        x = np.random.default_rng(0).normal(
            size=(1, 4, 3, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x)).numpy()
        out = np.asarray(model(jnp.asarray(x)))
        assert out.shape == ref.shape == (1, 4, 3, 16, 16)
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_rational_1_5x_blur_down_matches_oracle(self):
        from apex_studio_tpu.models.ltx2_upsampler import LTX2UpsamplerConfig

        torch.manual_seed(1)
        oracle = _TOracle(4, 32, 1, scale=1.5).eval()
        model = _jax_from_oracle(oracle, LTX2UpsamplerConfig(
            in_channels=4, mid_channels=32, num_blocks_per_stage=1,
            spatial_scale=1.5))
        x = np.random.default_rng(1).normal(
            size=(1, 4, 2, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x)).numpy()
        out = np.asarray(model(jnp.asarray(x)))
        assert out.shape == ref.shape == (1, 4, 2, 12, 12)
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_temporal_2x_drops_first_frame(self):
        from apex_studio_tpu.models.ltx2_upsampler import LTX2UpsamplerConfig

        torch.manual_seed(2)
        oracle = _TOracle(4, 32, 1, temporal=True).eval()
        model = _jax_from_oracle(oracle, LTX2UpsamplerConfig(
            in_channels=4, mid_channels=32, num_blocks_per_stage=1,
            spatial_upsample=False, temporal_upsample=True))
        x = np.random.default_rng(2).normal(
            size=(1, 4, 3, 6, 6)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x)).numpy()
        out = np.asarray(model(jnp.asarray(x)))
        assert out.shape == ref.shape == (1, 4, 5, 6, 6)
        np.testing.assert_allclose(out, ref, atol=2e-4)


class TestEngineStagedUpsample:
    def test_ti2v_upsample_doubles_resolution(self, tmp_path):
        import copy

        from tests.test_engine_ltx2 import LTX2_TINY

        m = copy.deepcopy(LTX2_TINY)
        m["metadata"]["id"] = "ltx2-tiny-upsample-test"
        m["spec"]["components"].append(
            {"type": "helper", "name": "latent_upsampler",
             "base": "ltx2.upsampler",
             "config": {"in_channels": 4, "mid_channels": 32,
                        "num_blocks_per_stage": 1, "spatial_scale": 2.0}})
        path = tmp_path / "ltx2-up.yml"
        path.write_text(yaml.safe_dump(m))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="ti2v")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        lat = eng.run(prompt="upscale me", height=64, width=64, num_frames=9,
                      num_inference_steps=2, guidance_scale=1.0, seed=0,
                      upsample=True, return_latents=True)
        lat = np.asarray(lat)
        # base 64×64 → latent 2×2 (32× spatial VAE) → stage-2 grid 4×4
        assert lat.shape[-2:] == (4, 4)
        assert np.isfinite(lat).all()


class TestKeyframeStagedUpsample:
    def test_keyframe_upsample_doubles_resolution(self, tmp_path):
        import copy

        from tests.test_engine_ltx2 import LTX2_TINY

        m = copy.deepcopy(LTX2_TINY)
        m["metadata"]["id"] = "ltx2-kf-upsample-test"
        m["spec"]["components"].append(
            {"type": "helper", "name": "latent_upsampler",
             "base": "ltx2.upsampler",
             "config": {"in_channels": 4, "mid_channels": 32,
                        "num_blocks_per_stage": 1, "spatial_scale": 2.0}})
        path = tmp_path / "ltx2-kf-up.yml"
        path.write_text(yaml.safe_dump(m))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="keyframe_interpolation")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        img0 = np.full((64, 64, 3), 40, np.uint8)
        img1 = np.full((64, 64, 3), 210, np.uint8)
        lat = eng.run(prompt="interp", image=[img0, img1],
                      image_pixel_frame_indices=[0, 8],
                      image_strengths=[1.0, 1.0], height=64, width=64,
                      num_frames=9, num_inference_steps=2,
                      guidance_scale=1.0, seed=0, upsample=True,
                      return_latents=True)
        lat = np.asarray(lat)
        assert lat.shape[-2:] == (4, 4)  # 2×2 base grid lifted 2×
        assert np.isfinite(lat).all()
