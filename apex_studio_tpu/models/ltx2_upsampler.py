"""LTX-2 latent upsampler in JAX/NNX.

Counterpart of the reference's ``src/helpers/ltx2/upsampler.py`` —
LTXLatentUpsamplerModel (upsampler.py:197): a convolutional latent-space
super-resolver used between the two LTX-2 distilled stages. Stage 1 denoises
at base resolution, the upsampler lifts the latent grid spatially (and/or
temporally), then a short stage-2 refinement denoises the upsampled latents
at a handful of distilled sigmas.

Topology (upsampler.py:216-283):
- initial 3×3(×3) conv → GroupNorm(32) → SiLU
- ``num_blocks_per_stage`` ResBlocks (conv/GN/SiLU ×2, SiLU(h+res),
  upsampler.py:27)
- one of: spatial SpatialRationalResampler (PixelShuffle up by ``num``
  + fixed binomial blur-downsample by ``den``, per frame, upsampler.py:165),
  plain 2× spatial pixel-shuffle, temporal 2× pixel-shuffle (first frame
  dropped afterwards, upsampler.py:314), or joint 2×2×2 shuffle
- mirrored ResBlock stack → final 3×3(×3) conv back to latent channels

Layout is NCFHW at the interface to match the engine's latent convention;
convs run NDHWC internally for TPU-friendly layouts.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import helper_registry

_RATIONAL = {0.75: (3, 4), 1.5: (3, 2), 2.0: (2, 1), 4.0: (4, 1)}


@dataclass
class LTX2UpsamplerConfig:
    in_channels: int = 128
    mid_channels: int = 512
    num_blocks_per_stage: int = 4
    dims: int = 3
    spatial_upsample: bool = True
    temporal_upsample: bool = False
    spatial_scale: float = 2.0
    rational_resampler: bool = True

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LTX2UpsamplerConfig":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})


class _Conv(nnx.Module):
    """3×3 (2D) or 3×3×3 (3D) zero-padded conv over NC(F)HW input."""

    def __init__(self, in_ch: int, out_ch: int, *, dims: int = 3,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        k = 3
        init = nnx.initializers.lecun_normal()
        shape = (k,) * dims + (in_ch, out_ch)
        self.kernel = nnx.Param(init(rngs.params(), shape, dtype))
        self.bias = nnx.Param(jnp.zeros((out_ch,), dtype))
        self.dims = dims

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.kernel.value
        if self.dims == 3:
            y = jax.lax.conv_general_dilated(
                jnp.transpose(x, (0, 2, 3, 4, 1)).astype(w.dtype), w,
                window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ) + self.bias.value
            return jnp.transpose(y, (0, 4, 1, 2, 3))
        y = jax.lax.conv_general_dilated(
            jnp.transpose(x, (0, 2, 3, 1)).astype(w.dtype), w,
            window_strides=(1, 1), padding=[(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + self.bias.value
        return jnp.transpose(y, (0, 3, 1, 2))


class _GroupNorm(nnx.Module):
    """GroupNorm(32) over the channel axis of NC... input (torch semantics)."""

    def __init__(self, ch: int, *, groups: int = 32, dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.scale = nnx.Param(jnp.ones((ch,), dtype))
        self.bias = nnx.Param(jnp.zeros((ch,), dtype))
        self.groups = groups

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c = x.shape[:2]
        rest = x.shape[2:]
        g = self.groups
        xg = x.reshape(b, g, c // g, -1).astype(jnp.float32)
        mean = xg.mean(axis=(2, 3), keepdims=True)
        var = xg.var(axis=(2, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
        xg = xg.reshape(b, c, *rest)
        shape = (1, c) + (1,) * len(rest)
        return (xg * self.scale.value.reshape(shape)
                + self.bias.value.reshape(shape)).astype(x.dtype)


class ResBlock(nnx.Module):
    """upsampler.py:27 — conv/GN/SiLU ×2 with SiLU applied to (h+residual)."""

    def __init__(self, ch: int, *, dims: int = 3, dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.conv1 = _Conv(ch, ch, dims=dims, dtype=dtype, rngs=rngs)
        self.norm1 = _GroupNorm(ch, dtype=dtype, rngs=rngs)
        self.conv2 = _Conv(ch, ch, dims=dims, dtype=dtype, rngs=rngs)
        self.norm2 = _GroupNorm(ch, dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jax.nn.silu(self.norm1(self.conv1(x)))
        h = self.norm2(self.conv2(h))
        return jax.nn.silu(h + x)


def _pixel_shuffle_2d(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """b (c p1 p2) h w -> b c (h p1) (w p2)  (upsampler.py:76)."""
    b, cpp, h, w = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, c, p, p, h, w)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, c, h * p, w * p)


def _pixel_shuffle_3d(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """b (c p p p) f h w -> b c (f p) (h p) (w p)  (upsampler.py:66)."""
    b, cp3, f, h, w = x.shape
    c = cp3 // (p ** 3)
    x = x.reshape(b, c, p, p, p, f, h, w)
    x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))
    return x.reshape(b, c, f * p, h * p, w * p)


def _pixel_shuffle_temporal(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """b (c p) f h w -> b c (f p) h w  (upsampler.py:85)."""
    b, cp, f, h, w = x.shape
    c = cp // p
    x = x.reshape(b, c, p, f, h, w)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, c, f * p, h, w)


def _binomial_kernel(k: int) -> np.ndarray:
    row = np.array([math.comb(k - 1, i) for i in range(k)], np.float64)
    k2d = np.outer(row, row)
    return (k2d / k2d.sum()).astype(np.float32)


def _blur_downsample_2d(x: jnp.ndarray, stride: int, k: int = 5) -> jnp.ndarray:
    """Depthwise binomial anti-alias blur + stride (upsampler.py:102)."""
    if stride == 1:
        return x
    c = x.shape[1]
    w = jnp.asarray(_binomial_kernel(k))[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, c))  # HWIO with I=1, feature_group_count=c
    y = jax.lax.conv_general_dilated(
        jnp.transpose(x, (0, 2, 3, 1)).astype(w.dtype), w,
        window_strides=(stride, stride), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return jnp.transpose(y, (0, 3, 1, 2)).astype(x.dtype)


class SpatialRationalResampler(nnx.Module):
    """upsampler.py:165 — learned up by ``num`` (conv→pixel-shuffle), fixed
    anti-aliased down by ``den``; per-frame, temporal axis untouched."""

    def __init__(self, mid_channels: int, scale: float, *, dtype=jnp.float32,
                 rngs: nnx.Rngs):
        if float(scale) not in _RATIONAL:
            raise ValueError(f"unsupported scale {scale}")
        self.num, self.den = _RATIONAL[float(scale)]
        self.conv = _Conv(mid_channels, self.num ** 2 * mid_channels,
                          dims=2, dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c, f, h, w = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(b * f, c, h, w)
        x = self.conv(x)
        x = _pixel_shuffle_2d(x, self.num)
        x = _blur_downsample_2d(x, self.den)
        h2, w2 = x.shape[-2:]
        return jnp.transpose(x.reshape(b, f, c, h2, w2), (0, 2, 1, 3, 4))


@helper_registry.register(
    "ltx2.upsampler", aliases=("LTXLatentUpsamplerModel", "latent_upsampler"))
class LTXLatentUpsampler(nnx.Module):
    """Latent-space super-resolver (upsampler.py:197). NCFHW → NCFHW."""

    config_class = LTX2UpsamplerConfig

    def __init__(self, cfg: LTX2UpsamplerConfig = None, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        cfg = cfg or LTX2UpsamplerConfig()
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d, m = cfg.dims, cfg.mid_channels
        self.initial_conv = _Conv(cfg.in_channels, m, dims=d, dtype=param_dtype,
                                  rngs=rngs)
        self.initial_norm = _GroupNorm(m, dtype=param_dtype, rngs=rngs)
        self.res_blocks = nnx.List(
            [ResBlock(m, dims=d, dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_blocks_per_stage)])
        if cfg.spatial_upsample and cfg.temporal_upsample:
            self.upsampler_conv = _Conv(m, 8 * m, dims=3, dtype=param_dtype,
                                        rngs=rngs)
        elif cfg.spatial_upsample:
            if cfg.rational_resampler:
                self.upsampler = SpatialRationalResampler(
                    m, cfg.spatial_scale, dtype=param_dtype, rngs=rngs)
            else:
                self.upsampler_conv = _Conv(m, 4 * m, dims=2,
                                            dtype=param_dtype, rngs=rngs)
        elif cfg.temporal_upsample:
            self.upsampler_conv = _Conv(m, 2 * m, dims=3, dtype=param_dtype,
                                        rngs=rngs)
        else:
            raise ValueError("spatial_upsample or temporal_upsample required")
        self.post_upsample_res_blocks = nnx.List(
            [ResBlock(m, dims=d, dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_blocks_per_stage)])
        self.final_conv = _Conv(m, cfg.in_channels, dims=d, dtype=param_dtype,
                                rngs=rngs)

    def _per_frame(self, fn, x: jnp.ndarray) -> jnp.ndarray:
        b, c, f, h, w = x.shape
        y = fn(jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(b * f, c, h, w))
        c2, h2, w2 = y.shape[1:]
        return jnp.transpose(y.reshape(b, f, c2, h2, w2), (0, 2, 1, 3, 4))

    def __call__(self, latent: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.dims == 2:
            x = self._per_frame(
                lambda z: jax.nn.silu(self.initial_norm(self.initial_conv(z))),
                latent)
            for blk in self.res_blocks:
                x = self._per_frame(blk, x)
        else:
            x = jax.nn.silu(self.initial_norm(self.initial_conv(latent)))
            for blk in self.res_blocks:
                x = blk(x)

        if cfg.spatial_upsample and cfg.temporal_upsample:
            x = _pixel_shuffle_3d(self.upsampler_conv(x), 2)
        elif cfg.temporal_upsample:
            x = _pixel_shuffle_temporal(self.upsampler_conv(x), 2)
            # first upsampled frame encodes a single pixel frame — drop it
            # (upsampler.py:312-314)
            x = x[:, :, 1:]
        elif cfg.rational_resampler:
            x = self.upsampler(x)
        else:
            x = self._per_frame(
                lambda z: _pixel_shuffle_2d(self.upsampler_conv(z), 2), x)

        if cfg.dims == 2:
            for blk in self.post_upsample_res_blocks:
                x = self._per_frame(blk, x)
            x = self._per_frame(self.final_conv, x)
        else:
            for blk in self.post_upsample_res_blocks:
                x = blk(x)
            x = self.final_conv(x)
        return x


def upsample_latents(latents: jnp.ndarray, vae, upsampler) -> jnp.ndarray:
    """upsampler.py:334 upsample_video — denormalize latents with the video
    VAE's per-channel stats, run the upsampler, re-normalize."""
    m, s = vae._mean_std()
    z = latents
    if m is not None:
        z = z * s + m
    z = upsampler(z.astype(jnp.float32))
    if m is not None:
        z = (z - m) / s
    return z
