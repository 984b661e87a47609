"""CogVideoX 3D-causal video VAE in JAX/NNX.

Behavioral counterpart of the reference's ``src/vae/cogvideo/`` (diffusers
AutoencoderKLCogVideoX, 1,631 LoC): 8× spatial / 4× temporal compression into
16 latent channels, first frame kept un-compressed in time (causal "1 + 4k"
frame contract shared with Wan).

Structure (cited against the reference's vendored module, model.py lines):
- CogVideoXCausalConv3d (:85) → time padded by REPEATING THE FIRST FRAME
  (pad_mode "first", fake_context_parallel_forward:160), spatial symmetric
  zero padding
- encoder resnets: GroupNorm(32) → silu → causal conv ×2 + 1×1 shortcut
- DECODER resnets/mid/norm_out use CogVideoXSpatialNorm3D (:178): the norm is
  GroupNorm(f)·conv_y(zq) + conv_b(zq) where zq is the raw latent, nearest-
  resized to f's grid with the odd-T first/rest split
- encoder downsampling: temporal avg-pool-by-2 (first frame exempt when the
  chunk is odd) then spatially strided conv with (0,1),(0,1) padding
- decoder upsampling (diffusers CogVideoXUpsample3D): nearest 2× — T==1
  upsamples space only; odd T exempts frame 0 in time; EVEN T doubles every
  frame (no exemption) — then a per-frame conv
- no attention blocks anywhere (unlike Wan's mid attention); mid = 2 resnets
- no quant convs (use_quant_conv=False in every CogVideoX release)
- z scaled by ``scaling_factor`` (1.15258426), optional per-channel
  latents_mean/std like the Wan family

The reference streams frames with a fake-context-parallel conv cache; here the
causal semantics compile as one full-sequence XLA program (TPU-first) — the
full-sequence rules above are exactly what the chunked loop produces.
Numerics validated end-to-end against the reference oracle in
tests/test_parity_cogvideox_vae.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.models.vaes.wan_vae import Conv2dSame


@dataclasses.dataclass
class CogVideoXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    temporal_compression_ratio: int = 4
    scaling_factor: float = 1.15258426
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None

    @classmethod
    def from_dict(cls, cfg: dict) -> "CogVideoXVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        for key in ("block_out_channels", "latents_mean", "latents_std"):
            if key in kw and kw[key] is not None:
                kw[key] = tuple(kw[key])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @property
    def temporal_scale(self) -> int:
        return self.temporal_compression_ratio


class GroupNormCh(nnx.Module):
    """GroupNorm over the channel (last) axis of [..., C] feature maps."""

    def __init__(self, num_groups: int, dim: int, *, eps: float = 1e-6, rngs: nnx.Rngs):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))
        self.groups = min(num_groups, dim)
        while dim % self.groups:
            self.groups -= 1
        self.eps = eps

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        b = x.shape[0]
        c = x.shape[-1]
        x32 = x.astype(jnp.float32).reshape(b, -1, self.groups, c // self.groups)
        mean = x32.mean(axis=(1, 3), keepdims=True)
        var = x32.var(axis=(1, 3), keepdims=True)
        x32 = (x32 - mean) / jnp.sqrt(var + self.eps)
        x32 = x32.reshape(x.shape) * self.weight.value + self.bias.value
        return x32.astype(orig_dtype)


class CogCausalConv3d(nnx.Module):
    """Causal 3D conv with pad_mode="first": the time axis is front-padded by
    REPEATING THE FIRST FRAME k_t−1 times (reference model.py:160); spatial
    padding is symmetric zeros. NDHWC/DHWIO."""

    def __init__(self, cin: int, cout: int, kernel: int = 3, *, dtype, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(
            init(rngs.params(), (kernel, kernel, kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.k = kernel
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.k
        if k > 1:
            front = jnp.repeat(x[:, :1], k - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
            x = jnp.pad(x, ((0, 0), (0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + self.bias.value.astype(y.dtype)


def _nearest_time_hw(z: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
    """Nearest-resize [B,T,H,W,C] to (t,h,w). Integer up-factors reduce to
    repeats (identical to torch nearest); otherwise jax.image.resize."""
    b, tz, hz, wz, c = z.shape
    if t % tz == 0 and h % hz == 0 and w % wz == 0:
        z = jnp.repeat(z, t // tz, axis=1)
        z = jnp.repeat(z, h // hz, axis=2)
        return jnp.repeat(z, w // wz, axis=3)
    return jax.image.resize(z, (b, t, h, w, c), method="nearest")


class CogSpatialNorm3D(nnx.Module):
    """CogVideoXSpatialNorm3D (reference model.py:178): GroupNorm of f scaled
    and shifted by 1×1×1 causal convs of the nearest-resized latent zq, with
    the odd-T first/rest split."""

    def __init__(self, f_ch: int, zq_ch: int, groups: int, *, dtype, rngs: nnx.Rngs):
        self.norm_layer = GroupNormCh(groups, f_ch, rngs=rngs)
        self.conv_y = CogCausalConv3d(zq_ch, f_ch, kernel=1, dtype=dtype, rngs=rngs)
        self.conv_b = CogCausalConv3d(zq_ch, f_ch, kernel=1, dtype=dtype, rngs=rngs)

    def __call__(self, f: jnp.ndarray, zq: jnp.ndarray) -> jnp.ndarray:
        t, h, w = f.shape[1:4]
        if t > 1 and t % 2 == 1:
            z_first = _nearest_time_hw(zq[:, :1], 1, h, w)
            z_rest = _nearest_time_hw(zq[:, 1:], t - 1, h, w)
            zq = jnp.concatenate([z_first, z_rest], axis=1)
        else:
            zq = _nearest_time_hw(zq, t, h, w)
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class CogResnetBlock3D(nnx.Module):
    """GroupNorm (encoder) or latent-conditioned SpatialNorm3D (decoder,
    spatial_norm_dim set) → silu → first-padded causal conv, ×2 + shortcut."""

    def __init__(self, cin: int, cout: int, groups: int,
                 spatial_norm_dim: Optional[int] = None, *, dtype, rngs: nnx.Rngs):
        if spatial_norm_dim is None:
            self.norm1 = GroupNormCh(groups, cin, rngs=rngs)
            self.norm2 = GroupNormCh(groups, cout, rngs=rngs)
        else:
            self.norm1 = CogSpatialNorm3D(cin, spatial_norm_dim, groups,
                                          dtype=dtype, rngs=rngs)
            self.norm2 = CogSpatialNorm3D(cout, spatial_norm_dim, groups,
                                          dtype=dtype, rngs=rngs)
        self.spatial = spatial_norm_dim is not None
        self.conv1 = CogCausalConv3d(cin, cout, dtype=dtype, rngs=rngs)
        self.conv2 = CogCausalConv3d(cout, cout, dtype=dtype, rngs=rngs)
        self.conv_shortcut = (
            CogCausalConv3d(cin, cout, kernel=1, dtype=dtype, rngs=rngs)
            if cin != cout
            else None
        )

    def __call__(self, x: jnp.ndarray, zq: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n1 = self.norm1(x, zq) if self.spatial else self.norm1(x)
        h = self.conv1(nnx.silu(n1))
        n2 = self.norm2(h, zq) if self.spatial else self.norm2(h)
        h = self.conv2(nnx.silu(n2))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class CogDownsample3D(nnx.Module):
    """Optional temporal avg-pool-by-2 (first frame exempt when T is odd),
    then spatial stride-2 conv with (0,1),(0,1) padding."""

    def __init__(self, dim: int, compress_time: bool, *, dtype, rngs: nnx.Rngs):
        self.conv = Conv2dSame(dim, dim, stride=2, pad=((0, 1), (0, 1)), dtype=dtype, rngs=rngs)
        self.compress_time = compress_time

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.compress_time and x.shape[1] > 1:
            if x.shape[1] % 2 == 1:
                head, rest = x[:, :1], x[:, 1:]
                rest = 0.5 * (rest[:, 0::2] + rest[:, 1::2])
                x = jnp.concatenate([head, rest], axis=1)
            else:
                x = 0.5 * (x[:, 0::2] + x[:, 1::2])
        return self.conv(x)


class CogUpsample3D(nnx.Module):
    """Nearest 2× spatial (and 2× temporal when compressing, first frame
    exempt) followed by a 3×3 conv."""

    def __init__(self, dim: int, compress_time: bool, *, dtype, rngs: nnx.Rngs):
        self.conv = Conv2dSame(dim, dim, dtype=dtype, rngs=rngs)
        self.compress_time = compress_time

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.compress_time and x.shape[1] > 1:
            if x.shape[1] % 2 == 1:
                # odd T: frame 0 upsamples in space only
                head, rest = x[:, :1], x[:, 1:]
                rest = jnp.repeat(rest, 2, axis=1)
                x = jnp.concatenate([head, rest], axis=1)
            else:
                # even T: EVERY frame doubles (diffusers CogVideoXUpsample3D
                # has no first-frame exemption on the even path)
                x = jnp.repeat(x, 2, axis=1)
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return self.conv(x)


class CogDownBlock3D(nnx.Module):
    """N resnets + optional downsampler (diffusers CogVideoXDownBlock3D shape)."""

    def __init__(self, cin: int, cout: int, num_layers: int, groups: int,
                 downsample: bool, compress_time: bool, *, dtype, rngs: nnx.Rngs):
        res, cur = [], cin
        for _ in range(num_layers):
            res.append(CogResnetBlock3D(cur, cout, groups, dtype=dtype, rngs=rngs))
            cur = cout
        self.resnets = nnx.List(res)
        self.downsamplers = (
            nnx.List([CogDownsample3D(cout, compress_time, dtype=dtype, rngs=rngs)])
            if downsample
            else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class CogUpBlock3D(nnx.Module):
    def __init__(self, cin: int, cout: int, num_layers: int, groups: int,
                 upsample: bool, compress_time: bool, spatial_norm_dim: int,
                 *, dtype, rngs: nnx.Rngs):
        res, cur = [], cin
        for _ in range(num_layers):
            res.append(CogResnetBlock3D(cur, cout, groups, spatial_norm_dim,
                                        dtype=dtype, rngs=rngs))
            cur = cout
        self.resnets = nnx.List(res)
        self.upsamplers = (
            nnx.List([CogUpsample3D(cout, compress_time, dtype=dtype, rngs=rngs)])
            if upsample
            else None
        )

    def __call__(self, x: jnp.ndarray, zq: jnp.ndarray) -> jnp.ndarray:
        for r in self.resnets:
            x = r(x, zq)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class CogMidBlock3D(nnx.Module):
    def __init__(self, dim: int, groups: int,
                 spatial_norm_dim: Optional[int] = None, *, dtype, rngs: nnx.Rngs):
        self.resnets = nnx.List(
            [CogResnetBlock3D(dim, dim, groups, spatial_norm_dim,
                              dtype=dtype, rngs=rngs) for _ in range(2)]
        )

    def __call__(self, x: jnp.ndarray, zq: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for r in self.resnets:
            x = r(x, zq)
        return x


class CogEncoder3D(nnx.Module):
    def __init__(self, cfg: CogVideoXVAEConfig, *, dtype, rngs: nnx.Rngs):
        chans = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = CogCausalConv3d(cfg.in_channels, chans[0], dtype=dtype, rngs=rngs)
        n_temporal = {4: 2, 2: 1, 1: 0}.get(cfg.temporal_compression_ratio, 2)
        blocks, cur = [], chans[0]
        for i, cout in enumerate(chans):
            blocks.append(
                CogDownBlock3D(
                    cur, cout, cfg.layers_per_block, g,
                    downsample=i != len(chans) - 1, compress_time=i < n_temporal,
                    dtype=dtype, rngs=rngs,
                )
            )
            cur = cout
        self.down_blocks = nnx.List(blocks)
        self.mid_block = CogMidBlock3D(cur, g, dtype=dtype, rngs=rngs)
        self.norm_out = GroupNormCh(g, cur, rngs=rngs)
        self.conv_out = CogCausalConv3d(cur, 2 * cfg.latent_channels, dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(nnx.silu(self.norm_out(x)))


class CogDecoder3D(nnx.Module):
    def __init__(self, cfg: CogVideoXVAEConfig, *, dtype, rngs: nnx.Rngs):
        chans = tuple(reversed(cfg.block_out_channels))
        g = cfg.norm_num_groups
        zc = cfg.latent_channels
        self.conv_in = CogCausalConv3d(zc, chans[0], dtype=dtype, rngs=rngs)
        self.mid_block = CogMidBlock3D(chans[0], g, spatial_norm_dim=zc,
                                       dtype=dtype, rngs=rngs)
        n_temporal = {4: 2, 2: 1, 1: 0}.get(cfg.temporal_compression_ratio, 2)
        blocks, cur = [], chans[0]
        for i, cout in enumerate(chans):
            blocks.append(
                CogUpBlock3D(
                    cur, cout, cfg.layers_per_block + 1, g,
                    upsample=i != len(chans) - 1,
                    # the deepest up blocks expand time (mirrors diffusers i < level)
                    compress_time=i < n_temporal,
                    spatial_norm_dim=zc,
                    dtype=dtype, rngs=rngs,
                )
            )
            cur = cout
        self.up_blocks = nnx.List(blocks)
        self.norm_out = CogSpatialNorm3D(cur, zc, g, dtype=dtype, rngs=rngs)
        self.conv_out = CogCausalConv3d(cur, cfg.out_channels, dtype=dtype, rngs=rngs)

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_in(z)
        x = self.mid_block(x, z)
        for blk in self.up_blocks:
            x = blk(x, z)
        return self.conv_out(nnx.silu(self.norm_out(x, z)))


@vae_registry.register("cogvideo.base", aliases=("cogvideox", "AutoencoderKLCogVideoX"))
class AutoencoderKLCogVideoX(nnx.Module):
    config_class = CogVideoXVAEConfig

    def __init__(self, cfg: CogVideoXVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = CogEncoder3D(cfg, dtype=dtype, rngs=rngs)
        self.decoder = CogDecoder3D(cfg, dtype=dtype, rngs=rngs)

    # Public API is NCTHW like the reference engines.
    def encode(self, video: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        """[B,3,T,H,W] in [-1,1] → model-space latents (scaled)."""
        x = jnp.transpose(video, (0, 2, 3, 4, 1))
        moments = jnp.transpose(self.encoder(x), (0, 4, 1, 2, 3))
        mean, logvar = jnp.split(moments, 2, axis=1)
        z = mean
        if sample and noise is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) * noise
        return z * self.cfg.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        z = z / self.cfg.scaling_factor
        x = jnp.transpose(z, (0, 2, 3, 4, 1))
        out = self.decoder(x)
        return jnp.transpose(out, (0, 4, 1, 2, 3))
