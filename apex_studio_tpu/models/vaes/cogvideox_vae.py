"""CogVideoX 3D-causal video VAE in JAX/NNX.

Behavioral counterpart of the reference's ``src/vae/cogvideo/`` (diffusers
AutoencoderKLCogVideoX, 1,631 LoC): 8× spatial / 4× temporal compression into
16 latent channels, first frame kept un-compressed in time (causal "1 + 4k"
frame contract shared with Wan).

Structure (cited against the diffusers module the reference vendors):
- CogVideoXCausalConv3d → front-padded time conv (same trick as wan_vae)
- resnet blocks: GroupNorm(32) → silu → causal conv ×2 + 1×1 shortcut
- encoder downsampling: temporal avg-pool-by-2 (first frame exempt) followed
  by a spatially strided conv with asymmetric (0,1),(0,1) padding
- decoder upsampling: nearest 2× in space, 2× in time (first frame exempt)
  followed by a conv
- no attention blocks anywhere (unlike Wan's mid attention); mid = 2 resnets
- no quant convs (use_quant_conv=False in every CogVideoX release)
- z scaled by ``scaling_factor`` (1.15258426), optional per-channel
  latents_mean/std like the Wan family

The reference streams frames with a fake-context-parallel conv cache; here the
causal semantics compile as one full-sequence XLA program (TPU-first).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.models.vaes.wan_vae import CausalConv3d, Conv2dSame


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


class CogResnetBlock3D(nnx.Module):
    def __init__(self, cin: int, cout: int, groups: int, *, dtype, rngs: nnx.Rngs):
        self.norm1 = GroupNormCh(groups, cin, rngs=rngs)
        self.conv1 = CausalConv3d(cin, cout, dtype=dtype, rngs=rngs)
        self.norm2 = GroupNormCh(groups, cout, rngs=rngs)
        self.conv2 = CausalConv3d(cout, cout, dtype=dtype, rngs=rngs)
        self.conv_shortcut = (
            CausalConv3d(cin, cout, kernel=1, padding=0, dtype=dtype, rngs=rngs)
            if cin != cout
            else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.conv1(nnx.silu(self.norm1(x)))
        h = self.conv2(nnx.silu(self.norm2(h)))
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
            head, rest = x[:, :1], x[:, 1:]
            rest = jnp.repeat(rest, 2, axis=1)
            x = jnp.concatenate([head, rest], axis=1)
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
                 upsample: bool, compress_time: bool, *, dtype, rngs: nnx.Rngs):
        res, cur = [], cin
        for _ in range(num_layers):
            res.append(CogResnetBlock3D(cur, cout, groups, dtype=dtype, rngs=rngs))
            cur = cout
        self.resnets = nnx.List(res)
        self.upsamplers = (
            nnx.List([CogUpsample3D(cout, compress_time, dtype=dtype, rngs=rngs)])
            if upsample
            else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class CogMidBlock3D(nnx.Module):
    def __init__(self, dim: int, groups: int, *, dtype, rngs: nnx.Rngs):
        self.resnets = nnx.List(
            [CogResnetBlock3D(dim, dim, groups, dtype=dtype, rngs=rngs) for _ in range(2)]
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for r in self.resnets:
            x = r(x)
        return x


class CogEncoder3D(nnx.Module):
    def __init__(self, cfg: CogVideoXVAEConfig, *, dtype, rngs: nnx.Rngs):
        chans = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = CausalConv3d(cfg.in_channels, chans[0], dtype=dtype, rngs=rngs)
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
        self.conv_out = CausalConv3d(cur, 2 * cfg.latent_channels, dtype=dtype, rngs=rngs)

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
        self.conv_in = CausalConv3d(cfg.latent_channels, chans[0], dtype=dtype, rngs=rngs)
        self.mid_block = CogMidBlock3D(chans[0], g, dtype=dtype, rngs=rngs)
        n_temporal = {4: 2, 2: 1, 1: 0}.get(cfg.temporal_compression_ratio, 2)
        blocks, cur = [], chans[0]
        for i, cout in enumerate(chans):
            blocks.append(
                CogUpBlock3D(
                    cur, cout, cfg.layers_per_block + 1, g,
                    upsample=i != len(chans) - 1,
                    # the deepest up blocks expand time (mirrors diffusers i < level)
                    compress_time=i < n_temporal,
                    dtype=dtype, rngs=rngs,
                )
            )
            cur = cout
        self.up_blocks = nnx.List(blocks)
        self.norm_out = GroupNormCh(g, cur, rngs=rngs)
        self.conv_out = CausalConv3d(cur, cfg.out_channels, dtype=dtype, rngs=rngs)

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_in(z)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            x = blk(x)
        return self.conv_out(nnx.silu(self.norm_out(x)))


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
