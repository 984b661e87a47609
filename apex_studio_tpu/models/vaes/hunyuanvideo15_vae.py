"""HunyuanVideo 1.5 causal 3D video VAE (DC-AE-style shuffles) in JAX/NNX.

Counterpart of the reference's ``src/vae/hunyuanvideo15/model.py``
(AutoencoderKLHunyuanVideo15:735). Distinctives vs the Wan VAE:

- causal convs pad with **replicate** mode (time front k−1, spatial k//2)
- down/upsampling is pixel-shuffle ("dcae" rearrange) with channel-mean /
  repeat-interleave shortcuts; temporal shuffles special-case frame 0 so
  T frames ↔ 4(T−1)+1 pixels temporally and 16× spatially
- encoder/decoder add group-mean / repeat shortcuts around conv_in/out
- mid-block attention is full attention over (t·h·w) tokens with a
  block-causal time mask
- 32-channel latents scaled by a single scaling_factor (1.03682)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry


@dataclasses.dataclass
class HYV15VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 32
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 1024, 1024)
    layers_per_block: int = 2
    spatial_compression_ratio: int = 16
    temporal_compression_ratio: int = 4
    downsample_match_channel: bool = True
    scaling_factor: float = 1.03682

    @classmethod
    def from_dict(cls, cfg: dict) -> "HYV15VAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "block_out_channels" in kw:
            kw["block_out_channels"] = tuple(kw["block_out_channels"])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        return self.spatial_compression_ratio

    @property
    def temporal_scale(self) -> int:
        return self.temporal_compression_ratio


class CausalConv3dRep(nnx.Module):
    """3x3x3 (or 1x1x1) conv, replicate-padded, causal in time. NDHWC/DHWIO."""

    def __init__(self, cin: int, cout: int, kernel: int = 3, *, dtype, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (kernel, kernel, kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.k = kernel
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.k
        if k > 1:
            x = jnp.pad(
                x,
                ((0, 0), (k - 1, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)),
                mode="edge",
            )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + self.bias.value.astype(y.dtype)


class RMSNormCh(nnx.Module):
    def __init__(self, dim: int, *, rngs: nnx.Rngs):
        self.gamma = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.scale = float(dim) ** 0.5

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        norm = jnp.linalg.norm(x32, axis=-1, keepdims=True)
        return (x32 / jnp.maximum(norm, 1e-12) * self.scale * self.gamma.value).astype(x.dtype)


def _space_to_channel(x, r1, r2, r3):
    """[B,T·r1,H·r2,W·r3,C] → [B,T,H,W,r1·r2·r3·C] (channel order r1,r2,r3,c)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // r1, r1, h // r2, r2, w // r3, r3, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, t // r1, h // r2, w // r3, r1 * r2 * r3 * c)


def _channel_to_space(x, r1, r2, r3):
    """[B,T,H,W,r1·r2·r3·C] → [B,T·r1,H·r2,W·r3,C]."""
    b, t, h, w, pc = x.shape
    c = pc // (r1 * r2 * r3)
    x = x.reshape(b, t, h, w, r1, r2, r3, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t * r1, h * r2, w * r3, c)


class HYV15Downsample(nnx.Module):
    def __init__(self, cin: int, cout: int, temporal: bool, *, dtype, rngs: nnx.Rngs):
        factor = 8 if temporal else 4
        self.conv = CausalConv3dRep(cin, cout // factor, dtype=dtype, rngs=rngs)
        self.temporal = temporal
        self.group_size = factor * cin // cout

    def __call__(self, x):
        h = self.conv(x)
        if self.temporal:
            h_first = _space_to_channel(h[:, :1], 1, 2, 2)
            h_first = jnp.concatenate([h_first, h_first], axis=-1)
            h_next = _space_to_channel(h[:, 1:], 2, 2, 2)
            h = jnp.concatenate([h_first, h_next], axis=1)

            x_first = _space_to_channel(x[:, :1], 1, 2, 2)
            b, t, hh, ww, c = x_first.shape
            x_first = x_first.reshape(b, t, hh, ww, h.shape[-1], self.group_size // 2).mean(-1)
            x_next = _space_to_channel(x[:, 1:], 2, 2, 2)
            b, t, hh, ww, c = x_next.shape
            x_next = x_next.reshape(b, t, hh, ww, h.shape[-1], self.group_size).mean(-1)
            shortcut = jnp.concatenate([x_first, x_next], axis=1)
        else:
            h = _space_to_channel(h, 1, 2, 2)
            s = _space_to_channel(x, 1, 2, 2)
            b, t, hh, ww, c = s.shape
            shortcut = s.reshape(b, t, hh, ww, h.shape[-1], self.group_size).mean(-1)
        return h + shortcut


class HYV15Upsample(nnx.Module):
    def __init__(self, cin: int, cout: int, temporal: bool, *, dtype, rngs: nnx.Rngs):
        factor = 8 if temporal else 4
        self.conv = CausalConv3dRep(cin, cout * factor, dtype=dtype, rngs=rngs)
        self.temporal = temporal
        self.repeats = factor * cout // cin

    def __call__(self, x):
        h = self.conv(x)
        if self.temporal:
            h_first = _channel_to_space(h[:, :1], 1, 2, 2)
            h_first = h_first[..., : h_first.shape[-1] // 2]
            h_next = _channel_to_space(h[:, 1:], 2, 2, 2)
            h = jnp.concatenate([h_first, h_next], axis=1)

            x_first = _channel_to_space(x[:, :1], 1, 2, 2)
            x_first = jnp.repeat(x_first, self.repeats // 2, axis=-1)
            x_next = _channel_to_space(x[:, 1:], 2, 2, 2)
            x_next = jnp.repeat(x_next, self.repeats, axis=-1)
            shortcut = jnp.concatenate([x_first, x_next], axis=1)
        else:
            h = _channel_to_space(h, 1, 2, 2)
            shortcut = _channel_to_space(jnp.repeat(x, self.repeats, axis=-1), 1, 2, 2)
        return h + shortcut


class HYV15ResnetBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, *, dtype, rngs: nnx.Rngs):
        self.norm1 = RMSNormCh(cin, rngs=rngs)
        self.conv1 = CausalConv3dRep(cin, cout, dtype=dtype, rngs=rngs)
        self.norm2 = RMSNormCh(cout, rngs=rngs)
        self.conv2 = CausalConv3dRep(cout, cout, dtype=dtype, rngs=rngs)
        self.conv_shortcut = (
            CausalConv3dRep(cin, cout, kernel=1, dtype=dtype, rngs=rngs)
            if cin != cout
            else None
        )

    def __call__(self, x):
        h = self.conv1(nnx.silu(self.norm1(x)))
        h = self.conv2(nnx.silu(self.norm2(h)))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class HYV15AttnBlock(nnx.Module):
    """Full (t·h·w) attention with a block-causal time mask."""

    def __init__(self, dim: int, *, dtype, rngs: nnx.Rngs):
        from apex_studio_tpu.models.layers import Linear

        self.norm = RMSNormCh(dim, rngs=rngs)
        kw = dict(use_bias=True, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.to_q = Linear(dim, dim, **kw)
        self.to_k = Linear(dim, dim, **kw)
        self.to_v = Linear(dim, dim, **kw)
        self.proj_out = Linear(dim, dim, **kw)

    def __call__(self, x):
        from apex_studio_tpu.ops import attention as attention_op

        b, t, h, w, c = x.shape
        y = self.norm(x).reshape(b, t * h * w, c)
        q = self.to_q(y)[:, :, None, :]
        k = self.to_k(y)[:, :, None, :]
        v = self.to_v(y)[:, :, None, :]
        frame = np.arange(t * h * w) // (h * w)
        mask = jnp.asarray(frame[:, None] >= frame[None, :])[None, None]
        out = attention_op(q, k, v, mask=mask, backend="xla")[:, :, 0]
        return x + self.proj_out(out).reshape(b, t, h, w, c)


class HYV15MidBlock(nnx.Module):
    def __init__(self, dim: int, *, dtype, rngs: nnx.Rngs):
        self.resnets = nnx.List(
            [HYV15ResnetBlock(dim, dim, dtype=dtype, rngs=rngs) for _ in range(2)]
        )
        self.attentions = nnx.List([HYV15AttnBlock(dim, dtype=dtype, rngs=rngs)])

    def __call__(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class HYV15Encoder(nnx.Module):
    def __init__(self, cfg: HYV15VAEConfig, *, dtype, rngs: nnx.Rngs):
        ch = cfg.block_out_channels
        z2 = cfg.latent_channels * 2
        self.group_size = ch[-1] // z2
        self.conv_in = CausalConv3dRep(cfg.in_channels, ch[0], dtype=dtype, rngs=rngs)
        blocks = []
        cin = ch[0]
        n_spatial = int(math.log2(cfg.spatial_compression_ratio))
        t_start = int(math.log2(cfg.spatial_compression_ratio // cfg.temporal_compression_ratio))
        for i, cout in enumerate(ch):
            res = nnx.List(
                [HYV15ResnetBlock(cin if j == 0 else cout, cout, dtype=dtype, rngs=rngs)
                 for j in range(cfg.layers_per_block)]
            )
            down = None
            if i < n_spatial:
                d_out = ch[i + 1] if cfg.downsample_match_channel else cout
                down = HYV15Downsample(cout, d_out, temporal=(i >= t_start),
                                       dtype=dtype, rngs=rngs)
                cin = d_out
            else:
                cin = cout
            blocks.append(nnx.Dict(resnets=res, downsamplers=nnx.List([down]) if down else None))
        self.down_blocks = nnx.List(blocks)
        self.mid_block = HYV15MidBlock(ch[-1], dtype=dtype, rngs=rngs)
        self.norm_out = RMSNormCh(ch[-1], rngs=rngs)
        self.conv_out = CausalConv3dRep(ch[-1], z2, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk["resnets"]:
                x = r(x)
            if blk["downsamplers"] is not None:
                x = blk["downsamplers"][0](x)
        x = self.mid_block(x)
        b, t, h, w, c = x.shape
        shortcut = x.reshape(b, t, h, w, c // self.group_size, self.group_size).mean(-1)
        x = self.conv_out(nnx.silu(self.norm_out(x)))
        return x + shortcut


class HYV15Decoder(nnx.Module):
    def __init__(self, cfg: HYV15VAEConfig, *, dtype, rngs: nnx.Rngs):
        ch = tuple(reversed(cfg.block_out_channels))
        self.repeat = ch[0] // cfg.latent_channels
        self.conv_in = CausalConv3dRep(cfg.latent_channels, ch[0], dtype=dtype, rngs=rngs)
        self.mid_block = HYV15MidBlock(ch[0], dtype=dtype, rngs=rngs)
        blocks = []
        cin = ch[0]
        n_spatial = int(math.log2(cfg.spatial_compression_ratio))
        n_temporal = int(math.log2(cfg.temporal_compression_ratio))
        for i, cout in enumerate(ch):
            res = nnx.List(
                [HYV15ResnetBlock(cin if j == 0 else cout, cout, dtype=dtype, rngs=rngs)
                 for j in range(cfg.layers_per_block + 1)]
            )
            up = None
            if i < n_spatial:
                u_out = ch[i + 1] if cfg.downsample_match_channel else cout
                up = HYV15Upsample(cout, u_out, temporal=(i < n_temporal),
                                   dtype=dtype, rngs=rngs)
                cin = u_out
            else:
                cin = cout
            blocks.append(nnx.Dict(resnets=res, upsamplers=nnx.List([up]) if up else None))
        self.up_blocks = nnx.List(blocks)
        self.norm_out = RMSNormCh(ch[-1], rngs=rngs)
        self.conv_out = CausalConv3dRep(ch[-1], cfg.out_channels, dtype=dtype, rngs=rngs)

    def __call__(self, z):
        x = self.conv_in(z) + jnp.repeat(z, self.repeat, axis=-1)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            for r in blk["resnets"]:
                x = r(x)
            if blk["upsamplers"] is not None:
                x = blk["upsamplers"][0](x)
        return self.conv_out(nnx.silu(self.norm_out(x)))


@vae_registry.register("hunyuanvideo15", aliases=("AutoencoderKLHunyuanVideo15", "hunyuanvideo15.base"))
class AutoencoderKLHunyuanVideo15(nnx.Module):
    config_class = HYV15VAEConfig

    def __init__(self, cfg: HYV15VAEConfig, *, dtype=jnp.float32, param_dtype=jnp.float32,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = HYV15Encoder(cfg, dtype=dtype, rngs=rngs)
        self.decoder = HYV15Decoder(cfg, dtype=dtype, rngs=rngs)

    def encode(self, video: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        """[B,3,T,H,W] → scaled latents [B,z,T',H/16,W/16]."""
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
