"""HunyuanImage-3.0 3D-conv DC-AE VAE (AutoencoderKLConv3D) in JAX/NNX.

Counterpart of the reference's ``src/vae/hunyuanimage3/model.py``
(AutoencoderKLConv3D:554). Distinctives vs the HunyuanVideo-1.5 VAE:

- plain (non-causal) 3D convs with symmetric zero padding and GroupNorm(32,
  eps 1e-6) + swish (the reference's ResnetBlock, model.py:203) — no
  replicate padding, no RMSNorm
- DC-AE down/upsampling without the frame-0 special case: straight
  (f r1)(h 2)(w 2) pixel shuffles with channel-group-mean / repeat
  shortcuts (DownsampleDCAE:265 / UpsampleDCAE:307)
- the encoder adds a channel-group-mean shortcut around norm/conv_out
  (Encoder.forward:438-446); the decoder adds a repeat-interleave shortcut
  around conv_in (Decoder.forward:520-521)
- mid-block attention is single-head SDPA over all (t·h·w) tokens with NO
  time mask (AttnBlock:169) — q/k/v/proj_out are 1x1x1 convs
- image semantics: a single frame is expanded to ``ffactor_temporal``
  frames before encode (encode:849-850); decoding a T=1 latent keeps only
  the LAST reconstructed frame (decode:897-898)

Internally NDHWC/DHWIO for TPU lane alignment; public tensors are
NC(T)HW per the engine contract.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.models.vaes.hunyuanvideo15_vae import (
    _channel_to_space,
    _space_to_channel,
)


@dataclasses.dataclass
class HunyuanImage3VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 32
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 1024, 1024)
    layers_per_block: int = 2
    ffactor_spatial: int = 16
    ffactor_temporal: int = 4
    sample_size: int = 256
    sample_tsize: int = 64
    downsample_match_channel: bool = True
    upsample_match_channel: bool = True
    # the reference defaults both to None (model.py:573-574); real values
    # arrive from the checkpoint's vae/config.json
    scaling_factor: Optional[float] = None
    shift_factor: Optional[float] = None

    @classmethod
    def from_dict(cls, cfg: dict) -> "HunyuanImage3VAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "block_out_channels" in kw:
            kw["block_out_channels"] = tuple(kw["block_out_channels"])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        return self.ffactor_spatial

    @property
    def temporal_scale(self) -> int:
        return self.ffactor_temporal


def _group_norm_3d(x, weight, bias, groups: int, eps: float = 1e-6):
    """NDHWC group norm with f32 statistics (torch-contiguous channel groups)."""
    b, t, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, t, h, w, groups, c // groups)
    mean = x32.mean(axis=(1, 2, 3, 5), keepdims=True)
    var = x32.var(axis=(1, 2, 3, 5), keepdims=True)
    x32 = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, h, w, c)
    return (x32 * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


class GroupNorm3D(nnx.Module):
    def __init__(self, channels: int, groups: int = 32, eps: float = 1e-6, *, rngs: nnx.Rngs):
        self.weight = nnx.Param(jnp.ones((channels,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((channels,), jnp.float32))
        self.groups = groups
        self.eps = eps

    def __call__(self, x):
        return _group_norm_3d(x, self.weight.value, self.bias.value, self.groups, self.eps)


class Conv3dSame(nnx.Module):
    """kxkxk conv, symmetric zero padding (reference Conv3d:121). NDHWC/DHWIO."""

    def __init__(self, cin: int, cout: int, kernel: int = 3, *, dtype, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(
            init(rngs.params(), (kernel, kernel, kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.k = kernel
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.k // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=((p, p), (p, p), (p, p)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + self.bias.value.astype(y.dtype)


class HI3ResnetBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, *, dtype, rngs: nnx.Rngs):
        self.norm1 = GroupNorm3D(cin, rngs=rngs)
        self.conv1 = Conv3dSame(cin, cout, dtype=dtype, rngs=rngs)
        self.norm2 = GroupNorm3D(cout, rngs=rngs)
        self.conv2 = Conv3dSame(cout, cout, dtype=dtype, rngs=rngs)
        self.nin_shortcut = (
            Conv3dSame(cin, cout, kernel=1, dtype=dtype, rngs=rngs)
            if cin != cout
            else None
        )

    def __call__(self, x):
        h = self.conv1(nnx.silu(self.norm1(x)))
        h = self.conv2(nnx.silu(self.norm2(h)))
        skip = x if self.nin_shortcut is None else self.nin_shortcut(x)
        return skip + h


class HI3AttnBlock(nnx.Module):
    """Single-head SDPA over all (t·h·w) tokens; q/k/v/proj are 1x1x1 convs."""

    def __init__(self, dim: int, *, dtype, rngs: nnx.Rngs):
        self.norm = GroupNorm3D(dim, rngs=rngs)
        self.q = Conv3dSame(dim, dim, kernel=1, dtype=dtype, rngs=rngs)
        self.k = Conv3dSame(dim, dim, kernel=1, dtype=dtype, rngs=rngs)
        self.v = Conv3dSame(dim, dim, kernel=1, dtype=dtype, rngs=rngs)
        self.proj_out = Conv3dSame(dim, dim, kernel=1, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        from apex_studio_tpu.ops import attention as attention_op

        b, t, h, w, c = x.shape
        y = self.norm(x)
        q = self.q(y).reshape(b, t * h * w, 1, c)
        k = self.k(y).reshape(b, t * h * w, 1, c)
        v = self.v(y).reshape(b, t * h * w, 1, c)
        out = attention_op(q, k, v, backend="xla")[:, :, 0]
        return x + self.proj_out(out.reshape(b, t, h, w, c))


class HI3Downsample(nnx.Module):
    """DownsampleDCAE (model.py:265): conv to cout//factor then pixel-unshuffle,
    plus an unshuffled channel-group-mean shortcut."""

    def __init__(self, cin: int, cout: int, temporal: bool, *, dtype, rngs: nnx.Rngs):
        factor = 8 if temporal else 4
        self.conv = Conv3dSame(cin, cout // factor, dtype=dtype, rngs=rngs)
        self.temporal = temporal
        self.group_size = factor * cin // cout

    def __call__(self, x):
        r1 = 2 if self.temporal else 1
        h = _space_to_channel(self.conv(x), r1, 2, 2)
        s = _space_to_channel(x, r1, 2, 2)
        b, t, hh, ww, c = s.shape
        shortcut = s.reshape(b, t, hh, ww, h.shape[-1], self.group_size).mean(-1)
        return h + shortcut


class HI3Upsample(nnx.Module):
    """UpsampleDCAE (model.py:307): conv to cout*factor then pixel-shuffle,
    plus a repeat-interleaved shuffled shortcut."""

    def __init__(self, cin: int, cout: int, temporal: bool, *, dtype, rngs: nnx.Rngs):
        factor = 8 if temporal else 4
        self.conv = Conv3dSame(cin, cout * factor, dtype=dtype, rngs=rngs)
        self.temporal = temporal
        self.repeats = factor * cout // cin

    def __call__(self, x):
        r1 = 2 if self.temporal else 1
        h = _channel_to_space(self.conv(x), r1, 2, 2)
        shortcut = _channel_to_space(jnp.repeat(x, self.repeats, axis=-1), r1, 2, 2)
        return h + shortcut


class HI3Encoder(nnx.Module):
    def __init__(self, cfg: HunyuanImage3VAEConfig, *, dtype, rngs: nnx.Rngs):
        ch = cfg.block_out_channels
        z2 = 2 * cfg.latent_channels
        assert ch[-1] % z2 == 0
        self.group_size = ch[-1] // z2
        self.conv_in = Conv3dSame(cfg.in_channels, ch[0], dtype=dtype, rngs=rngs)
        n_spatial = int(math.log2(cfg.ffactor_spatial))
        t_start = int(math.log2(cfg.ffactor_spatial // cfg.ffactor_temporal))
        blocks = []
        cin = ch[0]
        for i, cout in enumerate(ch):
            res = nnx.List(
                [HI3ResnetBlock(cin if j == 0 else cout, cout, dtype=dtype, rngs=rngs)
                 for j in range(cfg.layers_per_block)]
            )
            down = None
            if i < n_spatial:
                d_out = ch[i + 1] if cfg.downsample_match_channel else cout
                down = HI3Downsample(cout, d_out, temporal=(i >= t_start),
                                     dtype=dtype, rngs=rngs)
                cin = d_out
            else:
                cin = cout
            blocks.append(nnx.Dict(resnets=res,
                                   downsamplers=nnx.List([down]) if down else None))
        self.down_blocks = nnx.List(blocks)
        self.mid_block_1 = HI3ResnetBlock(cin, cin, dtype=dtype, rngs=rngs)
        self.mid_attn_1 = HI3AttnBlock(cin, dtype=dtype, rngs=rngs)
        self.mid_block_2 = HI3ResnetBlock(cin, cin, dtype=dtype, rngs=rngs)
        self.norm_out = GroupNorm3D(cin, rngs=rngs)
        self.conv_out = Conv3dSame(cin, z2, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk["resnets"]:
                x = r(x)
            if blk["downsamplers"] is not None:
                x = blk["downsamplers"][0](x)
        x = self.mid_block_2(self.mid_attn_1(self.mid_block_1(x)))
        b, t, h, w, c = x.shape
        # rearrange "b (c r) f h w -> b c r f h w" mean(r) — contiguous groups
        shortcut = x.reshape(b, t, h, w, c // self.group_size, self.group_size).mean(-1)
        return self.conv_out(nnx.silu(self.norm_out(x))) + shortcut


class HI3Decoder(nnx.Module):
    def __init__(self, cfg: HunyuanImage3VAEConfig, *, dtype, rngs: nnx.Rngs):
        ch = tuple(reversed(cfg.block_out_channels))
        assert ch[0] % cfg.latent_channels == 0
        self.repeats = ch[0] // cfg.latent_channels
        self.conv_in = Conv3dSame(cfg.latent_channels, ch[0], dtype=dtype, rngs=rngs)
        self.mid_block_1 = HI3ResnetBlock(ch[0], ch[0], dtype=dtype, rngs=rngs)
        self.mid_attn_1 = HI3AttnBlock(ch[0], dtype=dtype, rngs=rngs)
        self.mid_block_2 = HI3ResnetBlock(ch[0], ch[0], dtype=dtype, rngs=rngs)
        n_spatial = int(math.log2(cfg.ffactor_spatial))
        n_temporal = int(math.log2(cfg.ffactor_temporal))
        blocks = []
        cin = ch[0]
        for i, cout in enumerate(ch):
            res = nnx.List(
                [HI3ResnetBlock(cin if j == 0 else cout, cout, dtype=dtype, rngs=rngs)
                 for j in range(cfg.layers_per_block + 1)]
            )
            up = None
            if i < n_spatial:
                u_out = ch[i + 1] if cfg.upsample_match_channel else cout
                up = HI3Upsample(cout, u_out, temporal=(i < n_temporal),
                                 dtype=dtype, rngs=rngs)
                cin = u_out
            else:
                cin = cout
            blocks.append(nnx.Dict(resnets=res,
                                   upsamplers=nnx.List([up]) if up else None))
        self.up_blocks = nnx.List(blocks)
        self.norm_out = GroupNorm3D(cin, rngs=rngs)
        self.conv_out = Conv3dSame(cin, cfg.out_channels, dtype=dtype, rngs=rngs)

    def __call__(self, z):
        x = self.conv_in(z) + jnp.repeat(z, self.repeats, axis=-1)
        x = self.mid_block_2(self.mid_attn_1(self.mid_block_1(x)))
        for blk in self.up_blocks:
            for r in blk["resnets"]:
                x = r(x)
            if blk["upsamplers"] is not None:
                x = blk["upsamplers"][0](x)
        return self.conv_out(nnx.silu(self.norm_out(x)))


@vae_registry.register(
    "hunyuanimage3", aliases=("AutoencoderKLConv3D", "hunyuanimage3.base"))
class AutoencoderKLConv3D(nnx.Module):
    config_class = HunyuanImage3VAEConfig

    def __init__(self, cfg: HunyuanImage3VAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = HI3Encoder(cfg, dtype=dtype, rngs=rngs)
        self.decoder = HI3Decoder(cfg, dtype=dtype, rngs=rngs)

    def _scale(self) -> float:
        return float(self.cfg.scaling_factor or 1.0)

    def _shift(self) -> float:
        return float(self.cfg.shift_factor or 0.0)

    def encode(self, pixels: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        """[B,3,H,W] or [B,3,T,H,W] → MODEL-space latents.

        A single frame is expanded to ``ffactor_temporal`` identical frames
        before the encoder (reference encode:849-850); images return 4D
        latents [B,z,H',W']."""
        was_image = pixels.ndim == 4
        if was_image:
            pixels = pixels[:, :, None]
        if pixels.shape[2] == 1:
            pixels = jnp.broadcast_to(
                pixels, pixels.shape[:2] + (self.cfg.ffactor_temporal,) + pixels.shape[3:])
        x = jnp.transpose(pixels, (0, 2, 3, 4, 1))
        moments = jnp.transpose(self.encoder(x), (0, 4, 1, 2, 3))
        mean, logvar = jnp.split(moments, 2, axis=1)
        z = mean
        if sample and noise is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) * noise
        z = (z - self._shift()) * self._scale()
        if was_image:
            z = z[:, :, 0]
        return z

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """MODEL-space latents → pixels. A T=1 latent decodes to a single
        frame (the LAST of the ffactor_temporal reconstructed frames,
        reference decode:897-898)."""
        was_image = z.ndim == 4
        if was_image:
            z = z[:, :, None]
        z = z / self._scale() + self._shift()
        x = jnp.transpose(z, (0, 2, 3, 4, 1))
        out = jnp.transpose(self.decoder(x), (0, 4, 1, 2, 3))
        if z.shape[2] == 1:
            out = out[:, :, -1:]
        if was_image:
            out = out[:, :, 0]
        return out
