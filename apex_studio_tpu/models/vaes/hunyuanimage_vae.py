"""HunyuanImage 2.1 image VAE (32x spatial compression) in JAX/NNX.

Counterpart of the reference's ``src/vae/hunyuanimage/model.py:481``
(AutoencoderKLHunyuanImage): plain GroupNorm/SiLU resnet stacks, but every
down/upsample and both heads carry *parameter-free shortcuts* —
space-to-depth (down) / depth-to-space (up) of the input with grouped channel
averaging or repeat_interleave — so the network learns residuals around
lossless resampling (model.py:151,189,345,462). Flat ``down_blocks`` /
``up_blocks`` lists interleave resnets and resamplers exactly like the
checkpoint layout.

Activations flow NHWC (channels on the TPU lane axis); the engine-facing
API stays NCHW.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.models.vaes.autoencoder_kl import (
    AttentionBlock2D,
    Conv2d,
    GroupNorm,
    ResnetBlock2D,
)


@dataclasses.dataclass
class HunyuanImageVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 64
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 1024, 2048)
    layers_per_block: int = 2
    spatial_compression_ratio: int = 32
    scaling_factor: float = 0.75289
    shift_factor: Optional[float] = None
    sample_size: int = 1024
    downsample_match_channel: bool = True
    upsample_match_channel: bool = True

    @classmethod
    def from_dict(cls, cfg: dict) -> "HunyuanImageVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "block_out_channels" in kw:
            kw["block_out_channels"] = tuple(kw["block_out_channels"])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        return self.spatial_compression_ratio


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC 2x2 space-to-depth with torch channel order (r1, r2, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_space_to_depth` (channel order (r1, r2, c))."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, 2, 2, c // 4)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c // 4)


class HYIDownsample(nnx.Module):
    """Conv to cout/4 then space-to-depth, plus grouped-mean shortcut
    (model.py:151)."""

    def __init__(self, cin: int, cout: int, *, dtype, rngs: nnx.Rngs):
        self.conv = Conv2d(cin, cout // 4, dtype=dtype, rngs=rngs)
        self.group_size = 4 * cin // cout

    def __call__(self, x):
        h = _space_to_depth(self.conv(x))
        short = _space_to_depth(x)
        b, hh, ww, c = short.shape
        short = short.reshape(b, hh, ww, c // self.group_size, self.group_size).mean(-1)
        return h + short


class HYIUpsample(nnx.Module):
    """Conv to cout*4 then depth-to-space, plus repeat_interleave shortcut
    (model.py:189)."""

    def __init__(self, cin: int, cout: int, *, dtype, rngs: nnx.Rngs):
        self.conv = Conv2d(cin, cout * 4, dtype=dtype, rngs=rngs)
        self.repeats = 4 * cout // cin

    def __call__(self, x):
        h = _depth_to_space(self.conv(x))
        short = _depth_to_space(jnp.repeat(x, self.repeats, axis=-1))
        return h + short


class HYIMidBlock(nnx.Module):
    """resnet, then (attn, resnet) pairs (model.py:223, num_layers=1)."""

    def __init__(self, channels: int, *, dtype, rngs: nnx.Rngs):
        self.resnets = nnx.List([
            ResnetBlock2D(channels, channels, min(32, channels), dtype=dtype, rngs=rngs)
            for _ in range(2)
        ])
        self.attentions = nnx.List([
            AttentionBlock2D(channels, min(32, channels), dtype=dtype, rngs=rngs)
        ])

    def __call__(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class HYIEncoder(nnx.Module):
    def __init__(self, cfg: HunyuanImageVAEConfig, *, dtype, rngs: nnx.Rngs):
        ch = cfg.block_out_channels
        self.conv_in = Conv2d(cfg.in_channels, ch[0], dtype=dtype, rngs=rngs)
        self.down_blocks = nnx.List([])
        n_down = int(math.log2(cfg.spatial_compression_ratio))
        cin = ch[0]
        for i, cout in enumerate(ch):
            for _ in range(cfg.layers_per_block):
                self.down_blocks.append(
                    ResnetBlock2D(cin, cout, min(32, cin, cout), dtype=dtype, rngs=rngs))
                cin = cout
            if i < n_down and i != len(ch) - 1:
                if cfg.downsample_match_channel:
                    cout = ch[i + 1]
                self.down_blocks.append(HYIDownsample(cin, cout, dtype=dtype, rngs=rngs))
                cin = cout
        self.mid_block = HYIMidBlock(ch[-1], dtype=dtype, rngs=rngs)
        self.norm_out = GroupNorm(ch[-1], min(32, ch[-1]), rngs=rngs)
        self.conv_out = Conv2d(ch[-1], 2 * cfg.latent_channels, dtype=dtype, rngs=rngs)
        self.group_size = ch[-1] // (2 * cfg.latent_channels)

    def __call__(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        b, h, w, c = x.shape
        residual = x.reshape(b, h, w, c // self.group_size, self.group_size).mean(-1)
        return self.conv_out(nnx.silu(self.norm_out(x))) + residual


class HYIDecoder(nnx.Module):
    def __init__(self, cfg: HunyuanImageVAEConfig, *, dtype, rngs: nnx.Rngs):
        ch = tuple(reversed(cfg.block_out_channels))
        z = cfg.latent_channels
        self.conv_in = Conv2d(z, ch[0], dtype=dtype, rngs=rngs)
        self.repeat = ch[0] // z
        self.mid_block = HYIMidBlock(ch[0], dtype=dtype, rngs=rngs)
        self.up_blocks = nnx.List([])
        n_up = int(math.log2(cfg.spatial_compression_ratio))
        cin = ch[0]
        for i, cout in enumerate(ch):
            for _ in range(cfg.layers_per_block + 1):
                self.up_blocks.append(
                    ResnetBlock2D(cin, cout, min(32, cin, cout), dtype=dtype, rngs=rngs))
                cin = cout
            if i < n_up and i != len(ch) - 1:
                if cfg.upsample_match_channel:
                    cout = ch[i + 1]
                self.up_blocks.append(HYIUpsample(cin, cout, dtype=dtype, rngs=rngs))
                cin = cout
        self.norm_out = GroupNorm(ch[-1], min(32, ch[-1]), rngs=rngs)
        self.conv_out = Conv2d(ch[-1], cfg.out_channels, dtype=dtype, rngs=rngs)

    def __call__(self, z):
        x = self.conv_in(z) + jnp.repeat(z, self.repeat, axis=-1)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            x = blk(x)
        return self.conv_out(nnx.silu(self.norm_out(x)))


@vae_registry.register(
    "hunyuanimage.vae", aliases=("AutoencoderKLHunyuanImage", "hunyuanimage_vae")
)
class AutoencoderKLHunyuanImage(nnx.Module):
    config_class = HunyuanImageVAEConfig

    def __init__(self, cfg: HunyuanImageVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = HYIEncoder(cfg, dtype=dtype, rngs=rngs)
        self.decoder = HYIDecoder(cfg, dtype=dtype, rngs=rngs)

    def encode(self, x_nchw: jnp.ndarray) -> jnp.ndarray:
        """[B,3,H,W] → posterior mean scaled to model latent space."""
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        moments = jnp.transpose(self.encoder(x), (0, 3, 1, 2))
        mean, _ = jnp.split(moments, 2, axis=1)
        if self.cfg.shift_factor is not None:
            mean = mean - self.cfg.shift_factor
        return mean * (self.cfg.scaling_factor or 1.0)

    def decode(self, z_nchw: jnp.ndarray) -> jnp.ndarray:
        z = z_nchw / (self.cfg.scaling_factor or 1.0)
        if self.cfg.shift_factor is not None:
            z = z + self.cfg.shift_factor
        x = self.decoder(jnp.transpose(z, (0, 2, 3, 1)))
        return jnp.transpose(x, (0, 3, 1, 2))
