"""AutoencoderKL (SD/SDXL/Flux/ZImage image VAE) in JAX/NNX.

Counterpart of the reference's ``src/vae/auto/model.py:44`` (diffusers
AutoencoderKL): same graph and parameter names, rebuilt for TPU — activations
flow NHWC (channels on the 128-lane axis), GroupNorm reduces in f32, and
attention in the mid-block reuses ops.attention. Public tensors are NCHW to
preserve the reference's engine-facing contract.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.ops import attention as attention_op


@dataclasses.dataclass
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: Optional[float] = 0.1159
    use_quant_conv: bool = False
    use_post_quant_conv: bool = False
    mid_block_add_attention: bool = True
    # Flux2 variant (reference src/vae/flux2/model.py:152): packed (2x2)
    # latents are normalized by BatchNorm running stats instead of
    # scaling/shift factors.
    packed_batch_norm: bool = False
    batch_norm_eps: float = 1e-4
    patch_size: Tuple[int, int] = (2, 2)

    @classmethod
    def from_dict(cls, cfg: dict) -> "AutoencoderKLConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "block_out_channels" in kw:
            kw["block_out_channels"] = tuple(kw["block_out_channels"])
        if "patch_size" in kw:
            kw["patch_size"] = tuple(kw["patch_size"])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def group_norm(x: jnp.ndarray, weight, bias, groups: int, eps: float = 1e-6) -> jnp.ndarray:
    """NHWC group norm with f32 statistics."""
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = x32.mean(axis=(1, 2, 4), keepdims=True)
    var = x32.var(axis=(1, 2, 4), keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    x32 = x32.reshape(b, h, w, c)
    return (x32 * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


class GroupNorm(nnx.Module):
    def __init__(self, channels: int, groups: int = 32, eps: float = 1e-6, *, rngs: nnx.Rngs):
        self.weight = nnx.Param(jnp.ones((channels,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((channels,), jnp.float32))
        self.groups = groups
        self.eps = eps

    def __call__(self, x):
        return group_norm(x, self.weight.value, self.bias.value, self.groups, self.eps)


class Conv2d(nnx.Module):
    """3x3/1x1 conv on NHWC, kernel stored HWIO."""

    def __init__(self, cin: int, cout: int, kernel: int = 3, stride: int = 1,
                 padding: int = 1, *, dtype=jnp.float32, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (kernel, kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride = stride
        self.padding = padding
        self.dtype = dtype

    def __call__(self, x):
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + self.bias.value.astype(y.dtype)


class ResnetBlock2D(nnx.Module):
    def __init__(self, cin: int, cout: int, groups: int, *, dtype, rngs: nnx.Rngs):
        self.norm1 = GroupNorm(cin, groups, rngs=rngs)
        self.conv1 = Conv2d(cin, cout, dtype=dtype, rngs=rngs)
        self.norm2 = GroupNorm(cout, groups, rngs=rngs)
        self.conv2 = Conv2d(cout, cout, dtype=dtype, rngs=rngs)
        self.conv_shortcut = (
            Conv2d(cin, cout, kernel=1, padding=0, dtype=dtype, rngs=rngs)
            if cin != cout
            else None
        )

    def __call__(self, x):
        h = self.conv1(nnx.silu(self.norm1(x)))
        h = self.conv2(nnx.silu(self.norm2(h)))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class AttentionBlock2D(nnx.Module):
    """Single-head spatial self-attention used in the VAE mid block."""

    def __init__(self, channels: int, groups: int, *, dtype, rngs: nnx.Rngs):
        from apex_studio_tpu.models.layers import Linear

        self.group_norm = GroupNorm(channels, groups, rngs=rngs)
        kw = dict(use_bias=True, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.to_q = Linear(channels, channels, **kw)
        self.to_k = Linear(channels, channels, **kw)
        self.to_v = Linear(channels, channels, **kw)
        self.to_out = Linear(channels, channels, **kw)

    def __call__(self, x):
        b, h, w, c = x.shape
        y = self.group_norm(x).reshape(b, h * w, c)
        q = self.to_q(y)[:, :, None, :]  # single head
        k = self.to_k(y)[:, :, None, :]
        v = self.to_v(y)[:, :, None, :]
        out = attention_op(q, k, v, backend="xla")[:, :, 0, :]
        return x + self.to_out(out).reshape(b, h, w, c)


class Downsample2D(nnx.Module):
    def __init__(self, channels: int, *, dtype, rngs: nnx.Rngs):
        self.conv = Conv2d(channels, channels, stride=2, padding=0, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        # diffusers pads (0,1,0,1) asymmetrically before the stride-2 conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return self.conv(x)


class Upsample2D(nnx.Module):
    def __init__(self, channels: int, *, dtype, rngs: nnx.Rngs):
        self.conv = Conv2d(channels, channels, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return self.conv(x)


class DownEncoderBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, layers: int, groups: int,
                 add_downsample: bool, *, dtype, rngs: nnx.Rngs):
        self.resnets = nnx.List([
            ResnetBlock2D(cin if i == 0 else cout, cout, groups, dtype=dtype, rngs=rngs)
            for i in range(layers)
        ])
        self.downsamplers = (
            nnx.List([Downsample2D(cout, dtype=dtype, rngs=rngs)]) if add_downsample else None
        )

    def __call__(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers:
            x = self.downsamplers[0](x)
        return x


class UpDecoderBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, layers: int, groups: int,
                 add_upsample: bool, *, dtype, rngs: nnx.Rngs):
        self.resnets = nnx.List([
            ResnetBlock2D(cin if i == 0 else cout, cout, groups, dtype=dtype, rngs=rngs)
            for i in range(layers)
        ])
        self.upsamplers = nnx.List([Upsample2D(cout, dtype=dtype, rngs=rngs)]) if add_upsample else None

    def __call__(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers:
            x = self.upsamplers[0](x)
        return x


class MidBlock(nnx.Module):
    def __init__(self, channels: int, groups: int, add_attention: bool, *, dtype, rngs: nnx.Rngs):
        self.resnets = nnx.List([
            ResnetBlock2D(channels, channels, groups, dtype=dtype, rngs=rngs)
            for _ in range(2)
        ])
        self.attentions = (
            nnx.List([AttentionBlock2D(channels, groups, dtype=dtype, rngs=rngs)])
            if add_attention
            else None
        )

    def __call__(self, x):
        x = self.resnets[0](x)
        if self.attentions:
            x = self.attentions[0](x)
        return self.resnets[1](x)


class Encoder(nnx.Module):
    def __init__(self, cfg: AutoencoderKLConfig, *, dtype, rngs: nnx.Rngs):
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = Conv2d(cfg.in_channels, ch[0], dtype=dtype, rngs=rngs)
        self.down_blocks = nnx.List([])
        cin = ch[0]
        for i, cout in enumerate(ch):
            self.down_blocks.append(
                DownEncoderBlock(
                    cin, cout, cfg.layers_per_block, g,
                    add_downsample=(i < len(ch) - 1), dtype=dtype, rngs=rngs,
                )
            )
            cin = cout
        self.mid_block = MidBlock(ch[-1], g, cfg.mid_block_add_attention, dtype=dtype, rngs=rngs)
        self.conv_norm_out = GroupNorm(ch[-1], g, rngs=rngs)
        self.conv_out = Conv2d(ch[-1], 2 * cfg.latent_channels, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(nnx.silu(self.conv_norm_out(x)))


class Decoder(nnx.Module):
    def __init__(self, cfg: AutoencoderKLConfig, *, dtype, rngs: nnx.Rngs):
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = Conv2d(cfg.latent_channels, ch[-1], dtype=dtype, rngs=rngs)
        self.mid_block = MidBlock(ch[-1], g, cfg.mid_block_add_attention, dtype=dtype, rngs=rngs)
        self.up_blocks = nnx.List([])
        reversed_ch = list(reversed(ch))
        cin = reversed_ch[0]
        for i, cout in enumerate(reversed_ch):
            self.up_blocks.append(
                UpDecoderBlock(
                    cin, cout, cfg.layers_per_block + 1, g,
                    add_upsample=(i < len(ch) - 1), dtype=dtype, rngs=rngs,
                )
            )
            cin = cout
        self.conv_norm_out = GroupNorm(ch[0], g, rngs=rngs)
        self.conv_out = Conv2d(ch[0], cfg.out_channels, dtype=dtype, rngs=rngs)

    def __call__(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            x = blk(x)
        return self.conv_out(nnx.silu(self.conv_norm_out(x)))


@vae_registry.register("auto", aliases=("AutoencoderKL", "AutoencoderKLFlux2", "flux2", "flux2.vae"))
class AutoencoderKL(nnx.Module):
    config_class = AutoencoderKLConfig

    def __init__(self, cfg: AutoencoderKLConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = Encoder(cfg, dtype=dtype, rngs=rngs)
        self.decoder = Decoder(cfg, dtype=dtype, rngs=rngs)
        self.quant_conv = (
            Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, kernel=1,
                   padding=0, dtype=dtype, rngs=rngs)
            if cfg.use_quant_conv
            else None
        )
        self.post_quant_conv = (
            Conv2d(cfg.latent_channels, cfg.latent_channels, kernel=1, padding=0,
                   dtype=dtype, rngs=rngs)
            if cfg.use_post_quant_conv
            else None
        )
        if cfg.packed_batch_norm:
            import math

            n_bn = math.prod(cfg.patch_size) * cfg.latent_channels
            self.bn_mean = nnx.Param(jnp.zeros((n_bn,), jnp.float32))
            self.bn_var = nnx.Param(jnp.ones((n_bn,), jnp.float32))
        else:
            self.bn_mean = nnx.data(None)
            self.bn_var = nnx.data(None)

    def normalize_packed(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Normalize packed [B, N, C·p²] latents by BatchNorm running stats
        (reference vae/flux2/model.py:615-621)."""
        std = jnp.sqrt(self.bn_var.value + self.cfg.batch_norm_eps)
        return (tokens - self.bn_mean.value) / std

    def denormalize_packed(self, tokens: jnp.ndarray) -> jnp.ndarray:
        std = jnp.sqrt(self.bn_var.value + self.cfg.batch_norm_eps)
        return tokens * std + self.bn_mean.value

    # Engine-facing API is NCHW like the reference.
    def encode_moments(self, x_nchw: jnp.ndarray) -> jnp.ndarray:
        """[B,3,H,W] → [B, 2·latent, H/8, W/8] (mean ‖ logvar), unscaled."""
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        moments = self.encoder(x)
        if self.quant_conv is not None:
            moments = self.quant_conv(moments)
        return jnp.transpose(moments, (0, 3, 1, 2))

    def encode(self, x_nchw: jnp.ndarray, sample: bool = False, noise: Optional[jnp.ndarray] = None):
        """Posterior mean (or a sample), scaled to model latent space."""
        moments = self.encode_moments(x_nchw)
        mean, logvar = jnp.split(moments, 2, axis=1)
        z = mean
        if sample:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            z = mean + std * (noise if noise is not None else 0.0)
        if self.cfg.shift_factor is not None:
            z = z - self.cfg.shift_factor
        return z * self.cfg.scaling_factor

    def decode(self, z_nchw: jnp.ndarray) -> jnp.ndarray:
        """Model latents → [B,3,H,W] in [-1, 1]."""
        z = z_nchw / self.cfg.scaling_factor
        if self.cfg.shift_factor is not None:
            z = z + self.cfg.shift_factor
        z = jnp.transpose(z, (0, 2, 3, 1))
        if self.post_quant_conv is not None:
            z = self.post_quant_conv(z)
        x = self.decoder(z)
        return jnp.transpose(x, (0, 3, 1, 2))

    def decode_tiled(
        self, z_nchw: jnp.ndarray, tile: int = 96, overlap: int = 16
    ) -> jnp.ndarray:
        """Spatially tiled decode with linear blending at tile seams —
        counterpart of the reference's VAE tiling (engine/base_engine.py:1077,
        vae/auto/model.py:44). Keeps peak activation memory at one tile's
        worth for arbitrarily large images; tiles share the same compiled
        program when shapes repeat."""
        b, c, h, w = z_nchw.shape
        if h <= tile and w <= tile:
            return self.decode(z_nchw)
        s = self.cfg.spatial_scale
        stride = tile - overlap
        out = np.zeros((b, self.cfg.out_channels, h * s, w * s), np.float32)
        weight = np.zeros((1, 1, h * s, w * s), np.float32)

        def ramp(n: int, lead: bool, trail: bool) -> np.ndarray:
            wv = np.ones(n, np.float32)
            ov = overlap * s
            if lead:
                wv[:ov] = np.linspace(0.0, 1.0, ov, endpoint=False)
            if trail:
                wv[-ov:] = np.linspace(1.0, 0.0, ov, endpoint=False)
            return wv

        ys = list(range(0, max(h - overlap, 1), stride))
        xs = list(range(0, max(w - overlap, 1), stride))
        for yi, y0 in enumerate(ys):
            for xi, x0 in enumerate(xs):
                y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
                y0a, x0a = max(0, y1 - tile), max(0, x1 - tile)  # uniform tile shape
                patch = self.decode(z_nchw[:, :, y0a:y1, x0a:x1])
                ph, pw = patch.shape[-2:]
                wy = ramp(ph, lead=y0a > 0, trail=y1 < h)
                wx = ramp(pw, lead=x0a > 0, trail=x1 < w)
                wmap = wy[:, None] * wx[None, :]
                out[:, :, y0a * s : y1 * s, x0a * s : x1 * s] += (
                    np.asarray(patch, np.float32) * wmap
                )
                weight[:, :, y0a * s : y1 * s, x0a * s : x1 * s] += wmap
        return jnp.asarray(out / np.maximum(weight, 1e-6))
