"""Mochi-1 video VAE (encoder + decoder) in JAX/NNX.

Counterpart of the reference's ``src/vae/mochi/model.py`` (AutoencoderKLMochi:
728). Verified end-to-end against that torch oracle in
tests/test_parity_mochi_vae.py. Structure distinctives:

- all norms are PER-FRAME GroupNorm(32, eps 1e-5) (MochiChunkedGroupNorm3D:38
  normalizes each frame independently)
- causal convs pad with REPLICATE mode on every axis at once (time front
  k_t−1, spatial symmetric) — CogVideoXCausalConv3d(pad_mode="replicate")
- resnets have no conv shortcut (in==out everywhere, model.py:76)
- encoder: FourierFeatures (3→15ch, :455) → proj_in Linear → block_in →
  3 strided-conv down blocks with per-spatial-location CAUSAL TIME attention
  (l2 qk norm, 32-dim heads) → block_out (attended) → norm/silu → proj_out
  Linear (bias-free) to 2·12 moments
- decoder: 1×1×1 conv_in → block_in → 3 up blocks (resnets then a Linear
  proj whose channels unshuffle as (c, t_exp, s_exp, s_exp), c slowest —
  model.py:439-448) → block_out → silu → proj_out Linear; NO final norm,
  and no attention anywhere in the decoder
- decode drops the leading temporal_compression−1 upscaled phantom frames
  ONCE at the end (drop_last_temporal_frames, model.py:1019-1023) — not per
  up block
- latents normalized per channel by latents_mean/std
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
class MochiVAEConfig:
    in_channels: int = 15
    latent_channels: int = 12
    out_channels: int = 3
    encoder_block_out_channels: Optional[Tuple[int, ...]] = None
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 768)
    layers_per_block: Tuple[int, ...] = (3, 3, 4, 6, 3)
    temporal_expansions: Tuple[int, ...] = (1, 2, 3)
    spatial_expansions: Tuple[int, ...] = (2, 2, 2)
    add_attention_block: Tuple[bool, ...] = (False, True, True, True, True)
    norm_num_groups: int = 32
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None

    @classmethod
    def from_dict(cls, cfg: dict) -> "MochiVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        for key in ("block_out_channels", "encoder_block_out_channels",
                    "layers_per_block", "temporal_expansions",
                    "spatial_expansions", "add_attention_block",
                    "latents_mean", "latents_std"):
            if key in kw and kw[key] is not None:
                kw[key] = tuple(kw[key])
        return cls(**kw)

    def __post_init__(self):
        if self.encoder_block_out_channels is None:
            self.encoder_block_out_channels = self.block_out_channels
        # the diffusers layout carries N+1 layer counts (block_in, per down
        # block, block_out); legacy N-length configs pad with their first value
        n = len(self.block_out_channels)
        if len(self.layers_per_block) == n:
            self.layers_per_block = (self.layers_per_block[0],
                                     *self.layers_per_block)
        if len(self.add_attention_block) < n + 1:
            self.add_attention_block = (
                self.add_attention_block
                + (self.add_attention_block[-1],) * (n + 1 - len(self.add_attention_block)))

    @property
    def spatial_scale(self) -> int:
        return int(np.prod(self.spatial_expansions))

    @property
    def temporal_scale(self) -> int:
        return int(np.prod(self.temporal_expansions))


class MochiGroupNorm(nnx.Module):
    """PER-FRAME GroupNorm (MochiChunkedGroupNorm3D): statistics never mix
    time. Channels-last [B,T,H,W,C]; torch GroupNorm defaults (eps 1e-5)."""

    def __init__(self, dim: int, groups: int = 32, *, rngs: nnx.Rngs):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))
        self.groups = min(groups, dim)
        while dim % self.groups:
            self.groups -= 1
        self.eps = 1e-5

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        g = self.groups
        x32 = x.astype(jnp.float32).reshape(b, t, h * w, g, c // g)
        mean = x32.mean(axis=(2, 4), keepdims=True)
        var = x32.var(axis=(2, 4), keepdims=True)
        x32 = ((x32 - mean) * jax.lax.rsqrt(var + self.eps)).reshape(x.shape)
        return (x32 * self.weight.value + self.bias.value).astype(x.dtype)


class MochiConv3dRep(nnx.Module):
    """CogVideoXCausalConv3d(pad_mode="replicate"): replicate padding with
    time front k_t−1, spatial (k−1)//2 each side, then a strided VALID conv.
    NDHWC/DHWIO."""

    def __init__(self, cin: int, cout: int, kernel=3, stride=1, *, dtype,
                 rngs: nnx.Rngs):
        if isinstance(kernel, int):
            kernel = (kernel,) * 3
        if isinstance(stride, int):
            stride = (stride, 1, 1)
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (*kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.k = kernel
        self.stride = stride
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kh, kw = self.k
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        if kt > 1 or ph or pw:
            x = jnp.pad(
                x, ((0, 0), (kt - 1, 0), (ph, ph), (pw, pw), (0, 0)), mode="edge")
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            window_strides=self.stride,
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + self.bias.value.astype(y.dtype)


class MochiResnetBlock3D(nnx.Module):
    """norm→silu→replicate conv ×2 with a PLAIN residual add (in==out)."""

    def __init__(self, dim: int, *, dtype, rngs: nnx.Rngs):
        self.norm1 = MochiGroupNorm(dim, rngs=rngs)
        self.conv1 = MochiConv3dRep(dim, dim, dtype=dtype, rngs=rngs)
        self.norm2 = MochiGroupNorm(dim, rngs=rngs)
        self.conv2 = MochiConv3dRep(dim, dim, dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.conv1(nnx.silu(self.norm1(x)))
        h = self.conv2(nnx.silu(self.norm2(h)))
        return x + h


class MochiTimeAttn(nnx.Module):
    """Causal attention over TIME at each spatial location (encoder only):
    l2-normalized q/k per 32-dim head (model.py Attention(qk_norm='l2',
    is_causal=True)). T==1 short-circuits through to_v/to_out."""

    def __init__(self, dim: int, *, dtype, rngs: nnx.Rngs):
        from apex_studio_tpu.models.layers import Linear

        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.to_q = Linear(dim, dim, use_bias=False, **kw)
        self.to_k = Linear(dim, dim, use_bias=False, **kw)
        self.to_v = Linear(dim, dim, use_bias=False, **kw)
        self.to_out = Linear(dim, dim, use_bias=True, **kw)
        self.heads = max(1, dim // 32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Returns the attention output only — the caller adds the PRE-NORM
        residual (reference model.py:246-268)."""
        b, t, h, w, c = x.shape
        y = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        if t == 1:
            out = self.to_out(self.to_v(y))
        else:
            hd = c // self.heads
            q = self.to_q(y).reshape(-1, t, self.heads, hd)
            k = self.to_k(y).reshape(-1, t, self.heads, hd)
            v = self.to_v(y).reshape(-1, t, self.heads, hd)

            def l2(u):
                u32 = u.astype(jnp.float32)
                n = jnp.linalg.norm(u32, axis=-1, keepdims=True)
                return u32 / jnp.maximum(n, 1e-5)

            q, k = l2(q), l2(k)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            mask = jnp.tril(jnp.ones((t, t), bool))
            logits = jnp.where(mask[None, None], logits, -jnp.inf)
            att = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", att,
                             v.astype(jnp.float32)).reshape(-1, t, c)
            out = self.to_out(out.astype(x.dtype))
        return out.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)


class MochiMidBlock3D(nnx.Module):
    """N resnets, each optionally followed by norm + causal time attention."""

    def __init__(self, dim: int, num_layers: int, attend: bool, *, dtype,
                 rngs: nnx.Rngs):
        self.resnets = nnx.List(
            [MochiResnetBlock3D(dim, dtype=dtype, rngs=rngs)
             for _ in range(num_layers)])
        self.norms = (nnx.List([MochiGroupNorm(dim, rngs=rngs)
                                for _ in range(num_layers)]) if attend else None)
        self.attentions = (nnx.List([MochiTimeAttn(dim, dtype=dtype, rngs=rngs)
                                     for _ in range(num_layers)]) if attend else None)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, r in enumerate(self.resnets):
            x = r(x)
            if self.attentions is not None:
                x = x + self.attentions[i](self.norms[i](x))
        return x


class MochiDownBlock3D(nnx.Module):
    """Strided replicate conv (kernel==stride==(te,se,se)), then attended
    resnets."""

    def __init__(self, cin: int, cout: int, num_layers: int, te: int, se: int,
                 attend: bool, *, dtype, rngs: nnx.Rngs):
        self.conv_in = MochiConv3dRep(cin, cout, kernel=(te, se, se),
                                      stride=(te, se, se), dtype=dtype, rngs=rngs)
        self.resnets = nnx.List(
            [MochiResnetBlock3D(cout, dtype=dtype, rngs=rngs)
             for _ in range(num_layers)])
        self.norms = (nnx.List([MochiGroupNorm(cout, rngs=rngs)
                                for _ in range(num_layers)]) if attend else None)
        self.attentions = (nnx.List([MochiTimeAttn(cout, dtype=dtype, rngs=rngs)
                                     for _ in range(num_layers)]) if attend else None)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_in(x)
        for i, r in enumerate(self.resnets):
            x = r(x)
            if self.attentions is not None:
                x = x + self.attentions[i](self.norms[i](x))
        return x


class MochiUpBlock3D(nnx.Module):
    """Resnets then a Linear projection whose channels unshuffle as
    (c, t_exp, s_exp, s_exp) with c SLOWEST (reference model.py:439-448);
    no frame cropping here — that happens once in decode()."""

    def __init__(self, cin: int, cout: int, num_layers: int, t_exp: int,
                 s_exp: int, *, dtype, rngs: nnx.Rngs):
        from apex_studio_tpu.models.layers import Linear

        self.resnets = nnx.List(
            [MochiResnetBlock3D(cin, dtype=dtype, rngs=rngs)
             for _ in range(num_layers)])
        self.proj = Linear(cin, cout * t_exp * s_exp * s_exp, use_bias=True,
                           dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.t_exp, self.s_exp, self.cout = t_exp, s_exp, cout

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for r in self.resnets:
            x = r(x)
        x = self.proj(x)  # [B, T, H, W, c·te·se²] (c slowest in channel)
        b, t, h, w, _ = x.shape
        te, se, c = self.t_exp, self.s_exp, self.cout
        x = x.reshape(b, t, h, w, c, te, se, se)
        x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
        return x.reshape(b, t * te, h * se, w * se, c)


def _fourier_features(x: jnp.ndarray, start: int = 6, stop: int = 8) -> jnp.ndarray:
    """FourierFeatures (model.py:455): concat(x, sin(2^f·2π·x), cos(...)) with
    channels interleaved per input channel. Channels-last."""
    x32 = x.astype(jnp.float32)
    c = x32.shape[-1]
    nf = stop - start
    freqs = (2.0 ** np.arange(start, stop, dtype=np.float32)) * 2.0 * np.pi
    w = jnp.asarray(np.tile(freqs, c))                       # [c·nf]
    h = jnp.repeat(x32, nf, axis=-1) * w
    return jnp.concatenate([x32, jnp.sin(h), jnp.cos(h)], axis=-1).astype(x.dtype)


class MochiEncoder3D(nnx.Module):
    def __init__(self, cfg: MochiVAEConfig, *, dtype, rngs: nnx.Rngs):
        from apex_studio_tpu.models.layers import Linear

        ch = cfg.encoder_block_out_channels
        layers = cfg.layers_per_block
        attend = cfg.add_attention_block
        self.proj_in = Linear(cfg.in_channels, ch[0], use_bias=True,
                              dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.block_in = MochiMidBlock3D(ch[0], layers[0], attend[0],
                                        dtype=dtype, rngs=rngs)
        self.down_blocks = nnx.List(
            [MochiDownBlock3D(ch[i], ch[i + 1], layers[i + 1],
                              cfg.temporal_expansions[i],
                              cfg.spatial_expansions[i], attend[i + 1],
                              dtype=dtype, rngs=rngs)
             for i in range(len(ch) - 1)])
        self.block_out = MochiMidBlock3D(ch[-1], layers[-1], attend[-1],
                                         dtype=dtype, rngs=rngs)
        self.norm_out = MochiGroupNorm(ch[-1], rngs=rngs)
        self.proj_out = Linear(ch[-1], 2 * cfg.latent_channels, use_bias=False,
                               dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _fourier_features(x)
        x = self.block_in(self.proj_in(x))
        for blk in self.down_blocks:
            x = blk(x)
        x = self.block_out(x)
        return self.proj_out(nnx.silu(self.norm_out(x)))


class MochiDecoder3D(nnx.Module):
    def __init__(self, cfg: MochiVAEConfig, *, dtype, rngs: nnx.Rngs):
        from apex_studio_tpu.models.layers import Linear

        ch = cfg.block_out_channels
        layers = cfg.layers_per_block
        self.conv_in = MochiConv3dRep(cfg.latent_channels, ch[-1], kernel=1,
                                      dtype=dtype, rngs=rngs)
        self.block_in = MochiMidBlock3D(ch[-1], layers[-1], False,
                                        dtype=dtype, rngs=rngs)
        self.up_blocks = nnx.List(
            [MochiUpBlock3D(ch[-i - 1], ch[-i - 2], layers[-i - 2],
                            cfg.temporal_expansions[-i - 1],
                            cfg.spatial_expansions[-i - 1],
                            dtype=dtype, rngs=rngs)
             for i in range(len(ch) - 1)])
        self.block_out = MochiMidBlock3D(ch[0], layers[0], False,
                                         dtype=dtype, rngs=rngs)
        self.proj_out = Linear(ch[0], cfg.out_channels, use_bias=True,
                               dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = self.block_in(self.conv_in(z))
        for blk in self.up_blocks:
            x = blk(x)
        x = self.block_out(x)
        return self.proj_out(nnx.silu(x))  # no final norm (model.py:676-680)


@vae_registry.register("mochi.base", aliases=("mochi", "AutoencoderKLMochi"))
class AutoencoderKLMochi(nnx.Module):
    config_class = MochiVAEConfig

    def __init__(self, cfg: MochiVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = MochiEncoder3D(cfg, dtype=dtype, rngs=rngs)
        self.decoder = MochiDecoder3D(cfg, dtype=dtype, rngs=rngs)

    def _mean_std(self):
        if self.cfg.latents_mean is None:
            return None, None
        mean = jnp.asarray(self.cfg.latents_mean, jnp.float32).reshape(1, -1, 1, 1, 1)
        std = jnp.asarray(self.cfg.latents_std, jnp.float32).reshape(1, -1, 1, 1, 1)
        return mean, std

    def encode(self, video: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        """[B,3,T,H,W] in [-1,1] → model-space latents [B,12,T',h,w]."""
        x = jnp.transpose(video, (0, 2, 3, 4, 1))
        moments = jnp.transpose(self.encoder(x), (0, 4, 1, 2, 3))
        mean, logvar = jnp.split(moments, 2, axis=1)
        z = mean
        if sample and noise is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) * noise
        m, s = self._mean_std()
        if m is not None:
            z = (z - m) / s
        return z

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """model-space latents [B,12,T',h,w] → [B,3,T,H,W]; drops the leading
        temporal_compression−1 phantom frames (drop_last_temporal_frames)."""
        m, s = self._mean_std()
        if m is not None:
            z = z * s + m
        x = jnp.transpose(z, (0, 2, 3, 4, 1))
        out = jnp.transpose(self.decoder(x), (0, 4, 1, 2, 3))
        tcr = self.cfg.temporal_scale
        if out.shape[2] >= tcr:
            out = out[:, :, tcr - 1:]
        return out
