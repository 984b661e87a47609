"""MOVA audio VAE (descript DAC) in JAX/NNX.

Counterpart of the reference's ``src/vae/movaaudiovae/model.py`` — a DAC
codec (model.py:810) run in *continuous* mode for MOVA: the encoder produces
``latent_dim`` features at ``hop_length = prod(encoder_rates)`` samples per
step, a 1×1 ``quant_conv`` emits Gaussian moments, and the decoder
(``post_quant_conv`` → snake/transposed-conv stack → tanh, model.py:778)
reconstructs the waveform. The RVQ codebook path (model.py:430) is a codec
training detail the MOVA engine never touches; the discrete branch is
therefore omitted.

All convs keep the torch weight-norm parameterisation (weight_g/weight_v
computed in forward) so published checkpoints load without rewriting norms.
Layout is NWC internally; the public API is channel-first [B, C, T] to match
the engine's latent convention.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.models.vaes.mmaudio_vae import WNConv1d, WNConvTranspose1d


@dataclasses.dataclass
class DACConfig:
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 8, 8)
    latent_dim: Optional[int] = None
    decoder_dim: int = 1536
    decoder_rates: Tuple[int, ...] = (8, 8, 4, 2)
    sample_rate: int = 44100
    continuous: bool = True
    d_out: int = 1

    @property
    def resolved_latent_dim(self) -> int:
        if self.latent_dim is not None:
            return self.latent_dim
        return self.encoder_dim * (2 ** len(self.encoder_rates))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @classmethod
    def from_dict(cls, d: dict) -> "DACConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        for key in ("encoder_rates", "decoder_rates"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)


class Snake1d(nnx.Module):
    """model.py:333 — x + sin²(αx)/α with per-channel α."""

    def __init__(self, ch: int, *, rngs: nnx.Rngs):
        self.alpha = nnx.Param(jnp.ones((1, ch, 1), jnp.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = jnp.transpose(self.alpha.value, (0, 2, 1)).astype(jnp.float32)  # [1,1,C]
        x32 = x.astype(jnp.float32)
        y = x32 + jnp.sin(a * x32) ** 2 / (a + 1e-9)
        return y.astype(x.dtype)


class Conv1d(nnx.Module):
    """Plain torch Conv1d (quant/post-quant 1×1); kernel kept [O, I, K]."""

    def __init__(self, cin: int, cout: int, k: int = 1, *, dtype, rngs):
        self.w = nnx.Param(
            jax.random.normal(rngs.params(), (cout, cin, k), jnp.float32) * 0.02)
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.dtype = dtype
        self.k = k

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = jnp.transpose(self.w.value, (2, 1, 0)).astype(self.dtype)
        pad = self.k // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, window_strides=(1,),
            padding=((pad, pad),), dimension_numbers=("NWC", "WIO", "NWC"))
        return y + self.bias.value.astype(y.dtype)


class ResidualUnit(nnx.Module):
    """model.py:686 — snake → dilated k7 WN conv → snake → k1 WN conv + skip."""

    def __init__(self, dim: int, dilation: int, *, dtype, rngs):
        pad = ((7 - 1) * dilation) // 2
        self.block = nnx.List([
            Snake1d(dim, rngs=rngs),
            WNConv1d(dim, dim, 7, dilation=dilation, pad=pad, dtype=dtype,
                     rngs=rngs),
            Snake1d(dim, rngs=rngs),
            WNConv1d(dim, dim, 1, dtype=dtype, rngs=rngs),
        ])

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x
        for m in self.block:
            y = m(y)
        return x + y


class EncoderBlock(nnx.Module):
    def __init__(self, dim: int, stride: int, *, dtype, rngs):
        self.block = nnx.List([
            ResidualUnit(dim // 2, 1, dtype=dtype, rngs=rngs),
            ResidualUnit(dim // 2, 3, dtype=dtype, rngs=rngs),
            ResidualUnit(dim // 2, 9, dtype=dtype, rngs=rngs),
            Snake1d(dim // 2, rngs=rngs),
            WNConv1d(dim // 2, dim, 2 * stride, stride=stride,
                     pad=math.ceil(stride / 2), dtype=dtype, rngs=rngs),
        ])

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for m in self.block:
            x = m(x)
        return x


class DecoderBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, stride: int, *, dtype, rngs):
        self.block = nnx.List([
            Snake1d(cin, rngs=rngs),
            WNConvTranspose1d(cin, cout, 2 * stride, stride,
                              pad=math.ceil(stride / 2), dtype=dtype,
                              rngs=rngs),
            ResidualUnit(cout, 1, dtype=dtype, rngs=rngs),
            ResidualUnit(cout, 3, dtype=dtype, rngs=rngs),
            ResidualUnit(cout, 9, dtype=dtype, rngs=rngs),
        ])

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for m in self.block:
            x = m(x)
        return x


class DACEncoder(nnx.Module):
    """model.py:726 — conv7 → stride blocks doubling channels → snake/conv3."""

    def __init__(self, cfg: DACConfig, *, dtype, rngs):
        d = cfg.encoder_dim
        mods = [WNConv1d(1, d, 7, pad=3, dtype=dtype, rngs=rngs)]
        for s in cfg.encoder_rates:
            d *= 2
            mods.append(EncoderBlock(d, s, dtype=dtype, rngs=rngs))
        mods += [Snake1d(d, rngs=rngs),
                 WNConv1d(d, cfg.resolved_latent_dim, 3, pad=1, dtype=dtype,
                          rngs=rngs)]
        self.block = nnx.List(mods)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for m in self.block:
            x = m(x)
        return x


class DACDecoder(nnx.Module):
    """model.py:778 — conv7 → upsample blocks halving channels → tanh."""

    def __init__(self, cfg: DACConfig, *, dtype, rngs):
        ch = cfg.decoder_dim
        mods = [WNConv1d(cfg.resolved_latent_dim, ch, 7, pad=3, dtype=dtype,
                         rngs=rngs)]
        out = ch
        for i, s in enumerate(cfg.decoder_rates):
            cin, out = ch // (2 ** i), ch // (2 ** (i + 1))
            mods.append(DecoderBlock(cin, out, s, dtype=dtype, rngs=rngs))
        mods += [Snake1d(out, rngs=rngs),
                 WNConv1d(out, cfg.d_out, 7, pad=3, dtype=dtype, rngs=rngs)]
        self.model = nnx.List(mods)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for m in self.model:
            x = m(x)
        return jnp.tanh(x)


@vae_registry.register("dac", aliases=("movaaudiovae", "DAC"))
class DACVAE(nnx.Module):
    """Continuous DAC (model.py:810). [B, C, T] in/out."""

    config_class = DACConfig

    def __init__(self, cfg: DACConfig = None, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        cfg = cfg or DACConfig()
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        ld = cfg.resolved_latent_dim
        self.encoder = DACEncoder(cfg, dtype=dtype, rngs=rngs)
        if cfg.continuous:
            self.quant_conv = Conv1d(ld, 2 * ld, 1, dtype=dtype, rngs=rngs)
            self.post_quant_conv = Conv1d(ld, ld, 1, dtype=dtype, rngs=rngs)
        self.decoder = DACDecoder(cfg, dtype=dtype, rngs=rngs)

    @property
    def hop_length(self) -> int:
        return self.cfg.hop_length

    def encode(self, audio: jnp.ndarray, sample: bool = False,
               noise=None) -> jnp.ndarray:
        """[B, 1, T] waveform → [B, D, T'] latents (Gaussian mode/sample)."""
        t = audio.shape[-1]
        pad = math.ceil(t / self.cfg.hop_length) * self.cfg.hop_length - t
        if pad:
            audio = jnp.pad(audio, ((0, 0), (0, 0), (0, pad)))
        z = self.encoder(jnp.transpose(audio, (0, 2, 1)))
        if self.cfg.continuous:
            m = self.quant_conv(z)
            mean, logvar = jnp.split(m, 2, axis=-1)
            z = mean
            if sample and noise is not None:
                z = mean + jnp.exp(
                    0.5 * jnp.clip(logvar, -30.0, 20.0)) * noise
        return jnp.transpose(z, (0, 2, 1))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """[B, D, T'] latents → [B, 1, T'·hop] waveform."""
        h = jnp.transpose(z, (0, 2, 1))
        if self.cfg.continuous:
            h = self.post_quant_conv(h)
        audio = self.decoder(h)
        return jnp.transpose(audio, (0, 2, 1))
