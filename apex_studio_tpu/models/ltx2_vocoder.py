"""LTX-2 vocoder (HiFi-GAN class) in JAX/NNX — mel spectrogram → waveform.

Counterpart of the reference's ``src/helpers/ltx2/vocoder.py:66``
(LTX2Vocoder): Conv1d stem, five ConvTranspose1d upsampling stages
(6·5·2·2·2 = 240× to 24 kHz), each followed by three parallel dilated
res-blocks averaged together, then a tanh-bounded stereo projection.
Transposed convs are expressed as zero-insertion dilated convs with
pre-flipped kernels — exact torch ConvTranspose1d semantics on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import helper_registry


@dataclasses.dataclass
class LTX2VocoderConfig:
    in_channels: int = 128
    hidden_channels: int = 1024
    out_channels: int = 2
    upsample_kernel_sizes: Tuple[int, ...] = (16, 15, 8, 4, 4)
    upsample_factors: Tuple[int, ...] = (6, 5, 2, 2, 2)
    resnet_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resnet_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    leaky_relu_negative_slope: float = 0.1
    output_sampling_rate: int = 24000

    @classmethod
    def from_dict(cls, d: dict) -> "LTX2VocoderConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in known:
                continue
            if isinstance(v, list):
                v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
            kw[k] = v
        return cls(**kw)


class Conv1d(nnx.Module):
    """NLC conv1d, kernel (k, in, out), 'same'-style padding with dilation."""

    def __init__(self, cin: int, cout: int, k: int, dilation: int = 1,
                 *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (k, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.dilation = dilation
        self.k = k

    def __call__(self, x):
        pad = (self.k - 1) * self.dilation // 2
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(1,),
            padding=((pad, pad),), rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y + self.bias.value


class ConvTranspose1d(nnx.Module):
    """torch ConvTranspose1d(k, s, p=(k-s)//2) as a zero-insert dilated conv;
    kernel stored pre-flipped (k, in, out) — converter handles torch layout."""

    def __init__(self, cin: int, cout: int, k: int, stride: int,
                 *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.w = nnx.Param(init(rngs.params(), (k, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride = stride
        self.k = k

    def __call__(self, x):
        p = (self.k - self.stride) // 2
        pad = self.k - 1 - p
        y = jax.lax.conv_general_dilated(
            x, self.w.value, window_strides=(1,), padding=((pad, pad),),
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y + self.bias.value


class _VocoderResBlock(nnx.Module):
    def __init__(self, ch: int, k: int, dilations: Tuple[int, ...],
                 slope: float, *, rngs: nnx.Rngs):
        self.convs1 = nnx.List([Conv1d(ch, ch, k, d, rngs=rngs) for d in dilations])
        self.convs2 = nnx.List([Conv1d(ch, ch, k, 1, rngs=rngs) for _ in dilations])
        self.slope = slope

    def __call__(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            h = c1(jax.nn.leaky_relu(x, self.slope))
            h = c2(jax.nn.leaky_relu(h, self.slope))
            x = x + h
        return x


@helper_registry.register("ltx2.vocoder", aliases=("LTX2Vocoder",))
class LTX2Vocoder(nnx.Module):
    config_class = LTX2VocoderConfig

    def __init__(self, cfg: LTX2VocoderConfig = LTX2VocoderConfig(), *,
                 dtype=jnp.float32, param_dtype=jnp.float32,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.conv_in = Conv1d(cfg.in_channels, cfg.hidden_channels, 7, rngs=rngs)
        ups, resnets = [], []
        ch = cfg.hidden_channels
        for k, s in zip(cfg.upsample_kernel_sizes, cfg.upsample_factors):
            ups.append(ConvTranspose1d(ch, ch // 2, k, s, rngs=rngs))
            ch //= 2
            for rk, rd in zip(cfg.resnet_kernel_sizes, cfg.resnet_dilations):
                resnets.append(_VocoderResBlock(
                    ch, rk, tuple(rd), cfg.leaky_relu_negative_slope, rngs=rngs))
        self.upsamplers = nnx.List(ups)
        self.resnets = nnx.List(resnets)
        self.conv_out = Conv1d(ch, cfg.out_channels, 7, rngs=rngs)

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel (B, C, T, M) → waveform (B, out_channels, T·240)."""
        cfg = self.cfg
        b, c, t, m = mel.shape
        x = mel.transpose(0, 2, 1, 3).reshape(b, t, c * m)  # NLC, C·M = 128
        x = self.conv_in(x)
        n_res = len(cfg.resnet_kernel_sizes)
        for i, up in enumerate(self.upsamplers):
            x = up(jax.nn.leaky_relu(x, cfg.leaky_relu_negative_slope))
            outs = [self.resnets[i * n_res + j](x) for j in range(n_res)]
            x = sum(outs) / float(n_res)
        x = jax.nn.leaky_relu(x, 0.01)  # final slope is torch's default
        x = jnp.tanh(self.conv_out(x))
        return x.transpose(0, 2, 1)
