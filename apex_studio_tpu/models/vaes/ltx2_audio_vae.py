"""LTX-2 audio VAE (mel-spectrogram KL autoencoder) in JAX/NNX.

Counterpart of the reference's ``src/vae/ltx2audio/model.py:782``
(AutoencoderKLLTX2Audio): a 2D VQGAN-style encoder/decoder over stereo mel
spectrograms (B, 2, T, 64) with *time-causal* convolutions (the "height"
causality axis — all padding on the past side of the time dimension),
pixel-norm resnets, 4× time/mel downsampling (ch_mult (1,2,4)), latent
channels 8. The latent patchified over mel bins — (B, T', 8·16=128) — is
exactly the DiT's audio stream (transformer audio_in_channels=128).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry


@dataclasses.dataclass
class LTX2AudioVAEConfig:
    base_channels: int = 128
    output_channels: int = 2
    in_channels: int = 2
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    latent_channels: int = 8
    mel_bins: int = 64
    sample_rate: int = 16000
    mel_hop_length: int = 160
    double_z: bool = True
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None

    @property
    def temporal_compression_ratio(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    @classmethod
    def from_dict(cls, d: dict) -> "LTX2AudioVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in d.items() if k in known}
        return cls(**kw)


def _pixel_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    # channel axis is last (NHWC)
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


class CausalConv2d(nnx.Module):
    """k×k conv on (B, T, M, C) with all temporal padding on the past side
    (causality_axis='height', model.py:36)."""

    def __init__(self, cin: int, cout: int, kernel: int = 3, stride: int = 1,
                 *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(
            init(rngs.params(), (kernel, kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.k = kernel
        self.stride = stride

    def __call__(self, x):
        k = self.k
        pw = k - 1
        x = jnp.pad(x, ((0, 0), (pw, 0), (pw // 2, pw - pw // 2), (0, 0)))
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(self.stride, self.stride),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.bias.value


class _AudioResnet(nnx.Module):
    def __init__(self, cin: int, cout: int, *, rngs: nnx.Rngs):
        self.conv1 = CausalConv2d(cin, cout, rngs=rngs)
        self.conv2 = CausalConv2d(cout, cout, rngs=rngs)
        self.nin_shortcut = (CausalConv2d(cin, cout, kernel=1, rngs=rngs)
                             if cin != cout else None)

    def __call__(self, x):
        h = self.conv1(nnx.silu(_pixel_norm(x)))
        h = self.conv2(nnx.silu(_pixel_norm(h)))
        if self.nin_shortcut is not None:
            x = self.nin_shortcut(x)
        return x + h


class _AudioDown(nnx.Module):
    """Stride-2 conv with past-heavy temporal pad ((0,1) mel, (2,0) time)."""

    def __init__(self, ch: int, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (3, 3, ch, ch), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((ch,), jnp.float32))

    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (2, 0), (0, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.bias.value


class _AudioUp(nnx.Module):
    """2× nearest upsample + causal conv, trimming the leading time row."""

    def __init__(self, ch: int, *, rngs: nnx.Rngs):
        self.conv = CausalConv2d(ch, ch, rngs=rngs)

    def __call__(self, x):
        b, t, m, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = self.conv(x)
        return x[:, 1:]


class LTX2AudioEncoder(nnx.Module):
    def __init__(self, cfg: LTX2AudioVAEConfig, *, rngs: nnx.Rngs):
        ch = cfg.base_channels
        self.conv_in = CausalConv2d(cfg.in_channels, ch, rngs=rngs)
        stages = []
        block_in = ch
        for level, mult in enumerate(cfg.ch_mult):
            block_out = cfg.base_channels * mult
            blocks = []
            for _ in range(cfg.num_res_blocks):
                blocks.append(_AudioResnet(block_in, block_out, rngs=rngs))
                block_in = block_out
            down = (_AudioDown(block_in, rngs=rngs)
                    if level != len(cfg.ch_mult) - 1 else None)
            stages.append(nnx.List([nnx.List(blocks), down]))
        self.down = nnx.List(stages)
        self.mid_1 = _AudioResnet(block_in, block_in, rngs=rngs)
        self.mid_2 = _AudioResnet(block_in, block_in, rngs=rngs)
        z = cfg.latent_channels * (2 if cfg.double_z else 1)
        self.conv_out = CausalConv2d(block_in, z, rngs=rngs)

    def __call__(self, x):
        x = self.conv_in(x)
        for blocks, down in self.down:
            for b in blocks:
                x = b(x)
            if down is not None:
                x = down(x)
        x = self.mid_2(self.mid_1(x))
        return self.conv_out(nnx.silu(_pixel_norm(x)))


class LTX2AudioDecoder(nnx.Module):
    def __init__(self, cfg: LTX2AudioVAEConfig, *, rngs: nnx.Rngs):
        block_in = cfg.base_channels * cfg.ch_mult[-1]
        self.conv_in = CausalConv2d(cfg.latent_channels, block_in, rngs=rngs)
        self.mid_1 = _AudioResnet(block_in, block_in, rngs=rngs)
        self.mid_2 = _AudioResnet(block_in, block_in, rngs=rngs)
        # indexed like the checkpoint: up[level] with level 0 = shallowest
        # (torch builds with insert(0) and iterates deepest-first)
        stages: list = [None] * len(cfg.ch_mult)
        for level in reversed(range(len(cfg.ch_mult))):
            block_out = cfg.base_channels * cfg.ch_mult[level]
            blocks = []
            for _ in range(cfg.num_res_blocks + 1):
                blocks.append(_AudioResnet(block_in, block_out, rngs=rngs))
                block_in = block_out
            up = _AudioUp(block_in, rngs=rngs) if level != 0 else None
            stages[level] = nnx.List([nnx.List(blocks), up])
        self.up = nnx.List(stages)
        self.conv_out = CausalConv2d(block_in, cfg.output_channels, rngs=rngs)

    def __call__(self, z):
        x = self.conv_in(z)
        x = self.mid_2(self.mid_1(x))
        for level in reversed(range(len(self.up))):
            blocks, up = self.up[level]
            for b in blocks:
                x = b(x)
            if up is not None:
                x = up(x)
        return self.conv_out(nnx.silu(_pixel_norm(x)))


@vae_registry.register("ltx2audio", aliases=("AutoencoderKLLTX2Audio",
                                             "ltx2_audio"))
class AutoencoderKLLTX2Audio(nnx.Module):
    config_class = LTX2AudioVAEConfig

    def __init__(self, cfg: LTX2AudioVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = LTX2AudioEncoder(cfg, rngs=rngs)
        self.decoder = LTX2AudioDecoder(cfg, rngs=rngs)

    @property
    def temporal_compression_ratio(self) -> int:
        return self.cfg.temporal_compression_ratio

    def _mean_std(self):
        if self.cfg.latents_mean is None:
            return None, None
        m = jnp.asarray(self.cfg.latents_mean, jnp.float32).reshape(1, -1, 1, 1)
        s = jnp.asarray(self.cfg.latents_std, jnp.float32).reshape(1, -1, 1, 1)
        return m, s

    def encode(self, mel: jnp.ndarray, sample: bool = False, noise=None):
        """mel (B, C, T, M) → latents (B, z, T/4, M/4)."""
        x = mel.transpose(0, 2, 3, 1)
        moments = self.encoder(x).transpose(0, 3, 1, 2)
        mean, logvar = jnp.split(moments, 2, axis=1)
        z = mean
        if sample and noise is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) * noise
        m, s = self._mean_std()
        if m is not None:
            z = (z - m) / s
        return z

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """latents (B, z, T', M') → mel (B, C, 4T'−3, mel_bins).

        The reference decoder crops/zero-pads its network output to the
        causal target T'·LATENT_DOWNSAMPLE_FACTOR − 3 frames × mel_bins
        regardless of how far ch_mult actually upsamples (model.py:753-779)."""
        m, s = self._mean_std()
        if m is not None:
            z = z * s + m
        x = self.decoder(z.transpose(0, 2, 3, 1))
        x = x.transpose(0, 3, 1, 2)
        target_t = max(z.shape[2] * 4 - 3, 1)
        target_f = self.cfg.mel_bins
        x = x[:, : self.cfg.output_channels, :target_t, :target_f]
        pad_t = target_t - x.shape[2]
        pad_f = target_f - x.shape[3]
        if pad_t > 0 or pad_f > 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, max(pad_t, 0)), (0, max(pad_f, 0))))
        return x

    # -- DiT stream adapters (LTX2AudioAudioPatchifier, model.py:354) -------------

    @staticmethod
    def patchify(latents: jnp.ndarray) -> jnp.ndarray:
        """(B, z, T', M') → (B, T', z·M') — the transformer's audio tokens."""
        b, c, t, m = latents.shape
        return latents.transpose(0, 2, 1, 3).reshape(b, t, c * m)

    @staticmethod
    def unpatchify(tokens: jnp.ndarray, channels: int, mel_bins: int) -> jnp.ndarray:
        b, t, _ = tokens.shape
        return tokens.reshape(b, t, channels, mel_bins).transpose(0, 2, 1, 3)
