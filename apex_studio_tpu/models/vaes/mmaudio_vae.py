"""MMAudio 1D audio VAE + BigVGAN vocoder in JAX/NNX.

Behavioral counterpart of the reference's ``src/vae/mmaudio/``:
- ``autoencoder/vae.py:448`` (VAE): magnitude-preserving (EDM2-style) 1D
  mel autoencoder — MPConv1D with forced weight normalization
  (``edm2_utils.py`` MPConv1D.remove_weight_norm: w←normalize(w)/√fan, here
  applied functionally in the forward so checkpoints load untouched),
  pixel-norm resnet blocks combined with mp_sum(t=0.3), single-head
  normalized-qkv attention at level 3, one 2× temporal down/up, per-bin mel
  statistics (data_mean/data_std buffers) folded in encode/decode.
- ``bigvgan/models.py:229`` (BigVGANVocoder): mel → waveform with
  anti-aliased SnakeBeta activations (2× kaiser-sinc upsample → snake →
  2× downsample, ``alias_free_torch/``), six transposed-conv upsample stages
  (4,4,2,2,2,2 from 1536 channels), AMPBlock1 residual stacks (kernels
  3/7/11, dilations 1/3/5). Torch ``weight_norm`` convs keep their
  ``weight_g``/``weight_v`` parametrization; the norm is computed in forward.

Used by Ovi (audio latents, engine/wan/ovi.py:620) and mova. 16k mode:
80 mel bins, 20 latent channels, hidden 384.
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

_MP_SILU_DIV = 0.596


def _mp_silu(x):
    return jax.nn.silu(x) / _MP_SILU_DIV


def _pixel_norm(x, eps=1e-4):
    """edm2 normalize(x, dim=1): torch.add(eps, norm, alpha=sqrt(1/C)) means
    the divisor is eps + ||x||/sqrt(C) — an RMS norm, NOT the raw L2 norm
    (edm2_utils.py:65-70)."""
    c = x.shape[-1]
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    n = eps + n / np.sqrt(c)
    return (x.astype(jnp.float32) / n).astype(x.dtype)


def _mp_sum(a, b, t=0.3):
    return (a * (1 - t) + b * t) / np.sqrt((1 - t) ** 2 + t ** 2)


class MPConv1d(nnx.Module):
    """MPConv1D with the forced weight norm applied functionally:
    w_eff = normalize(w)/√(I·K) (edm2_utils.py remove_weight_norm)."""

    def __init__(self, cin, cout, k, *, dtype, rngs):
        self.weight = nnx.Param(
            jax.random.normal(rngs.params(), (cout, cin, k), jnp.float32))
        self.k = k
        self.dtype = dtype

    def _w(self, gain=1.0):
        # remove_weight_norm (edm2_utils.py:168-175): w/(1e-4 + ||w||/sqrt(N))
        # then /sqrt(N) — net unit-ish row norm, NOT 1/sqrt(N)
        w = self.weight.value.astype(jnp.float32)
        o, i, k = w.shape
        n = jnp.linalg.norm(w.reshape(o, -1), axis=-1)[:, None, None]
        n = 1e-4 + n / np.sqrt(i * k)
        w = w / n / np.sqrt(i * k)
        return (w * gain).astype(self.dtype)

    def __call__(self, x, gain=1.0):
        # x: [B, T, C] (NWC); kernel torch [O,I,K] → WIO
        w = jnp.transpose(self._w(gain), (2, 1, 0))
        pad = self.k // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, window_strides=(1,), padding=((pad, pad),),
            dimension_numbers=("NWC", "WIO", "NWC"))


class MPResnetBlock1D(nnx.Module):
    def __init__(self, cin, cout, k, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        self.conv1 = MPConv1d(cin, cout, k, **kw)
        self.conv2 = MPConv1d(cout, cout, k, **kw)
        self.nin_shortcut = MPConv1d(cin, cout, 1, **kw) if cin != cout else None

    def __call__(self, x):
        x = _pixel_norm(x)
        h = self.conv1(_mp_silu(x))
        h = self.conv2(_mp_silu(h))
        if self.nin_shortcut is not None:
            x = self.nin_shortcut(x)
        return _mp_sum(x, h, t=0.3)


class MPAttnBlock1D(nnx.Module):
    def __init__(self, dim, *, dtype, rngs):
        self.qkv = MPConv1d(dim, dim * 3, 1, dtype=dtype, rngs=rngs)
        self.proj_out = MPConv1d(dim, dim, 1, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        b, t, c = x.shape
        # the qkv rows are PER-CHANNEL [q_i|k_i|v_i] triplets: the reference
        # reshapes (b, heads, C, 3, l) with C slow (vae_modules.py:69), not
        # [all-q | all-k | all-v]
        y = self.qkv(x).reshape(b, t, c, 3)
        # normalize over the channel dim of each of q/k/v (vae_modules.py:70)
        y32 = y.astype(jnp.float32)
        n = jnp.linalg.norm(y32, axis=-2, keepdims=True)
        y = (y32 / (1e-4 + n / np.sqrt(c))).astype(x.dtype)
        q, k, v = y[..., 0], y[..., 1], y[..., 2]
        attn = jax.nn.softmax(
            (q @ k.swapaxes(1, 2)).astype(jnp.float32) / np.sqrt(c), axis=-1)
        h = (attn.astype(v.dtype) @ v)
        return _mp_sum(x, self.proj_out(h), t=0.3)


@dataclasses.dataclass
class MMAudioVAEConfig:
    mode: str = "16k"
    data_dim: int = 80
    embed_dim: int = 20
    hidden_dim: int = 384
    num_res_blocks: int = 2
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    attn_layers: Tuple[int, ...] = (3,)
    down_layers: Tuple[int, ...] = (0,)
    # vocoder (bigvgan_vocoder.yml)
    vocoder_channels: int = 1536
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[int, ...] = (1, 3, 5)
    sample_rate: int = 16000
    hop_length: int = 256
    with_vocoder: bool = True

    @classmethod
    def from_dict(cls, cfg: dict) -> "MMAudioVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if kw.get("mode") == "44k":
            kw.setdefault("data_dim", 128)
            kw.setdefault("embed_dim", 40)
            kw.setdefault("hidden_dim", 512)
            kw.setdefault("sample_rate", 44100)
        for key in ("ch_mult", "attn_layers", "down_layers", "upsample_rates",
                    "upsample_kernel_sizes", "resblock_kernel_sizes",
                    "resblock_dilations"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)

    @property
    def latent_dim(self) -> int:
        return self.embed_dim


class MMAudioEncoder1D(nnx.Module):
    def __init__(self, cfg: MMAudioVAEConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        dim = cfg.hidden_dim
        self.conv_in = MPConv1d(cfg.data_dim, dim, 3, **kw)
        in_mult = (1,) + tuple(cfg.ch_mult)
        self.levels = []
        downs = []
        for i, mult in enumerate(cfg.ch_mult):
            block_in, block_out = dim * in_mult[i], dim * mult
            blocks, attns = [], []
            for _ in range(cfg.num_res_blocks):
                blocks.append(MPResnetBlock1D(block_in, block_out, 3, **kw))
                block_in = block_out
                if i in cfg.attn_layers:
                    attns.append(MPAttnBlock1D(block_in, **kw))
            downs.append((nnx.List(blocks), nnx.List(attns),
                          MPConv1d(block_in, block_in, 1, **kw)
                          if i in cfg.down_layers else None,
                          MPConv1d(block_in, block_in, 1, **kw)
                          if i in cfg.down_layers else None))
        # register as attributes for checkpoint-path stability
        self.down = nnx.List([nnx.List([b, a] + ([d1, d2] if d1 is not None else []))
                              for (b, a, d1, d2) in downs])
        self.cfg = cfg
        bi = dim * cfg.ch_mult[-1]
        self.mid_block_1 = MPResnetBlock1D(bi, bi, 3, **kw)
        self.mid_attn_1 = MPAttnBlock1D(bi, **kw)
        self.mid_block_2 = MPResnetBlock1D(bi, bi, 3, **kw)
        self.conv_out = MPConv1d(bi, 2 * cfg.embed_dim, 3, **kw)
        self.learnable_gain = nnx.Param(jnp.zeros((), jnp.float32))

    def __call__(self, x):
        cfg = self.cfg
        h = self.conv_in(x)
        for i, level in enumerate(self.down):
            blocks, attns = level[0], level[1]
            for j, blk in enumerate(blocks):
                h = blk(h)
                if len(attns):
                    h = attns[j](h)
                h = jnp.clip(h, -256.0, 256.0)
            if len(level) == 4:  # downsample: conv1 → avgpool2 → conv2
                h = level[2](h)
                t = h.shape[1] - h.shape[1] % 2
                h = h[:, :t].reshape(h.shape[0], t // 2, 2, -1).mean(axis=2)
                h = level[3](h)
        h = self.mid_block_2(self.mid_attn_1(self.mid_block_1(h)))
        h = jnp.clip(h, -256.0, 256.0)
        return self.conv_out(_mp_silu(h), gain=self.learnable_gain.value + 1.0)


class MMAudioDecoder1D(nnx.Module):
    def __init__(self, cfg: MMAudioVAEConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        dim = cfg.hidden_dim
        n = len(cfg.ch_mult)
        block_in = dim * cfg.ch_mult[-1]
        self.conv_in = MPConv1d(cfg.embed_dim, block_in, 3, **kw)
        self.mid_block_1 = MPResnetBlock1D(block_in, block_in, 3, **kw)
        self.mid_attn_1 = MPAttnBlock1D(block_in, **kw)
        self.mid_block_2 = MPResnetBlock1D(block_in, block_in, 3, **kw)
        up_layers = [i + 1 for i in cfg.down_layers]
        ups = [None] * n
        for i_level in reversed(range(n)):
            block_out = dim * cfg.ch_mult[i_level]
            blocks, attns = [], []
            for _ in range(cfg.num_res_blocks + 1):
                blocks.append(MPResnetBlock1D(block_in, block_out, 3, **kw))
                block_in = block_out
                if i_level in cfg.attn_layers:
                    attns.append(MPAttnBlock1D(block_in, **kw))
            parts = [nnx.List(blocks), nnx.List(attns)]
            if i_level in up_layers:
                parts.append(MPConv1d(block_in, block_in, 3, **kw))
            ups[i_level] = nnx.List(parts)
        self.up = nnx.List(ups)
        self._up_layers = tuple(up_layers)
        self.conv_out = MPConv1d(block_in, cfg.data_dim, 3, **kw)
        self.learnable_gain = nnx.Param(jnp.zeros((), jnp.float32))

    def __call__(self, z):
        h = self.conv_in(z)
        h = self.mid_block_2(self.mid_attn_1(self.mid_block_1(h)))
        h = jnp.clip(h, -256.0, 256.0)
        for i_level in reversed(range(len(self.up))):
            level = self.up[i_level]
            blocks, attns = level[0], level[1]
            for j, blk in enumerate(blocks):
                h = blk(h)
                if len(attns):
                    h = attns[j](h)
                h = jnp.clip(h, -256.0, 256.0)
            if i_level in self._up_layers:
                b, t, c = h.shape  # nearest-exact 2x then conv
                h = jnp.repeat(h, 2, axis=1)
                h = level[2](h)
        return self.conv_out(_mp_silu(h), gain=self.learnable_gain.value + 1.0)


# ------------------------------------------------------------------------------
# BigVGAN vocoder
# ------------------------------------------------------------------------------


def _kaiser_beta(a):
    if a > 50.0:
        return 0.1102 * (a - 8.7)
    if a >= 21.0:
        return 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    return 0.0


def _kaiser_sinc_filter(cutoff, half_width, kernel_size) -> np.ndarray:
    even = kernel_size % 2 == 0
    half = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half - 1) * math.pi * delta_f + 7.95
    beta = _kaiser_beta(a)
    window = np.kaiser(kernel_size, beta)
    time = (np.arange(-half, half) + 0.5) if even else (np.arange(kernel_size) - half)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


class SnakeBeta(nnx.Module):
    def __init__(self, ch, *, rngs):
        self.alpha = nnx.Param(jnp.zeros((ch,), jnp.float32))  # logscale init 0
        self.beta = nnx.Param(jnp.zeros((ch,), jnp.float32))

    def __call__(self, x):  # [B, T, C]
        a = jnp.exp(self.alpha.value)
        b = jnp.exp(self.beta.value)
        x32 = x.astype(jnp.float32)
        return (x32 + (1.0 / (b + 1e-9)) * jnp.sin(x32 * a) ** 2).astype(x.dtype)


class AntiAliasedSnake(nnx.Module):
    """Activation1d: 2x kaiser upsample → snakebeta → 2x kaiser downsample."""

    def __init__(self, ch, *, rngs):
        self.act = SnakeBeta(ch, rngs=rngs)
        k = 12
        self.up_filter = jnp.asarray(
            _kaiser_sinc_filter(0.5 / 2, 0.6 / 2, k))
        self.down_filter = self.up_filter
        self.k = k

    def __call__(self, x):  # [B, T, C]
        b, t, c = x.shape
        k, ratio = self.k, 2
        pad = k // ratio - 1
        pad_l = pad * ratio + (k - ratio) // 2
        pad_r = pad * ratio + (k - ratio + 1) // 2
        # UpSample1d: replicate pad → per-channel (depthwise via channel→batch)
        # transpose conv with the kaiser-sinc filter → crop (resample.py:26-35)
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        xc = xp.astype(jnp.float32).transpose(0, 2, 1).reshape(b * c, -1, 1)
        # jax conv_transpose pad (k-1-p, k-1-p) ≡ torch ConvTranspose1d pad p;
        # torch here uses p=0
        y = jax.lax.conv_transpose(
            xc, self.up_filter[:, None, None] * ratio, strides=(ratio,),
            padding=((k - 1, k - 1),), dimension_numbers=("NWC", "WIO", "NWC"))
        y = y[:, pad_l:y.shape[1] - pad_r]
        y = self.act(y.reshape(b, c, -1).transpose(0, 2, 1))
        # DownSample1d: replicate pad then strided depthwise conv
        even = k % 2 == 0
        pl, pr = k // 2 - int(even), k // 2
        yc = y.astype(jnp.float32).transpose(0, 2, 1).reshape(b * c, -1, 1)
        yc = jnp.pad(yc, ((0, 0), (pl, pr), (0, 0)), mode="edge")
        z = jax.lax.conv_general_dilated(
            yc, self.down_filter[:, None, None], window_strides=(ratio,),
            padding=((0, 0),), dimension_numbers=("NWC", "WIO", "NWC"))
        return z.reshape(b, c, -1).transpose(0, 2, 1).astype(x.dtype)


class WNConv1d(nnx.Module):
    """torch weight_norm conv1d: checkpoint keeps weight_g [O,1,1] and
    weight_v [O,I,K]; w = g·v/||v|| computed in forward."""

    def __init__(self, cin, cout, k, stride=1, dilation=1, pad=None, *,
                 dtype, rngs):
        self.weight_v = nnx.Param(
            jax.random.normal(rngs.params(), (cout, cin, k), jnp.float32) * 0.01)
        self.weight_g = nnx.Param(jnp.ones((cout, 1, 1), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride, self.dilation, self.k = stride, dilation, k
        self.pad = pad
        self.dtype = dtype

    def _w(self):
        v = self.weight_v.value.astype(jnp.float32)
        o = v.shape[0]
        n = jnp.linalg.norm(v.reshape(o, -1), axis=-1)[:, None, None]
        return (self.weight_g.value * v / jnp.maximum(n, 1e-12)).astype(self.dtype)

    def __call__(self, x):
        pad = self.pad
        if pad is None:
            pad = (self.k * self.dilation - self.dilation) // 2
        w = jnp.transpose(self._w(), (2, 1, 0))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, window_strides=(self.stride,),
            padding=((pad, pad),), rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y + self.bias.value.astype(y.dtype)


class WNConvTranspose1d(nnx.Module):
    def __init__(self, cin, cout, k, stride, pad=None, *, dtype, rngs):
        self.weight_v = nnx.Param(
            jax.random.normal(rngs.params(), (cin, cout, k), jnp.float32) * 0.01)
        self.weight_g = nnx.Param(jnp.ones((cin, 1, 1), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride, self.k = stride, k
        self.pad = pad
        self.dtype = dtype

    def __call__(self, x):
        v = self.weight_v.value.astype(jnp.float32)
        i = v.shape[0]
        n = jnp.linalg.norm(v.reshape(i, -1), axis=-1)[:, None, None]
        w = (self.weight_g.value * v / jnp.maximum(n, 1e-12)).astype(self.dtype)
        # torch ConvTranspose1d weight [I, O, K]; with transpose_kernel=True
        # JAX expects the gradient-style layout [K, O, I] (I/O swapped back
        # internally) — matching torch's scatter formulation.
        wj = jnp.transpose(w, (2, 1, 0))  # [K, O, I]
        pad = self.pad
        if pad is None:
            pad = (self.k - self.stride) // 2
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), wj, strides=(self.stride,),
            padding=((self.k - 1 - pad, self.k - 1 - pad),),
            dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True)
        return y + self.bias.value.astype(y.dtype)


class AMPBlock1(nnx.Module):
    def __init__(self, ch, k, dilations, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        self.convs1 = nnx.List([WNConv1d(ch, ch, k, dilation=d, **kw)
                                for d in dilations])
        self.convs2 = nnx.List([WNConv1d(ch, ch, k, dilation=1, **kw)
                                for _ in dilations])
        self.activations = nnx.List([AntiAliasedSnake(ch, rngs=rngs)
                                     for _ in range(2 * len(dilations))])

    def __call__(self, x):
        for i, (c1, c2) in enumerate(zip(self.convs1, self.convs2)):
            xt = self.activations[2 * i](x)
            xt = c1(xt)
            xt = self.activations[2 * i + 1](xt)
            xt = c2(xt)
            x = xt + x
        return x


class BigVGANVocoder(nnx.Module):
    def __init__(self, cfg: MMAudioVAEConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        c0 = cfg.vocoder_channels
        self.conv_pre = WNConv1d(cfg.data_dim, c0, 7, **kw)
        ups, resblocks = [], []
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ups.append(WNConvTranspose1d(c0 // (2 ** i), c0 // (2 ** (i + 1)),
                                         k, u, **kw))
            ch = c0 // (2 ** (i + 1))
            for rk in cfg.resblock_kernel_sizes:
                resblocks.append(AMPBlock1(ch, rk, cfg.resblock_dilations, **kw))
        self.ups = nnx.List(ups)
        self.resblocks = nnx.List(resblocks)
        self.activation_post = AntiAliasedSnake(ch, rngs=rngs)
        self.conv_post = WNConv1d(ch, 1, 7, **kw)
        self.num_kernels = len(cfg.resblock_kernel_sizes)

    def __call__(self, mel):  # [B, T, n_mels] → [B, samples]
        x = self.conv_pre(mel)
        for i, up in enumerate(self.ups):
            x = up(x)
            acc = None
            for j in range(self.num_kernels):
                y = self.resblocks[i * self.num_kernels + j](x)
                acc = y if acc is None else acc + y
            x = acc / self.num_kernels
        x = self.activation_post(x)
        x = jnp.tanh(self.conv_post(x).astype(jnp.float32))
        return x[..., 0]


@vae_registry.register("mmaudio", aliases=("AutoencoderMMAudio", "mmaudio.base"))
class AutoencoderMMAudio(nnx.Module):
    """Public API: latents [B, C_lat, L] ↔ mel; decode → waveform [B, N]."""

    config_class = MMAudioVAEConfig

    def __init__(self, cfg: Optional[MMAudioVAEConfig] = None, *,
                 dtype=jnp.float32, param_dtype=jnp.float32, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg = cfg or MMAudioVAEConfig()
        kw = dict(dtype=dtype, rngs=rngs)
        self.encoder = MMAudioEncoder1D(cfg, **kw)
        self.decoder = MMAudioDecoder1D(cfg, **kw)
        self.data_mean = nnx.Param(jnp.zeros((cfg.data_dim,), jnp.float32))
        self.data_std = nnx.Param(jnp.ones((cfg.data_dim,), jnp.float32))
        self.vocoder = BigVGANVocoder(cfg, **kw) if cfg.with_vocoder else None

    def encode_mel(self, mel):
        """mel [B, n_mels, T] → latents [B, embed_dim, T'] (dist mode)."""
        x = mel.transpose(0, 2, 1)
        x = (x - self.data_mean.value) / self.data_std.value
        moments = self.encoder(x)
        mean = moments[..., :self.cfg.embed_dim]
        return mean.transpose(0, 2, 1)

    def decode_mel(self, z):
        """latents [B, embed_dim, L] → mel [B, n_mels, T]."""
        h = self.decoder(z.transpose(0, 2, 1))
        h = h * self.data_std.value + self.data_mean.value
        return h.transpose(0, 2, 1)

    def decode(self, z):
        """latents [B, embed_dim, L] → waveform [B, N] (mel → BigVGAN)."""
        mel = self.decode_mel(z)
        if self.vocoder is None:
            return mel
        return self.vocoder(mel.transpose(0, 2, 1))
