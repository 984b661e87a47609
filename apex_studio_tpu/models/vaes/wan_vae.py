"""Wan 3D-causal video VAE in JAX/NNX.

Counterpart of the reference's ``src/vae/wan/model.py`` (WanCausalConv3d:136,
WanEncoder3d:582, WanDecoder3d:881, AutoencoderKLWan:1083). The reference
streams frames through the network with per-layer feature caches; here the
same causal semantics are expressed as full-sequence ops (TPU-first: one big
program, XLA pipelines the convs), derived from the cache behaviour:

- causal conv3d  ≡ front-pad time by 2·pad_t, symmetric spatial padding
- downsample3d   ≡ [x₀, stride-2 valid conv over windows (0..2), (2..4), …]
- upsample3d     ≡ frame 0 bypasses; frames 1..T-1 go through the causal
  time_conv with frame 0 *zeroed out of their history* (the cache "Rep"
  marker), then channel-pairs interleave to double time
- spatial resampling runs per-frame after (up) / before (down) the time op

Latent normalization matches AutoencoderKLWan: model-space z = (raw − mean)/std
per channel (config latents_mean/latents_std).

Temporal chunked decode + spatial tiling (the reference's memory strategy) are
follow-ups; full-sequence fits test/preview sizes and 480p clips in bf16.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry


@dataclasses.dataclass
class WanVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None
    # Wan 2.2 (TI2V-5B) VAE: 2x2 pixel patchification before the encoder and
    # residual avg-pool/dup shortcuts around every down/up block
    # (reference model.py:1024 patchify, :152 is_residual, AvgDown3D:40,
    # DupUp3D:92) — 16x16 spatial, 4x temporal, 48-ch latents.
    patch_size: Optional[int] = None
    is_residual: bool = False

    @classmethod
    def from_dict(cls, cfg: dict) -> "WanVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "dim" in cfg and "base_dim" not in kw:
            kw["base_dim"] = cfg["dim"]
        for key in ("dim_mult", "attn_scales", "temperal_downsample", "latents_mean", "latents_std"):
            if key in kw and kw[key] is not None:
                kw[key] = tuple(kw[key])
        return cls(**kw)

    @property
    def pixel_channels(self) -> int:
        p = self.patch_size or 1
        return 3 * p * p

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.dim_mult) - 1) * (self.patch_size or 1)

    @property
    def temporal_scale(self) -> int:
        return 2 ** sum(self.temperal_downsample)


class CausalConv3d(nnx.Module):
    """Conv3d with causal time padding. Data layout NDHWC, kernel DHWIO."""

    def __init__(self, cin: int, cout: int, kernel=(3, 3, 3), stride=(1, 1, 1),
                 padding=(1, 1, 1), *, dtype, rngs: nnx.Rngs):
        if isinstance(kernel, int):
            kernel = (kernel,) * 3
        if isinstance(stride, int):
            stride = (stride,) * 3
        if isinstance(padding, int):
            padding = (padding,) * 3
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (*kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride = stride
        self.pad = padding
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray, extra_front_trim: int = 0) -> jnp.ndarray:
        pt, ph, pw = self.pad
        pad = ((2 * pt, 0), (ph, ph), (pw, pw))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            window_strides=self.stride,
            padding=pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + self.bias.value.astype(y.dtype)


class WanRMSNormCh(nnx.Module):
    """Channel-wise L2 normalization × sqrt(C) × gamma (WanRMS_norm:188)."""

    def __init__(self, dim: int, *, rngs: nnx.Rngs):
        self.gamma = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.scale = float(dim) ** 0.5

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x32 = x.astype(jnp.float32)
        norm = jnp.linalg.norm(x32, axis=-1, keepdims=True)
        out = x32 / jnp.maximum(norm, 1e-12) * self.scale * self.gamma.value
        return out.astype(x.dtype)


class Conv2dSame(nnx.Module):
    """Per-frame 2D conv on [..., H, W, C] (kernel HWIO)."""

    def __init__(self, cin: int, cout: int, kernel: int = 3, stride: int = 1,
                 pad=((1, 1), (1, 1)), *, dtype, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (kernel, kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride = stride
        self.pad = pad
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        y = jax.lax.conv_general_dilated(
            x.reshape(b * t, h, w, c).astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=self.pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + self.bias.value.astype(y.dtype)
        return y.reshape(b, t, y.shape[1], y.shape[2], y.shape[3])


class WanResample(nnx.Module):
    def __init__(self, dim: int, mode: str, *, dtype, rngs: nnx.Rngs,
                 upsample_out_dim: Optional[int] = None):
        self.mode = mode
        time_conv = None
        if mode in ("upsample2d", "upsample3d"):
            out_dim = upsample_out_dim if upsample_out_dim is not None else dim // 2
            self.resample_conv = Conv2dSame(dim, out_dim, dtype=dtype, rngs=rngs)
            if mode == "upsample3d":
                time_conv = CausalConv3d(
                    dim, dim * 2, kernel=(3, 1, 1), padding=(1, 0, 0), dtype=dtype, rngs=rngs
                )
        elif mode in ("downsample2d", "downsample3d"):
            # ZeroPad2d((0,1,0,1)) + stride-2 conv.
            self.resample_conv = Conv2dSame(
                dim, dim, stride=2, pad=((0, 1), (0, 1)), dtype=dtype, rngs=rngs
            )
            if mode == "downsample3d":
                time_conv = CausalConv3d(
                    dim, dim, kernel=(3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0),
                    dtype=dtype, rngs=rngs,
                )
        self.time_conv = time_conv

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, H, W, C]
        b, t, h, w, c = x.shape
        if self.mode.startswith("upsample"):
            if self.mode == "upsample3d" and t > 1:
                # Frame 0 bypasses; its value is zeroed out of later frames'
                # causal history (the reference's "Rep" cache marker).
                x_hist = x.at[:, :1].set(0.0)
                y = self.time_conv(x_hist)  # [B, T, H, W, 2C]
                y = y[:, 1:]  # frames 1..T-1
                # channel pairs (first C, second C) interleave along time
                y = y.reshape(b, t - 1, h, w, 2, c)
                y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * (t - 1), h, w, c)
                x = jnp.concatenate([x[:, :1], y], axis=1)
            # nearest-exact 2x spatial upsample per frame, then conv
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            return self.resample_conv(x)
        if self.mode.startswith("downsample"):
            x = self.resample_conv(x)
            if self.mode == "downsample3d" and x.shape[1] > 1:
                head = x[:, :1]
                tail = self.time_conv(x)  # stride-2 valid windows (0..2), (2..4), …
                x = jnp.concatenate([head, tail], axis=1)
            return x
        return x


def avg_down_3d(x: jnp.ndarray, out_ch: int, ft: int, fs: int) -> jnp.ndarray:
    """Parameter-free avg-pool shortcut (reference AvgDown3D:40). NDHWC.
    Front-pads time to a multiple of ft; channel-major grouping matches the
    torch (C, ft, fs, fs) flatten order."""
    b, t, h, w, c = x.shape
    pad_t = (ft - t % ft) % ft
    if pad_t:
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
        t += pad_t
    x = x.reshape(b, t // ft, ft, h // fs, fs, w // fs, fs, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # B,T',H',W',C,ft,fs,fs
    x = x.reshape(b, t // ft, h // fs, w // fs, c * ft * fs * fs)
    group = (c * ft * fs * fs) // out_ch
    x = x.reshape(b, t // ft, h // fs, w // fs, out_ch, group)
    return x.mean(axis=-1)


def dup_up_3d(x: jnp.ndarray, out_ch: int, ft: int, fs: int,
              first_chunk: bool = True) -> jnp.ndarray:
    """Parameter-free duplicate-upsample shortcut (reference DupUp3D:92).
    NDHWC; first_chunk trims the ft-1 leading frames like the reference's
    non-streaming decode (model.py:1356)."""
    b, t, h, w, c = x.shape
    repeats = out_ch * ft * fs * fs // c
    x = jnp.repeat(x, repeats, axis=-1)  # channel-major duplication
    x = x.reshape(b, t, h, w, out_ch, ft, fs, fs)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # B,T,ft,H,fs,W,fs,C'
    x = x.reshape(b, t * ft, h * fs, w * fs, out_ch)
    if first_chunk and ft > 1:
        x = x[:, ft - 1:]
    return x


def patchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B,C,T,H,W] → [B,C*p*p,T,H/p,W/p], (c, h_off, w_off) channel-major
    (reference model.py:1024)."""
    if p == 1:
        return x
    b, c, t, h, w = x.shape
    x = x.reshape(b, c, t, h // p, p, w // p, p)
    x = x.transpose(0, 1, 4, 6, 2, 3, 5)
    return x.reshape(b, c * p * p, t, h // p, w // p)


def unpatchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B,C*p*p,T,H,W] → [B,C,T,H*p,W*p] (reference model.py:1063)."""
    if p == 1:
        return x
    b, cp, t, h, w = x.shape
    c = cp // (p * p)
    x = x.reshape(b, c, p, p, t, h, w)
    x = x.transpose(0, 1, 4, 5, 2, 6, 3)
    return x.reshape(b, c, t, h * p, w * p)


class WanResidualBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, *, dtype, rngs: nnx.Rngs):
        self.norm1 = WanRMSNormCh(cin, rngs=rngs)
        self.conv1 = CausalConv3d(cin, cout, dtype=dtype, rngs=rngs)
        self.norm2 = WanRMSNormCh(cout, rngs=rngs)
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


class WanAttentionBlock(nnx.Module):
    """Per-frame single-head spatial attention (vae/wan/model.py:444)."""

    def __init__(self, dim: int, *, dtype, rngs: nnx.Rngs):
        self.norm = WanRMSNormCh(dim, rngs=rngs)
        init = nnx.initializers.lecun_normal()
        self.to_qkv_kernel = nnx.Param(init(rngs.params(), (dim, 3 * dim), jnp.float32))
        self.to_qkv_bias = nnx.Param(jnp.zeros((3 * dim,), jnp.float32))
        self.proj_kernel = nnx.Param(init(rngs.params(), (dim, dim), jnp.float32))
        self.proj_bias = nnx.Param(jnp.zeros((dim,), jnp.float32))
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from apex_studio_tpu.ops import attention as attention_op

        b, t, h, w, c = x.shape
        y = self.norm(x).reshape(b * t, h * w, c).astype(self.dtype)
        qkv = y @ self.to_qkv_kernel.value.astype(self.dtype) + self.to_qkv_bias.value.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = attention_op(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :], backend="xla")[:, :, 0]
        out = out @ self.proj_kernel.value.astype(self.dtype) + self.proj_bias.value.astype(self.dtype)
        return x + out.reshape(b, t, h, w, c)


class WanMidBlock(nnx.Module):
    def __init__(self, dim: int, *, dtype, rngs: nnx.Rngs):
        self.resnets = nnx.List(
            [WanResidualBlock(dim, dim, dtype=dtype, rngs=rngs) for _ in range(2)]
        )
        self.attentions = nnx.List([WanAttentionBlock(dim, dtype=dtype, rngs=rngs)])

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class WanResidualDownBlock(nnx.Module):
    """Wan 2.2 encoder stage: resnets + resample with an AvgDown3D shortcut
    (reference WanResidualDownBlock:539)."""

    def __init__(self, cin: int, cout: int, num_res: int, temporal_down: bool,
                 down_flag: bool, *, dtype, rngs: nnx.Rngs):
        res = []
        cur = cin
        for _ in range(num_res):
            res.append(WanResidualBlock(cur, cout, dtype=dtype, rngs=rngs))
            cur = cout
        self.resnets = nnx.List(res)
        self.downsampler = (
            WanResample(cout, "downsample3d" if temporal_down else "downsample2d",
                        dtype=dtype, rngs=rngs)
            if down_flag else None
        )
        self._short = (cin, cout, 2 if temporal_down else 1, 2 if down_flag else 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin, cout, ft, fs = self._short
        shortcut = avg_down_3d(x, cout, ft, fs)
        for r in self.resnets:
            x = r(x)
        if self.downsampler is not None:
            x = self.downsampler(x)
        return x + shortcut


class WanResidualUpBlock(nnx.Module):
    """Wan 2.2 decoder stage: resnets + resample with a DupUp3D shortcut
    (reference WanResidualUpBlock:732)."""

    def __init__(self, cin: int, cout: int, num_res: int, temporal_up: bool,
                 up_flag: bool, *, dtype, rngs: nnx.Rngs):
        res = []
        cur = cin
        for _ in range(num_res + 1):
            res.append(WanResidualBlock(cur, cout, dtype=dtype, rngs=rngs))
            cur = cout
        self.resnets = nnx.List(res)
        self.upsampler = (
            WanResample(cout, "upsample3d" if temporal_up else "upsample2d",
                        upsample_out_dim=cout, dtype=dtype, rngs=rngs)
            if up_flag else None
        )
        self._short = (cin, cout, 2 if temporal_up else 1, up_flag)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin, cout, ft, up_flag = self._short
        x_copy = x
        for r in self.resnets:
            x = r(x)
        if self.upsampler is not None:
            x = self.upsampler(x)
        if up_flag:
            x = x + dup_up_3d(x_copy, cout, ft, 2, first_chunk=True)
        return x


class WanEncoder3d(nnx.Module):
    def __init__(self, cfg: WanVAEConfig, *, dtype, rngs: nnx.Rngs):
        dims = [cfg.base_dim * u for u in (1, *cfg.dim_mult)]
        self.conv_in = CausalConv3d(cfg.pixel_channels, dims[0], dtype=dtype, rngs=rngs)
        blocks = []
        scale = 1.0
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            last = i == len(cfg.dim_mult) - 1
            if cfg.is_residual:
                blocks.append(WanResidualDownBlock(
                    din, dout, cfg.num_res_blocks,
                    temporal_down=cfg.temperal_downsample[i] if not last else False,
                    down_flag=not last, dtype=dtype, rngs=rngs))
                continue
            cur = din
            for _ in range(cfg.num_res_blocks):
                blocks.append(WanResidualBlock(cur, dout, dtype=dtype, rngs=rngs))
                if scale in cfg.attn_scales:
                    blocks.append(WanAttentionBlock(dout, dtype=dtype, rngs=rngs))
                cur = dout
            if not last:
                mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
                blocks.append(WanResample(dout, mode, dtype=dtype, rngs=rngs))
                scale /= 2.0
        self.down_blocks = nnx.List(blocks)
        self.mid_block = WanMidBlock(dims[-1], dtype=dtype, rngs=rngs)
        self.norm_out = WanRMSNormCh(dims[-1], rngs=rngs)
        self.conv_out = CausalConv3d(dims[-1], 2 * cfg.z_dim, dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(nnx.silu(self.norm_out(x)))


class WanUpBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, num_res: int, upsample_mode: Optional[str],
                 *, dtype, rngs: nnx.Rngs):
        res = []
        cur = cin
        for _ in range(num_res + 1):
            res.append(WanResidualBlock(cur, cout, dtype=dtype, rngs=rngs))
            cur = cout
        self.resnets = nnx.List(res)
        self.upsamplers = (
            nnx.List([WanResample(cout, upsample_mode, dtype=dtype, rngs=rngs)])
            if upsample_mode
            else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class WanDecoder3d(nnx.Module):
    def __init__(self, cfg: WanVAEConfig, *, dtype, rngs: nnx.Rngs):
        dims = [cfg.base_dim * u for u in (cfg.dim_mult[-1], *reversed(cfg.dim_mult))]
        temperal_upsample = tuple(reversed(cfg.temperal_downsample))
        self.conv_in = CausalConv3d(cfg.z_dim, dims[0], dtype=dtype, rngs=rngs)
        self.mid_block = WanMidBlock(dims[0], dtype=dtype, rngs=rngs)
        ups = []
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            up_flag = i != len(cfg.dim_mult) - 1
            if cfg.is_residual:
                ups.append(WanResidualUpBlock(
                    din, dout, cfg.num_res_blocks,
                    temporal_up=temperal_upsample[i] if up_flag else False,
                    up_flag=up_flag, dtype=dtype, rngs=rngs))
                continue
            if i > 0:
                din = din // 2  # previous upsample conv halved the channels
            mode = None
            if up_flag:
                mode = "upsample3d" if temperal_upsample[i] else "upsample2d"
            ups.append(WanUpBlock(din, dout, cfg.num_res_blocks, mode, dtype=dtype, rngs=rngs))
        self.up_blocks = nnx.List(ups)
        self.norm_out = WanRMSNormCh(dims[-1], rngs=rngs)
        self.conv_out = CausalConv3d(dims[-1], cfg.pixel_channels, dtype=dtype, rngs=rngs)

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_in(z)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            x = blk(x)
        return self.conv_out(nnx.silu(self.norm_out(x)))


@vae_registry.register("wan.base", aliases=("wan", "AutoencoderKLWan", "qwenimage", "AutoencoderKLQwenImage"))
class AutoencoderKLWan(nnx.Module):
    config_class = WanVAEConfig

    def __init__(self, cfg: WanVAEConfig, *, dtype=jnp.float32, param_dtype=jnp.float32,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = WanEncoder3d(cfg, dtype=dtype, rngs=rngs)
        self.decoder = WanDecoder3d(cfg, dtype=dtype, rngs=rngs)
        # AutoencoderKLWan's 1x1x1 quant convs.
        self.quant_conv = CausalConv3d(2 * cfg.z_dim, 2 * cfg.z_dim, kernel=1, padding=0,
                                       dtype=dtype, rngs=rngs)
        self.post_quant_conv = CausalConv3d(cfg.z_dim, cfg.z_dim, kernel=1, padding=0,
                                            dtype=dtype, rngs=rngs)

    def _mean_std(self):
        if self.cfg.latents_mean is None:
            return None, None
        mean = jnp.asarray(self.cfg.latents_mean, jnp.float32).reshape(1, -1, 1, 1, 1)
        std = jnp.asarray(self.cfg.latents_std, jnp.float32).reshape(1, -1, 1, 1, 1)
        return mean, std

    # Public API is NCTHW like the reference engines.
    def encode(self, video: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        """[B,3,T,H,W] in [-1,1] → model-space latents [B,z,T',H/s,W/s]."""
        if self.cfg.patch_size:
            video = patchify(video, self.cfg.patch_size)
        x = jnp.transpose(video, (0, 2, 3, 4, 1))  # NDHWC
        moments = self.quant_conv(self.encoder(x))
        moments = jnp.transpose(moments, (0, 4, 1, 2, 3))
        mean, logvar = jnp.split(moments, 2, axis=1)
        z = mean
        if sample and noise is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) * noise
        m, s = self._mean_std()
        if m is not None:
            z = (z - m) / s
        return z

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """model-space latents → [B,3,T,H,W] in [-1,1]."""
        m, s = self._mean_std()
        if m is not None:
            z = z * s + m
        x = jnp.transpose(z, (0, 2, 3, 4, 1))
        out = self.decoder(self.post_quant_conv(x))
        out = jnp.transpose(out, (0, 4, 1, 2, 3))
        if self.cfg.patch_size:
            out = unpatchify(out, self.cfg.patch_size)
        return out
