"""LTX-Video causal VAE (CausalVideoAutoencoder), tpu-native.

Contract parity with the reference's ``src/vae/ltx/model.py``:
- pixel patchify (4×4 space-to-depth, model.py:228) before ``conv_in``
- causal 3D convs: the first frame is REPLICATED (time_kernel−1)× at the
  front (model.py:526); non-causal pads symmetrically from both ends
- encoder blocks: ``res_x`` (N ResnetBlock3D), ``compress_*_res``
  (SpaceToDepthDownsample: strided space-to-depth conv + channel-group-mean
  skip, model.py:1985), plain ``compress_*`` strided causal convs
- decoder blocks: ``res_x`` with optional per-block PixArt timestep
  conditioning (4·C embedding + per-resnet [4, C] tables, model.py:2206) and
  optional StyleGAN-style spatial noise injection, ``compress_*`` →
  DepthToSpaceUpsample (conv + pixel-shuffle, drop the first duplicated
  frame, optional repeated-input residual, model.py:2032)
- decoder epilogue: norm → last [2, C] scale/shift table conditioned on the
  decode timestep (model.py:1744) → SiLU → conv_out → unpatchify
- ``normalize_latents``/``denormalize_latents`` with the per-channel
  statistics buffers (std-of-means / mean-of-means, model.py:1212)

TPU design: full-sequence functional ops (no per-frame python loops), NDHWC
conv layout for XLA, everything jittable at fixed shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import TimestepEmbedder
from apex_studio_tpu.models.registry import vae_registry


def _patchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B,C,T,H,W] → [B, C·p·p, T, H/p, W/p] (channel order c,r,q as model.py:236)."""
    if p == 1:
        return x
    b, c, t, h, w = x.shape
    x = x.reshape(b, c, t, h // p, p, w // p, p)
    # b c t h q w r → b (c r q) t h w
    x = jnp.transpose(x, (0, 1, 6, 4, 2, 3, 5))
    return x.reshape(b, c * p * p, t, h // p, w // p)


def _unpatchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    if p == 1:
        return x
    b, cp, t, h, w = x.shape
    c = cp // (p * p)
    x = x.reshape(b, c, p, p, t, h, w)  # b c r q t h w
    x = jnp.transpose(x, (0, 1, 4, 5, 3, 6, 2))  # b c t h q w r
    return x.reshape(b, c, t, h * p, w * p)


def _pixel_shuffle_3d(x: jnp.ndarray, s: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, C·p1·p2·p3, T, H, W] → [B, C, T·p1, H·p2, W·p3] (model.py:288)."""
    b, cp, t, h, w = x.shape
    p1, p2, p3 = s
    c = cp // (p1 * p2 * p3)
    x = x.reshape(b, c, p1, p2, p3, t, h, w)
    x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))  # b c t p1 h p2 w p3
    return x.reshape(b, c, t * p1, h * p2, w * p3)


def _space_to_depth(x: jnp.ndarray, s: Tuple[int, int, int]) -> jnp.ndarray:
    """Inverse of _pixel_shuffle_3d: [B,C,T·p1,H·p2,W·p3] → [B,C·∏p,T,H,W]."""
    b, c, t, h, w = x.shape
    p1, p2, p3 = s
    x = x.reshape(b, c, t // p1, p1, h // p2, p2, w // p3, p3)
    x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))
    return x.reshape(b, c * p1 * p2 * p3, t // p1, h // p2, w // p3)


class CausalConv3d(nnx.Module):
    """3D conv with replicate-padded causal time axis (model.py:489)."""

    def __init__(self, in_ch: int, out_ch: int, *, kernel_size: int = 3,
                 stride: Tuple[int, int, int] = (1, 1, 1),
                 spatial_padding_mode: str = "zeros",
                 dtype=jnp.float32, rngs: nnx.Rngs):
        k = kernel_size
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (k, k, k, in_ch, out_ch), dtype))
        self.bias = nnx.Param(jnp.zeros((out_ch,), dtype))
        self.k = k
        self.stride = tuple(stride)
        self.pad_mode = "reflect" if spatial_padding_mode == "reflect" else "constant"

    def __call__(self, x: jnp.ndarray, causal: bool = True) -> jnp.ndarray:
        k = self.k
        if k > 1:
            if causal:
                front = jnp.repeat(x[:, :, :1], k - 1, axis=2)
                x = jnp.concatenate([front, x], axis=2)
            else:
                half = (k - 1) // 2
                front = jnp.repeat(x[:, :, :1], half, axis=2)
                back = jnp.repeat(x[:, :, -1:], half, axis=2)
                x = jnp.concatenate([front, x, back], axis=2)
            sp = k // 2
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (sp, sp), (sp, sp)),
                        mode=self.pad_mode)
        y = jax.lax.conv_general_dilated(
            jnp.transpose(x, (0, 2, 3, 4, 1)).astype(self.kernel.value.dtype),
            self.kernel.value,
            window_strides=self.stride,
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + self.bias.value
        return jnp.transpose(y, (0, 4, 1, 2, 3))


class LinearND(nnx.Module):
    """1×1×1 conv (make_linear_nd, model.py:210) — a per-pixel Linear."""

    def __init__(self, in_ch: int, out_ch: int, *, dtype=jnp.float32, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (in_ch, out_ch), dtype))
        self.bias = nnx.Param(jnp.zeros((out_ch,), dtype))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.einsum("bcthw,co->bothw", x.astype(self.kernel.value.dtype),
                       self.kernel.value)
        return y + self.bias.value[None, :, None, None, None]


def _pixel_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + eps)


class ChannelNorm(nnx.Module):
    """norm_layer dispatch: pixel_norm (param-free) or layer_norm over C."""

    def __init__(self, kind: str, ch: int, *, eps: float = 1e-6, rngs: nnx.Rngs):
        self.kind = kind
        self.eps = eps
        if kind == "layer_norm":
            self.weight = nnx.Param(jnp.ones((ch,), jnp.float32))
            self.bias = nnx.Param(jnp.zeros((ch,), jnp.float32))
        elif kind == "group_norm":
            self.weight = nnx.Param(jnp.ones((ch,), jnp.float32))
            self.bias = nnx.Param(jnp.zeros((ch,), jnp.float32))
            self.groups = 32

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "pixel_norm":
            return _pixel_norm(x, 1e-8)
        f32 = x.astype(jnp.float32)
        if self.kind == "layer_norm":
            m = f32.mean(axis=1, keepdims=True)
            v = f32.var(axis=1, keepdims=True)
            out = (f32 - m) * jax.lax.rsqrt(v + self.eps)
            out = out * self.weight.value[None, :, None, None, None] \
                + self.bias.value[None, :, None, None, None]
            return out.astype(x.dtype)
        b, c, t, h, w = x.shape
        g = self.groups
        grp = f32.reshape(b, g, c // g, t, h, w)
        m = grp.mean(axis=(2, 3, 4, 5), keepdims=True)
        v = grp.var(axis=(2, 3, 4, 5), keepdims=True)
        out = ((grp - m) * jax.lax.rsqrt(v + self.eps)).reshape(b, c, t, h, w)
        out = out * self.weight.value[None, :, None, None, None] \
            + self.bias.value[None, :, None, None, None]
        return out.astype(x.dtype)


class ResnetBlock3D(nnx.Module):
    def __init__(self, in_ch: int, out_ch: int, *, norm: str,
                 timestep_conditioning: bool = False, inject_noise: bool = False,
                 spatial_padding_mode: str = "zeros", dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.norm1 = ChannelNorm(norm, in_ch, rngs=rngs)
        self.conv1 = CausalConv3d(in_ch, out_ch, spatial_padding_mode=spatial_padding_mode,
                                  dtype=dtype, rngs=rngs)
        self.norm2 = ChannelNorm(norm, out_ch, rngs=rngs)
        self.conv2 = CausalConv3d(out_ch, out_ch, spatial_padding_mode=spatial_padding_mode,
                                  dtype=dtype, rngs=rngs)
        self.conv_shortcut = (
            LinearND(in_ch, out_ch, dtype=dtype, rngs=rngs) if in_ch != out_ch else None
        )
        self.norm3 = (
            ChannelNorm("layer_norm", in_ch, rngs=rngs) if in_ch != out_ch else None
        )
        self.timestep_conditioning = timestep_conditioning
        if timestep_conditioning:
            self.scale_shift_table = nnx.Param(
                jnp.asarray(np.random.default_rng(0).normal(size=(4, in_ch)) / in_ch**0.5,
                            jnp.float32)
            )
        self.inject_noise = inject_noise
        if inject_noise:
            self.per_channel_scale1 = nnx.Param(jnp.zeros((out_ch, 1, 1), jnp.float32))
            self.per_channel_scale2 = nnx.Param(jnp.zeros((out_ch, 1, 1), jnp.float32))

    def _noise(self, h: jnp.ndarray, scale: jnp.ndarray, key) -> jnp.ndarray:
        spatial = jax.random.normal(key, h.shape[-2:], h.dtype)
        return h + (spatial[None] * scale.astype(h.dtype))[None, :, None]

    def __call__(self, x, causal=True, temb=None, noise_key=None):
        h = self.norm1(x)
        if self.timestep_conditioning and temb is not None:
            # temb [B, 4, C] broadcast over T/H/W
            ada = self.scale_shift_table.value[None] + temb.astype(jnp.float32)
            s1h, s1c, s2h, s2c = [ada[:, i][..., None, None, None].astype(x.dtype)
                                  for i in range(4)]
            h = h * (1 + s1c) + s1h
        h = nnx.silu(h)
        h = self.conv1(h, causal=causal)
        if self.inject_noise and noise_key is not None:
            h = self._noise(h, self.per_channel_scale1.value, noise_key)
        h = self.norm2(h)
        if self.timestep_conditioning and temb is not None:
            h = h * (1 + s2c) + s2h
        h = nnx.silu(h)
        h = self.conv2(h, causal=causal)
        if self.inject_noise and noise_key is not None:
            h = self._noise(h, self.per_channel_scale2.value,
                            jax.random.fold_in(noise_key, 1))
        res = x
        if self.norm3 is not None:
            res = self.norm3(res)
        if self.conv_shortcut is not None:
            res = self.conv_shortcut(res)
        return res + h


class SpaceToDepthDownsample(nnx.Module):
    """Strided space-to-depth conv + channel-group-mean skip (model.py:1985)."""

    def __init__(self, in_ch: int, out_ch: int, stride: Tuple[int, int, int], *,
                 spatial_padding_mode: str = "zeros", dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.stride = tuple(stride)
        self.group_size = in_ch * int(np.prod(stride)) // out_ch
        self.out_ch = out_ch
        self.conv = CausalConv3d(in_ch, out_ch // int(np.prod(stride)),
                                 spatial_padding_mode=spatial_padding_mode,
                                 dtype=dtype, rngs=rngs)

    def __call__(self, x, causal=True):
        if self.stride[0] == 2:
            x = jnp.concatenate([x[:, :, :1], x], axis=2)
        skip = _space_to_depth(x, self.stride)
        b, cg, t, h, w = skip.shape
        skip = skip.reshape(b, cg // self.group_size, self.group_size, t, h, w).mean(2)
        y = self.conv(x, causal=causal)
        y = _space_to_depth(y, self.stride)
        return y + skip


class DepthToSpaceUpsample(nnx.Module):
    def __init__(self, in_ch: int, stride: Tuple[int, int, int], *,
                 residual: bool = False, out_channels_reduction_factor: int = 1,
                 spatial_padding_mode: str = "zeros", dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.stride = tuple(stride)
        self.residual = residual
        self.factor = out_channels_reduction_factor
        self.out_ch = int(np.prod(stride)) * in_ch // out_channels_reduction_factor
        self.conv = CausalConv3d(in_ch, self.out_ch,
                                 spatial_padding_mode=spatial_padding_mode,
                                 dtype=dtype, rngs=rngs)

    def __call__(self, x, causal=True):
        if self.residual:
            skip = _pixel_shuffle_3d(x, self.stride)
            rep = int(np.prod(self.stride)) // self.factor
            skip = jnp.tile(skip, (1, rep, 1, 1, 1))
            if self.stride[0] == 2:
                skip = skip[:, :, 1:]
        y = self.conv(x, causal=causal)
        y = _pixel_shuffle_3d(y, self.stride)
        if self.stride[0] == 2:
            y = y[:, :, 1:]
        if self.residual:
            y = y + skip
        return y


class UNetMidBlock3D(nnx.Module):
    def __init__(self, ch: int, num_layers: int, *, norm: str,
                 timestep_conditioning: bool = False, inject_noise: bool = False,
                 spatial_padding_mode: str = "zeros", dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.timestep_conditioning = timestep_conditioning
        if timestep_conditioning:
            self.time_embedder = TimestepEmbedder(
                ch * 4, ch * 4, dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs
            )
        self.res_blocks = nnx.List([
            ResnetBlock3D(ch, ch, norm=norm, timestep_conditioning=timestep_conditioning,
                          inject_noise=inject_noise,
                          spatial_padding_mode=spatial_padding_mode,
                          dtype=dtype, rngs=rngs)
            for _ in range(num_layers)
        ])
        self.ch = ch

    def __call__(self, x, causal=True, scaled_t=None, noise_key=None):
        temb = None
        if self.timestep_conditioning and scaled_t is not None:
            emb = self.time_embedder(scaled_t.reshape(-1))  # [B, 4C]
            temb = emb.reshape(x.shape[0], 4, self.ch)
        for i, rb in enumerate(self.res_blocks):
            nk = None if noise_key is None else jax.random.fold_in(noise_key, i)
            x = rb(x, causal=causal, temb=temb, noise_key=nk)
        return x


@dataclass
class LTXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    base_channels: int = 128
    decoder_base_channels: Optional[int] = None
    patch_size: int = 4
    norm_layer: str = "pixel_norm"
    encoder_blocks: List[Tuple[str, Dict[str, Any]]] = field(default_factory=lambda: [
        ("res_x", {"num_layers": 4}),
        ("compress_all_res", {"multiplier": 2}),
        ("res_x", {"num_layers": 6}),
        ("compress_all_res", {"multiplier": 2}),
        ("res_x", {"num_layers": 6}),
        ("compress_all_res", {"multiplier": 2}),
        ("res_x", {"num_layers": 2}),
        ("res_x", {"num_layers": 2}),
    ])
    decoder_blocks: List[Tuple[str, Dict[str, Any]]] = field(default_factory=lambda: [
        ("res_x", {"num_layers": 5, "inject_noise": True}),
        ("compress_all", {"residual": True, "multiplier": 2}),
        ("res_x", {"num_layers": 6, "inject_noise": True}),
        ("compress_all", {"residual": True, "multiplier": 2}),
        ("res_x", {"num_layers": 7, "inject_noise": True}),
        ("compress_all", {"residual": True, "multiplier": 2}),
        ("res_x", {"num_layers": 8, "inject_noise": False}),
    ])
    latent_log_var: str = "uniform"
    causal_decoder: bool = False
    timestep_conditioning: bool = True
    spatial_padding_mode: str = "zeros"
    scaling_factor: float = 1.0
    extra: Dict[str, Any] = field(default_factory=dict)

    @property
    def spatial_scale(self) -> int:
        s = self.patch_size
        for name, _ in self.encoder_blocks:
            if name in ("compress_space", "compress_all", "compress_all_x_y",
                        "compress_all_res", "compress_space_res"):
                s *= 2
        return s

    @property
    def temporal_scale(self) -> int:
        s = 1
        for name, _ in self.encoder_blocks:
            if name in ("compress_time", "compress_all", "compress_all_x_y",
                        "compress_all_res", "compress_time_res"):
                s *= 2
        return s

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LTXVAEConfig":
        def norm_blocks(blocks):
            out = []
            for name, p in blocks:
                out.append((name, {"num_layers": p} if isinstance(p, int) else dict(p)))
            return out

        kw: Dict[str, Any] = {}
        for k in ("in_channels", "out_channels", "latent_channels", "patch_size",
                  "norm_layer", "latent_log_var", "causal_decoder",
                  "timestep_conditioning", "spatial_padding_mode", "scaling_factor"):
            if k in d:
                kw[k] = d[k]
        if "encoder_base_channels" in d or "base_channels" in d:
            kw["base_channels"] = d.get("encoder_base_channels", d.get("base_channels"))
        if "decoder_base_channels" in d:
            kw["decoder_base_channels"] = d["decoder_base_channels"]
        eb = d.get("encoder_blocks") or d.get("blocks")
        db = d.get("decoder_blocks") or d.get("blocks")
        if eb:
            kw["encoder_blocks"] = norm_blocks(eb)
        if db:
            kw["decoder_blocks"] = norm_blocks(db)
        known = set(kw) | {"encoder_base_channels", "blocks", "encoder_blocks",
                           "decoder_blocks"}
        return cls(**kw, extra={k: v for k, v in d.items() if k not in known})


class LTXEncoder(nnx.Module):
    def __init__(self, cfg: LTXVAEConfig, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg
        p = cfg.patch_size
        sp = cfg.spatial_padding_mode
        ch = cfg.base_channels
        self.conv_in = CausalConv3d(cfg.in_channels * p * p, ch,
                                    spatial_padding_mode=sp, dtype=dtype, rngs=rngs)
        blocks = []
        for name, params in cfg.encoder_blocks:
            if name == "res_x":
                blocks.append(UNetMidBlock3D(ch, params["num_layers"],
                                             norm=cfg.norm_layer,
                                             spatial_padding_mode=sp,
                                             dtype=dtype, rngs=rngs))
            elif name == "res_x_y":
                out = params.get("multiplier", 2) * ch
                blocks.append(ResnetBlock3D(ch, out, norm=cfg.norm_layer,
                                            spatial_padding_mode=sp,
                                            dtype=dtype, rngs=rngs))
                ch = out
            elif name in ("compress_time", "compress_space", "compress_all"):
                stride = {"compress_time": (2, 1, 1), "compress_space": (1, 2, 2),
                          "compress_all": (2, 2, 2)}[name]
                blocks.append(CausalConv3d(ch, ch, stride=stride,
                                           spatial_padding_mode=sp,
                                           dtype=dtype, rngs=rngs))
            elif name in ("compress_all_res", "compress_space_res",
                          "compress_time_res", "compress_all_x_y"):
                out = params.get("multiplier", 2) * ch
                stride = {"compress_all_res": (2, 2, 2),
                          "compress_space_res": (1, 2, 2),
                          "compress_time_res": (2, 1, 1),
                          "compress_all_x_y": (2, 2, 2)}[name]
                if name == "compress_all_x_y":
                    blocks.append(CausalConv3d(ch, out, stride=stride,
                                               spatial_padding_mode=sp,
                                               dtype=dtype, rngs=rngs))
                else:
                    blocks.append(SpaceToDepthDownsample(ch, out, stride,
                                                         spatial_padding_mode=sp,
                                                         dtype=dtype, rngs=rngs))
                ch = out
            else:
                raise ValueError(f"unknown encoder block {name}")
        self.down_blocks = nnx.List(blocks)
        self.conv_norm_out = ChannelNorm(cfg.norm_layer, ch, rngs=rngs)
        out_ch = cfg.latent_channels * 2 if cfg.latent_log_var == "per_channel" \
            else cfg.latent_channels + (1 if cfg.latent_log_var in ("uniform", "constant") else 0)
        self.conv_out = CausalConv3d(ch, out_ch, spatial_padding_mode=sp,
                                     dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _patchify(x, self.cfg.patch_size)
        x = self.conv_in(x, causal=True)
        for blk in self.down_blocks:
            x = blk(x, causal=True)
        x = self.conv_norm_out(x)
        x = nnx.silu(x)
        return self.conv_out(x, causal=True)


class LTXDecoder(nnx.Module):
    def __init__(self, cfg: LTXVAEConfig, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg
        sp = cfg.spatial_padding_mode
        base = cfg.decoder_base_channels or cfg.base_channels
        ch = base
        for name, params in reversed(cfg.decoder_blocks):
            if name == "res_x_y":
                ch *= params.get("multiplier", 2)
            if name.startswith("compress"):
                ch *= params.get("multiplier", 1)
        self.conv_in = CausalConv3d(cfg.latent_channels, ch,
                                    spatial_padding_mode=sp, dtype=dtype, rngs=rngs)
        blocks = []
        for name, params in reversed(cfg.decoder_blocks):
            if name == "res_x":
                blocks.append(UNetMidBlock3D(
                    ch, params["num_layers"], norm=cfg.norm_layer,
                    timestep_conditioning=cfg.timestep_conditioning,
                    inject_noise=params.get("inject_noise", False),
                    spatial_padding_mode=sp, dtype=dtype, rngs=rngs))
            elif name == "res_x_y":
                out = ch // params.get("multiplier", 2)
                blocks.append(ResnetBlock3D(ch, out, norm=cfg.norm_layer,
                                            inject_noise=params.get("inject_noise", False),
                                            spatial_padding_mode=sp,
                                            dtype=dtype, rngs=rngs))
                ch = out
            elif name in ("compress_time", "compress_space", "compress_all"):
                stride = {"compress_time": (2, 1, 1), "compress_space": (1, 2, 2),
                          "compress_all": (2, 2, 2)}[name]
                mult = params.get("multiplier", 1)
                out = ch // mult if name == "compress_all" else ch
                blocks.append(DepthToSpaceUpsample(
                    ch, stride, residual=params.get("residual", False),
                    out_channels_reduction_factor=mult if name == "compress_all" else 1,
                    spatial_padding_mode=sp, dtype=dtype, rngs=rngs))
                ch = out
            else:
                raise ValueError(f"unknown decoder block {name}")
        self.up_blocks = nnx.List(blocks)
        self.conv_norm_out = ChannelNorm(cfg.norm_layer, ch, rngs=rngs)
        self.conv_out = CausalConv3d(ch, cfg.out_channels * cfg.patch_size**2,
                                     spatial_padding_mode=sp, dtype=dtype, rngs=rngs)
        self.timestep_conditioning = cfg.timestep_conditioning
        if cfg.timestep_conditioning:
            self.timestep_scale_multiplier = nnx.Param(jnp.asarray(1000.0, jnp.float32))
            self.last_time_embedder = TimestepEmbedder(
                ch * 2, ch * 2, dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs
            )
            self.last_scale_shift_table = nnx.Param(
                jnp.asarray(np.random.default_rng(2).normal(size=(2, ch)) / ch**0.5,
                            jnp.float32)
            )
        self.out_ch_final = ch

    def __call__(self, z: jnp.ndarray, timestep: Optional[jnp.ndarray] = None,
                 noise_key=None) -> jnp.ndarray:
        causal = self.cfg.causal_decoder
        x = self.conv_in(z, causal=causal)
        scaled_t = None
        if self.timestep_conditioning:
            t = timestep if timestep is not None else jnp.zeros((z.shape[0],), jnp.float32)
            scaled_t = t.astype(jnp.float32) * self.timestep_scale_multiplier.value
        for i, blk in enumerate(self.up_blocks):
            nk = None if noise_key is None else jax.random.fold_in(noise_key, i)
            if isinstance(blk, UNetMidBlock3D):
                x = blk(x, causal=causal, scaled_t=scaled_t, noise_key=nk)
            else:
                x = blk(x, causal=causal)
        x = self.conv_norm_out(x)
        if self.timestep_conditioning:
            emb = self.last_time_embedder(scaled_t.reshape(-1))  # [B, 2C]
            vals = self.last_scale_shift_table.value[None] \
                + emb.reshape(x.shape[0], 2, -1).astype(jnp.float32)
            shift = vals[:, 0][..., None, None, None].astype(x.dtype)
            scale = vals[:, 1][..., None, None, None].astype(x.dtype)
            x = x * (1 + scale) + shift
        x = nnx.silu(x)
        x = self.conv_out(x, causal=causal)
        return _unpatchify(x, self.cfg.patch_size)


@vae_registry.register(
    "ltx_vae.base",
    aliases=("ltx_vae", "CausalVideoAutoencoder", "AutoencoderKLLTXVideo"),
)
class AutoencoderKLLTX(nnx.Module):
    """Full LTX causal video autoencoder with per-channel latent statistics."""

    config_class = LTXVAEConfig

    def __init__(self, cfg: LTXVAEConfig, *, dtype=jnp.float32,
                 param_dtype=None, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        self.encoder = LTXEncoder(cfg, dtype=dtype, rngs=rngs)
        self.decoder = LTXDecoder(cfg, dtype=dtype, rngs=rngs)
        self.std_of_means = nnx.Param(jnp.ones((cfg.latent_channels,), jnp.float32))
        self.mean_of_means = nnx.Param(jnp.zeros((cfg.latent_channels,), jnp.float32))

    def normalize_latents(self, z: jnp.ndarray) -> jnp.ndarray:
        mean = self.mean_of_means.value[None, :, None, None, None]
        std = self.std_of_means.value[None, :, None, None, None]
        return (z - mean) * self.cfg.scaling_factor / std

    def denormalize_latents(self, z: jnp.ndarray) -> jnp.ndarray:
        mean = self.mean_of_means.value[None, :, None, None, None]
        std = self.std_of_means.value[None, :, None, None, None]
        return z * std / self.cfg.scaling_factor + mean

    def encode(self, x: jnp.ndarray, sample_mode: str = "mode") -> jnp.ndarray:
        """[B,3,T,H,W] in [−1,1] → normalized latents [B,C,T',H',W']."""
        moments = self.encoder(x)
        mean = moments[:, : self.cfg.latent_channels]
        return self.normalize_latents(mean)

    def decode(self, z: jnp.ndarray, timestep: Optional[jnp.ndarray] = None,
               noise_key=None) -> jnp.ndarray:
        z = self.denormalize_latents(z)
        return self.decoder(z, timestep=timestep, noise_key=noise_key)
