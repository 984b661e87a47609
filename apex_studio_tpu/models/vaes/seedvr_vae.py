"""SeedVR2 3D-causal video VAE in JAX/NNX.

Behavioral counterpart of the reference's ``src/vae/seedvr/model.py:1127``
(SeedVR2AutoencoderKL / :1853 SeedVR2AutoencoderKLWrapper): a MAGViT-v2-style
causal video autoencoder, 8x spatial / 4x temporal compression to 16 latent
channels, scaling_factor 0.9152 (manifest ``upscalers/seedvr2-3b.yml:53-80``).

Key semantics reproduced from the reference:
- causal temporal handling is **first-frame replication**, not zero padding:
  every temporally-padded conv extends the head by repeating frame 0
  ``2*pad_t`` times (``modules/causal_inflation_lib.py:513`` extend_head);
  with a stride-2 temporal conv this yields T=4n+1 → T'=n+1.
- norms are applied **per frame**: GroupNorm statistics over (C,H,W) of each
  frame independently (``causal_inflation_lib.py:437`` causal_norm_wrapper
  rearranges ``b c t h w -> (b t) c h w``).
- encoder blocks (model.py:705): conv_in → 4 DownEncoderBlock3D (2 resnets
  each; strided-causal-conv downsamplers on blocks 0-2, temporal from block 1
  per ``i >= len - temporal_down_num - 1``; asymmetric right/bottom spatial
  pad, model.py:262) → mid (resnet/attn/resnet) → norm/act/conv_out.
- decoder blocks (model.py:912): conv_in → mid → 4 UpDecoderBlock3D
  (3 resnets each; MAGViT upsamplers on blocks 0-2, temporal on 0-1 per
  ``i < temporal_up_num``): 1x1x1 ``upscale_conv`` to c*(s²·t) channels,
  pixel-shuffle rearrange ``(x y z c) f h w -> c (f z) (h x) (w y)``
  (model.py:147), then drop the duplicated frame 1 (remove_head,
  causal_inflation_lib.py:503), then a causal 3x3x3 conv.
- mid attention is single-head per-frame spatial attention over (H·W) tokens
  (model.py:691 rearranges ``b c f h w -> (b f) c h w``).
- resnet conv1 is 3x3x3 for ``time_receptive_field="full"`` (the published
  checkpoints) or 1x3x3 for "half" (model.py:286).

The reference's context-parallel cache send/recv + memory-limit conv
splitting (``modules/context_parallel_lib.py``, ``memory_limit_conv``) are
CUDA memory workarounds; on TPU the whole decode is one XLA program with
donation, and oversized inputs go through the shared spatial tiling wrapper.

Data layout NDHWC internally ([B,T,H,W,C]); public API NCTHW like every VAE
in this package.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.models.vaes.cogvideox_vae import GroupNormCh


@dataclasses.dataclass
class SeedVRVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.9152
    temporal_scale_num: int = 2
    time_receptive_field: str = "full"
    attention: bool = True
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True
    spatial_downsample_factor: int = 8
    temporal_downsample_factor: int = 4

    @classmethod
    def from_dict(cls, cfg: dict) -> "SeedVRVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "block_out_channels" in kw:
            kw["block_out_channels"] = tuple(kw["block_out_channels"])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        return self.spatial_downsample_factor

    @property
    def temporal_scale(self) -> int:
        return self.temporal_downsample_factor


def _extend_head(x: jnp.ndarray, times: int) -> jnp.ndarray:
    """Repeat the first frame ``times`` times at the head (time axis 1)."""
    if times == 0:
        return x
    head = jnp.repeat(x[:, :1], times, axis=1)
    return jnp.concatenate([head, x], axis=1)


class HeadConv3d(nnx.Module):
    """Conv3d whose temporal causality comes from first-frame replication
    (reference InflatedCausalConv3d.basic_forward: temporal padding removed
    from the conv, ``extend_head(input, times=2*pad_t)`` instead).

    ``spatial_pad`` is a ((top,bottom),(left,right)) pair — the reference's
    downsamplers pad asymmetrically (right/bottom only, model.py:262).
    """

    def __init__(self, cin: int, cout: int, kernel=(3, 3, 3), stride=(1, 1, 1),
                 pad_t: int = 1, spatial_pad=((1, 1), (1, 1)), *, dtype,
                 rngs: nnx.Rngs):
        if isinstance(kernel, int):
            kernel = (kernel,) * 3
        if isinstance(stride, int):
            stride = (stride,) * 3
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (*kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride = tuple(stride)
        self.pad_t = pad_t
        self.spatial_pad = tuple(tuple(p) for p in spatial_pad)
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _extend_head(x, 2 * self.pad_t)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            window_strides=self.stride,
            padding=((0, 0), *self.spatial_pad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + self.bias.value.astype(y.dtype)


class GroupNormPerFrame(nnx.Module):
    """GroupNorm with statistics per (batch, frame) — the reference applies
    2D GroupNorm after ``b c t h w -> (b t) c h w`` (causal_norm_wrapper)."""

    def __init__(self, num_groups: int, dim: int, *, eps: float = 1e-6,
                 rngs: nnx.Rngs):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))
        self.groups = num_groups
        self.eps = eps

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B,T,H,W,C]
        orig_dtype = x.dtype
        b, t, h, w, c = x.shape
        g = self.groups
        x32 = x.astype(jnp.float32).reshape(b, t, h * w, g, c // g)
        mean = x32.mean(axis=(2, 4), keepdims=True)
        var = x32.var(axis=(2, 4), keepdims=True)
        x32 = (x32 - mean) / jnp.sqrt(var + self.eps)
        x32 = x32.reshape(x.shape) * self.weight.value + self.bias.value
        return x32.astype(orig_dtype)


class SeedResnet3D(nnx.Module):
    """ResnetBlock3D (model.py:276): per-frame norm → silu → causal conv ×2
    with a 1x1x1 shortcut on channel change; conv1 kernel depends on the
    time receptive field."""

    def __init__(self, cin: int, cout: int, groups: int, receptive: str, *,
                 dtype, rngs: nnx.Rngs):
        full = receptive == "full"
        self.norm1 = GroupNormPerFrame(groups, cin, rngs=rngs)
        self.conv1 = HeadConv3d(cin, cout, kernel=(3, 3, 3) if full else (1, 3, 3),
                                pad_t=1 if full else 0, dtype=dtype, rngs=rngs)
        self.norm2 = GroupNormPerFrame(groups, cout, rngs=rngs)
        self.conv2 = HeadConv3d(cout, cout, dtype=dtype, rngs=rngs)
        self.conv_shortcut = (
            HeadConv3d(cin, cout, kernel=1, pad_t=0, spatial_pad=((0, 0), (0, 0)),
                       dtype=dtype, rngs=rngs)
            if cin != cout else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        h = self.conv2(jax.nn.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class SeedAttnBlock(nnx.Module):
    """Per-frame spatial self-attention (UNetMidBlock3D: model.py:688-699;
    diffusers deprecated VAE attention: single head = C/head_dim with
    head_dim = block channels)."""

    def __init__(self, dim: int, groups: int, *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.group_norm = GroupNormPerFrame(groups, dim, rngs=rngs)
        self.to_q = nnx.Linear(dim, dim, **kw)
        self.to_k = nnx.Linear(dim, dim, **kw)
        self.to_v = nnx.Linear(dim, dim, **kw)
        self.to_out = nnx.Linear(dim, dim, **kw)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        y = self.group_norm(x).reshape(b * t, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        scale = c ** -0.5
        attn = jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        y = self.to_out(jnp.einsum("bij,bjc->bic", attn, v))
        return x + y.reshape(b, t, h, w, c)


class SeedDownsample3D(nnx.Module):
    """Downsample3D (model.py:190): strided causal conv, kernel (3|1,3,3),
    asymmetric right/bottom spatial padding."""

    def __init__(self, dim: int, temporal: bool, *, dtype, rngs: nnx.Rngs):
        rt = 2 if temporal else 1
        self.conv = HeadConv3d(
            dim, dim,
            kernel=(3 if temporal else 1, 3, 3),
            stride=(rt, 2, 2),
            pad_t=1 if temporal else 0,
            spatial_pad=((0, 1), (0, 1)),
            dtype=dtype, rngs=rngs,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv(x)


class SeedUpsample3D(nnx.Module):
    """Upsample3D (model.py:67): MAGViT-v2 learnable upsample — 1x1x1 conv to
    c·(s²·t) channels, pixel-shuffle, drop the duplicated second frame when
    upsampling time, then a causal 3x3x3 conv."""

    def __init__(self, dim: int, temporal: bool, *, dtype, rngs: nnx.Rngs):
        self.temporal = temporal
        self.rt = 2 if temporal else 1
        ratio = 4 * self.rt
        self.upscale_conv = HeadConv3d(dim, dim * ratio, kernel=1, pad_t=0,
                                       spatial_pad=((0, 0), (0, 0)),
                                       dtype=dtype, rngs=rngs)
        self.conv = HeadConv3d(dim, dim, dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, _ = x.shape
        y = self.upscale_conv(x)
        c = y.shape[-1] // (4 * self.rt)
        # Torch channel order "(x y z c)": c fastest, then z (time), y, x.
        y = y.reshape(b, t, h, w, 2, 2, self.rt, c)       # [..., x, y, z, c]
        y = y.transpose(0, 1, 6, 2, 4, 3, 5, 7)           # b t z h x w y c
        y = y.reshape(b, t * self.rt, h * 2, w * 2, c)
        if self.temporal:
            # remove_head: frame 0 stays, its duplicate (frame 1) is dropped.
            y = jnp.concatenate([y[:, :1], y[:, 2:]], axis=1)
        return self.conv(y)


class SeedMidBlock3D(nnx.Module):
    def __init__(self, dim: int, groups: int, receptive: str, attention: bool,
                 *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        self.resnets = nnx.List([
            SeedResnet3D(dim, dim, groups, receptive, **kw),
            SeedResnet3D(dim, dim, groups, receptive, **kw),
        ])
        self.attentions = nnx.List(
            [SeedAttnBlock(dim, groups, **kw)] if attention else []
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.resnets[0](x)
        if len(self.attentions):
            x = self.attentions[0](x)
        return self.resnets[1](x)


class SeedDownBlock3D(nnx.Module):
    def __init__(self, cin: int, cout: int, layers: int, groups: int,
                 receptive: str, downsample: bool, temporal: bool, *,
                 dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        self.resnets = nnx.List([
            SeedResnet3D(cin if j == 0 else cout, cout, groups, receptive, **kw)
            for j in range(layers)
        ])
        self.downsamplers = (
            nnx.List([SeedDownsample3D(cout, temporal, **kw)]) if downsample else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class SeedUpBlock3D(nnx.Module):
    def __init__(self, cin: int, cout: int, layers: int, groups: int,
                 receptive: str, upsample: bool, temporal: bool, *,
                 dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        self.resnets = nnx.List([
            SeedResnet3D(cin if j == 0 else cout, cout, groups, receptive, **kw)
            for j in range(layers)
        ])
        self.upsamplers = (
            nnx.List([SeedUpsample3D(cout, temporal, **kw)]) if upsample else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class SeedEncoder3D(nnx.Module):
    """Encoder3D (model.py:705)."""

    def __init__(self, cfg: SeedVRVAEConfig, *, dtype, rngs: nnx.Rngs):
        ch = cfg.block_out_channels
        n = len(ch)
        kw = dict(dtype=dtype, rngs=rngs)
        self.conv_in = HeadConv3d(cfg.in_channels, ch[0], **kw)
        blocks = []
        cin = ch[0]
        for i in range(n):
            is_final = i == n - 1
            temporal = i >= n - cfg.temporal_scale_num - 1
            blocks.append(SeedDownBlock3D(
                cin, ch[i], cfg.layers_per_block, cfg.norm_num_groups,
                cfg.time_receptive_field, downsample=not is_final,
                temporal=temporal, **kw))
            cin = ch[i]
        self.down_blocks = nnx.List(blocks)
        self.mid_block = SeedMidBlock3D(ch[-1], cfg.norm_num_groups,
                                        cfg.time_receptive_field, cfg.attention, **kw)
        self.conv_norm_out = GroupNormPerFrame(cfg.norm_num_groups, ch[-1], rngs=rngs)
        self.conv_out = HeadConv3d(ch[-1], 2 * cfg.latent_channels, **kw)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(jax.nn.silu(self.conv_norm_out(x)))


class SeedDecoder3D(nnx.Module):
    """Decoder3D (model.py:912)."""

    def __init__(self, cfg: SeedVRVAEConfig, *, dtype, rngs: nnx.Rngs):
        ch = list(reversed(cfg.block_out_channels))
        n = len(ch)
        kw = dict(dtype=dtype, rngs=rngs)
        self.conv_in = HeadConv3d(cfg.latent_channels, ch[0], **kw)
        self.mid_block = SeedMidBlock3D(ch[0], cfg.norm_num_groups,
                                        cfg.time_receptive_field, cfg.attention, **kw)
        blocks = []
        cin = ch[0]
        for i in range(n):
            is_final = i == n - 1
            temporal = i < cfg.temporal_scale_num
            blocks.append(SeedUpBlock3D(
                cin, ch[i], cfg.layers_per_block + 1, cfg.norm_num_groups,
                cfg.time_receptive_field, upsample=not is_final,
                temporal=temporal, **kw))
            cin = ch[i]
        self.up_blocks = nnx.List(blocks)
        self.conv_norm_out = GroupNormPerFrame(cfg.norm_num_groups, ch[-1], rngs=rngs)
        self.conv_out = HeadConv3d(ch[-1], cfg.out_channels, **kw)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_in(x)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(jax.nn.silu(self.conv_norm_out(x)))


@vae_registry.register(
    "seedvr", aliases=("seedvr.base", "seedvr2", "SeedVR2AutoencoderKLWrapper"))
class SeedVRVAE(nnx.Module):
    config_class = SeedVRVAEConfig

    def __init__(self, cfg: Optional[SeedVRVAEConfig] = None, *,
                 dtype=jnp.float32, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg = cfg or SeedVRVAEConfig()
        kw = dict(dtype=dtype, rngs=rngs)
        self.encoder = SeedEncoder3D(cfg, **kw)
        self.decoder = SeedDecoder3D(cfg, **kw)
        lc = cfg.latent_channels
        self.quant_conv = (
            HeadConv3d(2 * lc, 2 * lc, kernel=1, pad_t=0,
                       spatial_pad=((0, 0), (0, 0)), **kw)
            if cfg.use_quant_conv else None
        )
        self.post_quant_conv = (
            HeadConv3d(lc, lc, kernel=1, pad_t=0, spatial_pad=((0, 0), (0, 0)), **kw)
            if cfg.use_post_quant_conv else None
        )

    # Public API: NCTHW like every VAE in this package. The reference encodes
    # with the distribution *mode* (model.py:1939 "deterministic mode...").
    def encode(self, video: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        """[B,3,T,H,W] in [-1,1], T=4n+1 → scaled latents [B,16,n+1,H/8,W/8]."""
        x = jnp.transpose(video.astype(jnp.float32), (0, 2, 3, 4, 1))
        moments = self.encoder(x)
        if self.quant_conv is not None:
            moments = self.quant_conv(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        z = mean
        if sample and noise is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) * jnp.transpose(
                noise.astype(jnp.float32), (0, 2, 3, 4, 1))
        z = jnp.transpose(z, (0, 4, 1, 2, 3))
        return z * self.cfg.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents [B,16,T',h,w] → video [B,3,4(T'-1)+1,8h,8w]."""
        z = jnp.transpose(z.astype(jnp.float32) / self.cfg.scaling_factor,
                          (0, 2, 3, 4, 1))
        if self.post_quant_conv is not None:
            z = self.post_quant_conv(z)
        x = self.decoder(z)
        return jnp.transpose(x, (0, 4, 1, 2, 3))
