"""HunyuanVideo (original) 3D-causal video VAE in JAX/NNX.

Behavioral counterpart of the reference's ``src/vae/hunyuanvideo/model.py:706``
(diffusers AutoencoderKLHunyuanVideo): 8x spatial / 4x temporal compression to
16 latent channels, scaling_factor 0.476986, quant/post-quant 1x1 convs.

Structure (mirrors the diffusers key nesting so the converter stays
regex-only, per the house pattern):
- causal convs: front-padded time (k_t−1, 0), same as wan_vae.CausalConv3d
- resnets: GroupNorm(32) → silu → causal conv ×2 (+1×1 shortcut)
- encoder downsampling: strided causal conv, stride (t?,2,2) chosen per level
  (spatial at levels 0-2; temporal at levels 1-2 for the 4x temporal ratio —
  model.py:503-508)
- decoder upsampling: nearest-neighbour ×2 (first frame exempt from the
  temporal repeat) then a causal conv (model.py:115)
- mid blocks: resnet + single-head full-sequence attention with a
  frame-causal (block-triangular) mask + resnet (model.py:214,38)

Data layout NDHWC internally ([B,T,H,W,C]); public API NCTHW like every VAE
in this package. Large inputs go through the shared tiling wrapper.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.models.vaes.cogvideox_vae import GroupNormCh
from apex_studio_tpu.models.vaes.wan_vae import CausalConv3d as _ZeroPadCausalConv3d


class CausalConv3d(_ZeroPadCausalConv3d):
    """HunyuanVideo causal conv pads with REPLICATE (edge) values — time
    front-padded (k_t−1), spatial symmetric (reference vae/hunyuanvideo/
    model.py:65 pad_mode='replicate') — unlike wan's zero padding. Real
    checkpoints were trained against edge padding, so zero padding corrupts
    every border voxel."""

    def __call__(self, x: jnp.ndarray, extra_front_trim: int = 0) -> jnp.ndarray:
        pt, ph, pw = self.pad
        if pt or ph or pw:
            x = jnp.pad(
                x,
                ((0, 0), (2 * pt - extra_front_trim, 0), (ph, ph), (pw, pw), (0, 0)),
                mode="edge",
            )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            window_strides=self.stride,
            padding=((0, 0), (0, 0), (0, 0)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + self.bias.value.astype(self.dtype)


@dataclasses.dataclass
class HunyuanVideoVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.476986
    spatial_compression_ratio: int = 8
    temporal_compression_ratio: int = 4
    mid_block_add_attention: bool = True

    @classmethod
    def from_dict(cls, cfg: dict) -> "HunyuanVideoVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "block_out_channels" in kw:
            kw["block_out_channels"] = tuple(kw["block_out_channels"])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        return self.spatial_compression_ratio

    @property
    def temporal_scale(self) -> int:
        return self.temporal_compression_ratio


class HVResnet(nnx.Module):
    def __init__(self, cin: int, cout: int, groups: int, *, dtype, rngs: nnx.Rngs):
        self.norm1 = GroupNormCh(groups, cin, rngs=rngs)
        self.conv1 = CausalConv3d(cin, cout, dtype=dtype, rngs=rngs)
        self.norm2 = GroupNormCh(groups, cout, rngs=rngs)
        self.conv2 = CausalConv3d(cout, cout, dtype=dtype, rngs=rngs)
        self.conv_shortcut = (
            CausalConv3d(cin, cout, kernel=1, padding=0, dtype=dtype, rngs=rngs)
            if cin != cout
            else None
        )

    def __call__(self, x):
        h = self.conv1(nnx.silu(self.norm1(x)))
        h = self.conv2(nnx.silu(self.norm2(h)))
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class HVMidAttention(nnx.Module):
    """Single-head full-sequence attention with a frame-causal mask
    (diffusers deprecated-style attn block: GN → q/k/v/out 1-channel heads)."""

    def __init__(self, dim: int, groups: int, *, dtype, rngs: nnx.Rngs):
        from apex_studio_tpu.models.layers import Linear

        self.group_norm = GroupNormCh(groups, dim, rngs=rngs)
        kw = dict(use_bias=True, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.to_q = Linear(dim, dim, **kw)
        self.to_k = Linear(dim, dim, **kw)
        self.to_v = Linear(dim, dim, **kw)
        self.to_out = Linear(dim, dim, **kw)
        self.dim = dim

    def __call__(self, x):
        # x: [B, T, H, W, C] → tokens [B, T·H·W, C]
        b, t, h, w, c = x.shape
        y = self.group_norm(x).reshape(b, t * h * w, c)
        q = self.to_q(y)[:, :, None, :]  # single head, head_dim = C
        k = self.to_k(y)[:, :, None, :]
        v = self.to_v(y)[:, :, None, :]
        # Frame-causal block mask: token in frame i attends to frames <= i
        # (reference prepare_causal_attention_mask, model.py:38).
        frame = jnp.repeat(jnp.arange(t), h * w)
        bias = jnp.where(frame[None, :] <= frame[:, None], 0.0, -1e30)[None, None]
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
        s = s * (c**-0.5) + bias
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
        out = self.to_out(out.reshape(b, t * h * w, c).astype(x.dtype))
        return x + out.reshape(b, t, h, w, c)


class HVMidBlock(nnx.Module):
    def __init__(self, dim: int, groups: int, add_attention: bool, *, dtype, rngs: nnx.Rngs):
        self.resnets = nnx.List(
            [HVResnet(dim, dim, groups, dtype=dtype, rngs=rngs) for _ in range(2)]
        )
        self.attentions = (
            nnx.List([HVMidAttention(dim, groups, dtype=dtype, rngs=rngs)])
            if add_attention
            else None
        )

    def __call__(self, x):
        x = self.resnets[0](x)
        if self.attentions is not None:
            x = self.attentions[0](x)
        return self.resnets[1](x)


class HVDownsample(nnx.Module):
    """Strided causal conv, stride (t, 2, 2) or (1, 2, 2) (model.py:144)."""

    def __init__(self, dim: int, stride: Tuple[int, int, int], *, dtype, rngs: nnx.Rngs):
        self.conv = CausalConv3d(dim, dim, kernel=3, stride=stride, padding=1,
                                 dtype=dtype, rngs=rngs)

    def __call__(self, x):
        return self.conv(x)


class HVUpsample(nnx.Module):
    """Nearest ×factor then causal conv; first frame exempt from temporal
    repeat (model.py:96-141)."""

    def __init__(self, dim: int, factor: Tuple[int, int, int], *, dtype, rngs: nnx.Rngs):
        self.conv = CausalConv3d(dim, dim, dtype=dtype, rngs=rngs)
        self.factor = factor

    def __call__(self, x):
        ft, fh, fw = self.factor
        if ft > 1 and x.shape[1] > 1:
            head, rest = x[:, :1], x[:, 1:]
            rest = jnp.repeat(rest, ft, axis=1)
            x = jnp.concatenate([head, rest], axis=1)
        if fh > 1:
            x = jnp.repeat(x, fh, axis=2)
        if fw > 1:
            x = jnp.repeat(x, fw, axis=3)
        return self.conv(x)


class HVDownBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, num_layers: int, groups: int,
                 stride: Optional[Tuple[int, int, int]], *, dtype, rngs: nnx.Rngs):
        res, cur = [], cin
        for _ in range(num_layers):
            res.append(HVResnet(cur, cout, groups, dtype=dtype, rngs=rngs))
            cur = cout
        self.resnets = nnx.List(res)
        self.downsamplers = (
            nnx.List([HVDownsample(cout, stride, dtype=dtype, rngs=rngs)])
            if stride is not None
            else None
        )

    def __call__(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class HVUpBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, num_layers: int, groups: int,
                 factor: Optional[Tuple[int, int, int]], *, dtype, rngs: nnx.Rngs):
        res, cur = [], cin
        for _ in range(num_layers):
            res.append(HVResnet(cur, cout, groups, dtype=dtype, rngs=rngs))
            cur = cout
        self.resnets = nnx.List(res)
        self.upsamplers = (
            nnx.List([HVUpsample(cout, factor, dtype=dtype, rngs=rngs)])
            if factor is not None
            else None
        )

    def __call__(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


def _down_plan(cfg: HunyuanVideoVAEConfig):
    """Per-level downsample stride, reference model.py:498-520 (t_ratio 4)."""
    n = len(cfg.block_out_channels)
    n_sp = int(np.log2(cfg.spatial_compression_ratio))
    n_t = int(np.log2(cfg.temporal_compression_ratio))
    plan = []
    for i in range(n):
        is_final = i == n - 1
        sp = i < n_sp
        tm = i >= (n - 1 - n_t) and not is_final
        if sp or tm:
            plan.append(((2 if tm else 1), 2 if sp else 1, 2 if sp else 1))
        else:
            plan.append(None)
    return plan


def _up_plan(cfg: HunyuanVideoVAEConfig):
    """Per-level upsample factor, reference model.py:636-660 (t_ratio 4)."""
    n = len(cfg.block_out_channels)
    n_sp = int(np.log2(cfg.spatial_compression_ratio))
    n_t = int(np.log2(cfg.temporal_compression_ratio))
    plan = []
    for i in range(n):
        is_final = i == n - 1
        sp = i < n_sp
        tm = i >= (n - 1 - n_t) and not is_final
        if sp or tm:
            plan.append(((2 if tm else 1), 2 if sp else 1, 2 if sp else 1))
        else:
            plan.append(None)
    return plan


class HVEncoder(nnx.Module):
    def __init__(self, cfg: HunyuanVideoVAEConfig, *, dtype, rngs: nnx.Rngs):
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = CausalConv3d(cfg.in_channels, ch[0], dtype=dtype, rngs=rngs)
        blocks, cur = [], ch[0]
        for i, stride in enumerate(_down_plan(cfg)):
            blocks.append(HVDownBlock(cur, ch[i], cfg.layers_per_block, g, stride,
                                      dtype=dtype, rngs=rngs))
            cur = ch[i]
        self.down_blocks = nnx.List(blocks)
        self.mid_block = HVMidBlock(ch[-1], g, cfg.mid_block_add_attention,
                                    dtype=dtype, rngs=rngs)
        self.conv_norm_out = GroupNormCh(g, ch[-1], rngs=rngs)
        self.conv_out = CausalConv3d(ch[-1], 2 * cfg.latent_channels, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(nnx.silu(self.conv_norm_out(x)))


class HVDecoder(nnx.Module):
    def __init__(self, cfg: HunyuanVideoVAEConfig, *, dtype, rngs: nnx.Rngs):
        ch = list(reversed(cfg.block_out_channels))
        g = cfg.norm_num_groups
        self.conv_in = CausalConv3d(cfg.latent_channels, ch[0], dtype=dtype, rngs=rngs)
        self.mid_block = HVMidBlock(ch[0], g, cfg.mid_block_add_attention,
                                    dtype=dtype, rngs=rngs)
        blocks, cur = [], ch[0]
        for i, factor in enumerate(_up_plan(cfg)):
            blocks.append(HVUpBlock(cur, ch[i], cfg.layers_per_block + 1, g, factor,
                                    dtype=dtype, rngs=rngs))
            cur = ch[i]
        self.up_blocks = nnx.List(blocks)
        self.conv_norm_out = GroupNormCh(g, ch[-1], rngs=rngs)
        self.conv_out = CausalConv3d(ch[-1], cfg.out_channels, dtype=dtype, rngs=rngs)

    def __call__(self, z):
        z = self.conv_in(z)
        z = self.mid_block(z)
        for blk in self.up_blocks:
            z = blk(z)
        return self.conv_out(nnx.silu(self.conv_norm_out(z)))


@vae_registry.register(
    "hunyuanvideo", aliases=("AutoencoderKLHunyuanVideo", "hunyuanvideo.vae")
)
class AutoencoderKLHunyuanVideo(nnx.Module):
    config_class = HunyuanVideoVAEConfig

    def __init__(self, cfg: HunyuanVideoVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = HVEncoder(cfg, dtype=dtype, rngs=rngs)
        self.decoder = HVDecoder(cfg, dtype=dtype, rngs=rngs)
        z2 = 2 * cfg.latent_channels
        self.quant_conv = CausalConv3d(z2, z2, kernel=1, padding=0, dtype=dtype, rngs=rngs)
        self.post_quant_conv = CausalConv3d(
            cfg.latent_channels, cfg.latent_channels, kernel=1, padding=0,
            dtype=dtype, rngs=rngs,
        )

    def encode(self, video: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        """[B,3,T,H,W] in [-1,1] → scaled latents [B,16,T',H/8,W/8]."""
        x = jnp.transpose(video.astype(jnp.float32), (0, 2, 3, 4, 1))
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        z = mean
        if sample and noise is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) * noise
        z = jnp.transpose(z, (0, 4, 1, 2, 3))
        return z * self.cfg.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents → video [B,3,T,H,W] in [-1,1]."""
        z = z.astype(jnp.float32) / self.cfg.scaling_factor
        z = jnp.transpose(z, (0, 2, 3, 4, 1))
        z = self.post_quant_conv(z)
        out = self.decoder(z)
        return jnp.clip(jnp.transpose(out, (0, 4, 1, 2, 3)), -1.0, 1.0)
