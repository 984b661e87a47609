"""MAGI-1 ViT video autoencoder in JAX/NNX.

Counterpart of the reference's ``src/vae/magi/`` (AutoencoderKLMagi,
model.py:231; ViTEncoder module.py:506, ViTDecoder module.py:678): a pure
transformer VAE — 3D patch embed (8×8 spatial, 4 temporal), cls token,
interpolatable 3D pos-embed, pre-norm ViT blocks, then a linear head to the
latent moments (encode) / an unpatchify + 3×3×3 conv (decode). Transformer
VAEs are an unusually good fit for the MXU: every op is a large matmul.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear
from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.ops.attention import attention as attention_op


@dataclasses.dataclass
class MagiVAEConfig:
    video_size: int = 256
    video_length: int = 16
    patch_size: int = 8
    patch_length: int = 4
    in_chans: int = 3
    z_chans: int = 16
    double_z: bool = True
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    with_cls_token: bool = True
    use_final_proj: bool = True  # decoder: 4-channel unpatch + final norm

    @property
    def spatial_compression_ratio(self) -> int:
        return self.patch_size

    @property
    def temporal_compression_ratio(self) -> int:
        return self.patch_length

    @classmethod
    def from_dict(cls, cfg: dict) -> "MagiVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


class _Conv3d(nnx.Module):
    """3x3x3 NDHWC conv, kernel DHWIO (standard 5-D checkpoint transform)."""

    def __init__(self, cin: int, cout: int, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (3, 3, 3, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + self.bias.value


class _VAEAttention(nnx.Module):
    def __init__(self, dim: int, heads: int, qkv_bias: bool, *, dtype, rngs):
        kw = dict(dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.qkv = Linear(dim, dim * 3, use_bias=qkv_bias, **kw)
        self.proj = Linear(dim, dim, use_bias=True, **kw)
        self.heads = heads

    def __call__(self, x):
        b, n, d = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, d // self.heads)
        out = attention_op(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        return self.proj(out.reshape(b, n, d))


class _VAEBlock(nnx.Module):
    def __init__(self, cfg: MagiVAEConfig, *, dtype, rngs):
        d = cfg.embed_dim
        kw = dict(dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.norm1 = LayerNorm(d, eps=1e-5)
        self.attn = _VAEAttention(d, cfg.num_heads, cfg.qkv_bias, dtype=dtype, rngs=rngs)
        self.norm2 = LayerNorm(d, eps=1e-5)
        self.fc1 = Linear(d, int(d * cfg.mlp_ratio), use_bias=True, **kw)
        self.fc2 = Linear(int(d * cfg.mlp_ratio), d, use_bias=True, **kw)

    def __call__(self, x):
        x = x + self.attn(self.norm1(x).astype(x.dtype))
        h = self.fc2(nnx.gelu(self.fc1(self.norm2(x).astype(x.dtype)),
                              approximate=False))
        return x + h


def _resize_pos_embed(pe: jnp.ndarray, src: Tuple[int, int, int],
                      dst: Tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear pos-embed resize (module.py resize_pos_embed role)."""
    d = pe.shape[-1]
    grid = pe.reshape(1, *src, d)
    # torch F.interpolate(mode="trilinear", align_corners=False) does NOT
    # antialias on downscale — jax.image.resize defaults antialias=True
    grid = jax.image.resize(grid, (1, *dst, d), "trilinear", antialias=False)
    return grid.reshape(1, dst[0] * dst[1] * dst[2], d)


class _ViTCore(nnx.Module):
    """Shared trunk: cls token, pos embed (+resize), blocks, final norm."""

    def __init__(self, cfg: MagiVAEConfig, *, dtype, rngs):
        d = cfg.embed_dim
        self.cfg = cfg
        lt = cfg.video_length // cfg.patch_length
        ls = cfg.video_size // cfg.patch_size
        self.src_shape = (lt, ls, ls)
        n = lt * ls * ls + (1 if cfg.with_cls_token else 0)
        self.cls_token = (nnx.Param(jnp.zeros((1, 1, d), jnp.float32))
                          if cfg.with_cls_token else None)
        self.pos_embed = nnx.Param(jnp.zeros((1, n, d), jnp.float32))
        self.blocks = nnx.List([_VAEBlock(cfg, dtype=dtype, rngs=rngs)
                                for _ in range(cfg.depth)])
        self.norm = LayerNorm(d, eps=1e-5)

    def __call__(self, tok: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
        b = tok.shape[0]
        pe = self.pos_embed.value
        if self.cls_token is not None:
            cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
        else:
            cls_pe, patch_pe = None, pe
        if shape != self.src_shape:
            patch_pe = _resize_pos_embed(patch_pe, self.src_shape, shape)
        if self.cls_token is not None:
            tok = jnp.concatenate(
                [jnp.broadcast_to(self.cls_token.value, (b, 1, tok.shape[-1])), tok],
                axis=1)
            pe = jnp.concatenate([cls_pe, patch_pe], axis=1)
        else:
            pe = patch_pe
        tok = tok + pe.astype(tok.dtype)
        for blk in self.blocks:
            tok = blk(tok)
        tok = self.norm(tok).astype(tok.dtype)
        return tok[:, 1:] if self.cls_token is not None else tok


class MagiViTEncoder(nnx.Module):
    def __init__(self, cfg: MagiVAEConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, param_dtype=dtype, rngs=rngs)
        patch_dim = cfg.in_chans * cfg.patch_length * cfg.patch_size ** 2
        self.patch_embed = Linear(patch_dim, cfg.embed_dim, use_bias=True, **kw)
        self.core = _ViTCore(cfg, dtype=dtype, rngs=rngs)
        out = cfg.z_chans * (2 if cfg.double_z else 1)
        self.last_layer = Linear(cfg.embed_dim, out, use_bias=True, **kw)
        self.cfg = cfg

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, 3, T, H, W) → moments (B, 2z, T/pt, H/p, W/p)."""
        cfg = self.cfg
        b, c, t, h, w = x.shape
        pt, p = cfg.patch_length, cfg.patch_size
        lt, lh, lw = t // pt, h // p, w // p
        tok = x.reshape(b, c, lt, pt, lh, p, lw, p)
        tok = tok.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b, lt * lh * lw, c * pt * p * p)
        tok = self.patch_embed(tok)
        tok = self.core(tok, (lt, lh, lw))
        z = self.last_layer(tok)
        z = z.reshape(b, lt, lh, lw, -1).transpose(0, 4, 1, 2, 3)
        return z


class MagiViTDecoder(nnx.Module):
    def __init__(self, cfg: MagiVAEConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.proj_in = Linear(cfg.z_chans, cfg.embed_dim, use_bias=True, **kw)
        self.core = _ViTCore(cfg, dtype=dtype, rngs=rngs)
        vol = cfg.patch_length * cfg.patch_size ** 2
        if cfg.use_final_proj:
            self.unpatch_channels = 4
            self.final_proj = Linear(cfg.embed_dim, 4 * vol, use_bias=True, **kw)
            self.final_norm = LayerNorm(4 * vol, eps=1e-5)
        else:
            self.unpatch_channels = cfg.embed_dim // vol
            self.final_proj = None
            self.final_norm = None
        self.last_layer = _Conv3d(self.unpatch_channels, 3, rngs=rngs)
        self.cfg = cfg

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (B, z, T', H', W') → (B, 3, T, H, W)."""
        cfg = self.cfg
        b, c, lt, lh, lw = z.shape
        pt, p = cfg.patch_length, cfg.patch_size
        tok = z.transpose(0, 2, 3, 4, 1).reshape(b, lt * lh * lw, c)
        tok = self.proj_in(tok.astype(self.proj_in.dtype))
        tok = self.core(tok, (lt, lh, lw))
        if self.final_proj is not None:
            tok = self.final_norm(self.final_proj(tok)).astype(tok.dtype)
        u = self.unpatch_channels
        x = tok.reshape(b, lt, lh, lw, pt, p, p, u)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # B (lt pt) (lh p) (lw p) u
        x = x.reshape(b, lt * pt, lh * p, lw * p, u)
        x = self.last_layer(x.astype(jnp.float32))
        return x.transpose(0, 4, 1, 2, 3)


@vae_registry.register("magi.base", aliases=("magi", "AutoencoderKLMagi"))
class AutoencoderKLMagi(nnx.Module):
    config_class = MagiVAEConfig

    def __init__(self, cfg: MagiVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = MagiViTEncoder(cfg, dtype=dtype, rngs=rngs)
        self.decoder = MagiViTDecoder(cfg, dtype=dtype, rngs=rngs)

    @property
    def spatial_compression_ratio(self) -> int:
        return self.cfg.patch_size

    @property
    def temporal_compression_ratio(self) -> int:
        return self.cfg.patch_length

    def encode(self, video: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        """[B,3,T,H,W] in [-1,1] → latents [B,z,T/4,H/8,W/8] (posterior mean,
        or a sample when ``noise`` is given)."""
        moments = self.encoder(video)
        mean, logvar = jnp.split(moments, 2, axis=1)
        if sample and noise is not None:
            return mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) * noise
        return mean

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)
