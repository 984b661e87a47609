"""Kandinsky 5.0 video DiT in JAX/NNX.

Counterpart of the reference's ``src/transformer/kandinsky5/base/model.py:574``
(Kandinsky5Transformer3DModel): a text-refiner + visual-decoder transformer.
Qwen2.5-VL text embeddings pass through ``num_text_blocks`` encoder blocks
(1D RoPE, 6-param zero-init modulation); visual tokens run
``num_visual_blocks`` decoder blocks (self-attn with 3-axis interleaved RoPE,
text cross-attn, FF — each gated by a 9-param modulation from
time+pooled-CLIP). Output layer is a 2-param modulated LayerNorm + linear
unpatchify. ``visual_cond`` (i2v) doubles the input channels (+1 mask).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops.attention import attention


@dataclasses.dataclass
class Kandinsky5Config:
    in_visual_dim: int = 16
    out_visual_dim: int = 16
    in_text_dim: int = 3584
    in_text_dim2: int = 768
    time_dim: int = 512
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    model_dim: int = 1792
    ff_dim: int = 7168
    num_text_blocks: int = 2
    num_visual_blocks: int = 32
    axes_dims: Tuple[int, int, int] = (16, 24, 24)
    visual_cond: bool = False

    @property
    def head_dim(self) -> int:
        return sum(self.axes_dims)

    @classmethod
    def from_dict(cls, cfg: dict) -> "Kandinsky5Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in cfg.items() if k in known}
        return cls(**kw)


def _apply_rope_pairs(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Interleaved-pair rotation (model.py:341 apply_rotary): pairs of
    adjacent head dims rotated by per-position angles."""
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    out0 = cos * x0 - sin * x1
    out1 = sin * x0 + cos * x1
    return jnp.stack([out0, out1], axis=-1).reshape(x.shape).astype(x.dtype)


def _rope_angles_1d(pos: jnp.ndarray, dim: int, theta: float = 10000.0):
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    ang = pos.astype(jnp.float32)[..., None] * jnp.asarray(freqs, jnp.float32)
    return jnp.cos(ang), jnp.sin(ang)


class _Modulation(nnx.Module):
    """SiLU → zero-init Linear(time_dim, n·model_dim) (model.py:283)."""

    def __init__(self, time_dim: int, model_dim: int, n: int, *, dtype, rngs):
        self.out_layer = Linear(time_dim, n * model_dim, use_bias=True,
                                dtype=jnp.float32, param_dtype=jnp.float32,
                                rngs=rngs)
        self.out_layer.kernel.value = jnp.zeros_like(self.out_layer.kernel.value)
        self.n = n
        self.model_dim = model_dim

    def __call__(self, temb):
        out = self.out_layer(nnx.silu(temb.astype(jnp.float32)))
        return jnp.split(out[:, None], self.n, axis=-1)


class _K5Attention(nnx.Module):
    def __init__(self, dim: int, head_dim: int, *, dtype, rngs):
        kw = dict(use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.to_query = Linear(dim, dim, **kw)
        self.to_key = Linear(dim, dim, **kw)
        self.to_value = Linear(dim, dim, **kw)
        self.out_layer = Linear(dim, dim, **kw)
        self.query_norm = RMSNorm(head_dim)
        self.key_norm = RMSNorm(head_dim)
        self.heads = dim // head_dim
        self.head_dim = head_dim

    def __call__(self, x, context=None, rope=None):
        b, s, d = x.shape
        kv_in = x if context is None else context
        q = self.to_query(x).reshape(b, s, self.heads, self.head_dim)
        k = self.to_key(kv_in).reshape(b, -1, self.heads, self.head_dim)
        v = self.to_value(kv_in).reshape(b, -1, self.heads, self.head_dim)
        q = self.query_norm(q.astype(jnp.float32)).astype(x.dtype)
        k = self.key_norm(k.astype(jnp.float32)).astype(x.dtype)
        if rope is not None:
            cos, sin = rope
            q = _apply_rope_pairs(q, cos, sin)
            k = _apply_rope_pairs(k, cos, sin)
        out = attention(q, k, v)
        return self.out_layer(out.reshape(b, s, d))


class _K5FF(nnx.Module):
    def __init__(self, dim: int, ff_dim: int, *, dtype, rngs):
        kw = dict(use_bias=False, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.in_layer = Linear(dim, ff_dim, **kw)
        self.out_layer = Linear(ff_dim, dim, **kw)

    def __call__(self, x):
        return self.out_layer(nnx.gelu(self.in_layer(x), approximate=False))


class _K5EncoderBlock(nnx.Module):
    def __init__(self, cfg: Kandinsky5Config, *, dtype, rngs):
        d = cfg.model_dim
        self.text_modulation = _Modulation(cfg.time_dim, d, 6, dtype=dtype, rngs=rngs)
        self.self_attention_norm = LayerNorm(d, elementwise_affine=False)
        self.self_attention = _K5Attention(d, cfg.head_dim, dtype=dtype, rngs=rngs)
        self.feed_forward_norm = LayerNorm(d, elementwise_affine=False)
        self.feed_forward = _K5FF(d, cfg.ff_dim, dtype=dtype, rngs=rngs)

    def __call__(self, x, temb, rope):
        sh, sc, g, sh2, sc2, g2 = self.text_modulation(temb)
        h = (self.self_attention_norm(x) * (sc + 1.0) + sh).astype(x.dtype)
        x = x + (g * self.self_attention(h, rope=rope).astype(jnp.float32)
                 ).astype(x.dtype)
        h = (self.feed_forward_norm(x) * (sc2 + 1.0) + sh2).astype(x.dtype)
        return x + (g2 * self.feed_forward(h).astype(jnp.float32)).astype(x.dtype)


class _K5DecoderBlock(nnx.Module):
    def __init__(self, cfg: Kandinsky5Config, *, dtype, rngs):
        d = cfg.model_dim
        self.visual_modulation = _Modulation(cfg.time_dim, d, 9, dtype=dtype, rngs=rngs)
        self.self_attention_norm = LayerNorm(d, elementwise_affine=False)
        self.self_attention = _K5Attention(d, cfg.head_dim, dtype=dtype, rngs=rngs)
        self.cross_attention_norm = LayerNorm(d, elementwise_affine=False)
        self.cross_attention = _K5Attention(d, cfg.head_dim, dtype=dtype, rngs=rngs)
        self.feed_forward_norm = LayerNorm(d, elementwise_affine=False)
        self.feed_forward = _K5FF(d, cfg.ff_dim, dtype=dtype, rngs=rngs)

    def __call__(self, x, text, temb, rope):
        mods = self.visual_modulation(temb)
        sh, sc, g = mods[0], mods[1], mods[2]
        h = (self.self_attention_norm(x) * (sc + 1.0) + sh).astype(x.dtype)
        x = x + (g * self.self_attention(h, rope=rope).astype(jnp.float32)
                 ).astype(x.dtype)
        sh, sc, g = mods[3], mods[4], mods[5]
        h = (self.cross_attention_norm(x) * (sc + 1.0) + sh).astype(x.dtype)
        x = x + (g * self.cross_attention(h, context=text).astype(jnp.float32)
                 ).astype(x.dtype)
        sh, sc, g = mods[6], mods[7], mods[8]
        h = (self.feed_forward_norm(x) * (sc + 1.0) + sh).astype(x.dtype)
        return x + (g * self.feed_forward(h).astype(jnp.float32)).astype(x.dtype)


@transformer_registry.register(
    "kandinsky5.base", aliases=("kandinsky5", "Kandinsky5Transformer3DModel"))
class Kandinsky5Transformer3DModel(nnx.Module):
    config_class = Kandinsky5Config

    def __init__(self, cfg: Kandinsky5Config, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.model_dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        visual_in = (2 * cfg.in_visual_dim + 1 if cfg.visual_cond
                     else cfg.in_visual_dim)
        # time: sinusoidal(model_dim) → Linear(time) → SiLU → Linear(time)
        self.time_in = Linear(d, cfg.time_dim, **kw)
        self.time_out = Linear(cfg.time_dim, cfg.time_dim, **kw)
        self.text_in = Linear(cfg.in_text_dim, d, **kw)
        self.text_norm = LayerNorm(d, elementwise_affine=True)
        self.pooled_in = Linear(cfg.in_text_dim2, cfg.time_dim, **kw)
        self.pooled_norm = LayerNorm(cfg.time_dim, elementwise_affine=True)
        self.visual_in = Linear(int(np.prod(cfg.patch_size)) * visual_in, d, **kw)
        self.text_transformer_blocks = nnx.List(
            [_K5EncoderBlock(cfg, dtype=dtype, rngs=rngs)
             for _ in range(cfg.num_text_blocks)])
        self.visual_transformer_blocks = nnx.List(
            [_K5DecoderBlock(cfg, dtype=dtype, rngs=rngs)
             for _ in range(cfg.num_visual_blocks)])
        self.out_modulation = _Modulation(cfg.time_dim, d, 2, dtype=dtype, rngs=rngs)
        self.out_norm = LayerNorm(d, elementwise_affine=False)
        self.out_layer = Linear(
            d, int(np.prod(cfg.patch_size)) * cfg.out_visual_dim, **kw)

    @staticmethod
    def sharding_rules(cfg: "Kandinsky5Config"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules([
            (r".*(to_query|to_key|to_value|in_layer)\.kernel", P(None, "tp")),
            (r".*(out_layer)\.kernel", P("tp", None)),
        ])

    def _visual_rope(self, t: int, h: int, w: int,
                     scale: Tuple[float, float, float] = (1.0, 1.0, 1.0)):
        cfg = self.cfg
        coords = [jnp.arange(n, dtype=jnp.float32) / s
                  for n, s in zip((t, h, w), scale)]
        parts_c, parts_s = [], []
        grids = jnp.meshgrid(*coords, indexing="ij")
        for g, ad in zip(grids, cfg.axes_dims):
            c, s = _rope_angles_1d(g.reshape(-1), ad)
            parts_c.append(c)
            parts_s.append(s)
        cos = jnp.concatenate(parts_c, axis=-1)[None, :, None, :]
        sin = jnp.concatenate(parts_s, axis=-1)[None, :, None, :]
        return cos, sin

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, C, T, H, W] → [B, N, C·pt·ph·pw] with feature order
        (pt, ph, pw, c) — K5's channel-LAST visual layout (model.py:206)."""
        pt, ph, pw = self.cfg.patch_size
        b, c, t, h, w = x.shape
        x = x.transpose(0, 2, 3, 4, 1)  # B T H W C
        x = x.reshape(b, t // pt, pt, h // ph, ph, w // pw, pw, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        return x.reshape(b, (t // pt) * (h // ph) * (w // pw), pt * ph * pw * c)

    def unpatchify(self, tok, t, h, w):
        pt, ph, pw = self.cfg.patch_size
        c = self.cfg.out_visual_dim
        b = tok.shape[0]
        x = tok.reshape(b, t // pt, h // ph, w // pw, c, pt, ph, pw)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return x.reshape(b, c, t, h, w)

    def __call__(self, x, t, context, pooled, scale_factor=(1.0, 1.0, 1.0)):
        """x [B,C,T,H,W]; t [B] (flow time · 1000 convention per engine);
        context [B,L,in_text_dim]; pooled [B,in_text_dim2]."""
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size
        half = cfg.model_dim // 2
        freqs = jnp.asarray(
            1.0 / (10000.0 ** (np.arange(half, dtype=np.float64) / half)),
            jnp.float32)
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        sincos = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        temb = self.time_out(nnx.silu(self.time_in(sincos.astype(self.dtype))))
        temb = temb.astype(jnp.float32) + self.pooled_norm(
            self.pooled_in(pooled.astype(self.dtype)))
        text = self.text_norm(self.text_in(context.astype(self.dtype))
                              ).astype(self.dtype)

        t_cos, t_sin = _rope_angles_1d(
            jnp.arange(text.shape[1], dtype=jnp.float32), cfg.head_dim)
        t_rope = (t_cos[None, :, None, :], t_sin[None, :, None, :])
        for blk in self.text_transformer_blocks:
            text = blk(text, temb, t_rope)

        tok = self.visual_in(self.patchify(x).astype(self.dtype))
        v_rope = self._visual_rope(tt // pt, hh // ph, ww // pw, scale_factor)
        for blk in self.visual_transformer_blocks:
            tok = blk(tok, text, temb, v_rope)

        sh, sc = self.out_modulation(temb)
        tok = (self.out_norm(tok) * (sc + 1.0) + sh).astype(self.dtype)
        return self.unpatchify(self.out_layer(tok).astype(jnp.float32),
                               tt, hh, ww)
