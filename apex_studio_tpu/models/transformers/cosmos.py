"""NVIDIA Cosmos (Predict2) video DiT in JAX/NNX.

Counterpart of the reference's ``src/transformer/cosmos/base/model.py:450``
(CosmosTransformer3DModel): patchified latents (+1 padding-mask channel,
+1 condition-mask channel for video2world), per-frame timesteps
([B,1,T,1,1] → per-token conditioning), adaLN-zero blocks with a shared
3·dim time embedding plus per-block LoRA-rank modulation heads, NTK-scaled
3-axis rotate-half RoPE, normalized learnable axial positional embeddings,
T5 cross-attention.
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
from apex_studio_tpu.ops.rope import apply_rope_half


@dataclasses.dataclass
class CosmosConfig:
    in_channels: int = 16
    out_channels: int = 16
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    num_layers: int = 28
    mlp_ratio: float = 4.0
    text_embed_dim: int = 1024
    adaln_lora_dim: int = 256
    max_size: Tuple[int, int, int] = (128, 240, 240)
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    rope_scale: Tuple[float, float, float] = (2.0, 1.0, 1.0)
    concat_padding_mask: bool = True
    extra_pos_embed_type: Optional[str] = "learnable"

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "CosmosConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in cfg.items() if k in known}
        return cls(**kw)


class _CosmosAttention(nnx.Module):
    def __init__(self, dim: int, kv_dim: int, heads: int, head_dim: int,
                 *, dtype, rngs):
        kw = dict(dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.to_q = Linear(dim, dim, use_bias=False, **kw)
        self.to_k = Linear(kv_dim, dim, use_bias=False, **kw)
        self.to_v = Linear(kv_dim, dim, use_bias=False, **kw)
        self.to_out = Linear(dim, dim, use_bias=False, **kw)
        self.norm_q = RMSNorm(head_dim)
        self.norm_k = RMSNorm(head_dim)
        self.heads = heads
        self.head_dim = head_dim

    def __call__(self, x, context=None, rope=None):
        b, s, d = x.shape
        kv = x if context is None else context
        q = self.to_q(x).reshape(b, s, self.heads, self.head_dim)
        k = self.to_k(kv).reshape(b, -1, self.heads, self.head_dim)
        v = self.to_v(kv).reshape(b, -1, self.heads, self.head_dim)
        q = self.norm_q(q).astype(x.dtype)
        k = self.norm_k(k).astype(x.dtype)
        if rope is not None:
            cos, sin = rope
            q = apply_rope_half(q, cos, sin)
            k = apply_rope_half(k, cos, sin)
        out = attention(q, k, v)
        return self.to_out(out.reshape(b, s, d))


class _AdaLNZero(nnx.Module):
    """LayerNorm + (SiLU→LoRA-rank→3·dim) head added to the shared temb
    (model.py:139)."""

    def __init__(self, dim: int, hidden: int, n: int, *, dtype, rngs):
        kw = dict(use_bias=False, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.linear_1 = Linear(dim, hidden, **kw)
        self.linear_2 = Linear(hidden, n * dim, **kw)
        self.norm = LayerNorm(dim, elementwise_affine=False)
        self.n = n
        self.dim = dim

    def __call__(self, x, embedded_t, temb):
        h = self.linear_2(self.linear_1(nnx.silu(embedded_t)))
        if temb is not None:
            h = h + temb[..., : self.n * self.dim]
        parts = jnp.split(h.astype(jnp.float32), self.n, axis=-1)
        normed = self.norm(x) * (1 + parts[1]) + parts[0]
        if self.n == 2:
            return normed.astype(x.dtype), None
        return normed.astype(x.dtype), parts[2]


class _CosmosBlock(nnx.Module):
    def __init__(self, cfg: CosmosConfig, *, dtype, rngs):
        d = cfg.dim
        self.norm1 = _AdaLNZero(d, cfg.adaln_lora_dim, 3, dtype=dtype, rngs=rngs)
        self.attn1 = _CosmosAttention(d, d, cfg.num_attention_heads,
                                      cfg.attention_head_dim, dtype=dtype, rngs=rngs)
        self.norm2 = _AdaLNZero(d, cfg.adaln_lora_dim, 3, dtype=dtype, rngs=rngs)
        self.attn2 = _CosmosAttention(d, cfg.text_embed_dim,
                                      cfg.num_attention_heads,
                                      cfg.attention_head_dim, dtype=dtype, rngs=rngs)
        self.norm3 = _AdaLNZero(d, cfg.adaln_lora_dim, 3, dtype=dtype, rngs=rngs)
        hid = int(d * cfg.mlp_ratio)
        kw = dict(use_bias=False, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.ff_in = Linear(d, hid, **kw)
        self.ff_out = Linear(hid, d, **kw)

    def __call__(self, x, ctx, embedded_t, temb, rope, extra_pos):
        if extra_pos is not None:
            x = x + extra_pos.astype(x.dtype)
        h, gate = self.norm1(x, embedded_t, temb)
        x = x + (gate * self.attn1(h, rope=rope).astype(jnp.float32)).astype(x.dtype)
        h, gate = self.norm2(x, embedded_t, temb)
        x = x + (gate * self.attn2(h, context=ctx).astype(jnp.float32)).astype(x.dtype)
        h, gate = self.norm3(x, embedded_t, temb)
        ff = self.ff_out(nnx.gelu(self.ff_in(h), approximate=False))
        return x + (gate * ff.astype(jnp.float32)).astype(x.dtype)


@transformer_registry.register("cosmos.base",
                               aliases=("cosmos", "cosmos2",
                                        "CosmosTransformer3DModel"))
class CosmosTransformer3DModel(nnx.Module):
    config_class = CosmosConfig

    def __init__(self, cfg: CosmosConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        in_ch = cfg.in_channels + (1 if cfg.concat_padding_mask else 0)
        self.patch_embed = Linear(
            in_ch * int(np.prod(cfg.patch_size)), d, use_bias=False, **kw)
        # time: sinusoidal(dim) → Linear → SiLU → Linear(3·dim); RMSNorm'd
        # sinusoid is the per-block "embedded timestep"
        self.t_linear_1 = Linear(d, d, use_bias=False, **kw)
        self.t_linear_2 = Linear(d, 3 * d, use_bias=False, **kw)
        self.t_norm = RMSNorm(d)
        if cfg.extra_pos_embed_type == "learnable":
            g = [s // p for s, p in zip(cfg.max_size, cfg.patch_size)]
            self.pos_emb_t = nnx.Param(jnp.zeros((g[0], d), jnp.float32))
            self.pos_emb_h = nnx.Param(jnp.zeros((g[1], d), jnp.float32))
            self.pos_emb_w = nnx.Param(jnp.zeros((g[2], d), jnp.float32))
        else:
            self.pos_emb_t = None
        self.transformer_blocks = nnx.List(
            [_CosmosBlock(cfg, dtype=dtype, rngs=rngs)
             for _ in range(cfg.num_layers)])
        self.norm_out = _AdaLNZero(d, cfg.adaln_lora_dim, 2, dtype=dtype, rngs=rngs)
        self.proj_out = Linear(d, int(np.prod(cfg.patch_size)) * cfg.out_channels,
                               use_bias=False, **kw)

    @staticmethod
    def sharding_rules(cfg: "CosmosConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules([
            (r".*(to_q|to_k|to_v|ff_in)\.kernel", P(None, "tp")),
            (r".*(to_out|ff_out)\.kernel", P("tp", None)),
        ])

    def _rope(self, t: int, h: int, w: int, fps: Optional[float]):
        cfg = self.cfg
        hd = cfg.attention_head_dim
        dim_h = hd // 6 * 2
        dim_w = hd // 6 * 2
        dim_t = hd - dim_h - dim_w
        ntk = [s ** (d_ / (d_ - 2)) for s, d_ in
               zip(cfg.rope_scale, (dim_t, dim_h, dim_w))]
        t_pos = np.arange(t, dtype=np.float64)
        if fps is not None:
            t_pos = t_pos / fps * 24.0
        axes = []
        for pos, d_, nf in ((t_pos, dim_t, ntk[0]),
                            (np.arange(h, dtype=np.float64), dim_h, ntk[1]),
                            (np.arange(w, dtype=np.float64), dim_w, ntk[2])):
            freqs = 1.0 / ((10000.0 * nf) ** (np.arange(0, d_, 2)[: d_ // 2] / d_))
            axes.append(np.outer(pos, freqs))
        et = np.broadcast_to(axes[0][:, None, None, :], (t, h, w, dim_t // 2))
        eh = np.broadcast_to(axes[1][None, :, None, :], (t, h, w, dim_h // 2))
        ew = np.broadcast_to(axes[2][None, None, :, :], (t, h, w, dim_w // 2))
        freqs = np.concatenate([et, eh, ew], axis=-1).reshape(1, -1, 1, hd // 2)
        return (jnp.asarray(np.cos(freqs), jnp.float32),
                jnp.asarray(np.sin(freqs), jnp.float32))

    def _extra_pos(self, t: int, h: int, w: int):
        if self.pos_emb_t is None:
            return None
        emb = (self.pos_emb_t.value[:t, None, None]
               + self.pos_emb_h.value[None, :h, None]
               + self.pos_emb_w.value[None, None, :w]).reshape(1, -1, self.cfg.dim)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        norm = 1e-6 + norm * math.sqrt(1.0 / self.cfg.dim)
        return emb / norm

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        pt, ph, pw = self.cfg.patch_size
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, -1, c * pt * ph * pw)

    def unpatchify(self, tok, t, h, w):
        # out features ordered (ph, pw, pt, c) — model.py:663 permutation
        pt, ph, pw = self.cfg.patch_size
        c = self.cfg.out_channels
        b = tok.shape[0]
        x = tok.reshape(b, t // pt, h // ph, w // pw, ph, pw, pt, c)
        x = x.transpose(0, 7, 1, 6, 2, 4, 3, 5)
        return x.reshape(b, c, t, h, w)

    def __call__(self, x, t, context, fps: Optional[float] = None,
                 condition_mask: Optional[jnp.ndarray] = None,
                 padding_mask: Optional[jnp.ndarray] = None):
        """x: (B, C, T, H, W); t: (B,) or (B, T) per-frame flow times in
        [0, 1]; condition_mask: (B, 1, T, H, W) extra channel (video2world)."""
        cfg = self.cfg
        if condition_mask is not None:
            x = jnp.concatenate([x, condition_mask.astype(x.dtype)], axis=1)
        if cfg.concat_padding_mask:
            b_, _, t_, h_, w_ = x.shape
            pad = (jnp.zeros((b_, 1, t_, h_, w_), x.dtype)
                   if padding_mask is None
                   else jnp.broadcast_to(padding_mask.astype(x.dtype),
                                         (b_, 1, t_, h_, w_)))
            x = jnp.concatenate([x, pad], axis=1)
        b, c, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size
        gt, gh, gw = tt // pt, hh // ph, ww // pw

        tok = self.patch_embed(self.patchify(x).astype(self.dtype))
        rope = self._rope(gt, gh, gw, fps)
        extra = self._extra_pos(gt, gh, gw)

        per_frame = t.ndim == 2
        half = cfg.dim // 2
        freqs = jnp.asarray(np.exp(
            -math.log(10000.0) * np.arange(half, dtype=np.float64) / half),
            jnp.float32)
        args = t.reshape(-1).astype(jnp.float32)[:, None] * freqs[None]
        sincos = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        temb = self.t_linear_2(nnx.silu(self.t_linear_1(sincos.astype(self.dtype))))
        embedded_t = self.t_norm(sincos).astype(self.dtype)
        if per_frame:
            hw = gh * gw
            temb = jnp.repeat(temb.reshape(b, gt, -1), hw, axis=1)
            embedded_t = jnp.repeat(embedded_t.reshape(b, gt, -1), hw, axis=1)
        else:
            temb = temb[:, None]
            embedded_t = embedded_t[:, None]

        ctx = context.astype(self.dtype)
        for blk in self.transformer_blocks:
            tok = blk(tok, ctx, embedded_t, temb, rope, extra)
        tok, _ = self.norm_out(tok, embedded_t, temb)
        out = self.proj_out(tok).astype(jnp.float32)
        return self.unpatchify(out, tt, hh, ww)
