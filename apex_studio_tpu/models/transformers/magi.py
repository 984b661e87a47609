"""MAGI-1 autoregressive video DiT in JAX/NNX.

Counterpart of the reference's ``src/transformer/magi/base/model.py:53``
(MagiTransformer3DModel) + ``module.py`` (blocks) + ``attention.py``
(processors), rebuilt batch-first for TPU:

- **Per-chunk conditioning**: the sequence is R equal chunks of L tokens; each
  chunk carries its own timestep. Reference routes gates through a
  token→condition ``condition_map`` (triton range_mod, module.py:274); here
  gates are applied by a [B, R, L, D] reshape — equivalent because chunks are
  contiguous and equal length, and it keeps the op a pure broadcast multiply
  XLA fuses into the residual add.
- **Block-causal attention** over chunks (chunk i attends to chunks ≤ i,
  prefix chunks are clean context): the reference packs varlen kv_ranges for
  flash-attn; on TPU a static additive chunk mask feeds the standard
  attention kernels (static shapes, no varlen).
- **Parallel self+cross attention** (block layout per module.py:765): both
  read norm1(x); outputs are concatenated, TP8-interleaved
  ("sq b (n hn hd) -> sq b (hn n hd)", n=2, hn=8 — a checkpoint layout fact),
  then projected with a single fused Linear.
- **GQA**: kv heads = num_query_groups, q/k head-dim LayerNorms with
  zero-centered gamma (converter adds 1.0 so plain LayerNorm weights load).
- **Learnable RoPE**: one learned frequency-band vector (dim//8) shared by
  the t/h/w axes (module.py:699 LearnableRotaryEmbeddingCat); rotates the
  first 6·dim//8 dims of each head, rest pass through.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops.attention import attention as attention_op


@dataclasses.dataclass
class MagiConfig:
    num_layers: int = 34
    num_attention_heads: int = 24
    attention_head_dim: int = 128
    ffn_dim: int = 12288
    num_query_groups: int = 8
    in_channels: int = 32
    out_channels: int = 32
    patch_size: int = 2
    t_patch_size: int = 1
    caption_channels: int = 4096
    caption_max_length: int = 800
    cond_hidden_ratio: float = 0.25
    xattn_cond_hidden_ratio: float = 1.0
    cond_gating_ratio: float = 1.0
    gate_num_chunks: int = 2
    frequency_embedding_size: int = 256
    x_rescale_factor: float = 1.0
    half_channel_vae: bool = False
    gated_linear_unit: bool = False
    eps: float = 1e-6

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_query_groups * self.attention_head_dim

    @property
    def cond_dim(self) -> int:
        return int(self.dim * self.cond_hidden_ratio)

    @classmethod
    def from_dict(cls, cfg: dict) -> "MagiConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


def _sinusoidal(t: jnp.ndarray, dim: int, rescale: float = 1000.0) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None] * rescale
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def softcap(x: jnp.ndarray, cap: float = 1.0) -> jnp.ndarray:
    return cap * jnp.tanh(x.astype(jnp.float32) / cap)


class ZeroCenteredLN(nnx.Module):
    """LayerNorm whose learned gamma is stored zero-centered in checkpoints
    (FusedLayerNorm(zero_centered_gamma=True), module.py:388). The converter
    adds 1.0 on load, so at runtime this is a plain affine LayerNorm."""

    def __init__(self, dim: int, eps: float = 1e-6):
        self.norm = LayerNorm(dim, eps=eps)

    def __call__(self, x):
        return self.norm(x)


class MagiRope(nnx.Module):
    """Learnable shared frequency bands over (t, h, w)."""

    def __init__(self, head_dim: int):
        nb = head_dim // 8
        bands = 1.0 / (10000.0 ** (np.arange(nb, dtype=np.float32) / nb))
        self.bands = nnx.Param(jnp.asarray(bands))
        self.head_dim = head_dim

    def tables(self, t_tok: int, h_tok: int, w_tok: int,
               t_offset: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (sin, cos), each (T·H·W, 3·nb).

        Coordinates follow the reference exactly (module.py:614-637 +
        model.py:277): spatial axes are CENTERED (± (n−1)/2) then
        endpoint-rescaled to the 16×16 reference grid by (n/rf − 1)/(n − 1)
        with rf = sqrt(H·W/256); time positions are plain indices (the AR
        prefix cut `rope[-(T·H·W):]` ≡ our t_offset)."""
        rescale = math.sqrt((h_tok * w_tok) / (16.0 * 16.0))

        def centered(n: int) -> jnp.ndarray:
            x = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
            if n > 1:
                x = x * ((n / rescale - 1.0) / (n - 1.0))
            return x

        tpos = jnp.arange(t_offset, t_offset + t_tok, dtype=jnp.float32)
        hpos = centered(h_tok)
        wpos = centered(w_tok)
        bands = self.bands.value
        grids = jnp.stack(jnp.meshgrid(tpos, hpos, wpos, indexing="ij"),
                          axis=-1).reshape(-1, 3)
        ang = grids[:, :, None] * bands[None, None, :]  # (N, 3, nb)
        ang = ang.reshape(ang.shape[0], -1)
        return jnp.sin(ang), jnp.cos(ang)


def apply_partial_rope(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """Rotate the first 2·rot dims of each head (flash-attn partial-rotary
    convention used by the reference processors). x: (B, S, H, D)."""
    rot = sin.shape[-1]
    x1 = x[..., :rot]
    x2 = x[..., rot: 2 * rot]
    s = sin[None, :, None, :]
    c = cos[None, :, None, :]
    return jnp.concatenate(
        [x1 * c - x2 * s, x1 * s + x2 * c, x[..., 2 * rot:]], axis=-1)


class MagiBlock(nnx.Module):
    def __init__(self, cfg: MagiConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d, kv = cfg.dim, cfg.kv_dim
        hd = cfg.attention_head_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        nb = dict(use_bias=False, **kw)
        self.adaln_proj = Linear(
            cfg.cond_dim, int(d * cfg.cond_gating_ratio * cfg.gate_num_chunks),
            use_bias=True, **kw)
        self.norm1 = LayerNorm(d, eps=cfg.eps)
        # self attention (GQA)
        self.self_q = Linear(d, d, **nb)
        self.self_k = Linear(d, kv, **nb)
        self.self_v = Linear(d, kv, **nb)
        self.self_norm_q = ZeroCenteredLN(hd, eps=cfg.eps)
        self.self_norm_k = ZeroCenteredLN(hd, eps=cfg.eps)
        # cross attention (fused kv from caption features)
        xdim = int(d * cfg.xattn_cond_hidden_ratio)
        self.cross_q = Linear(d, d, **nb)
        self.cross_kv = Linear(xdim, kv * 2, **nb)
        self.cross_norm_q = ZeroCenteredLN(hd, eps=cfg.eps)
        self.cross_norm_k = ZeroCenteredLN(hd, eps=cfg.eps)
        self.proj = Linear(2 * d, d, **nb)
        self.norm2 = ZeroCenteredLN(d, eps=cfg.eps)
        self.ffn_norm = LayerNorm(d, eps=cfg.eps)
        self.ffn_proj1 = Linear(
            d, 2 * cfg.ffn_dim if cfg.gated_linear_unit else cfg.ffn_dim, **nb)
        self.ffn_proj2 = Linear(cfg.ffn_dim, d, **nb)
        self.norm3 = ZeroCenteredLN(d, eps=cfg.eps)
        self.cfg = cfg

    def _heads(self, x, n):
        b, s, _ = x.shape
        return x.reshape(b, s, n, self.cfg.attention_head_dim)

    def __call__(self, x, y_xattn, y_mask, condition, rope_sin, rope_cos, chunk_mask):
        """x: (B, R·L, D); y_xattn: (B, R, Ly, xdim); y_mask: (B, R, Ly) bool;
        condition: (B, R, cond_dim); chunk_mask: additive (R·L, R·L) or None."""
        cfg = self.cfg
        b, s, d = x.shape
        r = condition.shape[1]
        l = s // r
        heads, groups = cfg.num_attention_heads, cfg.num_query_groups
        residual = x
        nx = self.norm1(x).astype(x.dtype)

        # -- self attention --------------------------------------------------
        q = self.self_norm_q(self._heads(self.self_q(nx), heads))
        k = self.self_norm_k(self._heads(self.self_k(nx), groups))
        v = self._heads(self.self_v(nx), groups)
        q = apply_partial_rope(q.astype(jnp.float32), rope_sin, rope_cos)
        k = apply_partial_rope(k.astype(jnp.float32), rope_sin, rope_cos)
        rep = heads // groups
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        bias = None if chunk_mask is None else chunk_mask[None, None]
        attn = attention_op(q.astype(x.dtype), k.astype(x.dtype), v, bias=bias)
        attn = attn.reshape(b, s, d)

        # -- cross attention (per chunk) --------------------------------------
        cq = self.cross_norm_q(self._heads(self.cross_q(nx), heads))
        kv = self.cross_kv(y_xattn.reshape(b * r, -1, y_xattn.shape[-1]))
        # to_kv rows are PER-HEAD interleaved [k_h|v_h] pairs (the reference
        # views the projection as [total, hn, 2*hd] then splits the last dim —
        # attention.py:419), not [all-k | all-v]
        hd = kv.shape[-1] // (2 * groups)
        kv = kv.reshape(*kv.shape[:2], groups, 2, hd)
        ck, cv = kv[..., 0, :], kv[..., 1, :]
        ck = self.cross_norm_k(ck)
        cq = cq.reshape(b * r, l, heads, -1)
        ck = jnp.repeat(ck, rep, axis=2)
        cv = jnp.repeat(cv, rep, axis=2)
        xattn = attention_op(cq, ck.astype(cq.dtype), cv.astype(cq.dtype),
                             mask=y_mask.reshape(b * r, -1))
        xattn = xattn.reshape(b, s, d)

        # TP8 interleave before the fused projection (checkpoint layout:
        # "sq b (n hn hd) -> sq b (hn n hd)", n=2, hn=8)
        hn = 8
        cat = jnp.stack([attn, xattn], axis=2)          # (B, S, 2, D)
        cat = cat.reshape(b, s, 2, hn, d // hn)
        cat = cat.transpose(0, 1, 3, 2, 4).reshape(b, s, 2 * d)
        h = self.proj(cat.astype(x.dtype)).astype(jnp.float32)

        gates = softcap(self.adaln_proj(nnx.silu(condition.astype(x.dtype))), 1.0)
        gate_msa, gate_mlp = jnp.split(gates, 2, axis=-1)  # (B, R, D) each

        def gated_residual(val, res, gate, post_norm):
            val = val.reshape(b, r, l, d) * gate[:, :, None, :]
            return post_norm(val.reshape(b, s, d)) + res.astype(jnp.float32)

        x = gated_residual(h, residual, gate_msa, self.norm2).astype(residual.dtype)

        residual = x
        h = self.ffn_proj1(self.ffn_norm(x).astype(x.dtype))
        if cfg.gated_linear_unit:
            a, g = jnp.split(h, 2, axis=-1)
            h = nnx.silu(a) * g
        else:
            h = nnx.gelu(h, approximate=False)
        h = self.ffn_proj2(h).astype(jnp.float32)
        x = gated_residual(h, residual, gate_mlp, self.norm3).astype(residual.dtype)
        return x


@transformer_registry.register("magi.base", aliases=("magi", "MagiTransformer3DModel"))
class MagiTransformer3DModel(nnx.Module):
    config_class = MagiConfig

    def __init__(self, cfg: MagiConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch_dim = cfg.in_channels * cfg.t_patch_size * cfg.patch_size ** 2
        self.patch_embedding = Linear(patch_dim, d, use_bias=False, **kw)
        self.t_mlp1 = Linear(cfg.frequency_embedding_size, cfg.cond_dim,
                             use_bias=True, **kw)
        self.t_mlp2 = Linear(cfg.cond_dim, cfg.cond_dim, use_bias=True, **kw)
        self.y_proj_xattn = Linear(cfg.caption_channels,
                                   int(d * cfg.xattn_cond_hidden_ratio),
                                   use_bias=True, **kw)
        self.y_proj_adaln = Linear(cfg.caption_channels, cfg.cond_dim,
                                   use_bias=True, **kw)
        self.null_caption_embedding = nnx.Param(
            jnp.zeros((cfg.caption_max_length, cfg.caption_channels), jnp.float32))
        self.rope = MagiRope(cfg.attention_head_dim)
        self.blocks = nnx.List([MagiBlock(cfg, **kw) for _ in range(cfg.num_layers)])
        self.norm_out = ZeroCenteredLN(d, eps=cfg.eps)
        self.proj_out = Linear(
            d, cfg.patch_size ** 2 * cfg.t_patch_size * cfg.out_channels,
            use_bias=False, **kw)

    @staticmethod
    def sharding_rules(cfg: "MagiConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules([
            (r".*(self_q|self_k|self_v|cross_q|cross_kv|ffn_proj1)\.kernel", P(None, "tp")),
            (r".*(proj|ffn_proj2)\.kernel", P("tp", None)),
        ])

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        pt, p = self.cfg.t_patch_size, self.cfg.patch_size
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t // pt, pt, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // p) * (w // p), c * pt * p * p)

    def unpatchify(self, tok: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
        """proj_out features are checkpoint-ordered [pt, ph, pw, C] — channel
        FASTEST (reference model.py:208 rearrange `(pT pH pW C)`); the input
        side stays conv-ordered (Conv3d patch_embedding)."""
        pt, p = self.cfg.t_patch_size, self.cfg.patch_size
        c = self.cfg.out_channels
        b = tok.shape[0]
        x = tok.reshape(b, t // pt, h // p, w // p, pt, p, p, c)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, c, t, h, w)

    @staticmethod
    def chunk_causal_mask(r: int, tokens_per_chunk: int,
                          clean_chunks: int = 0) -> jnp.ndarray:
        """Additive (S, S) mask: chunk i attends to chunks ≤ i. The first
        ``clean_chunks`` chunks are clean context (still causal among
        themselves — matching kv_range semantics, denoise.py:722)."""
        ci = np.repeat(np.arange(r), tokens_per_chunk)
        allow = ci[:, None] >= ci[None, :]
        return jnp.asarray(np.where(allow, 0.0, -1e30), jnp.float32)

    def __call__(
        self,
        x: jnp.ndarray,                # (B, C, T, H, W) latents (R chunks in T)
        timestep: jnp.ndarray,         # (B, R) per-chunk timesteps in [0, 1]
        y: jnp.ndarray,                # (B, R, Ly, caption_channels)
        y_mask: Optional[jnp.ndarray] = None,   # (B, R, Ly) bool
        caption_dropout: bool = False,           # use the null caption
        t_chunk_offset: int = 0,                 # rope offset (clean prefix)
        block_causal: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        r = timestep.shape[1]
        x = x * cfg.x_rescale_factor
        if cfg.half_channel_vae:
            x = jnp.concatenate([x, x], axis=1)
        tok = self.patch_embedding(self.patchify(x).astype(self.dtype))
        t_tok = tt // cfg.t_patch_size
        h_tok, w_tok = hh // cfg.patch_size, ww // cfg.patch_size
        sin, cos = self.rope.tables(t_tok, h_tok, w_tok,
                                    t_offset=t_chunk_offset * (t_tok // r))

        t_freq = _sinusoidal(timestep.reshape(-1), cfg.frequency_embedding_size)
        temb = self.t_mlp2(nnx.silu(self.t_mlp1(t_freq.astype(self.dtype))))
        temb = temb.reshape(b, r, -1)

        # At inference the xattn path always reads the caption passed in (the
        # engine supplies the negative prompt for the uncond branches), while
        # the adaLN condition reads one of two learned single tokens —
        # null_caption_embedding[-2] (kept) / [-1] (dropped). This mirrors
        # CaptionEmbedder.caption_drop_single_token (module.py:163) with
        # train=False, which is the only path the reference inference hits.
        tok_idx = -1 if caption_dropout else -2
        y_adaln = self.y_proj_adaln(
            jnp.broadcast_to(self.null_caption_embedding.value[tok_idx],
                             (b, cfg.caption_channels)).astype(self.dtype))
        y_xattn = nnx.silu(self.y_proj_xattn(y.astype(self.dtype)))
        condition = temb + y_adaln[:, None, :]

        if y_mask is None:
            y_mask = jnp.ones(y.shape[:3], bool)
        seq = tok.shape[1]
        mask = (self.chunk_causal_mask(r, seq // r) if (block_causal and r > 1)
                else None)
        for blk in self.blocks:
            tok = blk(tok, y_xattn, y_mask, condition, sin, cos, mask)

        out = self.proj_out(self.norm_out(tok.astype(jnp.float32)).astype(self.dtype))
        out = self.unpatchify(out.astype(jnp.float32), tt, hh, ww)
        if cfg.half_channel_vae:
            out = out[:, : cfg.out_channels // 2]
        return out / cfg.x_rescale_factor
