"""LongCat-Video DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/longcat/base/model.py:171`` (LongCatVideoTransformer3DModel):
a 48-deep single-stream DiT at hidden 4096 (32 heads x 128) over Wan-VAE
latents — fused-QKV self-attention with interleaved-pair 3-axis RoPE whose
per-axis dims derive from the head dim (rope_3d.py:85: dim_t = D − 4·(D//6),
dim_h = dim_w = 2·(D//6)), text cross-attention (T5/UMT5 features through a
2-layer GELU caption embedder), and *per-frame* AdaLN modulation — the
timestep may differ per latent frame (t=0 on conditioning frames,
model.py:422), so every 6-way modulation is [B, T, 1, C].

Conditioning modes re-created TPU-style with static shapes:
- ``num_cond_latents > 0`` (i2v / video-continuation, attention.py:146):
  conditioning frames attend only among themselves, noise frames attend to
  everything — two fixed-shape attention calls instead of a dynamic mask;
  cross-attention output is zeroed on the conditioning span (attention.py:300).
- ``kv_cache`` (long-video, attention.py:170): per-block pre-RoPE K/V of the
  clean context are cached once (``return_kv=True`` with t=0 and
  ``skip_crs_attn``); later segments rope the concatenated K over the full
  (T_ctx + T) grid and the query over its tail slice.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class LongCatConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 4096
    depth: int = 48
    num_heads: int = 32
    caption_channels: int = 4096
    mlp_ratio: float = 4.0
    adaln_tembed_dim: int = 512
    frequency_embedding_size: int = 256
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_tokens_zero_pad: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rope_dims(self) -> Tuple[int, int, int]:
        hd = self.head_dim
        d_hw = 2 * (hd // 6)
        return (hd - 2 * d_hw, d_hw, d_hw)

    @classmethod
    def from_dict(cls, cfg: dict) -> "LongCatConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "patch_size" in kw:
            kw["patch_size"] = tuple(kw["patch_size"])
        return cls(**kw)


class LongCatBlock(nnx.Module):
    def __init__(self, cfg: LongCatConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.hidden_size
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.adaLN_linear = Linear(cfg.adaln_tembed_dim, 6 * d, **kw)
        self.pre_crs_attn_norm = LayerNorm(d, eps=1e-6, rngs=rngs)
        self.qkv = Linear(d, 3 * d, **kw)
        self.q_norm = RMSNorm(cfg.head_dim, eps=1e-6, rngs=rngs)
        self.k_norm = RMSNorm(cfg.head_dim, eps=1e-6, rngs=rngs)
        self.proj = Linear(d, d, **kw)
        self.q_linear = Linear(d, d, **kw)
        self.kv_linear = Linear(d, 2 * d, **kw)
        self.cross_proj = Linear(d, d, **kw)
        self.cross_q_norm = RMSNorm(cfg.head_dim, eps=1e-6, rngs=rngs)
        self.cross_k_norm = RMSNorm(cfg.head_dim, eps=1e-6, rngs=rngs)
        # FeedForwardSwiGLU (blocks.py:17): w2(silu(w1 x) * w3 x), no bias;
        # hidden = 256·ceil(2/3·(dim·mlp_ratio)/256) (llama sizing rule)
        hidden = int(2 * (d * cfg.mlp_ratio) / 3)
        hidden = 256 * ((hidden + 255) // 256)
        self.ffn_w1 = Linear(d, hidden, use_bias=False, dtype=dtype,
                             param_dtype=param_dtype, rngs=rngs)
        self.ffn_w2 = Linear(hidden, d, use_bias=False, dtype=dtype,
                             param_dtype=param_dtype, rngs=rngs)
        self.ffn_w3 = Linear(d, hidden, use_bias=False, dtype=dtype,
                             param_dtype=param_dtype, rngs=rngs)
        self.heads = cfg.num_heads
        self.head_dim = cfg.head_dim

    def _mods(self, temb):
        # temb [B, T, C_t] → six [B, T, 1, C] per-frame modulations, f32
        out = self.adaLN_linear(nnx.silu(temb.astype(jnp.float32)))
        return jnp.split(out[:, :, None, :], 6, axis=-1)

    def _heads(self, x, proj, n):
        b, s, _ = x.shape
        return proj(x).reshape(b, s, n, self.heads, self.head_dim)

    def _modulate(self, x, T, shift, scale):
        b, n, c = x.shape
        xf = layer_norm(x.reshape(b, T, n // T, c).astype(jnp.float32), eps=1e-6)
        return ((xf * (1 + scale) + shift).reshape(b, n, c)).astype(x.dtype)

    def _gate(self, x, delta, T, gate):
        b, n, c = x.shape
        out = (x.astype(jnp.float32).reshape(b, T, n // T, c)
               + gate * delta.astype(jnp.float32).reshape(b, T, n // T, c))
        return out.reshape(b, n, c).astype(x.dtype)

    def self_attention(self, x_m, rope, n_cond_tok, kv_cache, return_kv):
        b, n, c = x_m.shape
        qkv = self.qkv(x_m).reshape(b, n, 3, self.heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k = self.q_norm(q), self.k_norm(k)
        new_kv = (k, v) if return_kv else None
        cos, sin = rope
        if kv_cache is not None:
            k_full = jnp.concatenate([kv_cache[0].astype(k.dtype), k], axis=1)
            v_full = jnp.concatenate([kv_cache[1].astype(v.dtype), v], axis=1)
            # rope over the full (ctx + new) grid; q takes the tail slice
            k_full = apply_rope(k_full, cos, sin)
            q = apply_rope(q, cos[:, -n:], sin[:, -n:])
            out = attention_op(q, k_full, v_full).reshape(b, n, c)
        else:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            if n_cond_tok > 0:
                # conditioning tokens see only themselves; noise sees all
                out_c = attention_op(q[:, :n_cond_tok], k[:, :n_cond_tok],
                                     v[:, :n_cond_tok])
                out_n = attention_op(q[:, n_cond_tok:], k, v)
                out = jnp.concatenate([out_c, out_n], axis=1).reshape(b, n, c)
            else:
                out = attention_op(q, k, v).reshape(b, n, c)
        return self.proj(out), new_kv

    def cross_attention(self, x, text, text_mask, n_cond_tok):
        b, n, c = x.shape
        xq = x if n_cond_tok == 0 else x[:, n_cond_tok:]
        q = self.cross_q_norm(
            self.q_linear(xq).reshape(b, xq.shape[1], self.heads, self.head_dim))
        kv = self.kv_linear(text).reshape(b, text.shape[1], 2, self.heads,
                                          self.head_dim)
        k = self.cross_k_norm(kv[:, :, 0])
        v = kv[:, :, 1]
        mask = None
        if text_mask is not None:
            mask = text_mask.astype(bool)
        out = self.cross_proj(
            attention_op(q, k, v, mask=mask).reshape(b, xq.shape[1], c))
        if n_cond_tok > 0:
            out = jnp.concatenate(
                [jnp.zeros((b, n_cond_tok, c), out.dtype), out], axis=1)
        return out

    def __call__(self, x, text, temb, text_mask, T, rope, n_cond_tok=0,
                 return_kv=False, kv_cache=None, skip_crs_attn=False):
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = self._mods(temb)
        x_m = self._modulate(x, T, sh_a, sc_a)
        attn, new_kv = self.self_attention(x_m, rope, n_cond_tok, kv_cache,
                                           return_kv)
        x = self._gate(x, attn, T, g_a)
        if not skip_crs_attn:
            x = x + self.cross_attention(self.pre_crs_attn_norm(x), text,
                                         text_mask, n_cond_tok)
        x_m = self._modulate(x, T, sh_m, sc_m)
        ffn = self.ffn_w2(nnx.silu(self.ffn_w1(x_m)) * self.ffn_w3(x_m))
        x = self._gate(x, ffn, T, g_m)
        return (x, new_kv) if return_kv else x


@transformer_registry.register(
    "longcat.base", aliases=("longcat", "LongCatVideoTransformer3DModel")
)
class LongCatVideoTransformer3DModel(nnx.Module):
    config_class = LongCatConfig

    def __init__(self, cfg: LongCatConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.hidden_size
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        pt, ph, pw = cfg.patch_size
        self.x_embedder = Linear(cfg.in_channels * pt * ph * pw, d, **kw)
        self.t_linear_1 = Linear(cfg.frequency_embedding_size,
                                 cfg.adaln_tembed_dim, **kw)
        self.t_linear_2 = Linear(cfg.adaln_tembed_dim, cfg.adaln_tembed_dim, **kw)
        self.y_linear_1 = Linear(cfg.caption_channels, d, **kw)
        self.y_linear_2 = Linear(d, d, **kw)
        self.blocks = nnx.List(
            [LongCatBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.depth)]
        )
        self.final_adaLN_linear = Linear(cfg.adaln_tembed_dim, 2 * d, **kw)
        self.final_linear = Linear(d, pt * ph * pw * cfg.out_channels, **kw)

    @staticmethod
    def sharding_rules(cfg: "LongCatConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(qkv|q_linear|kv_linear|ffn_w1|ffn_w3)\.kernel", P(None, "tp")),
                (r"(proj|cross_proj|ffn_w2)\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c, t, h, w = x.shape
        pt, ph, pw = self.cfg.patch_size
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // ph) * (w // pw), c * pt * ph * pw)

    def unpatchify(self, tokens: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
        """final_linear features are checkpoint-ordered [pt, ph, pw, C] —
        channel FASTEST (reference model.py:533 rearrange
        `(T_p H_p W_p C_out)`); the input side stays conv-ordered [C, pt, ph,
        pw]. Validated in tests/test_parity_longcat_dit.py."""
        b = tokens.shape[0]
        pt, ph, pw = self.cfg.patch_size
        c = self.cfg.out_channels
        x = tokens.reshape(b, t // pt, h // ph, w // pw, pt, ph, pw, c)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, c, t, h, w)

    def rope_tables(self, t_tok: int, h_tok: int, w_tok: int):
        ids = np.stack(
            np.meshgrid(np.arange(t_tok), np.arange(h_tok), np.arange(w_tok),
                        indexing="ij"), axis=-1).reshape(1, -1, 3)
        cos, sin = precompute_axial_freqs(ids, self.cfg.rope_dims, 10000.0)
        return cos[:, :, None, :], sin[:, :, None, :]

    def __call__(
        self,
        x: jnp.ndarray,                 # [B, C, T, H, W] latents
        t: jnp.ndarray,                 # [B] or [B, T_tok] timestep (0..1000)
        text: jnp.ndarray,              # [B, L, caption_channels]
        text_mask: Optional[jnp.ndarray] = None,
        num_cond_latents: int = 0,
        return_kv: bool = False,
        kv_cache: Optional[Sequence] = None,
        skip_crs_attn: bool = False,
        num_ctx_latents: int = 0,       # latent frames already in kv_cache
    ):
        cfg = self.cfg
        b, _, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size
        n_t, n_h, n_w = tt // pt, hh // ph, ww // pw

        if t.ndim == 1:
            t = jnp.broadcast_to(t[:, None], (b, n_t))
        t_freq = timestep_embedding(
            t.reshape(-1).astype(jnp.float32), cfg.frequency_embedding_size,
            flip_sin_to_cos=True)
        temb = self.t_linear_2(nnx.silu(self.t_linear_1(
            t_freq.astype(jnp.float32)))).reshape(b, n_t, -1)

        tokens = self.x_embedder(self.patchify(x).astype(self.dtype))
        y = self.y_linear_2(nnx.gelu(self.y_linear_1(text.astype(self.dtype)),
                                     approximate=True))
        if cfg.text_tokens_zero_pad and text_mask is not None:
            y = y * text_mask[..., None].astype(y.dtype)
            text_mask = jnp.ones_like(text_mask)

        rope = self.rope_tables(n_t + num_ctx_latents, n_h, n_w)
        n_cond_tok = num_cond_latents * n_h * n_w

        caches = []
        for i, blk in enumerate(self.blocks):
            out = blk(tokens, y, temb, text_mask, n_t, rope,
                      n_cond_tok=n_cond_tok, return_kv=return_kv,
                      kv_cache=None if kv_cache is None else kv_cache[i],
                      skip_crs_attn=skip_crs_attn)
            if return_kv:
                tokens, kv = out
                caches.append(kv)
            else:
                tokens = out

        shift, scale = jnp.split(
            self.final_adaLN_linear(nnx.silu(temb.astype(jnp.float32)))[:, :, None, :],
            2, axis=-1)
        n = tokens.shape[1]
        xf = layer_norm(tokens.reshape(b, n_t, n // n_t, -1).astype(jnp.float32),
                        eps=1e-6)
        xf = (xf * (1 + scale) + shift).reshape(b, n, -1)
        out = self.final_linear(xf.astype(self.dtype))
        out = self.unpatchify(out, tt, hh, ww).astype(jnp.float32)
        return (out, caches) if return_kv else out
