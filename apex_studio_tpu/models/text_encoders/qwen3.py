"""Qwen3 causal-LM text encoder in JAX/NNX.

ZImage conditions on Qwen3-4B hidden states (manifest: ``base:
Qwen3ForCausalLM``; the engine takes ``hidden_states[-2]`` — the last decoder
layer's output *before* the final norm, engine/zimage/shared.py:141). This is
a decoder-only GQA transformer with per-head q/k RMSNorm, rotate-half RoPE and
SwiGLU MLPs. Run as an encoder: one jitted forward, no KV cache needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear, RMSNorm, SwiGLU
from apex_studio_tpu.models.registry import text_encoder_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.rope import apply_rope_half


@dataclasses.dataclass
class Qwen3Config:
    vocab_size: int = 151936
    hidden_size: int = 2560
    intermediate_size: int = 9728
    num_hidden_layers: int = 36
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    attention_bias: bool = False

    @classmethod
    def from_dict(cls, cfg: dict) -> "Qwen3Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


class Qwen3Attention(nnx.Module):
    def __init__(self, cfg: Qwen3Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        h, kv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        kw = dict(use_bias=cfg.attention_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_proj = Linear(cfg.hidden_size, h * d, **kw)
        self.k_proj = Linear(cfg.hidden_size, kv * d, **kw)
        self.v_proj = Linear(cfg.hidden_size, kv * d, **kw)
        self.o_proj = Linear(h * d, cfg.hidden_size, use_bias=False,
                             dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_norm = RMSNorm(d, eps=cfg.rms_norm_eps, rngs=rngs)
        self.k_norm = RMSNorm(d, eps=cfg.rms_norm_eps, rngs=rngs)
        self.heads, self.kv_heads, self.head_dim = h, kv, d

    def __call__(self, x, cos, sin, mask):
        b, s, _ = x.shape
        q = self.q_norm(self.q_proj(x).reshape(b, s, self.heads, self.head_dim))
        k = self.k_norm(self.k_proj(x).reshape(b, s, self.kv_heads, self.head_dim))
        v = self.v_proj(x).reshape(b, s, self.kv_heads, self.head_dim)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        rep = self.heads // self.kv_heads
        if rep > 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = attention_op(q, k, v, mask=mask, is_causal=mask is None)
        return self.o_proj(out.reshape(b, s, -1))

    def step(self, x, cos, sin, cache_k, cache_v, pos):
        """One-token decode: write this position's (pre-repeat) K/V into the
        fixed-size cache at ``pos`` and attend the single query over it.
        cache_k/v: [B, L, kv_heads, d]; pos: traced scalar int32."""
        import jax

        b = x.shape[0]
        q = self.q_norm(self.q_proj(x).reshape(b, 1, self.heads, self.head_dim))
        k = self.k_norm(self.k_proj(x).reshape(b, 1, self.kv_heads, self.head_dim))
        v = self.v_proj(x).reshape(b, 1, self.kv_heads, self.head_dim)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, pos, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, pos, 0, 0))
        kk, vv = cache_k.astype(q.dtype), cache_v.astype(q.dtype)
        rep = self.heads // self.kv_heads
        if rep > 1:
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
        valid = (jnp.arange(cache_k.shape[1]) <= pos)[None, :]
        out = attention_op(q, kk, vv, mask=jnp.broadcast_to(valid, (b, cache_k.shape[1])))
        return self.o_proj(out.reshape(b, 1, -1)), cache_k, cache_v


class Qwen3DecoderLayer(nnx.Module):
    def __init__(self, cfg: Qwen3Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps, rngs=rngs)
        self.self_attn = Qwen3Attention(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps, rngs=rngs)
        self.mlp = SwiGLU(cfg.hidden_size, cfg.intermediate_size,
                          dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x, cos, sin, mask):
        x = x + self.self_attn(self.input_layernorm(x), cos, sin, mask)
        return x + self.mlp(self.post_attention_layernorm(x))

    def step(self, x, cos, sin, cache_k, cache_v, pos):
        attn, cache_k, cache_v = self.self_attn.step(
            self.input_layernorm(x), cos, sin, cache_k, cache_v, pos)
        x = x + attn
        return x + self.mlp(self.post_attention_layernorm(x)), cache_k, cache_v


@text_encoder_registry.register("Qwen3ForCausalLM", aliases=("qwen3",))
class Qwen3TextEncoder(nnx.Module):
    config_class = Qwen3Config

    def __init__(self, cfg: Qwen3Config, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        init = nnx.initializers.normal(0.02)
        self.embed_tokens = nnx.Param(
            init(rngs.params(), (cfg.vocab_size, cfg.hidden_size), param_dtype)
        )
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.layers = nnx.List(
            [Qwen3DecoderLayer(cfg, **kw) for _ in range(cfg.num_hidden_layers)]
        )
        self.norm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps, rngs=rngs)

    def __call__(
        self,
        input_ids: jnp.ndarray,        # [B, S] int32
        attention_mask: Optional[jnp.ndarray] = None,  # [B, S] 1=real
        normalize_last: bool = False,
    ) -> jnp.ndarray:
        """Return the last decoder layer's output (= HF hidden_states[-2]);
        ``normalize_last=True`` applies the final norm (= last_hidden_state)."""
        b, s = input_ids.shape
        x = jnp.take(self.embed_tokens.value, input_ids, axis=0).astype(self.dtype)

        positions = jnp.arange(s)[None, :]
        from apex_studio_tpu.ops.rope import rope_freqs_1d

        cos, sin = rope_freqs_1d(positions, self.cfg.head_dim, self.cfg.rope_theta)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]  # broadcast over heads

        # Causal ∧ padding mask: [B, 1, S, S].
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if attention_mask is not None:
            pad = attention_mask.astype(bool)[:, None, None, :]
            mask = jnp.logical_and(causal, pad)
        else:
            mask = causal

        for layer in self.layers:
            x = layer(x, cos, sin, mask)
        return self.norm(x) if normalize_last else x

    # -- KV-cached autoregressive decode (prompt extension) -------------------

    def init_cache(self, batch: int, cache_len: int):
        """Per-layer (k, v) caches [B, L, kv_heads, head_dim]."""
        kvh, d = self.cfg.num_key_value_heads, self.cfg.head_dim
        z = jnp.zeros((batch, cache_len, kvh, d), self.dtype)
        return [(z, z) for _ in range(len(self.layers))]

    def prefill(self, input_ids, attention_mask, cache_len: int,
                normalize_last: bool = True):
        """Full forward over the prompt that also fills the KV caches.

        Returns (hidden [B, S, D] post-(optional)norm, caches padded to
        ``cache_len``). The decode loop then costs O(1) forwards per token
        (decode_step) instead of re-running the padded full sequence.
        """
        b, s = input_ids.shape
        x = jnp.take(self.embed_tokens.value, input_ids, axis=0).astype(self.dtype)
        positions = jnp.arange(s)[None, :]
        from apex_studio_tpu.ops.rope import rope_freqs_1d

        cos, sin = rope_freqs_1d(positions, self.cfg.head_dim, self.cfg.rope_theta)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if attention_mask is not None:
            mask = jnp.logical_and(causal, attention_mask.astype(bool)[:, None, None, :])
        else:
            mask = causal
        pad = cache_len - s
        caches = []
        for layer in self.layers:
            h = layer.input_layernorm(x)
            att = layer.self_attn
            q = att.q_norm(att.q_proj(h).reshape(b, s, att.heads, att.head_dim))
            k = att.k_norm(att.k_proj(h).reshape(b, s, att.kv_heads, att.head_dim))
            v = att.v_proj(h).reshape(b, s, att.kv_heads, att.head_dim)
            q = apply_rope_half(q, cos, sin)
            k = apply_rope_half(k, cos, sin)
            caches.append((
                jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))).astype(self.dtype),
                jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))).astype(self.dtype),
            ))
            rep = att.heads // att.kv_heads
            kk = jnp.repeat(k, rep, axis=2) if rep > 1 else k
            vv = jnp.repeat(v, rep, axis=2) if rep > 1 else v
            out = attention_op(q, kk, vv, mask=mask)
            x = x + att.o_proj(out.reshape(b, s, -1))
            x = x + layer.mlp(layer.post_attention_layernorm(x))
        return (self.norm(x) if normalize_last else x), caches

    def decode_step(self, token_ids, pos, caches, normalize_last: bool = True):
        """One cached decode step. token_ids [B, 1]; pos traced scalar int32
        (the position being written); caches from prefill/init_cache."""
        from apex_studio_tpu.ops.rope import rope_freqs_1d

        x = jnp.take(self.embed_tokens.value, token_ids, axis=0).astype(self.dtype)
        positions = jnp.full((1, 1), pos, jnp.int32)
        cos, sin = rope_freqs_1d(positions, self.cfg.head_dim, self.cfg.rope_theta)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
        new_caches = []
        for layer, (ck, cv) in zip(self.layers, caches):
            x, ck, cv = layer.step(x, cos, sin, ck, cv, pos)
            new_caches.append((ck, cv))
        return (self.norm(x) if normalize_last else x), new_caches
