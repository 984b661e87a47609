"""Gemma-3 text tower in JAX/NNX — LTX-2's conditioning encoder.

Counterpart of the reference's LTX-2 text encoder component
(``manifest/video/ltx2-*.yml`` base Gemma3ForConditionalGeneration; the
pipeline takes the text tower's hidden states). Gemma-3 specifics vs the
llama module here:

- embeddings scaled by sqrt(hidden);
- RMSNorm stores zero-centered gamma → applied as (1 + w);
- sandwich norms: post-attention / post-feedforward norms on the sublayer
  OUTPUT before the residual add (Gemma-2 lineage);
- per-head q/k RMSNorm; query scaled by query_pre_attn_scalar^-0.5;
- alternating local (sliding-window, theta=10k) and global (theta=1M, linear
  rope scaling) layers, `sliding_window_pattern` locals per global;
- GeGLU MLP (tanh-gelu gate).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear
from apex_studio_tpu.models.registry import text_encoder_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.rope import apply_rope_half, rope_freqs_1d


@dataclasses.dataclass
class Gemma3Config:
    vocab_size: int = 262208
    hidden_size: int = 3840
    intermediate_size: int = 15360
    num_hidden_layers: int = 48
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    rope_local_base_freq: float = 10_000.0
    rope_scaling_factor: float = 8.0
    query_pre_attn_scalar: float = 256.0
    sliding_window: int = 1024
    sliding_window_pattern: int = 6  # every Nth layer is global
    skip_last_layers: int = 0

    @classmethod
    def from_dict(cls, cfg: dict) -> "Gemma3Config":
        if "text_config" in cfg:  # HF multimodal config nests the text tower
            merged = dict(cfg["text_config"])
        else:
            merged = dict(cfg)
        if isinstance(merged.get("rope_scaling"), dict):
            merged["rope_scaling_factor"] = merged["rope_scaling"].get("factor", 8.0)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in merged.items() if k in known})


class GemmaRMSNorm(nnx.Module):
    """RMSNorm with zero-centered gamma: y = x̂ · (1 + w)."""

    def __init__(self, dim: int, eps: float = 1e-6):
        self.weight = nnx.Param(jnp.zeros((dim,), jnp.float32))
        self.eps = eps

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (xf * (1.0 + self.weight.value)).astype(x.dtype)



class Gemma3Attention(nnx.Module):
    def __init__(self, cfg: Gemma3Config, is_global: bool, *, dtype, param_dtype,
                 rngs: nnx.Rngs):
        h, kv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_proj = Linear(cfg.hidden_size, h * d, **kw)
        self.k_proj = Linear(cfg.hidden_size, kv * d, **kw)
        self.v_proj = Linear(cfg.hidden_size, kv * d, **kw)
        self.o_proj = Linear(h * d, cfg.hidden_size, **kw)
        self.q_norm = GemmaRMSNorm(d, cfg.rms_norm_eps)
        self.k_norm = GemmaRMSNorm(d, cfg.rms_norm_eps)
        self.heads, self.kv_heads, self.head_dim = h, kv, d
        self.scale = cfg.query_pre_attn_scalar ** -0.5
        self.is_global = is_global

    def __call__(self, x, cos, sin, mask):
        b, s, _ = x.shape
        q = self.q_norm(self.q_proj(x).reshape(b, s, self.heads, self.head_dim))
        k = self.k_norm(self.k_proj(x).reshape(b, s, self.kv_heads, self.head_dim))
        v = self.v_proj(x).reshape(b, s, self.kv_heads, self.head_dim)
        q = apply_rope_half(q.astype(x.dtype), cos, sin)
        k = apply_rope_half(k.astype(x.dtype), cos, sin)
        rep = self.heads // self.kv_heads
        if rep > 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = attention_op(q, k, v, mask=mask, scale=self.scale)
        return self.o_proj(out.reshape(b, s, -1))


class Gemma3Layer(nnx.Module):
    def __init__(self, cfg: Gemma3Config, is_global: bool, *, dtype, param_dtype,
                 rngs: nnx.Rngs):
        eps = cfg.rms_norm_eps
        self.input_layernorm = GemmaRMSNorm(cfg.hidden_size, eps)
        self.self_attn = Gemma3Attention(cfg, is_global, dtype=dtype,
                                         param_dtype=param_dtype, rngs=rngs)
        self.post_attention_layernorm = GemmaRMSNorm(cfg.hidden_size, eps)
        self.pre_feedforward_layernorm = GemmaRMSNorm(cfg.hidden_size, eps)
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.gate_proj = Linear(cfg.hidden_size, cfg.intermediate_size, **kw)
        self.up_proj = Linear(cfg.hidden_size, cfg.intermediate_size, **kw)
        self.down_proj = Linear(cfg.intermediate_size, cfg.hidden_size, **kw)
        self.post_feedforward_layernorm = GemmaRMSNorm(cfg.hidden_size, eps)
        self.is_global = is_global

    def __call__(self, x, cos, sin, mask):
        h = self.self_attn(self.input_layernorm(x), cos, sin, mask)
        x = x + self.post_attention_layernorm(h)
        h = self.pre_feedforward_layernorm(x)
        h = self.down_proj(nnx.gelu(self.gate_proj(h), approximate=True)
                           * self.up_proj(h))
        return x + self.post_feedforward_layernorm(h)


@text_encoder_registry.register(
    "Gemma3ForConditionalGeneration",
    aliases=("gemma3", "Gemma3TextModel", "Gemma3Model"),
)
class Gemma3TextEncoder(nnx.Module):
    config_class = Gemma3Config

    def __init__(self, cfg: Gemma3Config, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        init = nnx.initializers.normal(0.02)
        self.embed_tokens = nnx.Param(
            init(rngs.params(), (cfg.vocab_size, cfg.hidden_size), param_dtype))
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        p = cfg.sliding_window_pattern
        self.layers = nnx.List([
            Gemma3Layer(cfg, is_global=((i + 1) % p == 0), **kw)
            for i in range(cfg.num_hidden_layers)
        ])
        self.norm = GemmaRMSNorm(cfg.hidden_size, cfg.rms_norm_eps)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        normalize_last: bool = True,
        output_hidden_states: bool = False,
    ) -> jnp.ndarray:
        """With ``output_hidden_states``, returns [B, L, D, n_states] stacked
        as HF does (embedding output, then each layer's output, the last one
        post-final-norm) — the LTX-2 connector stack consumes all of them
        (reference engine/ltx2/shared/__init__.py:193 hidden_states_all)."""
        cfg = self.cfg
        b, s = input_ids.shape
        x = jnp.take(self.embed_tokens.value, input_ids, axis=0).astype(self.dtype)
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, self.dtype)

        positions = jnp.arange(s)[None, :]
        cos_g, sin_g = rope_freqs_1d(
            positions / cfg.rope_scaling_factor, cfg.head_dim, cfg.rope_theta)
        cos_l, sin_l = rope_freqs_1d(positions, cfg.head_dim,
                                     cfg.rope_local_base_freq)
        cos_g, sin_g = cos_g[:, :, None, :], sin_g[:, :, None, :]
        cos_l, sin_l = cos_l[:, :, None, :], sin_l[:, :, None, :]

        causal = jnp.tril(jnp.ones((s, s), bool))
        band = causal & (positions[0][:, None] - positions[0][None, :]
                         < cfg.sliding_window)
        pad = (attention_mask.astype(bool)[:, None, None, :]
               if attention_mask is not None else True)
        mask_g = jnp.logical_and(causal[None, None], pad)
        mask_l = jnp.logical_and(band[None, None], pad)

        collected = [x] if output_hidden_states else None
        for layer in self.layers[: len(self.layers) - cfg.skip_last_layers]:
            if layer.is_global:
                x = layer(x, cos_g, sin_g, mask_g)
            else:
                x = layer(x, cos_l, sin_l, mask_l)
            if output_hidden_states:
                collected.append(x)
        if cfg.skip_last_layers == 0 and normalize_last:
            x = self.norm(x)
        if output_hidden_states:
            collected[-1] = x  # HF: the final entry is the post-norm output
            return jnp.stack(collected, axis=-1)
        return x
