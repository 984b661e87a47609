"""Qwen2 / Qwen2.5(-VL text path) encoder in JAX/NNX.

HunyuanVideo 1.5 and QwenImage condition on Qwen2.5-VL hidden states (text
modality; the reference takes ``hidden_states[-(skip+1)]`` with skip=2,
engine/hunyuanvideo15/shared/__init__.py:145). For text-only inputs the VL
model's mRoPE degenerates to standard rotate-half RoPE (all three position
sections equal), so the text path is a plain Qwen2 decoder: biased qkv
projections, no qk-norm, GQA, SwiGLU. The vision tower lands separately for
image-conditioned edits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.layers import Linear, RMSNorm, SwiGLU
from apex_studio_tpu.models.registry import text_encoder_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.rope import apply_rope_half, rope_freqs_1d


@dataclasses.dataclass
class Qwen2Config:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_dict(cls, cfg: dict) -> "Qwen2Config":
        known = {f.name for f in dataclasses.fields(cls)}
        # Qwen2.5-VL nests the text config under "text_config" in some exports.
        if "text_config" in cfg:
            merged = dict(cfg["text_config"])
        else:
            merged = dict(cfg)
        return cls(**{k: v for k, v in merged.items() if k in known})


class Qwen2Attention(nnx.Module):
    def __init__(self, cfg: Qwen2Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        h, kv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        bkw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_proj = Linear(cfg.hidden_size, h * d, **bkw)
        self.k_proj = Linear(cfg.hidden_size, kv * d, **bkw)
        self.v_proj = Linear(cfg.hidden_size, kv * d, **bkw)
        self.o_proj = Linear(h * d, cfg.hidden_size, use_bias=False,
                             dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.heads, self.kv_heads, self.head_dim = h, kv, d

    def __call__(self, x, cos, sin, mask):
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, self.heads, self.head_dim)
        k = self.k_proj(x).reshape(b, s, self.kv_heads, self.head_dim)
        v = self.v_proj(x).reshape(b, s, self.kv_heads, self.head_dim)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        rep = self.heads // self.kv_heads
        if rep > 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = attention_op(q, k, v, mask=mask, is_causal=mask is None)
        return self.o_proj(out.reshape(b, s, -1))


class Qwen2DecoderLayer(nnx.Module):
    def __init__(self, cfg: Qwen2Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps, rngs=rngs)
        self.self_attn = Qwen2Attention(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps, rngs=rngs)
        self.mlp = SwiGLU(cfg.hidden_size, cfg.intermediate_size,
                          dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x, cos, sin, mask):
        x = x + self.self_attn(self.input_layernorm(x), cos, sin, mask)
        return x + self.mlp(self.post_attention_layernorm(x))


@text_encoder_registry.register(
    "Qwen2_5_VLForConditionalGeneration",
    aliases=("Qwen2ForCausalLM", "Qwen2_5_VLTextModel", "qwen2", "qwen25vl"),
)
class Qwen2TextEncoder(nnx.Module):
    config_class = Qwen2Config

    def __init__(self, cfg: Qwen2Config, *, dtype=jnp.bfloat16,
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
            [Qwen2DecoderLayer(cfg, **kw) for _ in range(cfg.num_hidden_layers)]
        )
        self.norm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps, rngs=rngs)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        num_hidden_layers_to_skip: int = 0,
        normalize_last: bool = False,
    ) -> jnp.ndarray:
        """skip=0 → last layer output (HF hidden_states[-2]); skip=k → run
        num_layers−(k−1)... precisely HF hidden_states[-(k+1)]."""
        b, s = input_ids.shape
        x = jnp.take(self.embed_tokens.value, input_ids, axis=0).astype(self.dtype)
        cos, sin = rope_freqs_1d(jnp.arange(s)[None, :], self.cfg.head_dim, self.cfg.rope_theta)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]

        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        mask = causal
        if attention_mask is not None:
            mask = jnp.logical_and(causal, attention_mask.astype(bool)[:, None, None, :])

        n_run = len(self.layers) - max(0, num_hidden_layers_to_skip - 1)
        for layer in list(self.layers)[:n_run]:
            x = layer(x, cos, sin, mask)
        return self.norm(x) if normalize_last else x
