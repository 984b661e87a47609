"""LLaMA-architecture causal-LM text encoder in JAX/NNX.

HunyuanVideo (original) conditions on llava-llama-3-8B hidden states
(reference helper ``src/helpers/hunyuanvideo/llama.py``: chat-templated
prompt, ``hidden_states[-(skip+1)]`` with skip=2, template tokens cropped).
Decoder-only GQA transformer: RMSNorm, rotate-half RoPE, SwiGLU, no q/k norm
and no attention bias — i.e. the Qwen3 module minus per-head norms.

Run as an encoder: one jitted forward, no KV cache. ``skip_last_layers``
selects which hidden state to return (0 = last layer's output = HF
``hidden_states[-1]`` pre-final-norm; 2 = ``hidden_states[-3]``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear, RMSNorm, SwiGLU
from apex_studio_tpu.models.registry import text_encoder_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.rope import apply_rope_half


@dataclasses.dataclass
class LlamaConfig:
    vocab_size: int = 128320
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    attention_bias: bool = False
    # Which hidden state the conditioning uses (HF hidden_states[-(skip+1)]).
    skip_last_layers: int = 2
    # Flux2/Mistral mode: concatenate hidden_states[k] for these layer indices
    # along the feature axis (reference engine/flux2/shared.py:249-258).
    stack_layers: Optional[Tuple[int, ...]] = None

    @classmethod
    def from_dict(cls, cfg: dict) -> "LlamaConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "head_dim" not in kw and "hidden_size" in kw and "num_attention_heads" in kw:
            kw["head_dim"] = kw["hidden_size"] // kw["num_attention_heads"]
        if kw.get("stack_layers") is not None:
            kw["stack_layers"] = tuple(kw["stack_layers"])
        return cls(**kw)


class LlamaAttention(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        h, kv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        kw = dict(use_bias=cfg.attention_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_proj = Linear(cfg.hidden_size, h * d, **kw)
        self.k_proj = Linear(cfg.hidden_size, kv * d, **kw)
        self.v_proj = Linear(cfg.hidden_size, kv * d, **kw)
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


class LlamaDecoderLayer(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps, rngs=rngs)
        self.self_attn = LlamaAttention(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps, rngs=rngs)
        self.mlp = SwiGLU(cfg.hidden_size, cfg.intermediate_size,
                          dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x, cos, sin, mask):
        x = x + self.self_attn(self.input_layernorm(x), cos, sin, mask)
        return x + self.mlp(self.post_attention_layernorm(x))


@text_encoder_registry.register(
    "LlamaModel",
    aliases=(
        "llama",
        "LlavaForConditionalGeneration",
        "MistralModel",
        "Mistral3ForConditionalGeneration",  # flux2's text tower is llama-arch
    ),
)
class LlamaTextEncoder(nnx.Module):
    config_class = LlamaConfig

    def __init__(self, cfg: LlamaConfig, *, dtype=jnp.bfloat16,
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
            [LlamaDecoderLayer(cfg, **kw) for _ in range(cfg.num_hidden_layers)]
        )
        self.norm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps, rngs=rngs)

    def __call__(
        self,
        input_ids: jnp.ndarray,        # [B, S] int32
        attention_mask: Optional[jnp.ndarray] = None,  # [B, S] 1=real
        normalize_last: bool = False,
    ) -> jnp.ndarray:
        """Return hidden_states[-(skip+1)] (the conditioning tensor). With
        ``skip_last_layers=0`` and ``normalize_last=True`` this is the final
        ``last_hidden_state``."""
        b, s = input_ids.shape
        x = jnp.take(self.embed_tokens.value, input_ids, axis=0).astype(self.dtype)

        positions = jnp.arange(s)[None, :]
        from apex_studio_tpu.ops.rope import rope_freqs_1d

        cos, sin = rope_freqs_1d(positions, self.cfg.head_dim, self.cfg.rope_theta)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]

        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if attention_mask is not None:
            pad = attention_mask.astype(bool)[:, None, None, :]
            mask = jnp.logical_and(causal, pad)
        else:
            mask = causal

        if self.cfg.stack_layers is not None:
            # hidden_states[k] = output after k decoder layers (HF convention).
            want = set(int(k) for k in self.cfg.stack_layers)
            collected = {}
            if 0 in want:
                collected[0] = x
            for i, layer in enumerate(self.layers):
                x = layer(x, cos, sin, mask)
                if (i + 1) in want:
                    collected[i + 1] = x
                if len(collected) == len(want) and (i + 1) >= max(want):
                    break
            return jnp.concatenate(
                [collected[int(k)] for k in self.cfg.stack_layers], axis=-1
            )
        n_run = len(self.layers) - int(self.cfg.skip_last_layers)
        for layer in list(self.layers)[:n_run]:
            x = layer(x, cos, sin, mask)
        if self.cfg.skip_last_layers == 0 and normalize_last:
            x = self.norm(x)
        return x
