"""STEP-LLM (Step1) text encoder in JAX/NNX — StepVideo's bespoke caption
tower.

Counterpart of the reference's ``src/helpers/stepvideo/text_encoder.py``
(``Step1Model`` :661, ``MultiQueryAttention`` :371, ``FeedForward`` :510):
a decoder-only causal LM with **no positional encoding at all** (NoPE — the
reference applies neither rope nor learned positions; ``attn_func`` :314 runs
plain causal SDPA), GQA via ``num_attention_groups`` KV heads unpacked from a
fused ``wqkv`` ``[q(dim) | k(g·d) | v(g·d)]`` projection, SwiGLU
``silu(x0)·x1`` on the two chunks of ``w1``, RMSNorm pre-norms, and **no
final norm** — the last block's residual stream is the conditioning tensor.
``ffn_hidden_size`` is rounded up to a multiple of 256 (:520).

Padding is right-side; the reference ignores the attention mask inside the
model (causal attention already isolates valid prefixes from trailing pads),
and the engine masks pad positions downstream — we reproduce exactly that.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear, RMSNorm
from apex_studio_tpu.models.registry import text_encoder_registry
from apex_studio_tpu.ops.attention import attention


@dataclasses.dataclass
class StepLLMConfig:
    padded_vocab_size: int = 65536
    hidden_size: int = 6144
    num_attention_heads: int = 48
    num_attention_groups: int = 1
    ffn_hidden_size: int = 16384
    num_layers: int = 48
    layernorm_epsilon: float = 1e-5

    @classmethod
    def from_dict(cls, cfg: dict) -> "StepLLMConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


class _StepAttention(nnx.Module):
    def __init__(self, cfg: StepLLMConfig, *, dtype, param_dtype, rngs):
        d = cfg.hidden_size
        self.head_dim = d // cfg.num_attention_heads
        self.heads = cfg.num_attention_heads
        self.groups = cfg.num_attention_groups
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.wqkv = Linear(d, d + 2 * self.groups * self.head_dim, **kw)
        self.wo = Linear(d, d, **kw)

    def __call__(self, x, mask):
        b, s, d = x.shape
        qkv = self.wqkv(x)
        q = qkv[..., :d].reshape(b, s, self.heads, self.head_dim)
        kv = qkv[..., d:].reshape(b, s, self.groups, 2 * self.head_dim)
        k, v = jnp.split(kv, 2, axis=-1)
        q_per_kv = self.heads // self.groups
        if q_per_kv > 1:
            # reference interleave: torch.repeat_interleave(q_per_kv, dim=-2)
            k = jnp.repeat(k, q_per_kv, axis=2)
            v = jnp.repeat(v, q_per_kv, axis=2)
        out = attention(q, k, v, mask=mask)
        return self.wo(out.reshape(b, s, d))


class _StepFFN(nnx.Module):
    def __init__(self, cfg: StepLLMConfig, *, dtype, param_dtype, rngs):
        hidden = 256 * ((cfg.ffn_hidden_size + 255) // 256)
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.w1 = Linear(cfg.hidden_size, 2 * hidden, **kw)
        self.w2 = Linear(hidden, cfg.hidden_size, **kw)

    def __call__(self, x):
        x0, x1 = jnp.split(self.w1(x), 2, axis=-1)
        return self.w2(nnx.silu(x0) * x1)


class _StepBlock(nnx.Module):
    def __init__(self, cfg: StepLLMConfig, *, dtype, param_dtype, rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.attention_norm = RMSNorm(cfg.hidden_size, eps=cfg.layernorm_epsilon)
        self.attention = _StepAttention(cfg, **kw)
        self.ffn_norm = RMSNorm(cfg.hidden_size, eps=cfg.layernorm_epsilon)
        self.feed_forward = _StepFFN(cfg, **kw)

    def __call__(self, x, mask):
        x = x + self.attention(self.attention_norm(x), mask)
        return x + self.feed_forward(self.ffn_norm(x))


@text_encoder_registry.register(
    "step_llm", aliases=("Step1Model", "stepvideo.text_encoder", "step1"))
class StepLLMTextEncoder(nnx.Module):
    config_class = StepLLMConfig

    def __init__(self, cfg: StepLLMConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        init = nnx.initializers.normal(0.02)
        self.embed_tokens = nnx.Param(
            init(rngs.params(), (cfg.padded_vocab_size, cfg.hidden_size),
                 param_dtype))
        self.layers = nnx.List([
            _StepBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            for _ in range(cfg.num_layers)])

    @staticmethod
    def sharding_rules(cfg: "StepLLMConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules([
            (r".*(wqkv|w1)\.kernel", P(None, "tp")),
            (r".*(wo|w2)\.kernel", P("tp", None)),
        ])

    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 **_) -> jnp.ndarray:
        """→ final hidden states [B, S, D] (no final norm — reference
        Step1Model.forward returns the raw residual stream)."""
        b, s = input_ids.shape
        x = jnp.take(self.embed_tokens.value, input_ids, axis=0
                     ).astype(self.dtype)
        # pure causal — the reference ignores the pad mask inside the model
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        for layer in self.layers:
            x = layer(x, mask)
        return x
