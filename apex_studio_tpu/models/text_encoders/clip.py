"""CLIP text encoder (CLIP-L/14 class) in JAX/NNX.

Flux conditions on the CLIP pooled embedding (manifest base ``CLIPTextModel``);
SD-family models use the sequence output. Pooling follows HF CLIPTextModel:
the final-layer-norm hidden state at the EOS position (argmax of input ids,
which works because EOS is the highest special id in CLIP vocabs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear
from apex_studio_tpu.models.registry import text_encoder_registry
from apex_studio_tpu.ops import attention as attention_op


@dataclasses.dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @classmethod
    def from_dict(cls, cfg: dict) -> "CLIPTextConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


def _act(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "quick_gelu":
        return x * nnx.sigmoid(1.702 * x)
    if name in ("gelu_tanh", "gelu_pytorch_tanh", "gelu_new"):
        return nnx.gelu(x, approximate=True)
    return nnx.gelu(x, approximate=False)


class CLIPAttention(nnx.Module):
    def __init__(self, cfg: CLIPTextConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.hidden_size
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_proj = Linear(d, d, **kw)
        self.k_proj = Linear(d, d, **kw)
        self.v_proj = Linear(d, d, **kw)
        self.out_proj = Linear(d, d, **kw)
        self.heads = cfg.num_attention_heads
        self.head_dim = d // cfg.num_attention_heads

    def __call__(self, x, mask):
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, self.heads, self.head_dim)
        k = self.k_proj(x).reshape(b, s, self.heads, self.head_dim)
        v = self.v_proj(x).reshape(b, s, self.heads, self.head_dim)
        out = attention_op(q, k, v, mask=mask, is_causal=mask is None, backend="xla")
        return self.out_proj(out.reshape(b, s, -1))


class CLIPLayer(nnx.Module):
    def __init__(self, cfg: CLIPTextConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.hidden_size
        self.layer_norm1 = LayerNorm(d, eps=cfg.layer_norm_eps, rngs=rngs)
        self.self_attn = CLIPAttention(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.layer_norm2 = LayerNorm(d, eps=cfg.layer_norm_eps, rngs=rngs)
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.fc1 = Linear(d, cfg.intermediate_size, **kw)
        self.fc2 = Linear(cfg.intermediate_size, d, **kw)
        self.act = cfg.hidden_act

    def __call__(self, x, mask):
        x = x + self.self_attn(self.layer_norm1(x), mask)
        return x + self.fc2(_act(self.act, self.fc1(self.layer_norm2(x))))


@text_encoder_registry.register(
    "CLIPTextModel", aliases=("CLIPTextModelWithProjection", "clip")
)
class CLIPTextEncoder(nnx.Module):
    config_class = CLIPTextConfig

    def __init__(self, cfg: CLIPTextConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        init = nnx.initializers.normal(0.02)
        self.token_embedding = nnx.Param(
            init(rngs.params(), (cfg.vocab_size, cfg.hidden_size), param_dtype)
        )
        self.position_embedding = nnx.Param(
            init(rngs.params(), (cfg.max_position_embeddings, cfg.hidden_size), param_dtype)
        )
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.layers = nnx.List([CLIPLayer(cfg, **kw) for _ in range(cfg.num_hidden_layers)])
        self.final_layer_norm = LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps, rngs=rngs)

    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (last_hidden_state [B,S,D], pooled [B,D])."""
        b, s = input_ids.shape
        x = jnp.take(self.token_embedding.value, input_ids, axis=0).astype(self.dtype)
        x = x + self.position_embedding.value[:s].astype(self.dtype)
        # CLIP text attention is causal; combine with padding mask when given.
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        mask = causal
        if attention_mask is not None:
            mask = jnp.logical_and(causal, attention_mask.astype(bool)[:, None, None, :])
        for layer in self.layers:
            x = layer(x, mask)
        x = self.final_layer_norm(x)
        eos_idx = jnp.argmax(input_ids, axis=-1)  # EOS has the highest token id
        pooled = jnp.take_along_axis(x, eos_idx[:, None, None], axis=1)[:, 0]
        return x, pooled
