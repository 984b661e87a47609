"""T5 / UMT5 encoder stack in JAX/NNX.

Conditioning encoders for Flux (T5-XXL v1.1) and Wan (UMT5-XXL). Manifest
``base`` keys: ``T5EncoderModel`` / ``UMT5EncoderModel`` (the reference wraps
HF classes via its generic TextEncoder; here the encoder is a first-party NNX
module fed by the same safetensors).

Architecture notes (both v1.1-style):
- pre-LN RMSNorm without bias, no scale on embeddings
- relative position bias buckets added to attention logits; classic T5 shares
  the bias table across layers (computed in block 0), UMT5 has one per layer
- gated-GELU FFN (wi_0 ⊙ gelu, wi_1, wo), no biases anywhere
- no scaling by 1/sqrt(d_kv) — T5 bakes the scale into the weights
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear, RMSNorm
from apex_studio_tpu.models.registry import text_encoder_registry
from apex_studio_tpu.ops import attention as attention_op


@dataclasses.dataclass
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    per_layer_relative_bias: bool = False  # True for UMT5

    @classmethod
    def from_dict(cls, cfg: dict) -> "T5Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if cfg.get("model_type") == "umt5" or "umt5" in str(cfg.get("_name_or_path", "")).lower():
            kw["per_layer_relative_bias"] = True
        return cls(**kw)


def relative_position_buckets(
    qlen: int, klen: int, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing (host, static shapes)."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(rel.clip(1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return out + np.where(is_small, rel, large)


class T5Attention(nnx.Module):
    def __init__(self, cfg: T5Config, has_bias: bool, *, dtype, param_dtype, rngs: nnx.Rngs):
        inner = cfg.num_heads * cfg.d_kv
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q = Linear(cfg.d_model, inner, **kw)
        self.k = Linear(cfg.d_model, inner, **kw)
        self.v = Linear(cfg.d_model, inner, **kw)
        self.o = Linear(inner, cfg.d_model, **kw)
        self.relative_attention_bias = (
            nnx.Param(
                nnx.initializers.normal(1.0)(
                    rngs.params(), (cfg.relative_attention_num_buckets, cfg.num_heads), param_dtype
                )
            )
            if has_bias
            else None
        )
        self.heads, self.d_kv = cfg.num_heads, cfg.d_kv
        self.cfg = cfg

    def position_bias(self, qlen: int, klen: int) -> jnp.ndarray:
        buckets = relative_position_buckets(
            qlen, klen, self.cfg.relative_attention_num_buckets,
            self.cfg.relative_attention_max_distance,
        )
        table = self.relative_attention_bias.value.astype(jnp.float32)
        bias = jnp.take(table, jnp.asarray(buckets), axis=0)  # [q, k, H]
        return bias.transpose(2, 0, 1)[None]  # [1, H, q, k]

    def __call__(self, x, bias, mask):
        b, s, _ = x.shape
        q = self.q(x).reshape(b, s, self.heads, self.d_kv)
        k = self.k(x).reshape(b, s, self.heads, self.d_kv)
        v = self.v(x).reshape(b, s, self.heads, self.d_kv)
        out = attention_op(q, k, v, bias=bias, mask=mask, scale=1.0, backend="xla")
        return self.o(out.reshape(b, s, -1))


class T5FF(nnx.Module):
    def __init__(self, cfg: T5Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.wi_0 = Linear(cfg.d_model, cfg.d_ff, **kw)
        self.wi_1 = Linear(cfg.d_model, cfg.d_ff, **kw)
        self.wo = Linear(cfg.d_ff, cfg.d_model, **kw)

    def __call__(self, x):
        return self.wo(nnx.gelu(self.wi_0(x), approximate=True) * self.wi_1(x))


class T5Block(nnx.Module):
    def __init__(self, cfg: T5Config, has_bias: bool, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.layer_norm0 = RMSNorm(cfg.d_model, eps=cfg.layer_norm_epsilon, rngs=rngs)
        self.attention = T5Attention(cfg, has_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.layer_norm1 = RMSNorm(cfg.d_model, eps=cfg.layer_norm_epsilon, rngs=rngs)
        self.ff = T5FF(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x, bias, mask):
        x = x + self.attention(self.layer_norm0(x), bias, mask)
        return x + self.ff(self.layer_norm1(x))


@text_encoder_registry.register(
    "T5EncoderModel", aliases=("UMT5EncoderModel", "t5", "umt5")
)
class T5Encoder(nnx.Module):
    config_class = T5Config

    def __init__(self, cfg: T5Config, *, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        self.shared = nnx.Param(
            nnx.initializers.normal(1.0)(rngs.params(), (cfg.vocab_size, cfg.d_model), param_dtype)
        )
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.blocks = nnx.List(
            [
                T5Block(cfg, has_bias=(i == 0 or cfg.per_layer_relative_bias), **kw)
                for i in range(cfg.num_layers)
            ]
        )
        self.final_layer_norm = RMSNorm(cfg.d_model, eps=cfg.layer_norm_epsilon, rngs=rngs)

    def __call__(self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None):
        x = jnp.take(self.shared.value, input_ids, axis=0).astype(self.dtype)
        s = input_ids.shape[1]
        mask = attention_mask.astype(bool) if attention_mask is not None else None
        shared_bias = None
        for i, block in enumerate(self.blocks):
            if block.attention.relative_attention_bias is not None:
                bias = block.attention.position_bias(s, s)
                if i == 0:
                    shared_bias = bias
            else:
                bias = shared_bias
            x = block(x, bias, mask)
        return self.final_layer_norm(x)
