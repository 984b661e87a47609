"""LTX-2 text connectors — per-stream (video/audio) text conditioning stacks.

Counterpart of the reference's ``src/helpers/ltx2/connectors.py``
(``LTX2TextConnectors``, helper key ``ltx2.connectors``): the packed
per-layer Gemma hidden states are projected (``text_proj_in``) and refined by
two small 1-D transformers — one per modality — whose padded tail positions
are replaced by tiled learnable registers (``connectors.py:233``
LTX2ConnectorTransformer1d.forward), after which attention runs unmasked.

RoPE matches the DiT family convention already implemented in
``models/transformers/ltx2.py`` (theta**linspace(0,1)·π/2 at (2·frac−1),
interleaved pairs over the full inner dim) with a single axis whose
normalizer is ``connector_rope_base_seq_len`` (``connectors.py:41``).

The engine packs Gemma hidden states per the reference's
``engine/ltx2/shared/__init__.py:73`` ``_pack_text_embeds`` (per-batch,
per-layer masked normalization scaled by 8, flattened to
``hidden·num_layers``) before calling this helper.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, Linear, RMSNorm
from apex_studio_tpu.models.registry import helper_registry
from apex_studio_tpu.models.transformers.ltx2 import LTX2Attention, ltx2_rope


@dataclasses.dataclass
class LTX2ConnectorsConfig:
    caption_channels: int = 3840
    text_proj_in_factor: int = 49          # Gemma3-12B: embeddings + 48 layers
    video_connector_num_attention_heads: int = 30
    video_connector_attention_head_dim: int = 128
    video_connector_num_layers: int = 2
    video_connector_num_learnable_registers: Optional[int] = 128
    audio_connector_num_attention_heads: int = 30
    audio_connector_attention_head_dim: int = 128
    audio_connector_num_layers: int = 2
    audio_connector_num_learnable_registers: Optional[int] = 128
    connector_rope_base_seq_len: int = 4096
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6

    @classmethod
    def from_dict(cls, cfg: dict) -> "LTX2ConnectorsConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


def _rms(x, eps):
    import jax

    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)


class _ConnectorBlock(nnx.Module):
    """norm1 → self-attn (+rope) → residual; norm2 → ff → residual
    (connectors.py:114 LTX2TransformerBlock1d; norms are affine-free RMS)."""

    def __init__(self, dim: int, heads: int, head_dim: int, *, eps: float,
                 dtype, rngs):
        self.attn1 = LTX2Attention(dim, dim, heads, head_dim, qk_eps=eps,
                                   dtype=dtype, rngs=rngs)
        self.ff = GELUMLP(dim, 4 * dim, use_bias=True, approximate=True,
                          dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.eps = eps

    def __call__(self, x, rope, mask_bias):
        h = _rms(x, self.eps).astype(x.dtype)
        x = x + self.attn1(h, q_rope=rope, k_rope=rope, mask_bias=mask_bias)
        h = _rms(x, self.eps).astype(x.dtype)
        return x + self.ff(h)


class _ConnectorTransformer1d(nnx.Module):
    def __init__(self, heads: int, head_dim: int, num_layers: int,
                 num_registers: Optional[int], base_seq_len: int, theta: float,
                 *, eps: float, dtype, rngs):
        inner = heads * head_dim
        self.inner_dim = inner
        self.num_registers = num_registers
        if num_registers is not None:
            init = nnx.initializers.uniform(2.0)
            self.learnable_registers = nnx.Param(
                init(rngs.params(), (num_registers, inner)) - 1.0)
        else:
            self.learnable_registers = None
        self.transformer_blocks = nnx.List([
            _ConnectorBlock(inner, heads, head_dim, eps=eps, dtype=dtype,
                            rngs=rngs)
            for _ in range(num_layers)
        ])
        self.base_seq_len = base_seq_len
        self.theta = theta
        self.eps = eps

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """x [B, L, inner]; mask [B, L] bool (False = padded)."""
        b, l, _ = x.shape
        if self.learnable_registers is not None:
            # Compact valid tokens to the front (stable), then overwrite the
            # tail with tiled registers (connectors.py:233-246: the flipped
            # left-padding mask keeps tokens first, registers last).
            order = jnp.argsort(~mask, axis=1, stable=True)  # valid-first
            compact = jnp.take_along_axis(x, order[:, :, None], axis=1)
            reps = l // int(self.num_registers)
            registers = jnp.tile(self.learnable_registers.value, (reps, 1))
            n_valid = mask.sum(axis=1, keepdims=True)
            keep = jnp.arange(l)[None, :] < n_valid  # [B, L]
            x = jnp.where(keep[:, :, None], compact,
                          registers[None].astype(x.dtype))
            mask_bias = None  # all positions attend once registers fill pads
        else:
            neg = jnp.asarray(-1e9, jnp.float32)
            mask_bias = jnp.where(mask[:, None, None, :], 0.0, neg)
        pos = jnp.arange(l, dtype=jnp.float32)[None, None, :]
        rope = ltx2_rope(pos, self.inner_dim, self.theta,
                         (float(self.base_seq_len),))
        for blk in self.transformer_blocks:
            x = blk(x, rope, mask_bias)
        return _rms(x, self.eps).astype(x.dtype)


@helper_registry.register("ltx2.connectors", aliases=("LTX2TextConnectors",))
class LTX2TextConnectors(nnx.Module):
    config_class = LTX2ConnectorsConfig

    def __init__(self, cfg: LTX2ConnectorsConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.text_proj_in = Linear(
            cfg.caption_channels * cfg.text_proj_in_factor, cfg.caption_channels,
            use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        mk = lambda heads, hd, layers, regs: _ConnectorTransformer1d(
            heads, hd, layers, regs, cfg.connector_rope_base_seq_len,
            cfg.rope_theta, eps=cfg.norm_eps, dtype=dtype, rngs=rngs)
        self.video_connector = mk(cfg.video_connector_num_attention_heads,
                                  cfg.video_connector_attention_head_dim,
                                  cfg.video_connector_num_layers,
                                  cfg.video_connector_num_learnable_registers)
        self.audio_connector = mk(cfg.audio_connector_num_attention_heads,
                                  cfg.audio_connector_attention_head_dim,
                                  cfg.audio_connector_num_layers,
                                  cfg.audio_connector_num_learnable_registers)

    def __call__(self, packed: jnp.ndarray, mask: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """packed [B, L, caption_channels·factor]; mask [B, L] bool.
        → (video_ctx [B, L, D], audio_ctx [B, L, D])."""
        x = self.text_proj_in(packed)
        return self.video_connector(x, mask), self.audio_connector(x, mask)


def pack_text_embeds(hidden_all: jnp.ndarray, mask: jnp.ndarray,
                     scale_factor: float = 8.0, eps: float = 1e-6) -> jnp.ndarray:
    """Reference ``_pack_text_embeds`` (engine/ltx2/shared/__init__.py:73):
    per-batch-per-layer masked ``(x - mean) / (max - min)`` scaled by 8,
    flattened [B, L, D, n_layers] → [B, L, D·n_layers], padded rows zeroed."""
    m = mask[:, :, None, None].astype(bool)
    xf = hidden_all.astype(jnp.float32)
    n_valid = (mask.sum(axis=1).astype(jnp.float32)
               * hidden_all.shape[2])[:, None, None, None]
    mean = jnp.where(m, xf, 0.0).sum(axis=(1, 2), keepdims=True) / (n_valid + eps)
    x_min = jnp.where(m, xf, jnp.inf).min(axis=(1, 2), keepdims=True)
    x_max = jnp.where(m, xf, -jnp.inf).max(axis=(1, 2), keepdims=True)
    normed = (xf - mean) / (x_max - x_min + eps) * scale_factor
    b, l = hidden_all.shape[:2]
    flat = normed.reshape(b, l, -1)
    return jnp.where(mask[:, :, None], flat, 0.0)
