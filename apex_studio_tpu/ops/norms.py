"""Normalization and adaLN modulation primitives.

All reductions accumulate in float32 regardless of the activation dtype
(bf16 rsqrt of a bf16 mean-of-squares visibly degrades DiT output). XLA fuses
these into neighbouring matmuls; no Pallas needed here.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None, eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    out = x32 * lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def modulate(x: jnp.ndarray, scale: jnp.ndarray, shift: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """adaLN input modulation: x * (1 + scale) (+ shift). scale/shift broadcast over tokens."""
    out = x * (1.0 + scale.astype(x.dtype))
    if shift is not None:
        out = out + shift.astype(x.dtype)
    return out


def gate(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """adaLN output gating: x * g (g broadcast over tokens)."""
    return x * g.astype(x.dtype)
