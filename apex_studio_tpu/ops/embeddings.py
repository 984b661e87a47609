"""Scalar-conditioning embeddings."""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(
    t: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    scale: float = 1.0,
    flip_sin_to_cos: bool = True,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, computed in float32.

    ``flip_sin_to_cos=True`` yields [cos | sin] ordering (the DiT/ZImage
    convention); False yields [sin | cos] (diffusers default ordering).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = scale * t.astype(jnp.float32)[..., None] * freqs
    if flip_sin_to_cos:
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    else:
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb
