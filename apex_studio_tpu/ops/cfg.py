"""Classifier-free-guidance combine, with optional renormalization.

One fused element-wise expression; XLA emits a single kernel. Supports the
reference's cfg options (cfg_normalization / cfg_truncation appear in e.g.
engine/zimage/t2i.py run parameters).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def cfg_combine(
    cond: jnp.ndarray,
    uncond: jnp.ndarray,
    guidance_scale: float,
    *,
    normalize: bool = False,
    truncate: Optional[float] = None,
) -> jnp.ndarray:
    """out = uncond + g * (cond - uncond), optionally rescaled to cond's norm."""
    out32 = uncond.astype(jnp.float32) + guidance_scale * (
        cond.astype(jnp.float32) - uncond.astype(jnp.float32)
    )
    if normalize:
        # Rescale per-sample so guidance does not inflate the latent magnitude.
        axes = tuple(range(1, out32.ndim))
        cond_norm = jnp.linalg.norm(cond.astype(jnp.float32), axis=axes, keepdims=True)
        out_norm = jnp.linalg.norm(out32, axis=axes, keepdims=True)
        out32 = out32 * (cond_norm / jnp.maximum(out_norm, 1e-6))
    if truncate is not None:
        out32 = jnp.clip(out32, -truncate, truncate)
    return out32.astype(cond.dtype)
