"""Rotary position embeddings, real-valued (TPU-friendly: no complex dtype).

Models in this codebase use the *interleaved pair* convention (the reference
applies ``torch.view_as_complex(x.reshape(..., -1, 2)) * freqs_cis`` — e.g.
zimage/base/model.py:113, wan/base/model.py RoPE): feature pairs (2i, 2i+1)
form the complex component. Here we carry ``cos``/``sin`` tables of shape
[..., head_dim/2] and rotate the de-interleaved halves; this keeps everything
in float32 vector ops that XLA fuses with the surrounding projections.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def rope_freqs_1d(positions, dim: int, theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for 1-D positions. Returns ([*pos.shape, dim//2],) * 2 in f32.

    Concrete (numpy / non-traced) positions take a host float64 path — matching
    the reference's f64 table precompute — then land on device as f32 tables.
    """
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    if not isinstance(positions, jnp.ndarray) or isinstance(positions, np.ndarray):
        # Stay in numpy: jnp ops on concrete values inside a jit trace produce
        # tracers (constants lifted into the graph), which breaks callers that
        # build host-side tables at trace time (e.g. framepack RoPE-by-index).
        # Numpy results fold into the compiled program as constants either way.
        angles = np.asarray(positions, np.float64)[..., None] * inv
        return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)
    angles = positions.astype(jnp.float32)[..., None] * jnp.asarray(inv, jnp.float32)
    return jnp.cos(angles), jnp.sin(angles)


def precompute_axial_freqs(
    ids: jnp.ndarray,
    axes_dims: Sequence[int],
    theta: float = 10000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-axis RoPE tables.

    ``ids`` is integer [..., n_axes] (e.g. (t, h, w) token coordinates); axis i
    contributes ``axes_dims[i]/2`` rotary pairs. Output: cos/sin of shape
    [..., sum(axes_dims)//2].
    """
    assert ids.shape[-1] == len(axes_dims), (ids.shape, axes_dims)
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dims):
        c, s = rope_freqs_1d(ids[..., i], d, theta)
        cos_parts.append(c)
        sin_parts.append(s)
    if all(isinstance(c, np.ndarray) for c in cos_parts):
        # Concrete inputs keep a pure-numpy pipeline (see rope_freqs_1d).
        return np.concatenate(cos_parts, axis=-1), np.concatenate(sin_parts, axis=-1)
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """LLM (HF llama/qwen) rotate-half convention.

    x: [..., D]; cos/sin: broadcastable [..., D//2] tables (will be tiled to D).
    rotate_half(x) = concat(-x[D/2:], x[:D/2]); out = x·cos + rotate_half(x)·sin.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    d2 = x.shape[-1] // 2
    cos2 = jnp.concatenate([cos, cos], axis=-1)
    sin2 = jnp.concatenate([sin, sin], axis=-1)
    rotated = jnp.concatenate([-x32[..., d2:], x32[..., :d2]], axis=-1)
    return (x32 * cos2 + rotated * sin2).astype(orig_dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved feature pairs of ``x`` [..., H, D] by cos/sin [..., D//2].

    cos/sin broadcast over the head axis: for x of shape [B, S, H, D] pass
    tables shaped [B, S, 1, D//2] (or [S, 1, D//2]).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    xr = x32[..., 0::2]
    xi = x32[..., 1::2]
    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    # Re-interleave pairs: stack on a trailing axis then flatten.
    out = jnp.stack([out_r, out_i], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)
