"""Ring attention — sequence-parallel exact attention over the ``sp`` mesh axis.

The reference scales sequence length on one GPU with chunked-softmax attention
(sdpa_streaming, attention/functions.py:138) and FFN chunking; the TPU-native
answer (SURVEY.md §2 parallelism census) is to shard the *sequence* across
chips and rotate KV blocks around the ring with ``lax.ppermute`` while
accumulating online softmax — exact attention, O(S/n) memory per chip, and the
KV transfer overlaps with the block matmuls (XLA schedules the collective
permute concurrently with compute).

Use inside ``shard_map`` with q/k/v sharded on axis 1 (sequence); the
convenience wrapper builds the shard_map over a given mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ring_attention(
    q: jnp.ndarray,  # [B, Sq_local, H, D]
    k: jnp.ndarray,  # [B, Sk_local, H, D]
    v: jnp.ndarray,
    axis_name: str = "sp",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with KV blocks rotating around the ring (non-causal)."""
    n = jax.lax.psum(1, axis_name)
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    q32 = q.astype(jnp.float32) * scale

    b, sq, h, _ = q.shape

    def step(carry, _):
        m_prev, l_prev, acc, k_blk, v_blk = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", q32, k_blk.astype(jnp.float32))
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32))
        acc_new = acc * corr + pv
        # Rotate KV to the next ring position (overlaps with the next matmul).
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_new, l_new, acc_new, k_next, v_next), None

    m0 = jnp.full((b, h, sq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, sq, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, sq, d), jnp.float32)
    # Under shard_map the scan carry must be device-varying like k/v.
    m0, l0, acc0 = (jax.lax.pcast(x, axis_name, to="varying") for x in (m0, l0, acc0))
    (m, l, acc, _, _), _ = jax.lax.scan(step, (m0, l0, acc0, k, v), None, length=n)
    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def ring_attention_sharded(
    q: jnp.ndarray,  # [B, S, H, D] global
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "sp",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Shard q/k/v on the sequence axis over ``axis_name`` and run ring attention."""
    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name=axis_name, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    place = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    return fn(place(q), place(k), place(v))
