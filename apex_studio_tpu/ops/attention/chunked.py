"""Streaming (online-softmax) attention via lax.scan over KV chunks.

TPU counterpart of the reference's ``sdpa_streaming`` (attention/functions.py:138)
and jax-style ``efficient_dot_product_attention`` (:1617): peak memory is
O(Sq × chunk) instead of O(Sq × Sk), trading one extra pass of f32 FMAs.
Used when a sequence is too long for the materialized-score backends but the
model still runs on a single chip (sharded ring attention covers multi-chip).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def chunked_attention_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    chunk_size: int = 2048,
) -> jnp.ndarray:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else d**-0.5

    pad = (-sk) % chunk_size
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        tail_bias = jnp.where(
            jnp.arange(sk + pad) < sk, 0.0, -1e30
        ).astype(jnp.float32)[None, None, None, :]
        if bias is None:
            bias = tail_bias
        else:
            bias = jnp.pad(
                bias.astype(jnp.float32), ((0, 0),) * 3 + ((0, pad),)
            ) + tail_bias
    n_chunks = (sk + pad) // chunk_size

    # [n, B, chunk, H, D]
    ks = k.reshape(b, n_chunks, chunk_size, h, d).transpose(1, 0, 2, 3, 4)
    vs = v.reshape(b, n_chunks, chunk_size, h, d).transpose(1, 0, 2, 3, 4)
    if bias is not None:
        bias = jnp.broadcast_to(
            bias.astype(jnp.float32), (b, bias.shape[1], bias.shape[2], sk + pad)
        )
        bs = bias.reshape(b, bias.shape[1], bias.shape[2], n_chunks, chunk_size).transpose(
            3, 0, 1, 2, 4
        )
    else:
        bs = None

    q32 = q.astype(jnp.float32) * scale

    def body(carry, xs):
        m_prev, l_prev, acc_prev = carry
        if bs is None:
            k_c, v_c = xs
            b_c = None
        else:
            k_c, v_c, b_c = xs
        s = jnp.einsum("bqhd,bkhd->bhqk", q32, k_c.astype(jnp.float32))
        if b_c is not None:
            s = s + b_c  # broadcasts [B,1|H,1|Sq,chunk]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhqk,bkhd->bhqd", p, v_c.astype(jnp.float32))
        acc_new = acc_prev * corr + pv  # corr broadcasts [B,H,Sq,1] over D
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, h, sq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, sq, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, sq, d), jnp.float32)
    xs = (ks, vs) if bs is None else (ks, vs, bs)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), xs)

    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # [B, Sq, H, D]
