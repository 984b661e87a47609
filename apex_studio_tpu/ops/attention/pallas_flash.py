"""Pallas TPU flash attention (forward, non-causal + causal, optional KV bias).

Hot-path kernel for DiT denoising (the reference leans on flash-attn/sage CUDA
wheels; here the same role is a first-party Mosaic kernel). Design:

- Grid ``(B*H, num_q_blocks, num_kv_blocks)`` with the KV axis innermost and
  "arbitrary" semantics: scratch (running max / sum / accumulator) carries
  across KV iterations while Pallas double-buffers the K/V block DMAs.
- Q block index map ignores the KV axis, so the Q tile stays resident in VMEM
  across the whole KV sweep.
- Scores/accumulation in float32 on the MXU (`preferred_element_type`), inputs
  in bf16; running stats kept lane-replicated at (block_q, 128) to stay in
  native tiling.
- Softmax runs in base 2: ``scale * log2(e)`` is folded into Q outside the
  kernel and the kernel uses ``exp2`` — one VPU transcendental with no extra
  multiplies on the (block_q, block_k) score tile.
- Masking is branch-specialized per KV block (``pl.when``): interior blocks
  run a mask-free body; only the ragged tail block pays the iota/select, and
  causal runs a three-way split (fully-masked blocks skip the MXU entirely,
  fully-visible blocks skip the mask, only diagonal blocks mask).
- Optional additive key-padding bias [B, Sk] (enough for every DiT family's
  padding masks; richer biases route to the XLA backend in the dispatcher).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128
LOG2E = math.log2(math.e)


def _flash_kernel(
    q_ref,  # (1, block_q, d) — scale * log2(e) pre-folded into q
    k_ref,  # (1, block_k, d)
    v_ref,  # (1, block_k, d)
    kv_bias_ref,  # (1, 8, block_k) sublane-replicated, log2(e)-scaled, or None
    out_ref,  # (1, block_q, d)
    m_scr,  # (block_q, LANES) f32
    l_scr,  # (block_q, LANES) f32
    acc_scr,  # (block_q, d) f32
    *,
    sk_true: int,
    block_q: int,
    block_k: int,
    causal: bool,
    has_tail: bool,
    one_kv_block: bool,
):
    i = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    def scores(tail_mask: bool, diag_mask: bool):
        s = jax.lax.dot_general(
            q_ref[0],
            k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k), already in log2 space
        if kv_bias_ref is not None:
            s = s + kv_bias_ref[0, 0][None, :]
        if tail_mask or diag_mask:
            kv_pos = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            if tail_mask:
                s = jnp.where(kv_pos < sk_true, s, NEG_INF)
            if diag_mask:
                q_pos = i * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0
                )
                s = jnp.where(q_pos >= kv_pos, s, NEG_INF)
        return s

    def pv_dot(p):
        return jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def first_block(tail_mask: bool):
        # j == 0: write stats directly — no scratch init pass, no correction.
        s = scores(tail_mask, diag_mask=False)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = pv_dot(p)
        m_scr[...] = jnp.broadcast_to(m, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l, l_scr.shape)

    def accumulate(tail_mask: bool, diag_mask: bool):
        s = scores(tail_mask, diag_mask)
        m_prev = m_scr[:, :1]  # (block_q, 1)
        l_prev = l_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] * corr + pv_dot(p)
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    if causal:
        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # Three-way split per block: fully-masked blocks (strictly above the
        # diagonal band) skip the MXU entirely; fully-visible blocks skip the
        # mask; only blocks straddling the diagonal pay the iota/select.
        q_lo = i * block_q
        q_hi = q_lo + block_q - 1
        k_lo = j * block_k
        k_hi = k_lo + block_k - 1
        fully_visible = k_hi <= q_lo
        fully_masked = k_lo > q_hi

        @pl.when(fully_visible)
        def _full():
            accumulate(tail_mask=has_tail, diag_mask=False)

        @pl.when(jnp.logical_not(fully_visible) & jnp.logical_not(fully_masked))
        def _diag():
            accumulate(tail_mask=has_tail, diag_mask=True)

    else:
        # Non-causal DiT hot path: the first KV block seeds the running stats
        # directly (no init pass, no correction), interior blocks run the
        # mask-free body, and only the ragged last block pays the tail mask.
        @pl.when(j == 0)
        def _first():
            first_block(tail_mask=has_tail and one_kv_block)

        if not one_kv_block:
            if has_tail:
                @pl.when((j > 0) & (j < nk - 1))
                def _interior():
                    accumulate(tail_mask=False, diag_mask=False)

                @pl.when(j == nk - 1)
                def _tail():
                    accumulate(tail_mask=True, diag_mask=False)
            else:
                @pl.when(j > 0)
                def _rest():
                    accumulate(tail_mask=False, diag_mask=False)

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        out_ref[0] = (acc_scr[...] / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sk_true", "is_causal", "block_q", "block_k", "interpret"),
)
def _flash_call(
    q3: jnp.ndarray,  # (BH, Sq, D) — padded, scale-folded
    k3: jnp.ndarray,  # (BH, Sk_pad, D)
    v3: jnp.ndarray,
    kv_bias: Optional[jnp.ndarray],  # (BH, 8, Sk_pad) f32 (log2-scaled) or None
    sk_true: int,
    is_causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
):
    bh, sq, d = q3.shape
    nq = sq // block_q
    nk = k3.shape[1] // block_k

    kernel = functools.partial(
        _flash_kernel,
        sk_true=sk_true,
        block_q=block_q,
        block_k=block_k,
        causal=is_causal,
        has_tail=sk_true < nk * block_k,
        one_kv_block=nk == 1,
    )
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
    ]
    args = [q3, k3, v3]
    if kv_bias is not None:
        # Bias rides as (BH, 8, Sk): the TPU tiling rule wants the block's
        # second-to-last dim divisible by 8, so the row is sublane-replicated.
        in_specs.append(pl.BlockSpec((1, 8, block_k), lambda b, i, j: (b, 0, j)))
        args.append(kv_bias)
        wrapped = kernel
    else:
        wrapped = lambda q, k, v, o, m, l, a: kernel(q, k, v, None, o, m, l, a)

    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )
    except TypeError:  # older field spelling
        compiler_params = None

    return pl.pallas_call(
        wrapped,
        grid=(bh, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q3.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(*args)


# Block-shape candidates with measured relative cost per padded score element
# on a real v5e (112k-token and 4608-token sweeps; e.g. (1024,2048)=155 TF/s
# at 112k tokens, (1536,1536)=83 TF/s zero-padded at 4608 tokens vs 61 for
# (1024,1024)). Non-power-of-two blocks matter: DiT token counts like
# 4608 = 3*1536 divide exactly, and padding waste dominates short sequences.
# Larger than ~2M score elements fails Mosaic VMEM allocation (~16 MB/core).
_BLOCK_CANDIDATES = (
    (1024, 2048, 1.00),
    (1536, 1536, 1.10),
    (768, 1536, 1.12),
    (512, 2048, 1.05),
    (1024, 1024, 1.17),
    (512, 1536, 1.15),
    (512, 1024, 1.30),
    (512, 512, 1.9),
    (256, 512, 2.2),
)


def _pick_blocks(sq: int, sk: int) -> tuple[int, int]:
    """Choose block sizes minimizing (padded work x per-block cost): long
    sequences take the fastest big blocks, short ones trade block efficiency
    against tail-padding waste."""
    best = None
    for bq, bk, cost in _BLOCK_CANDIDATES:
        bq_ = min(bq, _round_up(sq, 8))
        bk_ = min(bk, _round_up(sk, 128))
        work = _round_up(sq, bq_) * _round_up(sk, bk_) * cost
        if best is None or work < best[0]:
            best = (work, bq_, bk_)
    return best[1], best[2]


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    is_causal: bool = False,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: [B, S, H, D] → [B, Sq, H, D]. bias limited to key-padding shapes
    ([B, Sk], or [B,1,1,Sk]); anything richer belongs to the XLA backend."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else d**-0.5
    auto_q, auto_k = _pick_blocks(sq, sk)
    block_q = block_q or auto_q
    block_k = block_k or auto_k

    kv_bias = None
    if bias is not None:
        bias = bias.astype(jnp.float32) * LOG2E  # kernel softmax runs in base 2
        if bias.ndim == 4:
            if bias.shape[1] != 1 or bias.shape[2] != 1:
                raise ValueError("pallas_flash supports key-padding bias only")
            bias = bias[:, 0, 0, :]
        kv_bias = jnp.broadcast_to(bias, (b, sk))
        kv_bias = jnp.repeat(kv_bias, h, axis=0)  # (B*H, Sk)

    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, 128))
    q_pad = (-sq) % block_q
    k_pad = (-sk) % block_k

    # Fold scale (and the exp→exp2 base change) into Q: f32 multiply over
    # Sq×d once instead of a per-score multiply in every KV iteration.
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    # [B,S,H,D] → [B*H, S, D]
    def fold(x, pad):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, x.shape[1], d)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    q3, k3, v3 = fold(q, q_pad), fold(k, k_pad), fold(v, k_pad)
    if kv_bias is not None:
        if k_pad:
            kv_bias = jnp.pad(kv_bias, ((0, 0), (0, k_pad)))
        kv_bias = jnp.broadcast_to(kv_bias[:, None, :], (b * h, 8, kv_bias.shape[1]))

    out = _flash_call(q3, k3, v3, kv_bias, sk, is_causal, block_q, block_k, interpret)
    if q_pad:
        out = out[:, :sq]
    return jnp.moveaxis(out.reshape(b, h, sq, d), 1, 2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
