"""Interchangeable attention backends behind one signature.

Counterpart of the reference's attention registry (``src/attention/functions.py:84``,
~15 CUDA/Metal backends) rebuilt for TPU. Canonical layout is **BSHD**
(batch, seq, heads, head_dim) — the layout `jax.nn.dot_product_attention`
takes and the one that keeps head_dim on the minor (lane) axis for the MXU.

Backends:
  - ``pallas_flash`` — our Pallas TPU flash-attention kernel (ops/attention/pallas_flash.py)
  - ``xla``          — jax.nn.dot_product_attention, XLA-fused (any platform)
  - ``chunked``      — lax.scan online-softmax over KV chunks (long-sequence,
                        counterpart of the reference's sdpa_streaming:138 /
                        efficient_dot_product_attention:1617)
  - ``naive``        — einsum reference used by numeric tests

Dispatch: ``attention(q, k, v, ...)`` picks the registry default, which is
``pallas_flash`` on TPU and ``xla`` elsewhere. A key-padding mask is accepted
either as boolean [B, Sk] or additive bias.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from apex_studio_tpu.registry import Registry

attention_registry = Registry("attention")


def _prep_bias(
    bias: Optional[jnp.ndarray],
    mask: Optional[jnp.ndarray],
) -> Optional[jnp.ndarray]:
    """Combine an additive bias and a boolean mask into one additive bias."""
    if mask is not None:
        neg = jnp.asarray(-1e30, jnp.float32)
        if mask.ndim == 2:  # [B, Sk] key-padding
            mbias = jnp.where(mask[:, None, None, :], 0.0, neg)
        else:
            mbias = jnp.where(mask, 0.0, neg)
        bias = mbias if bias is None else bias + mbias
    return bias


@attention_registry.register("naive")
def naive_attention(q, k, v, bias=None, scale=None, is_causal=False):
    """Reference einsum implementation (f32 softmax), for tests and tiny shapes."""
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if is_causal:
        sq, sk = s.shape[-2], s.shape[-1]
        causal = jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)
        s = jnp.where(causal, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)


@attention_registry.register("xla")
def xla_attention(q, k, v, bias=None, scale=None, is_causal=False):
    """jax.nn.dot_product_attention — XLA picks the fused path per platform."""
    return jax.nn.dot_product_attention(
        q, k, v, bias=bias, scale=scale, is_causal=is_causal
    )


@attention_registry.register("chunked")
def chunked_attention(q, k, v, bias=None, scale=None, is_causal=False, chunk_size=2048):
    """Online-softmax over KV chunks via lax.scan — O(Sq·chunk) live memory."""
    if is_causal:
        # Fall back: causal chunking needs per-chunk masks; diffusion is non-causal.
        return xla_attention(q, k, v, bias=bias, scale=scale, is_causal=True)
    from apex_studio_tpu.ops.attention.chunked import chunked_attention_impl

    return chunked_attention_impl(q, k, v, bias=bias, scale=scale, chunk_size=chunk_size)


def _pallas_available() -> bool:
    if os.environ.get("APEX_PALLAS_INTERPRET"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@attention_registry.register("pallas_flash", available=True)
def pallas_flash_attention(q, k, v, bias=None, scale=None, is_causal=False):
    from apex_studio_tpu.ops.attention.pallas_flash import flash_attention

    return flash_attention(
        q,
        k,
        v,
        bias=bias,
        scale=scale,
        is_causal=is_causal,
        interpret=bool(os.environ.get("APEX_PALLAS_INTERPRET")),
    )


@attention_registry.register("ring")
def ring_attention_backend(q, k, v, bias=None, scale=None, is_causal=False):
    """Sequence-parallel exact attention over the process mesh's ``sp`` axis
    (parallel/ring_attention.py). Long-video engines pick this up automatically
    when the engine mesh has sp > 1 — the TPU-native replacement for the
    reference's single-device chunked attention (functions.py:138)."""
    from apex_studio_tpu.parallel.mesh import get_mesh
    from apex_studio_tpu.parallel.ring_attention import ring_attention

    mesh = get_mesh()
    sp = int(mesh.shape.get("sp", 1)) if mesh is not None else 1
    if (
        mesh is None
        or sp <= 1
        or bias is not None
        or is_causal
        or q.shape[1] != k.shape[1]
        or q.shape[1] % sp
    ):
        return xla_attention(q, k, v, bias=bias, scale=scale, is_causal=is_causal)
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    spec = P(None, "sp", None, None)
    fn = _jax.shard_map(
        functools.partial(ring_attention, axis_name="sp", scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def _sp_mesh_active(q, k, bias, is_causal) -> bool:
    try:
        from apex_studio_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
        sp = int(mesh.shape.get("sp", 1)) if mesh is not None else 1
        return (
            sp > 1
            and bias is None
            and not is_causal
            and q.shape[1] == k.shape[1]
            and q.shape[1] % sp == 0
        )
    except Exception:
        return False


_backend_override: Optional[str] = None


@functools.cache
def _platform_default_backend() -> str:
    return "pallas_flash" if _pallas_available() else "xla"


def _default_backend() -> str:
    return _backend_override or _platform_default_backend()


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    is_causal: bool = False,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Unified attention entry point. q/k/v: [B, S, H, D]; returns [B, Sq, H, D]."""
    bias = _prep_bias(bias, mask)
    name = backend or _default_backend()
    # Sequence parallelism: when the engine mesh carries an sp axis, the
    # sequence is sharded across chips and attention goes around the ring.
    if backend is None and _backend_override is None and _sp_mesh_active(q, k, bias, is_causal):
        name = "ring"
    if name == "pallas_flash":
        # The Pallas kernel only supports [B,1|H,1,Sk]-broadcastable bias
        # (key-padding); route richer biases (per-head or per-query, e.g. the
        # magi chunk-causal mask) through XLA.
        if bias is not None and bias.ndim == 4 and (
                bias.shape[1] != 1 or bias.shape[2] != 1):
            name = "xla"
        if not _pallas_available():
            name = "xla"
    fn = attention_registry.get(name)
    return fn(q, k, v, bias=bias, scale=scale, is_causal=is_causal)


def set_default_backend(name: Optional[str]) -> None:
    """Override backend selection globally (None restores platform default)."""
    global _backend_override
    if name is not None and name not in attention_registry:
        raise KeyError(f"unknown attention backend {name!r}")
    _backend_override = name
