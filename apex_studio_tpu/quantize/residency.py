"""int8 weight residency — run oversized models on a single chip.

The reference answers bigger-than-VRAM models with group/budget offloading
(``src/memory_management/group_offloading.py:851``, ``budget_offloading.py``)
and with quantized weight variants in every manifest (FP8 scaled / GGUF Q8_0,
e.g. ``apps/api/manifest/video/wan-2.1-14b-text-to-video.yml:113-190``). On
TPU the first-choice answer is TP sharding over the mesh; when there is only
one chip, this module provides the quantized-residency fallback: every large
``Linear`` kernel is stored in HBM as int8 with a per-output-channel scale and
dequantized tile-by-tile into the matmul (XLA fuses the convert+scale into the
MXU operand load). Quality matches the reference's Q8_0 GGUF variant; compute
stays bf16.

A 12B Flux-Dev-class DiT is ~24 GB in bf16 — over a 16 GB v5e chip — but
~12 GB at int8 residency, leaving headroom for activations at 1024px.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

# Kernels below this many elements stay bf16 (embeddings/adaLN/bias-sized
# weights are cheap and more scale-sensitive).
DEFAULT_MIN_NUMEL = 1 << 20


def quantize_kernel_int8(kernel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel (last-axis) absmax int8 quantization."""
    k = np.asarray(kernel, np.float32)
    absmax = np.max(np.abs(k), axis=tuple(range(k.ndim - 1)), keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    scale = np.where(scale == 0.0, 1.0, scale)
    q = np.clip(np.rint(k / scale), -127, 127).astype(np.int8)
    return q, scale.reshape(-1).astype(np.float32)


def _is_quantizable(mod: nnx.Module, min_numel: int) -> bool:
    from apex_studio_tpu.models.layers import Linear

    if not isinstance(mod, Linear) or getattr(mod, "kernel_scale", None) is not None:
        return False
    shape = getattr(mod.kernel.value, "shape", None)
    return shape is not None and len(shape) == 2 and int(np.prod(shape)) >= min_numel


def apply_int8_residency(
    model: nnx.Module,
    *,
    min_numel: int = DEFAULT_MIN_NUMEL,
    device: Optional[jax.Device] = None,
) -> int:
    """Quantize every large Linear kernel of ``model`` to int8 in place.

    Returns the number of kernels quantized. Weights are pulled to host,
    quantized with numpy, and placed back (optionally onto ``device``) so the
    bf16 originals never need to coexist with the int8 copies in HBM.
    """
    n = 0
    for _, mod in nnx.iter_modules(model):
        if not _is_quantizable(mod, min_numel):
            continue
        host = np.asarray(jax.device_get(mod.kernel.value), np.float32)
        q, scale = quantize_kernel_int8(host)
        put = (lambda x: jax.device_put(x, device)) if device is not None else jnp.asarray
        mod.kernel = nnx.Param(put(q))
        mod.kernel_scale = nnx.Param(put(scale))
        n += 1
    return n


def materialize_random_int8(
    model: nnx.Module,
    *,
    min_numel: int = DEFAULT_MIN_NUMEL,
    seed: int = 0,
    scale: float = 0.02,
    device: Optional[jax.Device] = None,
) -> int:
    """Fill an abstract (``nnx.eval_shape``-built) model with random weights,
    large Linear kernels directly as int8 — no full-precision copy is ever
    allocated. Benchmark/test helper: values are random, placement is real.
    """
    rng = np.random.default_rng(seed)
    put = (lambda x: jax.device_put(x, device)) if device is not None else jnp.asarray
    n = 0
    for _, mod in nnx.iter_modules(model):
        if _is_quantizable(mod, min_numel):
            shape = tuple(mod.kernel.value.shape)
            q = rng.integers(-127, 128, size=shape, dtype=np.int8)
            fan_in = shape[0]
            s = np.full((shape[-1],), scale / np.sqrt(fan_in) / 127.0, np.float32)
            mod.kernel = nnx.Param(put(q))
            mod.kernel_scale = nnx.Param(put(s))
            n += 1
    # Materialize every remaining abstract leaf.
    state = nnx.state(model)

    def fill(leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                arr = (rng.standard_normal(leaf.shape) * scale).astype(leaf.dtype)
            else:
                arr = np.zeros(leaf.shape, leaf.dtype)
            return put(arr)
        return leaf

    state = jax.tree.map(fill, state)
    nnx.update(model, state)
    return n
