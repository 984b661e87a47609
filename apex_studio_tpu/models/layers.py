"""Shared NNX building blocks for the model families.

Conventions:
- ``dtype`` is the compute dtype (bf16 on TPU), ``param_dtype`` the storage
  dtype. Norm statistics always accumulate in f32 (ops/norms.py).
- Linear kernels are stored [in, out] (JAX convention); the checkpoint loader
  transposes torch's [out, in] on ingest.
- Attention projections flow through the ops/attention registry so every
  family shares the Pallas hot path.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.ops.norms import layer_norm as _layer_norm
from apex_studio_tpu.ops.norms import rms_norm as _rms_norm


def _int8_compute_enabled() -> bool:
    """W8A8 for int8-resident kernels: int8 MXU compute (double-rate on v5e+)
    instead of dequant-to-bf16. DEFAULT ON since round 5 — measured ~7%
    faster end-to-end (BENCH_r04 12.93 vs 13.92 s/image) and numerically
    gated by tests/test_residency.py (<1% per-matmul, <3% through a flux
    block vs the dequant path). APEX_INT8_COMPUTE=0 restores dequant.
    Trace-time static — set before engines jit. Only affects kernels already
    stored int8 (residency); bf16 checkpoints are untouched."""
    return os.environ.get("APEX_INT8_COMPUTE", "1") != "0"


class Linear(nnx.Module):
    def __init__(
        self,
        in_features: int,
        out_features: int,
        *,
        use_bias: bool = True,
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
        rngs: nnx.Rngs,
    ):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (in_features, out_features), param_dtype))
        self.bias = (
            nnx.Param(jnp.zeros((out_features,), param_dtype)) if use_bias else None
        )
        # int8/int4 weight residency (quantize/residency.py): when set,
        # ``kernel`` holds quantized values and ``kernel_scale`` the
        # per-out-channel scales; ``kernel_bits=4`` marks nibble-packed int4.
        # nnx.data marks the slot non-static so residency can fill it later.
        self.kernel_scale = nnx.data(None)
        self.kernel_bits = 8
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel.value
        if self.kernel_scale is not None:
            if getattr(self, "kernel_bits", 8) == 4:
                return self._w4(x)
            if _int8_compute_enabled():
                return self._w8a8(x)
            # Dequantize into the matmul; XLA fuses convert+scale into the
            # MXU operand load, so no bf16 weight copy lands in HBM.
            k = k.astype(self.dtype) * self.kernel_scale.value.astype(self.dtype)
        else:
            k = k.astype(self.dtype)
        y = x.astype(self.dtype) @ k
        if self.bias is not None:
            y = y + self.bias.value.astype(self.dtype)
        return y

    def _w4(self, x: jnp.ndarray) -> jnp.ndarray:
        """Nibble-packed int4 residency (quantize/residency.py
        quantize_kernel_int4 layout: packed [in, out/2] uint8, low nibble =
        column j, high nibble = column j + out/2; stored offset-binary q+8).

        The matmul splits into the two nibble planes so the unpack + scale
        chain stays an elementwise producer XLA fuses into each MXU operand
        load — no full bf16 weight copy lands in HBM."""
        u = self.kernel.value
        s = self.kernel_scale.value
        half = u.shape[1]
        xd = x.astype(self.dtype)
        lo = ((u & 0xF).astype(jnp.int8) - 8).astype(self.dtype)
        hi = ((u >> 4).astype(jnp.int8) - 8).astype(self.dtype)
        y = jnp.concatenate(
            [xd @ (lo * s[:half].astype(self.dtype)),
             xd @ (hi * s[half:].astype(self.dtype))], axis=-1)
        if self.bias is not None:
            y = y + self.bias.value.astype(self.dtype)
        return y

    def _w8a8(self, x: jnp.ndarray) -> jnp.ndarray:
        """int8 MXU compute for int8-resident kernels (APEX_INT8_COMPUTE=1).

        Dynamic symmetric per-token activation quantization against the
        per-output-channel weight scales (the standard W8A8 recipe; the
        reference's GGUF Q8_0 variants play the same role on CUDA via
        llama.cpp-style int8 dots). s8 x s8 -> s32 rides the MXU's
        double-rate int8 path on v5e+; rescale happens once per output tile
        in f32. Read at trace time — set the env before engines jit.
        """
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
        xq = jnp.clip(jnp.rint(xf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq,
            self.kernel.value,
            dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * sx * self.kernel_scale.value.astype(jnp.float32)
        y = y.astype(self.dtype)
        if self.bias is not None:
            y = y + self.bias.value.astype(self.dtype)
        return y


class RMSNorm(nnx.Module):
    def __init__(self, dim: int, *, eps: float = 1e-5, elementwise_affine: bool = True,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        self.eps = eps
        self.weight = (
            nnx.Param(jnp.ones((dim,), param_dtype)) if elementwise_affine else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _rms_norm(x, None if self.weight is None else self.weight.value, self.eps)


class LayerNorm(nnx.Module):
    def __init__(self, dim: int, *, eps: float = 1e-6, elementwise_affine: bool = True,
                 use_bias: bool = True, param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((dim,), param_dtype)) if elementwise_affine else None
        self.bias = (
            nnx.Param(jnp.zeros((dim,), param_dtype))
            if (elementwise_affine and use_bias)
            else None
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _layer_norm(
            x,
            None if self.weight is None else self.weight.value,
            None if self.bias is None else self.bias.value,
            self.eps,
        )


class SwiGLU(nnx.Module):
    """w2(silu(w1·x) * w3·x) — the LLaMA/ZImage/Wan FFN shape."""

    def __init__(self, dim: int, hidden_dim: int, *, use_bias: bool = False,
                 dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, rngs: nnx.Rngs):
        kw = dict(use_bias=use_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.w1 = Linear(dim, hidden_dim, **kw)
        self.w3 = Linear(dim, hidden_dim, **kw)
        self.w2 = Linear(hidden_dim, dim, **kw)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.w2(nnx.silu(self.w1(x)) * self.w3(x))


class GELUMLP(nnx.Module):
    """fc2(gelu(fc1·x)) — the DiT/ViT FFN shape."""

    def __init__(self, dim: int, hidden_dim: int, *, use_bias: bool = True,
                 approximate: bool = True, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 rngs: nnx.Rngs):
        kw = dict(use_bias=use_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.fc1 = Linear(dim, hidden_dim, **kw)
        self.fc2 = Linear(hidden_dim, dim, **kw)
        self.approximate = approximate

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.fc2(nnx.gelu(self.fc1(x), approximate=self.approximate))


class TimestepEmbedder(nnx.Module):
    """Sinusoidal frequencies → MLP, the DiT conditioning stem."""

    def __init__(self, out_size: int, mid_size: Optional[int] = None, *,
                 freq_size: int = 256, max_period: float = 10000.0,
                 flip_sin_to_cos: bool = True,
                 dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, rngs: nnx.Rngs):
        from apex_studio_tpu.ops.embeddings import timestep_embedding

        mid = mid_size if mid_size is not None else out_size
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.in_layer = Linear(freq_size, mid, **kw)
        self.out_layer = Linear(mid, out_size, **kw)
        self.freq_size = freq_size
        self.max_period = max_period
        self.flip_sin_to_cos = flip_sin_to_cos
        self._embed: Callable = timestep_embedding

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        freqs = self._embed(
            t, self.freq_size, max_period=self.max_period, flip_sin_to_cos=self.flip_sin_to_cos
        )
        return self.out_layer(nnx.silu(self.in_layer(freqs)))
