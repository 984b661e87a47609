"""GGUF quantization writers — quantize a state dict and emit a GGUF file.

TPU-native counterpart of the reference's quantize pipeline
(``src/quantize/quantize.py:20`` TextEncoderQuantizer, ``:125``
TransformerQuantizer, ``src/quantize/quants.py`` QuantType map). The reference
shells out to llama.cpp for K-quants and uses gguf-py writers for the rest;
here the block packers are first-party vectorized numpy (layouts per ggml's
quantization spec) and the container writer emits GGUF v3 directly, so a model
quantized on a TPU host round-trips through ``load_gguf_state_dict`` with no
third-party tooling.

Supported quant types: F32, F16, BF16, Q8_0, Q4_0, Q4_1, Q5_0, Q5_1, Q6_K.
Tensors whose trailing dim is not a multiple of the block size (biases, norms)
are stored unquantized at F32, matching ggml convention.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any, Dict, Iterable, Mapping, Tuple, Union

import numpy as np

try:
    import ml_dtypes
except ImportError:  # pragma: no cover
    ml_dtypes = None

# name → (ggml type id, block_bytes, elements_per_block)
QUANT_TYPES = {
    "F32": (0, 4, 1),
    "F16": (1, 2, 1),
    "Q4_0": (2, 18, 32),
    "Q4_1": (3, 20, 32),
    "Q5_0": (6, 22, 32),
    "Q5_1": (7, 24, 32),
    "Q8_0": (8, 34, 32),
    "Q6_K": (14, 210, 256),
    "BF16": (30, 2, 1),
}


def _f16_bytes(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float16).view(np.uint8)


def _quant_q8_0(x: np.ndarray) -> np.ndarray:
    blocks = x.reshape(-1, 32).astype(np.float32)
    amax = np.abs(blocks).max(axis=1)
    d = amax / 127.0
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    q = np.clip(np.rint(blocks * inv[:, None]), -127, 127).astype(np.int8)
    out = np.empty((blocks.shape[0], 34), np.uint8)
    out[:, :2] = _f16_bytes(d).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def _quant_q4_0(x: np.ndarray) -> np.ndarray:
    blocks = x.reshape(-1, 32).astype(np.float32)
    # ggml: d is the max-|x| element WITH its sign, divided by -8.
    idx = np.abs(blocks).argmax(axis=1)
    mx = blocks[np.arange(blocks.shape[0]), idx]
    d = mx / -8.0
    inv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1.0), 0.0)
    q = np.clip(np.rint(blocks * inv[:, None]) + 8, 0, 15).astype(np.uint8)
    out = np.empty((blocks.shape[0], 18), np.uint8)
    out[:, :2] = _f16_bytes(d).reshape(-1, 2)
    out[:, 2:] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def _quant_q4_1(x: np.ndarray) -> np.ndarray:
    blocks = x.reshape(-1, 32).astype(np.float32)
    mn = blocks.min(axis=1)
    mx = blocks.max(axis=1)
    d = (mx - mn) / 15.0
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    q = np.clip(np.rint((blocks - mn[:, None]) * inv[:, None]), 0, 15).astype(np.uint8)
    out = np.empty((blocks.shape[0], 20), np.uint8)
    out[:, :2] = _f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = _f16_bytes(mn).reshape(-1, 2)
    out[:, 4:] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def _pack_qh(q: np.ndarray) -> np.ndarray:
    """Pack bit 4 of 32 5-bit values into one uint32 per block → 4 LE bytes."""
    hbits = ((q >> 4) & 1).astype(np.uint32)  # (n, 32)
    shifts = np.arange(32, dtype=np.uint32)
    qh = (hbits << shifts).sum(axis=1, dtype=np.uint32)
    return qh.astype("<u4").view(np.uint8).reshape(-1, 4)


def _quant_q5_0(x: np.ndarray) -> np.ndarray:
    blocks = x.reshape(-1, 32).astype(np.float32)
    idx = np.abs(blocks).argmax(axis=1)
    mx = blocks[np.arange(blocks.shape[0]), idx]
    d = mx / -16.0
    inv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1.0), 0.0)
    q = np.clip(np.rint(blocks * inv[:, None]) + 16, 0, 31).astype(np.uint8)
    out = np.empty((blocks.shape[0], 22), np.uint8)
    out[:, :2] = _f16_bytes(d).reshape(-1, 2)
    out[:, 2:6] = _pack_qh(q)
    out[:, 6:] = (q[:, :16] & 0x0F) | ((q[:, 16:] & 0x0F) << 4)
    return out.reshape(-1)


def _quant_q5_1(x: np.ndarray) -> np.ndarray:
    blocks = x.reshape(-1, 32).astype(np.float32)
    mn = blocks.min(axis=1)
    mx = blocks.max(axis=1)
    d = (mx - mn) / 31.0
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    q = np.clip(np.rint((blocks - mn[:, None]) * inv[:, None]), 0, 31).astype(np.uint8)
    out = np.empty((blocks.shape[0], 24), np.uint8)
    out[:, :2] = _f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = _f16_bytes(mn).reshape(-1, 2)
    out[:, 4:8] = _pack_qh(q)
    out[:, 8:] = (q[:, :16] & 0x0F) | ((q[:, 16:] & 0x0F) << 4)
    return out.reshape(-1)


def _quant_q6_k(x: np.ndarray) -> np.ndarray:
    """256-value super-blocks, 16 sub-blocks of 16 values with int8 sub-scales.

    Scale fit: per-sub-block amax/-32 relative to a shared f16 super-scale d,
    a direct (non-iterative) variant of ggml's make_qx_quants search. The
    layout is bit-exact ggml Q6_K so any GGUF reader decodes it.
    """
    blocks = x.reshape(-1, 256).astype(np.float32)
    n = blocks.shape[0]
    sub = blocks.reshape(n, 16, 16)
    idx = np.abs(sub).argmax(axis=2)
    smax = np.take_along_axis(sub, idx[:, :, None], axis=2)[:, :, 0]  # signed max |.|
    sub_scale = smax / -32.0  # (n, 16)
    amax_scale = np.abs(sub_scale).max(axis=1)
    d = (amax_scale / 127.0).astype(np.float32)
    inv_d = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    sc = np.clip(np.rint(sub_scale * inv_d[:, None]), -127, 127).astype(np.int8)
    eff = d[:, None] * sc.astype(np.float32)  # effective per-sub scale
    inv_eff = np.where(eff != 0, 1.0 / np.where(eff != 0, eff, 1.0), 0.0)
    q = np.clip(np.rint(sub * inv_eff[:, :, None]), -32, 31).astype(np.int16) + 32
    q = q.reshape(n, 256).astype(np.uint8)  # values in [0, 63]

    out = np.empty((n, 210), np.uint8)
    ql = out[:, :128]
    qh = out[:, 128:192]
    for half in range(2):
        v = q[:, half * 128 : (half + 1) * 128]
        # low nibbles: ql[i] = (v[i] & 0xF) | ((v[i+64] & 0xF) << 4) — matches reader:
        # q1 = l[:, :32] & 0xF (v[0:32]),  q3 = l[:, :32] >> 4 (v[64:96]) …
        lo = v & 0x0F
        ql[:, half * 64 : half * 64 + 64] = np.concatenate(
            [lo[:, :32] | (lo[:, 64:96] << 4), lo[:, 32:64] | (lo[:, 96:128] << 4)],
            axis=1,
        )
        hi = (v >> 4) & 3  # 2 high bits of each 6-bit value
        qh[:, half * 32 : half * 32 + 32] = (
            hi[:, :32] | (hi[:, 32:64] << 2) | (hi[:, 64:96] << 4) | (hi[:, 96:128] << 6)
        )
    out[:, 192:208] = sc.view(np.uint8)
    out[:, 208:210] = _f16_bytes(d).reshape(-1, 2)
    return out.reshape(-1)


_QUANTIZERS = {
    "Q8_0": _quant_q8_0,
    "Q4_0": _quant_q4_0,
    "Q4_1": _quant_q4_1,
    "Q5_0": _quant_q5_0,
    "Q5_1": _quant_q5_1,
    "Q6_K": _quant_q6_k,
}


def quantize_tensor(x: np.ndarray, qtype: str) -> Tuple[bytes, int]:
    """Quantize one tensor → (raw bytes, ggml type id actually used).

    Falls back to F32 when the tensor doesn't tile into the format's block
    size or is not floating point (ggml stores such tensors unquantized).
    """
    if qtype not in QUANT_TYPES:
        raise ValueError(f"unknown quant type {qtype!r}; have {sorted(QUANT_TYPES)}")
    tid, _, block = QUANT_TYPES[qtype]
    x = np.asarray(x)
    if qtype == "F32":
        return np.ascontiguousarray(x, dtype=np.float32).tobytes(), tid
    if qtype == "F16":
        return np.ascontiguousarray(x, dtype=np.float16).tobytes(), tid
    if qtype == "BF16":
        if ml_dtypes is None:  # pragma: no cover
            raise RuntimeError("bf16 GGUF requires ml_dtypes")
        return np.ascontiguousarray(x.astype(ml_dtypes.bfloat16)).tobytes(), tid
    if x.ndim < 2 or x.shape[-1] % block != 0 or not np.issubdtype(x.dtype, np.floating):
        return np.ascontiguousarray(x, dtype=np.float32).tobytes(), QUANT_TYPES["F32"][0]
    return _QUANTIZERS[qtype](x.astype(np.float32)).tobytes(), tid


def _write_value(f, value: Any) -> None:
    """Write one GGUF metadata value with its type tag."""
    if isinstance(value, bool):
        f.write(struct.pack("<I", 7) + struct.pack("<?", value))
    elif isinstance(value, int):
        f.write(struct.pack("<I", 5) + struct.pack("<i", value))
    elif isinstance(value, float):
        f.write(struct.pack("<I", 6) + struct.pack("<f", value))
    elif isinstance(value, str):
        raw = value.encode("utf-8")
        f.write(struct.pack("<I", 8) + struct.pack("<Q", len(raw)) + raw)
    elif isinstance(value, (list, tuple)):
        f.write(struct.pack("<I", 9))
        # homogeneous arrays only; infer element tag from the first element
        if not value or isinstance(value[0], str):
            f.write(struct.pack("<I", 8) + struct.pack("<Q", len(value)))
            for v in value:
                raw = str(v).encode("utf-8")
                f.write(struct.pack("<Q", len(raw)) + raw)
        elif isinstance(value[0], float):
            f.write(struct.pack("<I", 6) + struct.pack("<Q", len(value)))
            f.write(struct.pack(f"<{len(value)}f", *value))
        else:
            f.write(struct.pack("<I", 5) + struct.pack("<Q", len(value)))
            f.write(struct.pack(f"<{len(value)}i", *value))
    else:
        raise TypeError(f"unsupported GGUF metadata value {type(value)}")


def write_gguf(
    path: Union[str, Path],
    tensors: Mapping[str, np.ndarray],
    qtype: str = "Q8_0",
    metadata: Mapping[str, Any] | None = None,
    skip_quant: Iterable[str] = (),
    alignment: int = 32,
) -> Dict[str, str]:
    """Quantize ``tensors`` to ``qtype`` and write a GGUF v3 file.

    ``skip_quant`` lists name substrings kept at F32 (norms, embeddings…).
    Returns {tensor name: quant type used} for reporting/tests.
    """
    meta: Dict[str, Any] = {
        "general.architecture": "apex",
        "general.quantization_version": 2,
        "general.alignment": alignment,
        "general.file_type": QUANT_TYPES[qtype][0],
    }
    if metadata:
        meta.update(metadata)

    names = list(tensors.keys())
    payloads: Dict[str, Tuple[bytes, int]] = {}
    used: Dict[str, str] = {}
    tid_to_name = {v[0]: k for k, v in QUANT_TYPES.items()}
    for name in names:
        t_q = "F32" if any(s in name for s in skip_quant) else qtype
        raw, tid = quantize_tensor(tensors[name], t_q)
        payloads[name] = (raw, tid)
        used[name] = tid_to_name[tid]

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<Q", len(names)))
        f.write(struct.pack("<Q", len(meta)))
        for key, value in meta.items():
            raw_key = key.encode("utf-8")
            f.write(struct.pack("<Q", len(raw_key)) + raw_key)
            _write_value(f, value)
        offset = 0
        for name in names:
            raw, tid = payloads[name]
            raw_name = name.encode("utf-8")
            f.write(struct.pack("<Q", len(raw_name)) + raw_name)
            dims = tuple(reversed(np.asarray(tensors[name]).shape))  # innermost-first
            f.write(struct.pack("<I", len(dims)))
            f.write(struct.pack(f"<{len(dims)}Q", *dims))
            f.write(struct.pack("<IQ", tid, offset))
            offset += (len(raw) + alignment - 1) // alignment * alignment
        pos = f.tell()
        f.write(b"\x00" * ((pos + alignment - 1) // alignment * alignment - pos))
        for name in names:
            raw, _ = payloads[name]
            f.write(raw)
            pad = (len(raw) + alignment - 1) // alignment * alignment - len(raw)
            f.write(b"\x00" * pad)
    return used
