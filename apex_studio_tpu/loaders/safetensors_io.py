"""safetensors ingestion → numpy (bf16 via ml_dtypes, fp8 dequant-on-load).

Counterpart of the loading half of the reference's LoaderMixin/quantize stack:
TPU has no fp8 fast path on v5e, so fp8-scaled checkpoints are dequantized to
bf16 at load time (scale tensors consumed here, SURVEY.md §7 step 9).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Union

import json
import numpy as np

try:
    import ml_dtypes
except ImportError:  # pragma: no cover
    ml_dtypes = None

_ST_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}
if ml_dtypes is not None:
    _ST_DTYPES["BF16"] = ml_dtypes.bfloat16
    _ST_DTYPES["F8_E4M3"] = ml_dtypes.float8_e4m3fn
    _ST_DTYPES["F8_E5M2"] = ml_dtypes.float8_e5m2


def _read_header(path: Path):
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n).decode("utf-8"))
    return header, 8 + n


def safetensors_keys(path: Union[str, Path]) -> List[str]:
    header, _ = _read_header(Path(path))
    return [k for k in header if k != "__metadata__"]


def load_safetensors(
    path: Union[str, Path],
    keys: Optional[Iterable[str]] = None,
    dtype: Optional[np.dtype] = None,
) -> Dict[str, np.ndarray]:
    """Memory-map a .safetensors file and return (optionally cast) numpy arrays.

    Slices are views into the mmap until cast — peak host RSS stays at the
    size of the tensors actually materialized.
    """
    path = Path(path)
    header, data_start = _read_header(path)
    mm = np.memmap(path, mode="r", dtype=np.uint8)
    out: Dict[str, np.ndarray] = {}
    wanted = set(keys) if keys is not None else None
    for name, info in header.items():
        if name == "__metadata__" or (wanted is not None and name not in wanted):
            continue
        st_dtype = info["dtype"]
        np_dtype = _ST_DTYPES.get(st_dtype)
        if np_dtype is None:
            raise ValueError(f"{path}: unsupported safetensors dtype {st_dtype} for {name}")
        begin, end = info["data_offsets"]
        raw = mm[data_start + begin : data_start + end]
        arr = raw.view(np_dtype).reshape(info["shape"])
        if dtype is not None and arr.dtype != dtype:
            arr = arr.astype(dtype)
        out[name] = arr
    return out


def load_sharded_safetensors(
    directory: Union[str, Path],
    index_file: str = "model.safetensors.index.json",
    dtype: Optional[np.dtype] = None,
) -> Dict[str, np.ndarray]:
    """Load a HF sharded checkpoint directory (or a dir of .safetensors files)."""
    directory = Path(directory)
    index_path = directory / index_file
    out: Dict[str, np.ndarray] = {}
    if index_path.exists():
        index = json.loads(index_path.read_text())
        by_file: Dict[str, List[str]] = {}
        for key, fname in index["weight_map"].items():
            by_file.setdefault(fname, []).append(key)
        for fname, ks in by_file.items():
            out.update(load_safetensors(directory / fname, keys=ks, dtype=dtype))
        return out
    files = sorted(directory.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors found under {directory}")
    for f in files:
        out.update(load_safetensors(f, dtype=dtype))
    return out


def load_torch_checkpoint(path: Union[str, Path]) -> Dict[str, np.ndarray]:
    """torch-pickle checkpoints (.pth/.ckpt/.pt) → numpy state dict.

    The reference ships several weights only in this format (SeedVR2
    ``ema_vae.pth``, FlashVSR ``LQ_proj_in.ckpt``, TAEHV ``taehv.pth``).
    Nested {"state_dict": ...} containers are unwrapped; non-tensor entries
    are dropped.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "module"):
        if isinstance(obj, dict) and isinstance(obj.get(key), dict):
            obj = obj[key]
    out: Dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).numpy() if v.dtype in (
                torch.bfloat16, torch.float16) else v.detach().numpy()
        elif isinstance(v, np.ndarray):
            out[k] = v
    return out


def dequantize_fp8_scaled(sd: Dict[str, np.ndarray], target=np.float32) -> Dict[str, np.ndarray]:
    """Fold `<name>.scale_weight` / `scale` tensors into their quantized
    weights at load time:

    - fp8 (e4m3/e5m2) weights: cast + multiply (reference
      ``quantize/scaled_layer.py`` fp8_activation_dequant semantics).
    - FP4-scaled weights (reference ``scaled_layer.py:76`` quantize_to_fp4):
      int8/uint8 tensors holding signed 4-bit codes in [-7, 7] with a
      broadcastable pow2 ``scale_weight`` → ``q * scale`` (``:118``
      dequantize_from_fp4). TPU has no 4-bit native grid, so like fp8 these
      land as bf16/f32 host-side; int4 *residency* (quantize/residency.py)
      is the on-device compressed tier.
    """
    out: Dict[str, np.ndarray] = {}
    scale_suffixes = (".scale_weight", ".weight_scale", "_scale")
    scales = {k: v for k, v in sd.items() if k.endswith(scale_suffixes)}

    def _scale_for(key: str):
        for suf in scale_suffixes:
            cand = key.rsplit(".", 1)[0] + suf
            if cand in scales:
                return scales[cand]
        return None

    for key, arr in sd.items():
        if key in scales:
            continue
        if ml_dtypes is not None and arr.dtype in (
            ml_dtypes.float8_e4m3fn,
            ml_dtypes.float8_e5m2,
        ):
            scale = _scale_for(key)
            arr = arr.astype(target)
            if scale is not None:
                arr = arr * scale.astype(target)
        elif arr.dtype in (np.int8, np.uint8):
            scale = _scale_for(key)
            if scale is not None:  # FP4-scaled entry (codes are signed)
                codes = arr.view(np.int8).astype(target)
                arr = codes * scale.astype(target)
        out[key] = arr
    return out


def save_safetensors(path: Union[str, Path], tensors: Dict[str, np.ndarray],
                     metadata: Optional[Dict[str, str]] = None) -> None:
    """Write a .safetensors file (header JSON + contiguous little-endian
    payloads). Counterpart of safetensors.torch.save_file for the training
    data pipeline (reference apps/train/zimage/{text,vae}_encode.py)."""
    rev = {v: k for k, v in _ST_DTYPES.items()}
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = dict(metadata)
    offset = 0
    blobs = []
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        st_dtype = rev.get(arr.dtype.type) or rev.get(np.dtype(arr.dtype).type)
        if st_dtype is None:
            arr = arr.astype(np.float32)
            st_dtype = "F32"
        blob = arr.tobytes()
        header[name] = {"dtype": st_dtype, "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(blob)]}
        offset += len(blob)
        blobs.append(blob)
    hdr = json.dumps(header).encode("utf-8")
    pad = (-len(hdr)) % 8
    hdr += b" " * pad
    with open(path, "wb") as f:
        f.write(len(hdr).to_bytes(8, "little"))
        f.write(hdr)
        for blob in blobs:
            f.write(blob)
