"""Apply a (converted) torch-layout state dict onto an NNX model.

Transforms are inferred from the target leaf:
  - ``*.kernel`` + 2-D source  → transpose [out,in] → [in,out]
  - ``*.kernel`` + 4-D source  → OIHW → HWIO
  - ``*.kernel`` + 5-D source  → OIDHW → DHWIO (3-D convs)
  - everything else            → copied as-is

With a mesh + ShardingRules, each tensor is placed directly with
``jax.device_put(..., NamedSharding)`` — weights stream from the checkpoint
mmap onto the mesh without a full host-side model replica.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding

from apex_studio_tpu.parallel.sharding import ShardingRules


def _walk(module: Any, parts: List[str]) -> Any:
    obj = module
    for p in parts:
        if isinstance(obj, (list, tuple)):
            obj = obj[int(p)]
        elif p.isdigit() and not hasattr(obj, p):
            obj = obj[int(p)]
        else:
            obj = getattr(obj, p)
    return obj


def assign_by_path(model: nnx.Module, path: str, value: jnp.ndarray) -> None:
    *parents, leaf = path.split(".")
    obj = _walk(model, parents)
    target = getattr(obj, leaf)
    if isinstance(target, nnx.Variable):
        if tuple(target.shape) != tuple(value.shape):
            raise ValueError(
                f"{path}: shape mismatch, model {tuple(target.shape)} vs checkpoint {tuple(value.shape)}"
            )
        target.value = value
    else:
        raise TypeError(f"{path}: target is not an nnx.Variable ({type(target)})")


def _infer_transform(path: str, arr: np.ndarray) -> np.ndarray:
    if path.endswith(".kernel"):
        if arr.ndim == 2:
            return arr.T
        if arr.ndim == 4:
            return arr.transpose(2, 3, 1, 0)
        if arr.ndim == 5:
            return arr.transpose(2, 3, 4, 1, 0)
    if path.endswith("_kernel"):
        # 1x1 torch convs loaded into plain matmul params: [O,C,1,1] → [C,O].
        if arr.ndim == 4 and arr.shape[2] == arr.shape[3] == 1:
            return arr[:, :, 0, 0].T
        if arr.ndim == 2:
            return arr.T
    if path.endswith(".gamma") and arr.ndim > 1:
        # Wan RMS gamma stored [C,1,1(,1)] → [C].
        return arr.reshape(arr.shape[0])
    return arr


def _leaf_meta(model: nnx.Module, path: str):
    *parents, leaf = path.split(".")
    try:
        target = getattr(_walk(model, parents), leaf)
        return target.value.dtype, tuple(target.value.shape)
    except Exception:
        return None, None


def _reconcile_shape(arr: np.ndarray, target_shape: tuple) -> np.ndarray:
    """Last-resort layout fixes where the generic transform can't know the
    target: e.g. a Conv3d patch-embed [O,C,pt,ph,pw] loaded into a Linear
    kernel [C·pt·ph·pw, O]."""
    if tuple(arr.shape) == target_shape:
        return arr
    if arr.ndim != len(target_shape) and int(np.prod(arr.shape)) == int(
        np.prod(target_shape)
    ):
        # Pure rank fix (e.g. squeezing broadcast singletons); never reshape
        # same-rank mismatches — those are real errors.
        return arr.reshape(target_shape)
    return arr


def apply_state_dict(
    model: nnx.Module,
    state: Dict[str, np.ndarray],
    *,
    mesh: Optional[Mesh] = None,
    rules: Optional[ShardingRules] = None,
    strict: bool = True,
) -> Tuple[List[str], List[str]]:
    """Assign every entry of ``state`` (our-path keyed) into ``model``.

    Returns (missing_in_checkpoint, unexpected_in_checkpoint) — computed against
    the model's parameter set like the reference's completeness checks.
    """
    applied = set()
    unexpected: List[str] = []
    for path, arr in state.items():
        arr = np.asarray(arr)
        dtype, target_shape = _leaf_meta(model, path)
        if dtype is None:
            unexpected.append(path)
            continue
        if target_shape is not None and len(target_shape) == 2 and arr.ndim > 2:
            # Conv-style weight flattened into a Linear (e.g. patch embeddings):
            # torch [O, C, *k] → [C·∏k, O], feature order matching patchify.
            arr = arr.reshape(arr.shape[0], -1).T
        else:
            arr = _infer_transform(path, arr)
            if target_shape is not None:
                arr = _reconcile_shape(arr, target_shape)
        arr = arr.astype(dtype) if arr.dtype != dtype else arr
        if mesh is not None and rules is not None:
            value = jax.device_put(arr, NamedSharding(mesh, rules.spec_for(path)))
        else:
            value = jnp.asarray(arr)
        assign_by_path(model, path, value)
        applied.add(path)

    model_paths = {
        ".".join(str(p) for p in kp): None
        for kp, _ in nnx.to_flat_state(nnx.state(model))
    }
    missing = sorted(set(model_paths) - applied)
    if strict and unexpected:
        raise KeyError(f"checkpoint keys not in model: {unexpected[:8]}{'…' if len(unexpected) > 8 else ''}")
    if strict and missing:
        raise KeyError(f"model params missing from checkpoint: {missing[:8]}{'…' if len(missing) > 8 else ''}")
    return missing, unexpected
