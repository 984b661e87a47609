"""Device-mesh construction — the framework's parallelism substrate.

The reference is a single-device-per-job system (SURVEY.md §2 parallelism
census: Ray actors, no live NCCL); on TPU the same framework instead scales a
single job across chips with a `jax.sharding.Mesh` and XLA collectives over
ICI. Axes:

  dp — data parallel (batch replicas; independent samples)
  sp — sequence parallel (ring-attention context sharding for long video)
  tp — tensor parallel (attention heads / FFN columns of the big DiTs)

A v5e-8 defaults to pure TP over 8 chips, the north-star layout for the
14B-class models.
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

MESH_AXES: Tuple[str, str, str] = ("dp", "sp", "tp")


def mesh_axes() -> Tuple[str, str, str]:
    return MESH_AXES


def create_mesh(
    dp: int = 1,
    sp: int = 1,
    tp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, sp, tp) mesh. ``tp=None`` absorbs all remaining devices."""
    devs: List[jax.Device] = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if tp is None:
        if n % (dp * sp) != 0:
            raise ValueError(f"{n} devices not divisible by dp*sp={dp * sp}")
        tp = n // (dp * sp)
    used = dp * sp * tp
    if used > n:
        raise ValueError(f"mesh {dp}x{sp}x{tp} needs {used} devices, have {n}")
    grid = np.array(devs[:used]).reshape(dp, sp, tp)
    return Mesh(grid, MESH_AXES)


_current: Optional[Mesh] = None
_lock = threading.Lock()


def get_mesh() -> Optional[Mesh]:
    """The process-wide engine mesh (None → single-device execution)."""
    return _current


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _current
    with _lock:
        _current = mesh


def init_mesh_from_env(spec: Optional[str] = None) -> Optional[Mesh]:
    """Create + install the process mesh from ``APEX_MESH`` at server startup.

    Accepted specs: ``"dp,sp,tp"`` (e.g. ``"2,1,4"``), a single int (= pure
    TP degree), or ``off``/``none`` to force single-device execution. With no
    spec, the default is the north-star layout: **pure TP over all local
    devices** when running on a multi-chip TPU backend, otherwise no mesh.
    An already-installed mesh is kept when no explicit spec is given (tests
    and embedding callers may have set one first).

    This is the production entry point the reference lacks an analogue for
    (it is single-device-per-job via Ray, SURVEY.md §2 census); here a served
    v5e-8 job runs TP-sharded with zero configuration.
    """
    import os

    raw = spec if spec is not None else os.environ.get("APEX_MESH", "")
    raw = raw.strip().lower()
    if raw in ("off", "none"):
        set_mesh(None)
        return None
    if not raw:
        if get_mesh() is not None:
            return get_mesh()
        devs = jax.devices()
        if len(devs) > 1 and devs[0].platform == "tpu":
            mesh = create_mesh(tp=len(devs))
            set_mesh(mesh)
            return mesh
        return None
    parts = [p for p in raw.replace("x", ",").split(",") if p]
    if len(parts) == 1:
        dp, sp, tp = 1, 1, int(parts[0])
    elif len(parts) == 3:
        dp, sp, tp = (int(p) for p in parts)
    else:
        raise ValueError(f"APEX_MESH={raw!r}: expected 'tp' or 'dp,sp,tp'")
    mesh = create_mesh(dp, sp, tp)
    set_mesh(mesh)
    return mesh
