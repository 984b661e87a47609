"""Host-RAM block streaming — run bigger-than-HBM models on one chip.

TPU-native counterpart of the reference's group/budget offloading
(``src/memory_management/group_offloading.py:851``, ``budget_offloading.py``):
where the reference moves torch module groups between CUDA and pinned host
memory with stream-ordered prefetch, here the transformer's homogeneous block
stack lives in host RAM as numpy pytrees and is streamed through HBM with
double buffering — ``jax.device_put`` for block ``i+1`` is enqueued before
block ``i``'s jitted forward runs, so on TPU the PCIe/DMA transfer overlaps
the MXU work. Peak HBM = 2 blocks + activations + the non-block remainder
(embedders / head), which keeps a 14B bf16 DiT (~28 GB) runnable on a single
16 GB v5e chip at the cost of streaming bandwidth.

The fast paths remain TP sharding over the mesh (``parallel/sharding.py``) and
int8 residency (``quantize/residency.py``); this is the correctness fallback
when neither fits, mirroring the reference's "apex_framepack on 8 GB" goal.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from flax import nnx


def params_nbytes(model: nnx.Module) -> int:
    """Total bytes of every array leaf in the module's state."""
    _, state = nnx.split(model)
    return sum(
        a.size * a.dtype.itemsize
        for a in jax.tree.leaves(state)
        if hasattr(a, "dtype") and hasattr(a, "size")
    )


def hbm_budget_bytes(device: Optional[jax.Device] = None) -> Optional[int]:
    """Usable accelerator memory, or None when the platform doesn't report it
    (CPU test meshes). Uses the live allocator stats so warm-pool residents
    count against the budget."""
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:  # pragma: no cover - platform without stats
        return None
    if not stats or "bytes_limit" not in stats:
        return None
    return int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))


def should_stream(model: nnx.Module, *, device: Optional[jax.Device] = None,
                  fraction: float = 0.75) -> bool:
    """True when the model's parameters alone would eat ``fraction`` of the
    chip's free HBM — the gate the engine consults before enabling streaming
    (reference gates on torch.cuda.mem_get_info, budget_offloading.py)."""
    budget = hbm_budget_bytes(device)
    if budget is None:
        return False
    return params_nbytes(model) > fraction * budget


class HostOffloadedBlocks:
    """A homogeneous nnx block stack stored in host RAM, executed by streaming.

    ``blocks`` must share a graphdef (same class/config — true for every DiT
    family here). The per-block forward is jitted once and reused; blocks are
    double-buffered through the target device.

        stack = HostOffloadedBlocks(model.blocks)
        model.blocks = None            # drop the device copies
        x = stack(x, temb, rope)       # streams host→HBM block by block
    """

    def __init__(self, blocks: Sequence[nnx.Module],
                 device: Optional[jax.Device] = None):
        if not blocks:
            raise ValueError("need at least one block")
        self.graphdef, state0 = nnx.split(blocks[0])
        # Host copies: plain numpy so they never count against HBM.
        self.host_states = [
            jax.tree.map(lambda a: np.asarray(a), nnx.split(b)[1]) for b in blocks
        ]
        self.device = device
        self._jitted: Optional[Callable[..., Any]] = None

    def __len__(self) -> int:
        return len(self.host_states)

    def _fn(self):
        if self._jitted is None:
            graphdef = self.graphdef

            def apply(state, x, *args):
                return nnx.merge(graphdef, state)(x, *args)

            # x is consumed each step — donate it so XLA reuses the buffer.
            self._jitted = jax.jit(apply, donate_argnums=1)
        return self._jitted

    def __call__(self, x, *args):
        device = self.device or jax.local_devices()[0]
        fn = self._fn()
        cur = jax.device_put(self.host_states[0], device)
        n = len(self.host_states)
        for i in range(n):
            # Enqueue the next block's host→device copy before running this
            # block; on TPU the transfer overlaps the compute.
            nxt = (
                jax.device_put(self.host_states[i + 1], device) if i + 1 < n else None
            )
            x = fn(cur, x, *args)
            cur = nxt  # the old device copy is freed once its step retires
        return x


def stream_blocks(blocks: Sequence[nnx.Module], x, *args,
                  device: Optional[jax.Device] = None):
    """One-shot convenience: stream ``x`` through ``blocks`` host→device."""
    return HostOffloadedBlocks(blocks, device=device)(x, *args)
