"""Tracing / profiling (counterpart of src/utils/step_mem.py + jax.profiler glue).

- ``step_trace(name)``: env-gated (APEX_STEP_TRACE=1) per-stage wall-clock +
  host-RSS + device-memory snapshots, logged and accumulated — the reference's
  per-step memory tracer rebuilt on jax device_memory_stats.
- ``profile_to(dir)``: context manager around jax.profiler for full XLA traces
  (view with TensorBoard / xprof).
- ``device_memory_report()``: powers /system/memory.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Any, Dict, List, Optional

logger = logging.getLogger("apex.profiling")

_records: List[Dict[str, Any]] = []


def enabled() -> bool:
    return os.environ.get("APEX_STEP_TRACE", "0") in ("1", "true")


def device_memory_report() -> List[Dict[str, Any]]:
    try:
        import jax

        out = []
        for d in jax.devices():
            stats: Dict[str, Any] = {}
            try:
                stats = d.memory_stats() or {}
            except Exception:
                pass
            out.append(
                {
                    "id": d.id,
                    "platform": d.platform,
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit"),
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                }
            )
        return out
    except Exception:
        return []


def _host_rss_bytes() -> Optional[int]:
    try:
        import psutil

        return psutil.Process().memory_info().rss
    except Exception:
        return None


@contextlib.contextmanager
def step_trace(name: str, extra: Optional[Dict[str, Any]] = None):
    """Record wall time + memory around a pipeline stage (no-op unless enabled)."""
    if not enabled():
        yield
        return
    t0 = time.perf_counter()
    rss0 = _host_rss_bytes()
    try:
        yield
    finally:
        rec = {
            "name": name,
            "wall_s": round(time.perf_counter() - t0, 4),
            "rss_before": rss0,
            "rss_after": _host_rss_bytes(),
            "devices": device_memory_report(),
            **(extra or {}),
        }
        _records.append(rec)
        logger.info("step_trace %s: %.3fs", name, rec["wall_s"])


def records() -> List[Dict[str, Any]]:
    return list(_records)


def clear() -> None:
    _records.clear()


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a full XLA profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
