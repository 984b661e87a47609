"""step_mem — pause-and-print memory tracing for debugging.

Counterpart of the reference's ``src/utils/step_mem.py`` (step_mem:274):
print host + accelerator memory and the largest live tensors at a callsite,
optionally resetting the peak counter and pausing for a keypress.

TPU translation of the collectors:
- CUDA allocator stats (``_collect_cuda_mem``) → per-device
  ``Device.memory_stats()`` (bytes_in_use / peak_bytes_in_use / limit),
- live CUDA tensor walk via gc (``_collect_live_tensors``) →
  ``jax.live_arrays()``, grouped by (shape, dtype, device) so thousands of
  identical block params collapse to one line,
- psutil RSS is the same on both sides.

Usage (same contract as the reference):

    from apex_studio_tpu.utils.step_mem import step_mem
    step_mem("before forward")
    out = fn(x)
    step_mem("after forward", top=5)
"""

from __future__ import annotations

import inspect
import os
import sys
from collections import defaultdict
from typing import IO, Any, Dict, List, Optional

__all__ = ["step_mem", "collect_device_mem", "collect_live_arrays"]


def _fmt_bytes(n: Optional[float]) -> str:
    if n is None:
        return "n/a"
    n_f = float(n)
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n_f) < 1024.0:
            return f"{n_f:,.2f} {unit}"
        n_f /= 1024.0
    return f"{n_f:,.2f} PiB"


def _callsite(skip: int = 2) -> str:
    try:
        frame = inspect.stack()[skip]
        return (f"{os.path.basename(frame.filename)}:{frame.lineno} "
                f"in {frame.function}")
    except Exception:
        return "unknown"


def _collect_host_mem() -> Dict[str, Any]:
    try:
        import psutil

        proc = psutil.Process(os.getpid())
        info = proc.memory_info()
        return {"rss": info.rss, "vms": info.vms}
    except Exception:
        try:  # stdlib fallback
            import resource

            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
            return {"rss": rss, "vms": None}
        except Exception:
            return {"rss": None, "vms": None}


def collect_device_mem(device_filter: Optional[str] = None) -> List[Dict[str, Any]]:
    """Per-device allocator stats (Device.memory_stats where supported)."""
    import jax

    out = []
    for dev in jax.local_devices():
        if device_filter and device_filter not in str(dev):
            continue
        stats: Dict[str, Any] = {"device": str(dev)}
        try:
            s = dev.memory_stats() or {}
            stats.update({
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
                "num_allocs": s.get("num_allocs"),
            })
        except Exception:
            stats["bytes_in_use"] = None
        out.append(stats)
    return out


def collect_live_arrays(top: int = 10,
                        device_filter: Optional[str] = None
                        ) -> List[Dict[str, Any]]:
    """Largest live jax array groups, grouped by (shape, dtype, device)."""
    import jax

    groups: Dict[tuple, Dict[str, Any]] = defaultdict(
        lambda: {"count": 0, "nbytes": 0})
    for arr in jax.live_arrays():
        try:
            dev = str(next(iter(arr.devices())))
        except Exception:
            dev = "?"
        if device_filter and device_filter not in dev:
            continue
        key = (str(arr.shape), str(arr.dtype), dev)
        g = groups[key]
        g["count"] += 1
        g["nbytes"] += arr.nbytes
    rows = [
        {"shape": k[0], "dtype": k[1], "device": k[2], **v}
        for k, v in groups.items()
    ]
    rows.sort(key=lambda r: -r["nbytes"])
    return rows[:top]


def step_mem(
    label: str = "",
    *,
    top: int = 10,
    reset_peak: bool = False,
    pause: Optional[bool] = None,
    device_filter: Optional[str] = None,
    file: Optional[IO[str]] = None,
) -> Dict[str, Any]:
    """Print a memory snapshot (host RSS, device allocator, largest live
    arrays). Returns the collected dict so tests/tools can assert on it.

    ``pause=True`` (or APEX_STEP_MEM_PAUSE=1) waits for Enter, mirroring the
    reference's breakpoint-style usage."""
    out = file or sys.stderr
    site = _callsite()
    host = _collect_host_mem()
    devices = collect_device_mem(device_filter)
    arrays = collect_live_arrays(top=top, device_filter=device_filter)
    snapshot = {"label": label, "callsite": site, "host": host,
                "devices": devices, "arrays": arrays}

    print(f"[step_mem] {label or '-'} @ {site}", file=out)
    print(f"  host rss={_fmt_bytes(host['rss'])}"
          f" vms={_fmt_bytes(host.get('vms'))}", file=out)
    for d in devices:
        print(f"  {d['device']}: in_use={_fmt_bytes(d.get('bytes_in_use'))}"
              f" peak={_fmt_bytes(d.get('peak_bytes_in_use'))}"
              f" limit={_fmt_bytes(d.get('bytes_limit'))}", file=out)
    for r in arrays:
        print(f"    {r['count']:4d}× {r['shape']:<24} {r['dtype']:<10}"
              f" {_fmt_bytes(r['nbytes'])}  {r['device']}", file=out)

    if reset_peak:
        # XLA exposes no peak reset; note it so traces aren't misread
        print("  (peak reset not supported by the XLA allocator; "
              "compare bytes_in_use deltas instead)", file=out)
    if pause or (pause is None and os.environ.get("APEX_STEP_MEM_PAUSE") == "1"):
        try:
            input("  [step_mem] paused — press Enter to continue…")
        except EOFError:
            pass
    return snapshot
