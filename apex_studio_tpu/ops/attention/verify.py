"""Attention backend verification harness.

Counterpart of the reference's ``verify_attention_backends_detailed``
(attention/functions.py:2105): each registered backend is probed on a tiny
problem and checked numerically against the naive reference; failing backends
are marked unavailable in the registry so manifest `attention_types`
intersection only offers working kernels. Results are cached on disk keyed by
jax version + platform (the reference caches per-wheel-set, :1800).

The reference probes in throwaway subprocesses because a bad CUDA kernel can
kill the server; XLA/Pallas compile errors surface as Python exceptions, so
in-process probing is safe here (set APEX_VERIFY_SUBPROCESS=1 to force the
paranoid path).
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
from pathlib import Path
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger("apex.attention.verify")

_PROBE_SHAPE = (1, 128, 2, 64)  # B, S, H, D


def _cache_path() -> Path:
    from apex_studio_tpu.utils.defaults import get_cache_path

    return get_cache_path() / "attention_verify.json"


def _cache_key() -> str:
    import jax

    return f"jax-{jax.__version__}-{jax.default_backend()}"


def _probe_inprocess(backend: str) -> Optional[str]:
    """Return None if the backend works, else the failure reason."""
    import jax
    import jax.numpy as jnp

    from apex_studio_tpu.ops.attention import attention

    try:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], _PROBE_SHAPE, jnp.float32)
        k = jax.random.normal(ks[1], _PROBE_SHAPE, jnp.float32)
        v = jax.random.normal(ks[2], _PROBE_SHAPE, jnp.float32)
        ref = np.asarray(attention(q, k, v, backend="naive"))
        out = np.asarray(attention(q, k, v, backend=backend))
        err = float(np.abs(out - ref).max())
        if not np.isfinite(out).all():
            return "non-finite output"
        if err > 5e-2:
            return f"numeric mismatch (max err {err:.2e})"
        return None
    except Exception as e:  # noqa: BLE001 — any failure disables the backend
        return f"{type(e).__name__}: {e}"


def _probe_subprocess(backend: str) -> Optional[str]:
    code = (
        "import json,sys\n"
        "from apex_studio_tpu.ops.attention.verify import _probe_inprocess\n"
        f"print(json.dumps(_probe_inprocess({backend!r})))\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=300, text=True,
            cwd=str(Path(__file__).resolve().parents[3]),
        )
        if out.returncode != 0:
            return f"probe subprocess crashed: {out.stderr[-200:]}"
        return json.loads(out.stdout.strip().splitlines()[-1])
    except subprocess.TimeoutExpired:
        return "probe timed out"


def verify_attention_backends(force: bool = False, use_cache: bool = True) -> Dict[str, Optional[str]]:
    """Probe every backend; returns {backend: None | failure reason} and
    flips registry availability accordingly."""
    from apex_studio_tpu.ops.attention import attention_registry

    cache_file = _cache_path()
    key = _cache_key()
    if use_cache and not force and cache_file.exists():
        try:
            cached = json.loads(cache_file.read_text())
            if cached.get("key") == key:
                results = cached["results"]
                for name, reason in results.items():
                    if name in attention_registry:
                        attention_registry.set_available(name, reason is None)
                return results
        except (json.JSONDecodeError, OSError):
            pass

    probe = (
        _probe_subprocess
        if os.environ.get("APEX_VERIFY_SUBPROCESS") == "1"
        else _probe_inprocess
    )
    results: Dict[str, Optional[str]] = {}
    for name in list(attention_registry.names(include_unavailable=True)):
        if name == "naive":
            results[name] = None
            continue
        reason = probe(name)
        results[name] = reason
        attention_registry.set_available(name, reason is None)
        if reason:
            logger.warning("attention backend %s disabled: %s", name, reason)

    try:
        cache_file.parent.mkdir(parents=True, exist_ok=True)
        cache_file.write_text(json.dumps({"key": key, "results": results}, indent=2))
    except OSError:
        pass
    return results


def select_backend(manifest_priority: Optional[list] = None) -> str:
    """Intersect the manifest's attention_types priority list with verified
    backends (reference api/manifest.py:646 semantics)."""
    from apex_studio_tpu.ops.attention import _default_backend, attention_registry

    verified = verify_attention_backends()
    working = [n for n, r in verified.items() if r is None]
    for name in manifest_priority or []:
        if name in working:
            return name
    return _default_backend() if _default_backend() in working else "xla"
