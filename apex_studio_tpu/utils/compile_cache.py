"""Persistent XLA compilation cache.

The reference pays its JIT cost through torch.compile caches
(``src/mixins/compile_mixin.py:27``); the TPU-native equivalent is JAX's
persistent compilation cache, which serializes compiled executables keyed by
HLO hash so a warm process (or a later process on the same host) skips the
multi-minute XLA compile of a 50-block DiT entirely. Enabled by every entry
point that compiles models (server startup, bench, graft entry, CLI).

Env:
  APEX_JAX_CACHE_DIR   cache directory (default <repo>/.jax_cache)
  APEX_JAX_CACHE=0     disable
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger("apex.compile_cache")

_ENABLED = False


def default_cache_dir() -> Path:
    env = os.environ.get("APEX_JAX_CACHE_DIR")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compile_cache() -> bool:
    """Idempotently turn on the persistent compilation cache. Returns True if
    active. Safe to call before or after the first jax import/compile."""
    global _ENABLED
    if _ENABLED or os.environ.get("APEX_JAX_CACHE", "1") == "0":
        return _ENABLED
    try:
        import jax

        # TPU-only by default: XLA:CPU cache entries are AOT-compiled against
        # the build host's exact CPU feature set and can SIGILL when loaded
        # on a different machine (cpu_aot_loader machine-feature mismatch).
        # TPU executables are keyed by device kind and are portable across
        # hosts driving the same chip type. APEX_JAX_CACHE=all overrides.
        if (os.environ.get("APEX_JAX_CACHE") != "all"
                and jax.default_backend() != "tpu"):
            return False

        d = default_cache_dir()
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
        # Cache every entry: DiT compiles are minutes, and even second-tier
        # kernels (VAE convs, schedulers) add up over the tunnel.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _ENABLED = True
        logger.info("persistent compilation cache at %s", d)
    except Exception as e:  # pragma: no cover - defensive
        logger.warning("compilation cache unavailable: %s", e)
    return _ENABLED
