"""EasyCache-style step-skip caching for denoise loops.

Counterpart of the reference's EasyCache (transformer/wan/base/model.py:202,
enable_easy_cache:1645; engine kwarg ``easy_cache_thresh``): when the
transformer input is changing slowly between steps, skip the forward and reuse
the previous velocity prediction, resetting once the accumulated relative
change crosses the threshold.

TPU-first design: the reference decides on host per step; here the decision,
the accumulator AND the conditional forward all live inside one jitted step
(``lax.cond`` executes only the chosen branch at runtime), so a skipped step
costs a few element-wise ops and no host round trip.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class EasyCacheState(NamedTuple):
    prev_input: jnp.ndarray    # transformer input at the last step
    prev_output: jnp.ndarray   # last computed (or reused) velocity
    accum: jnp.ndarray         # accumulated relative input change since last compute
    computed: jnp.ndarray      # int32 count of real forwards (telemetry)


def init_state(x_like: jnp.ndarray, v_like: jnp.ndarray) -> EasyCacheState:
    return EasyCacheState(
        prev_input=jnp.zeros_like(x_like),
        prev_output=jnp.zeros_like(v_like),
        accum=jnp.asarray(jnp.inf, jnp.float32),  # force-compute the first step
        computed=jnp.asarray(0, jnp.int32),
    )


def cached_step(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    x_in: jnp.ndarray,
    state: EasyCacheState,
    thresh: float,
    force_compute: bool,
) -> Tuple[jnp.ndarray, EasyCacheState]:
    """One denoise forward with skip logic. ``force_compute`` covers warmup /
    retention steps (static per call — the reference's ret_steps)."""
    x32 = x_in.astype(jnp.float32)
    denom = jnp.maximum(jnp.mean(jnp.abs(state.prev_input)), 1e-6)
    rel = jnp.mean(jnp.abs(x32 - state.prev_input)) / denom
    accum = state.accum + rel

    if force_compute:
        skip = jnp.asarray(False)
    else:
        skip = accum < thresh

    def reuse(_):
        return state.prev_output

    def compute(_):
        return forward(x_in).astype(jnp.float32)

    v = jax.lax.cond(skip, reuse, compute, None)
    new_state = EasyCacheState(
        prev_input=x32,
        prev_output=v,
        accum=jnp.where(skip, accum, 0.0),
        computed=state.computed + jnp.where(skip, 0, 1).astype(jnp.int32),
    )
    return v, new_state
