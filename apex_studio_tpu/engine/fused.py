"""Fused denoise steps — forward + CFG + scheduler update in ONE dispatch.

The reference's hot loop (``src/engine/wan/shared/__init__.py:610-725``) runs
two eager transformer forwards, an eager CFG combine, and a host-side
``scheduler.step`` per iteration. On TPU every one of those boundaries is a
dispatch + an HBM round-trip; the idiomatic shape is a single jitted program
per step with the latents donated:

- Euler family (FlowMatch*, rectified flow): ``x' = x + (σ' − σ)·v`` folds in
  as two traced scalars — no recompile across steps.
- UniPC: the predictor-corrector is linear in (sample, x0-history, x0_i), so
  the update becomes two small linear combinations whose weights the scheduler
  precomputes on host in float64 (``schedulers/unipc.py:fused_plan``). The
  history rides along as a donated ``[K, *latent]`` device buffer.

CFG runs inside the same program (two forwards compiled into one XLA
computation — still one dispatch). An ``aux`` pytree carry threads per-stream
state such as EasyCache (ops/easycache.py) through the step.

``apply`` contract: ``apply(model, x, aux, *cond) -> (v_f32, aux')`` where
``v`` is the post-CFG velocity/model output.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import nnx


def build_euler_step(graphdef, apply: Callable):
    """Returns ``step(state, x, sigma, sigma_next, aux, *cond) -> (x', aux')``
    — jitted, latents donated, Euler update in-graph."""

    @functools.partial(jax.jit, donate_argnums=(1, 4))
    def step(state, x, sigma, sigma_next, aux, *cond):
        m = nnx.merge(graphdef, state)
        v, aux = apply(m, x, aux, *cond)
        x32 = x.astype(jnp.float32)
        return (x32 + (sigma_next - sigma) * v.astype(jnp.float32)).astype(x.dtype), aux

    return step


def build_unipc_step(graphdef, apply: Callable, solver_order: int):
    """Fused UniPC step.

    Returns ``step(state, x, hist, last, sigma, use_corr, corr_w, pred_w,
    aux, *cond) -> (x', hist', last', aux')`` where ``hist`` is the
    [K, *latent] f32 x0 history (index K−1 newest) and ``last`` the previous
    corrected sample. Weights come from
    ``FlowUniPCMultistepScheduler.fused_plan()``.
    """
    K = solver_order

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 8))
    def step(state, x, hist, last, sigma, use_corr, corr_w, pred_w, aux, *cond):
        m = nnx.merge(graphdef, state)
        v, aux = apply(m, x, aux, *cond)
        x32 = x.astype(jnp.float32)
        x0 = x32 - sigma * v.astype(jnp.float32)
        corr = (
            corr_w[0] * last
            + jnp.tensordot(corr_w[1 : K + 1], hist, axes=1)
            + corr_w[K + 1] * x0
        )
        sample = use_corr * corr + (1.0 - use_corr) * x32
        hist_new = jnp.concatenate([hist[1:], x0[None]], axis=0)
        prev = pred_w[0] * sample + jnp.tensordot(pred_w[1:], hist_new, axes=1)
        return prev.astype(x.dtype), hist_new, sample, aux

    return step


def init_unipc_carry(latents: jnp.ndarray, solver_order: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-filled (hist, last_sample) carry for :func:`build_unipc_step`."""
    z = jnp.zeros((solver_order,) + tuple(latents.shape), jnp.float32)
    return z, jnp.zeros(tuple(latents.shape), jnp.float32)


def plain_apply(forward: Callable) -> Callable:
    """``forward(m, x, *cond) -> v``  →  aux-threading apply (aux unused)."""

    def apply(m, x, aux, *cond):
        return forward(m, x, *cond).astype(jnp.float32), aux

    return apply


def cfg_apply(forward: Callable, use_cfg: bool) -> Callable:
    """Wrap a conditional forward into a post-CFG apply.

    ``forward(m, x, ctx) -> v``; the returned apply takes
    ``(m, x, aux, t..., ctx, neg_ctx, g)``-style cond where the engine decides
    the exact ordering — concretely:
    ``apply(m, x, aux, ctx, neg_ctx, g)``. ``use_cfg`` is static — engines
    cache one compiled step per variant.
    """
    if not use_cfg:
        def apply(m, x, aux, ctx, neg_ctx=None, g=None):
            return forward(m, x, ctx).astype(jnp.float32), aux

        return apply

    def apply(m, x, aux, ctx, neg_ctx, g):
        pos = forward(m, x, ctx).astype(jnp.float32)
        neg = forward(m, x, neg_ctx).astype(jnp.float32)
        return neg + g * (pos - neg), aux

    return apply
