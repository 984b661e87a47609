"""Fused (in-graph) UniPC must match host-side scheduler.step bit-for-math.

The fused plan (schedulers/unipc.py:fused_plan) reduces each predictor-
corrector update to two linear combinations; this suite drives both paths
with the same deterministic pseudo-model and asserts trajectory equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from apex_studio_tpu.engine.fused import (
    build_euler_step,
    build_unipc_step,
    cfg_apply,
    init_unipc_carry,
)
from apex_studio_tpu.schedulers.flow_match import FlowMatchEulerDiscreteScheduler
from apex_studio_tpu.schedulers.unipc import FlowUniPCMultistepScheduler


class _ToyModel(nnx.Module):
    """Deterministic nonlinear 'velocity field' standing in for a DiT."""

    def __init__(self):
        self.w = nnx.Param(jnp.asarray(0.7, jnp.float32))

    def __call__(self, x, t, ctx):
        return jnp.tanh(self.w.value * x + 0.1 * t) + 0.05 * ctx


def _host_trajectory(scheduler, model, x0, ts, ctx, neg_ctx=None, g=1.0):
    x = x0
    for t in ts:
        t_vec = jnp.full((x.shape[0],), float(t) / 1000.0, jnp.float32)
        v = model(x, t_vec[:, None, None], ctx).astype(jnp.float32)
        if neg_ctx is not None:
            vn = model(x, t_vec[:, None, None], neg_ctx).astype(jnp.float32)
            v = vn + g * (v - vn)
        (x,) = scheduler.step(v, float(t), x)
    return np.asarray(x)


@pytest.mark.parametrize("solver_order", [1, 2, 3])
@pytest.mark.parametrize("steps", [4, 10])
def test_fused_unipc_matches_host_step(solver_order, steps):
    model = _ToyModel()
    graphdef, state = nnx.split(model)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)

    sched_a = FlowUniPCMultistepScheduler(solver_order=solver_order, shift=3.0)
    sched_a.set_timesteps(steps)
    ref = _host_trajectory(sched_a, model, x0, sched_a.timesteps, ctx)

    sched_b = FlowUniPCMultistepScheduler(solver_order=solver_order, shift=3.0)
    sched_b.set_timesteps(steps)
    plan = sched_b.fused_plan()

    def apply(m, x, aux, t_vec, c):
        return m(x, t_vec[:, None, None], c).astype(jnp.float32), aux

    step = build_unipc_step(graphdef, apply, solver_order)
    hist, last = init_unipc_carry(x0, solver_order)
    x = x0
    for i, t in enumerate(sched_b.timesteps):
        p = plan[i]
        t_vec = jnp.full((x.shape[0],), float(t) / 1000.0, jnp.float32)
        x, hist, last, _ = step(
            state, x, hist, last,
            p["sigma"], p["use_corrector"],
            jnp.asarray(p["corr_w"]), jnp.asarray(p["pred_w"]),
            (), t_vec, ctx,
        )
    got = np.asarray(x)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fused_unipc_with_cfg_matches():
    model = _ToyModel()
    graphdef, state = nnx.split(model)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
    neg = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
    g = 5.0

    sched_a = FlowUniPCMultistepScheduler(solver_order=2, shift=5.0)
    sched_a.set_timesteps(8)
    ref = _host_trajectory(sched_a, model, x0, sched_a.timesteps, ctx, neg, g)

    sched_b = FlowUniPCMultistepScheduler(solver_order=2, shift=5.0)
    sched_b.set_timesteps(8)
    plan = sched_b.fused_plan()

    def apply(m, x, aux, t_vec, c, n):
        pos = m(x, t_vec[:, None, None], c).astype(jnp.float32)
        negv = m(x, t_vec[:, None, None], n).astype(jnp.float32)
        return negv + g * (pos - negv), aux

    step = build_unipc_step(graphdef, apply, 2)
    hist, last = init_unipc_carry(x0, 2)
    x = x0
    for i, t in enumerate(sched_b.timesteps):
        p = plan[i]
        t_vec = jnp.full((x.shape[0],), float(t) / 1000.0, jnp.float32)
        x, hist, last, _ = step(
            state, x, hist, last,
            p["sigma"], p["use_corrector"],
            jnp.asarray(p["corr_w"]), jnp.asarray(p["pred_w"]),
            (), t_vec, ctx, neg,
        )
    np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-5, atol=2e-5)


def test_fused_euler_matches_host_step():
    model = _ToyModel()
    graphdef, state = nnx.split(model)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)

    sched = FlowMatchEulerDiscreteScheduler(shift=3.0)
    sched.set_timesteps(6)
    ref = _host_trajectory(sched, model, x0, sched.timesteps, ctx)

    def apply(m, x, aux, t_vec, c):
        return m(x, t_vec[:, None, None], c).astype(jnp.float32), aux

    step = build_euler_step(graphdef, apply)
    x = x0
    for i, t in enumerate(sched.timesteps):
        t_vec = jnp.full((x.shape[0],), float(t) / 1000.0, jnp.float32)
        x, _ = step(state, x, float(sched.sigmas[i]), float(sched.sigmas[i + 1]), (), t_vec, ctx)
    np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-5, atol=2e-5)
