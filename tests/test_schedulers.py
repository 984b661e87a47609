import numpy as np
import pytest

import jax.numpy as jnp

from apex_studio_tpu.schedulers import (
    FlowMatchDiscreteScheduler,
    FlowMatchEulerDiscreteScheduler,
    FlowMatchScheduler,
    FlowUniPCMultistepScheduler,
)
from apex_studio_tpu.schedulers.base import create_scheduler, compute_dynamic_shift_mu


def run_sampling(scheduler, velocity_fn, x_init, num_steps, **set_kwargs):
    """Drive a scheduler through the full denoise loop with an oracle velocity."""
    scheduler.set_timesteps(num_steps, **set_kwargs)
    x = x_init
    for i, t in enumerate(scheduler.timesteps):
        sigma = float(scheduler.sigmas[i])
        v = velocity_fn(x, sigma)
        (x,) = scheduler.step(v, float(t), x)
    return np.asarray(x)


class TestGrids:
    def test_flow_match_discrete_grid(self):
        s = FlowMatchDiscreteScheduler(shift=1.0)
        s.set_timesteps(4)
        np.testing.assert_allclose(s.sigmas, [1.0, 0.75, 0.5, 0.25, 0.0], atol=1e-12)
        np.testing.assert_allclose(s.timesteps, [1000, 750, 500, 250], atol=1e-4)

    def test_shift_moves_sigmas_up(self):
        s1 = FlowMatchDiscreteScheduler(shift=1.0)
        s7 = FlowMatchDiscreteScheduler(shift=7.0)
        s1.set_timesteps(10)
        s7.set_timesteps(10)
        assert (s7.sigmas[1:-1] > s1.sigmas[1:-1]).all()
        # endpoints unchanged
        assert s7.sigmas[0] == 1.0 and s7.sigmas[-1] == 0.0

    def test_euler_discrete_dynamic_shift(self):
        s = FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True)
        mu = compute_dynamic_shift_mu(image_seq_len=4096)
        s.set_timesteps(8, mu=mu)
        assert len(s.timesteps) == 8
        assert len(s.sigmas) == 9
        assert s.sigmas[-1] == 0.0
        assert np.all(np.diff(s.sigmas) < 0)

    def test_euler_discrete_image_seq_len_path(self):
        s = FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True)
        s.set_timesteps(8, image_seq_len=1024)
        assert np.all(np.diff(s.sigmas) < 0)

    def test_wan_flow_match_extra_one_step(self):
        s = FlowMatchScheduler(num_inference_steps=4, shift=1.0, extra_one_step=True)
        # grid excludes sigma_min itself when extra_one_step
        assert len(s.timesteps) == 4
        assert s.sigmas[0] == pytest.approx(1.0)

    def test_registry_resolution(self):
        s = create_scheduler("diffusers.FlowMatchEulerDiscreteScheduler")
        assert isinstance(s, FlowMatchEulerDiscreteScheduler)
        s = create_scheduler("UniPCMultistepScheduler")
        assert isinstance(s, FlowUniPCMultistepScheduler)

    def test_from_config(self):
        cfg = {
            "_class_name": "FlowMatchEulerDiscreteScheduler",
            "num_train_timesteps": 1000,
            "shift": 3.0,
            "unknown_future_key": 1,
        }
        s = FlowMatchEulerDiscreteScheduler.from_config(cfg)
        assert s.shift == 3.0


class TestExactness:
    """With a constant-velocity oracle (v = noise − x0), every flow sampler must
    recover x0 exactly: the rectified-flow path is a straight line."""

    @pytest.mark.parametrize(
        "make",
        [
            lambda: FlowMatchEulerDiscreteScheduler(shift=3.0),
            lambda: FlowMatchDiscreteScheduler(shift=5.0),
            lambda: FlowUniPCMultistepScheduler(shift=3.0),
        ],
    )
    def test_constant_velocity_recovers_x0(self, make):
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), jnp.float32)
        noise = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), jnp.float32)
        v = noise - x0

        sched = make()
        sched.set_timesteps(10)
        x = (1.0 - float(sched.sigmas[0])) * x0 + float(sched.sigmas[0]) * noise
        out = run_sampling(sched, lambda x_, s_: v, x, 10)
        np.testing.assert_allclose(out, np.asarray(x0), atol=2e-3)

    def test_wan_flow_match_recovers_x0(self):
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), jnp.float32)
        noise = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), jnp.float32)
        v = noise - x0
        sched = FlowMatchScheduler(shift=5.0, extra_one_step=True)
        sched.set_timesteps(10)
        x = (1.0 - float(sched.sigmas[0])) * x0 + float(sched.sigmas[0]) * noise
        out = run_sampling(sched, lambda x_, s_: v, x, 10)
        # Wan grid stops at sigma_min, then steps to the terminal sigma.
        np.testing.assert_allclose(out, np.asarray(x0), atol=2e-3)


class TestConvergence:
    """On a sigma-dependent velocity field, UniPC (order 2) must beat Euler."""

    @staticmethod
    def _problem():
        # dx/dsigma = v(sigma) = 3*sigma^2 - 1 → x(sigma) = x(0) + sigma^3 - sigma.
        # Integrating from sigma=1 (x = x0) down to 0 recovers x0 exactly.
        def velocity(x, sigma):
            return jnp.full_like(x, 3.0 * sigma**2 - 1.0)

        x0 = jnp.zeros((1, 4, 4, 4), jnp.float32)
        x_at = lambda s: x0 + (s**3 - s)
        return velocity, x0, x_at

    def _solve(self, sched, n):
        velocity, x0, x_at = self._problem()
        sched.set_timesteps(n)
        x = x_at(float(sched.sigmas[0]))
        out = run_sampling(sched, velocity, x, n)
        return float(np.abs(out - np.asarray(x0)).max())

    def test_unipc_beats_euler(self):
        err_euler = self._solve(FlowMatchEulerDiscreteScheduler(), 20)
        err_unipc = self._solve(FlowUniPCMultistepScheduler(), 20)
        assert err_unipc < err_euler / 5

    def test_unipc_third_order_convergence(self):
        # Halving the step size must cut the error ~8x (order 3 with corrector).
        e20 = self._solve(FlowUniPCMultistepScheduler(), 20)
        e40 = self._solve(FlowUniPCMultistepScheduler(), 40)
        assert e40 < e20 / 5

    def test_unipc_order3_runs(self):
        # Sanity: the order-3 path (full Vandermonde solve) runs without NaNs
        # and stays accurate; asymptotic-rate assertions live in the order-2 test.
        err = self._solve(FlowUniPCMultistepScheduler(solver_order=3), 12)
        assert err < 5e-2


class TestForwardProcess:
    def test_add_noise_interpolates(self):
        s = FlowMatchDiscreteScheduler()
        s.set_timesteps(4)
        x0 = jnp.ones((1, 2, 2, 2), jnp.float32)
        noise = jnp.zeros_like(x0)
        # t=500 → sigma=0.5 exactly on this grid
        out = np.asarray(s.add_noise(x0, noise, 500.0))
        np.testing.assert_allclose(out, 0.5, atol=1e-6)

    def test_training_target_is_velocity(self):
        s = FlowMatchDiscreteScheduler()
        x0 = jnp.ones((2,))
        noise = jnp.full((2,), 3.0)
        np.testing.assert_allclose(np.asarray(s.training_target(x0, noise)), 2.0)


class TestStepIndexHandling:
    def test_indices_advance(self):
        s = FlowMatchEulerDiscreteScheduler()
        s.set_timesteps(5)
        x = jnp.zeros((1, 1, 2, 2), jnp.float32)
        v = jnp.ones_like(x)
        s.step(v, float(s.timesteps[0]), x)
        assert s.step_index == 1

    def test_begin_index(self):
        s = FlowMatchEulerDiscreteScheduler()
        s.set_timesteps(5)
        s.set_begin_index(2)
        x = jnp.zeros((1,), jnp.float32)
        (out,) = s.step(jnp.ones((1,)), float(s.timesteps[2]), x)
        expected = float(s.sigmas[3] - s.sigmas[2])
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


class TestRectifiedFlow:
    def test_linear_quadratic_grid(self):
        from apex_studio_tpu.schedulers.rectified_flow import linear_quadratic_schedule

        g = linear_quadratic_schedule(10, threshold_noise=0.025)
        assert len(g) == 10
        assert g[0] == 1.0
        assert np.all(np.diff(g) < 0)

    def test_uniform_with_static_shift(self):
        from apex_studio_tpu.schedulers import RectifiedFlowScheduler

        s = RectifiedFlowScheduler(shift=2.0)
        s.set_timesteps(8)
        assert len(s.timesteps) == 8 and s.sigmas[-1] == 0.0

    def test_sd3_token_shift(self):
        from apex_studio_tpu.schedulers import RectifiedFlowScheduler

        s = RectifiedFlowScheduler(shifting="SD3")
        s.set_timesteps(8, n_tokens=4096)
        s2 = RectifiedFlowScheduler(shifting="SD3")
        s2.set_timesteps(8, n_tokens=1024)
        # more tokens → higher shift → larger sigmas mid-schedule
        assert s.sigmas[4] > s2.sigmas[4]

    def test_constant_velocity_exactness(self):
        from apex_studio_tpu.schedulers import RectifiedFlowScheduler

        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
        noise = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
        v = noise - x0
        s = RectifiedFlowScheduler(sampler="LinearQuadratic")
        s.set_timesteps(10)
        x = (1 - float(s.sigmas[0])) * x0 + float(s.sigmas[0]) * noise
        out = run_sampling(s, lambda x_, s_: v, x, 10)
        np.testing.assert_allclose(out, np.asarray(x0), atol=2e-3)
