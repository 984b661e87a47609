"""Golden parity vs the REFERENCE implementation (SURVEY §4 + VERDICT r1 #6).

Fixtures in tests/fixtures/parity/ were recorded by running the reference's
own schedulers (tests/fixtures/gen_scheduler_parity.py — the reference code is
the oracle, nothing is ported). Tests assert:
- scheduler trajectories match to 1e-5 over 10 steps (UniPC order 2 at two
  shifts; Wan FlowMatch at two shifts) with an identical pseudo velocity field
- the engine seed-to-latent contract reproduces torch CPU generator streams
  bit-for-bit
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures" / "parity"

pytestmark = pytest.mark.skipif(
    not (FIXTURES / "scheduler_trajectories.npz").exists(),
    reason="parity fixtures not generated",
)


def _pseudo_model(x, t, c):
    return jnp.tanh(0.7 * x + 0.1 * (t / 1000.0)) + 0.05 * c


@pytest.fixture(scope="module")
def fx():
    return np.load(FIXTURES / "scheduler_trajectories.npz")


@pytest.mark.parametrize("shift", [5.0, 8.0])
def test_unipc_matches_reference_trajectory(fx, shift):
    from apex_studio_tpu.schedulers.unipc import FlowUniPCMultistepScheduler

    pre = f"unipc_s10_o2_sh{shift}_"
    x = jnp.asarray(fx[pre + "init"])
    c = jnp.asarray(fx[pre + "cond"])
    ref_ts = fx[pre + "timesteps"]
    ref_traj = fx[pre + "traj"]

    sched = FlowUniPCMultistepScheduler(solver_order=2, shift=shift)
    sched.set_timesteps(10, shift=shift)
    np.testing.assert_allclose(
        sched.timesteps.astype(np.float32), ref_ts, rtol=1e-5, atol=1e-3
    )
    for i, t in enumerate(sched.timesteps):
        v = _pseudo_model(x, float(t), c)
        (x,) = sched.step(v, float(t), x)
        np.testing.assert_allclose(
            np.asarray(x), ref_traj[i], rtol=1e-4, atol=1e-5,
            err_msg=f"UniPC diverged from reference at step {i} (shift {shift})",
        )


@pytest.mark.parametrize("shift", [3.0, 7.0])
def test_flow_match_matches_reference_trajectory(fx, shift):
    from apex_studio_tpu.schedulers.flow_match import FlowMatchScheduler

    pre = f"flow_s10_sh{shift}_"
    x = jnp.asarray(fx[pre + "init"])
    c = jnp.asarray(fx[pre + "cond"])
    ref_ts = fx[pre + "timesteps"]
    ref_traj = fx[pre + "traj"]

    sched = FlowMatchScheduler(shift=shift, extra_one_step=True)
    sched.set_timesteps(10)
    np.testing.assert_allclose(
        sched.timesteps.astype(np.float32), ref_ts, rtol=1e-5, atol=1e-3
    )
    for i, t in enumerate(sched.timesteps):
        v = _pseudo_model(x, float(t), c)
        (x,) = sched.step(v, float(t), x)
        np.testing.assert_allclose(
            np.asarray(x), ref_traj[i], rtol=1e-4, atol=1e-5,
            err_msg=f"FlowMatch diverged from reference at step {i} (shift {shift})",
        )


@pytest.mark.parametrize("seed", [0, 7, 1234])
def test_seed_to_latent_contract_bitexact(seed):
    """Engine get_latents must reproduce the torch CPU generator stream
    bit-for-bit (SURVEY Appendix D seed contract)."""
    from apex_studio_tpu.engine.base import BaseEngine

    streams = np.load(FIXTURES / "torch_rng_streams.npz")
    want = streams[f"randn_seed{seed}"]
    got = np.asarray(BaseEngine.get_latents((1, 16, 3, 8, 8), seed=seed))
    np.testing.assert_array_equal(got.astype(np.float32), want)
