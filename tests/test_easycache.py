import numpy as np
import pytest

import jax
import jax.numpy as jnp

from apex_studio_tpu.ops.easycache import cached_step, init_state


class TestCachedStep:
    def _fwd(self, calls):
        def forward(x):
            calls["n"] += 1  # traced once; runtime skips don't retrace
            return x * 2.0

        return forward

    def test_first_step_always_computes(self):
        x = jnp.ones((2, 4))
        state = init_state(x, x)
        v, state = cached_step(lambda y: y * 2.0, x, state, thresh=100.0, force_compute=False)
        np.testing.assert_allclose(np.asarray(v), 2.0)
        assert int(state.computed) == 1

    def test_small_change_skips(self):
        x = jnp.ones((2, 4))
        state = init_state(x, x)
        v1, state = cached_step(lambda y: y * 2.0, x, state, thresh=0.5, force_compute=False)
        # tiny input change → accum below thresh → reuse previous output
        x2 = x * 1.001
        v2, state = cached_step(lambda y: y * 3.0, x2, state, thresh=0.5, force_compute=False)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1))
        assert int(state.computed) == 1

    def test_large_change_recomputes(self):
        x = jnp.ones((2, 4))
        state = init_state(x, x)
        _, state = cached_step(lambda y: y * 2.0, x, state, thresh=0.1, force_compute=False)
        x2 = x * 5.0
        v2, state = cached_step(lambda y: y * 3.0, x2, state, thresh=0.1, force_compute=False)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(x2) * 3.0)
        assert int(state.computed) == 2

    def test_force_compute_overrides_skip(self):
        x = jnp.ones((2, 4))
        state = init_state(x, x)
        _, state = cached_step(lambda y: y * 2.0, x, state, thresh=100.0, force_compute=True)
        v2, state = cached_step(lambda y: y * 3.0, x * 1.0001, state, thresh=100.0, force_compute=True)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(x) * 3.0001, rtol=1e-3)
        assert int(state.computed) == 2

    def test_accumulation_eventually_triggers(self):
        """Many small changes accumulate past the threshold."""
        x = jnp.ones((2, 4))
        state = init_state(x, x)
        _, state = cached_step(lambda y: y * 2.0, x, state, thresh=0.05, force_compute=False)
        computes = 1
        for i in range(6):
            x = x * 1.02  # 2% change per step, thresh 5% → compute every ~3rd
            _, state = cached_step(lambda y: y * 2.0, x, state, thresh=0.05, force_compute=False)
        total = int(state.computed)
        assert 1 < total < 7  # skipped some, recomputed some


class TestWanEngineEasyCache:
    def test_run_with_easycache_smoke(self, tmp_path):
        from tests.test_engine_wan import make_engine

        eng = make_engine(tmp_path, "t2v")
        lat = eng.run(
            prompt="hello",
            height=32,
            width=32,
            num_frames=5,
            num_inference_steps=6,
            guidance_scale=1.0,
            seed=1,
            return_latents=True,
            easy_cache_thresh=0.05,
            easy_cache_ret_steps=2,
        )
        assert np.isfinite(np.asarray(lat)).all()
