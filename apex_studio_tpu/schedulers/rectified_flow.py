"""Rectified-flow scheduler (the LTX-Video sampler).

Counterpart of the reference's ``src/scheduler/rf.py`` (RectifiedFlowScheduler):
- timesteps ARE sigmas in [0, 1] (rf.py:269 ``self.sigmas = self.timesteps``);
  the LTX transformer scales by 1000 internally
- samplers: "Uniform" (linspace 1 → 1/n, rf.py:212), "LinearQuadratic"
  (rf.py:50 — linear ramp to a threshold noise then a quadratic tail) and
  "Constant" (exp-μ time shift, rf.py:215)
- resolution-dependent shifting: "SD3" token-count shift with optional
  terminal stretching (rf.py:137) or the SimpleDiffusion log-SNR shift
  (rf.py:74)
- Euler updates on flow velocity; per-token timesteps supported
  (``step_tokens`` ↔ rf.py:344 per-token branch) for LTX conditioning where
  hard-conditioned tokens sit at their own noise level

Host numpy builds the grids; the per-step update is pure jnp so engines can
fuse it into a single compiled denoise step.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from apex_studio_tpu.schedulers.base import SchedulerBase, scheduler_registry


def linear_quadratic_schedule(
    num_steps: int, threshold_noise: float = 0.025, linear_steps: Optional[int] = None
) -> np.ndarray:
    """Descending sigma grid 1 → … (linear head then quadratic tail in t).

    Matches rf.py:50 except the reference appends a trailing 0.0 entry (its
    loop runs one extra no-op iteration); we keep n entries and let ``step``
    integrate to 0.
    """
    if num_steps == 1:
        return np.array([1.0])
    ls = linear_steps if linear_steps is not None else num_steps // 2
    linear = [i * threshold_noise / ls for i in range(ls)]
    diff = ls - threshold_noise * num_steps
    qs = num_steps - ls
    qcoef = diff / (ls * qs**2)
    lcoef = threshold_noise / ls - 2 * diff / qs**2
    const = qcoef * ls**2
    quad = [qcoef * i**2 + lcoef * i + const for i in range(ls, num_steps)]
    t = np.array(linear + quad, dtype=np.float64)
    return 1.0 - t


def token_shift(n_tokens: int, min_tokens=1024, max_tokens=4096,
                min_shift=0.95, max_shift=2.05) -> float:
    m = (max_shift - min_shift) / (max_tokens - min_tokens)
    return m * n_tokens + (min_shift - m * min_tokens)


def time_shift(mu: float, sigma: float, t: np.ndarray) -> np.ndarray:
    return math.exp(mu) / (math.exp(mu) + (1.0 / np.maximum(t, 1e-9) - 1.0) ** sigma)


def stretch_to_terminal(sigmas: np.ndarray, terminal: float) -> np.ndarray:
    one_minus = 1.0 - sigmas
    scale = one_minus[-1] / (1.0 - terminal)
    return 1.0 - one_minus / scale


@scheduler_registry.register("RectifiedFlowScheduler", aliases=("rf",))
class RectifiedFlowScheduler(SchedulerBase):
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        shifting: Optional[str] = None,  # None | "SD3" | "SimpleDiffusion"
        base_resolution: int = 32 * 32,
        target_shift_terminal: Optional[float] = None,
        sampler: str = "Uniform",  # "Uniform" | "LinearQuadratic" | "Constant"
        shift: Optional[float] = None,
        **_: object,
    ):
        super().__init__(
            num_train_timesteps=num_train_timesteps, shifting=shifting,
            base_resolution=base_resolution, target_shift_terminal=target_shift_terminal,
            sampler=sampler, shift=shift,
        )
        self.num_train_timesteps = num_train_timesteps
        self.shifting = shifting
        self.base_resolution = base_resolution
        self.target_shift_terminal = target_shift_terminal
        self.sampler = sampler
        self.shift = shift

    def _initial_grid(self, n: int) -> np.ndarray:
        if self.sampler == "LinearQuadratic":
            return linear_quadratic_schedule(n)
        grid = np.linspace(1.0, 1.0 / n, n)
        if self.sampler == "Constant":
            assert self.shift is not None, "Constant sampler requires shift"
            return time_shift(self.shift, 1.0, grid)
        return grid

    def _apply_shift(self, sigmas: np.ndarray, n_tokens: Optional[int]) -> np.ndarray:
        if self.shifting == "SD3":
            mu = math.log(token_shift(n_tokens or self.base_resolution))
            out = math.exp(mu) / (math.exp(mu) + (1.0 / np.maximum(sigmas, 1e-9) - 1.0))
            if self.target_shift_terminal:
                out = stretch_to_terminal(out, self.target_shift_terminal)
            return out
        if self.shifting == "SimpleDiffusion":
            m = n_tokens or self.base_resolution
            snr = (sigmas / np.maximum(1.0 - sigmas, 1e-9)) ** 2
            shifted = np.log(np.maximum(snr, 1e-30)) + 2 * math.log(m / self.base_resolution)
            return 1.0 / (1.0 + np.exp(-0.5 * shifted))
        return sigmas

    def set_timesteps(
        self,
        num_inference_steps: int,
        n_tokens: Optional[int] = None,
        samples_shape=None,
        timesteps: Optional[List[float]] = None,
        **_: object,
    ) -> None:
        if timesteps is not None:
            grid = np.asarray(timesteps, np.float64)
            num_inference_steps = len(grid)
        else:
            num_inference_steps = min(self.num_train_timesteps, num_inference_steps)
            if samples_shape is not None and n_tokens is None:
                # token sequences are (b, s, c); dense latents (b, c, ...)
                n_tokens = (
                    int(samples_shape[1]) if len(samples_shape) == 3
                    else int(np.prod(samples_shape[2:]))
                )
            grid = self._apply_shift(self._initial_grid(num_inference_steps), n_tokens)
        self.num_inference_steps = num_inference_steps
        # LTX convention: timesteps ARE sigmas in [0, 1] (rf.py:269).
        self.sigmas = np.concatenate([grid, [0.0]])
        self.timesteps = grid.astype(np.float32)
        self._step_index = None

    def step(self, model_output, timestep, sample, return_dict: bool = False, **_: object):
        import jax.numpy as jnp

        if self._step_index is None:
            self._step_index = self._resolve_step_index(timestep)
        i = self._step_index
        dt = float(self.sigmas[i] - self.sigmas[i + 1])
        prev = (jnp.asarray(sample, jnp.float32) - dt * jnp.asarray(model_output, jnp.float32)).astype(sample.dtype)
        self._step_index += 1
        return {"prev_sample": prev} if return_dict else (prev,)

    def step_at(self, model_output, sample, step_index: int):
        import jax.numpy as jnp

        dt = float(self.sigmas[step_index] - self.sigmas[step_index + 1])
        return (jnp.asarray(sample, jnp.float32) - dt * jnp.asarray(model_output, jnp.float32)).astype(sample.dtype)

    def step_tokens(self, model_output, t_tokens, sample):
        """Per-token Euler update (rf.py:344): each token integrates from its
        own timestep down to the closest strictly-lower grid point.

        ``t_tokens`` is [B, S] in [0, 1]; jnp-pure, safe inside jit.
        """
        import jax.numpy as jnp

        grid = jnp.asarray(np.concatenate([self.timesteps, [0.0]]), jnp.float32)
        below = jnp.where(
            grid[:, None, None] < t_tokens[None] - 1e-6, grid[:, None, None], 0.0
        )
        lower = below.max(axis=0)
        dt = (t_tokens - lower)[..., None]
        out = jnp.asarray(sample, jnp.float32) - dt * jnp.asarray(model_output, jnp.float32)
        return out.astype(sample.dtype)
