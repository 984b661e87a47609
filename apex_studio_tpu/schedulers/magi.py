"""MAGI-1 chunk-wise flow scheduler.

Counterpart of the reference's ``src/scheduler/magi.py:23`` (MagiScheduler):
a forward-time schedule t ∈ [0, 1] (0 = noise, 1 = clean) built from a
squared-linspace warped by the SD3 shift, stepped chunk-wise — each active
chunk in the sliding window sits at a different point on the schedule, so the
Euler update ``x += v · Δt`` uses a per-chunk Δt.

The schedule is host-side float64 numpy (SchedulerBase convention); the step
is pure jnp math, safe inside a jitted denoise step.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from apex_studio_tpu.schedulers.base import SchedulerBase, scheduler_registry


@scheduler_registry.register("MagiScheduler")
class MagiScheduler(SchedulerBase):
    """Timesteps run noise→clean (reference magi.py:69 builds t ascending)."""

    def __init__(
        self,
        num_inference_steps: int = 64,
        num_train_timesteps: int = 1000,
        shift: float = 3.0,
        scheduler_type: str = "sd3",
        shortcut_mode: str = "16,16,8",
        clean_t: float = 0.9999,
        **_: object,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.shift = float(shift)
        self.scheduler_type = scheduler_type
        self.shortcut_mode = shortcut_mode
        self.clean_t = float(clean_t)
        self.timesteps: Optional[np.ndarray] = None
        self.denoise_step_per_stage: Optional[int] = None
        self.chunk_width: Optional[int] = None
        self.set_timesteps(num_inference_steps)

    def set_timesteps(self, num_inference_steps: int = 64, **_: object) -> np.ndarray:
        n = int(num_inference_steps)
        if n == 12:
            # the distilled 12-step shortcut ladder (magi.py:58-67)
            base = np.linspace(0.0, 1.0, 5, dtype=np.float64) / 4.0
            accu = np.linspace(0.0, 1.0, 5, dtype=np.float64)
            base = base[:3] if self.shortcut_mode == "16,16,8" else \
                np.concatenate([base[:1], base[2:4]])
            t = np.concatenate([base + a for a in accu])[: n + 1]
        else:
            t = np.linspace(0.0, 1.0, n + 1, dtype=np.float64)
        if self.scheduler_type == "sd3":
            t = t ** 2
            s_inv = 1.0 / self.shift
            t = s_inv * t / (1.0 + (s_inv - 1.0) * t)
        elif self.scheduler_type == "square":
            t = t ** 2
        elif self.scheduler_type == "piecewise":
            t = np.where(t < 0.875, t * (0.5 / 0.875),
                         0.5 + (t - 0.875) * (0.5 / 0.125))
        self.num_inference_steps = n
        self.timesteps = t.astype(np.float64)
        return self.timesteps

    def set_scheduler_params(self, chunk_width: int, denoise_step_per_stage: int) -> None:
        self.chunk_width = int(chunk_width)
        self.denoise_step_per_stage = int(denoise_step_per_stage)

    def chunk_timesteps(self, start: int, end: int, denoise_idx: int,
                        has_clean_t: bool = False) -> np.ndarray:
        """Per-chunk t values for window chunks [start, end) at micro-step
        ``denoise_idx`` — newest chunk last (reference get_timestep,
        magi.py:119: index list is built ascending then reversed)."""
        d = self.denoise_step_per_stage
        assert d is not None, "call set_scheduler_params first"
        idx = [i * d + denoise_idx for i in range(start, end)][::-1]
        t = self.timesteps[idx]
        if has_clean_t:
            t = np.concatenate([[self.clean_t], t])
        return t.astype(np.float32)

    def step(self, sample: jnp.ndarray, model_output: jnp.ndarray,
             t_start: int, t_end: int, i: int, **_: object) -> jnp.ndarray:
        """Chunk-wise Euler update on (B, C, T, H, W): each chunk advances by
        its own Δt (reference magi.py:100-116)."""
        t_before = self.chunk_timesteps(t_start, t_end, i)
        t_after = self.chunk_timesteps(t_start, t_end, i + 1)
        dt = jnp.asarray(t_after - t_before, sample.dtype)
        n, c, t, h, w = sample.shape
        cw = self.chunk_width
        s = sample.reshape(n, c, -1, cw, h, w)
        v = model_output.reshape(n, c, -1, cw, h, w)
        s = s + v * dt.reshape(1, 1, -1, 1, 1, 1)
        return s.reshape(n, c, t, h, w)
