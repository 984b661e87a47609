"""SkyReels V2 engines (t2v / i2v / df).

Contract parity with the reference's ``engine/skyreels/{t2v,i2v,df}.py``:
- the DiT is Wan with ``inject_sample_info``: an fps token (index 0 for
  16 fps, 1 otherwise — t2v.py:367) whose 6·dim projection joins every
  block's modulation
- **df** (diffusion forcing) generates long videos autoregressively in one
  latent tensor: a timestep MATRIX staggers frames ``ar_step`` apart
  (df.py:13), each forward runs with PER-FRAME timesteps, and only frames
  whose level changed update (df.py:202); prefix frames (i2v / continuation)
  start fully denoised via ``num_pre_ready``
- per-frame Euler flow-match updates are vectorized over frames: dt is
  gathered host-side from each frame's step index, one fused device update
  per row (the reference deep-copies a scheduler per frame, df.py:448)
"""

from __future__ import annotations

import logging
import math
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.engine.wan import WanI2VEngine, WanShared, WanT2VEngine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.skyreels")


def fps_to_index(fps: int) -> int:
    return 0 if int(fps) == 16 else 1


def generate_timestep_matrix(
    num_frames: int,
    step_template: np.ndarray,
    base_num_frames: int,
    ar_step: int = 5,
    num_pre_ready: int = 0,
    causal_block_size: int = 1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[Tuple[int, int]]]:
    """Diffusion-forcing schedule (df.py:13). Returns (step_matrix [R, F],
    step_index [R, F], update_mask [R, F], valid_interval per row)."""
    num_iterations = len(step_template) + 1
    nfb = num_frames // causal_block_size
    base_nfb = base_num_frames // causal_block_size
    if base_nfb < nfb:
        min_ar_step = len(step_template) / base_nfb
        if ar_step < min_ar_step:
            raise ValueError(f"ar_step must be ≥ {math.ceil(min_ar_step)}")
    template = np.concatenate([[999.0], np.asarray(step_template, np.float64), [0.0]])
    pre_row = np.zeros(nfb, np.int64)
    if num_pre_ready > 0:
        pre_row[: num_pre_ready // causal_block_size] = num_iterations

    step_matrix, step_index, update_mask, valid_interval = [], [], [], []
    while not np.all(pre_row >= (num_iterations - 1)):
        new_row = np.zeros(nfb, np.int64)
        for i in range(nfb):
            if i == 0 or pre_row[i - 1] >= (num_iterations - 1):
                new_row[i] = pre_row[i] + 1
            else:
                new_row[i] = new_row[i - 1] - ar_step
        new_row = np.clip(new_row, 0, num_iterations)
        update_mask.append((new_row != pre_row) & (new_row != num_iterations))
        step_index.append(new_row.copy())
        step_matrix.append(template[new_row])
        pre_row = new_row

    terminal = base_nfb
    for mask in update_mask:
        if terminal < nfb and mask[terminal]:
            terminal += 1
        valid_interval.append((max(terminal - base_nfb, 0), terminal))

    def expand(rows):
        m = np.stack(rows)
        if causal_block_size > 1:
            m = np.repeat(m[:, :, None], causal_block_size, axis=2).reshape(len(rows), -1)
        return m

    vi = [(s * causal_block_size, e * causal_block_size) for s, e in valid_interval]
    return expand(step_matrix), expand(step_index), expand(update_mask), vi


class SkyReelsFPSMixin(WanShared):
    """Threads the fps token through the wan forward builders."""

    _fps_index: Optional[jnp.ndarray] = None

    def _fwd_for(self, transformer, tag: str, shapes):
        if not getattr(transformer.cfg, "inject_sample_info", False):
            return super()._fwd_for(transformer, tag, shapes)
        key = (tag, shapes, "fps")
        fwd = self._jit_cache.get(key)
        if fwd is None:
            graphdef, _ = nnx.split(transformer)

            @jax.jit
            def fps_fwd(state, x, t, ctx, fps_index):
                return nnx.merge(graphdef, state)(x, t, ctx, fps_index=fps_index)

            self._jit_cache[key] = fps_fwd
            fwd = fps_fwd
        fps = self._fps_index

        def bound(state, x, t, ctx):
            return fwd(state, x, t, ctx, fps)

        return bound


@register_engine("skyreels", "t2v")
class SkyReelsT2VEngine(SkyReelsFPSMixin, WanT2VEngine):
    def run(self, *args: Any, fps: int = 24, **kwargs: Any):
        self._fps_index = jnp.asarray([fps_to_index(fps)], jnp.int32)
        return super().run(*args, fps=fps, **kwargs)


@register_engine("skyreels", "i2v")
class SkyReelsI2VEngine(SkyReelsFPSMixin, WanI2VEngine):
    def run(self, *args: Any, fps: int = 24, **kwargs: Any):
        self._fps_index = jnp.asarray([fps_to_index(fps)], jnp.int32)
        return super().run(*args, fps=fps, **kwargs)


@register_engine("skyreels", "df")
class SkyReelsDFEngine(SkyReelsFPSMixin, WanShared):
    """Diffusion-forcing long-video generation."""

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        image: Optional[Any] = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        base_duration: Optional[float] = None,
        fps: int = 24,
        num_frames: Optional[int] = None,
        base_num_frames: Optional[int] = None,
        num_inference_steps: int = 30,
        guidance_scale: float = 5.0,
        ar_step: int = 5,
        causal_block_size: int = 1,
        overlap_history: Optional[int] = None,
        seed: Optional[int] = None,
        shift: Optional[float] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 5,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting diffusion-forcing pipeline")
        self.load_components(return_latents=False)
        self._fps_index = jnp.asarray([fps_to_index(fps)], jnp.int32)

        vae_cfg = self.vae.cfg
        s_scale, t_scale = vae_cfg.spatial_scale, vae_cfg.temporal_scale
        pt, ph, pw = self.transformer.cfg.patch_size
        height -= height % (s_scale * ph)
        width -= width % (s_scale * pw)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        if base_num_frames is None:
            base_num_frames = (
                int(round(base_duration * fps)) + 1 if base_duration else num_frames
            )

        context = self.encode_prompt(prompt or "")
        use_cfg = guidance_scale > 1.0
        neg_context = self.encode_prompt(negative_prompt or "") if use_cfg else None
        safe_emit_progress(progress_callback, 0.2, "Prompts ready")

        lat_t = (num_frames - 1) // t_scale + 1
        base_lat_t = min(lat_t, (base_num_frames - 1) // t_scale + 1)
        lat_h, lat_w = height // s_scale, width // s_scale
        c_lat = self.transformer.cfg.in_channels
        x = self.get_latents((1, c_lat, lat_t, lat_h, lat_w), seed=seed)

        # Prefix conditioning: an input image becomes a fully-denoised frame 0.
        num_pre_ready = 0
        if image is not None:
            image = self.load_image_input(image)
            import cv2

            resized = cv2.resize(image, (width, height), interpolation=cv2.INTER_LANCZOS4)
            first = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
            video = first[None, :, None]
            z0 = self.encode_video_latents(video)
            x = x.at[:, :, : z0.shape[2]].set(z0.astype(jnp.float32))
            num_pre_ready = z0.shape[2]

        # Sigma grid from the scheduler (flow-match family).
        ts, _ = self.get_timesteps(
            self.scheduler, num_inference_steps,
            **({"shift": shift} if shift is not None else {}),
        )
        sigmas = np.asarray(self.scheduler.sigmas, np.float64)  # len n+1, ends 0
        step_template = np.asarray(ts, np.float64)

        step_matrix, step_index, update_mask, valid_interval = generate_timestep_matrix(
            lat_t, step_template, base_lat_t,
            ar_step=ar_step, num_pre_ready=num_pre_ready,
            causal_block_size=causal_block_size,
        )
        safe_emit_progress(progress_callback, 0.3, "Timestep matrix ready")

        # dt per frame for a vectorized Euler flow-match update: frame at
        # template index k integrates sigma[k] → sigma[k+1].
        sig_of_idx = np.concatenate([[1.0], sigmas])  # index 0 = t=999 row header
        graphdef, tf_state = nnx.split(self.transformer)
        shapes = (tuple(x.shape), context.shape[1])
        fwd = self._fwd_for(self.transformer, "skyreels_df_fwd", shapes)

        denoise_cb = make_mapped_progress(progress_callback, 0.3, 0.9)
        model_dtype = self.transformer.dtype
        n_rows = len(step_matrix)
        for i in range(n_rows):
            row_t = step_matrix[i]          # [F] timestep values
            row_idx = step_index[i]         # [F] template indices (1-based rows)
            upd = update_mask[i]            # [F] bool
            s0, s1 = valid_interval[i]

            t_pf = jnp.asarray(row_t[None, s0:s1], jnp.float32)
            x_win = x[:, :, s0:s1]
            v = fwd(tf_state, x_win.astype(model_dtype), t_pf, context)
            if use_cfg:
                v_neg = fwd(tf_state, x_win.astype(model_dtype), t_pf, neg_context)
                v = v_neg.astype(jnp.float32) + guidance_scale * (
                    v.astype(jnp.float32) - v_neg.astype(jnp.float32)
                )

            # per-frame dt: sigma at the frame's index → next index
            idx_win = row_idx[s0:s1]
            hi = len(sig_of_idx) - 1
            dt = sig_of_idx[np.clip(idx_win, 0, hi)] \
                - sig_of_idx[np.clip(idx_win + 1, 0, hi)]
            dt = jnp.asarray(dt[None, None, :, None, None], jnp.float32)
            x_new = x_win.astype(jnp.float32) - dt * v.astype(jnp.float32)
            upd_win = jnp.asarray(upd[s0:s1][None, None, :, None, None])
            x = x.at[:, :, s0:s1].set(jnp.where(upd_win, x_new, x_win))

            if denoise_cb is not None:
                denoise_cb(min((i + 1) / n_rows, 1.0), f"DF row {i + 1}/{n_rows}")
            if (
                render_on_step and render_on_step_callback is not None
                and (i + 1) % render_on_step_interval == 0 and i + 1 < n_rows
            ):
                try:
                    render_on_step_callback(self.preview_frames(x, self.decode_latents), i)
                except Exception:
                    logger.exception("preview callback failed")

        safe_emit_progress(progress_callback, 0.9, "Denoising complete")
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed diffusion-forcing pipeline")
        return frames
