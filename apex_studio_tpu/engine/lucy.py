"""Lucy Edit engine — instruction-driven video editing on the Wan 2.2 5B
(ti2v) backbone.

Contract parity with the reference's ``engine/lucy/edit.py`` (a WanShared
subclass): the whole source video is VAE-encoded and channel-concatenated
with the noise latents at every step (no mask, no CLIP branch); UMT5 text
conditioning and the Wan flow samplers are unchanged. Default geometry is
the 5B stack (48-ch latents, 16x-spatial/4x-temporal VAE), but everything is
read from the manifest configs.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, List, Optional

import jax.numpy as jnp
import numpy as np

from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.engine.wan import WanShared, _WanVaeEncodeMixin, _frames_to_video_tensor
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.lucy")


@register_engine("lucy", "edit")
class LucyEditEngine(WanShared, _WanVaeEncodeMixin):
    def run(
        self,
        video: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        num_frames: Optional[int] = None,
        duration: Optional[float] = None,
        fps: int = 24,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        guidance_scale_2: Optional[float] = None,
        boundary_ratio: Optional[float] = None,
        seed: Optional[int] = None,
        shift: Optional[float] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting edit pipeline")
        self.load_components(return_latents=False)
        if video is None:
            raise ValueError("lucy edit requires an input video")
        if isinstance(video, (str, bytes)) or hasattr(video, "__fspath__"):
            from apex_studio_tpu.preprocess.base import load_frames

            video = load_frames(video, max_frames=num_frames)
        frames_in = [self.load_image_input(np.asarray(f)) for f in video]

        vae_cfg = self.vae.cfg
        s_scale, t_scale = vae_cfg.spatial_scale, vae_cfg.temporal_scale
        pt, ph, pw = self.transformer.cfg.patch_size
        height -= height % (s_scale * ph)
        width -= width % (s_scale * pw)
        if num_frames is None:
            num_frames = (
                int(round((duration or 5.0) * fps)) + 1 if duration else len(frames_in)
            )
        num_frames = min(num_frames, len(frames_in))
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        frames_in = frames_in[:num_frames]

        condition = self.encode_video_latents(
            _frames_to_video_tensor(frames_in, height, width)
        )
        safe_emit_progress(progress_callback, 0.25, "Source video encoded")

        context = self.encode_prompt(prompt or "")
        use_cfg = guidance_scale > 1.0
        neg_context = self.encode_prompt(negative_prompt or "") if use_cfg else None

        lat_t, lat_h, lat_w = condition.shape[-3:]
        noise_c = self.transformer.cfg.in_channels - condition.shape[1]
        x = self.get_latents((1, noise_c, lat_t, lat_h, lat_w), seed=seed)
        safe_emit_progress(progress_callback, 0.3, "Initialized latent noise")

        ts, _ = self.get_timesteps(
            self.scheduler, num_inference_steps,
            **({"shift": shift} if shift is not None else {}),
        )
        boundary_timestep = (
            boundary_ratio * getattr(self.scheduler, "num_train_timesteps", 1000)
            if boundary_ratio is not None
            else None
        )
        if boundary_timestep is not None and self.transformer_2 is None:
            self._load_transformer_2()
        from flax import nnx

        _, state_1 = nnx.split(self.transformer)
        state_2 = nnx.split(self.transformer_2)[1] if self.transformer_2 is not None else None

        shapes = ((1, self.transformer.cfg.in_channels, lat_t, lat_h, lat_w), context.shape[1])
        denoise_cb = make_mapped_progress(progress_callback, 0.35, 0.9)
        if len(ts) <= 8:
            render_on_step = False
        for i, t in enumerate(ts):
            if boundary_timestep is not None and float(t) < boundary_timestep and state_2 is not None:
                transformer, state, tag = self.transformer_2, state_2, "lucy_low"
                g = guidance_scale_2 if guidance_scale_2 is not None else guidance_scale
            else:
                transformer, state, tag = self.transformer, state_1, "lucy_high"
                g = guidance_scale
            fwd = self._fwd_for(transformer, tag, shapes)

            t_vec = jnp.full((1,), float(t), jnp.float32)
            x_in = jnp.concatenate([x, condition], axis=1).astype(transformer.dtype)
            v = fwd(state, x_in, t_vec, context)
            if use_cfg and g > 1.0:
                v_neg = fwd(state, x_in, t_vec, neg_context)
                v = v_neg.astype(jnp.float32) + g * (
                    v.astype(jnp.float32) - v_neg.astype(jnp.float32)
                )
            (x,) = self.scheduler.step(v.astype(jnp.float32), float(t), x)

            if (
                render_on_step
                and render_on_step_callback is not None
                and (i + 1) % render_on_step_interval == 0
                and i + 1 < len(ts)
            ):
                try:
                    render_on_step_callback(self.preview_frames(x, self.decode_latents), i)
                except Exception:
                    logger.exception("preview callback failed")
            if denoise_cb is not None:
                denoise_cb(min((i + 1) / len(ts), 1.0), f"Denoising step {i + 1}/{len(ts)}")

        safe_emit_progress(progress_callback, 0.9, "Denoising complete")
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed edit pipeline")
        return frames
