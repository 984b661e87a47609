"""Mochi-1 t2v engine.

Contract parity with the reference's ``engine/mochi/t2v.py``:
- T5-XXL prompt features (max 256 tokens) with the attention mask forwarded
  to the DiT (the pooled-caption conditioning needs it)
- linear-quadratic sigma schedule (threshold_noise=0.025) on a FlowMatch
  Euler sampler
- the Mochi DiT predicts the *negated* flow velocity (the published pipeline
  flips the sign before the scheduler step) — reproduced here
- latents [B, 12, (frames−1)/6+1, H/8, W/8]; causal 1 + 6k frame contract
"""

from __future__ import annotations

import logging
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.schedulers.rectified_flow import linear_quadratic_schedule
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.mochi")


@register_engine("mochi", "t2v")
class MochiT2VEngine(BaseEngine):
    def load_components(self) -> None:
        for ctype, attr in (("text_encoder", "text_encoder"), ("transformer", "transformer"),
                            ("vae", "vae"), ("scheduler", "scheduler")):
            if getattr(self, attr) is None:
                self.load_component_by_type(ctype)

    def encode_prompt(self, prompt: str, max_sequence_length: int = 256):
        hidden, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=max_sequence_length, use_chat_template=False
        )
        mask = jnp.asarray(mask).astype(jnp.float32)
        return jnp.where(mask[..., None].astype(bool), hidden, 0.0), mask

    def decode_latents(self, z: jnp.ndarray) -> List[np.ndarray]:
        key = ("mochi_vae_decode", tuple(z.shape))
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, z):
                return nnx.merge(graphdef, state).decode(z)

            self._jit_cache[key] = dec
        _, vae_state = nnx.split(self.vae)
        video = dec(vae_state, z.astype(jnp.float32))
        b, c, t, h, w = video.shape
        frames = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames)

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 848,
        num_frames: int = 85,
        num_inference_steps: int = 64,
        guidance_scale: float = 4.5,
        threshold_noise: float = 0.025,
        seed: Optional[int] = None,
        latents: Optional[np.ndarray] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        max_sequence_length: int = 256,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting t2v pipeline")
        self.load_components()

        vae_cfg = self.vae.cfg
        s_scale, t_scale = vae_cfg.spatial_scale, vae_cfg.temporal_scale
        p = self.transformer.cfg.patch_size
        height -= height % (s_scale * p)
        width -= width % (s_scale * p)
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        context, mask = self.encode_prompt(prompt or "", max_sequence_length)
        use_cfg = guidance_scale > 1.0
        neg_context = neg_mask = None
        if use_cfg:
            neg_context, neg_mask = self.encode_prompt(negative_prompt or "", max_sequence_length)
        safe_emit_progress(progress_callback, 0.2, "Prompts ready")

        lat_c = self.transformer.cfg.in_channels
        x = self.get_latents((1, lat_c, lat_t, lat_h, lat_w), seed=seed, latents=latents)

        sigmas = linear_quadratic_schedule(num_inference_steps, threshold_noise)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps, sigmas=list(sigmas))
        safe_emit_progress(progress_callback, 0.35, "Noise + timesteps ready")

        graphdef, state = nnx.split(self.transformer)
        key = ("mochi_fwd", tuple(x.shape), context.shape[1])
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, t, ctx, m):
                return nnx.merge(graphdef, state)(x, t, ctx, encoder_attention_mask=m)

            self._jit_cache[key] = fwd

        denoise_cb = make_mapped_progress(progress_callback, 0.35, 0.9)
        if len(ts) <= 8:
            render_on_step = False
        for i, t in enumerate(ts):
            t_vec = jnp.full((1,), float(t), jnp.float32)
            x_in = x.astype(self.transformer.dtype)
            v = fwd(state, x_in, t_vec, context, mask)
            if use_cfg:
                v_neg = fwd(state, x_in, t_vec, neg_context, neg_mask)
                v = v_neg.astype(jnp.float32) + guidance_scale * (
                    v.astype(jnp.float32) - v_neg.astype(jnp.float32)
                )
            # Mochi predicts the negated velocity (pipeline_mochi.py sign flip)
            (x,) = self.scheduler.step(-v.astype(jnp.float32), float(t), x)

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
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames
