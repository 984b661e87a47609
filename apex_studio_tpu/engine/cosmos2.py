"""Cosmos (Predict2) engines — video2world i2v / v2v.

Counterpart of the reference's ``src/engine/cosmos2/`` (shared.py base_denoise,
i2v.py, v2v.py): EDM-style conditioning on a flow sigma ladder —
t = σ/(σ+1), c_in = c_skip = 1−t, c_out = −t — with conditioning frames
(the input image/video latents) pinned at σ≈0 through a per-frame timestep
tensor and re-imposed on the x0 prediction every step. The transformer sees a
condition-mask channel marking the clean frames.
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
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.cosmos2")


class Cosmos2Shared(BaseEngine):
    def load_components(self, return_latents: bool) -> None:
        for ctype in ("text_encoder", "transformer", "vae", "scheduler"):
            if getattr(self, ctype, None) is None:
                self.load_component_by_type(ctype)

    def encode_prompt(self, prompt: str, max_sequence_length: int = 512):
        hidden, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=max_sequence_length,
            use_chat_template=False)
        return jnp.where(jnp.asarray(mask)[..., None].astype(bool), hidden, 0.0)

    # encode_video_latents inherited from BaseEngine (disk-cached).

    def decode_latents(self, z: jnp.ndarray) -> List[np.ndarray]:
        graphdef, state = nnx.split(self.vae)
        key = ("cosmos_vae_decode", tuple(z.shape))
        dec = self._jit_cache.get(key)
        if dec is None:

            @jax.jit
            def dec(s, z):
                return nnx.merge(graphdef, s).decode(z)

            self._jit_cache[key] = dec
        video = dec(state, z.astype(jnp.float32))
        b, c, t, h, w = video.shape
        frames = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames)

    def _denoise(self, x, cond_latents, cond_ind, context, neg_context,
                 guidance_scale, num_inference_steps, fps, progress_cb,
                 sigma_conditioning: float = 1e-4):
        """cond_ind: (1, 1, T_lat, 1, 1) — 1 on clean conditioning frames."""
        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        lat_f = x.shape[2]
        cond_mask = jnp.broadcast_to(cond_ind, (1, 1, lat_f, x.shape[3],
                                                x.shape[4]))
        t_cond = sigma_conditioning / (sigma_conditioning + 1.0)
        key = ("cosmos_step", tuple(x.shape), context.shape[1], do_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, cond_lat, t_frame, sigma, ctx, nctx):
                m = nnx.merge(graphdef, state)
                t = sigma / (sigma + 1.0)
                c_in = 1.0 - t
                c_out = -t
                x_in = (cond_ind * cond_lat
                        + (1.0 - cond_ind) * x * c_in).astype(m.dtype)
                pred = m(x_in, t_frame, ctx, fps=None,
                         condition_mask=cond_mask).astype(jnp.float32)
                x0 = (1.0 - t) * x + c_out * pred
                x0 = cond_ind * cond_lat + (1.0 - cond_ind) * x0
                if do_cfg:
                    npred = m(x_in, t_frame, nctx, fps=None,
                              condition_mask=cond_mask).astype(jnp.float32)
                    nx0 = (1.0 - t) * x + c_out * npred
                    nx0 = cond_ind * cond_lat + (1.0 - cond_ind) * nx0
                    x0 = x0 + guidance_scale * (x0 - nx0)
                return (x - x0) / sigma

            self._jit_cache[key] = fwd
        # descending flow sigmas 1 → 0 (reference linspace(0,1) inverted)
        sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1)
        sigmas[-1] = 0.0
        x = x * float(sigmas[0])
        for i in range(num_inference_steps):
            sigma = float(max(sigmas[i], 1e-4))
            t_val = sigma / (sigma + 1.0)
            t_frame = jnp.where(cond_ind[0, 0, :, 0, 0] > 0.5, t_cond, t_val)[None]
            v = fwd(tf_state, x, cond_latents, t_frame,
                    jnp.float32(sigma), context.astype(jnp.float32),
                    neg_context.astype(jnp.float32))
            x = x + (sigmas[i + 1] - sigmas[i]) * v
            safe_emit_progress(progress_cb, (i + 1) / num_inference_steps,
                               f"step {i + 1}/{num_inference_steps}")
        # clean frames come straight from the conditioning
        return cond_ind * cond_latents + (1.0 - cond_ind) * x

    def _run(self, cond_video, n_cond_latent_frames, prompt, negative_prompt,
             height, width, num_frames, num_inference_steps, guidance_scale,
             seed, return_latents, progress_callback, fps):
        context = self.encode_prompt(prompt or "")
        neg_context = self.encode_prompt(negative_prompt or "")
        safe_emit_progress(progress_callback, 0.15, "Prompts encoded")
        cond_latents = self.encode_video_latents(cond_video)
        lat_f = cond_latents.shape[2]
        cond_ind = jnp.zeros((1, 1, lat_f, 1, 1), jnp.float32)
        cond_ind = cond_ind.at[:, :, :n_cond_latent_frames].set(1.0)
        x = self.get_latents(tuple(cond_latents.shape), seed=seed)
        safe_emit_progress(progress_callback, 0.3, "Latents ready")
        x = self._denoise(
            x, cond_latents.astype(jnp.float32), cond_ind, context,
            neg_context, guidance_scale, num_inference_steps, fps,
            make_mapped_progress(progress_callback, 0.3, 0.9))
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames


@register_engine("cosmos2", "i2v")
class Cosmos2I2VEngine(Cosmos2Shared):
    def run(self, image: Any = None, prompt: Optional[str] = None,
            negative_prompt: Optional[str] = None,
            height: int = 480, width: int = 832,
            duration: Optional[float] = None, fps: int = 16,
            num_frames: Optional[int] = None, num_inference_steps: int = 35,
            guidance_scale: float = 7.0, seed: Optional[int] = None,
            return_latents: bool = False, progress_callback=None,
            offload: bool = True, **_: Any):
        safe_emit_progress(progress_callback, 0.0, "Starting Cosmos2 i2v")
        self.load_components(return_latents)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        t_scale = self.vae.cfg.temporal_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        import cv2

        arr = self.load_image_input(image)
        arr = cv2.resize(arr, (width, height), interpolation=cv2.INTER_AREA)
        px = jnp.asarray(arr, jnp.float32).transpose(2, 0, 1)[None, :, None]
        px = px / 127.5 - 1.0
        # reference repeats the image over the full clip before encoding
        vid = jnp.tile(px, (1, 1, num_frames, 1, 1))
        return self._run(vid, 1, prompt, negative_prompt, height, width,
                         num_frames, num_inference_steps, guidance_scale,
                         seed, return_latents, progress_callback, fps)


@register_engine("cosmos2", "v2v")
class Cosmos2V2VEngine(Cosmos2Shared):
    def run(self, video: Any = None, prompt: Optional[str] = None,
            negative_prompt: Optional[str] = None,
            height: int = 480, width: int = 832,
            duration: Optional[float] = None, fps: int = 16,
            num_frames: Optional[int] = None, num_inference_steps: int = 35,
            guidance_scale: float = 7.0, seed: Optional[int] = None,
            conditioning_frames: int = 9,
            return_latents: bool = False, progress_callback=None,
            offload: bool = True, **_: Any):
        safe_emit_progress(progress_callback, 0.0, "Starting Cosmos2 v2v")
        self.load_components(return_latents)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        t_scale = self.vae.cfg.temporal_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        import cv2

        from apex_studio_tpu.preprocess.base import load_frames

        frames_in = (load_frames(video) if isinstance(video, str)
                     else list(video))
        frames_in = [cv2.resize(np.asarray(fr), (width, height),
                                interpolation=cv2.INTER_AREA)
                     for fr in frames_in]
        n_cond = min(len(frames_in), conditioning_frames)
        while len(frames_in) < num_frames:
            frames_in.append(frames_in[-1])
        vid = jnp.asarray(np.stack(frames_in[:num_frames]), jnp.float32)
        vid = vid.transpose(3, 0, 1, 2)[None] / 127.5 - 1.0
        n_cond_lat = max(1, (n_cond - 1) // t_scale + 1)
        return self._run(vid, n_cond_lat, prompt, negative_prompt, height,
                         width, num_frames, num_inference_steps,
                         guidance_scale, seed, return_latents,
                         progress_callback, fps)
