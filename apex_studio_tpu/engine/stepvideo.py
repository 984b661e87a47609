"""StepVideo engines (t2v, i2v).

Counterpart of the reference's ``src/engine/stepvideo/{t2v,i2v}.py`` +
``shared.py``: flow-match denoise over the StepVideo DiT with dual caption
conditioning (step-LLM features + CLIP tokens prepended). i2v encodes the
first frame, pads it over latent time, and channel-concats it as
``condition`` (i2v.py:154; the transformer doubles in_channels) with a
motion-score conditioning hook.

The reference's step-LLM ("optimus", shared.py:44) is a bespoke 6144-dim LM
loaded from its own library; here the manifest's text_encoder component
provides the caption features (any encoder matching caption_channels[0]), and
a CLIP text encoder component named ``text_encoder_2`` fills the CLIP slot.
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

logger = logging.getLogger("apex.engine.stepvideo")


class StepVideoShared(BaseEngine):
    def __init__(self, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.text_encoder_2 = None

    def load_components(self) -> None:
        for ctype in ("transformer", "vae", "scheduler", "text_encoder"):
            if getattr(self, ctype, None) is None:
                self.load_component_by_type(ctype)
        spec2 = self.component_specs.get("text_encoder_2")
        if self.text_encoder_2 is None and spec2 is not None:
            from apex_studio_tpu.text_encoder import TextEncoder

            self.text_encoder_2 = TextEncoder(self, spec2)

    def encode_prompt(self, prompt: str, max_len: int = 320):
        hidden, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=max_len, use_chat_template=False)
        clip = None
        if self.text_encoder_2 is not None:
            clip_h, _ = self.text_encoder_2.encode(
                [prompt], max_sequence_length=77, use_chat_template=False)
            clip = jnp.asarray(clip_h, jnp.float32)
        return jnp.asarray(hidden, jnp.float32), jnp.asarray(mask), clip

    def decode_latents(self, z: jnp.ndarray) -> List[np.ndarray]:
        graphdef, state = nnx.split(self.vae)
        key = ("sv_vae_decode", tuple(z.shape))
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

    def _denoise(self, x, ts, text, mask, clip, ntext, nmask, nclip,
                 guidance_scale, condition, progress_cb):
        graphdef, state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0 and ntext is not None
        key = ("sv_step", tuple(x.shape), int(text.shape[1]), do_cfg,
               condition is not None)
        fwd = self._jit_cache.get(key)
        if fwd is None:
            has_cond = condition is not None

            @jax.jit
            def fwd(s, x, t, tx, m, cl, ntx, nm, ncl, cond):
                mm = nnx.merge(graphdef, s)
                kwargs = dict(condition=cond) if has_cond else {}
                pos = mm(x, t, tx, text_mask=m, clip_text=cl, **kwargs)
                if not do_cfg:
                    return pos
                neg = mm(x, t, ntx, text_mask=nm, clip_text=ncl, **kwargs)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        dt_ = self.transformer.dtype
        sigmas = np.asarray(self.scheduler.sigmas, np.float64)
        zero = jnp.zeros((1, 1, 1), jnp.float32)
        for i, t in enumerate(np.asarray(ts, np.float64)):
            t_b = jnp.full((1,), float(t) / 1000.0, jnp.float32)
            v = fwd(state, x.astype(dt_), t_b, text.astype(dt_), mask,
                    clip.astype(dt_) if clip is not None else None,
                    (ntext if do_cfg else text).astype(dt_),
                    nmask if do_cfg else mask,
                    (nclip if do_cfg else clip).astype(dt_)
                    if clip is not None else None,
                    condition.astype(dt_) if condition is not None else zero)
            dt_sig = float(sigmas[i + 1] - sigmas[i])
            x = x + dt_sig * v.astype(jnp.float32)
            if progress_cb is not None:
                progress_cb(min((i + 1) / len(ts), 1.0),
                            f"Denoising step {i + 1}/{len(ts)}")
        return x


@register_engine("stepvideo", "t2v")
class StepVideoT2VEngine(StepVideoShared):
    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 544,
        width: int = 992,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: int = 24,
        num_inference_steps: int = 30,
        guidance_scale: float = 9.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting StepVideo t2v")
        self.load_components()
        t_scale = self.vae.cfg.temporal_scale
        s_scale = self.vae.cfg.spatial_scale
        height -= height % s_scale
        width -= width % s_scale
        if num_frames is None:
            num_frames = int(round((duration or 2.0) * fps))
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        text, mask, clip = self.encode_prompt(prompt or "")
        ntext = nmask = nclip = None
        if negative_prompt is not None and guidance_scale > 1.0:
            ntext, nmask, nclip = self.encode_prompt(negative_prompt or "")

        lat_c = self.vae.cfg.z_channels
        x = self.get_latents((1, lat_c, lat_t, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                   timesteps=timesteps)
        x = self._denoise(x, ts, text, mask, clip, ntext, nmask, nclip,
                          guidance_scale, None,
                          make_mapped_progress(progress_callback, 0.2, 0.9))
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "StepVideo t2v complete")
        return frames


@register_engine("stepvideo", "i2v")
class StepVideoI2VEngine(StepVideoShared):
    def run(
        self,
        image: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        motion_score: float = 5.0,
        height: int = 544,
        width: int = 992,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: int = 24,
        num_inference_steps: int = 30,
        guidance_scale: float = 9.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        import cv2

        safe_emit_progress(progress_callback, 0.0, "Starting StepVideo i2v")
        self.load_components()
        if image is None:
            raise ValueError("i2v requires an input image")
        t_scale = self.vae.cfg.temporal_scale
        s_scale = self.vae.cfg.spatial_scale
        height -= height % s_scale
        width -= width % s_scale
        if num_frames is None:
            num_frames = int(round((duration or 2.0) * fps))
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        arr = cv2.resize(self.load_image_input(image), (width, height),
                         interpolation=cv2.INTER_LANCZOS4)
        px = (arr.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
        img_lat = self.encode_video_latents(px[None, :, None])  # [1,z,1,h,w]
        # first-frame latents + zero padding over latent time (i2v.py:154)
        condition = jnp.concatenate(
            [img_lat.astype(jnp.float32),
             jnp.zeros((1, img_lat.shape[1], lat_t - 1, lat_h, lat_w))], axis=2)

        text, mask, clip = self.encode_prompt(prompt or "")
        ntext = nmask = nclip = None
        if negative_prompt is not None and guidance_scale > 1.0:
            ntext, nmask, nclip = self.encode_prompt(negative_prompt or "")

        lat_c = self.vae.cfg.z_channels
        x = self.get_latents((1, lat_c, lat_t, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                   timesteps=timesteps)
        x = self._denoise(x, ts, text, mask, clip, ntext, nmask, nclip,
                          guidance_scale, condition,
                          make_mapped_progress(progress_callback, 0.2, 0.9))
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "StepVideo i2v complete")
        return frames
