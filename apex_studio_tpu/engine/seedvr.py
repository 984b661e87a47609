"""SeedVR2 upscale engine.

Counterpart of the reference's ``src/engine/seedvr/upscale.py``
(SeedVRUpscaleEngine): the input video/image is resized to the target
resolution, VAE-encoded into conditioning latents (lightly noised,
cond_noise_scale 0.1), and the windowed NaDiT denoises fresh noise channel-
concatenated with that conditioning on a linear-interpolation flow schedule;
fixed positive/negative restoration captions drive the (optional) CFG.
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

logger = logging.getLogger("apex.engine.seedvr")

# the restoration prompt SeedVR2 was trained with (upscale.py defaults)
_DEFAULT_PROMPT = ("Cinematic, high-contrast, ultra-clear photo with fine "
                   "details and realistic textures.")
_DEFAULT_NEGATIVE = ("blurry, low quality, artifacts, oversmoothed, "
                     "painting, illustration")


@register_engine("seedvr", "upscale")
class SeedVRUpscaleEngine(BaseEngine):
    def load_components(self, return_latents: bool) -> None:
        for ctype in ("text_encoder", "transformer", "vae", "scheduler"):
            if getattr(self, ctype, None) is None:
                self.load_component_by_type(ctype)

    def encode_prompt(self, prompt: str):
        hidden, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=128, use_chat_template=False)
        return jnp.where(jnp.asarray(mask)[..., None].astype(bool), hidden, 0.0)

    def _vae(self, op: str, x: jnp.ndarray) -> jnp.ndarray:
        graphdef, state = nnx.split(self.vae)
        key = (f"seedvr_vae_{op}", tuple(x.shape))
        fn = self._jit_cache.get(key)
        if fn is None:

            @jax.jit
            def fn(s, v):
                m = nnx.merge(graphdef, s)
                return m.encode(v) if op == "encode" else m.decode(v)

            self._jit_cache[key] = fn
        return fn(state, x.astype(jnp.float32))

    def run(
        self,
        video: Optional[Any] = None,
        image: Optional[Any] = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        upscale_factor: float = 4.0,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 1,
        guidance_scale: float = 1.0,
        cond_noise_scale: float = 0.1,
        seed: Optional[int] = None,
        max_frames: int = 121,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting SeedVR2 upscale")
        self.load_components(return_latents)
        import cv2

        from apex_studio_tpu.preprocess.base import load_frames

        if video is not None:
            frames_in = (load_frames(video, max_frames=max_frames)
                         if isinstance(video, str) else list(video)[:max_frames])
        elif image is not None:
            frames_in = [self.load_image_input(image)]
        else:
            raise ValueError("seedvr upscale needs a video or an image")

        h0, w0 = np.asarray(frames_in[0]).shape[:2]
        t_scale = getattr(self.vae.cfg, "temporal_scale", None) or \
            getattr(self.vae, "temporal_compression_ratio", 4)
        s_scale = getattr(self.vae.cfg, "spatial_scale", None) or \
            getattr(self.vae, "spatial_compression_ratio", 8)
        pt, ph, pw = self.transformer.cfg.patch_size
        height = height or int(round(h0 * upscale_factor))
        width = width or int(round(w0 * upscale_factor))
        height -= height % (s_scale * ph)
        width -= width % (s_scale * pw)
        n = len(frames_in)
        n = max(1, n - (n - 1) % t_scale)
        frames_in = frames_in[:n]

        up = [cv2.resize(np.asarray(fr), (width, height),
                         interpolation=cv2.INTER_LANCZOS4) for fr in frames_in]
        vid = jnp.asarray(np.stack(up), jnp.float32)
        vid = vid.transpose(3, 0, 1, 2)[None] / 127.5 - 1.0
        cond = self._vae("encode", vid)
        safe_emit_progress(progress_callback, 0.3, "Conditioning encoded")

        rng = np.random.default_rng(seed if seed is not None else 0)
        aug = jnp.asarray(rng.standard_normal(cond.shape), jnp.float32)
        cond_noised = ((1.0 - cond_noise_scale) * cond
                       + cond_noise_scale * aug)
        x = self.get_latents(tuple(cond.shape), seed=seed)

        context = self.encode_prompt(prompt or _DEFAULT_PROMPT)
        neg_context = self.encode_prompt(negative_prompt or _DEFAULT_NEGATIVE)

        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        key = ("seedvr_step", tuple(x.shape), context.shape[1], do_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, cond_, t, ctx, nctx):
                m = nnx.merge(graphdef, state)
                x_in = jnp.concatenate([x, cond_], axis=1).astype(m.dtype)
                pos = m(x_in, t, ctx)
                if not do_cfg:
                    return pos
                neg = m(x_in, t, nctx)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        # linear-interpolation flow schedule (upscale.py:42)
        sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1)
        x = x  # starts at sigma 1 (pure noise)
        cb = make_mapped_progress(progress_callback, 0.35, 0.9)
        for i in range(num_inference_steps):
            t_b = jnp.full((1,), float(sigmas[i]) * 1000.0, jnp.float32)
            v = fwd(tf_state, x, cond_noised, t_b,
                    context.astype(jnp.float32),
                    neg_context.astype(jnp.float32)).astype(jnp.float32)
            x = x + (sigmas[i + 1] - sigmas[i]) * v
            safe_emit_progress(cb, (i + 1) / num_inference_steps,
                               f"step {i + 1}/{num_inference_steps}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        out = self._vae("decode", x)
        b, c, t, h, w = out.shape
        frames = self.tensor_to_frames(
            jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w))
        safe_emit_progress(progress_callback, 1.0, "Upscale complete")
        return frames
