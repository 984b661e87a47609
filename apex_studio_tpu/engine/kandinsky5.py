"""Kandinsky 5.0 engines (t2v / i2v).

Counterpart of the reference's ``src/engine/kandinsky5/`` (t2v.py, i2v.py,
shared.py): Qwen2.5-VL sequence embeddings + pooled CLIP conditioning, flow-
match Euler denoise with CFG; i2v doubles the visual channels with the
first-frame latent and a validity mask (transformer visual_cond path,
model.py:625). VAE is the HunyuanVideo 3D-causal family.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.kandinsky5")


class Kandinsky5Shared(BaseEngine):
    def __init__(self, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.text_encoder_2 = None

    def load_text_encoders(self) -> None:
        from apex_studio_tpu.text_encoder import TextEncoder

        te_specs = [s for s in self.component_specs.values()
                    if s.get("type") == "text_encoder"]
        qwen = next((s for s in te_specs if "Qwen" in (s.get("base") or "")), None)
        clip = next((s for s in te_specs if "CLIP" in (s.get("base") or "")), None)
        if qwen is None or clip is None:
            raise KeyError("kandinsky5 manifest needs Qwen2.5-VL and CLIP "
                           "text_encoder components")
        if self.text_encoder is None:
            self.text_encoder = TextEncoder(self, qwen)
        if self.text_encoder_2 is None:
            self.text_encoder_2 = TextEncoder(self, clip)

    def encode_prompt(self, prompt: str, max_sequence_length: int = 256):
        self.load_text_encoders()
        seq, _mask = self.text_encoder.encode(
            [prompt], max_sequence_length=max_sequence_length)
        clip = self.text_encoder_2
        ids, mask = clip.tokenize([prompt], 77)
        model = clip._ensure_model()
        graphdef, state = nnx.split(model)
        key = ("k5_clip_fwd", ids.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, ids, mask):
                return nnx.merge(graphdef, state)(ids, attention_mask=mask)

            self._jit_cache[key] = fwd
        _, pooled = fwd(state, jnp.asarray(ids), jnp.asarray(mask))
        return jnp.asarray(seq), jnp.asarray(pooled)

    def load_components(self, return_latents: bool) -> None:
        self.load_text_encoders()
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

    def decode_latents(self, z: jnp.ndarray) -> List[np.ndarray]:
        key = ("k5_vae_decode", tuple(z.shape))
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, z):
                return nnx.merge(graphdef, state).decode(z)

            self._jit_cache[key] = dec
        _, state = nnx.split(self.vae)
        video = dec(state, z.astype(jnp.float32))
        b, c, t, h, w = video.shape
        frames = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames)

    def _denoise(self, x, cond, context, pooled, neg_context, neg_pooled,
                 guidance_scale, ts, progress_cb):
        """cond: None (t2v) or (B, C+1, T, H, W) conditioning channels."""
        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        key = ("k5_step", tuple(x.shape),
               None if cond is None else tuple(cond.shape),
               context.shape[1], do_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, cnd, t, ctx, pld, nctx, npld):
                m = nnx.merge(graphdef, state)
                x_in = x if cnd is None else jnp.concatenate([x, cnd], axis=1)
                pos = m(x_in, t, ctx, pld)
                if not do_cfg:
                    return pos
                neg = m(x_in, t, nctx, npld)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        dt = self.transformer.dtype
        cnd = None if cond is None else cond.astype(dt)
        for i, t in enumerate(np.asarray(ts, np.float64)):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(tf_state, x.astype(dt), cnd, t_b, context.astype(dt),
                    pooled.astype(dt), neg_context.astype(dt),
                    neg_pooled.astype(dt))
            out = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = out[0] if isinstance(out, tuple) else out
            safe_emit_progress(progress_cb, (i + 1) / len(ts),
                               f"step {i + 1}/{len(ts)}")
        return x

    def _run(self, prompt, negative_prompt, height, width, num_frames,
             num_inference_steps, guidance_scale, seed, timesteps,
             return_latents, progress_callback, cond=None):
        context, pooled = self.encode_prompt(prompt or "")
        neg_context, neg_pooled = self.encode_prompt(negative_prompt or "")
        safe_emit_progress(progress_callback, 0.2, "Prompts encoded")
        t_scale = getattr(self.vae.cfg, "temporal_scale", None) or \
            getattr(self.vae, "temporal_compression_ratio", 4)
        s_scale = getattr(self.vae.cfg, "spatial_scale", None) or \
            getattr(self.vae, "spatial_compression_ratio", 8)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        x = self.get_latents(
            (1, self.transformer.cfg.in_visual_dim, lat_f, lat_h, lat_w),
            seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                   timesteps=timesteps)
        x = self._denoise(x, cond, context, pooled, neg_context, neg_pooled,
                          guidance_scale, ts,
                          make_mapped_progress(progress_callback, 0.25, 0.9))
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames


@register_engine("kandinsky5", "t2v")
class Kandinsky5T2VEngine(Kandinsky5Shared):
    def run(self, prompt: Optional[str] = None,
            negative_prompt: Optional[str] = None,
            height: int = 512, width: int = 768,
            duration: Optional[float] = None, fps: int = 24,
            num_frames: Optional[int] = None, num_inference_steps: int = 50,
            guidance_scale: float = 5.0, seed: Optional[int] = None,
            timesteps: Optional[List[float]] = None,
            return_latents: bool = False, progress_callback=None,
            offload: bool = True, **_: Any):
        safe_emit_progress(progress_callback, 0.0, "Starting Kandinsky5 t2v")
        self.load_components(return_latents)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        return self._run(prompt, negative_prompt, height, width, num_frames,
                         num_inference_steps, guidance_scale, seed, timesteps,
                         return_latents, progress_callback)


@register_engine("kandinsky5", "i2v")
class Kandinsky5I2VEngine(Kandinsky5Shared):
    def run(self, image: Any = None, prompt: Optional[str] = None,
            negative_prompt: Optional[str] = None,
            height: int = 512, width: int = 768,
            duration: Optional[float] = None, fps: int = 24,
            num_frames: Optional[int] = None, num_inference_steps: int = 50,
            guidance_scale: float = 5.0, seed: Optional[int] = None,
            timesteps: Optional[List[float]] = None,
            return_latents: bool = False, progress_callback=None,
            offload: bool = True, **_: Any):
        safe_emit_progress(progress_callback, 0.0, "Starting Kandinsky5 i2v")
        self.load_components(return_latents)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        t_scale = getattr(self.vae.cfg, "temporal_scale", 4)
        s_scale = getattr(self.vae.cfg, "spatial_scale", 8)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        import cv2

        arr = self.load_image_input(image)
        arr = cv2.resize(arr, (width, height), interpolation=cv2.INTER_AREA)
        px = (jnp.asarray(arr, jnp.float32).transpose(2, 0, 1)[None, :, None]
              / 127.5 - 1.0)
        img_lat = self.encode_video_latents(px)  # [1, C, 1, h, w]
        c = img_lat.shape[1]
        cond = jnp.zeros((1, c + 1, lat_f, lat_h, lat_w), jnp.float32)
        cond = cond.at[:, :c, :1].set(img_lat)
        cond = cond.at[:, c, 0].set(1.0)  # validity mask on the first frame
        return self._run(prompt, negative_prompt, height, width, num_frames,
                         num_inference_steps, guidance_scale, seed, timesteps,
                         return_latents, progress_callback, cond=cond)
