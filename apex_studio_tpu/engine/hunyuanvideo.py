"""HunyuanVideo (original) engines: t2v + i2v.

Contract parity with the reference's ``engine/hunyuanvideo/{t2v,i2v}.py`` and
``shared.py``:

- llava-llama-3 conditioning: video-description chat template, hidden state
  -(2+1) with the template prefix cropped (crop_start=95; helper
  ``src/helpers/hunyuanvideo/llama.py:98``), max length 256 (+crop)
- CLIP-L pooled second encoder (shared.py:87)
- FlowMatchDiscrete sampler (shift per manifest, typically 7.0); embedded
  distilled guidance = guidance_scale x 1000 (guidance_embeds), optional true
  CFG via ``true_guidance_scale``
- i2v conditioning (i2v.py:131-184): noise mixed with the image latent at
  t=0.999; ``latent_concat`` packs [noise(16) | image(16, frames>0 zeroed) |
  mask(1)] channels, ``token_replace`` pins the first latent frame to the
  image latent and denoises the remaining frames
- render_on_step force-disabled for <=8-step runs (house rule)

Denoise runs as ONE fused jitted dispatch per step (engine/fused.py).
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

logger = logging.getLogger("apex.engine.hunyuanvideo")

PROMPT_TEMPLATE_TEXT = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by detailing the "
    "following aspects: 1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
)
CROP_START_TEXT = 95


class HunyuanVideoShared(BaseEngine):
    def __init__(self, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.text_encoder_2 = None  # CLIP-L pooled

    def load_text_encoders(self) -> None:
        from apex_studio_tpu.text_encoder import TextEncoder

        te_specs = [s for s in self.component_specs.values() if s.get("type") == "text_encoder"]
        llama = next(
            (s for s in te_specs if "Llama" in (s.get("base") or "") or "Llava" in (s.get("base") or "")),
            None,
        )
        clip = next((s for s in te_specs if "CLIP" in (s.get("base") or "")), None)
        if self.text_encoder is None and llama is not None:
            self.text_encoder = TextEncoder(self, llama)
        if self.text_encoder_2 is None and clip is not None:
            self.text_encoder_2 = TextEncoder(self, clip)

    def _encode_llama(self, prompt: str, max_length: int = 256,
                      crop_start: int = CROP_START_TEXT):
        te = self.text_encoder
        model = te._ensure_model()
        text = PROMPT_TEMPLATE_TEXT.format(prompt or "")
        ids, mask = te.tokenize([text], max_length + crop_start)
        graphdef, state = nnx.split(model)
        key = ("hyv_llama", ids.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, ids, mask):
                m = nnx.merge(graphdef, state)
                return m(ids, attention_mask=mask)

            self._jit_cache[key] = fwd
        hidden = fwd(state, jnp.asarray(ids), jnp.asarray(mask))
        return hidden[:, crop_start:], jnp.asarray(mask)[:, crop_start:]

    def _encode_clip_pooled(self, prompt: str):
        clip = self.text_encoder_2
        if clip is None:
            dim = self.transformer.cfg.pooled_projection_dim
            return jnp.zeros((1, dim), jnp.float32)
        model = clip._ensure_model()
        ids, mask = clip.tokenize([prompt or ""], 77)
        graphdef, state = nnx.split(model)
        key = ("hyv_clip", ids.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, ids, mask):
                m = nnx.merge(graphdef, state)
                _, pooled = m(ids, attention_mask=mask)
                return pooled

            self._jit_cache[key] = fwd
        return fwd(state, jnp.asarray(ids), jnp.asarray(mask))

    def load_components(self) -> None:
        self.load_text_encoders()
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

    def decode_latents(self, z: jnp.ndarray) -> List[np.ndarray]:
        key = ("hyv_vae_decode", tuple(z.shape))
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, z):
                return nnx.merge(graphdef, state).decode(z)

            self._jit_cache[key] = dec
        _, vae_state = nnx.split(self.vae)
        video = dec(vae_state, z.astype(jnp.float32))  # [B,3,T,H,W]
        b, c, t, h, w = video.shape
        frames_nchw = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames_nchw)

    def _denoise(
        self,
        x: jnp.ndarray,
        ts: np.ndarray,
        text, text_mask, pooled,
        ntext, ntext_mask, npooled,
        guidance_scale: float,
        true_cfg: float,
        cond_pack: Dict[str, Any],
        render_on_step: bool,
        render_cb: Optional[Callable],
        render_interval: int,
        progress_cb: Optional[Callable],
    ) -> jnp.ndarray:
        cfg_t = self.transformer.cfg
        use_cfg = true_cfg > 1.0 and ntext is not None
        cond_type = cond_pack.get("type")  # None | latent_concat | token_replace
        img_lat = cond_pack.get("image_latents")
        mask_ch = cond_pack.get("mask")
        graphdef, tf_state = nnx.split(self.transformer)

        key = ("hyv_step", tuple(x.shape), text.shape[1], use_cfg, cond_type,
               guidance_scale)
        step = self._jit_cache.get(key)
        if step is None:
            from apex_studio_tpu.engine.fused import build_euler_step

            def apply(m, x, aux, t_vec, text, text_mask, pooled,
                      ntext, ntext_mask, npooled, img_lat, mask_ch, g_true):
                if cond_type == "latent_concat":
                    x_in = jnp.concatenate([x, img_lat, mask_ch], axis=1)
                elif cond_type == "token_replace":
                    x_in = jnp.concatenate([img_lat, x[:, :, 1:]], axis=2)
                else:
                    x_in = x
                gvec = None
                if cfg_t.guidance_embeds:
                    gvec = jnp.full((x.shape[0],), guidance_scale * 1000.0, jnp.float32)
                v = m(x_in.astype(m.dtype), t_vec, text, text_mask,
                      pooled=pooled, guidance=gvec).astype(jnp.float32)
                if use_cfg:
                    vn = m(x_in.astype(m.dtype), t_vec, ntext, ntext_mask,
                           pooled=npooled, guidance=gvec).astype(jnp.float32)
                    v = vn + g_true * (v - vn)
                if cond_type == "token_replace":
                    # First latent frame stays pinned to the image latent: zero
                    # its velocity so the in-graph Euler update is a no-op there
                    # (reference steps only frames 1:, shared.py:179-183).
                    v = v.at[:, :, :1].set(0.0)
                return v, aux

            step = build_euler_step(graphdef, apply)
            self._jit_cache[key] = step

        if len(ts) <= 8:
            render_on_step = False
        zeros_like = lambda: jnp.zeros((1, 1), jnp.float32)
        for i, t in enumerate(ts):
            t_vec = jnp.full((x.shape[0],), float(t), jnp.float32)
            x, _ = step(
                tf_state, x,
                float(self.scheduler.sigmas[i]), float(self.scheduler.sigmas[i + 1]),
                (), t_vec, text, text_mask, pooled,
                ntext if use_cfg else text,
                ntext_mask if use_cfg else text_mask,
                npooled if use_cfg else pooled,
                img_lat if img_lat is not None else zeros_like(),
                mask_ch if mask_ch is not None else zeros_like(),
                jnp.float32(true_cfg),
            )
            if (
                render_on_step
                and render_cb is not None
                and (i + 1) % render_interval == 0
                and i + 1 < len(ts)
            ):
                try:
                    render_cb(self.preview_frames(x, self.decode_latents), i)
                except Exception:
                    logger.exception("preview callback failed")
            if progress_cb is not None:
                progress_cb(min((i + 1) / len(ts), 1.0), f"Denoising step {i + 1}/{len(ts)}")
        return x

    def _run(
        self,
        prompt, negative_prompt, height, width, num_frames, duration, fps,
        num_inference_steps, guidance_scale, true_guidance_scale, seed, latents,
        shift, timesteps, return_latents, render_on_step, render_on_step_callback,
        render_on_step_interval, progress_callback, image=None,
        image_condition_type=None,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting pipeline")
        self.load_components()
        safe_emit_progress(progress_callback, 0.05, "Components ready")

        cfg_t = self.transformer.cfg
        vae_cfg = self.vae.cfg if self.vae is not None else None
        s_scale = vae_cfg.spatial_scale if vae_cfg else 8
        t_scale = vae_cfg.temporal_scale if vae_cfg else 4
        p = cfg_t.patch_size
        height -= height % (s_scale * p)
        width -= width % (s_scale * p)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        lat_c = vae_cfg.latent_channels if vae_cfg else 16

        text, text_mask = self._encode_llama(prompt or "")
        pooled = self._encode_clip_pooled(prompt or "")
        use_cfg = true_guidance_scale > 1.0 and negative_prompt is not None
        ntext = ntext_mask = npooled = None
        if use_cfg:
            ntext, ntext_mask = self._encode_llama(negative_prompt or "")
            npooled = self._encode_clip_pooled(negative_prompt or "")
        safe_emit_progress(progress_callback, 0.2, "Prompts encoded")

        x = self.get_latents((1, lat_c, lat_t, lat_h, lat_w), seed=seed, latents=latents)
        cond_pack: Dict[str, Any] = {"type": None}
        if image is not None:
            import cv2

            arr = self.load_image_input(image)
            resized = cv2.resize(arr, (width, height), interpolation=cv2.INTER_LANCZOS4)
            frame = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0)
            frame = frame.transpose(2, 0, 1)[None, :, None]  # [1,3,1,H,W]
            graphdef_v, vae_state = nnx.split(self.vae)
            ekey = ("hyv_vae_encode", tuple(frame.shape))
            enc = self._jit_cache.get(ekey)
            if enc is None:

                @jax.jit
                def enc(state, v):
                    return nnx.merge(graphdef_v, state).encode(v)

                self._jit_cache[ekey] = enc
            img_lat = enc(vae_state, frame.astype(jnp.float32))  # [1,C,1,h,w]
            img_lat = jnp.repeat(img_lat.astype(jnp.float32), lat_t, axis=2)
            # Mix noise with the image latent at t=0.999 (i2v.py:171)
            x = x * 0.999 + img_lat * (1.0 - 0.999)
            ctype = image_condition_type or cfg_t.image_condition_type or "token_replace"
            if ctype == "latent_concat":
                img_cc = img_lat.at[:, :, 1:].set(0.0)
                mask = jnp.zeros((1, 1, lat_t, lat_h, lat_w), jnp.float32).at[:, :, :1].set(1.0)
                cond_pack = {"type": "latent_concat", "image_latents": img_cc, "mask": mask}
            else:
                first = img_lat[:, :, :1]
                x = jnp.concatenate([first, x[:, :, 1:]], axis=2)
                cond_pack = {"type": "token_replace", "image_latents": first}
        safe_emit_progress(progress_callback, 0.3, "Latents initialized")

        ts, _ = self.get_timesteps(
            self.scheduler, num_inference_steps, timesteps=timesteps,
            **({"shift": shift} if shift is not None else {}),
        )
        safe_emit_progress(progress_callback, 0.4, "Timesteps computed; starting denoise")
        denoise_cb = make_mapped_progress(progress_callback, 0.4, 0.9)

        x = self._denoise(
            x, ts, text, text_mask, pooled, ntext, ntext_mask, npooled,
            guidance_scale, true_guidance_scale if use_cfg else 0.0, cond_pack,
            render_on_step, render_on_step_callback, render_on_step_interval,
            denoise_cb,
        )
        safe_emit_progress(progress_callback, 0.9, "Denoising complete")
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames


@register_engine("hunyuanvideo", "t2v")
class HunyuanVideoT2VEngine(HunyuanVideoShared):
    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 720,
        width: int = 1280,
        duration: Optional[float] = None,
        fps: int = 16,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        true_guidance_scale: float = 1.0,
        seed: Optional[int] = None,
        latents: Optional[np.ndarray] = None,
        shift: Optional[float] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 5,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        return self._run(
            prompt, negative_prompt, height, width, num_frames, duration, fps,
            num_inference_steps, guidance_scale, true_guidance_scale, seed,
            latents, shift, timesteps, return_latents, render_on_step,
            render_on_step_callback, render_on_step_interval, progress_callback,
        )


@register_engine("hunyuanvideo", "i2v")
class HunyuanVideoI2VEngine(HunyuanVideoShared):
    def run(
        self,
        image=None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 720,
        width: int = 1280,
        duration: Optional[float] = None,
        fps: int = 16,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        true_guidance_scale: float = 1.0,
        seed: Optional[int] = None,
        latents: Optional[np.ndarray] = None,
        shift: Optional[float] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 5,
        progress_callback: Optional[Callable] = None,
        image_condition_type: Optional[str] = None,
        **_: Any,
    ):
        if image is None:
            image = _.pop("_image", None)
        if image is None:
            raise ValueError("hunyuanvideo i2v requires an input image")
        return self._run(
            prompt, negative_prompt, height, width, num_frames, duration, fps,
            num_inference_steps, guidance_scale, true_guidance_scale, seed,
            latents, shift, timesteps, return_latents, render_on_step,
            render_on_step_callback, render_on_step_interval, progress_callback,
            image=image, image_condition_type=image_condition_type,
        )
