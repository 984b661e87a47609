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
            img_lat = self.encode_video_latents(frame)  # [1,C,1,h,w]
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


@register_engine("hunyuanvideo", "framepack")
class HunyuanVideoFramepackEngine(HunyuanVideoShared):
    """FramePack long-video generation (reference
    src/engine/hunyuanvideo/framepack.py): sections of ``latent_window_size``
    latent frames are denoised one at a time while multi-scale clean history
    (1x/2x/4x) conditions the framepack transformer; sections are soft-append
    blended in pixel space. Supports both 'inverted_anti_drifting' (sections
    generated future→past, anchored on the input image) and 'vanilla'
    (past→future) sampling. Each section has its own frame-index layout, so
    sections compile separately (the layouts repeat after the first two)."""

    def _soft_append(self, history: np.ndarray, current: np.ndarray,
                     overlap: int) -> np.ndarray:
        """[B,C,T,H,W] pixel blend over ``overlap`` frames (framepack.py:13)."""
        if overlap <= 0:
            return np.concatenate([history, current], axis=2)
        w = np.linspace(1, 0, overlap, dtype=np.float32)[None, None, :, None, None]
        blended = w * history[:, :, -overlap:] + (1 - w) * current[:, :, :overlap]
        return np.concatenate(
            [history[:, :, :-overlap], blended, current[:, :, overlap:]], axis=2)

    def _image_embeds(self, image_arr, last_image_arr=None):
        """SigLIP/CLIP-vision embeds via the manifest 'clip'/'image_encoder'
        helper; zeros when the manifest ships none (tests)."""
        dim = getattr(self.transformer.cfg, "image_proj_dim", 1152)
        for name in ("clip", "image_encoder"):
            if name in self.component_specs:
                try:
                    enc = self.load_helper(name)
                    emb = enc(jnp.asarray(image_arr)[None])
                    if last_image_arr is not None:
                        emb = (emb + enc(jnp.asarray(last_image_arr)[None])) / 2.0
                    return jnp.asarray(emb, jnp.float32)
                except Exception:
                    logger.exception("image encoder failed; zeros")
        return jnp.zeros((1, 729, dim), jnp.float32)

    def run(
        self,
        image: Any = None,
        last_image: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        num_frames: Optional[int] = None,
        duration: Optional[float] = None,
        fps: float = 30.0,
        latent_window_size: int = 9,
        sampling_type: str = "inverted_anti_drifting",
        num_inference_steps: int = 25,
        guidance_scale: float = 6.0,
        true_guidance_scale: float = 1.0,
        seed: Optional[int] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        import math as _math

        import cv2

        safe_emit_progress(progress_callback, 0.0, "Starting framepack pipeline")
        self.load_components()
        if image is None:
            raise ValueError("framepack requires an input image")

        cfg_t = self.transformer.cfg
        s_scale = self.vae.cfg.spatial_scale
        t_scale = self.vae.cfg.temporal_scale
        height -= height % (s_scale * cfg_t.patch_size)
        width -= width % (s_scale * cfg_t.patch_size)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        window_frames = (latent_window_size - 1) * t_scale + 1
        total_lat = (num_frames - 1) // t_scale + 1
        n_sections = max(1, _math.ceil(total_lat / latent_window_size))

        arr = cv2.resize(self.load_image_input(image), (width, height),
                         interpolation=cv2.INTER_LANCZOS4)
        px = (arr.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
        image_latents = self.encode_video_latents(px[None, :, None])
        last_arr = None
        last_image_latents = None
        if last_image is not None:
            last_arr = cv2.resize(self.load_image_input(last_image),
                                  (width, height), interpolation=cv2.INTER_LANCZOS4)
            lpx = (last_arr.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
            last_image_latents = self.encode_video_latents(lpx[None, :, None])

        image_embeds = self._image_embeds(arr, last_arr)

        text, text_mask = self._encode_llama(prompt or "")
        pooled = self._encode_clip_pooled(prompt or "")
        use_cfg = true_guidance_scale > 1.0 and negative_prompt is not None
        ntext = ntext_mask = npooled = None
        if use_cfg:
            ntext, ntext_mask = self._encode_llama(negative_prompt or "")
            npooled = self._encode_clip_pooled(negative_prompt or "")

        inverted = sampling_type == "inverted_anti_drifting"
        history_sizes = [1, 2, 16] if inverted else [16, 2, 1]
        lat_c = cfg_t.in_channels
        history_latents = np.zeros((1, lat_c, sum(history_sizes), lat_h, lat_w),
                                   np.float32)
        if not inverted:
            history_latents = np.concatenate(
                [history_latents, np.asarray(image_latents, np.float32)], axis=2)

        graphdef, tf_state = nnx.split(self.transformer)
        total_generated = 0
        history_video = None
        latents_out = []

        for k in range(n_sections):
            x = self.get_latents((1, lat_c, latent_window_size, lat_h, lat_w),
                                 seed=None if seed is None else seed + k)
            from apex_studio_tpu.schedulers.base import compute_dynamic_shift_mu

            image_seq_len = (latent_window_size * lat_h * lat_w
                             / cfg_t.patch_size ** 2)
            mu = compute_dynamic_shift_mu(
                image_seq_len,
                self.scheduler.config.get("base_image_seq_len", 256),
                self.scheduler.config.get("max_image_seq_len", 4096),
                self.scheduler.config.get("base_shift", 0.5),
                self.scheduler.config.get("max_shift", 1.15),
            )
            sig = np.linspace(1.0, 0.0, num_inference_steps + 1)[:-1]
            ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                       sigmas=sig, mu=min(mu, _math.log(7.0)))

            # frame-index layout per section (framepack.py:294-366)
            if inverted:
                pads = list(reversed(range(n_sections)))
                if n_sections > 4:
                    pads = [3] + [2] * (n_sections - 3) + [1, 0]
                pad = pads[k] * latent_window_size
                sizes = [1, pad, latent_window_size] + history_sizes
                bounds = np.cumsum([0] + sizes)
                seg = [np.arange(bounds[i], bounds[i + 1]) for i in range(len(sizes))]
                idx_prefix, _, idx_lat, idx_h1, idx_h2, idx_h4 = seg
                idx_clean = np.concatenate([idx_prefix, idx_h1])
                h1, h2, h4 = np.split(
                    history_latents[:, :, :sum(history_sizes)],
                    np.cumsum(history_sizes)[:-1], axis=2)
                if last_image_latents is not None and k == 0:
                    h1 = np.asarray(last_image_latents, np.float32)
                clean = np.concatenate(
                    [np.asarray(image_latents, np.float32), h1], axis=2)
            else:
                sizes = [1] + history_sizes + [latent_window_size]
                bounds = np.cumsum([0] + sizes)
                seg = [np.arange(bounds[i], bounds[i + 1]) for i in range(len(sizes))]
                idx_prefix, idx_h4, idx_h2, idx_h1, idx_lat = seg
                idx_clean = np.concatenate([idx_prefix, idx_h1])
                h4, h2, h1 = np.split(
                    history_latents[:, :, -sum(history_sizes):],
                    np.cumsum(history_sizes)[:-1], axis=2)
                clean = np.concatenate(
                    [np.asarray(image_latents, np.float32), h1], axis=2)

            key = ("fp_step", tuple(x.shape), text.shape[1], use_cfg,
                   tuple(idx_lat), tuple(idx_clean))
            step = self._jit_cache.get(key)
            if step is None:
                from apex_studio_tpu.engine.fused import build_euler_step

                il, ic = idx_lat, idx_clean
                i2, i4 = idx_h2, idx_h4

                def apply(m, x, aux, t_vec, text_, mask_, pooled_,
                          ntext_, nmask_, npooled_, clean_, h2_, h4_, emb_, g):
                    gvec = (jnp.full((1,), guidance_scale * 1000.0, jnp.float32)
                            if cfg_t.guidance_embeds else None)
                    kwargs = dict(
                        image_embeds=emb_, indices_latents=il,
                        latents_clean=clean_.astype(m.dtype),
                        indices_latents_clean=ic,
                        latents_history_2x=h2_.astype(m.dtype),
                        indices_latents_history_2x=i2,
                        latents_history_4x=h4_.astype(m.dtype),
                        indices_latents_history_4x=i4,
                        guidance=gvec)
                    v = m(x.astype(m.dtype), t_vec, text_, mask_,
                          pooled=pooled_, **kwargs).astype(jnp.float32)
                    if use_cfg:
                        vn = m(x.astype(m.dtype), t_vec, ntext_, nmask_,
                               pooled=npooled_, **kwargs).astype(jnp.float32)
                        v = vn + g * (v - vn)
                    return v, aux

                step = build_euler_step(graphdef, apply)
                self._jit_cache[key] = step

            for i, t in enumerate(ts):
                t_vec = jnp.full((1,), float(t), jnp.float32)
                x, _ = step(
                    tf_state, x,
                    float(self.scheduler.sigmas[i]),
                    float(self.scheduler.sigmas[i + 1]),
                    (), t_vec, text, text_mask, pooled,
                    ntext if use_cfg else text,
                    ntext_mask if use_cfg else text_mask,
                    npooled if use_cfg else pooled,
                    jnp.asarray(clean), jnp.asarray(h2), jnp.asarray(h4),
                    image_embeds, jnp.float32(true_guidance_scale),
                )
            x_np = np.asarray(x, np.float32)

            is_last = k == n_sections - 1
            if inverted:
                if is_last:
                    x_np = np.concatenate(
                        [np.asarray(image_latents, np.float32), x_np], axis=2)
                total_generated += x_np.shape[2]
                history_latents = np.concatenate([x_np, history_latents], axis=2)
                real = history_latents[:, :, :total_generated]
                section_frames = (latent_window_size * 2 + 1 if is_last
                                  else latent_window_size * 2)
                cur = real[:, :, :section_frames]
            else:
                total_generated += x_np.shape[2]
                history_latents = np.concatenate([history_latents, x_np], axis=2)
                real = history_latents[:, :, -total_generated:]
                section_frames = latent_window_size * 2
                cur = real[:, :, -section_frames:]

            if return_latents:
                latents_out = [real]
            else:
                overlap = (latent_window_size - 1) * t_scale + 1
                if history_video is None:
                    vid = self._decode_np(real)
                    history_video = vid
                else:
                    vid = self._decode_np(cur)
                    if inverted:
                        history_video = self._soft_append(vid, history_video, overlap)
                    else:
                        history_video = self._soft_append(history_video, vid, overlap)
            safe_emit_progress(progress_callback, 0.1 + 0.8 * (k + 1) / n_sections,
                               f"Section {k + 1}/{n_sections}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return jnp.asarray(latents_out[0])
        n = history_video.shape[2]
        n = (n - 1) // t_scale * t_scale + 1
        history_video = history_video[:, :, :n]
        b, c, tt2, hh2, ww2 = history_video.shape
        frames = self.tensor_to_frames(
            jnp.asarray(history_video).transpose(0, 2, 1, 3, 4).reshape(
                b * tt2, c, hh2, ww2))
        safe_emit_progress(progress_callback, 1.0, "Completed framepack pipeline")
        return frames

    def _decode_np(self, lats: np.ndarray) -> np.ndarray:
        graphdef, vae_state = nnx.split(self.vae)
        key = ("fp_vae_decode", lats.shape)
        dec = self._jit_cache.get(key)
        if dec is None:

            @jax.jit
            def dec(state, z):
                return nnx.merge(graphdef, state).decode(z)

            self._jit_cache[key] = dec
        return np.asarray(dec(vae_state, jnp.asarray(lats)), np.float32)
