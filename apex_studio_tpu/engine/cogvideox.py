"""CogVideoX engines: t2v / i2v / v2v.

Contract parity with the reference's ``engine/cogvideo/{t2v,i2v,inp}.py``
(diffusers CogVideoX pipelines):

- T5 features padded to 226 tokens with zeroed padding (no attention mask)
- DDIM v-prediction sampler with zero-terminal-SNR + SNR-shift betas
- CFG over [uncond, cond]; optional dynamic CFG (cosine ramp, the
  use_dynamic_cfg flag of the published pipelines)
- i2v: first frame VAE-encoded, zero-padded over time, concatenated on the
  channel axis every step (transformer in_channels = 32)
- latent layout here is NCTHW (the house convention); frames follow the
  causal 1 + 4k contract
"""

from __future__ import annotations

import logging
import math
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.cogvideox")


class CogVideoXShared(BaseEngine):
    def load_components(self) -> None:
        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

    def encode_prompt(self, prompt: str, max_sequence_length: int = 226) -> jnp.ndarray:
        hidden, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=max_sequence_length, use_chat_template=False
        )
        return jnp.where(jnp.asarray(mask)[..., None].astype(bool), hidden, 0.0)

    def _fwd(self, shapes, with_cond: bool):
        key = ("cog_fwd", shapes, with_cond)
        fwd = self._jit_cache.get(key)
        if fwd is None:
            graphdef, _ = nnx.split(self.transformer)

            if with_cond:

                @jax.jit
                def fwd(state, x, cond, t, ctx):
                    xin = jnp.concatenate([x, cond.astype(x.dtype)], axis=1)
                    return nnx.merge(graphdef, state)(xin, t, ctx)

            else:

                @jax.jit
                def fwd(state, x, t, ctx):
                    return nnx.merge(graphdef, state)(x, t, ctx)

            self._jit_cache[key] = fwd
        return fwd

    def decode_latents(self, z: jnp.ndarray) -> List[np.ndarray]:
        key = ("cog_vae_decode", tuple(z.shape))
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
        frames = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames)

    def denoise(
        self,
        x: jnp.ndarray,
        condition: Optional[jnp.ndarray],
        ts: np.ndarray,
        context: jnp.ndarray,
        neg_context: Optional[jnp.ndarray],
        guidance_scale: float,
        use_dynamic_cfg: bool,
        render_cb: Optional[Callable],
        render_interval: int,
        render_on_step: bool,
        progress_cb: Optional[Callable],
    ) -> jnp.ndarray:
        use_cfg = guidance_scale > 1.0 and neg_context is not None
        if len(ts) <= 8:
            render_on_step = False
        shapes = (tuple(x.shape), context.shape[1])
        _, state = nnx.split(self.transformer)
        fwd = self._fwd(shapes, condition is not None)
        n_train = getattr(self.scheduler, "num_train_timesteps", 1000)

        for i, t in enumerate(ts):
            g = guidance_scale
            if use_dynamic_cfg:
                # diffusers CogVideoX dynamic cfg: 1 + s·((1−cos(π·((n−t)/n)^5))/2)
                g = 1.0 + guidance_scale * (
                    (1.0 - math.cos(math.pi * ((n_train - float(t)) / n_train) ** 5.0)) / 2.0
                )
            t_vec = jnp.full((x.shape[0],), float(t), jnp.float32)
            x_in = x.astype(self.transformer.dtype)
            args = (state, x_in, condition, t_vec) if condition is not None else (state, x_in, t_vec)
            v = fwd(*args, context)
            if use_cfg:
                v_neg = fwd(*args, neg_context)
                v = v_neg.astype(jnp.float32) + g * (
                    v.astype(jnp.float32) - v_neg.astype(jnp.float32)
                )
            (x,) = self.scheduler.step(v.astype(jnp.float32), float(t), x)

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

    def _geometry(self, height: int, width: int, num_frames: int):
        vae_cfg = self.vae.cfg
        s_scale, t_scale = vae_cfg.spatial_scale, vae_cfg.temporal_scale
        p = self.transformer.cfg.patch_size
        height -= height % (s_scale * p)
        width -= width % (s_scale * p)
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_t = (num_frames - 1) // t_scale + 1
        return height, width, num_frames, lat_t, height // s_scale, width // s_scale


@register_engine("cogvideo", "t2v")
class CogVideoXT2VEngine(CogVideoXShared):
    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 720,
        num_frames: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        seed: Optional[int] = None,
        latents: Optional[np.ndarray] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        max_sequence_length: int = 226,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting t2v pipeline")
        self.load_components()
        height, width, num_frames, lat_t, lat_h, lat_w = self._geometry(height, width, num_frames)

        context = self.encode_prompt(prompt or "", max_sequence_length)
        use_cfg = guidance_scale > 1.0
        neg_context = (
            self.encode_prompt(negative_prompt or "", max_sequence_length) if use_cfg else None
        )
        safe_emit_progress(progress_callback, 0.2, "Prompts ready")

        lat_c = self.transformer.cfg.out_channels
        x = self.get_latents((1, lat_c, lat_t, lat_h, lat_w), seed=seed, latents=latents)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps)
        safe_emit_progress(progress_callback, 0.35, "Noise + timesteps ready")

        x = self.denoise(
            x, None, ts, context, neg_context, guidance_scale, use_dynamic_cfg,
            render_on_step_callback, render_on_step_interval, render_on_step,
            make_mapped_progress(progress_callback, 0.35, 0.9),
        )
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames


@register_engine("cogvideo", "i2v")
class CogVideoXI2VEngine(CogVideoXShared):
    def run(
        self,
        image: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 720,
        num_frames: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        seed: Optional[int] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        max_sequence_length: int = 226,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting i2v pipeline")
        self.load_components()
        if image is None:
            raise ValueError("i2v requires an input image")
        if isinstance(image, (str, bytes)) or hasattr(image, "__fspath__"):
            from apex_studio_tpu.preprocess.base import load_frames

            image = load_frames(image)[0]
        image = self.load_image_input(np.asarray(image))

        height, width, num_frames, lat_t, lat_h, lat_w = self._geometry(height, width, num_frames)

        context = self.encode_prompt(prompt or "", max_sequence_length)
        use_cfg = guidance_scale > 1.0
        neg_context = (
            self.encode_prompt(negative_prompt or "", max_sequence_length) if use_cfg else None
        )

        # first-frame latent, zero-padded over latent time, channel-concatenated
        import cv2

        resized = cv2.resize(image, (width, height), interpolation=cv2.INTER_LANCZOS4)
        px = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
        first_lat = self.encode_video_latents(px[None, :, None])  # [1,C,1,h,w]
        cond = jnp.concatenate(
            [first_lat, jnp.zeros((1, first_lat.shape[1], lat_t - 1, lat_h, lat_w))], axis=2
        )
        safe_emit_progress(progress_callback, 0.25, "Image conditioning ready")

        noise_c = self.transformer.cfg.in_channels - cond.shape[1]
        x = self.get_latents((1, noise_c, lat_t, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps)

        x = self.denoise(
            x, cond, ts, context, neg_context, guidance_scale, use_dynamic_cfg,
            render_on_step_callback, render_on_step_interval, render_on_step,
            make_mapped_progress(progress_callback, 0.35, 0.9),
        )
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames


@register_engine("cogvideo", "v2v")
class CogVideoXV2VEngine(CogVideoXShared):
    """Video-to-video via DDPM corruption at ``strength`` (the reference's
    cogvideo v2v flavor of engine/cogvideo/)."""

    def run(
        self,
        video: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 720,
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        seed: Optional[int] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        max_sequence_length: int = 226,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting v2v pipeline")
        self.load_components()
        if video is None:
            raise ValueError("v2v requires an input video")
        if isinstance(video, (str, bytes)) or hasattr(video, "__fspath__"):
            from apex_studio_tpu.preprocess.base import load_frames

            video = load_frames(video)
        frames_in = [self.load_image_input(np.asarray(f)) for f in video]

        height, width, num_frames, lat_t, lat_h, lat_w = self._geometry(
            height, width, len(frames_in)
        )
        frames_in = frames_in[:num_frames]

        import cv2

        stacked = np.stack(
            [cv2.resize(f, (width, height), interpolation=cv2.INTER_LANCZOS4) for f in frames_in]
        )
        vid = jnp.asarray((stacked.astype(np.float32) / 127.5 - 1.0).transpose(3, 0, 1, 2))[None]
        graphdef, vae_state = nnx.split(self.vae)
        source = jax.jit(lambda s, v: nnx.merge(graphdef, s).encode(v))(
            vae_state, vid.astype(jnp.float32)
        )
        safe_emit_progress(progress_callback, 0.2, "Encoded source video")

        context = self.encode_prompt(prompt or "", max_sequence_length)
        use_cfg = guidance_scale > 1.0
        neg_context = (
            self.encode_prompt(negative_prompt or "", max_sequence_length) if use_cfg else None
        )

        ts_full, _ = self.get_timesteps(self.scheduler, num_inference_steps)
        start = min(int(round(num_inference_steps * (1.0 - strength))), len(ts_full) - 1)
        ts = ts_full[start:]
        self.scheduler.set_begin_index(start)
        noise = self.get_latents(source.shape, seed=seed)
        x = self.scheduler.add_noise(source.astype(jnp.float32), noise, ts[0])

        x = self.denoise(
            x, None, ts, context, neg_context, guidance_scale, use_dynamic_cfg,
            render_on_step_callback, render_on_step_interval, render_on_step,
            make_mapped_progress(progress_callback, 0.3, 0.9),
        )
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames


@register_engine("cogvideo", "control")
class CogVideoXControlEngine(CogVideoXShared):
    """Control-video generation: VAE-encoded control latents channel-concat
    with the noise (reference src/engine/cogvideo/control.py:151-215)."""

    def run(
        self,
        control_video: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 720,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        seed: Optional[int] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        max_sequence_length: int = 226,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting control pipeline")
        self.load_components()
        if control_video is None:
            raise ValueError("control requires a control_video")
        import cv2

        if isinstance(control_video, (str, bytes)) or hasattr(control_video, "__fspath__"):
            from apex_studio_tpu.preprocess.base import load_frames

            control_video = load_frames(control_video, max_frames=num_frames)
        frames_in = [np.asarray(f) for f in control_video]
        nf = num_frames or len(frames_in)
        height, width, nf, lat_t, lat_h, lat_w = self._geometry(height, width,
                                                               min(nf, len(frames_in)))
        vid = np.stack([cv2.resize(f, (width, height),
                                   interpolation=cv2.INTER_AREA)
                        for f in frames_in[:nf]])
        px = (vid.astype(np.float32) / 127.5 - 1.0).transpose(3, 0, 1, 2)[None]
        cond = self.encode_video_latents(px)

        context = self.encode_prompt(prompt or "", max_sequence_length)
        use_cfg = guidance_scale > 1.0
        neg_context = (self.encode_prompt(negative_prompt or "", max_sequence_length)
                       if use_cfg else None)

        noise_c = self.transformer.cfg.in_channels - cond.shape[1]
        x = self.get_latents((1, noise_c, lat_t, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps)
        x = self.denoise(
            x, cond, ts, context, neg_context, guidance_scale, use_dynamic_cfg,
            render_on_step_callback, render_on_step_interval, render_on_step,
            make_mapped_progress(progress_callback, 0.35, 0.9),
        )
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed control pipeline")
        return frames


@register_engine("cogvideo", "inp")
class CogVideoXInpEngine(CogVideoXShared):
    """Video inpainting: [resized inverted mask (1ch) ‖ masked-video latents]
    channel-concat with the noise (reference src/engine/cogvideo/inp.py:234-300:
    masked pixels set to −1 where mask>0.5, mask resized wan-style with the
    first latent frame handled separately)."""

    def run(
        self,
        video: Any = None,
        mask_video: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 720,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        seed: Optional[int] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        max_sequence_length: int = 226,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting inpaint pipeline")
        self.load_components()
        if video is None:
            raise ValueError("inp requires an input video")
        import cv2

        from apex_studio_tpu.preprocess.base import load_frames

        if isinstance(video, (str, bytes)) or hasattr(video, "__fspath__"):
            video = load_frames(video, max_frames=num_frames)
        frames_in = [np.asarray(f) for f in video]
        nf = num_frames or len(frames_in)
        height, width, nf, lat_t, lat_h, lat_w = self._geometry(height, width,
                                                               min(nf, len(frames_in)))
        vid = np.stack([cv2.resize(f, (width, height),
                                   interpolation=cv2.INTER_AREA)
                        for f in frames_in[:nf]]).astype(np.float32)

        if mask_video is not None:
            if isinstance(mask_video, (str, bytes)) or hasattr(mask_video, "__fspath__"):
                mask_video = load_frames(mask_video, max_frames=nf)
            mframes = [np.asarray(f) for f in mask_video][:nf]
            while len(mframes) < nf:
                mframes.append(mframes[-1])
            mask = np.stack([
                cv2.resize(f[..., 0] if f.ndim == 3 else f, (width, height),
                           interpolation=cv2.INTER_NEAREST)
                for f in mframes]).astype(np.float32) / 255.0
        else:
            mask = np.ones((nf, height, width), np.float32)
        mask3 = mask[..., None]

        # masked pixels → −1 (inp.py:268-271)
        px = vid / 127.5 - 1.0
        masked = px * (mask3 < 0.5) + (-1.0) * (mask3 > 0.5)
        masked_lat = self.encode_video_latents(
            masked.transpose(3, 0, 1, 2)[None])

        # inverted mask resized to latent grid, first frame separate
        # (shared.py:278 _resize_mask), scaled like latents (inp.py:280)
        inv = (1.0 - mask)[None, None]  # [1,1,T,H,W]
        first = jax.image.resize(jnp.asarray(inv[:, :, :1]),
                                 (1, 1, 1, lat_h, lat_w), "trilinear")
        rest_t = lat_t - 1
        if rest_t > 0 and inv.shape[2] > 1:
            rest = jax.image.resize(jnp.asarray(inv[:, :, 1:]),
                                    (1, 1, rest_t, lat_h, lat_w), "trilinear")
            mask_lat = jnp.concatenate([first, rest], axis=2)
        else:
            mask_lat = jnp.broadcast_to(first, (1, 1, lat_t, lat_h, lat_w))
        scaling = getattr(self.vae.cfg, "scaling_factor", 1.0)
        cond = jnp.concatenate(
            [mask_lat.astype(jnp.float32) * scaling,
             masked_lat.astype(jnp.float32)], axis=1)

        context = self.encode_prompt(prompt or "", max_sequence_length)
        use_cfg = guidance_scale > 1.0
        neg_context = (self.encode_prompt(negative_prompt or "", max_sequence_length)
                       if use_cfg else None)

        noise_c = self.transformer.cfg.in_channels - cond.shape[1]
        x = self.get_latents((1, noise_c, lat_t, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps)
        x = self.denoise(
            x, cond, ts, context, neg_context, guidance_scale, use_dynamic_cfg,
            render_on_step_callback, render_on_step_interval, render_on_step,
            make_mapped_progress(progress_callback, 0.35, 0.9),
        )
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed inpaint pipeline")
        return frames
