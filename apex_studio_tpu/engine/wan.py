"""Wan engines: t2v / t2i (Wan 2.1 + Wan 2.2 A14B MoE dual-noise).

Contract parity with the reference's ``engine/wan/t2v.py:12`` and the shared
denoise loops (``engine/wan/shared/__init__.py:610`` base, ``:478`` MoE):

- UMT5 text features zero-padded to 512 tokens (Wan conditions on zeroed
  padding, no cross-attention mask)
- latents [B, 16, (frames−1)/4+1, H/8, W/8], fp32 seeded via the CPU-torch
  stream
- FlowUniPC sampler (per-manifest shift), CFG cond/uncond
- Wan 2.2 dual-noise: a high-noise and a low-noise expert swapped at
  ``boundary_ratio·1000`` (reference `_select_dual_noise_transformer`
  shared/__init__.py:309); both stay resident here — sharding replaces the
  reference's offload shuffle
- render_on_step force-disabled for ≤8-step runs (t2v.py:65)
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.wan")


class WanShared(BaseEngine):
    def __init__(self, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.transformer_2 = None  # low-noise expert (Wan 2.2 A14B)

    # -- components -------------------------------------------------------------

    def _load_transformer_2(self):
        for name, spec in self.component_specs.items():
            if spec.get("type") == "transformer" and name in (
                "transformer_2",
                "low_noise_transformer",
            ):
                self.transformer_2 = self._load_transformer(spec)
                return self.transformer_2
        return None

    def _primary_transformer_spec(self) -> Optional[Dict[str, Any]]:
        for name, spec in self.component_specs.items():
            if spec.get("type") == "transformer" and name not in (
                "transformer_2",
                "low_noise_transformer",
                "audio_transformer",  # mova's second tower, never primary
            ):
                return spec
        return None

    def load_components(self, return_latents: bool) -> None:
        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        if self.transformer is None:
            spec = self._primary_transformer_spec()
            self.transformer = self._load_transformer(spec)
        # The VAE defines the latent geometry — always load it.
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

    # -- conditioning ---------------------------------------------------------------

    def encode_prompt(self, prompt: str, max_sequence_length: int = 512) -> jnp.ndarray:
        """UMT5 features with zeroed padding (Wan's conditioning convention)."""
        hidden, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=max_sequence_length, use_chat_template=False
        )
        return jnp.where(jnp.asarray(mask)[..., None].astype(bool), hidden, 0.0)

    # -- denoise core -----------------------------------------------------------------

    def _fwd_for(self, transformer, tag: str, shapes):
        key = (tag, shapes)
        fwd = self._jit_cache.get(key)
        if fwd is None:
            graphdef, _ = nnx.split(transformer)

            @jax.jit
            def fwd(state, x, t, ctx):
                return nnx.merge(graphdef, state)(x, t, ctx)

            self._jit_cache[key] = fwd
        return fwd

    def _fwd_cached_for(self, transformer, tag: str, shapes, thresh: float):
        """Jitted forward with in-graph EasyCache skip (one dispatch per step)."""
        import functools

        key = (tag, shapes, "easycache", thresh)
        fwd = self._jit_cache.get(key)
        if fwd is None:
            graphdef, _ = nnx.split(transformer)
            from apex_studio_tpu.ops.easycache import cached_step

            @functools.partial(jax.jit, static_argnames=("force",))
            def fwd(state, x, t, ctx, ec_state, force):
                m = nnx.merge(graphdef, state)
                return cached_step(
                    lambda xi: m(xi, t, ctx), x, ec_state, thresh, force
                )

            self._jit_cache[key] = fwd
        return fwd

    def _fused_denoise_step(
        self, transformer, tag: str, shapes, kind: str,
        use_cfg: bool, thresh: float, force: bool,
    ):
        """One compiled program per step: forward (+CFG, +EasyCache skip) and
        the scheduler update, latents donated — the reference's eager hot loop
        (engine/wan/shared/__init__.py:610-725) collapsed to a single dispatch."""
        key = (tag, shapes, kind, use_cfg, thresh, force)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        from apex_studio_tpu.engine.fused import build_euler_step, build_unipc_step

        graphdef, _ = nnx.split(transformer)
        use_easycache = thresh > 0.0

        def apply(m, x, aux, t_vec, ctx, neg_ctx, g):
            x_in = x.astype(m.dtype)
            if use_easycache:
                from apex_studio_tpu.ops.easycache import cached_step

                ec_pos, ec_neg = aux
                v, ec_pos = cached_step(
                    lambda xi: m(xi, t_vec, ctx), x_in, ec_pos, thresh, force
                )
                if use_cfg:
                    v_neg, ec_neg = cached_step(
                        lambda xi: m(xi, t_vec, neg_ctx), x_in, ec_neg, thresh, force
                    )
                    v = v_neg + g * (v - v_neg)
                return v, (ec_pos, ec_neg)
            v = m(x_in, t_vec, ctx).astype(jnp.float32)
            if use_cfg:
                v_neg = m(x_in, t_vec, neg_ctx).astype(jnp.float32)
                v = v_neg + g * (v - v_neg)
            return v, aux

        if kind == "unipc":
            fn = build_unipc_step(graphdef, apply, self.scheduler.solver_order)
        else:
            fn = build_euler_step(graphdef, apply)
        self._jit_cache[key] = fn
        return fn

    def denoise(
        self,
        latents: jnp.ndarray,
        ts: np.ndarray,
        context: jnp.ndarray,
        neg_context: Optional[jnp.ndarray],
        guidance_scale: float,
        guidance_scale_2: Optional[float],
        boundary_timestep: Optional[float],
        render_cb: Optional[Callable],
        render_interval: int,
        render_on_step: bool,
        progress_cb: Optional[Callable],
        easy_cache_thresh: float = 0.0,
        easy_cache_ret_steps: int = 10,
    ) -> jnp.ndarray:
        use_cfg = guidance_scale > 1.0 and neg_context is not None
        if len(ts) <= 8:
            render_on_step = False
        use_easycache = easy_cache_thresh > 0.0

        shapes = (tuple(latents.shape), context.shape[1])
        _, state_1 = nnx.split(self.transformer)
        state_2 = None
        if boundary_timestep is not None and self.transformer_2 is None:
            self._load_transformer_2()
        if self.transformer_2 is not None:
            _, state_2 = nnx.split(self.transformer_2)

        # Scheduler family → fused-step kind. UniPC fuses via its linear plan;
        # Euler-family via (sigma, sigma_next) scalars; anything else falls
        # back to a host-side scheduler.step per iteration.
        if hasattr(self.scheduler, "fused_plan"):
            kind, plan = "unipc", self.scheduler.fused_plan()
        elif hasattr(self.scheduler, "step_at"):
            kind, plan = "euler", None
        else:
            kind, plan = "host", None

        aux: Any = ()
        if use_easycache:
            from apex_studio_tpu.ops.easycache import init_state

            v_like = latents.astype(jnp.float32)
            aux = (init_state(v_like, v_like), init_state(v_like, v_like))
        hist = last = None
        if kind == "unipc":
            from apex_studio_tpu.engine.fused import init_unipc_carry

            hist, last = init_unipc_carry(latents, self.scheduler.solver_order)

        neg_in = neg_context if neg_context is not None else context

        x = latents
        for i, t in enumerate(ts):
            if boundary_timestep is not None and float(t) < boundary_timestep and state_2 is not None:
                transformer, state = self.transformer_2, state_2
                tag = "wan_fwd_low"
                g = guidance_scale_2 if guidance_scale_2 is not None else guidance_scale
            else:
                transformer, state = self.transformer, state_1
                tag = "wan_fwd_high"
                g = guidance_scale

            t_vec = jnp.full((x.shape[0],), float(t), jnp.float32)
            force = i < easy_cache_ret_steps or i >= len(ts) - 1
            thresh = easy_cache_thresh if use_easycache else 0.0
            step_cfg = use_cfg and g > 1.0
            if kind == "host":
                x_in = x.astype(transformer.dtype)
                if use_easycache:
                    fwd = self._fwd_cached_for(transformer, tag, shapes, easy_cache_thresh)
                    v, ec_pos = fwd(state, x_in, t_vec, context, aux[0], force)
                    ec_neg = aux[1]
                    if step_cfg:
                        v_neg, ec_neg = fwd(state, x_in, t_vec, neg_in, ec_neg, force)
                        v = v_neg + g * (v - v_neg)
                    aux = (ec_pos, ec_neg)
                else:
                    fwd = self._fwd_for(transformer, tag, shapes)
                    v = fwd(state, x_in, t_vec, context)
                    if step_cfg:
                        v_neg = fwd(state, x_in, t_vec, neg_in)
                        v = v_neg.astype(jnp.float32) + g * (
                            v.astype(jnp.float32) - v_neg.astype(jnp.float32)
                        )
                (x,) = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            else:
                step = self._fused_denoise_step(
                    transformer, tag, shapes, kind, step_cfg, thresh, force
                )
                g_s = jnp.float32(g)
                if kind == "unipc":
                    p = plan[i]
                    x, hist, last, aux = step(
                        state, x, hist, last,
                        p["sigma"], p["use_corrector"],
                        jnp.asarray(p["corr_w"]), jnp.asarray(p["pred_w"]),
                        aux, t_vec, context, neg_in, g_s,
                    )
                else:
                    x, aux = step(
                        state, x,
                        float(self.scheduler.sigmas[i]), float(self.scheduler.sigmas[i + 1]),
                        aux, t_vec, context, neg_in, g_s,
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

    # Latent tiles bigger than this decode spatially tiled: a full 720p x
    # 121f 3D decode materializes tens of GB of upsampled activations
    # (reference tiled_decode, base_engine.py:2030). Threshold/tile sizes in
    # LATENT px; override via APEX_VAE_TILE / APEX_VAE_TILE_THRESHOLD.
    VAE_TILE = 32
    VAE_TILE_THRESHOLD = 48 * 48

    def decode_latents(self, z: jnp.ndarray) -> List[np.ndarray]:
        import os as _os

        thresh = int(_os.environ.get("APEX_VAE_TILE_THRESHOLD",
                                     self.VAE_TILE_THRESHOLD))
        tiled = z.ndim == 5 and z.shape[-2] * z.shape[-1] > thresh
        key = ("wan_vae_decode", tuple(z.shape), tiled)
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def dec_full(state, z):
                return nnx.merge(graphdef, state).decode(z)

            if tiled:
                from apex_studio_tpu.models.vaes.tiling import decode_tiled_3d

                tile = int(_os.environ.get("APEX_VAE_TILE", self.VAE_TILE))
                scale = self.vae.cfg.spatial_scale

                def dec(state, z):
                    return decode_tiled_3d(
                        lambda zt: dec_full(state, zt), z, scale, tile=tile)
            else:
                dec = dec_full
            self._jit_cache[key] = dec
        _, vae_state = nnx.split(self.vae)
        video = dec(vae_state, z.astype(jnp.float32))  # [B,3,T,H,W]
        b, c, t, h, w = video.shape
        frames_nchw = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames_nchw)

    def _run_video(
        self,
        prompt: Optional[str],
        negative_prompt: Optional[str],
        height: int,
        width: int,
        num_frames: int,
        num_inference_steps: int,
        guidance_scale: float,
        guidance_scale_2: Optional[float],
        boundary_ratio: Optional[float],
        seed: Optional[int],
        latents: Optional[np.ndarray],
        shift: Optional[float],
        timesteps: Optional[List[float]],
        return_latents: bool,
        render_on_step: bool,
        render_on_step_callback: Optional[Callable],
        render_on_step_interval: int,
        progress_callback: Optional[Callable],
        max_sequence_length: int = 512,
        easy_cache_thresh: float = 0.0,
        easy_cache_ret_steps: int = 10,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting pipeline")
        # Encode BEFORE the 14B-class DiT loads (staged single-chip residency,
        # engine/base.py release_text_encoders): UMT5-XXL and the transformer
        # never run concurrently.
        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        context = self.encode_prompt(prompt or "", max_sequence_length)
        use_cfg = guidance_scale > 1.0
        neg_context = (
            self.encode_prompt(negative_prompt or "", max_sequence_length) if use_cfg else None
        )
        self.maybe_release_text_encoders()
        safe_emit_progress(progress_callback, 0.05, "Prompts ready")

        self.load_components(return_latents)
        safe_emit_progress(progress_callback, 0.18, "Components ready")

        vae_cfg = self.vae.cfg if self.vae is not None else None
        s_scale = vae_cfg.spatial_scale if vae_cfg else 8
        t_scale = vae_cfg.temporal_scale if vae_cfg else 4
        pt, ph, pw = self.transformer.cfg.patch_size
        height -= height % (s_scale * ph)
        width -= width % (s_scale * pw)
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)

        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        x = self.get_latents(
            (1, self.transformer.cfg.in_channels, lat_t, lat_h, lat_w),
            seed=seed,
            latents=latents,
        )
        safe_emit_progress(progress_callback, 0.3, "Initialized latent noise")

        ts, _ = self.get_timesteps(
            self.scheduler, num_inference_steps, timesteps=timesteps,
            **({"shift": shift} if shift is not None else {}),
        )
        boundary_timestep = (
            boundary_ratio * getattr(self.scheduler, "num_train_timesteps", 1000)
            if boundary_ratio is not None
            else None
        )
        safe_emit_progress(progress_callback, 0.4, "Timesteps computed; starting denoise")

        x = self.denoise(
            x,
            ts,
            context,
            neg_context,
            guidance_scale,
            guidance_scale_2,
            boundary_timestep,
            render_on_step_callback,
            render_on_step_interval,
            render_on_step,
            make_mapped_progress(progress_callback, 0.4, 0.9),
            easy_cache_thresh=easy_cache_thresh,
            easy_cache_ret_steps=easy_cache_ret_steps,
        )
        safe_emit_progress(progress_callback, 0.9, "Denoising complete")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames


@register_engine("wan", "t2v")
class WanT2VEngine(WanShared):
    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        fps: int = 16,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 30,
        guidance_scale: float = 5.0,
        guidance_scale_2: Optional[float] = None,
        boundary_ratio: Optional[float] = None,
        seed: Optional[int] = None,
        latents: Optional[np.ndarray] = None,
        shift: Optional[float] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        easy_cache_thresh: float = 0.0,
        easy_cache_ret_steps: int = 10,
        **_: Any,
    ):
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        return self._run_video(
            prompt, negative_prompt, height, width, num_frames, num_inference_steps,
            guidance_scale, guidance_scale_2, boundary_ratio, seed, latents, shift,
            timesteps, return_latents, render_on_step, render_on_step_callback,
            render_on_step_interval, progress_callback,
            easy_cache_thresh=easy_cache_thresh,
            easy_cache_ret_steps=easy_cache_ret_steps,
        )


@register_engine("wan", "i2v")
class WanI2VEngine(WanShared):
    """Image-to-video: first-frame latent + mask conditioning channels and
    CLIP-vision cross-attention features (reference engine/wan/i2v.py; latent
    packing per the published Wan I2V pipeline: condition = [4ch temporal
    first-frame mask | 16ch VAE encode of (image ‖ zero frames)])."""

    def encode_image_clip(self, image: np.ndarray) -> jnp.ndarray:
        from apex_studio_tpu.models.text_encoders.clip_vision import preprocess_clip_image

        encoder = self.load_helper("image_encoder")
        pixels = jnp.asarray(preprocess_clip_image(image, size=encoder.cfg.image_size))
        graphdef, state = nnx.split(encoder)
        key = ("wan_clip_vision", pixels.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, px):
                return nnx.merge(graphdef, state)(px, penultimate=True)

            self._jit_cache[key] = fwd
        return fwd(state, pixels)

    def build_condition(self, image: np.ndarray, num_frames: int, height: int, width: int):
        """→ ([1, 20, T_lat, h, w] condition channels)."""
        import cv2

        t_scale = self.vae.cfg.temporal_scale
        lat_t = (num_frames - 1) // t_scale + 1
        resized = cv2.resize(image, (width, height), interpolation=cv2.INTER_LANCZOS4)
        first = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
        video = jnp.concatenate(
            [first[None, :, None], jnp.zeros((1, 3, num_frames - 1, height, width))],
            axis=2,
        )
        graphdef, vae_state = nnx.split(self.vae)
        key = ("wan_vae_encode", tuple(video.shape))
        enc = self._jit_cache.get(key)
        if enc is None:

            @jax.jit
            def enc(state, v):
                return nnx.merge(graphdef, state).encode(v)

            self._jit_cache[key] = enc
        latent_condition = enc(vae_state, video.astype(jnp.float32))

        lat_h, lat_w = latent_condition.shape[-2:]
        # Temporal mask: pixel-frame validity packed t_scale-to-1 into channels.
        mask = np.zeros((1, 1, num_frames, lat_h, lat_w), np.float32)
        mask[:, :, 0] = 1.0
        first_rep = np.repeat(mask[:, :, :1], t_scale, axis=2)
        mask = np.concatenate([first_rep, mask[:, :, 1:]], axis=2)
        mask = mask.reshape(1, lat_t, t_scale, lat_h, lat_w).transpose(0, 2, 1, 3, 4)
        return jnp.concatenate([jnp.asarray(mask), latent_condition], axis=1)

    def run(
        self,
        image: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        fps: int = 16,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 30,
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
        easy_cache_thresh: float = 0.0,
        easy_cache_ret_steps: int = 10,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting i2v pipeline")
        self.load_components(return_latents=False)  # i2v always needs the VAE
        if image is None:
            raise ValueError("i2v requires an input image")
        if isinstance(image, (str, bytes)) or hasattr(image, "__fspath__"):
            from apex_studio_tpu.preprocess.base import load_frames

            image = load_frames(image)[0]
        image = np.asarray(image)

        vae_cfg = self.vae.cfg
        s_scale, t_scale = vae_cfg.spatial_scale, vae_cfg.temporal_scale
        pt, ph, pw = self.transformer.cfg.patch_size
        height -= height % (s_scale * ph)
        width -= width % (s_scale * pw)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)

        context = self.encode_prompt(prompt or "")
        use_cfg = guidance_scale > 1.0
        neg_context = self.encode_prompt(negative_prompt or "") if use_cfg else None

        image = self.load_image_input(image)
        has_image_branch = self.transformer.cfg.image_dim is not None
        clip_feats = self.encode_image_clip(image) if has_image_branch else None
        condition = self.build_condition(image, num_frames, height, width)
        safe_emit_progress(progress_callback, 0.25, "Image conditioning ready")

        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
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
        _, state_1 = nnx.split(self.transformer)
        state_2 = nnx.split(self.transformer_2)[1] if self.transformer_2 is not None else None

        shapes = ((1, self.transformer.cfg.in_channels, lat_t, lat_h, lat_w), context.shape[1])
        denoise_cb = make_mapped_progress(progress_callback, 0.35, 0.9)
        if len(ts) <= 8:
            render_on_step = False
        for i, t in enumerate(ts):
            if boundary_timestep is not None and float(t) < boundary_timestep and state_2 is not None:
                transformer, state, tag = self.transformer_2, state_2, "wan_i2v_low"
                g = guidance_scale_2 if guidance_scale_2 is not None else guidance_scale
            else:
                transformer, state, tag = self.transformer, state_1, "wan_i2v_high"
                g = guidance_scale
            fwd = self._fwd_i2v_for(transformer, tag, shapes, clip_feats is not None)

            t_vec = jnp.full((1,), float(t), jnp.float32)
            x_in = jnp.concatenate([x, condition], axis=1).astype(transformer.dtype)
            v = fwd(state, x_in, t_vec, context, clip_feats)
            if use_cfg and g > 1.0:
                v_neg = fwd(state, x_in, t_vec, neg_context, clip_feats)
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
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames

    def _fwd_i2v_for(self, transformer, tag: str, shapes, with_image: bool):
        key = (tag, shapes, with_image)
        fwd = self._jit_cache.get(key)
        if fwd is None:
            graphdef, _ = nnx.split(transformer)

            @jax.jit
            def fwd(state, x, t, ctx, ctx_img):
                return nnx.merge(graphdef, state)(x, t, ctx, context_image=ctx_img)

            self._jit_cache[key] = fwd
        return fwd


def _frames_to_video_tensor(frames: List[np.ndarray], height: int, width: int) -> jnp.ndarray:
    """HWC uint8 frames → [1, 3, T, H, W] in [-1, 1]."""
    import cv2

    stacked = np.stack(
        [cv2.resize(f, (width, height), interpolation=cv2.INTER_LANCZOS4) for f in frames]
    )
    video = stacked.astype(np.float32) / 127.5 - 1.0  # [T,H,W,3]
    return jnp.asarray(video.transpose(3, 0, 1, 2))[None]


class _WanVaeEncodeMixin:
    """Back-compat alias: the VAE-encode disk cache now lives at BaseEngine
    level (encode_video_latents) so every family gets it — VERDICT r2 weak #6
    (reference caches at base_engine.py:2079 for all families)."""


@register_engine("wan", "v2v")
class WanV2VEngine(WanShared, _WanVaeEncodeMixin):
    """Video-to-video: VAE-encode the input video, corrupt it to ``strength``
    on the rectified-flow path, and denoise the remaining schedule tail
    (reference engine/wan/v2v.py — strength semantics match diffusers:
    ``strength=1`` is full resampling, ``0`` returns the input)."""

    def run(
        self,
        video: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        num_frames: Optional[int] = None,
        strength: float = 0.7,
        num_inference_steps: int = 30,
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
        safe_emit_progress(progress_callback, 0.0, "Starting v2v pipeline")
        self.load_components(return_latents=False)
        if video is None:
            raise ValueError("v2v requires an input video")
        if isinstance(video, (str, bytes)) or hasattr(video, "__fspath__"):
            from apex_studio_tpu.preprocess.base import load_frames

            video = load_frames(video, max_frames=num_frames)
        frames_in = [np.asarray(f) for f in video]

        vae_cfg = self.vae.cfg
        s_scale, t_scale = vae_cfg.spatial_scale, vae_cfg.temporal_scale
        pt, ph, pw = self.transformer.cfg.patch_size
        height -= height % (s_scale * ph)
        width -= width % (s_scale * pw)
        n = len(frames_in)
        n = max(1, n - (n - 1) % t_scale)
        frames_in = frames_in[:n]

        source = self.encode_video_latents(_frames_to_video_tensor(frames_in, height, width))
        safe_emit_progress(progress_callback, 0.2, "Encoded source video")

        context = self.encode_prompt(prompt or "")
        use_cfg = guidance_scale > 1.0
        neg_context = self.encode_prompt(negative_prompt or "") if use_cfg else None

        ts_full, _ = self.get_timesteps(
            self.scheduler, num_inference_steps,
            **({"shift": shift} if shift is not None else {}),
        )
        # Keep the schedule tail: start denoising from sigma ≈ strength.
        start = min(int(round(num_inference_steps * (1.0 - strength))), len(ts_full) - 1)
        ts = ts_full[start:]
        if hasattr(self.scheduler, "set_begin_index"):
            self.scheduler.set_begin_index(start)

        noise = self.get_latents(source.shape, seed=seed)
        x = self.scheduler.add_noise(source.astype(jnp.float32), noise, ts[0])
        boundary_timestep = (
            boundary_ratio * getattr(self.scheduler, "num_train_timesteps", 1000)
            if boundary_ratio is not None
            else None
        )
        safe_emit_progress(progress_callback, 0.35, "Corrupted source; starting denoise")

        x = self.denoise(
            x, ts, context, neg_context, guidance_scale, guidance_scale_2,
            boundary_timestep, render_on_step_callback, render_on_step_interval,
            render_on_step, make_mapped_progress(progress_callback, 0.35, 0.9),
        )
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames


@register_engine("wan", "fflf")
class WanFFLFEngine(WanI2VEngine, _WanVaeEncodeMixin):
    """First-frame-last-frame interpolation (reference engine/wan/fflf.py):
    i2v conditioning where both endpoint frames are valid — condition =
    [4ch temporal mask with first+last set | VAE([first, 0…0, last])] and the
    CLIP branch sees the concatenated features of both endpoints."""

    def build_fflf_condition(
        self, first: np.ndarray, last: np.ndarray, num_frames: int, height: int, width: int
    ) -> jnp.ndarray:
        import cv2

        t_scale = self.vae.cfg.temporal_scale
        lat_t = (num_frames - 1) // t_scale + 1

        def to_chw(img: np.ndarray) -> jnp.ndarray:
            resized = cv2.resize(img, (width, height), interpolation=cv2.INTER_LANCZOS4)
            return jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)

        video = jnp.concatenate(
            [
                to_chw(first)[None, :, None],
                jnp.zeros((1, 3, num_frames - 2, height, width)),
                to_chw(last)[None, :, None],
            ],
            axis=2,
        )
        latent_condition = self.encode_video_latents(video)

        lat_h, lat_w = latent_condition.shape[-2:]
        mask = np.zeros((1, 1, num_frames, lat_h, lat_w), np.float32)
        mask[:, :, 0] = 1.0
        mask[:, :, -1] = 1.0
        first_rep = np.repeat(mask[:, :, :1], t_scale, axis=2)
        mask = np.concatenate([first_rep, mask[:, :, 1:]], axis=2)
        mask = mask.reshape(1, lat_t, t_scale, lat_h, lat_w).transpose(0, 2, 1, 3, 4)
        return jnp.concatenate([jnp.asarray(mask), latent_condition], axis=1)

    def run(self, image: Any = None, last_image: Any = None, **kwargs: Any):
        if image is None or last_image is None:
            raise ValueError("fflf requires both `image` (first frame) and `last_image`")
        self._fflf_last = self.load_image_input(
            np.asarray(last_image)
            if not (isinstance(last_image, (str, bytes)) or hasattr(last_image, "__fspath__"))
            else last_image
        )
        try:
            return super().run(image=image, **kwargs)
        finally:
            self._fflf_last = None

    # i2v hooks, overridden to fold in the last frame --------------------------------

    def build_condition(self, image: np.ndarray, num_frames: int, height: int, width: int):
        return self.build_fflf_condition(image, self._fflf_last, num_frames, height, width)

    def encode_image_clip(self, image: np.ndarray) -> jnp.ndarray:
        first = super().encode_image_clip(image)
        last = super().encode_image_clip(self._fflf_last)
        return jnp.concatenate([first, last], axis=1)


@register_engine("wan", "inp")
class WanInpaintEngine(WanI2VEngine, _WanVaeEncodeMixin):
    """Video inpainting (reference engine/wan/inp.py): condition =
    [t_scale-packed *known-region* mask | VAE(video with the inpaint region
    zeroed)]. Mask semantics: 1 = regenerate, 0 = keep; the packed channels
    carry validity (1 − mask) like the i2v temporal mask, but spatially
    varying. Reuses the i2v denoise loop (no CLIP branch unless the manifest
    has an image_dim)."""

    def run(self, video: Any = None, mask: Any = None, image: Any = None, **kwargs: Any):
        if video is None:
            raise ValueError("inp requires an input video")
        if mask is None:
            raise ValueError("inp requires a mask (image or video)")
        from apex_studio_tpu.preprocess.base import load_frames

        if isinstance(video, (str, bytes)) or hasattr(video, "__fspath__"):
            video = load_frames(video)
        self._inp_frames = [self.load_image_input(np.asarray(f)) for f in video]
        if isinstance(mask, (str, bytes)) or hasattr(mask, "__fspath__"):
            mask = load_frames(mask)
        if isinstance(mask, np.ndarray) and mask.ndim in (2, 3):
            mask = [mask]
        self._inp_masks = [np.asarray(m) for m in mask]
        kwargs.setdefault("num_frames", len(self._inp_frames))
        try:
            # first frame doubles as the i2v `image` arg (unused beyond checks)
            return super().run(image=self._inp_frames[0], **kwargs)
        finally:
            self._inp_frames = self._inp_masks = None

    def encode_image_clip(self, image: np.ndarray) -> jnp.ndarray:
        return super().encode_image_clip(self._inp_frames[0])

    def _mask_at(self, i: int, height: int, width: int) -> np.ndarray:
        """→ [H, W] float in {0,1}, 1 = inpaint. A single mask broadcasts."""
        import cv2

        m = self._inp_masks[min(i, len(self._inp_masks) - 1)]
        if m.ndim == 3:
            m = m[..., 0]
        m = cv2.resize(m.astype(np.float32), (width, height), interpolation=cv2.INTER_NEAREST)
        return (m > 127).astype(np.float32) if m.max() > 1.0 else (m > 0.5).astype(np.float32)

    def build_condition(self, image: np.ndarray, num_frames: int, height: int, width: int):
        import cv2

        t_scale = self.vae.cfg.temporal_scale
        lat_t = (num_frames - 1) // t_scale + 1

        frames = self._inp_frames[:num_frames]
        while len(frames) < num_frames:
            frames.append(frames[-1])
        masks = np.stack([self._mask_at(i, height, width) for i in range(num_frames)])

        pix = np.stack(
            [cv2.resize(f, (width, height), interpolation=cv2.INTER_LANCZOS4) for f in frames]
        ).astype(np.float32) / 127.5 - 1.0  # [T,H,W,3]
        pix = pix * (1.0 - masks[..., None])  # zero the regenerate region
        video = jnp.asarray(pix.transpose(3, 0, 1, 2))[None]
        latent_condition = self.encode_video_latents(video)

        lat_h, lat_w = latent_condition.shape[-2:]
        valid = 1.0 - masks  # known pixels
        valid_lat = np.stack(
            [cv2.resize(v, (lat_w, lat_h), interpolation=cv2.INTER_AREA) for v in valid]
        )[None, None]  # [1,1,T,h,w]
        first_rep = np.repeat(valid_lat[:, :, :1], t_scale, axis=2)
        packed = np.concatenate([first_rep, valid_lat[:, :, 1:]], axis=2)
        packed = packed.reshape(1, lat_t, t_scale, lat_h, lat_w).transpose(0, 2, 1, 3, 4)
        return jnp.concatenate([jnp.asarray(packed, jnp.float32), latent_condition], axis=1)


@register_engine("wan", "t2i")
class WanT2IEngine(WanShared):
    """Single-frame t2v → image (the Wan 2.2 A14B text-to-image manifest)."""

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 30,
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
        return self._run_video(
            prompt, negative_prompt, height, width, 1, num_inference_steps,
            guidance_scale, guidance_scale_2, boundary_ratio, seed, None, shift,
            None, return_latents, render_on_step, render_on_step_callback,
            render_on_step_interval, progress_callback,
        )


@register_engine("wan", "causal")
class WanCausalEngine(WanShared, _WanVaeEncodeMixin):
    """Autoregressive block-causal generation (CausVid/Self-Forcing class).

    Contract parity with the reference's ``engine/wan/causal.py``: latent
    frames are generated ``num_frame_per_block`` at a time; each block runs a
    few-step x0-renoise loop (flow → x0 at t, re-noise to the next t) against
    a KV cache of committed blocks, then the cache is refreshed once with the
    finished block at ``context_noise``. Image/video inputs pre-fill the cache.

    TPU-native loop: fixed-size functional KV cache, two compiled programs
    total (a denoise step and a cache commit) reused across every block —
    block position enters via traced RoPE tables + cache offset, so there is
    no per-block recompilation. This is the SURVEY §5 long-context engine: one
    compiled step's sequence length stays bounded no matter the video length.
    """

    def run(
        self,
        prompt: Optional[str] = None,
        image: Any = None,
        video: Any = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        fps: int = 16,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 4,
        num_frame_per_block: int = 3,
        context_noise: float = 0.0,
        local_attn_size: int = -1,     # in latent frames; -1 = full
        sink_size: int = 0,            # in latent frames
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting causal pipeline")
        self.load_components(return_latents)
        s_scale = self.vae.cfg.spatial_scale
        t_scale = self.vae.cfg.temporal_scale
        height -= height % (s_scale * self.transformer.cfg.patch_size[1])
        width -= width % (s_scale * self.transformer.cfg.patch_size[2])
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)

        context = self.encode_prompt(prompt or "")
        safe_emit_progress(progress_callback, 0.1, "Prompt encoded")

        lat_h, lat_w = height // s_scale, width // s_scale
        lat_t = (num_frames - 1) // t_scale + 1
        cfg_t = self.transformer.cfg
        h_tok, w_tok = lat_h // cfg_t.patch_size[1], lat_w // cfg_t.patch_size[2]
        frame_seq = h_tok * w_tok

        # Conditioning pre-fill (image → 1 latent frame; video → its latents).
        initial = None
        if image is not None:
            import cv2

            arr = self.load_image_input(image)
            resized = cv2.resize(arr, (width, height), interpolation=cv2.INTER_LANCZOS4)
            first = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
            initial = self.encode_video_latents(first[None, :, None])
        elif video is not None:
            frames = [self.load_image_input(np.asarray(f)) for f in video]
            vid = jnp.asarray(
                np.stack(frames, axis=0).astype(np.float32) / 127.5 - 1.0
            ).transpose(3, 0, 1, 2)[None]
            initial = self.encode_video_latents(vid)
        num_input_frames = 0 if initial is None else initial.shape[2]

        gen_frames = lat_t
        num_blocks = gen_frames // num_frame_per_block
        gen_frames = num_blocks * num_frame_per_block
        total_frames = num_input_frames + gen_frames
        s_max = total_frames * frame_seq

        noise = self.get_latents(
            (1, cfg_t.in_channels, gen_frames, lat_h, lat_w), seed=seed
        )
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps, timesteps=timesteps)
        # Per-step re-noise draws (deterministic from the seed).
        rng = np.random.default_rng(0 if seed is None else seed)

        k_cache, v_cache = self.transformer.init_cache(1, s_max)
        graphdef, tf_state = nnx.split(self.transformer)
        local_tokens = local_attn_size * frame_seq if local_attn_size > 0 else -1
        sink_tokens = sink_size * frame_seq

        blk_shape = (1, cfg_t.in_channels, num_frame_per_block, lat_h, lat_w)
        key_d = ("wan_causal_denoise", blk_shape, context.shape[1], s_max,
                 local_tokens, sink_tokens)
        denoise_step = self._jit_cache.get(key_d)
        if denoise_step is None:

            @jax.jit
            def denoise_step(state, x, kc, vc, cache_pos, t_frames, ctx,
                             rope_cos, rope_sin, sigma, sigma_next, fresh_noise):
                m = nnx.merge(graphdef, state)
                flow, _ = m.forward_causal(
                    x.astype(m.dtype), t_frames, ctx, kc, vc, cache_pos,
                    rope_cos, rope_sin, local_tokens=local_tokens,
                    sink_tokens=sink_tokens,
                )
                x0 = x.astype(jnp.float32) - sigma * flow.astype(jnp.float32)
                return (1.0 - sigma_next) * x0 + sigma_next * fresh_noise

            self._jit_cache[key_d] = denoise_step

        def _commit_key(n_frames):
            return ("wan_causal_commit",
                    (1, cfg_t.in_channels, n_frames, lat_h, lat_w),
                    context.shape[1], s_max, local_tokens, sink_tokens)

        def get_commit(n_frames):
            key_c = _commit_key(n_frames)
            commit = self._jit_cache.get(key_c)
            if commit is None:

                @functools.partial(jax.jit, donate_argnums=(2, 3))
                def commit(state, x, kc, vc, cache_pos, t_frames, ctx, rope_cos, rope_sin):
                    m = nnx.merge(graphdef, state)
                    _, (kc2, vc2) = m.forward_causal(
                        x.astype(m.dtype), t_frames, ctx, kc, vc, cache_pos,
                        rope_cos, rope_sin, local_tokens=local_tokens,
                        sink_tokens=sink_tokens,
                    )
                    return kc2, vc2

                self._jit_cache[key_c] = commit
            return commit

        output = np.zeros((1, cfg_t.in_channels, total_frames, lat_h, lat_w), np.float32)
        start = 0
        if initial is not None:
            output[:, :, :num_input_frames] = np.asarray(initial, np.float32)
            # Pre-fill the cache with the conditioning latents at t=0,
            # one latent frame at a time (matches reference frame packing).
            commit1 = get_commit(num_input_frames)
            rope = self.transformer.causal_rope_tables(0, num_input_frames, h_tok, w_tok)
            t0 = jnp.zeros((1, num_input_frames), jnp.float32)
            k_cache, v_cache = commit1(
                tf_state, initial.astype(jnp.float32), k_cache, v_cache,
                jnp.int32(0), t0, context, *rope,
            )
            start = num_input_frames
        safe_emit_progress(progress_callback, 0.2, "Cache pre-filled; generating")

        denoise_cb = make_mapped_progress(progress_callback, 0.2, 0.9)
        commit_blk = get_commit(num_frame_per_block)
        total_steps = num_blocks * len(ts)
        done = 0
        for b_idx in range(num_blocks):
            lo = b_idx * num_frame_per_block
            x_blk = noise[:, :, lo : lo + num_frame_per_block].astype(jnp.float32)
            start_frame = start + lo
            rope = self.transformer.causal_rope_tables(
                start_frame, num_frame_per_block, h_tok, w_tok
            )
            cache_pos = jnp.int32(start_frame * frame_seq)
            for i, t in enumerate(ts):
                t_frames = jnp.full((1, num_frame_per_block), float(t), jnp.float32)
                sigma = float(t) / 1000.0
                sigma_next = float(ts[i + 1]) / 1000.0 if i + 1 < len(ts) else 0.0
                fresh = jnp.asarray(
                    rng.standard_normal(blk_shape).astype(np.float32)
                ) if i + 1 < len(ts) else jnp.zeros(blk_shape, jnp.float32)
                x_blk = denoise_step(
                    tf_state, x_blk, k_cache, v_cache, cache_pos, t_frames,
                    context, *rope, jnp.float32(sigma), jnp.float32(sigma_next), fresh,
                )
                done += 1
                if denoise_cb is not None:
                    denoise_cb(done / total_steps, f"Causal step {done}/{total_steps}")
            output[:, :, start_frame : start_frame + num_frame_per_block] = np.asarray(x_blk)
            # Refresh the cache with the finished block at context_noise.
            t_ctx = jnp.full((1, num_frame_per_block), float(context_noise), jnp.float32)
            k_cache, v_cache = commit_blk(
                tf_state, x_blk, k_cache, v_cache, cache_pos, t_ctx, context, *rope,
            )
            if render_on_step and render_on_step_callback is not None:
                try:
                    render_on_step_callback(
                        self.decode_latents(jnp.asarray(
                            output[:, :, : start_frame + num_frame_per_block]
                        )), b_idx,
                    )
                except Exception:
                    logger.exception("preview callback failed")

        safe_emit_progress(progress_callback, 0.9, "Causal generation complete")
        lat = jnp.asarray(output)
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return lat
        frames = self.decode_latents(lat)
        safe_emit_progress(progress_callback, 1.0, "Completed causal pipeline")
        return frames


@register_engine("wan", "vace")
class WanVaceEngine(WanShared, _WanVaeEncodeMixin):
    """VACE all-in-one video editing (reference engine/wan/vace.py): a control
    video (optionally masked) and reference images condition generation
    through the transformer's VACE branch.

    Conditioning layout (vace.py:282-367): the control latents are
    [inactive | reactive] VAE encodings of the (un)masked video regions plus
    a space-to-depth (8×8 → 64ch) copy of the pixel mask; each reference
    image is VAE-encoded, zero-padded channel-wise, and prepended in time —
    the generated latents include those frames and drop them before decode.
    """

    def _space_to_depth_mask(self, mask_f: np.ndarray, lat_f: int, lat_h: int,
                             lat_w: int) -> jnp.ndarray:
        """mask frames (F, H, W) in {0,1} → (64, lat_f, lat_h, lat_w)."""
        f, h, w = mask_f.shape
        s = self.vae_scale_factor_spatial
        m = mask_f.reshape(f, lat_h, s, lat_w, s)
        m = m.transpose(2, 4, 0, 1, 3).reshape(s * s, f, lat_h, lat_w)
        return jax.image.resize(jnp.asarray(m, jnp.float32),
                                (s * s, lat_f, lat_h, lat_w), "nearest")

    @property
    def vae_scale_factor_spatial(self) -> int:
        return self.vae.cfg.spatial_scale if self.vae is not None else 8

    @property
    def vae_scale_factor_temporal(self) -> int:
        return self.vae.cfg.temporal_scale if self.vae is not None else 4

    def _load_frames(self, media: Any, num_frames: int, height: int, width: int):
        import cv2

        from apex_studio_tpu.preprocess.base import load_frames

        frames = load_frames(media) if isinstance(media, str) else list(media)
        frames = [cv2.resize(np.asarray(fr), (width, height),
                             interpolation=cv2.INTER_AREA) for fr in frames]
        while len(frames) < num_frames:
            frames.append(frames[-1])
        return frames[:num_frames]

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        video: Optional[Any] = None,
        mask: Optional[Any] = None,
        reference_images: Optional[Any] = None,
        conditioning_scale: Any = 1.0,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting VACE pipeline")
        self.load_components(return_latents)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        tsc, ssc = self.vae_scale_factor_temporal, self.vae_scale_factor_spatial
        num_frames = max(1, num_frames - (num_frames - 1) % tsc)
        lat_f = (num_frames - 1) // tsc + 1
        lat_h, lat_w = height // ssc, width // ssc

        context = self.encode_prompt(prompt or "")
        neg_context = self.encode_prompt(negative_prompt or "")
        safe_emit_progress(progress_callback, 0.15, "Prompts encoded")

        # -- control video + mask --------------------------------------------------
        if video is not None:
            frames = self._load_frames(video, num_frames, height, width)
            vid = jnp.asarray(np.stack(frames), jnp.float32)
            vid = vid.transpose(3, 0, 1, 2)[None] / 127.5 - 1.0
        else:
            vid = jnp.zeros((1, 3, num_frames, height, width), jnp.float32)
        if mask is not None:
            mframes = self._load_frames(mask, num_frames, height, width)
            m = np.stack([np.asarray(fr).mean(axis=-1) for fr in mframes])
            mask_f = (m > 127.5).astype(np.float32)  # (F, H, W)
        else:
            mask_f = np.ones((num_frames, height, width), np.float32)
        mgrid = jnp.asarray(mask_f, jnp.float32)[None, None]  # [1,1,F,H,W]
        if video is not None and mask is not None:
            vid = vid * (1 - mgrid)  # masked pixels → mid-gray (0 in [-1,1])
        inactive = self.encode_video_latents(vid * (1 - mgrid))
        reactive = self.encode_video_latents(vid * mgrid)
        control = jnp.concatenate([inactive, reactive], axis=1)  # [1,32,f,h,w]
        safe_emit_progress(progress_callback, 0.3, "Control video encoded")

        # -- reference images ------------------------------------------------------
        refs = reference_images
        if refs is not None and not isinstance(refs, (list, tuple)):
            refs = [refs]
        refs = refs or []
        n_ref = len(refs)
        for ref in reversed(refs):
            import cv2

            arr = self.load_image_input(ref)
            arr = cv2.resize(arr, (width, height), interpolation=cv2.INTER_AREA)
            px = (jnp.asarray(arr, jnp.float32).transpose(2, 0, 1)[None, :, None]
                  / 127.5 - 1.0)
            rz = self.encode_video_latents(px)  # [1,16,1,h,w]
            rz = jnp.concatenate([rz, jnp.zeros_like(rz)], axis=1)
            control = jnp.concatenate([rz, control], axis=2)

        m64 = self._space_to_depth_mask(mask_f, lat_f, lat_h, lat_w)[None]
        if n_ref:
            m64 = jnp.concatenate(
                [jnp.zeros((1, m64.shape[1], n_ref, lat_h, lat_w), m64.dtype), m64],
                axis=2)
        control = jnp.concatenate([control, m64], axis=1)  # [1,96,f+refs,h,w]

        n_vace = len(self.transformer.cfg.vace_layers)
        if isinstance(conditioning_scale, (int, float)):
            scales = jnp.full((n_vace,), float(conditioning_scale), jnp.float32)
        else:
            scales = jnp.asarray(conditioning_scale, jnp.float32)

        x = self.get_latents(
            (1, self.transformer.cfg.in_channels, lat_f + n_ref, lat_h, lat_w),
            seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                   timesteps=timesteps)
        safe_emit_progress(progress_callback, 0.4, "Latents ready; denoising")

        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        key = ("wan_vace_step", tuple(x.shape), context.shape[1],
               neg_context.shape[1], do_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, t, ctx, nctx, ctl, sc):
                m = nnx.merge(graphdef, state)
                pos = m(x, t, ctx, control=ctl, control_scale=sc)
                if not do_cfg:
                    return pos
                neg = m(x, t, nctx, control=ctl, control_scale=sc)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        dt = self.transformer.dtype
        cb = make_mapped_progress(progress_callback, 0.4, 0.9)
        for i, t in enumerate(np.asarray(ts, np.float64)):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(tf_state, x.astype(dt), t_b, context.astype(dt),
                    neg_context.astype(dt), control.astype(dt), scales)
            x = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = x[0] if isinstance(x, tuple) else x
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x[:, :, n_ref:])
        safe_emit_progress(progress_callback, 1.0, "VACE pipeline complete")
        return frames


@register_engine("wan", "apex_framepack")
class WanApexFramepackEngine(WanShared):
    """Long-video generation by sections with compressed context
    (reference engine/wan/apex_framepack.py): the anchor frames are denoised
    first, then windows fill back-to-front, each conditioned on the packed
    past/future context (SURVEY §5 long-context; the sp/ring-attention axis
    picks this up automatically when the mesh carries sp > 1)."""

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        duration: Any = 16,
        fps: int = 16,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 30,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting framepack pipeline")
        self.load_components(return_latents)
        if num_frames is None:
            num_frames = int(round(float(duration) * fps)) + 1
        t_scale = self.vae.cfg.temporal_scale
        s_scale = self.vae.cfg.spatial_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        context = self.encode_prompt(prompt or "")
        neg_context = self.encode_prompt(negative_prompt or "")
        safe_emit_progress(progress_callback, 0.1, "Prompts encoded")

        cfg_t = self.transformer.cfg
        x = self.get_latents((1, cfg_t.in_channels, lat_f, lat_h, lat_w), seed=seed)
        schedule = self.transformer.framepack_schedule
        denoised = np.zeros(lat_f, bool)
        n_sections = schedule.num_sections(lat_f)

        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        dt = self.transformer.dtype
        section = 0
        cb = make_mapped_progress(progress_callback, 0.15, 0.9)
        while not denoised.all():
            past, future, target = schedule.get_inference_inputs(lat_f, denoised)
            lc = []
            if past is not None:
                lc.append((x[:, :, past].astype(dt), past, 1))
            if future is not None:
                for fidx, factor in schedule.split_future(future):
                    lc.append((x[:, :, fidx].astype(dt), fidx, factor))
            x_t = self.get_latents(
                (1, cfg_t.in_channels, len(target), lat_h, lat_w),
                seed=None if seed is None else seed + 1 + section)

            ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                       timesteps=timesteps)
            # context layout key → one compiled step program per layout
            lkey = tuple((tuple(l.shape), int(f)) for l, _, f in lc)
            key = ("wan_fp_step", tuple(x_t.shape), context.shape[1], lkey, do_cfg)
            fwd = self._jit_cache.get(key)
            if fwd is None:
                tgt_idx = tuple(int(i) for i in target)
                idx_list = tuple(tuple(int(i) for i in i_) for _, i_, _ in lc)
                factors = tuple(int(f) for _, _, f in lc)

                @jax.jit
                def fwd(state, xt, t, ctx, nctx, *lats,
                        _ti=tgt_idx, _il=idx_list, _fs=factors):
                    m = nnx.merge(graphdef, state)
                    ctx_list = [(l, np.asarray(i), f)
                                for l, i, f in zip(lats, _il, _fs)]
                    pos = m(xt, t, ctx, latent_context=ctx_list,
                            indices=np.asarray(_ti))
                    if not do_cfg:
                        return pos
                    neg = m(xt, t, nctx, latent_context=ctx_list,
                            indices=np.asarray(_ti))
                    return neg + guidance_scale * (pos - neg)

                self._jit_cache[key] = fwd
            lat_args = [l for l, _, _ in lc]
            for i, t in enumerate(np.asarray(ts, np.float64)):
                t_b = jnp.full((1,), float(t), jnp.float32)
                v = fwd(tf_state, x_t.astype(dt), t_b, context.astype(dt),
                        neg_context.astype(dt), *lat_args)
                out = self.scheduler.step(v.astype(jnp.float32), float(t), x_t)
                x_t = out[0] if isinstance(out, tuple) else out
            x = x.at[:, :, np.asarray(target)].set(x_t.astype(x.dtype))
            denoised[np.asarray(target)] = True
            section += 1
            safe_emit_progress(cb, min(1.0, section / max(1, n_sections)),
                               f"section {section}/{n_sections}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Framepack pipeline complete")
        return frames


@register_engine("wan", "phantom")
class WanPhantomEngine(WanShared, _WanVaeEncodeMixin):
    """Subject-consistent generation (reference engine/wan/phantom.py):
    reference-image latents ride along as appended sequence tokens."""

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        subject_reference_images: Optional[Any] = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting Phantom pipeline")
        self.load_components(return_latents)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        t_scale, s_scale = self.vae.cfg.temporal_scale, self.vae.cfg.spatial_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        context = self.encode_prompt(prompt or "")
        neg_context = self.encode_prompt(negative_prompt or "")

        refs = subject_reference_images
        if refs is not None and not isinstance(refs, (list, tuple)):
            refs = [refs]
        subject_ref = None
        if refs:
            import cv2

            lats = []
            for ref in refs:
                arr = self.load_image_input(ref)
                arr = cv2.resize(arr, (width, height), interpolation=cv2.INTER_AREA)
                px = (jnp.asarray(arr, jnp.float32).transpose(2, 0, 1)
                      [None, :, None] / 127.5 - 1.0)
                lats.append(self.encode_video_latents(px))
            subject_ref = jnp.concatenate(lats, axis=2)
        safe_emit_progress(progress_callback, 0.25, "Conditioning ready")

        x = self.get_latents(
            (1, self.transformer.cfg.in_channels, lat_f, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                   timesteps=timesteps)
        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        ref_shape = None if subject_ref is None else tuple(subject_ref.shape)
        key = ("wan_phantom_step", tuple(x.shape), context.shape[1], ref_shape,
               do_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, t, ctx, nctx, ref):
                m = nnx.merge(graphdef, state)
                pos = m(x, t, ctx, subject_ref=ref)
                if not do_cfg:
                    return pos
                neg = m(x, t, nctx, subject_ref=ref)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        dt = self.transformer.dtype
        cb = make_mapped_progress(progress_callback, 0.3, 0.9)
        ref_in = None if subject_ref is None else subject_ref.astype(dt)
        for i, t in enumerate(np.asarray(ts, np.float64)):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(tf_state, x.astype(dt), t_b, context.astype(dt),
                    neg_context.astype(dt), ref_in)
            out = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = out[0] if isinstance(out, tuple) else out
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Phantom pipeline complete")
        return frames


@register_engine("wan", "fun_control")
class WanFunControlEngine(WanPhantomEngine):
    """Fun-Control (reference engine/wan/fun_control.py): a control video
    (pose/depth render) is VAE-encoded and channel-concatenated with the
    noise each step; an optional reference image rides as subject tokens."""

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        control_video: Optional[Any] = None,
        video: Optional[Any] = None,
        ref_image: Optional[Any] = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting Fun-Control pipeline")
        self.load_components(return_latents)
        control_video = control_video if control_video is not None else video
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        t_scale, s_scale = self.vae.cfg.temporal_scale, self.vae.cfg.spatial_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        context = self.encode_prompt(prompt or "")
        neg_context = self.encode_prompt(negative_prompt or "")

        z_ch = self.vae.cfg.z_dim if hasattr(self.vae.cfg, "z_dim") else 16
        if control_video is not None:
            import cv2

            from apex_studio_tpu.preprocess.base import load_frames

            frames_in = (load_frames(control_video)
                         if isinstance(control_video, str) else list(control_video))
            frames_in = [cv2.resize(np.asarray(fr), (width, height),
                                    interpolation=cv2.INTER_AREA)
                         for fr in frames_in]
            while len(frames_in) < num_frames:
                frames_in.append(frames_in[-1])
            vid = jnp.asarray(np.stack(frames_in[:num_frames]), jnp.float32)
            vid = vid.transpose(3, 0, 1, 2)[None] / 127.5 - 1.0
            control = self.encode_video_latents(vid)
        else:
            control = jnp.zeros((1, z_ch, lat_f, lat_h, lat_w), jnp.float32)

        subject_ref = None
        if ref_image is not None:
            import cv2

            arr = self.load_image_input(ref_image)
            arr = cv2.resize(arr, (width, height), interpolation=cv2.INTER_AREA)
            px = (jnp.asarray(arr, jnp.float32).transpose(2, 0, 1)
                  [None, :, None] / 127.5 - 1.0)
            subject_ref = self.encode_video_latents(px)
        safe_emit_progress(progress_callback, 0.25, "Control encoded")

        noise_ch = self.transformer.cfg.in_channels - control.shape[1]
        x = self.get_latents((1, noise_ch, lat_f, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                   timesteps=timesteps)
        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        ref_shape = None if subject_ref is None else tuple(subject_ref.shape)
        key = ("wan_func_step", tuple(x.shape), context.shape[1], ref_shape,
               do_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, ctl, t, ctx, nctx, ref):
                m = nnx.merge(graphdef, state)
                x_in = jnp.concatenate([x, ctl], axis=1)
                pos = m(x_in, t, ctx, subject_ref=ref)
                if not do_cfg:
                    return pos
                neg = m(x_in, t, nctx, subject_ref=ref)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        dt = self.transformer.dtype
        cb = make_mapped_progress(progress_callback, 0.3, 0.9)
        ref_in = None if subject_ref is None else subject_ref.astype(dt)
        ctl_in = control.astype(dt)
        for i, t in enumerate(np.asarray(ts, np.float64)):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(tf_state, x.astype(dt), ctl_in, t_b, context.astype(dt),
                    neg_context.astype(dt), ref_in)
            out = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = out[0] if isinstance(out, tuple) else out
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Fun-Control pipeline complete")
        return frames


@register_engine("wan", "fun")
class WanFunEngine(WanFunControlEngine):
    """Wan Fun (reference engine/wan/fun.py): start/end-image conditioning
    rides on the control channel block — ``control = cat([control_video or
    zeros, start_image_latents_in])`` where start_image_latents_in is zeros
    with frame 0 holding the encoded start image (fun.py:142-171,305-316) —
    and subject reference images append as extra subject tokens."""

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        start_image: Optional[Any] = None,
        image: Optional[Any] = None,
        end_image: Optional[Any] = None,
        subject_reference_images: Optional[Any] = None,
        control_video: Optional[Any] = None,
        reference_image: Optional[Any] = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        import cv2

        safe_emit_progress(progress_callback, 0.0, "Starting Fun pipeline")
        self.load_components(return_latents)
        start_image = start_image if start_image is not None else image
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        t_scale, s_scale = self.vae.cfg.temporal_scale, self.vae.cfg.spatial_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        z_ch = getattr(self.vae.cfg, "z_dim", 16)

        context = self.encode_prompt(prompt or "")
        neg_context = self.encode_prompt(negative_prompt or "")

        def encode_image_frame(img):
            arr = cv2.resize(self.load_image_input(img), (width, height),
                             interpolation=cv2.INTER_AREA)
            px = (jnp.asarray(arr, jnp.float32).transpose(2, 0, 1)
                  [None, :, None] / 127.5 - 1.0)
            return self.encode_video_latents(px)

        # control channel block: [control video latents ‖ start-image block]
        if control_video is not None:
            from apex_studio_tpu.preprocess.base import load_frames

            frames_in = (load_frames(control_video)
                         if isinstance(control_video, str) else list(control_video))
            frames_in = [cv2.resize(np.asarray(fr), (width, height),
                                    interpolation=cv2.INTER_AREA)
                         for fr in frames_in]
            while len(frames_in) < num_frames:
                frames_in.append(frames_in[-1])
            vid = jnp.asarray(np.stack(frames_in[:num_frames]), jnp.float32)
            vid = vid.transpose(3, 0, 1, 2)[None] / 127.5 - 1.0
            control = self.encode_video_latents(vid)
        else:
            control = jnp.zeros((1, z_ch, lat_f, lat_h, lat_w), jnp.float32)

        start_block = jnp.zeros((1, z_ch, lat_f, lat_h, lat_w), jnp.float32)
        if start_image is not None:
            start_block = start_block.at[:, :, :1].set(
                encode_image_frame(start_image).astype(jnp.float32))
        if end_image is not None:
            start_block = start_block.at[:, :, -1:].set(
                encode_image_frame(end_image).astype(jnp.float32))

        cond = jnp.concatenate([control, start_block], axis=1)
        needed = self.transformer.cfg.in_channels - z_ch
        cond = cond[:, :needed] if cond.shape[1] > needed else cond

        # subject references → subject tokens (time-concat of per-image latents)
        subject_ref = None
        refs = subject_reference_images or reference_image
        if refs is not None:
            if not isinstance(refs, (list, tuple)):
                refs = [refs]
            subject_ref = jnp.concatenate(
                [encode_image_frame(r) for r in refs], axis=2)

        x = self.get_latents((1, z_ch, lat_f, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                   timesteps=timesteps)
        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        ref_shape = None if subject_ref is None else tuple(subject_ref.shape)
        key = ("wan_fun_step", tuple(x.shape), context.shape[1], ref_shape,
               cond.shape[1], do_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, ctl, t, ctx, nctx, ref):
                m = nnx.merge(graphdef, state)
                x_in = jnp.concatenate([x, ctl], axis=1)
                pos = m(x_in, t, ctx, subject_ref=ref)
                if not do_cfg:
                    return pos
                neg = m(x_in, t, nctx, subject_ref=ref)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        dt = self.transformer.dtype
        cb = make_mapped_progress(progress_callback, 0.3, 0.9)
        ref_in = None if subject_ref is None else subject_ref.astype(dt)
        ctl_in = cond.astype(dt)
        for i, t in enumerate(np.asarray(ts, np.float64)):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(tf_state, x.astype(dt), ctl_in, t_b, context.astype(dt),
                    neg_context.astype(dt), ref_in)
            out = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = out[0] if isinstance(out, tuple) else out
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Fun pipeline complete")
        return frames


@register_engine("wan", "svi")
class WanSVIEngine(WanI2VEngine):
    """Stable Video Infinity: arbitrary-length video as chained i2v segments
    (reference engine/wan/svi.py). Each segment is a full i2v run anchored on
    the last ``num_motion_frame`` frames of the previous segment; segments
    overlap by ``num_overlap_frames`` pixels blended with a linear ramp, and
    each segment can carry its own prompt (multi-prompt storyboarding)."""

    def run(
        self,
        image: Any = None,
        prompt: Optional[Any] = None,
        prompts: Optional[List[str]] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        duration: Any = 10.0,
        fps: int = 16,
        num_frames: Optional[int] = None,
        num_frames_per_segment: int = 81,
        num_inference_steps: int = 30,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        num_overlap_frames: int = 4,
        num_motion_frame: int = 4,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **kwargs: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting SVI pipeline")
        if num_frames is None:
            num_frames = int(round(float(duration) * fps)) + 1
        seg_prompts = list(prompts) if prompts else [prompt or ""]
        # frames gained per extra segment shrink by the blended overlap
        step = max(1, num_frames_per_segment - num_overlap_frames)
        n_needed = 1 + max(0, int(np.ceil(
            (num_frames - num_frames_per_segment) / step)))
        n_segments = max(len(seg_prompts), n_needed)
        while len(seg_prompts) < n_segments:
            seg_prompts.append(seg_prompts[-1])

        all_frames: List[np.ndarray] = []
        anchor = image
        for si in range(n_segments):
            cb = make_mapped_progress(
                progress_callback, 0.05 + 0.9 * si / n_segments,
                0.05 + 0.9 * (si + 1) / n_segments)
            seg = super().run(
                image=anchor,
                prompt=seg_prompts[si],
                negative_prompt=negative_prompt,
                height=height, width=width,
                num_frames=num_frames_per_segment,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale,
                seed=None if seed is None else seed + si,
                progress_callback=cb,
                **kwargs,
            )
            if si == 0:
                all_frames.extend(seg)
            else:
                # linear cross-fade over the overlap region
                k = min(num_overlap_frames, len(all_frames), len(seg))
                for j in range(k):
                    w_new = (j + 1) / (k + 1)
                    mixed = ((1 - w_new) * all_frames[-k + j].astype(np.float32)
                             + w_new * seg[j].astype(np.float32))
                    all_frames[-k + j] = np.clip(mixed + 0.5, 0,
                                                 255).astype(np.uint8)
                all_frames.extend(seg[k:])
            # next anchor: the last motion frame of this segment
            anchor = seg[-max(1, num_motion_frame)]
        safe_emit_progress(progress_callback, 1.0, "SVI pipeline complete")
        return all_frames[:num_frames]


@register_engine("wan", "holocine")
class WanHolocineEngine(WanShared):
    """HoloCine joint multi-shot generation (reference engine/wan/holocine.py):
    ALL shots denoise together in one latent sequence. The prompt follows the
    reference structure ``[global caption] G [per shot caption] S1 [shot cut]
    S2 …`` (prepare_multishot_inputs, holocine.py:18-78); each caption part is
    encoded separately and concatenated with recorded token spans
    (encode_prompt, holocine.py:327-430); a cross-attention bias routes every
    video token to its own shot's span + the global span (+UMT5 padding), and
    per-shot learned embeddings tag the tokens (wan.holocine transformer).
    Chained per-shot generation remains available via wan/svi."""

    def prepare_multishot_inputs(self, global_caption: str,
                                 shot_captions: List[str],
                                 num_frames: int,
                                 custom_shot_cut_frames: Optional[List[int]] = None):
        num_shots = len(shot_captions)
        if "This scene contains" not in global_caption:
            global_caption = (global_caption.strip()
                              + f" This scene contains {num_shots} shots.")
        prompt = (f"[global caption] {global_caption} [per shot caption] "
                  + " [shot cut] ".join(shot_captions))
        if custom_shot_cut_frames:
            cuts = sorted({int(f) for f in custom_shot_cut_frames})
        else:
            step = num_frames / num_shots
            cuts = [round(i * step) for i in range(1, num_shots)]
        cuts = [f for f in cuts if 0 < f < num_frames]
        return prompt, cuts

    def _shot_indices(self, shot_cut_frames: List[int], num_frames: int,
                      t_scale: int = 4) -> np.ndarray:
        """Per-latent-frame shot ids (holocine.py:80-103)."""
        lat_f = (num_frames - 1) // t_scale + 1
        cuts = [0]
        for f in sorted(shot_cut_frames):
            if f > 0:
                li = (f - 1) // t_scale + 1
                if li < lat_f:
                    cuts.append(li)
        cuts = sorted(set(cuts)) + [lat_f]
        ids = np.zeros(lat_f, np.int64)
        for i in range(len(cuts) - 1):
            ids[cuts[i]:cuts[i + 1]] = i
        return ids

    def _encode_segmented(self, prompt: str, max_len: int = 512):
        """Encode [global]/[per shot] parts separately; concat real tokens and
        record spans (holocine.py encode_prompt)."""
        import re

        gm = re.search(r"\[global caption\]", prompt)
        pm = re.search(r"\[per shot caption\]", prompt)
        if gm is None:
            return self.encode_prompt(prompt, max_len), None
        parts = []
        gtext = prompt[gm.start():(pm.start() if pm else len(prompt))]
        gtext = gtext.replace("[global caption]", "").strip()
        parts.append(("global", gtext))
        if pm:
            body = prompt[pm.start():].replace("[per shot caption]", "", 1)
            for i, shot in enumerate(body.split("[shot cut]")):
                parts.append((i, shot.strip()))
        embs, positions = [], {"global": None, "shots": []}
        cur = 0
        for pid, text in parts:
            hidden, mask = self.text_encoder.encode(
                [text], max_sequence_length=max_len, use_chat_template=False)
            n = int(np.asarray(mask).sum())
            emb = np.asarray(hidden, np.float32)[0, :n]
            span = (cur, cur + n - 1)
            if pid == "global":
                positions["global"] = span
            else:
                positions["shots"].append(span)
            embs.append(emb)
            cur += n
        full = np.concatenate(embs, axis=0)[:max_len]
        ctx = np.zeros((1, max_len, full.shape[-1]), np.float32)
        ctx[0, :full.shape[0]] = full
        positions["used"] = full.shape[0]
        return jnp.asarray(ctx), positions

    def _ctx_bias(self, shot_ids_tok: np.ndarray, positions, max_len: int):
        """[1,1,S,L] additive bias: 0 where allowed, -1e4 elsewhere
        (holocine.py:204-263; UMT5 padding stays attendable)."""
        S = shot_ids_tok.shape[0]
        allow = np.zeros((S, max_len), bool)
        g0, g1 = positions["global"]
        allow[:, g0:g1 + 1] = True
        for sid, (s0, s1) in enumerate(positions["shots"]):
            allow[shot_ids_tok == sid, s0:s1 + 1] = True
        allow[:, positions["used"]:] = True  # padding
        bias = np.where(allow, 0.0, -1e4).astype(np.float32)
        return jnp.asarray(bias)[None, None]

    def run(
        self,
        prompt: Optional[str] = None,
        global_caption: Optional[str] = None,
        shots: Optional[List[str]] = None,
        shot_captions: Optional[List[str]] = None,
        shot_cut_frames: Optional[List[int]] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: int = 15,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        shot_mask_type: Optional[str] = None,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting HoloCine pipeline")
        self.load_components(return_latents)
        captions = shot_captions or shots
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        t_scale, s_scale = self.vae.cfg.temporal_scale, self.vae.cfg.spatial_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        ph = self.transformer.cfg.patch_size[-1]
        hw_tok = (lat_h // ph) * (lat_w // ph)

        if captions:
            prompt, auto_cuts = self.prepare_multishot_inputs(
                prompt or global_caption or "", list(captions), num_frames,
                shot_cut_frames)
            shot_cut_frames = shot_cut_frames or auto_cuts
        ctx, positions = self._encode_segmented(prompt or "")
        neg_ctx = self.encode_prompt(negative_prompt or "")

        shot_ids_lat = (self._shot_indices(shot_cut_frames or [], num_frames,
                                           t_scale)
                        if positions is not None else np.zeros(lat_f, np.int64))
        shot_ids_tok = np.repeat(shot_ids_lat, hw_tok)
        bias = (self._ctx_bias(shot_ids_tok, positions, ctx.shape[1])
                if positions is not None and positions.get("global") is not None
                else None)
        shot_ids = jnp.asarray(shot_ids_tok)[None]

        z_ch = getattr(self.vae.cfg, "z_dim", 16)
        x = self.get_latents((1, z_ch, lat_f, lat_h, lat_w), seed=seed)
        mask_ch = None
        if shot_mask_type is not None:
            ids = shot_ids_lat.astype(np.float32)
            if shot_mask_type == "normalized":
                ids = ids / 20.0 if shot_ids_lat.max() > 0 else ids * 0.0
            elif shot_mask_type == "alternating":
                ids = ids % 2
            mask_ch = jnp.broadcast_to(
                jnp.asarray(ids)[None, None, :, None, None],
                (1, 1, lat_f, lat_h, lat_w))

        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                   timesteps=timesteps)
        graphdef, state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        has_bias = bias is not None
        key = ("wan_holo_step", tuple(x.shape), int(ctx.shape[1]), do_cfg,
               has_bias, mask_ch is not None)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(s, x, t, cp, cn, b_, sid, mch):
                m = nnx.merge(graphdef, s)
                x_in = (jnp.concatenate([x, mch.astype(x.dtype)], axis=1)
                        if mask_ch is not None else x)
                pos = m(x_in, t, cp, ctx_bias=b_ if has_bias else None,
                        shot_ids=sid)
                if not do_cfg:
                    return pos
                neg = m(x_in, t, cn, ctx_bias=b_ if has_bias else None,
                        shot_ids=sid)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        dt = self.transformer.dtype
        cb = make_mapped_progress(progress_callback, 0.25, 0.9)
        zero_mask = (mask_ch if mask_ch is not None
                     else jnp.zeros((1, 1, 1, 1, 1), jnp.float32))
        for i, t in enumerate(np.asarray(ts, np.float64)):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(state, x.astype(dt), t_b, ctx.astype(dt), neg_ctx.astype(dt),
                    bias if has_bias else jnp.zeros((1,), jnp.float32),
                    shot_ids, zero_mask)
            out = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = out[0] if isinstance(out, tuple) else out
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "HoloCine pipeline complete")
        return frames


@register_engine("wan", "recam")
class WanRecamEngine(WanShared, _WanVaeEncodeMixin):
    """ReCamMaster: re-render a source video from a new camera trajectory
    (reference engine/wan/recam.py): noise and source latents concatenate in
    time; per-frame relative camera poses condition every block."""

    def run(
        self,
        video: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        camera: Any = "orbit",
        camera_extrinsics: Any = None,
        cam_type: Any = 1,
        height: int = 480,
        width: int = 832,
        num_frames: Optional[int] = None,
        duration: Optional[float] = None,
        fps: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting ReCam pipeline")
        self.load_components(return_latents)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        t_scale, s_scale = self.vae.cfg.temporal_scale, self.vae.cfg.spatial_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        context = self.encode_prompt(prompt or "")
        neg_context = self.encode_prompt(negative_prompt or "")

        import cv2

        from apex_studio_tpu.preprocess.base import load_frames

        frames_in = (load_frames(video) if isinstance(video, str)
                     else list(video))
        frames_in = [cv2.resize(np.asarray(fr), (width, height),
                                interpolation=cv2.INTER_AREA)
                     for fr in frames_in]
        while len(frames_in) < num_frames:
            frames_in.append(frames_in[-1])
        vid = jnp.asarray(np.stack(frames_in[:num_frames]), jnp.float32)
        vid = vid.transpose(3, 0, 1, 2)[None] / 127.5 - 1.0
        source = self.encode_video_latents(vid)

        from apex_studio_tpu.models.camera import WanRecamCameraEmbedder

        embedder = WanRecamCameraEmbedder(cam_type=cam_type,
                                          temporal_scale=t_scale)
        cam_spec = camera_extrinsics if camera_extrinsics is not None else camera
        cam = jnp.asarray(embedder(cam_spec, num_frames, cam_type))
        safe_emit_progress(progress_callback, 0.3, "Camera + source encoded")

        x = self.get_latents(
            (1, self.transformer.cfg.in_channels, lat_f, lat_h, lat_w),
            seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                   timesteps=timesteps)
        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        key = ("wan_recam_step", tuple(x.shape), context.shape[1], do_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, src, cam, t, ctx, nctx):
                m = nnx.merge(graphdef, state)
                x_in = jnp.concatenate([x, src], axis=2).astype(m.dtype)
                pos = m(x_in, t, ctx, cam_emb=cam)
                if not do_cfg:
                    return pos
                neg = m(x_in, t, nctx, cam_emb=cam)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        dt = self.transformer.dtype
        cb = make_mapped_progress(progress_callback, 0.35, 0.9)
        src_in = source.astype(dt)
        for i, t in enumerate(np.asarray(ts, np.float64)):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(tf_state, x.astype(dt), src_in, cam, t_b,
                    context.astype(dt), neg_context.astype(dt))
            v = v[:, :, :lat_f]  # only the target half advances
            out = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = out[0] if isinstance(out, tuple) else out
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "ReCam pipeline complete")
        return frames


@register_engine("wan", "ati")
class WanATIEngine(WanI2VEngine):
    """ATI ("Any Trajectory Instruction"): standard Wan i2v conditioning, but
    sparse point tracks are painted into the conditioning latent before
    denoising (reference engine/wan/ati.py patch_motion + helpers/wan/ati.py
    process_tracks)."""

    def build_condition(self, image: np.ndarray, num_frames: int, height: int, width: int):
        cond = super().build_condition(image, num_frames, height, width)
        traj = getattr(self, "_pending_trajectory", None)
        if traj is None:
            return cond
        from apex_studio_tpu.models.trajectory import patch_motion, prepare_tracks

        tracks = prepare_tracks(traj, width, height,
                                quant_multi=self._trajectory_quant_multi)
        z_dim = self.vae.cfg.z_dim
        painted = patch_motion(
            jnp.asarray(tracks), cond[0],
            vae_divide=(cond.shape[1] - z_dim, z_dim),
            frames_per_latent=self.vae.cfg.temporal_scale)
        return painted[None].astype(cond.dtype)

    def run(self, trajectory: Any = None, quant_multi: int = 8, **kwargs: Any):
        self._pending_trajectory = trajectory
        self._trajectory_quant_multi = quant_multi
        try:
            return super().run(**kwargs)
        finally:
            self._pending_trajectory = None


@register_engine("wan", "s2v")
class WanS2VEngine(WanShared, _WanVaeEncodeMixin):
    """Speech-to-video (reference engine/wan/s2v.py): chunk-autoregressive
    generation driven by Wav2Vec2 features — each 80-frame chunk denoises
    fresh latents conditioned on the reference image (RoPE t=30), a rolling
    73-frame motion buffer (negative RoPE times), per-frame injected audio
    tokens, and optionally a VAE-encoded pose video; CFG zeroes the audio."""

    motion_frames = 73
    drop_first_motion = True

    def encode_audio(self, audio: Any, sampling_rate: int, num_frames: int,
                     fps: int = 16):
        """→ ([1, L, C_a, total_frames] per-video-frame features, num_chunks)
        (s2v.py:199)."""
        from apex_studio_tpu.models.audio.wav2vec2 import interpolate_linear
        from apex_studio_tpu.utils.media import load_audio

        wav = load_audio(audio, sampling_rate)
        # Wav2Vec2FeatureExtractor: zero-mean / unit-variance normalization
        wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
        encoder = self.load_helper("audio_encoder")
        graphdef, state = nnx.split(encoder)
        key = ("s2v_w2v", wav.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(s, w):
                m = nnx.merge(graphdef, s)
                return jnp.concatenate(m(w), axis=0)  # [L+1, T, D]

            self._jit_cache[key] = fwd
        feat = fwd(state, jnp.asarray(wav)[None])
        video_rate = 30
        out_len = int(feat.shape[1] / 50.0 * video_rate)  # 50 Hz → 30 fps
        feat = np.asarray(interpolate_linear(feat, max(out_len, 1)))
        n_layers, audio_frame_num, audio_dim = feat.shape

        scale = video_rate / fps
        num_repeat = int(audio_frame_num / (num_frames * scale)) + 1
        bucket = num_repeat * num_frames
        stride = int(video_rate / fps)
        duration = bucket / fps
        total = int(np.ceil(duration * video_rate))
        times = np.linspace(0.0, duration, bucket, endpoint=False)
        idx = np.clip(np.round(times * video_rate).astype(int), 0, total - 1)
        rows = np.zeros((bucket, n_layers, audio_dim), np.float32)
        valid = idx < audio_frame_num
        rows[valid] = feat[:, np.clip(idx[valid], 0, audio_frame_num - 1)
                           ].transpose(1, 0, 2)
        return jnp.asarray(rows.transpose(1, 2, 0))[None], num_repeat

    def run(
        self,
        prompt: Optional[str] = None,
        audio: Any = None,
        image: Any = None,
        sampling_rate: int = 16000,
        negative_prompt: Optional[str] = None,
        pose_video: Any = None,
        height: int = 480,
        width: int = 832,
        num_frames_per_chunk: int = 80,
        num_inference_steps: int = 40,
        guidance_scale: float = 4.5,
        fps: int = 16,
        seed: Optional[int] = None,
        num_chunks: Optional[int] = None,
        init_first_frame: bool = False,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting s2v pipeline")
        self.load_components(return_latents=False)
        if audio is None or image is None:
            raise ValueError("s2v requires audio and a reference image")
        t_scale = self.vae.cfg.temporal_scale
        s_scale = self.vae.cfg.spatial_scale
        num_frames_per_chunk = max(
            t_scale, num_frames_per_chunk - num_frames_per_chunk % t_scale)
        height -= height % (s_scale * self.transformer.cfg.patch_size[1])
        width -= width % (s_scale * self.transformer.cfg.patch_size[2])

        context = self.encode_prompt(prompt or "")
        use_cfg = negative_prompt is not None and guidance_scale > 1.0
        neg_context = self.encode_prompt(negative_prompt) if use_cfg else context

        audio_embeds, audio_chunks = self.encode_audio(
            audio, sampling_rate, num_frames_per_chunk, fps)
        num_chunks = min(num_chunks or audio_chunks, audio_chunks)
        safe_emit_progress(progress_callback, 0.2,
                           f"Audio encoded ({num_chunks} chunks)")

        img = self.load_image_input(image)
        img_px = _frames_to_video_tensor([img], height, width)
        condition = self.encode_video_latents(img_px)  # [1, C, 1, h, w]

        motion_frames = self.motion_frames
        lat_motion = (motion_frames + 3) // t_scale
        lat_per_chunk = ((num_frames_per_chunk + 3 + motion_frames) // t_scale
                         - lat_motion)
        lat_h, lat_w = height // s_scale, width // s_scale
        z_dim = self.transformer.cfg.in_channels

        pose_chunks = None
        if pose_video is not None:
            from apex_studio_tpu.preprocess.base import load_frames

            frames = (load_frames(pose_video)
                      if isinstance(pose_video, (str, bytes)) else list(pose_video))
            need = num_chunks * num_frames_per_chunk
            while len(frames) < need:
                frames = frames + frames[::-1]  # reverse-pad (s2v.py:33)
            pose_px = _frames_to_video_tensor(frames[:need], height, width)
            pose_chunks = []
            for r in range(num_chunks):
                seg = pose_px[:, :, r * num_frames_per_chunk:
                              (r + 1) * num_frames_per_chunk]
                seg = jnp.concatenate([seg[:, :, :1], seg], axis=2)
                pose_chunks.append(self.encode_video_latents(seg)[:, :, 1:])

        motion_px = jnp.zeros((1, 3, motion_frames, height, width), jnp.float32)
        drop_first = self.drop_first_motion
        if init_first_frame:
            drop_first = False
            motion_px = motion_px.at[:, :, -6:].set(
                jnp.repeat(img_px, 6, axis=2))
        motion_latents = self.encode_video_latents(motion_px)
        last_pixels = motion_px

        graphdef, tf_state = nnx.split(self.transformer)
        videos = []
        cb = make_mapped_progress(progress_callback, 0.25, 0.95)
        for r in range(num_chunks):
            chunk_cb = make_mapped_progress(cb, r / num_chunks, (r + 1) / num_chunks)
            x = self.get_latents((1, z_dim, lat_per_chunk, lat_h, lat_w),
                                 seed=None if seed is None else seed + r)
            a_slice = audio_embeds[..., r * num_frames_per_chunk:
                                   (r + 1) * num_frames_per_chunk]
            pose_lat = (pose_chunks[r] if pose_chunks is not None
                        else jnp.zeros((1, z_dim, lat_per_chunk, lat_h, lat_w)))
            drop_motion = drop_first and r == 0

            key = ("s2v_step", tuple(x.shape), int(context.shape[1]),
                   drop_motion, use_cfg)
            fwd = self._jit_cache.get(key)
            if fwd is None:

                @jax.jit
                def fwd(state, x, t, ctx, nctx, mot, aud, cond, pose):
                    m = nnx.merge(graphdef, state)
                    kw = dict(motion_latents=mot.astype(m.dtype),
                              image_latents=cond.astype(m.dtype),
                              pose_latents=pose.astype(m.dtype),
                              motion_frames=(motion_frames, lat_motion),
                              drop_motion_frames=drop_motion)
                    pos = m(x.astype(m.dtype), t, ctx, audio_embeds=aud, **kw)
                    if not use_cfg:
                        return pos
                    neg = m(x.astype(m.dtype), t, nctx,
                            audio_embeds=aud * 0.0, **kw)
                    return neg + guidance_scale * (pos - neg)

                self._jit_cache[key] = fwd
            ts, _ = self.get_timesteps(self.scheduler, num_inference_steps)
            for i, tstep in enumerate(ts):
                t_b = jnp.full((1,), float(tstep), jnp.float32)
                v = fwd(tf_state, x, t_b, context, neg_context, motion_latents,
                        a_slice, condition, pose_lat)
                (x,) = self.scheduler.step(v.astype(jnp.float32), float(tstep), x)
                safe_emit_progress(chunk_cb, 0.1 + 0.7 * (i + 1) / len(ts),
                                   f"chunk {r + 1}/{num_chunks} "
                                   f"step {i + 1}/{len(ts)}")

            if not drop_motion:
                decode_lat = jnp.concatenate([motion_latents, x], axis=2)
            else:
                decode_lat = jnp.concatenate([condition, x], axis=2)
            graphdef_v, vstate = nnx.split(self.vae)
            dkey = ("s2v_decode", tuple(decode_lat.shape))
            dec = self._jit_cache.get(dkey)
            if dec is None:

                @jax.jit
                def dec(s, z):
                    return nnx.merge(graphdef_v, s).decode(z)

                self._jit_cache[dkey] = dec
            video = dec(vstate, decode_lat.astype(jnp.float32))
            video = video[:, :, -num_frames_per_chunk:]
            if drop_motion:
                video = video[:, :, 3:]
            n_overlap = min(motion_frames, video.shape[2])
            last_pixels = jnp.concatenate(
                [last_pixels[:, :, n_overlap:], video[:, :, -n_overlap:]], axis=2)
            motion_latents = self.encode_video_latents(last_pixels)
            videos.append(np.asarray(video))
            safe_emit_progress(chunk_cb, 1.0, f"chunk {r + 1}/{num_chunks} done")

        full = np.concatenate(videos, axis=2)
        b, c, t, h, w = full.shape
        frames = self.tensor_to_frames(
            jnp.asarray(full).transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w))
        safe_emit_progress(progress_callback, 1.0, "Completed s2v pipeline")
        return frames


def match_and_blend_colors(video: np.ndarray, reference: np.ndarray,
                           strength: float) -> np.ndarray:
    """Per-channel mean/std color match of [B,3,T,H,W] video to a reference
    frame, blended by ``strength`` (reference utils/models/wan
    match_and_blend_colors)."""
    if strength <= 0.0:
        return video
    v_mean = video.mean(axis=(0, 2, 3, 4), keepdims=True)
    v_std = video.std(axis=(0, 2, 3, 4), keepdims=True) + 1e-6
    r_mean = reference.mean(axis=(0, 2, 3, 4), keepdims=True)
    r_std = reference.std(axis=(0, 2, 3, 4), keepdims=True) + 1e-6
    matched = (video - v_mean) / v_std * r_std + r_mean
    out = video * (1.0 - strength) + matched * strength
    return np.clip(out, -1.0, 1.0)


@register_engine("wan", "ovi")
class WanOviEngine(WanShared):
    """Ovi joint video+audio generation (reference engine/wan/ovi.py): two
    fused wan backbones denoise video and audio latents together; separate
    text contexts and guidance scales per modality (pos/video-neg/audio-neg
    prompts, ovi.py:277); audio decodes through the MMAudio VAE + BigVGAN
    (manifest component ``audio_vae`` base mmaudio). i2v pins the first video
    latent frame each step (first_frame_is_clean, ovi.py:520)."""

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: str = "",
        audio_negative_prompt: str = "",
        image: Optional[Any] = None,
        height: int = 512,
        width: int = 512,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: int = 24,
        num_inference_steps: int = 50,
        guidance_scale: float = 4.0,
        audio_guidance_scale: float = 4.0,
        slg_layer: Optional[int] = None,
        seed: Optional[int] = None,
        shift: Optional[float] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting Ovi A/V pipeline")
        for ctype in ("text_encoder", "transformer", "scheduler"):
            if getattr(self, ctype, None) is None:
                self.load_component_by_type(ctype)
        if self.vae is None:
            self.load_component_by_type("vae")
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        t_scale, s_scale = self.vae.cfg.temporal_scale, self.vae.cfg.spatial_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        audio_len = max(1, int((157 / 120) * num_frames))  # ovi.py:196

        ctx_pos = self.encode_prompt(prompt or "")
        ctx_vneg = self.encode_prompt(negative_prompt or "")
        ctx_aneg = self.encode_prompt(audio_negative_prompt or "")

        m = self.transformer
        v_ch = m.video_model.cfg.in_dim
        a_ch = m.audio_model.cfg.in_dim
        vid = self.get_latents((1, v_ch, lat_f, lat_h, lat_w), seed=seed)
        aud = self.get_latents((1, a_ch, audio_len),
                               seed=None if seed is None else seed + 1)
        aud = aud.transpose(0, 2, 1)  # [1, L, C]

        img_lat = None
        if image is not None:
            import cv2

            arr = cv2.resize(self.load_image_input(image), (width, height),
                             interpolation=cv2.INTER_LANCZOS4)
            px = (arr.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
            img_lat = self.encode_video_latents(px[None, :, None]).astype(jnp.float32)

        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps, shift=shift)
        sigmas = np.asarray(self.scheduler.sigmas, np.float64)

        graphdef, state = nnx.split(m)
        key = ("ovi_step", tuple(vid.shape), audio_len, int(ctx_pos.shape[1]),
               img_lat is not None, slg_layer)
        step = self._jit_cache.get(key)
        if step is None:
            is_i2v = img_lat is not None

            @jax.jit
            def step(s, v, a, t, cp, cvn, can, gv, ga, dt, il):
                mm = nnx.merge(graphdef, s)
                if is_i2v:
                    v = v.at[:, :, :1].set(il)
                pv, pa = mm(v.astype(mm.video_model.patch_embedding.dtype),
                            a.astype(mm.video_model.patch_embedding.dtype),
                            t, cp, cp, first_frame_is_clean=is_i2v)
                nv, na = mm(v.astype(mm.video_model.patch_embedding.dtype),
                            a.astype(mm.video_model.patch_embedding.dtype),
                            t, cvn, can, first_frame_is_clean=is_i2v,
                            slg_layer=slg_layer)
                gv_ = nv + gv * (pv - nv)
                ga_ = na + ga * (pa - na)
                v = v + dt * gv_.astype(jnp.float32)
                a = a + dt * ga_.astype(jnp.float32)
                if is_i2v:
                    v = v.at[:, :, :1].set(il)
                return v, a

            self._jit_cache[key] = step

        cb = make_mapped_progress(progress_callback, 0.2, 0.85)
        zeros_il = (img_lat if img_lat is not None
                    else jnp.zeros((1, v_ch, 1, lat_h, lat_w), jnp.float32))
        for i, t in enumerate(np.asarray(ts, np.float64)):
            t_b = jnp.full((1,), float(t), jnp.float32)
            dt = jnp.float32(float(sigmas[i + 1] - sigmas[i]))
            vid, aud = step(state, vid, aud, t_b,
                            ctx_pos.astype(jnp.float32),
                            ctx_vneg.astype(jnp.float32),
                            ctx_aneg.astype(jnp.float32),
                            jnp.float32(guidance_scale),
                            jnp.float32(audio_guidance_scale), dt, zeros_il)
            safe_emit_progress(cb, (i + 1) / len(ts), f"A/V step {i + 1}/{len(ts)}")

        audio_latents = aud.transpose(0, 2, 1)  # [1, C, L]
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return vid, audio_latents

        frames = self.decode_latents(vid)
        waveform = None
        spec = self.component_specs.get("audio_vae")
        if spec is not None:
            from apex_studio_tpu.models.registry import vae_registry

            if "audio_vae" not in self.helpers:
                self.helpers["audio_vae"] = self._instantiate_family(
                    vae_registry, spec, "mmaudio_vae")
            avae = self.helpers["audio_vae"]
            gd, st = nnx.split(avae)
            wav = jax.jit(lambda s, z: nnx.merge(gd, s).decode(z))(
                st, audio_latents.astype(jnp.float32))
            waveform = np.asarray(wav)[0]
        safe_emit_progress(progress_callback, 1.0, "Ovi pipeline complete")
        if waveform is not None:
            return frames, waveform, int(getattr(
                self.helpers["audio_vae"].cfg, "sample_rate", 16000))
        return frames


@register_engine("wan", "multitalk")
class WanMultiTalkEngine(WanShared, _WanVaeEncodeMixin):
    """Multi-person audio-driven i2v (reference engine/wan/multitalk.py):
    clip-autoregressive generation where each 81-frame clip carries i2v-style
    mask+latent conditioning on the first frame (or the previous clip's
    motion frames, re-noised to the current timestep every step), per-frame
    windowed wav2vec audio tokens, speaker reference masks for L-RoPE
    routing, and 3-branch text+audio CFG."""

    def encode_person_audio(self, audio: Any, sampling_rate: int, fps: int):
        """→ [F_pix, blocks, C] per-pixel-frame stacked wav2vec layers."""
        from apex_studio_tpu.utils.media import load_audio

        wav = load_audio(audio, sampling_rate)
        wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
        video_length = max(int(len(wav) / sampling_rate * fps), 1)
        encoder = self.load_helper("audio_encoder")
        graphdef, state = nnx.split(encoder)
        key = ("mt_w2v", wav.shape, video_length)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(s, w):
                m = nnx.merge(graphdef, s)
                states = m(w, seq_len=video_length)
                return jnp.stack(states[1:], axis=0)  # [blocks, F, C]

            self._jit_cache[key] = fwd
        emb = fwd(state, jnp.asarray(wav)[None])[:, 0]
        return jnp.transpose(emb, (1, 0, 2))  # [F, blocks, C]

    @staticmethod
    def human_masks(human_num: int, height: int, width: int,
                    face_scale: float = 0.05) -> np.ndarray:
        """Default speaker layout masks (helpers/wan/multitalk.py:373):
        one speaker → full frame; two → left/right halves + background."""
        if human_num == 1:
            m = np.ones((height, width), np.float32)
            return np.stack([m, np.ones_like(m), np.ones_like(m)])
        x0, x1 = int(height * face_scale), int(height * (1 - face_scale))
        half = width // 2
        m1 = np.zeros((height, width), np.float32)
        m1[x0:x1, int(half * face_scale):int(half * (1 - face_scale))] = 1
        m2 = np.zeros((height, width), np.float32)
        m2[x0:x1, int(half * face_scale) + half:int(half * (1 - face_scale)) + half] = 1
        bg = ((m1 + m2) == 0).astype(np.float32)
        return np.stack([m1, m2, bg])

    def run(
        self,
        prompt: Optional[str] = None,
        image: Any = None,
        audio: Any = None,
        person_1_audio: Any = None,
        person_2_audio: Any = None,
        audio_type: str = "para",
        negative_prompt: Optional[str] = None,
        sampling_rate: int = 16000,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        max_num_frames: int = 1000,
        motion_frames: int = 25,
        num_inference_steps: int = 40,
        guidance_scale: float = 5.0,
        audio_guidance_scale: float = 4.0,
        fps: int = 25,
        seed: Optional[int] = None,
        face_scale: float = 0.05,
        color_correction_strength: float = 1.0,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting multitalk pipeline")
        self.load_components(return_latents=False)
        if image is None:
            raise ValueError("multitalk requires a conditioning image")
        if person_1_audio is None and audio is not None:
            person_1_audio = audio
        speakers = [a for a in (person_1_audio, person_2_audio) if a is not None]
        if not speakers:
            raise ValueError("multitalk requires at least one speaker audio")
        human_num = len(speakers)

        t_scale = self.vae.cfg.temporal_scale
        s_scale = self.vae.cfg.spatial_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        height -= height % (s_scale * 2)
        width -= width % (s_scale * 2)

        context = self.encode_prompt(prompt or "")
        use_cfg = guidance_scale > 1.0 and negative_prompt is not None
        neg_context = (self.encode_prompt(negative_prompt)
                       if use_cfg else context)

        full_audio = [np.asarray(self.encode_person_audio(a, sampling_rate, fps))
                      for a in speakers]
        if human_num == 2 and audio_type == "add":
            # both speakers hear the summed track (multitalk.py audio_type)
            summed = full_audio[0][:min(len(full_audio[0]), len(full_audio[1]))] \
                + full_audio[1][:min(len(full_audio[0]), len(full_audio[1]))]
            full_audio = [summed, summed]
        total_frames = min(max_num_frames, min(len(a) for a in full_audio))
        safe_emit_progress(progress_callback, 0.15, "Audio encoded")

        img = self.load_image_input(image)
        has_image_branch = self.transformer.cfg.image_dim is not None
        clip_feats = None
        if has_image_branch:
            clip_feats = WanI2VEngine.encode_image_clip(self, img)
        cond_px = _frames_to_video_tensor([img], height, width)
        ref_px = np.asarray(cond_px)

        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        masks_px = self.human_masks(human_num, height, width, face_scale)
        import cv2

        token_masks = np.stack([
            cv2.resize(m, (lat_w // 2, lat_h // 2),
                       interpolation=cv2.INTER_NEAREST) for m in masks_px])
        ref_masks = jnp.asarray((token_masks > 0).reshape(len(token_masks), -1)
                                .astype(np.float32))

        window = self.transformer.cfg.audio_window
        offsets = np.arange(window) - window // 2
        z_dim = self.vae.cfg.z_dim

        graphdef, tf_state = nnx.split(self.transformer)
        all_frames: List[np.ndarray] = []
        audio_start = 0
        clip_len = num_frames
        cur_motion = 1
        cond_source = cond_px
        clip_idx = 0
        cb = make_mapped_progress(progress_callback, 0.2, 0.95)
        while True:
            clip_idx += 1
            # windowed audio per speaker for this clip
            centers = np.arange(audio_start, audio_start + clip_len)
            idx = np.clip(centers[:, None] + offsets[None, :], 0,
                          total_frames - 1)
            audio_embs = jnp.asarray(
                np.stack([a[idx] for a in full_audio]))  # [H, F, W, blocks, C]

            # i2v conditioning: motion pixels + zeros, mask on motion span
            pad = jnp.zeros((1, 3, num_frames - cond_source.shape[2],
                             height, width))
            video_cond = jnp.concatenate([cond_source, pad], axis=2)
            latent_cond = self.encode_video_latents(video_cond)
            mask = np.zeros((1, 1, num_frames, lat_h, lat_w), np.float32)
            mask[:, :, :cur_motion] = 1.0
            first_rep = np.repeat(mask[:, :, :1], t_scale, axis=2)
            mask = np.concatenate([first_rep, mask[:, :, 1:]], axis=2)
            mask = mask.reshape(1, lat_t, t_scale, lat_h, lat_w
                                ).transpose(0, 2, 1, 3, 4)
            condition = jnp.concatenate([jnp.asarray(mask), latent_cond], axis=1)
            cur_motion_lat = 1 + (cur_motion - 1) // t_scale
            motion_lat = latent_cond[:, :, :cur_motion_lat]

            x = self.get_latents((1, z_dim, lat_t, lat_h, lat_w),
                                 seed=None if seed is None else seed + clip_idx)
            ts, _ = self.get_timesteps(self.scheduler, num_inference_steps)

            key = ("mt_step", tuple(x.shape), int(context.shape[1]),
                   human_num, use_cfg)
            fwd = self._jit_cache.get(key)
            if fwd is None:

                @jax.jit
                def fwd(state, x_in, t, ctx, nctx, clip_f, aud, masks_):
                    m = nnx.merge(graphdef, state)
                    xd = x_in.astype(m.dtype)
                    pos = m(xd, t, ctx, clip_f, aud, ref_target_masks=masks_)
                    if use_cfg:
                        drop_text = m(xd, t, nctx, clip_f, aud,
                                      ref_target_masks=masks_)
                        uncond = m(xd, t, nctx, clip_f, aud * 0.0,
                                   ref_target_masks=masks_)
                        return (uncond
                                + guidance_scale * (pos - drop_text)
                                + audio_guidance_scale * (drop_text - uncond))
                    drop_audio = m(xd, t, ctx, clip_f, aud * 0.0,
                                   ref_target_masks=masks_)
                    return drop_audio + audio_guidance_scale * (pos - drop_audio)

                self._jit_cache[key] = fwd
            clip_cb = make_mapped_progress(
                cb, min(audio_start / max(total_frames, 1), 1.0),
                min((audio_start + clip_len) / max(total_frames, 1), 1.0))
            is_first = clip_idx == 1
            rng = np.random.default_rng(0 if seed is None else seed + 7 * clip_idx)
            motion_noise = jnp.asarray(
                rng.standard_normal(np.asarray(motion_lat).shape), jnp.float32)
            for i, tstep in enumerate(ts):
                if not is_first:
                    noised = self.scheduler.add_noise(
                        motion_lat, motion_noise, float(tstep))
                    x = x.at[:, :, :cur_motion_lat].set(noised)
                x_in = jnp.concatenate([x, condition], axis=1)
                t_b = jnp.full((1,), float(tstep), jnp.float32)
                v = fwd(tf_state, x_in, t_b, context, neg_context, clip_feats,
                        audio_embs, ref_masks)
                (x,) = self.scheduler.step(v.astype(jnp.float32), float(tstep), x)
                safe_emit_progress(clip_cb, (i + 1) / len(ts),
                                   f"clip {clip_idx} step {i + 1}/{len(ts)}")
            if not is_first:
                x = x.at[:, :, :cur_motion_lat].set(motion_lat)

            video = np.asarray(self.decode_latents_tensor(x))
            if color_correction_strength > 0.0:
                video = match_and_blend_colors(video, ref_px,
                                               color_correction_strength)
            new = video if is_first else video[:, :, cur_motion:]
            all_frames.append(new)

            audio_start += num_frames - motion_frames if not is_first else \
                num_frames - motion_frames
            if audio_start + clip_len >= total_frames or \
                    total_frames <= num_frames:
                break
            cur_motion = min(motion_frames, video.shape[2])
            cond_source = jnp.asarray(video[:, :, -cur_motion:])

        full = np.concatenate(all_frames, axis=2)[:, :, :total_frames]
        b, c, t, h, w = full.shape
        frames = self.tensor_to_frames(
            jnp.asarray(full).transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w))
        safe_emit_progress(progress_callback, 1.0, "Completed multitalk pipeline")
        return frames

    def decode_latents_tensor(self, x: jnp.ndarray) -> jnp.ndarray:
        graphdef_v, vstate = nnx.split(self.vae)
        key = ("mt_decode", tuple(x.shape))
        dec = self._jit_cache.get(key)
        if dec is None:

            @jax.jit
            def dec(s, z):
                return nnx.merge(graphdef_v, s).decode(z)

            self._jit_cache[key] = dec
        return dec(vstate, x.astype(jnp.float32))


@register_engine("wan", "animate")
class WanAnimateEngine(WanShared, _WanVaeEncodeMixin):
    """Character animation / replacement (reference engine/wan/animate.py):
    each 77-frame segment denoises latents whose slot 0 is the VAE-encoded
    reference character image; the condition channels carry [4-ch i2v mask ‖
    16-ch latents] for the reference slot and the previous segment's tail
    (or, in replace mode, the background video masked by the subject mask);
    pose latents ride the patch embedding and a face video drives the
    per-frame face adapter. Segments chain by re-conditioning on the last
    generated frame."""

    def run(
        self,
        image: Any = None,
        pose_video: Any = None,
        face_video: Any = None,
        background_video: Any = None,
        mask_video: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 720,
        width: int = 1280,
        segment_frame_length: int = 77,
        num_inference_steps: int = 20,
        mode: str = "animate",
        prev_segment_conditioning_frames: int = 1,
        guidance_scale: float = 1.0,
        seed: Optional[int] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting animate pipeline")
        self.load_components(return_latents=False)
        if image is None:
            raise ValueError("animate requires a reference character image")
        if mode == "animate" and (pose_video is None or face_video is None):
            raise ValueError("animate mode requires pose and face videos")
        if mode == "replace" and (background_video is None or mask_video is None):
            raise ValueError("replace mode requires background and mask videos")

        from apex_studio_tpu.preprocess.base import load_frames

        def frames_of(v):
            if v is None:
                return None
            if isinstance(v, (str, bytes)) or hasattr(v, "__fspath__"):
                return load_frames(v)
            return [np.asarray(f) for f in v]

        t_scale = self.vae.cfg.temporal_scale
        s_scale = self.vae.cfg.spatial_scale
        segment_frame_length = max(
            1, segment_frame_length - (segment_frame_length - 1) % t_scale)
        height -= height % (s_scale * 2)
        width -= width % (s_scale * 2)

        pose_frames = frames_of(pose_video) or []
        face_frames = frames_of(face_video) or []
        bg_frames = frames_of(background_video)
        msk_frames = frames_of(mask_video)
        cond_len = len(pose_frames) if pose_frames else len(bg_frames or [])
        eff = segment_frame_length - prev_segment_conditioning_frames
        pad = (-(cond_len - prev_segment_conditioning_frames)) % eff
        total = cond_len + pad
        num_segments = max(1, total // eff)

        def reflect_pad(frames, n):
            out, idx, flip = [], 0, False
            while len(out) < n and frames:
                out.append(frames[idx])
                idx = idx - 1 if flip else idx + 1
                if idx in (0, len(frames) - 1):
                    flip = not flip
            return out

        pose_frames = reflect_pad(pose_frames, total) if pose_frames else None
        face_frames = reflect_pad(face_frames, total) if face_frames else None
        bg_frames = reflect_pad(bg_frames, total) if bg_frames else None
        msk_frames = reflect_pad(msk_frames, total) if msk_frames else None

        context = self.encode_prompt(prompt or "")
        use_cfg = guidance_scale > 1.0 and negative_prompt is not None
        neg_context = self.encode_prompt(negative_prompt) if use_cfg else context

        img = self.load_image_input(image)
        has_img_branch = self.transformer.cfg.image_dim is not None
        clip_feats = (WanI2VEngine.encode_image_clip(self, img)
                      if has_img_branch else None)
        ref_px = _frames_to_video_tensor([img], height, width)
        ref_lat = self.encode_video_latents(ref_px)  # [1, 16, 1, h, w]
        lat_h, lat_w = ref_lat.shape[-2:]
        ref_mask = np.zeros((1, t_scale, 1, lat_h, lat_w), np.float32)
        ref_mask[:, :, 0] = 1.0
        ref_cond = jnp.concatenate([jnp.asarray(ref_mask), ref_lat], axis=1)

        lat_t = (segment_frame_length - 1) // t_scale + 1
        z_dim = self.vae.cfg.z_dim
        face_size = self.transformer.cfg.motion_encoder_size

        graphdef, tf_state = nnx.split(self.transformer)
        all_frames: List[np.ndarray] = []
        prev_tail_px = None
        cb = make_mapped_progress(progress_callback, 0.2, 0.95)
        start = 0
        for seg in range(num_segments):
            seg_cb = make_mapped_progress(cb, seg / num_segments,
                                          (seg + 1) / num_segments)
            end = start + segment_frame_length
            # previous-segment / background condition video in pixel space
            if mode == "replace":
                seg_bg = _frames_to_video_tensor(bg_frames[start:end], height, width)
                cond_video = seg_bg
                import cv2

                m = np.stack([cv2.resize(
                    cv2.cvtColor(np.asarray(f), cv2.COLOR_RGB2GRAY)
                    if np.asarray(f).ndim == 3 else np.asarray(f),
                    (lat_w, lat_h)) for f in msk_frames[start:end]])
                mask_px = (m > 127).astype(np.float32)[None, None]
            else:
                head = (prev_tail_px if prev_tail_px is not None else
                        jnp.zeros((1, 3, prev_segment_conditioning_frames,
                                   height, width)))
                zeros = jnp.zeros((1, 3, segment_frame_length - head.shape[2],
                                   height, width))
                cond_video = jnp.concatenate([head, zeros], axis=2)
                mask_px = None
            seg_lat = self.encode_video_latents(cond_video)
            mask = np.zeros((1, 1, segment_frame_length, lat_h, lat_w), np.float32)
            if mask_px is not None:
                mask[:] = mask_px
            n_mask = prev_segment_conditioning_frames if seg > 0 else 0
            mask[:, :, :n_mask] = 1.0
            first_rep = np.repeat(mask[:, :, :1], t_scale, axis=2)
            mask = np.concatenate([first_rep, mask[:, :, 1:]], axis=2)
            mask = mask.reshape(1, lat_t, t_scale, lat_h, lat_w
                                ).transpose(0, 2, 1, 3, 4)
            seg_cond = jnp.concatenate([jnp.asarray(mask), seg_lat], axis=1)
            condition = jnp.concatenate([ref_cond, seg_cond], axis=2)

            pose_lat = None
            if pose_frames is not None:
                pose_px = _frames_to_video_tensor(pose_frames[start:end],
                                                  height, width)
                pose_lat = self.encode_video_latents(pose_px)
            face_px = None
            if face_frames is not None:
                import cv2

                seg_faces = face_frames[start:end]
                # the causal stride-4 face encoder maps 4·lat_t−3 frames to
                # exactly lat_t motion frames (77 → 20 for the real config)
                need = 4 * lat_t - 3
                idx_f = np.clip(np.round(np.linspace(0, len(seg_faces) - 1,
                                                     need)).astype(int),
                                0, len(seg_faces) - 1)
                faces = np.stack([cv2.resize(np.asarray(seg_faces[i]),
                                             (face_size, face_size))
                                  for i in idx_f])
                face_px = jnp.asarray(
                    faces.astype(np.float32) / 127.5 - 1.0
                ).transpose(3, 0, 1, 2)[None]

            x = self.get_latents((1, z_dim, lat_t + 1, lat_h, lat_w),
                                 seed=None if seed is None else seed + seg)
            key = ("animate_step", tuple(x.shape), int(context.shape[1]),
                   face_px is not None, pose_lat is not None, use_cfg)
            fwd = self._jit_cache.get(key)
            if fwd is None:

                @jax.jit
                def fwd(state, x_in, t, ctx, nctx, clip_f, pose, face):
                    m = nnx.merge(graphdef, state)
                    pos = m(x_in.astype(m.dtype), t, ctx, clip_f, pose, face)
                    if not use_cfg:
                        return pos
                    neg = m(x_in.astype(m.dtype), t, nctx, clip_f, pose, face)
                    return neg + guidance_scale * (pos - neg)

                self._jit_cache[key] = fwd
            ts, _ = self.get_timesteps(self.scheduler, num_inference_steps)
            for i, tstep in enumerate(ts):
                x_in = jnp.concatenate([x, condition], axis=1)
                t_b = jnp.full((1,), float(tstep), jnp.float32)
                v = fwd(tf_state, x_in, t_b, context, neg_context, clip_feats,
                        pose_lat, face_px)
                (x,) = self.scheduler.step(v.astype(jnp.float32), float(tstep), x)
                safe_emit_progress(seg_cb, (i + 1) / len(ts),
                                   f"segment {seg + 1}/{num_segments} "
                                   f"step {i + 1}/{len(ts)}")

            graphdef_v, vstate = nnx.split(self.vae)
            dkey = ("animate_decode", (1, z_dim, lat_t, lat_h, lat_w))
            dec = self._jit_cache.get(dkey)
            if dec is None:

                @jax.jit
                def dec(s, z):
                    return nnx.merge(graphdef_v, s).decode(z)

                self._jit_cache[dkey] = dec
            video = dec(vstate, x[:, :, 1:].astype(jnp.float32))
            prev_tail_px = video[:, :, -prev_segment_conditioning_frames:]
            out = (np.asarray(video) if seg == 0
                   else np.asarray(video[:, :, prev_segment_conditioning_frames:]))
            all_frames.append(out)
            start += eff

        full = np.concatenate(all_frames, axis=2)[:, :, :cond_len]
        b, c, t, h, w = full.shape
        frames = self.tensor_to_frames(
            jnp.asarray(full).transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w))
        safe_emit_progress(progress_callback, 1.0, "Completed animate pipeline")
        return frames


@register_engine("wan", "fun_vace")
class WanFunVaceEngine(WanVaceEngine):
    """Fun-VACE (reference engine/wan/fun_vace.py): the VACE conditioning
    pipeline driven by Fun-style inputs — start/end keyframe images become a
    sparse control video with an i2v-style inpaint mask (fun_vace.py:588
    get_image_to_video_latent), a control video or subject reference images
    ride the standard VACE channels, and Wan 2.2 A14B's high/low-noise
    transformer pair switches at ``boundary_ratio`` (default 0.875)."""

    def run(
        self,
        start_image: Any = None,
        end_image: Any = None,
        control_video: Any = None,
        subject_ref_images: Any = None,
        video: Any = None,
        mask_video: Any = None,
        num_frames: Optional[int] = None,
        duration: Optional[float] = None,
        fps: int = 16,
        height: int = 480,
        width: int = 832,
        boundary_ratio: Optional[float] = None,
        high_noise_guidance_scale: Optional[float] = None,
        low_noise_guidance_scale: Optional[float] = None,
        guidance_scale: float = 6.0,
        **kwargs: Any,
    ):
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        t_scale = 4 if self.vae is None else self.vae.cfg.temporal_scale
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)

        if video is None and control_video is not None:
            video, mask_video = control_video, None
        elif video is None and (start_image is not None or end_image is not None):
            # sparse keyframe video + inpaint mask (known frames unmasked)
            import cv2

            def px(im):
                arr = self.load_image_input(im)
                return cv2.resize(arr, (width, height),
                                  interpolation=cv2.INTER_AREA)

            blank = np.zeros((height, width, 3), np.uint8)
            frames = [blank.copy() for _ in range(num_frames)]
            mframes = [np.full((height, width, 3), 255, np.uint8)
                       for _ in range(num_frames)]
            if start_image is not None:
                frames[0] = px(start_image)
                mframes[0][:] = 0
            if end_image is not None:
                frames[-1] = px(end_image)
                mframes[-1][:] = 0
            video, mask_video = frames, mframes

        g = guidance_scale
        if high_noise_guidance_scale is not None:
            g = high_noise_guidance_scale
        kwargs.setdefault("reference_images", subject_ref_images)
        return super().run(video=video, mask=mask_video, num_frames=num_frames,
                           fps=fps, height=height, width=width,
                           guidance_scale=g, **kwargs)


@register_engine("wan", "humo")
class WanHuMoEngine(WanShared, _WanVaeEncodeMixin):
    """HuMo: human-centric video from text + audio (+ reference images)
    (reference engine/wan/humo.py): reference latents occupy the *last*
    latent slots with an i2v-style 4-ch mask, windowed wav2vec stacks drive
    per-frame audio cross-attention, and guidance blends audio and text
    deltas — pred = a·(TIA−TI) + t·(TI−neg) + neg, with the negative branch
    switching from image-conditioned to fully-null below ``step_change``
    (humo.py:138 forward_tia / forward_ta)."""

    def audio_windows(self, emb: np.ndarray, frame_num: int, t_scale: int,
                      shift: int = 2) -> np.ndarray:
        """[F_pix, blocks, C] → [T_lat, rows, blocks, C] (humo.py:62)."""
        n_lat = 1 + (frame_num - 1) // t_scale
        n_rows = t_scale + 2 * shift
        blocks, c = emb.shape[1], emb.shape[2]
        zero = np.zeros((blocks, c), emb.dtype)

        def row(i):
            return emb[i] if 0 <= i < emb.shape[0] else zero

        wind = []
        for lt in range(n_lat):
            if lt == 0:
                rows = [zero] * (n_rows - (2 * shift + 1)) + \
                    [row(i) for i in range(-shift, shift + 1)]
            else:
                st = 1 + t_scale * (lt - 1) - shift
                rows = [row(i) for i in range(st, st + n_rows)]
            wind.append(np.stack(rows))
        return np.stack(wind)

    def encode_audio_stack(self, audio: Any, sampling_rate: int, fps: int,
                           frame_num: int) -> np.ndarray:
        """waveform → [F_pix, blocks, C] stacked wav2vec hidden states."""
        from apex_studio_tpu.utils.media import load_audio

        wav = load_audio(audio, sampling_rate)
        wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
        encoder = self.load_helper("audio_encoder")
        graphdef, state = nnx.split(encoder)
        key = ("humo_w2v", wav.shape, frame_num)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(s, w):
                m = nnx.merge(graphdef, s)
                states = m(w, seq_len=frame_num)
                return jnp.stack(states[1:], axis=0)  # [blocks, F, C]

            self._jit_cache[key] = fwd
        emb = np.asarray(fwd(state, jnp.asarray(wav)[None])[:, 0])
        return emb.transpose(1, 0, 2)

    def run(
        self,
        prompt: Optional[str] = None,
        audio: Any = None,
        image: Any = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        fps: int = 25,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale_a: float = 5.5,
        guidance_scale_t: float = 5.0,
        step_change: int = 980,
        sampling_rate: int = 16000,
        seed: Optional[int] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting HuMo pipeline")
        self.load_components(return_latents=False)
        t_scale = self.vae.cfg.temporal_scale
        s_scale = self.vae.cfg.spatial_scale
        if num_frames is None:
            num_frames = int(round((duration or 3.9) * fps)) + 1
        num_frames = max(1, t_scale * ((num_frames - 1) // t_scale) + 1)
        height -= height % (s_scale * 2)
        width -= width % (s_scale * 2)
        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        z = self.vae.cfg.z_dim

        context = self.encode_prompt(prompt or "")
        use_cfg = guidance_scale_t > 1.0 and negative_prompt is not None
        neg_context = (self.encode_prompt(negative_prompt)
                       if use_cfg else jnp.zeros_like(context))

        # reference latents (appended at the END of the latent grid)
        refs = image if isinstance(image, (list, tuple)) else \
            ([image] if image is not None else [])
        ref_lats = []
        for r in refs:
            img = self.load_image_input(r)
            px = _frames_to_video_tensor([img], height, width)
            ref_lats.append(self.encode_video_latents(px))
        tia_mode = bool(ref_lats)
        ref_lat = (jnp.concatenate(ref_lats, axis=2) if ref_lats
                   else jnp.zeros((1, z, 1, lat_h, lat_w)))
        n_ref = ref_lat.shape[2]

        # audio windows (+ zero rows for the reference slots)
        if audio is not None:
            stack = self.encode_audio_stack(audio, sampling_rate, fps, num_frames)
        else:
            cfg_t = self.transformer.cfg
            stack = np.zeros((num_frames, cfg_t.audio_blocks,
                              cfg_t.audio_channels), np.float32)
        wind = self.audio_windows(stack, num_frames, t_scale)
        wind = np.concatenate(
            [wind, np.zeros((n_ref,) + wind.shape[1:], wind.dtype)], axis=0)
        audio_w = jnp.asarray(wind)[None]
        audio_zero = jnp.zeros_like(audio_w)
        safe_emit_progress(progress_callback, 0.2, "Audio encoded")

        # conditioning y: mask flags the trailing reference slots
        zero_px = jnp.zeros((1, 3, num_frames, height, width))
        zero_vae = self.encode_video_latents(zero_px)
        mask = np.zeros((1, t_scale, lat_t, lat_h, lat_w), np.float32)
        mask[:, :, lat_t - n_ref:] = 1.0
        y_c = jnp.concatenate(
            [zero_vae[:, :, :lat_t - n_ref], ref_lat.astype(jnp.float32)], axis=2)
        y_c = jnp.concatenate([jnp.asarray(mask), y_c], axis=1)
        y_null = jnp.concatenate(
            [jnp.asarray(mask), zero_vae[:, :, :lat_t]], axis=1)

        x = self.get_latents((1, z, lat_t, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps)

        graphdef, tf_state = nnx.split(self.transformer)
        key = ("humo_step", tuple(x.shape), int(context.shape[1]), tia_mode,
               use_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x_in, t, ctx, nctx, aud, azero, yc, ynull, hi):
                m = nnx.merge(graphdef, state)
                xd = x_in.astype(m.dtype)
                if tia_mode:
                    tia = m(xd, t, ctx, aud, yc)
                    ti = m(xd, t, ctx, azero, yc)
                    if not use_cfg:
                        neg = ti
                    else:
                        neg_hi = m(xd, t, nctx, azero, yc)
                        neg_lo = m(xd, t, nctx, azero, ynull)
                        neg = jnp.where(hi, neg_hi, neg_lo)
                    t_sc = jnp.where(hi | (not use_cfg), guidance_scale_t,
                                     guidance_scale_t - 2.0)
                    return (guidance_scale_a * (tia - ti)
                            + t_sc * (ti - neg) + neg)
                ta = m(xd, t, ctx, aud, ynull)
                t_only = m(xd, t, ctx, azero, ynull)
                neg = (m(xd, t, nctx, azero, ynull) if use_cfg else t_only)
                return (guidance_scale_a * (ta - t_only)
                        + guidance_scale_t * (t_only - neg) + neg)

            self._jit_cache[key] = fwd
        cb = make_mapped_progress(progress_callback, 0.25, 0.9)
        for i, tstep in enumerate(ts):
            t_b = jnp.full((1,), float(tstep), jnp.float32)
            hi = jnp.asarray(float(tstep) > step_change)
            v = fwd(tf_state, x, t_b, context, neg_context, audio_w,
                    audio_zero, y_c, y_null, hi)
            (x,) = self.scheduler.step(v.astype(jnp.float32), float(tstep), x)
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        video_lat = x[:, :, :lat_t - n_ref] if tia_mode else x
        if return_latents:
            return video_lat
        frames = self.decode_latents(video_lat)
        safe_emit_progress(progress_callback, 1.0, "HuMo pipeline complete")
        return frames


@register_engine("wan", "lynx", "lynx_lite")
class WanLynxEngine(WanShared):
    """Face-ID personalized t2v (reference engine/wan/lynx.py): ArcFace
    identity embeddings are resampled into IP tokens that every block's
    cross-attention also attends to (scaled by ``ip_scale``). Accepts
    precomputed ``face_embeds`` (the ArcFace aligner is a host-side helper in
    the reference, helpers/wan/lynx.py:179) or raw identity token embeds."""

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        face_embeds: Any = None,
        face_token_embeds: Any = None,
        ip_scale: float = 1.0,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        fps: int = 16,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting Lynx pipeline")
        self.load_components(return_latents)
        t_scale = self.vae.cfg.temporal_scale
        s_scale = self.vae.cfg.spatial_scale
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        height -= height % (s_scale * 2)
        width -= width % (s_scale * 2)
        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        context = self.encode_prompt(prompt or "")
        use_cfg = guidance_scale > 1.0
        neg_context = self.encode_prompt(negative_prompt or "") if use_cfg \
            else context

        ip_tokens = None
        if face_token_embeds is not None:
            ip_tokens = jnp.asarray(np.asarray(face_token_embeds, np.float32))
            if ip_tokens.ndim == 2:
                ip_tokens = ip_tokens[None]
        elif face_embeds is not None:
            embeds = np.asarray(face_embeds, np.float32)
            if embeds.ndim == 1:
                embeds = embeds[None]
            resampler = self.load_helper("resampler")
            graphdef, state = nnx.split(resampler)
            key = ("lynx_resample", embeds.shape)
            fwd = self._jit_cache.get(key)
            if fwd is None:

                @jax.jit
                def fwd(s, e):
                    return nnx.merge(graphdef, s)(e)

                self._jit_cache[key] = fwd
            ip_tokens = fwd(state, jnp.asarray(embeds)[None])
        safe_emit_progress(progress_callback, 0.2, "Identity tokens ready")

        z = self.transformer.cfg.in_channels
        x = self.get_latents((1, z, lat_t, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps)

        graphdef, tf_state = nnx.split(self.transformer)
        key = ("lynx_step", tuple(x.shape), int(context.shape[1]),
               ip_tokens is not None, float(ip_scale), use_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, t, ctx, nctx, ip):
                m = nnx.merge(graphdef, state)
                xd = x.astype(m.dtype)
                pos = m(xd, t, ctx, ip_tokens=ip, ip_scale=ip_scale)
                if not use_cfg:
                    return pos
                neg = m(xd, t, nctx, ip_tokens=ip, ip_scale=ip_scale)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        cb = make_mapped_progress(progress_callback, 0.25, 0.9)
        for i, tstep in enumerate(ts):
            t_b = jnp.full((1,), float(tstep), jnp.float32)
            v = fwd(tf_state, x, t_b, context, neg_context, ip_tokens)
            (x,) = self.scheduler.step(v.astype(jnp.float32), float(tstep), x)
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Lynx pipeline complete")
        return frames


@register_engine("wan", "scail")
class WanScailEngine(WanShared, _WanVaeEncodeMixin):
    """SCAIL pose-driven character video (reference engine/wan/scail.py): the
    reference character image (CLIP + VAE encoded) and a rendered pose video
    (VAE-encoded at half resolution) join the noisy latents in one joint
    attention sequence; standard CFG over text."""

    def run(
        self,
        image: Any = None,
        pose_video: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        fps: int = 16,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 40,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting SCAIL pipeline")
        self.load_components(return_latents=False)
        if image is None or pose_video is None:
            raise ValueError("scail requires a reference image and a pose video")
        t_scale = self.vae.cfg.temporal_scale
        s_scale = self.vae.cfg.spatial_scale
        ph, pw = self.transformer.cfg.patch_size[1:]
        # pose runs at half resolution → pixels must divide 2·scale·patch
        height -= height % (s_scale * ph * 2)
        width -= width % (s_scale * pw * 2)

        from apex_studio_tpu.preprocess.base import load_frames

        pose_frames = (load_frames(pose_video)
                       if isinstance(pose_video, (str, bytes)) else list(pose_video))
        if num_frames is None:
            num_frames = len(pose_frames)
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        while len(pose_frames) < num_frames:
            pose_frames.append(pose_frames[-1])
        pose_frames = pose_frames[:num_frames]
        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        context = self.encode_prompt(prompt or "")
        use_cfg = guidance_scale > 1.0
        neg_context = self.encode_prompt(negative_prompt or "") if use_cfg \
            else context

        img = self.load_image_input(image)
        clip_feats = WanI2VEngine.encode_image_clip(self, img)
        ref_px = _frames_to_video_tensor([img], height, width)
        ref_lat = self.encode_video_latents(ref_px)

        pose_px = _frames_to_video_tensor(pose_frames, height // 2, width // 2)
        pose_lat = self.encode_video_latents(pose_px)
        safe_emit_progress(progress_callback, 0.25, "Conditioning encoded")

        z = self.vae.cfg.z_dim
        x = self.get_latents((1, z, lat_t, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps)

        graphdef, tf_state = nnx.split(self.transformer)
        key = ("scail_step", tuple(x.shape), int(context.shape[1]), use_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, t, ctx, nctx, pose, ref, clip_f):
                m = nnx.merge(graphdef, state)
                xd = x.astype(m.dtype)
                pos = m(xd, t, ctx, pose, ref, clip_f)
                if not use_cfg:
                    return pos
                neg = m(xd, t, nctx, pose, ref, clip_f)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        cb = make_mapped_progress(progress_callback, 0.3, 0.9)
        for i, tstep in enumerate(ts):
            t_b = jnp.full((1,), float(tstep), jnp.float32)
            v = fwd(tf_state, x, t_b, context, neg_context,
                    pose_lat.astype(jnp.float32), ref_lat.astype(jnp.float32),
                    clip_feats)
            (x,) = self.scheduler.step(v.astype(jnp.float32), float(tstep), x)
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "SCAIL pipeline complete")
        return frames


@register_engine("wan", "mova")
class WanMovaEngine(WanI2VEngine):
    """MOVA joint video+audio i2v (reference engine/wan/mova.py:12): a Wan
    video tower and a 1-D Wan audio tower denoise together, exchanging hidden
    states through the DualTowerConditionalBridge at strategy-selected layers
    (helpers/wan/mova.py:371). Video conditioning is the Wan-I2V 20-channel
    mask+first-frame-latent block (mova.py:22 prepare_latents); audio decodes
    through the continuous DAC VAE (vae/movaaudiovae/model.py:810).

    The reference interleaves towers with hand-rolled block loops around
    ``return_prepared`` (mova.py:225); here one jitted function traces both
    towers and the bridge so XLA schedules the joint step as a single
    program."""

    def _load_audio_tower(self):
        if "audio_transformer" not in self.helpers:
            from apex_studio_tpu.models.registry import transformer_registry

            spec = self.component_specs.get("audio_transformer")
            if spec is None:
                raise KeyError("mova manifest needs an 'audio_transformer'")
            self.helpers["audio_transformer"] = self._instantiate_family(
                transformer_registry, spec, "wan_mova_audio")
        if "dual_tower_bridge" not in self.helpers:
            from apex_studio_tpu.models.registry import helper_registry

            spec = self.component_specs.get("dual_tower_bridge")
            if spec is None:
                raise KeyError("mova manifest needs a 'dual_tower_bridge'")
            self.helpers["dual_tower_bridge"] = self._instantiate_family(
                helper_registry, spec, "wan_mova_bridge")
        return self.helpers["audio_transformer"], self.helpers["dual_tower_bridge"]

    def _audio_vae(self):
        if "audio_vae" not in self.helpers:
            from apex_studio_tpu.models.registry import vae_registry

            spec = self.component_specs.get("audio_vae")
            if spec is None:
                return None
            self.helpers["audio_vae"] = self._instantiate_family(
                vae_registry, spec, "dac_vae")
        return self.helpers["audio_vae"]

    def _mova_step_fn(self, video_tf, audio_tf, bridge, key_tag, shapes,
                      grid, video_fps, condition_scale):
        key = ("mova_step", key_tag, shapes)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        gd_v, _ = nnx.split(video_tf)
        gd_a, _ = nnx.split(audio_tf)
        gd_b, _ = nnx.split(bridge)
        n_video = len(video_tf.blocks)
        n_shared = min(n_video, len(audio_tf.blocks))

        @jax.jit
        def fn(sv, sa, sb, x, a, t_vec, ctx, clip_f):
            vm = nnx.merge(gd_v, sv)
            am = nnx.merge(gd_a, sa)
            bm = nnx.merge(gd_b, sb)
            xd = x.astype(vm.dtype)
            tokens, temb, temb6, ctx_v, ctx_img, rc, rs, _ = vm._prepare_cond(
                xd, t_vec, ctx, clip_f, None)
            atok, atemb, atemb6, ctx_a, arc, ars = am._prepare_cond(
                a.astype(am.dtype), t_vec, ctx)
            x_freqs = y_freqs = None
            if bm.cfg.apply_cross_rope:
                x_freqs, y_freqs = bm.build_aligned_freqs(
                    video_fps, grid, atok.shape[1])
            for i in range(n_shared):
                tokens, atok = bm(i, tokens, atok, x_freqs=x_freqs,
                                  y_freqs=y_freqs,
                                  condition_scale=condition_scale,
                                  video_grid=grid)
                tokens = vm.blocks[i](tokens, ctx_v, temb6, rc, rs,
                                      context_image=ctx_img)
                atok = am.blocks[i](atok, ctx_a, atemb6, arc, ars)
            for i in range(n_shared, n_video):
                tokens = vm.blocks[i](tokens, ctx_v, temb6, rc, rs,
                                      context_image=ctx_img)
            tt, hh, ww = grid
            pt, ph, pw = vm.cfg.patch_size
            v_out = vm._finalize(tokens, temb, False, tt * pt, hh * ph,
                                 ww * pw)
            a_out = am._finalize(atok, atemb, a.shape[-1])
            return v_out, a_out

        self._jit_cache[key] = fn
        return fn

    def run(
        self,
        image: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 360,
        width: int = 640,
        duration: Optional[float] = None,
        fps: float = 24.0,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        high_noise_guidance_scale: Optional[float] = None,
        low_noise_guidance_scale: Optional[float] = None,
        boundary_ratio: float = 0.875,
        condition_scale: float = 1.0,
        seed: Optional[int] = None,
        shift: Optional[float] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting MOVA A/V pipeline")
        self.load_components(return_latents=False)
        if image is None:
            raise ValueError("mova requires an input image")
        image = np.asarray(self.load_image_input(image))
        audio_tf, bridge = self._load_audio_tower()
        audio_vae = self._audio_vae()

        vae_cfg = self.vae.cfg
        s_scale, t_scale = vae_cfg.spatial_scale, vae_cfg.temporal_scale
        pt, ph, pw = self.transformer.cfg.patch_size
        height -= height % (s_scale * ph)
        width -= width % (s_scale * pw)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)

        context = self.encode_prompt(prompt or "")
        use_cfg = negative_prompt is not None and guidance_scale > 1.0
        neg_context = self.encode_prompt(negative_prompt or "") if use_cfg else None

        has_image_branch = self.transformer.cfg.image_dim is not None
        clip_feats = self.encode_image_clip(image) if has_image_branch else None
        condition = self.build_condition(image, num_frames, height, width)
        safe_emit_progress(progress_callback, 0.25, "Image conditioning ready")

        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        noise_c = self.transformer.cfg.in_channels - condition.shape[1]
        x = self.get_latents((1, noise_c, lat_t, lat_h, lat_w), seed=seed)

        a_ch = audio_tf.cfg.in_dim
        sample_rate = audio_vae.cfg.sample_rate if audio_vae is not None else 44100
        hop = audio_vae.cfg.hop_length if audio_vae is not None else 2048
        num_samples = int(sample_rate * num_frames / fps)
        a_t = (num_samples - 1) // hop + 1
        a = self.get_latents((1, a_ch, a_t),
                             seed=None if seed is None else seed + 1)

        ts, _ = self.get_timesteps(
            self.scheduler, num_inference_steps,
            **({"shift": shift} if shift is not None else {}))
        import copy as _copy

        audio_scheduler = _copy.deepcopy(self.scheduler)
        boundary_timestep = (
            boundary_ratio * getattr(self.scheduler, "num_train_timesteps", 1000)
            if boundary_ratio is not None else None)
        if boundary_timestep is not None and self.transformer_2 is None:
            self._load_transformer_2()
        _, sv1 = nnx.split(self.transformer)
        sv2 = (nnx.split(self.transformer_2)[1]
               if self.transformer_2 is not None else None)
        _, sa = nnx.split(audio_tf)
        _, sb = nnx.split(bridge)

        grid = (lat_t // pt, lat_h // ph, lat_w // pw)
        shapes = (tuple(x.shape), tuple(a.shape), context.shape[1])
        zeros_clip = (clip_feats if clip_feats is not None
                      else jnp.zeros((1, 1, 1), jnp.float32))
        cb = make_mapped_progress(progress_callback, 0.3, 0.9)
        for i, t in enumerate(np.asarray(ts, np.float64)):
            if (boundary_timestep is not None and float(t) < boundary_timestep
                    and sv2 is not None):
                tf, sv, tag = self.transformer_2, sv2, "low"
                g = (low_noise_guidance_scale
                     if low_noise_guidance_scale is not None else guidance_scale)
            else:
                tf, sv, tag = self.transformer, sv1, "high"
                g = (high_noise_guidance_scale
                     if high_noise_guidance_scale is not None else guidance_scale)
            fn = self._mova_step_fn(tf, audio_tf, bridge, tag, shapes, grid,
                                    float(fps), float(condition_scale))
            x_in = jnp.concatenate([x, condition], axis=1)
            t_vec = jnp.full((1,), float(t), jnp.float32)
            v, va = fn(sv, sa, sb, x_in, a, t_vec, context, zeros_clip)
            if use_cfg and g > 1.0:
                vn, van = fn(sv, sa, sb, x_in, a, t_vec, neg_context,
                             zeros_clip)
                v = vn.astype(jnp.float32) + g * (
                    v.astype(jnp.float32) - vn.astype(jnp.float32))
                va = van.astype(jnp.float32) + g * (
                    va.astype(jnp.float32) - van.astype(jnp.float32))
            (x,) = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            (a,) = audio_scheduler.step(va.astype(jnp.float32), float(t), a)
            safe_emit_progress(cb, (i + 1) / len(ts),
                               f"A/V step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x, a

        frames = self.decode_latents(x)
        if audio_vae is None:
            safe_emit_progress(progress_callback, 1.0, "MOVA complete (no audio VAE)")
            return frames
        gd_av, s_av = nnx.split(audio_vae)
        key = ("mova_audio_decode", tuple(a.shape))
        dec = self._jit_cache.get(key)
        if dec is None:

            @jax.jit
            def dec(s, z):
                return nnx.merge(gd_av, s).decode(z)

            self._jit_cache[key] = dec
        wav = np.asarray(dec(s_av, a.astype(jnp.float32)))[0]
        safe_emit_progress(progress_callback, 1.0, "Completed MOVA pipeline")
        return frames, wav, int(sample_rate)
