"""ZImage engines (t2i) — the minimum end-to-end slice (SURVEY.md §7 step 2).

Contract parity with the reference's ``engine/zimage/t2i.py``:
- prompt → Qwen3 chat template → hidden_states[-2], masked per sample
- resolution snapped to the VAE×patch grid, seeded fp32 latents
- dynamic-shift FlowMatch Euler timesteps from image_seq_len
- the DiT consumes ``t = (1000 − σt)/1000`` and its output is negated
- CFG is pos-anchored (pos + g·(pos−neg)) with optional norm clamping and
  time-truncation; cond/uncond run as separate jitted forwards so each keeps
  its own caption bucket (reference processes them as varlen list items)

TPU design: one compiled step per (latent shape, caption bucket); the Python
loop only sequences steps, emits progress, and taps previews.
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
from apex_studio_tpu.schedulers.base import compute_dynamic_shift_mu
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.zimage")

SEQ_MULTI_OF = 32


def _bucket(n: int) -> int:
    return max(SEQ_MULTI_OF, ((n + SEQ_MULTI_OF - 1) // SEQ_MULTI_OF) * SEQ_MULTI_OF)


@register_engine("zimage", "t2i")
class ZImageT2IEngine(BaseEngine):
    def _transformer_fwd(self, cap_len: int, latent_shape):
        """One jitted forward per (caption bucket, latent shape)."""
        key = ("zimage_fwd", cap_len, tuple(latent_shape))
        fwd = self._jit_cache.get(key)
        if fwd is None:
            graphdef, _ = nnx.split(self.transformer)

            @jax.jit
            def fwd(state, latents, t, cap, cap_mask):
                model = nnx.merge(graphdef, state)
                return model(latents, t, cap, cap_mask)

            self._jit_cache[key] = fwd
        return fwd

    def _fused_step(self, cap_len: int, latent_shape, cfg_variant: str,
                    control: bool = False):
        """Forward + CFG + negation + Euler update in ONE compiled program
        (donated latents; a denoise step is a single device dispatch).
        ``control=True`` adds (control_context, control_context_scale) args
        for the zimage.control variant."""
        key = ("zimage_step", cap_len, tuple(latent_shape), cfg_variant, control)
        step = self._jit_cache.get(key)
        if step is None:
            graphdef, _ = nnx.split(self.transformer)

            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(state, lats, t_model, sigma, sigma_next, cap, cap_mask,
                     neg_cap, neg_mask, g, cfg_norm_ratio, cc=None, cscale=1.0):
                model = nnx.merge(graphdef, state)
                ckw = ({"control_context": cc, "control_context_scale": cscale}
                       if control else {})
                b = lats.shape[0]
                t_vec = jnp.full((b,), t_model, jnp.float32)
                x_in = lats.astype(model.dtype)[:, :, None, :, :]
                pos = model(x_in, t_vec, cap, cap_mask, **ckw)[:, :, 0].astype(jnp.float32)
                if cfg_variant == "cfg":
                    neg = model(x_in, t_vec, neg_cap, neg_mask, **ckw)[:, :, 0].astype(jnp.float32)
                    pred = pos + g * (pos - neg)
                    # pos-anchored norm clamp (only shrinks)
                    pos_n = jnp.linalg.norm(pos.reshape(b, -1), axis=-1)
                    new_n = jnp.linalg.norm(pred.reshape(b, -1), axis=-1)
                    max_n = pos_n * cfg_norm_ratio
                    ratio = jnp.where(
                        (cfg_norm_ratio > 0) & (new_n > max_n),
                        max_n / jnp.maximum(new_n, 1e-12),
                        1.0,
                    )
                    pred = pred * ratio[:, None, None, None]
                else:
                    pred = pos
                v = -pred  # reference negates the DiT output
                return lats + (sigma_next - sigma) * v

            self._jit_cache[key] = step
        return step

    def _encode_single(self, prompt: str, max_sequence_length: int):
        """→ (embeds [1, bucket, D], mask [1, bucket]) with a 32-multiple bucket."""
        hidden, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=max_sequence_length
        )
        true_len = int(np.asarray(mask).sum())
        bucket = _bucket(true_len)
        emb = np.zeros((1, bucket, hidden.shape[-1]), np.float32)
        emb[0, :true_len] = np.asarray(hidden, np.float32)[0][np.asarray(mask[0]).astype(bool)]
        m = np.zeros((1, bucket), bool)
        m[0, :true_len] = True
        return jnp.asarray(emb), jnp.asarray(m)

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        cfg_normalization: float = 0.0,
        cfg_truncation: float = 1.0,
        num_images_per_prompt: int = 1,
        seed: Optional[int] = None,
        latents: Optional[np.ndarray] = None,
        sigmas: Optional[List[float]] = None,
        timesteps: Optional[List[float]] = None,
        max_sequence_length: int = 512,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        control_context: Optional[jnp.ndarray] = None,
        control_context_scale: float = 0.75,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting text-to-image pipeline")

        height = height or 1024
        width = width or 1024

        # Components.
        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        # The VAE defines the latent geometry — load it even for
        # return_latents runs so shapes never depend on warm-pool state.
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")
        safe_emit_progress(progress_callback, 0.05, "Components ready")

        vae_scale = (self.vae.cfg.spatial_scale if self.vae is not None else 8) * 2
        height -= height % vae_scale
        width -= width % vae_scale

        do_cfg = guidance_scale > 1.0

        # Prompt encoding (each stream keeps its own caption bucket).
        cap, cap_mask = self._encode_single(prompt or "", max_sequence_length)
        neg_cap = neg_mask = None
        if do_cfg:
            neg_cap, neg_mask = self._encode_single(negative_prompt or "", max_sequence_length)
        safe_emit_progress(progress_callback, 0.18, "Prompts ready")

        # Latents (fp32, CPU-torch RNG stream — the seed contract).
        cfg_t = self.transformer.cfg
        lat_scale = self.vae.cfg.spatial_scale if self.vae is not None else 8
        lat_h, lat_w = height // lat_scale, width // lat_scale
        b = num_images_per_prompt
        lats = self.get_latents(
            (b, cfg_t.in_channels, lat_h, lat_w), seed=seed, latents=latents
        )
        safe_emit_progress(progress_callback, 0.32, "Initialized latent noise")

        # Timesteps with resolution-dependent shift.
        image_seq_len = (lat_h // cfg_t.patch_size) * (lat_w // cfg_t.patch_size)
        mu = compute_dynamic_shift_mu(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        ts, num_inference_steps = self.get_timesteps(
            self.scheduler, num_inference_steps, timesteps=timesteps, sigmas=sigmas, mu=mu
        )
        safe_emit_progress(progress_callback, 0.40, "Timesteps computed; starting denoise")
        denoise_cb = make_mapped_progress(progress_callback, 0.40, 0.92)

        latent_shape = (b, cfg_t.in_channels, 1, lat_h, lat_w)
        _, tf_state = nnx.split(self.transformer)
        can_fuse = hasattr(self.scheduler, "step_at")  # Euler-family schedulers
        cfg_norm_ratio = float(cfg_normalization or 0.0)

        for i, t in enumerate(ts):
            t_model = (1000.0 - float(t)) / 1000.0

            g = guidance_scale
            if do_cfg and cfg_truncation is not None and float(cfg_truncation) <= 1.0:
                if t_model > float(cfg_truncation):
                    g = 0.0
            apply_cfg = do_cfg and g > 0

            if can_fuse:
                # One device dispatch: forward(+cfg) + negate + Euler update.
                step = self._fused_step(
                    cap.shape[1], latent_shape, "cfg" if apply_cfg else "nocfg",
                    control=control_context is not None,
                )
                extra = (() if control_context is None
                         else (control_context, float(control_context_scale)))
                lats = step(
                    tf_state, lats, t_model,
                    float(self.scheduler.sigmas[i]), float(self.scheduler.sigmas[i + 1]),
                    cap, cap_mask,
                    neg_cap if apply_cfg else cap,
                    neg_mask if apply_cfg else cap_mask,
                    float(g), cfg_norm_ratio, *extra,
                )
            else:
                fwd = self._transformer_fwd(cap.shape[1], latent_shape)
                t_vec = jnp.full((b,), t_model, jnp.float32)
                x_in = lats.astype(self.transformer.dtype)[:, :, None, :, :]
                pos = fwd(tf_state, x_in, t_vec, cap, cap_mask)[:, :, 0]
                noise_pred = pos.astype(jnp.float32)
                if apply_cfg:
                    fwd_neg = self._transformer_fwd(neg_cap.shape[1], latent_shape)
                    neg = fwd_neg(tf_state, x_in, t_vec, neg_cap, neg_mask)[:, :, 0]
                    noise_pred = noise_pred + g * (
                        noise_pred - neg.astype(jnp.float32)
                    )
                (lats,) = self.scheduler.step(-noise_pred, float(t), lats)

            if (
                render_on_step
                and render_on_step_callback is not None
                and num_inference_steps > 8
                and ((i + 1) % render_on_step_interval == 0)
                and i + 1 < len(ts)
            ):
                try:
                    render_on_step_callback(self._decode_frames(lats), i)
                except Exception:
                    logger.exception("preview callback failed")

            if denoise_cb is not None:
                denoise_cb(min((i + 1) / len(ts), 1.0), f"Denoising step {i + 1}/{len(ts)}")

        safe_emit_progress(progress_callback, 0.92, "Denoising complete")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return lats

        frames = self._decode_frames(lats)
        safe_emit_progress(progress_callback, 1.0, "Completed text-to-image pipeline")
        return frames

    def _decode_frames(self, lats: jnp.ndarray) -> List[np.ndarray]:
        key = ("vae_decode", tuple(lats.shape))
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, z):
                return nnx.merge(graphdef, state).decode(z)

            self._jit_cache[key] = dec
        _, vae_state = nnx.split(self.vae)
        img = dec(vae_state, lats.astype(jnp.float32))
        return self.tensor_to_frames(img)


@register_engine("zimage", "control")
class ZImageControlEngine(ZImageT2IEngine):
    """Z-Image control/inpaint: packs [control latents (16) ‖ inverted mask
    (1) ‖ inpaint latents (16)] = 33 channels of control context consumed by
    the ControlNet-style branch of zimage.control (reference
    src/engine/zimage/control.py:88 run, :219 concat)."""

    def run(
        self,
        prompt: Optional[str] = None,
        control_image: Optional[Any] = None,
        image: Optional[Any] = None,
        mask_image: Optional[Any] = None,
        control_context_scale: float = 0.75,
        height: Optional[int] = None,
        width: Optional[int] = None,
        **kwargs: Any,
    ):
        import cv2

        if self.vae is None:
            self.load_component_by_type("vae")
        if self.transformer is None:
            self.load_component_by_type("transformer")
        height = height or 1024
        width = width or 1024
        vae_scale = self.vae.cfg.spatial_scale * 2
        height -= height % vae_scale
        width -= width % vae_scale
        lat_scale = self.vae.cfg.spatial_scale
        lat_h, lat_w = height // lat_scale, width // lat_scale
        nl = self.transformer.cfg.in_channels

        def _encode_image(arr):
            px = cv2.resize(np.asarray(arr), (width, height),
                            interpolation=cv2.INTER_AREA)
            px = (px.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
            # zimage VAE is the 2D AutoencoderKL: encode [B,3,H,W]
            return self.encode_video_latents(px[None])

        # mask: 1 = region to regenerate (reference defaults to all-ones)
        if mask_image is not None:
            m = cv2.resize(np.asarray(self.load_image_input(mask_image))[..., 0],
                           (width, height), interpolation=cv2.INTER_NEAREST)
            mask = (m.astype(np.float32) / 255.0)[None, None]
        else:
            mask = np.ones((1, 1, height, width), np.float32)

        if image is not None:
            arr = np.asarray(self.load_image_input(image)).astype(np.float32)
            arr = cv2.resize(arr, (width, height), interpolation=cv2.INTER_AREA)
            keep = (cv2.resize(mask[0, 0], (width, height),
                               interpolation=cv2.INTER_NEAREST) < 0.5)[..., None]
            inpaint_lat = _encode_image((arr * keep).astype(np.uint8))
        else:
            inpaint_lat = jnp.zeros((1, nl, lat_h, lat_w), jnp.float32)

        if control_image is not None:
            control_lat = _encode_image(self.load_image_input(control_image))
        else:
            control_lat = jnp.zeros_like(inpaint_lat)

        # inverted mask at latent resolution, nearest (control.py:209)
        mask_lat = cv2.resize(1.0 - mask[0, 0], (lat_w, lat_h),
                              interpolation=cv2.INTER_NEAREST)[None, None]
        cc = jnp.concatenate(
            [jnp.asarray(control_lat, jnp.float32),
             jnp.asarray(mask_lat, jnp.float32),
             jnp.asarray(inpaint_lat, jnp.float32)], axis=1)[:, :, None]
        cc = cc.astype(self.transformer.dtype)
        return super().run(prompt=prompt, height=height, width=width,
                           control_context=cc,
                           control_context_scale=control_context_scale, **kwargs)
