"""Chroma t2i engine.

Contract parity with the reference's ``engine/chroma/t2i.py``:
- T5-XXL prompt embeddings with their attention mask; TRUE CFG against an
  encoded negative prompt (t2i.py:543) — Chroma has no embedded guidance
- the text mask extends over image tokens with ones (t2i.py:138) and masks
  padded text inside every attention (model.py:299)
- flux geometry: 2×2 packed latents, zeroed txt ids, dynamic-shift FlowMatch
  Euler from image_seq_len (t2i.py:416), ``t/1000`` into the model
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
from apex_studio_tpu.schedulers.base import compute_dynamic_shift_mu
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.chroma")


@register_engine("chroma", "t2i")
class ChromaT2IEngine(BaseEngine):
    def _encode(self, prompt: str, max_length: int = 512):
        hidden, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=max_length, use_chat_template=False
        )
        return jnp.asarray(hidden, jnp.float32), jnp.asarray(mask)

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 30,
        guidance_scale: float = 3.0,
        use_cfg_guidance: bool = True,
        num_images: int = 1,
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
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting t2i pipeline")
        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        if self.transformer is None:
            self.load_component_by_type("transformer")
        # The VAE defines the latent geometry — always load it.
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")
        safe_emit_progress(progress_callback, 0.05, "Components ready")

        txt, txt_mask = self._encode(prompt or "", max_sequence_length)
        do_cfg = use_cfg_guidance and negative_prompt is not None
        if do_cfg:
            neg_txt, neg_mask = self._encode(negative_prompt or "", max_sequence_length)
        safe_emit_progress(progress_callback, 0.2, "Prompts ready")

        cfg_t = self.transformer.cfg
        lat_scale = self.vae.cfg.spatial_scale if self.vae is not None else 8
        height -= height % (lat_scale * 2)
        width -= width % (lat_scale * 2)
        lat_c = cfg_t.out_channels // 4
        lat_h, lat_w = height // lat_scale, width // lat_scale
        b = num_images

        noise = self.get_latents((b, lat_c, lat_h, lat_w), seed=seed, latents=latents)
        x = self.transformer.pack_latents(noise.astype(jnp.float32))
        safe_emit_progress(progress_callback, 0.3, "Initialized latent noise")

        if sigmas is None:
            sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = compute_dynamic_shift_mu(
            x.shape[1],
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        ts, num_inference_steps = self.get_timesteps(
            self.scheduler, num_inference_steps, timesteps=timesteps, sigmas=sigmas, mu=mu
        )
        self.scheduler.set_begin_index(0)
        safe_emit_progress(progress_callback, 0.4, "Timesteps computed")

        graphdef, tf_state = nnx.split(self.transformer)
        grid = (lat_h // 2, lat_w // 2)

        def make_fwd(n_txt):
            key = ("chroma_fwd", x.shape, n_txt)
            fwd = self._jit_cache.get(key)
            if fwd is None:

                @jax.jit
                def fwd(state, x, txt, txt_mask, t):
                    m = nnx.merge(graphdef, state)
                    return m(x, txt, t, attention_mask=txt_mask, grid_hw=grid)

                self._jit_cache[key] = fwd
            return fwd

        fwd_pos = make_fwd(txt.shape[1])
        fwd_neg = make_fwd(neg_txt.shape[1]) if do_cfg else None

        denoise_cb = make_mapped_progress(progress_callback, 0.4, 0.9)
        model_dtype = self.transformer.dtype
        for i, t in enumerate(ts):
            t_vec = jnp.full((b,), float(t) / 1000.0, jnp.float32)
            x_in = x.astype(model_dtype)
            v = fwd_pos(tf_state, x_in, txt, txt_mask, t_vec).astype(jnp.float32)
            if do_cfg:
                v_neg = fwd_neg(tf_state, x_in, neg_txt, neg_mask, t_vec).astype(jnp.float32)
                v = v_neg + guidance_scale * (v - v_neg)
            (x,) = self.scheduler.step(v, float(t), x)

            if (
                render_on_step
                and render_on_step_callback is not None
                and num_inference_steps > 8
                and (i + 1) % render_on_step_interval == 0
                and i + 1 < len(ts)
            ):
                try:
                    render_on_step_callback(self._decode_frames(x, lat_h, lat_w), i)
                except Exception:
                    logger.exception("preview callback failed")
            if denoise_cb is not None:
                denoise_cb(min((i + 1) / len(ts), 1.0), f"Denoising step {i + 1}/{len(ts)}")

        safe_emit_progress(progress_callback, 0.9, "Denoising complete")
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self._decode_frames(x, lat_h, lat_w)
        safe_emit_progress(progress_callback, 1.0, "Completed t2i pipeline")
        return frames

    def _decode_frames(self, packed: jnp.ndarray, lat_h: int, lat_w: int) -> List[np.ndarray]:
        z = self.transformer.unpack_latents(packed, lat_h, lat_w)
        key = ("vae_decode", tuple(z.shape))
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, z):
                return nnx.merge(graphdef, state).decode(z)

            self._jit_cache[key] = dec
        _, vae_state = nnx.split(self.vae)
        img = dec(vae_state, z.astype(jnp.float32))
        return self.tensor_to_frames(img)
