"""Ovis-Image text-to-image engine.

Counterpart of the reference's ``src/engine/ovis/t2i.py`` (OvisImageT2IEngine):
the Ovis2.5 MLLM encodes the prompt through its chat template with a
describe-the-image system prefix, the first 28 template tokens are cropped
and padded positions zeroed (t2i.py:24,84), latents are Flux-packed 2x2 with
a dynamic-shift flow-match schedule, and CFG runs when guidance_scale > 1.
The model consumes timestep/1000 (t2i.py:390) and diagonal text RoPE ids.
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
from apex_studio_tpu.schedulers.base import compute_dynamic_shift_mu
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.ovis")

_SYSTEM_PROMPT = ("Describe the image by detailing the color, quantity, text, "
                  "shape, size, texture, spatial relationships of the objects "
                  "and background: ")
_CROP_START = 28


@register_engine("ovis", "t2i")
class OvisT2IEngine(BaseEngine):
    def encode_prompt(self, prompt: str, max_sequence_length: int = 256):
        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        hidden, mask = self.text_encoder.encode(
            [_SYSTEM_PROMPT + prompt],
            max_sequence_length=max_sequence_length + _CROP_START,
            use_chat_template=True)
        hidden = jnp.asarray(hidden) * jnp.asarray(mask)[..., None]
        return hidden[:, _CROP_START:]

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = "",
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        sigmas: Optional[List[float]] = None,
        max_sequence_length: int = 256,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting Ovis t2i")
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

        context = self.encode_prompt(prompt or "", max_sequence_length)
        use_cfg = guidance_scale > 1.0
        neg_context = (self.encode_prompt(negative_prompt or "",
                                          max_sequence_length)
                       if use_cfg else context)
        safe_emit_progress(progress_callback, 0.2, "Prompt encoded")

        s_scale = 2 ** (len(self.vae.cfg.block_out_channels) - 1)
        lat_h = 2 * (height // (s_scale * 2))
        lat_w = 2 * (width // (s_scale * 2))
        z_dim = self.transformer.cfg.in_channels // 4
        noise = self.get_latents((1, z_dim, lat_h, lat_w), seed=seed)
        x = self.transformer.pack_latents(noise.astype(jnp.float32))
        grid_hw = (lat_h // 2, lat_w // 2)

        mu = compute_dynamic_shift_mu(
            x.shape[1],
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        self.scheduler.set_timesteps(num_inference_steps, mu=mu, sigmas=sigmas)
        ts = np.asarray(self.scheduler.timesteps, np.float64)

        graphdef, tf_state = nnx.split(self.transformer)
        key = ("ovis_step", tuple(x.shape), int(context.shape[1]), use_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, t, ctx, nctx):
                m = nnx.merge(graphdef, state)
                pos = m(x, ctx, t / 1000.0, grid_hw=grid_hw)
                if not use_cfg:
                    return pos
                neg = m(x, nctx, t / 1000.0, grid_hw=grid_hw)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        cb = make_mapped_progress(progress_callback, 0.25, 0.9)
        for i, t in enumerate(ts):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(tf_state, x, t_b, context, neg_context)
            out = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = out[0] if isinstance(out, tuple) else out
            if (render_on_step and render_on_step_callback is not None
                    and (i + 1) % render_on_step_interval == 0
                    and i + 1 < len(ts)):
                try:
                    render_on_step_callback(self._decode(x, lat_h, lat_w), i)
                except Exception:
                    logger.exception("preview callback failed")
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self._decode(x, lat_h, lat_w)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames

    def _decode(self, packed: jnp.ndarray, lat_h: int, lat_w: int):
        z = self.transformer.unpack_latents(packed.astype(jnp.float32), lat_h, lat_w)
        graphdef, vstate = nnx.split(self.vae)
        key = ("ovis_decode", tuple(z.shape))
        dec = self._jit_cache.get(key)
        if dec is None:

            @jax.jit
            def dec(s, z):
                return nnx.merge(graphdef, s).decode(z)

            self._jit_cache[key] = dec
        return self.tensor_to_frames(dec(vstate, z))
