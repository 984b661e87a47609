"""Bria FIBO text/image-to-image engine.

Counterpart of the reference's ``src/engine/fibo/ti2i.py``
(FiboTI2IEngine): prompts are structured JSON captions — a plain prompt is
passed through verbatim (the reference optionally expands it with a VLM
prompt-enhancer helper, ti2i.py:807; we use the text as-is when no helper is
configured), the default negative prompt derives from the caption's
``style_medium`` (ti2i.py:425), the SmolLM-class text encoder contributes
``cat(hidden[-1], hidden[-2])`` as the base text stream plus every hidden
layer for the per-block caption projections, and denoising is flow-match
Euler with dynamic shift and batched CFG over unpacked latent tokens.
"""

from __future__ import annotations

import json
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

logger = logging.getLogger("apex.engine.fibo")


def default_negative_prompt(structured: dict) -> str:
    """ti2i.py:425 — photographs get an anti-illustration negative."""
    style = str(structured.get("style_medium", "")).lower()
    if style in ("photograph", "photography", "photo"):
        return ("{'style_medium':'digital illustration',"
                "'artistic_style':'non-realistic'}")
    return ""


@register_engine("fibo", "ti2i", "t2i")
class FiboTI2IEngine(BaseEngine):
    def encode_prompt(self, prompt: str, max_sequence_length: int = 2048):
        """→ (embeds [1, L, 2·d], layers list of [1, L, d], mask [1, L])."""
        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        stacked, mask = self.text_encoder.encode(
            [prompt or ""], max_sequence_length=max_sequence_length,
            use_chat_template=False)
        stacked = jnp.asarray(stacked)
        d = self.transformer.cfg.text_encoder_dim
        n = stacked.shape[-1] // d
        layers = [stacked[..., i * d:(i + 1) * d] for i in range(n)]
        if len(layers) >= 2:
            embeds = jnp.concatenate([layers[-1], layers[-2]], axis=-1)
        else:
            embeds = jnp.concatenate([layers[-1], layers[-1]], axis=-1)
        return embeds, layers, jnp.asarray(mask)

    def run(
        self,
        prompt: Optional[str] = None,
        structured_prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        image: Optional[Any] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 30,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        max_sequence_length: int = 2048,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting FIBO pipeline")
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

        prompt = structured_prompt or prompt or ""
        structured: dict = {}
        try:
            structured = json.loads(prompt)
        except (TypeError, ValueError):
            pass  # plain text prompt rides through unchanged
        if not negative_prompt:
            negative_prompt = default_negative_prompt(structured)

        embeds, layers, mask = self.encode_prompt(prompt, max_sequence_length)
        use_cfg = guidance_scale > 1.0
        if use_cfg:
            nembeds, nlayers, nmask = self.encode_prompt(
                negative_prompt or "", max_sequence_length)
        else:
            nembeds, nlayers, nmask = embeds, layers, mask
        safe_emit_progress(progress_callback, 0.3, "Prompt encoded")

        s_scale = getattr(self.vae.cfg, "spatial_scale", None) or 16
        lat_h, lat_w = height // s_scale, width // s_scale
        z_dim = self.transformer.cfg.in_channels
        noise = self.get_latents((1, z_dim, lat_h, lat_w), seed=seed)
        # no-patch packing (ti2i.py:75): [B, C, h, w] → [B, h·w, C]
        x = noise.reshape(1, z_dim, lat_h * lat_w).transpose(0, 2, 1)

        mu = compute_dynamic_shift_mu(
            lat_h * lat_w,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        self.scheduler.set_timesteps(num_inference_steps, mu=mu,
                                     sigmas=sigmas.tolist())
        ts = np.asarray(self.scheduler.timesteps, np.float64)

        graphdef, tf_state = nnx.split(self.transformer)
        key = ("fibo_step", tuple(x.shape), int(embeds.shape[1]),
               int(nembeds.shape[1]), use_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, t, ctx, lyrs, m, nctx, nlyrs, nm):
                mdl = nnx.merge(graphdef, state)
                pos = mdl(x, ctx, lyrs, t, text_mask=m, grid_hw=(lat_h, lat_w))
                if not use_cfg:
                    return pos
                neg = mdl(x, nctx, nlyrs, t, text_mask=nm,
                          grid_hw=(lat_h, lat_w))
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        cb = make_mapped_progress(progress_callback, 0.35, 0.9)
        for i, t in enumerate(ts):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(tf_state, x, t_b, embeds, layers, mask,
                    nembeds, nlayers, nmask)
            out = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = out[0] if isinstance(out, tuple) else out
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        z = x.transpose(0, 2, 1).reshape(1, z_dim, lat_h, lat_w)
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return z
        graphdef_v, vstate = nnx.split(self.vae)
        key = ("fibo_decode", tuple(z.shape))
        dec = self._jit_cache.get(key)
        if dec is None:

            @jax.jit
            def dec(s, z):
                return nnx.merge(graphdef_v, s).decode(z)

            self._jit_cache[key] = dec
        frames = self.tensor_to_frames(dec(vstate, z.astype(jnp.float32)))
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames
