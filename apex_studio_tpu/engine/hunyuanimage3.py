"""HunyuanImage-3.0 t2i engine.

Counterpart of the reference's ``src/engine/hunyuanimage3/t2i.py``: the
causal-MM MoE backbone denoises image latent tokens behind a tokenized text
prefix; flow-match Euler sampling with CFG against an empty prompt; decode
through the family's own AutoencoderKLConv3D DC-AE (vae/hunyuanimage3/
model.py:554 — images ride the T=1 expand/last-frame rules).
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

logger = logging.getLogger("apex.engine.hunyuanimage3")


@register_engine("hunyuanimage3", "t2i")
class HunyuanImage3T2IEngine(BaseEngine):
    def load_components(self, return_latents: bool) -> None:
        from apex_studio_tpu.text_encoder import TextEncoder

        # The backbone IS the language model; the text_encoder component only
        # carries the tokenizer (reference tokenizer_wrapper.py).
        if self.text_encoder is None:
            spec = self._spec_for_type("text_encoder") or {"type": "text_encoder"}
            self.text_encoder = TextEncoder(self, spec)
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        seed: Optional[int] = None,
        max_sequence_length: int = 128,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting HunyuanImage3 t2i")
        self.load_components(return_latents)
        ids, _ = self.text_encoder.tokenize([prompt or ""], max_sequence_length)
        nids, _ = self.text_encoder.tokenize([negative_prompt or ""],
                                             max_sequence_length)
        ids = jnp.asarray(ids)
        nids = jnp.asarray(nids)
        safe_emit_progress(progress_callback, 0.1, "Prompt tokenized")

        s_scale = getattr(self.vae.cfg, "spatial_scale", None) or 2 ** (
            len(getattr(self.vae.cfg, "block_out_channels", (0,) * 4)) - 1)
        lat_h, lat_w = height // s_scale, width // s_scale
        cfg_t = self.transformer.cfg
        x = self.get_latents((1, cfg_t.img_in_channels, lat_h, lat_w), seed=seed)
        ts, _ = self.get_timesteps(self.scheduler, num_inference_steps,
                                   timesteps=timesteps)

        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        key = ("hyi3_step", tuple(x.shape), int(ids.shape[1]), do_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, t, ids, nids):
                m = nnx.merge(graphdef, state)
                pos = m(x, t, ids)
                if not do_cfg:
                    return pos
                neg = m(x, t, nids)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        dt = self.transformer.dtype
        cb = make_mapped_progress(progress_callback, 0.15, 0.9)
        for i, t in enumerate(np.asarray(ts, np.float64)):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(tf_state, x.astype(dt), t_b, ids, nids)
            out = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = out[0] if isinstance(out, tuple) else out
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        graphdef_v, vstate = nnx.split(self.vae)
        key = ("hyi3_decode", tuple(x.shape))
        dec = self._jit_cache.get(key)
        if dec is None:

            @jax.jit
            def dec(s, z):
                return nnx.merge(graphdef_v, s).decode(z)

            self._jit_cache[key] = dec
        img = dec(vstate, x.astype(jnp.float32))
        frames = self.tensor_to_frames(img)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames
