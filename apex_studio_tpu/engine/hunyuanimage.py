"""HunyuanImage 2.1 text-to-image engine.

Counterpart of the reference's ``src/engine/hunyuanimage/t2i.py``
(HunyuanImageT2IEngine): Qwen2.5-VL prompt embeddings (describe-the-image
system template, 34 template tokens dropped, hidden_states[-3]), a ByT5
glyph branch fed with quoted spans from the prompt, flow-match Euler on a
linear sigma ladder, and either classic CFG with an optional adaptive
projected guidance (APG) mix — the reference routes through diffusers
AdaptiveProjectedMixGuidance helpers (t2i.py:374) — or, for the distilled
model, an embedded ``distilled_guidance_scale`` (guidance_embeds) and
meanflow ``timestep_r`` (t2i.py:478).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.hunyuanvideo15 import extract_glyph_text
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.hunyuanimage")

_TEMPLATE = ("<|im_start|>system\nDescribe the image by detailing the color, "
             "shape, size, texture, quantity, text, spatial relationships of "
             "the objects and background:<|im_end|>\n"
             "<|im_start|>user\n{}<|im_end|>")
_DROP_IDX = 34


def apg_mix(pred_cond: jnp.ndarray, pred_uncond: jnp.ndarray,
            guidance_scale: float, eta: float = 0.0,
            norm_threshold: float = 10.0) -> jnp.ndarray:
    """Adaptive projected guidance: rescale the CFG delta and keep mostly its
    component orthogonal to the conditional prediction (diffusers
    AdaptiveProjectedMixGuidance, used by t2i.py:374)."""
    diff = pred_cond - pred_uncond
    flat = diff.reshape(diff.shape[0], -1)
    norm = jnp.linalg.norm(flat, axis=-1, keepdims=True)
    if norm_threshold and norm_threshold > 0:
        scale = jnp.minimum(1.0, norm_threshold / jnp.maximum(norm, 1e-6))
        flat = flat * scale
    cond_flat = pred_cond.reshape(diff.shape[0], -1)
    unit = cond_flat / jnp.maximum(
        jnp.linalg.norm(cond_flat, axis=-1, keepdims=True), 1e-6)
    parallel = (flat * unit).sum(-1, keepdims=True) * unit
    flat = parallel * eta + (flat - parallel)
    return pred_cond + (guidance_scale - 1.0) * flat.reshape(diff.shape)


@register_engine("hunyuanimage", "t2i")
class HunyuanImageT2IEngine(BaseEngine):
    def __init__(self, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.text_encoder_2 = None

    def load_text_encoders(self) -> None:
        from apex_studio_tpu.text_encoder import TextEncoder

        te_specs = [s for s in self.component_specs.values()
                    if s.get("type") == "text_encoder"]
        mllm = next((s for s in te_specs if "Qwen" in (s.get("base") or "")), None)
        byt5 = next((s for s in te_specs if "T5" in (s.get("base") or "")), None)
        if self.text_encoder is None and mllm is not None:
            self.text_encoder = TextEncoder(self, mllm)
        if self.text_encoder_2 is None and byt5 is not None:
            self.text_encoder_2 = TextEncoder(self, byt5)

    def _encode_mllm(self, prompt: str, max_length: int = 1000):
        te = self.text_encoder
        model = te._ensure_model()
        ids, mask = te.tokenize([_TEMPLATE.format(prompt)], max_length + _DROP_IDX)
        graphdef, state = nnx.split(model)
        key = ("hyi_mllm", ids.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, ids, mask):
                m = nnx.merge(graphdef, state)
                return m(ids, attention_mask=mask, num_hidden_layers_to_skip=2)

            self._jit_cache[key] = fwd
        hidden = fwd(state, jnp.asarray(ids), jnp.asarray(mask))
        return hidden[:, _DROP_IDX:], jnp.asarray(mask)[:, _DROP_IDX:]

    def _encode_byt5(self, prompt: str, max_length: int = 128):
        glyph = extract_glyph_text(prompt)
        dim = self.transformer.cfg.text_embed_2_dim
        if dim is None:
            return None, None
        if glyph is None or self.text_encoder_2 is None:
            return (jnp.zeros((1, max_length, dim), jnp.float32),
                    jnp.zeros((1, max_length), jnp.int32))
        hidden, mask = self.text_encoder_2.encode(
            [f'Text "{glyph}". '], max_sequence_length=max_length,
            use_chat_template=False)
        return jnp.asarray(hidden), jnp.asarray(mask)

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 2048,
        width: int = 2048,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.5,
        distilled_guidance_scale: Optional[float] = 3.25,
        apg_eta: float = 0.0,
        apg_norm_threshold: float = 10.0,
        use_apg: bool = True,
        seed: Optional[int] = None,
        sigmas: Optional[List[float]] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting HunyuanImage t2i")
        self.load_text_encoders()
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")
        cfg_t = self.transformer.cfg

        text, text_mask = self._encode_mllm(prompt or "")
        text2, text2_mask = self._encode_byt5(prompt or "")
        use_cfg = guidance_scale > 1.0 and not cfg_t.guidance_embeds
        if use_cfg:
            ntext, ntext_mask = self._encode_mllm(negative_prompt or "")
            ntext2, ntext2_mask = self._encode_byt5(negative_prompt or "")
        safe_emit_progress(progress_callback, 0.2, "Prompts encoded")

        s_scale = self.vae.cfg.spatial_scale
        ph, pw = cfg_t.patch_size
        height -= height % (s_scale * ph)
        width -= width % (s_scale * pw)
        lat_h, lat_w = height // s_scale, width // s_scale
        x = self.get_latents((1, cfg_t.in_channels, lat_h, lat_w), seed=seed)

        sig = (np.linspace(1.0, 0.0, num_inference_steps + 1)
               if sigmas is None else np.asarray(list(sigmas) + [0.0]))
        ts = sig[:-1] * 1000.0

        guidance = None
        if cfg_t.guidance_embeds and distilled_guidance_scale is not None:
            guidance = jnp.full((1,), float(distilled_guidance_scale) * 1000.0,
                                jnp.float32)

        graphdef, tf_state = nnx.split(self.transformer)
        key = ("hyi_step", tuple(x.shape), int(text.shape[1]), use_cfg,
               cfg_t.use_meanflow)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, t, t_r, txt, tm, t2, t2m, ntxt, ntm, nt2, nt2m, g):
                m = nnx.merge(graphdef, state)
                xd = x.astype(m.dtype)
                pos = m(xd, t, txt, tm, t2, t2m, guidance=g, t_r=t_r)
                if not use_cfg:
                    return pos, pos
                neg = m(xd, t, ntxt, ntm, nt2, nt2m, guidance=g, t_r=t_r)
                return pos, neg

            self._jit_cache[key] = fwd
        cb = make_mapped_progress(progress_callback, 0.25, 0.9)
        zeros = jnp.zeros((1,), jnp.float32)
        for i, t in enumerate(ts):
            t_b = jnp.full((1,), float(t), jnp.float32)
            t_r = None
            if cfg_t.use_meanflow:
                t_r = (jnp.full((1,), float(ts[i + 1]), jnp.float32)
                       if i + 1 < len(ts) else zeros)
            pos, neg = fwd(
                tf_state, x, t_b, t_r, text, text_mask, text2, text2_mask,
                text if not use_cfg else ntext,
                text_mask if not use_cfg else ntext_mask,
                text2 if not use_cfg else ntext2,
                text2_mask if not use_cfg else ntext2_mask, guidance)
            pos = pos.astype(jnp.float32)
            if use_cfg:
                neg = neg.astype(jnp.float32)
                v = (apg_mix(pos, neg, guidance_scale, apg_eta,
                             apg_norm_threshold)
                     if use_apg else neg + guidance_scale * (pos - neg))
            else:
                v = pos
            x = x + (sig[i + 1] - sig[i]) * v
            if (render_on_step and render_on_step_callback is not None
                    and (i + 1) % render_on_step_interval == 0
                    and i + 1 < len(ts)):
                try:
                    render_on_step_callback(self._decode(x), i)
                except Exception:
                    logger.exception("preview callback failed")
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self._decode(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames

    def _decode(self, x: jnp.ndarray):
        graphdef, vstate = nnx.split(self.vae)
        key = ("hyi_decode", tuple(x.shape))
        dec = self._jit_cache.get(key)
        if dec is None:

            @jax.jit
            def dec(s, z):
                return nnx.merge(graphdef, s).decode(z)

            self._jit_cache[key] = dec
        return self.tensor_to_frames(dec(vstate, x.astype(jnp.float32)))
