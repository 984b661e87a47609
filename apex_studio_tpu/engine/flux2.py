"""Flux 2 engines (ti2i + klein) — Mistral-conditioned, guidance-distilled.

Contract parity with the reference's ``engine/flux2/{shared,ti2i,klein}.py``:
- Mistral chat-templated prompt, hidden states from layers (10,20,30) (klein:
  (9,18,27) via manifest config) concatenated to 15360-dim (shared.py:249)
- empirical-mu dynamic shift for the FlowMatchEuler schedule (shared.py:104)
- 32-ch VAE latents packed 2x2 to 128-ch tokens; packed latents are
  normalized by the VAE's BatchNorm running stats (vae/flux2/model.py:615)
- edit/reference images ride the image stream as extra packed tokens with
  RoPE time offsets 10, 20, ... (shared.py:317); only the noise tokens are
  denoised/decoded
- guidance-distilled: guidance_scale enters via the DiT's guidance embedding

Denoise = ONE fused jitted dispatch per step (engine/fused.py).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.flux2")

SYSTEM_MESSAGE = (
    "You are an AI that processes image generation requests. Follow the user's "
    "instruction precisely and describe the target image faithfully."
)


def compute_empirical_mu(image_seq_len: int, num_steps: int) -> float:
    """Flux2's resolution+steps-dependent shift (reference shared.py:104-120)."""
    a1, b1 = 8.73809524e-05, 1.89833333
    a2, b2 = 0.00016927, 0.45666666
    if image_seq_len > 4300:
        return float(a2 * image_seq_len + b2)
    m_200 = a2 * image_seq_len + b2
    m_10 = a1 * image_seq_len + b1
    a = (m_200 - m_10) / 190.0
    b = m_200 - 200.0 * a
    return float(a * num_steps + b)


@register_engine("flux2", "ti2i", "klein", "t2i")
class Flux2TI2IEngine(BaseEngine):
    def load_components(self) -> None:
        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

    def encode_prompt(self, prompt: str, max_sequence_length: int = 512) -> jnp.ndarray:
        """Chat-templated prompt → stacked intermediate hidden states
        [1, L, n_layers·hidden] (stack_layers set in the manifest config).
        flux2 dev conditions on Mistral (reference shared.py:222-251); klein on
        Qwen3 with thinking disabled (reference klein.py:56-63)."""
        te = self.text_encoder
        model = te._ensure_model()
        if "Qwen3" in te.base:
            # tokenizer.apply_chat_template(..., add_generation_prompt=True,
            # enable_thinking=False) for a single user turn renders to:
            text = (
                f"<|im_start|>user\n{prompt or ''}<|im_end|>\n"
                "<|im_start|>assistant\n<think>\n\n</think>\n\n"
            )
        else:
            text = (
                f"[SYSTEM_PROMPT]{SYSTEM_MESSAGE}[/SYSTEM_PROMPT]"
                f"[INST]{prompt or ''}[/INST]"
            )
        ids, mask = te.tokenize([text], max_sequence_length)
        graphdef, state = nnx.split(model)
        key = ("flux2_mistral", ids.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, ids, mask):
                m = nnx.merge(graphdef, state)
                return m(ids, attention_mask=mask)

            self._jit_cache[key] = fwd
        return fwd(state, jnp.asarray(ids), jnp.asarray(mask))

    def _encode_reference_images(self, images: List[Any], max_side: int = 1024):
        """Each reference image → packed, bn-normalized tokens + token grid."""
        import cv2

        tokens, grids = [], []
        graphdef, vae_state = nnx.split(self.vae)
        for im in images:
            arr = self.load_image_input(im)
            h0, w0 = arr.shape[:2]
            scale = min(1.0, max_side / max(h0, w0))
            h = max(32, int(h0 * scale) // 16 * 16)
            w = max(32, int(w0 * scale) // 16 * 16)
            resized = cv2.resize(arr, (w, h), interpolation=cv2.INTER_LANCZOS4)
            x = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)[None]
            key = ("flux2_vae_encode", x.shape)
            enc = self._jit_cache.get(key)
            if enc is None:

                @jax.jit
                def enc(state, v):
                    m = nnx.merge(graphdef, state)
                    z = m.encode(v)
                    packed = self.transformer.pack_latents(z.astype(jnp.float32))
                    return m.normalize_packed(packed)

                self._jit_cache[key] = enc
            packed = enc(vae_state, x)
            tokens.append(packed)
            lat_h, lat_w = h // self.vae.cfg.spatial_scale, w // self.vae.cfg.spatial_scale
            grids.append((lat_h // 2, lat_w // 2))
        return jnp.concatenate(tokens, axis=1), tuple(grids)

    def run(
        self,
        prompt: Optional[str] = None,
        images: Optional[List[Any]] = None,
        image=None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 4.0,
        seed: Optional[int] = None,
        latents: Optional[np.ndarray] = None,
        sigmas: Optional[np.ndarray] = None,
        timesteps: Optional[List[float]] = None,
        max_sequence_length: int = 512,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 5,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting pipeline")
        self.load_components()
        safe_emit_progress(progress_callback, 0.05, "Components ready")

        cfg_t = self.transformer.cfg
        lat_scale = self.vae.cfg.spatial_scale if self.vae is not None else 8
        height -= height % (lat_scale * 2)
        width -= width % (lat_scale * 2)
        lat_c = (cfg_t.out_channels or cfg_t.in_channels) // 4
        lat_h, lat_w = height // lat_scale, width // lat_scale
        grid = (lat_h // 2, lat_w // 2)

        seq = self.encode_prompt(prompt or "", max_sequence_length)
        safe_emit_progress(progress_callback, 0.2, "Prompt encoded")

        refs = images if images is not None else ([image] if image is not None else [])
        cond_tokens, cond_grids = (None, ())
        if refs:
            cond_tokens, cond_grids = self._encode_reference_images(list(refs))
        safe_emit_progress(progress_callback, 0.3, "Reference images encoded")

        noise = self.get_latents((1, lat_c, lat_h, lat_w), seed=seed, latents=latents)
        x = self.transformer.pack_latents(noise.astype(jnp.float32))

        if sigmas is None:
            sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = compute_empirical_mu(x.shape[1], num_inference_steps)
        ts, num_inference_steps = self.get_timesteps(
            self.scheduler, num_inference_steps, timesteps=timesteps, sigmas=sigmas, mu=mu
        )
        safe_emit_progress(progress_callback, 0.4, "Timesteps computed")

        graphdef, tf_state = nnx.split(self.transformer)
        key = ("flux2_step", x.shape, seq.shape[1], grid, cond_grids)
        step = self._jit_cache.get(key)
        if step is None:
            from apex_studio_tpu.engine.fused import build_euler_step

            def apply(m, x, aux, t_vec, seq, cond, g):
                v = m(x.astype(m.dtype), seq, t_vec, guidance=g, grid_hw=grid,
                      cond_tokens=cond, cond_grids=cond_grids)
                return v.astype(jnp.float32), aux

            step = build_euler_step(graphdef, apply)
            self._jit_cache[key] = step

        g_vec = jnp.full((1,), guidance_scale, jnp.float32)
        denoise_cb = make_mapped_progress(progress_callback, 0.4, 0.9)
        if len(ts) <= 8:
            render_on_step = False
        for i, t in enumerate(ts):
            t_vec = jnp.full((1,), float(t) / 1000.0, jnp.float32)
            x, _ = step(
                tf_state, x,
                float(self.scheduler.sigmas[i]), float(self.scheduler.sigmas[i + 1]),
                (), t_vec, seq, cond_tokens, g_vec,
            )
            if (
                render_on_step
                and render_on_step_callback is not None
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
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames

    def _decode_frames(self, tokens: jnp.ndarray, lat_h: int, lat_w: int):
        key = ("flux2_decode", tuple(tokens.shape), lat_h, lat_w)
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, tokens):
                m = nnx.merge(graphdef, state)
                # Denormalize in packed space, then unpack and decode
                # (reference decodes via bn running stats, model.py:625).
                toks = m.denormalize_packed(tokens.astype(jnp.float32))
                z = self.transformer.unpack_latents(toks, lat_h, lat_w)
                return m.decode(z)

            self._jit_cache[key] = dec
        _, vae_state = nnx.split(self.vae)
        img = dec(vae_state, tokens)
        return self.tensor_to_frames(img)


@register_engine("flux2", "control")
class Flux2ControlEngine(Flux2TI2IEngine):
    """Flux2 VACE-style control/inpaint (reference engine/flux2/control.py:11
    + transformer/flux2/control/model.py:102): the packed conditioning
    context is [control latents ‖ inverted mask (4ch packed) ‖ masked
    inpaint latents]; a zero-init control block chain produces per-layer
    hints added into the main double stream at control_layers."""

    def _encode_packed(self, pixels: jnp.ndarray, normalize: bool) -> jnp.ndarray:
        graphdef, vae_state = nnx.split(self.vae)
        key = ("flux2_ctrl_enc", tuple(pixels.shape), normalize)
        enc = self._jit_cache.get(key)
        if enc is None:

            @jax.jit
            def enc(state, v):
                m = nnx.merge(graphdef, state)
                z = m.encode(v)
                packed = self.transformer.pack_latents(z.astype(jnp.float32))
                return m.normalize_packed(packed) if normalize else packed

            self._jit_cache[key] = enc
        return enc(vae_state, pixels)

    def run(
        self,
        prompt: Optional[str] = None,
        control_image: Optional[Any] = None,
        inpaint_image: Optional[Any] = None,
        mask_image: Optional[Any] = None,
        control_context_scale: float = 1.0,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 4.0,
        seed: Optional[int] = None,
        sigmas: Optional[np.ndarray] = None,
        timesteps: Optional[List[float]] = None,
        max_sequence_length: int = 512,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        import cv2

        safe_emit_progress(progress_callback, 0.0, "Starting flux2 control")
        self.load_components()
        cfg_t = self.transformer.cfg
        lat_scale = self.vae.cfg.spatial_scale if self.vae is not None else 8
        height -= height % (lat_scale * 2)
        width -= width % (lat_scale * 2)
        lat_c = (cfg_t.out_channels or cfg_t.in_channels) // 4
        lat_h, lat_w = height // lat_scale, width // lat_scale
        grid = (lat_h // 2, lat_w // 2)

        seq = self.encode_prompt(prompt or "", max_sequence_length)

        def _pixels(im):
            arr = self.load_image_input(im)
            resized = cv2.resize(arr, (width, height),
                                 interpolation=cv2.INTER_LANCZOS4)
            return jnp.asarray(resized.astype(np.float32) / 127.5
                               - 1.0).transpose(2, 0, 1)[None]

        # mask: 1 = edit region (control.py:124); latents see (1 - mask)
        if mask_image is not None:
            m_arr = self.load_image_input(mask_image)
            if m_arr.ndim == 3:
                m_arr = m_arr[..., 0]
            m_arr = cv2.resize(m_arr, (width, height),
                               interpolation=cv2.INTER_NEAREST)
            mask = (m_arr.astype(np.float32) / 255.0 >= 0.5).astype(np.float32)
        else:
            mask = np.ones((height, width), np.float32)

        if inpaint_image is not None:
            init_px = np.asarray(_pixels(inpaint_image))
            init_px = init_px * (mask[None, None] < 0.5)
        else:
            init_px = np.zeros((1, 3, height, width), np.float32)
        inpaint_tokens = self._encode_packed(
            jnp.asarray(init_px), normalize=inpaint_image is not None)

        if control_image is not None:
            control_tokens = self._encode_packed(_pixels(control_image),
                                                 normalize=True)
        else:
            control_tokens = jnp.zeros_like(inpaint_tokens)

        inv_mask = cv2.resize(1.0 - mask, (lat_w, lat_h),
                              interpolation=cv2.INTER_NEAREST)
        mask_tokens = self.transformer.pack_latents(
            jnp.asarray(inv_mask)[None, None])  # [1, N, 4]
        control_context = jnp.concatenate(
            [control_tokens, mask_tokens, inpaint_tokens], axis=-1)
        safe_emit_progress(progress_callback, 0.3, "Control context ready")

        noise = self.get_latents((1, lat_c, lat_h, lat_w), seed=seed)
        x = self.transformer.pack_latents(noise.astype(jnp.float32))

        if sigmas is None:
            sigmas = np.linspace(1.0, 1.0 / num_inference_steps,
                                 num_inference_steps)
        mu = compute_empirical_mu(x.shape[1], num_inference_steps)
        ts, num_inference_steps = self.get_timesteps(
            self.scheduler, num_inference_steps, timesteps=timesteps,
            sigmas=sigmas, mu=mu)

        graphdef, tf_state = nnx.split(self.transformer)
        key = ("flux2_control_step", x.shape, seq.shape[1], grid,
               float(control_context_scale))
        step = self._jit_cache.get(key)
        if step is None:
            from apex_studio_tpu.engine.fused import build_euler_step

            def apply(m, x, aux, t_vec, seq, cc, g):
                v = m(x.astype(m.dtype), seq, t_vec, guidance=g, grid_hw=grid,
                      control_context=cc,
                      control_context_scale=control_context_scale)
                return v.astype(jnp.float32), aux

            step = build_euler_step(graphdef, apply)
            self._jit_cache[key] = step

        g_vec = jnp.full((1,), guidance_scale, jnp.float32)
        denoise_cb = make_mapped_progress(progress_callback, 0.4, 0.9)
        for i, t in enumerate(ts):
            t_vec = jnp.full((1,), float(t) / 1000.0, jnp.float32)
            x, _ = step(tf_state, x,
                        float(self.scheduler.sigmas[i]),
                        float(self.scheduler.sigmas[i + 1]),
                        (), t_vec, seq, control_context, g_vec)
            if denoise_cb is not None:
                denoise_cb(min((i + 1) / len(ts), 1.0),
                           f"Denoising step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self._decode_frames(x, lat_h, lat_w)
        safe_emit_progress(progress_callback, 1.0, "Flux2 control complete")
        return frames
