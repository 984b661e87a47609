"""QwenImage engines (t2i) — Qwen2.5-VL conditioned MMDiT.

Contract parity with the reference's ``engine/qwenimage/t2i.py``:
- prompt → Qwen2.5-VL chat template ("Describe the image by detailing…"),
  final hidden states, template prefix cropped (drop_idx=34)
- packed 2×2 latents, dynamic-shift FlowMatch Euler, true CFG
  (cond/uncond with a negative prompt)
- Lightning variants arrive as merged LoRAs (manifest `loras`), running the
  same graph at 8 steps / cfg 1.0
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

logger = logging.getLogger("apex.engine.qwenimage")

SYSTEM_MESSAGE = (
    "Describe the image by detailing the color, shape, size, texture, quantity, "
    "text, spatial relationships of the objects and background:"
)
EDIT_SYSTEM_MESSAGE = (
    "Describe the key features of the input image (color, shape, size, texture, "
    "objects, background), then explain how the user's text instruction should "
    "alter or modify the image. Generate a new image that meets the user's "
    "requirements while maintaining consistency with the original input where "
    "appropriate."
)
DROP_IDX = 34  # tokens of the chat-template prefix to crop


@register_engine("qwenimage", "t2i")
class QwenImageT2IEngine(BaseEngine):
    system_message = SYSTEM_MESSAGE

    def encode_prompt(self, prompt: str, max_length: int = 1024):
        from apex_studio_tpu.utils.disk_cache import EmbeddingCache

        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        te = self.text_encoder
        # Disk-cached so a repeat prompt never rebuilds the 7B Qwen2.5-VL
        # after release_text_encoders (staged single-chip memory).
        cache = EmbeddingCache("qwenimage_te")
        cache_key = {
            "prompt": prompt, "max_len": max_length, "sys": self.system_message,
            "base": te.base,
            "weights": str(te.spec.get("model_path") or "")[:256],
            "config": te.spec.get("config") or te.spec.get("config_path") or "",
        }
        hit = cache.load(cache_key)
        if hit is not None:
            return jnp.asarray(hit[0])
        model = te._ensure_model()
        text = (
            f"<|im_start|>system\n{self.system_message}<|im_end|>\n"
            f"<|im_start|>user\n{prompt}<|im_end|>\n<|im_start|>assistant\n"
        )
        ids, mask = te.tokenize([text], max_length + DROP_IDX)
        graphdef, state = nnx.split(model)
        key = ("te_fwd", "qwenimage", ids.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, ids, mask):
                m = nnx.merge(graphdef, state)
                return m(ids, attention_mask=mask, normalize_last=True)

            self._jit_cache[key] = fwd
        hidden = fwd(state, jnp.asarray(ids), jnp.asarray(mask))
        true_len = int(np.asarray(mask).sum())
        # crop template prefix, keep a 32-multiple bucket of real tokens
        n = max(1, true_len - DROP_IDX)
        bucket = ((n + 31) // 32) * 32
        out = np.zeros((1, bucket, hidden.shape[-1]), np.float32)
        out[0, :n] = np.asarray(hidden, np.float32)[0, DROP_IDX:true_len]
        cache.store(cache_key, out, np.ones((1, bucket), np.int32))
        return jnp.asarray(out)

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        true_cfg_scale: float = 4.0,
        guidance_scale: float = 1.0,
        num_images: int = 1,
        seed: Optional[int] = None,
        latents: Optional[np.ndarray] = None,
        sigmas: Optional[List[float]] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting t2i pipeline")
        # Encode BEFORE the 20B DiT loads (staged single-chip residency,
        # engine/base.py release_text_encoders).
        use_cfg = true_cfg_scale > 1.0 and negative_prompt is not None
        txt = self.encode_prompt(prompt or "")
        neg_txt = self.encode_prompt(negative_prompt or "") if use_cfg else None
        if offload:
            self.maybe_release_text_encoders()
        safe_emit_progress(progress_callback, 0.2, "Prompts ready")

        if self.transformer is None:
            self.load_component_by_type("transformer")
        # The VAE defines the latent geometry — always load it.
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

        cfg_t = self.transformer.cfg
        lat_scale = self.vae.cfg.spatial_scale if self.vae is not None else 8
        height -= height % (lat_scale * 2)
        width -= width % (lat_scale * 2)
        lat_c = cfg_t.out_channels
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

        # Fused hot loop: forward (+CFG) + Euler update in ONE dispatch per
        # step, latents donated.
        key = ("qwenimage_step", x.shape, txt.shape[1],
               neg_txt.shape[1] if use_cfg else None, grid, use_cfg)
        step = self._jit_cache.get(key)
        if step is None:
            from apex_studio_tpu.engine.fused import build_euler_step

            def apply(m, x, aux, t_vec, txt, neg_txt, g):
                x_in = x.astype(m.dtype)
                v = m(x_in, txt, t_vec, grid_hw=grid).astype(jnp.float32)
                if use_cfg:
                    v_neg = m(x_in, neg_txt, t_vec, grid_hw=grid).astype(jnp.float32)
                    v = v_neg + g * (v - v_neg)
                return v, aux

            step = build_euler_step(graphdef, apply)
            self._jit_cache[key] = step

        denoise_cb = make_mapped_progress(progress_callback, 0.4, 0.9)
        for i, t in enumerate(ts):
            t_vec = jnp.full((b,), float(t) / 1000.0, jnp.float32)
            x, _ = step(
                tf_state, x,
                float(self.scheduler.sigmas[i]), float(self.scheduler.sigmas[i + 1]),
                (), t_vec, txt, neg_txt if use_cfg else txt,
                jnp.float32(true_cfg_scale if use_cfg else 1.0),
            )

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

    # -- image-conditioning hooks (used by the edit engines) ---------------------------

    def encode_image_latents(self, image: np.ndarray, height: int, width: int) -> jnp.ndarray:
        """RGB uint8 → packed latent tokens via the manifest VAE."""
        import cv2

        from apex_studio_tpu.models.vaes.wan_vae import AutoencoderKLWan

        resized = cv2.resize(image, (width, height), interpolation=cv2.INTER_LANCZOS4)
        px = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)[None]
        is_video_vae = isinstance(self.vae, AutoencoderKLWan)
        key = ("vae_encode", tuple(px.shape), is_video_vae)
        enc = self._jit_cache.get(key)
        if enc is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def enc(state, v):
                m = nnx.merge(graphdef, state)
                if is_video_vae:
                    return m.encode(v[:, :, None])[:, :, 0]
                return m.encode(v)

            self._jit_cache[key] = enc
        _, vae_state = nnx.split(self.vae)
        z = enc(vae_state, px.astype(jnp.float32))
        return self.transformer.pack_latents(z.astype(jnp.float32))

    def _decode_frames(self, packed: jnp.ndarray, lat_h: int, lat_w: int) -> List[np.ndarray]:
        from apex_studio_tpu.models.vaes.wan_vae import AutoencoderKLWan

        z = self.transformer.unpack_latents(packed, lat_h, lat_w)
        # QwenImage ships a Wan-architecture causal video VAE used at T=1.
        is_video_vae = isinstance(self.vae, AutoencoderKLWan)
        key = ("vae_decode", tuple(z.shape), is_video_vae)
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, z):
                m = nnx.merge(graphdef, state)
                if is_video_vae:
                    return m.decode(z[:, :, None])[:, :, 0]
                return m.decode(z)

            self._jit_cache[key] = dec
        _, vae_state = nnx.split(self.vae)
        img = dec(vae_state, z.astype(jnp.float32))
        return self.tensor_to_frames(img)


@register_engine("qwenimage", "edit", "edit_plus")
class QwenImageEditEngine(QwenImageT2IEngine):
    """Instruction-based image editing (reference engine/qwenimage/edit.py and
    edit_plus.py "2509"): conditioning images are VAE-encoded, packed, and
    appended to the noise token sequence; each condition grid becomes a later
    RoPE "frame" (diffusers img_shapes convention); the DiT output is sliced
    back to the noise tokens. ``edit_plus`` differs only in allowing multiple
    condition images — both map here, with `image` as a path/array or a list.

    Divergence note: the reference conditions the Qwen2.5-VL encoder on the
    image via vision tokens; this build conditions the text branch on the edit
    system prompt only (the vision tower is a planned helper) while the DiT
    sees the full image latents.
    """

    system_message = EDIT_SYSTEM_MESSAGE

    def run(
        self,
        image: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        true_cfg_scale: float = 4.0,
        seed: Optional[int] = None,
        sigmas: Optional[List[float]] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 3,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting edit pipeline")
        if image is None:
            raise ValueError("edit requires at least one input image")
        images = image if isinstance(image, (list, tuple)) else [image]
        images = [self.load_image_input(im) for im in images]

        # Encode BEFORE the 20B DiT loads (staged single-chip residency).
        use_cfg = true_cfg_scale > 1.0 and negative_prompt is not None
        txt = self.encode_prompt(prompt or "")
        neg_txt = self.encode_prompt(negative_prompt or "") if use_cfg else None
        self.maybe_release_text_encoders()
        safe_emit_progress(progress_callback, 0.15, "Prompts ready")

        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

        cfg_t = self.transformer.cfg
        lat_scale = self.vae.cfg.spatial_scale if self.vae is not None else 8
        height -= height % (lat_scale * 2)
        width -= width % (lat_scale * 2)
        lat_c = cfg_t.out_channels
        lat_h, lat_w = height // lat_scale, width // lat_scale

        cond_tokens = [self.encode_image_latents(im, height, width) for im in images]
        cond = jnp.concatenate(cond_tokens, axis=1)
        cond_segments = tuple((lat_h // 2, lat_w // 2) for _ in cond_tokens)
        safe_emit_progress(progress_callback, 0.3, "Condition images encoded")

        noise = self.get_latents((1, lat_c, lat_h, lat_w), seed=seed)
        x = self.transformer.pack_latents(noise.astype(jnp.float32))
        n_noise = x.shape[1]

        if sigmas is None:
            sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = compute_dynamic_shift_mu(
            n_noise,
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

        # Fused hot loop: cond-concat + forward (+CFG) + Euler update in ONE
        # dispatch per step, latents donated.
        key = ("qwenimage_edit_step", x.shape, cond.shape, txt.shape[1],
               neg_txt.shape[1] if use_cfg else None, grid, cond_segments, use_cfg)
        step = self._jit_cache.get(key)
        if step is None:
            from apex_studio_tpu.engine.fused import build_euler_step

            def apply(m, x, aux, t_vec, cond, txt, neg_txt, g):
                x_in = x.astype(m.dtype)
                seq = jnp.concatenate([x_in, cond.astype(x_in.dtype)], axis=1)

                def fw(txt_):
                    out = m(seq, txt_, t_vec, grid_hw=grid, extra_segments=cond_segments)
                    return out[:, :n_noise].astype(jnp.float32)

                v = fw(txt)
                if use_cfg:
                    v_neg = fw(neg_txt)
                    v = v_neg + g * (v - v_neg)
                return v, aux

            step = build_euler_step(graphdef, apply)
            self._jit_cache[key] = step

        denoise_cb = make_mapped_progress(progress_callback, 0.4, 0.9)
        for i, t in enumerate(ts):
            t_vec = jnp.full((1,), float(t) / 1000.0, jnp.float32)
            x, _ = step(
                tf_state, x,
                float(self.scheduler.sigmas[i]), float(self.scheduler.sigmas[i + 1]),
                (), t_vec, cond, txt, neg_txt if use_cfg else txt,
                jnp.float32(true_cfg_scale if use_cfg else 1.0),
            )

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
        safe_emit_progress(progress_callback, 1.0, "Completed edit pipeline")
        return frames


@register_engine("qwenimage", "controlnet")
class QwenImageControlNetEngine(QwenImageT2IEngine):
    """t2i guided by a separate QwenImageControlNetModel branch whose
    per-block residuals are injected into the main DiT (reference
    src/engine/qwenimage/controlnet.py; residual mapping base/model.py:970).
    The manifest declares the branch as a transformer component named
    ``controlnet`` (base: qwenimage.controlnet)."""

    def _load_controlnet(self):
        if "controlnet" in self.helpers:
            return self.helpers["controlnet"]
        from apex_studio_tpu.models.registry import transformer_registry

        spec = self.component_specs.get("controlnet")
        if spec is None:
            raise KeyError("manifest has no 'controlnet' component")
        cn = self._instantiate_family(transformer_registry, spec, "qwenimage")
        self.helpers["controlnet"] = cn
        return cn

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        control_image: Optional[Any] = None,
        controlnet_conditioning_scale: float = 1.0,
        control_guidance_start: float = 0.0,
        control_guidance_end: float = 1.0,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        true_cfg_scale: float = 4.0,
        seed: Optional[int] = None,
        sigmas: Optional[List[float]] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting controlnet pipeline")
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")
        controlnet = self._load_controlnet()
        if control_image is None:
            raise ValueError("controlnet requires a control_image")

        use_cfg = true_cfg_scale > 1.0 and negative_prompt is not None
        txt = self.encode_prompt(prompt or "")
        neg_txt = self.encode_prompt(negative_prompt or "") if use_cfg else None

        cfg_t = self.transformer.cfg
        lat_scale = self.vae.cfg.spatial_scale if self.vae is not None else 8
        height -= height % (lat_scale * 2)
        width -= width % (lat_scale * 2)
        lat_c = cfg_t.out_channels
        lat_h, lat_w = height // lat_scale, width // lat_scale

        cond_tokens = self.encode_image_latents(
            np.asarray(self.load_image_input(control_image)), height, width)

        noise = self.get_latents((1, lat_c, lat_h, lat_w), seed=seed)
        x = self.transformer.pack_latents(noise.astype(jnp.float32))

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
            self.scheduler, num_inference_steps, timesteps=timesteps,
            sigmas=sigmas, mu=mu)
        self.scheduler.set_begin_index(0)

        graphdef, tf_state = nnx.split(self.transformer)
        cn_graph, cn_state = nnx.split(controlnet)
        grid = (lat_h // 2, lat_w // 2)

        key = ("qwenimage_cn_step", x.shape, txt.shape[1],
               neg_txt.shape[1] if use_cfg else None, grid, use_cfg)
        step = self._jit_cache.get(key)
        if step is None:
            from apex_studio_tpu.engine.fused import build_euler_step

            def apply(m, x, aux, t_vec, txt, neg_txt, g, cn_s, cond, cscale):
                cn = nnx.merge(cn_graph, cn_s)
                x_in = x.astype(m.dtype)
                samples = cn(x_in, cond.astype(m.dtype), txt, t_vec,
                             grid_hw=grid, conditioning_scale=cscale)
                v = m(x_in, txt, t_vec, grid_hw=grid,
                      controlnet_block_samples=samples).astype(jnp.float32)
                if use_cfg:
                    s_neg = cn(x_in, cond.astype(m.dtype), neg_txt, t_vec,
                               grid_hw=grid, conditioning_scale=cscale)
                    v_neg = m(x_in, neg_txt, t_vec, grid_hw=grid,
                              controlnet_block_samples=s_neg).astype(jnp.float32)
                    v = v_neg + g * (v - v_neg)
                return v, aux

            step = build_euler_step(graphdef, apply)
            self._jit_cache[key] = step

        denoise_cb = make_mapped_progress(progress_callback, 0.4, 0.9)
        n_steps = len(ts)
        for i, t in enumerate(ts):
            # control_guidance window (controlnet.py:182 controlnet_keep)
            frac = i / max(n_steps - 1, 1)
            keep = 1.0 - float(frac < control_guidance_start
                               or frac > control_guidance_end)
            t_vec = jnp.full((1,), float(t) / 1000.0, jnp.float32)
            x, _ = step(
                tf_state, x,
                float(self.scheduler.sigmas[i]), float(self.scheduler.sigmas[i + 1]),
                (), t_vec, txt, neg_txt if use_cfg else txt,
                jnp.float32(true_cfg_scale if use_cfg else 1.0),
                cn_state, cond_tokens,
                jnp.float32(controlnet_conditioning_scale * keep),
            )
            if denoise_cb is not None:
                denoise_cb(min((i + 1) / n_steps, 1.0),
                           f"Denoising step {i + 1}/{n_steps}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self._decode_frames(x, lat_h, lat_w)
        safe_emit_progress(progress_callback, 1.0, "Completed controlnet pipeline")
        return frames
