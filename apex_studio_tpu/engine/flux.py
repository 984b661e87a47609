"""Flux engines (t2i) — dual-encoder (CLIP pooled + T5) MMDiT pipeline.

Contract parity with the reference's ``engine/flux/t2i.py:20`` +
``engine/flux/shared.py``: packed 2×2 latents (shared.py:30), dynamic shift
from image_seq_len (shared.py:58), embedded guidance vector for dev models,
optional true CFG (true_cfg_scale > 1 with a negative prompt), model timestep
= sigma (t/1000). Seeded noise is drawn at the unpacked latent shape then
packed, matching the reference's generator order.
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

logger = logging.getLogger("apex.engine.flux")


@register_engine("flux", "t2i")
class FluxT2IEngine(BaseEngine):
    """text_encoder = CLIP-L (pooled), text_encoder_2 = T5-XXL (sequence)."""

    def __init__(self, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.text_encoder_2 = None

    def _spec_for_name(self, name: str) -> Optional[Dict[str, Any]]:
        return self.component_specs.get(name)

    def load_text_encoders(self) -> None:
        from apex_studio_tpu.text_encoder import TextEncoder

        # Manifest lists two text_encoder components (CLIPTextModel + T5EncoderModel).
        te_specs = [s for s in self.component_specs.values() if s.get("type") == "text_encoder"]
        clip_spec = next((s for s in te_specs if "CLIP" in (s.get("base") or "")), None)
        t5_spec = next((s for s in te_specs if "T5" in (s.get("base") or "")), None)
        if clip_spec is None or t5_spec is None:
            raise KeyError("flux manifest requires CLIP and T5 text_encoder components")
        if self.text_encoder is None:
            self.text_encoder = TextEncoder(self, clip_spec)
        if self.text_encoder_2 is None:
            self.text_encoder_2 = TextEncoder(self, t5_spec)

    def encode_prompt(self, prompt: str, prompt_2: Optional[str], max_sequence_length: int):
        """→ (pooled [1, 768], t5_seq [1, L, 4096])."""
        self.load_text_encoders()
        clip = self.text_encoder
        t5 = self.text_encoder_2

        ids, mask = clip.tokenize([prompt], 77)
        model = clip._ensure_model()
        graphdef, state = nnx.split(model)
        key = ("clip_fwd", ids.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, ids, mask):
                m = nnx.merge(graphdef, state)
                return m(ids, attention_mask=mask)

            self._jit_cache[key] = fwd
        _, pooled = fwd(state, jnp.asarray(ids), jnp.asarray(mask))

        # T5 goes through the disk-cached TextEncoder.encode so a repeat
        # prompt never rebuilds the 4.7B encoder after release_text_encoders.
        seq, _ = t5.encode([prompt_2 or prompt], max_sequence_length,
                           use_chat_template=False)
        return pooled, seq

    def run(
        self,
        prompt: Optional[str] = None,
        prompt_2: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        negative_prompt_2: Optional[str] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 30,
        guidance_scale: float = 3.5,
        true_cfg_scale: float = 1.0,
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
        _kontext_image: Any = None,
        _kontext_tokens: Any = None,  # (tokens [B,N,64], grids) pre-packed
        _fill_cond: Optional[jnp.ndarray] = None,  # [B, N, 320] masked-img+mask tokens
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting t2i pipeline")

        # The VAE defines the latent geometry — always load it.
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

        use_cfg = true_cfg_scale > 1.0 and negative_prompt is not None

        # Encode BEFORE the transformer loads: a T5-XXL and a 12B DiT never
        # run concurrently, and staged residency is what lets both fit one
        # chip (release_text_encoders, engine/base.py).
        safe_emit_progress(progress_callback, 0.02, "Encoding prompts")
        pooled, seq = self.encode_prompt(prompt or "", prompt_2, max_sequence_length)
        neg_pooled = neg_seq = None
        if use_cfg:
            neg_pooled, neg_seq = self.encode_prompt(
                negative_prompt or "", negative_prompt_2, max_sequence_length
            )
        if offload:
            # only the 4.7B T5 — CLIP-L is 0.1 GB and its pooled output is
            # not disk-cached, so keeping it avoids a rebuild every run
            self.maybe_release_text_encoders(names=("text_encoder_2",))
        safe_emit_progress(progress_callback, 0.20, "Encoded prompts")

        if self.transformer is None:
            self.load_component_by_type("transformer")

        cfg_t = self.transformer.cfg
        lat_scale = self.vae.cfg.spatial_scale if self.vae is not None else 8
        # Snap to the packing grid (2 latent px = 16 image px).
        height = height - height % (lat_scale * 2)
        width = width - width % (lat_scale * 2)
        lat_c = cfg_t.out_channels // 4
        lat_h, lat_w = height // lat_scale, width // lat_scale
        b = num_images

        noise = self.get_latents((b, lat_c, lat_h, lat_w), seed=seed, latents=latents)
        x = self.transformer.pack_latents(noise.astype(jnp.float32))

        cond_tokens = cond_grid = None
        if _kontext_tokens is not None:
            cond_tokens, cond_grid = _kontext_tokens
            cond_tokens = jnp.broadcast_to(
                cond_tokens, (b, *cond_tokens.shape[1:]))
        elif _kontext_image is not None:
            cond_tokens, cond_grid = self._encode_kontext_image(
                _kontext_image, height, width, lat_scale, b
            )
        safe_emit_progress(progress_callback, 0.38, "Initialized latent noise")

        image_seq_len = x.shape[1]
        if sigmas is None:
            sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
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
        self.scheduler.set_begin_index(0)
        safe_emit_progress(progress_callback, 0.48, "Timesteps computed")

        guidance = (
            jnp.full((b,), guidance_scale, jnp.float32) if cfg_t.guidance_embeds else None
        )

        graphdef, tf_state = nnx.split(self.transformer)
        grid = (lat_h // 2, lat_w // 2)
        # Fused hot loop: forward (+fill concat, +CFG) and the Euler update in
        # ONE dispatch per step, latents donated (reference eager loop:
        # engine/flux/t2i.py + shared.py denoise).
        key = ("flux_step", x.shape, seq.shape[1], cond_grid, grid, use_cfg,
               _fill_cond is not None)
        step = self._jit_cache.get(key)
        if step is None:
            from apex_studio_tpu.engine.fused import build_euler_step

            def apply(m, x, aux, t_vec, seq, pooled, n_seq, n_pooled, guidance, cond, fill, g):
                x_in = x.astype(m.dtype)
                if fill is not None:
                    # Fill models: [noise(64) | masked image(64) | 8x8 mask bits(256)]
                    x_in = jnp.concatenate([x_in, fill.astype(m.dtype)], axis=-1)

                def fw(s_, p_):
                    return m(x_in, s_, p_, t_vec, guidance, grid_hw=grid,
                             cond_tokens=cond, cond_grid_hw=cond_grid)

                v = fw(seq, pooled).astype(jnp.float32)
                if use_cfg:
                    v_neg = fw(n_seq, n_pooled).astype(jnp.float32)
                    v = v_neg + g * (v - v_neg)
                return v, aux

            step = build_euler_step(graphdef, apply)
            self._jit_cache[key] = step

        denoise_cb = make_mapped_progress(progress_callback, 0.50, 0.90)
        for i, t in enumerate(ts):
            t_vec = jnp.full((b,), float(t) / 1000.0, jnp.float32)
            x, _ = step(
                tf_state, x,
                float(self.scheduler.sigmas[i]), float(self.scheduler.sigmas[i + 1]),
                (), t_vec, seq, pooled,
                neg_seq if use_cfg else seq,
                neg_pooled if use_cfg else pooled,
                guidance, cond_tokens, _fill_cond,
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

        safe_emit_progress(progress_callback, 0.90, "Denoising complete")
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

    def _encode_kontext_image(self, image, height, width, lat_scale, b):
        """Reference image → clean packed latent tokens at the target size."""
        import cv2

        if isinstance(image, (str, bytes)) or hasattr(image, "__fspath__"):
            from apex_studio_tpu.preprocess.base import load_frames

            image = load_frames(image)[0]
        image = np.asarray(image)
        resized = cv2.resize(image, (width, height), interpolation=cv2.INTER_LANCZOS4)
        px = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)[None]

        graphdef, vae_state = nnx.split(self.vae)
        key = ("flux_vae_encode", tuple(px.shape))
        enc = self._jit_cache.get(key)
        if enc is None:

            @jax.jit
            def enc(state, x):
                return nnx.merge(graphdef, state).encode(x)

            self._jit_cache[key] = enc
        z = enc(vae_state, px)
        tokens = self.transformer.pack_latents(z.astype(jnp.float32))
        tokens = jnp.broadcast_to(tokens, (b, *tokens.shape[1:]))
        lat_h, lat_w = z.shape[-2:]
        return tokens, (lat_h // 2, lat_w // 2)


@register_engine("flux", "kontext")
class FluxKontextEngine(FluxT2IEngine):
    """Flux Kontext image editing (reference engine/flux/kontext.py role):
    the reference image's clean VAE latents join the image stream at RoPE
    t-index 1; only the noisy target tokens are denoised and returned."""

    def run(self, image=None, **kwargs):
        if image is None:
            raise ValueError("kontext requires an input image")
        kwargs.pop("_kontext_image", None)
        return super().run(_kontext_image=image, **kwargs)


@register_engine("flux", "fill")
class FluxFillEngine(FluxT2IEngine):
    """Flux Fill inpainting (reference engine/flux/fill.py role): the model's
    384 input channels are [noise(64) | VAE(masked image)(64) | 8×8 pixel mask
    bits per latent cell, packed 2×2 (256)]."""

    def run(self, image=None, mask_image=None, height: int = 1024,
            width: int = 1024, **kwargs):
        if image is None or mask_image is None:
            raise ValueError("fill requires both image and mask_image")
        import cv2

        if self.vae is None:
            self.load_component_by_type("vae")
        if self.transformer is None:
            self.load_component_by_type("transformer")

        lat_scale = self.vae.cfg.spatial_scale
        height -= height % (lat_scale * 2)
        width -= width % (lat_scale * 2)

        def to_frame(x):
            if isinstance(x, (str, bytes)) or hasattr(x, "__fspath__"):
                from apex_studio_tpu.preprocess.base import load_frames

                return load_frames(x)[0]
            return np.asarray(x)

        img = cv2.resize(to_frame(image), (width, height), interpolation=cv2.INTER_LANCZOS4)
        mask = to_frame(mask_image)
        if mask.ndim == 3:
            mask = mask[..., 0]
        mask = cv2.resize(mask, (width, height), interpolation=cv2.INTER_NEAREST)
        mask01 = (mask > 127).astype(np.float32)

        # Masked image → VAE latents → packed tokens (64).
        masked = img.astype(np.float32) / 127.5 - 1.0
        masked = masked * (1.0 - mask01)[..., None]
        px = jnp.asarray(masked).transpose(2, 0, 1)[None]
        graphdef, vae_state = nnx.split(self.vae)
        key = ("flux_vae_encode", tuple(px.shape))
        enc = self._jit_cache.get(key)
        if enc is None:

            @jax.jit
            def enc(state, x):
                return nnx.merge(graphdef, state).encode(x)

            self._jit_cache[key] = enc
        masked_tokens = self.transformer.pack_latents(
            enc(vae_state, px).astype(jnp.float32)
        )

        # Pixel mask → 8×8 bits per latent cell → packed 2×2 (256 per token).
        s = lat_scale
        lat_h, lat_w = height // s, width // s
        m = mask01.reshape(lat_h, s, lat_w, s).transpose(1, 3, 0, 2)  # [s,s,lh,lw]
        m = m.reshape(1, s * s, lat_h, lat_w)
        mask_tokens = self.transformer.pack_latents(jnp.asarray(m))

        fill_cond = jnp.concatenate([masked_tokens, mask_tokens], axis=-1)
        kwargs.pop("_fill_cond", None)
        return super().run(height=height, width=width, _fill_cond=fill_cond, **kwargs)


@register_engine("flux", "control")
class FluxControlEngine(FluxT2IEngine):
    """Flux Control (Canny/Depth) conditioning (reference engine/flux/
    control.py role): the model's 128 input channels are [noise(64) |
    VAE(control image)(64)] — the control map rides the same per-token
    feature-concat path as Fill, without a mask."""

    def run(self, control_image=None, height: int = 1024, width: int = 1024, **kwargs):
        if control_image is None:
            raise ValueError("control requires a control_image")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.transformer is None:
            self.load_component_by_type("transformer")

        lat_scale = self.vae.cfg.spatial_scale
        height -= height % (lat_scale * 2)
        width -= width % (lat_scale * 2)
        tokens, _ = self._encode_kontext_image(control_image, height, width, lat_scale, 1)
        kwargs.pop("_fill_cond", None)
        return super().run(height=height, width=width, _fill_cond=tokens, **kwargs)


# Flux Kontext preferred buckets (reference dreamomni2.py PREFERRED_KONTEXT_RESOLUTIONS)
PREFERRED_KONTEXT_RESOLUTIONS = [
    (672, 1568), (688, 1504), (720, 1456), (752, 1392), (800, 1328),
    (832, 1248), (880, 1184), (944, 1104), (1024, 1024), (1104, 944),
    (1184, 880), (1248, 832), (1328, 800), (1392, 752), (1456, 720),
    (1504, 688), (1568, 672),
]


@register_engine("flux", "dreamomni2")
class FluxDreamOmni2Engine(FluxT2IEngine):
    """DreamOmni2 multi-reference generation/editing on the Kontext backbone
    (reference src/engine/flux/dreamomni2.py): every reference image is
    VAE-encoded at its preferred-aspect bucket and appended as clean tokens
    with RoPE frame id i+1 and accumulated width offsets
    (dreamomni2.py:398-407). The reference's optional Qwen2.5-VL prompt
    rewriter (``_prepare_prompt``) requires generative decoding and falls
    back to the raw prompt when no llm helper is shipped (the reference does
    the same when the helper is absent)."""

    def run(self, prompt=None, image_list=None, image=None,
            task: str = "generation",
            resize_to_preferred_resolution: bool = True, **kwargs):
        import cv2

        images = image_list if image_list is not None else image
        if images is None:
            raise ValueError("dreamomni2 requires at least one reference image")
        if not isinstance(images, (list, tuple)):
            images = [images]
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.transformer is None:
            self.load_component_by_type("transformer")

        all_tokens, grids = [], []
        for im in images:
            arr = np.asarray(self.load_image_input(im))
            h0, w0 = arr.shape[:2]
            if resize_to_preferred_resolution:
                ar = w0 / max(h0, 1)
                _, w1, h1 = min((abs(ar - w / h), w, h)
                                for h, w in PREFERRED_KONTEXT_RESOLUTIONS)
            else:
                w1, h1 = w0, h0
            w1 = max(16, w1 - w1 % 16)
            h1 = max(16, h1 - h1 % 16)
            resized = cv2.resize(arr, (w1, h1), interpolation=cv2.INTER_LANCZOS4)
            px = (resized.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)[None]
            graphdef, vae_state = nnx.split(self.vae)
            key = ("flux_vae_encode", tuple(px.shape))
            enc = self._jit_cache.get(key)
            if enc is None:

                @jax.jit
                def enc(state, x):
                    return nnx.merge(graphdef, state).encode(x)

                self._jit_cache[key] = enc
            z = enc(vae_state, jnp.asarray(px))
            all_tokens.append(self.transformer.pack_latents(z.astype(jnp.float32)))
            grids.append((z.shape[-2] // 2, z.shape[-1] // 2))

        cond_tokens = jnp.concatenate(all_tokens, axis=1)
        kwargs.pop("_kontext_image", None)
        return super().run(prompt=prompt,
                           _kontext_tokens=(cond_tokens, tuple(grids)), **kwargs)
