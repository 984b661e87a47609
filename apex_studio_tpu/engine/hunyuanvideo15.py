"""HunyuanVideo 1.5 engines (t2v + i2v).

Contract parity with the reference's ``engine/hunyuanvideo15/shared/__init__.py``:
- mllm conditioning: Qwen2.5-VL chat template with the video-description
  system message, hidden_states[-(2+1)], template prefix cropped
  (crop_start=108), max length 1000 (+crop)
- byT5 glyph branch: text inside quotes is encoded by byT5-small; zeros
  otherwise (shared/__init__.py:228)
- FlowMatchDiscrete sampler; CFG cond/uncond
- latent packing: [noise(32) | cond(32) | mask(1)] channels; zeros for t2v,
  image latent at frame 0 + mask=1 for i2v (i2v.py:19)
- i2v vision stream: SigLIP last_hidden_state (729×1152) through the DiT's
  image_embedder with cond-type 2 (shared/__init__.py:301)
"""

from __future__ import annotations

import logging
import re
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.hunyuanvideo15")

SYSTEM_MESSAGE = (
    "You are a helpful assistant. Describe the video by detailing the following aspects: "
    "1. The main content and theme of the video. "
    "2. The color, shape, size, texture, quantity, text, and spatial relationships of the objects. "
    "3. Actions, events, behaviors temporal relationships, physical movement changes of the objects. "
    "4. background environment, light, style and atmosphere. "
    "5. camera angles, movements, and transitions used in the video."
)

_GLYPH_RE = re.compile(r"[\"“”'](.+?)[\"“”']")


def extract_glyph_text(prompt: str) -> Optional[str]:
    spans = _GLYPH_RE.findall(prompt or "")
    return ". ".join(spans) if spans else None


@register_engine("hunyuanvideo15", "t2v")
class HunyuanVideo15T2VEngine(BaseEngine):
    def __init__(self, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.text_encoder_2 = None

    def load_text_encoders(self) -> None:
        from apex_studio_tpu.text_encoder import TextEncoder

        te_specs = [s for s in self.component_specs.values() if s.get("type") == "text_encoder"]
        mllm = next((s for s in te_specs if "Qwen" in (s.get("base") or "")), None)
        byt5 = next((s for s in te_specs if "T5" in (s.get("base") or "")), None)
        if self.text_encoder is None and mllm is not None:
            self.text_encoder = TextEncoder(self, mllm)
        if self.text_encoder_2 is None and byt5 is not None:
            self.text_encoder_2 = TextEncoder(self, byt5)

    def _encode_mllm(self, prompt: str, max_length: int = 1000, crop_start: int = 108):
        from apex_studio_tpu.utils.disk_cache import EmbeddingCache

        te = self.text_encoder
        # Disk-cached like TextEncoder.encode: a repeat prompt never rebuilds
        # the 7B MLLM after release_text_encoders (staged single-chip memory).
        cache = EmbeddingCache("hyv15_mllm")
        cache_key = {
            "prompt": prompt, "max_len": max_length, "crop": crop_start,
            "base": te.base,
            "weights": str(te.spec.get("model_path") or "")[:256],
            "config": te.spec.get("config") or te.spec.get("config_path") or "",
        }
        hit = cache.load(cache_key)
        if hit is not None:
            h, m = hit
            return jnp.asarray(h), jnp.asarray(m)
        model = te._ensure_model()
        text = (
            f"<|im_start|>system\n{SYSTEM_MESSAGE}<|im_end|>\n"
            f"<|im_start|>user\n{prompt}<|im_end|>\n<|im_start|>assistant\n"
        )
        ids, mask = te.tokenize([text], max_length + crop_start)
        graphdef, state = nnx.split(model)
        key = ("te_fwd", "hyv15_mllm", ids.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, ids, mask):
                m = nnx.merge(graphdef, state)
                return m(ids, attention_mask=mask, num_hidden_layers_to_skip=2)

            self._jit_cache[key] = fwd
        hidden = fwd(state, jnp.asarray(ids), jnp.asarray(mask))
        hidden, mask = hidden[:, crop_start:], jnp.asarray(mask)[:, crop_start:]
        cache.store(cache_key, np.asarray(hidden, np.float32), np.asarray(mask))
        return hidden, mask

    def _encode_byt5(self, prompt: str, max_length: int = 128):
        glyph = extract_glyph_text(prompt)
        dim = self.transformer.cfg.text_embed_2_dim
        if glyph is None or self.text_encoder_2 is None:
            return (
                jnp.zeros((1, max_length, dim), jnp.float32),
                jnp.zeros((1, max_length), jnp.int32),
            )
        hidden, mask = self.text_encoder_2.encode(
            [glyph], max_sequence_length=max_length, use_chat_template=False
        )
        return hidden, mask

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 720,
        width: int = 1280,
        duration: Optional[float] = None,
        fps: int = 24,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        guidance_rescale: float = 0.0,
        seed: Optional[int] = None,
        latents: Optional[np.ndarray] = None,
        shift: Optional[float] = None,
        timesteps: Optional[List[float]] = None,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 5,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        _image = _.pop("_image", None)
        safe_emit_progress(progress_callback, 0.0, "Starting pipeline")
        # Encode the 7B MLLM branch BEFORE the DiT loads (staged single-chip
        # residency, engine/base.py release_text_encoders); the small byT5
        # glyph branch runs after since it needs the transformer's dims.
        self.load_text_encoders()
        use_cfg = guidance_scale > 1.0
        text, text_mask = self._encode_mllm(prompt or "")
        if use_cfg:
            ntext, ntext_mask = self._encode_mllm(negative_prompt or "")
        if offload:
            self.maybe_release_text_encoders()
        if self.transformer is None:
            self.load_component_by_type("transformer")
        # The VAE defines the latent geometry — always load it.
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")
        safe_emit_progress(progress_callback, 0.05, "Components ready")

        vae_cfg = self.vae.cfg if self.vae is not None else None
        s_scale = vae_cfg.spatial_scale if vae_cfg else 16
        t_scale = vae_cfg.temporal_scale if vae_cfg else 4
        height -= height % s_scale
        width -= width % s_scale
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)

        text2, text2_mask = self._encode_byt5(prompt or "")
        if use_cfg:
            ntext2, ntext2_mask = self._encode_byt5(negative_prompt or "")
        safe_emit_progress(progress_callback, 0.2, "Prompts ready")

        cfg_t = self.transformer.cfg
        lat_c = cfg_t.out_channels
        lat_t = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        x = self.get_latents((1, lat_c, lat_t, lat_h, lat_w), seed=seed, latents=latents)
        cond, mask_ch, image_embeds, img_zeroed = self._prepare_cond(
            _image, height, width, lat_t, lat_h, lat_w, cfg_t, lat_c
        )
        import os as _os

        big_run = lat_h * lat_w > int(_os.environ.get(
            "APEX_VAE_TILE_THRESHOLD", self.VAE_TILE_THRESHOLD))
        # Few-step runs never render intermediates (matches the check at the
        # denoise loop); decide it HERE so the VAE-release logic below sees
        # the effective flag.
        if num_inference_steps <= 8 and timesteps is None:
            render_on_step = False
        vae_released = False
        if offload and (self.mesh is None or self.mesh.devices.size <= 1):
            # vision/image-encode stages are consumed; free their weights and
            # executables — the 112k-token CFG denoise next to an 8 GB DiT
            # leaves no single-chip slack. At 720p-class sizes the 2.3 GB VAE
            # goes too (decode_latents reloads it lazily; by then the DiT
            # itself has been released). Previews during a big run ride the
            # light TAE decoder only — a mid-denoise full-VAE reload would
            # re-OOM the chip, so without a light VAE previews are skipped.
            import gc as _gc

            self.helpers.clear()
            for k in [k for k in self._jit_cache
                      if isinstance(k, tuple) and k
                      and str(k[0]).startswith(("siglip", "vae_encode",
                                                "hyv15_img", "hyv15_vae"))]:
                del self._jit_cache[k]
            if big_run and not return_latents:
                if render_on_step and self._get_preview_vae() is None:
                    logger.warning(
                        "big-run previews need the light VAE (none loadable); "
                        "disabling render_on_step to keep the denoise in HBM")
                    render_on_step = False
                self.vae = None
                vae_released = True
            _gc.collect()
        safe_emit_progress(progress_callback, 0.3, "Initialized latent noise")

        ts, _ = self.get_timesteps(
            self.scheduler, num_inference_steps, timesteps=timesteps,
            **({"shift": shift} if shift is not None else {}),
        )
        safe_emit_progress(progress_callback, 0.4, "Timesteps computed; starting denoise")

        graphdef, tf_state = nnx.split(self.transformer)
        has_img = image_embeds is not None
        use_rescale = bool(use_cfg and guidance_rescale and guidance_rescale > 0)
        # At 720p x 121f (112k tokens) one CFG-fused graph holding BOTH
        # forwards' live sets does not fit a single 16 GB chip next to the
        # 8 GB DiT. Split CFG into two single-forward dispatches + one tiny
        # combine/Euler dispatch — each graph has the same peak as the
        # no-CFG path; the extra dispatch overhead is microseconds against a
        # 40 s/step forward. Without CFG the fully fused single dispatch
        # remains (reference eager loop: shared/__init__.py:26 + i2v.py:341).
        split_cfg = bool(use_cfg and (self.mesh is None
                                      or self.mesh.devices.size <= 1))
        key = ("hyv15_step", (1, cfg_t.in_channels, lat_t, lat_h, lat_w),
               text.shape[1], text2.shape[1], has_img, img_zeroed, use_cfg,
               use_rescale, split_cfg)
        step = self._jit_cache.get(key)
        if step is None:
            from apex_studio_tpu.engine.fused import build_euler_step

            def fw(m, x, t_vec, text, text_mask, text2, text2_mask,
                   cond, mask_ch, *img):
                x_in = jnp.concatenate([x, cond, mask_ch], axis=1).astype(m.dtype)
                img_kw = (
                    {"image_embeds": img[0], "image_stream_zeroed": img_zeroed}
                    if img else {}
                )
                return m(x_in, t_vec, text, text_mask, text2, text2_mask,
                         **img_kw).astype(jnp.float32)

            def _combine(v, v_neg, g, g_re):
                out = v_neg + g * (v - v_neg)
                if use_rescale:
                    # arXiv:2305.08891 §3.4 overexposure rescale (i2v.py:341)
                    std_pos = jnp.std(v_neg + (out - v_neg) / g)
                    std_cfg = jnp.std(out)
                    rescaled = out * (std_pos / jnp.maximum(std_cfg, 1e-8))
                    out = g_re * rescaled + (1 - g_re) * out
                return out

            if split_cfg:
                import functools

                @jax.jit
                def half(state, x, t_vec, text, text_mask, text2, text2_mask,
                         cond, mask_ch, *img):
                    return fw(nnx.merge(graphdef, state), x, t_vec, text,
                              text_mask, text2, text2_mask, cond, mask_ch, *img)

                @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
                def euler(x, v, v_neg, sig, sig_next, g, g_re):
                    out = _combine(v, v_neg, g, g_re)
                    x32 = x.astype(jnp.float32)
                    return (x32 + (sig_next - sig) * out).astype(x.dtype)

                def step(state, x, sig, sig_next, _aux, t_vec, cond, mask_ch,
                         text, text_mask, text2, text2_mask, ntext, ntext_mask,
                         ntext2, ntext2_mask, g, g_re, *img):
                    v = half(state, x, t_vec, text, text_mask, text2,
                             text2_mask, cond, mask_ch, *img)
                    v_neg = half(state, x, t_vec, ntext, ntext_mask, ntext2,
                                 ntext2_mask, cond, mask_ch, *img)
                    return euler(x, v, v_neg, jnp.float32(sig),
                                 jnp.float32(sig_next), g, g_re), _aux
            else:
                def apply(m, x, aux, t_vec, cond, mask_ch, text, text_mask,
                          text2, text2_mask, ntext, ntext_mask, ntext2,
                          ntext2_mask, g, g_re, *img):
                    v = fw(m, x, t_vec, text, text_mask, text2, text2_mask,
                           cond, mask_ch, *img)
                    if use_cfg:
                        v_neg = fw(m, x, t_vec, ntext, ntext_mask, ntext2,
                                   ntext2_mask, cond, mask_ch, *img)
                        v = _combine(v, v_neg, g, g_re)
                    return v, aux

                step = build_euler_step(graphdef, apply)
            self._jit_cache[key] = step
        img_args = (image_embeds,) if has_img else ()
        if not use_cfg:
            ntext, ntext_mask, ntext2, ntext2_mask = text, text_mask, text2, text2_mask

        denoise_cb = make_mapped_progress(progress_callback, 0.4, 0.9)
        if len(ts) <= 8:
            render_on_step = False
        for i, t in enumerate(ts):
            t_vec = jnp.full((1,), float(t), jnp.float32)
            x, _ = step(
                tf_state, x,
                float(self.scheduler.sigmas[i]), float(self.scheduler.sigmas[i + 1]),
                (), t_vec, cond, mask_ch, text, text_mask, text2, text2_mask,
                ntext, ntext_mask, ntext2, ntext2_mask,
                jnp.float32(guidance_scale), jnp.float32(guidance_rescale or 0.0),
                *img_args,
            )

            if (
                render_on_step
                and render_on_step_callback is not None
                and (i + 1) % render_on_step_interval == 0
                and i + 1 < len(ts)
            ):
                try:
                    fb = None if vae_released else self.decode_latents
                    render_on_step_callback(self.preview_frames(x, fb), i)
                except Exception:
                    logger.exception("preview callback failed")
            if denoise_cb is not None:
                denoise_cb(min((i + 1) / len(ts), 1.0), f"Denoising step {i + 1}/{len(ts)}")

        safe_emit_progress(progress_callback, 0.9, "Denoising complete")
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        # A 720p-class tiled decode needs ~10 GB of upsampled activations —
        # it and the 8 GB DiT can't share one v5e. Drop the DiT first (the
        # reference's group offloading makes the same trade before decode,
        # group_offloading.py); run() reloads it lazily on the next call.
        if (offload and big_run
                and (self.mesh is None or self.mesh.devices.size <= 1)):
            import gc

            del tf_state
            self.transformer = None
            self.helpers.clear()  # SigLIP vision tokens are already consumed
            self._jit_cache = {k: v for k, v in self._jit_cache.items()
                               if not (isinstance(k, tuple) and k
                                       and k[0] in ("hyv15_step", "te_fwd"))}
            gc.collect()
            logger.info("released transformer before %dx%d tiled decode",
                        lat_h, lat_w)
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames

    # Latent tiles bigger than this decode spatially tiled: a full 720p x
    # 121f 3D decode materializes tens of GB of upsampled activations
    # (reference tiled_decode, base_engine.py:2030). Threshold/tile sizes in
    # LATENT px; override via APEX_VAE_TILE / APEX_VAE_TILE_THRESHOLD.
    # 16x spatial upscale: an 8-latent tile is already a 128px pixel tile.
    # The decoder's widest stage holds [T, H_px, W_px, 128] plus f32 norm and
    # edge-pad copies — at 121 frames a 256px tile already needs ~19 GB, a
    # 128px tile ~5 GB (measured via XLA compile estimates on v5e).
    VAE_TILE = 8
    VAE_TILE_THRESHOLD = 40 * 40

    def decode_latents(self, z: jnp.ndarray) -> List[np.ndarray]:
        import os as _os

        if self.vae is None:  # released during a 720p-class denoise
            self.load_component_by_type("vae")
        thresh = int(_os.environ.get("APEX_VAE_TILE_THRESHOLD",
                                     self.VAE_TILE_THRESHOLD))
        tiled = z.ndim == 5 and z.shape[-2] * z.shape[-1] > thresh
        key = ("hyv15_vae_decode", tuple(z.shape), tiled)
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
        video = dec(vae_state, z.astype(jnp.float32))
        b, c, t, h, w = video.shape
        frames_nchw = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames_nchw)

    # t2v keeps the 729 vision slots in context as bare cond-type-2 tokens
    # (reference shared/__init__.py:66 vision_num_semantic_tokens + the
    # model's is_t2v zeroed-stream branch) — dropping them would change every
    # softmax vs the published model.
    VISION_TOKENS = 729

    def _prepare_cond(self, image, height, width, lat_t, lat_h, lat_w, cfg_t, lat_c):
        """t2v: zero cond latents + zero mask channel; zeroed vision stream."""
        cond = jnp.zeros((1, cfg_t.in_channels - lat_c - 1, lat_t, lat_h, lat_w), jnp.float32)
        mask_ch = jnp.zeros((1, 1, lat_t, lat_h, lat_w), jnp.float32)
        image_embeds = jnp.zeros(
            (1, self.VISION_TOKENS, cfg_t.image_embed_dim), jnp.float32
        )
        return cond, mask_ch, image_embeds, True


@register_engine("hunyuanvideo15", "i2v")
class HunyuanVideo15I2VEngine(HunyuanVideo15T2VEngine):
    """i2v: first-frame latent conditioning + SigLIP vision tokens
    (reference engine/hunyuanvideo15/i2v.py)."""

    def run(self, *args: Any, image=None, **kwargs: Any):
        if image is None:
            raise ValueError("hunyuanvideo15 i2v requires an input image")
        kwargs["_image"] = self.load_image_input(image)
        return super().run(*args, **kwargs)

    def _encode_image_latents(self, image: np.ndarray, height: int, width: int):
        import cv2

        resized = cv2.resize(np.asarray(image), (width, height),
                             interpolation=cv2.INTER_LANCZOS4)
        px = resized.astype(np.float32) / 127.5 - 1.0
        video = jnp.asarray(px.transpose(2, 0, 1))[None, :, None]  # [1,3,1,H,W]
        return self.encode_video_latents(video)  # [1,C,1,h,w] (disk-cached)

    def encode_image_siglip(self, image: np.ndarray) -> jnp.ndarray:
        from apex_studio_tpu.models.text_encoders.siglip import preprocess_siglip_image

        encoder = self.load_helper("image_encoder")
        pixels = jnp.asarray(preprocess_siglip_image(
            np.asarray(image), getattr(encoder.cfg, "image_size", 384)))
        graphdef, state = nnx.split(encoder)
        key = ("siglip_fwd", tuple(pixels.shape))
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, px):
                return nnx.merge(graphdef, state)(px)

            self._jit_cache[key] = fwd
        return fwd(state, pixels)

    def _prepare_cond(self, image, height, width, lat_t, lat_h, lat_w, cfg_t, lat_c):
        z = self._encode_image_latents(image, height, width)  # [1,C,1,h,w]
        cond = jnp.concatenate(
            [z.astype(jnp.float32),
             jnp.zeros((1, z.shape[1], lat_t - 1, lat_h, lat_w), jnp.float32)],
            axis=2,
        )
        mask_ch = jnp.zeros((1, 1, lat_t, lat_h, lat_w), jnp.float32)
        mask_ch = mask_ch.at[:, :, 0].set(1.0)
        try:
            image_embeds = self.encode_image_siglip(image)
            img_zeroed = False
        except KeyError:
            logger.warning("no image_encoder helper in manifest; i2v falls back "
                           "to the t2v zeroed vision stream")
            image_embeds = jnp.zeros(
                (1, self.VISION_TOKENS, cfg_t.image_embed_dim), jnp.float32)
            img_zeroed = True
        return cond, mask_ch, image_embeds, img_zeroed
