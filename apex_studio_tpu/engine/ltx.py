"""LTX-Video any-to-video engine (t2v / i2v / v2v extension).

Contract parity with the reference's ``engine/ltx/x2v.py`` (LTXX2VEngine):
- T5-XXL conditioning (128 tokens); empty negative → zero embeddings
  (x2v.py:861)
- token-sequence latents via the symmetric patchifier (f,h,w token order,
  helpers/ltx/patchifier.py:56) with per-token pixel coordinates; temporal
  coords scaled by 1/fps (x2v.py:1092); causal first-frame fix
  (x2v.py:283)
- conditioning items (image/video at frame 0): VAE-encoded latents lerped
  into the init noise with per-token conditioning strength (x2v.py:515);
  per-token timesteps ``min(t, 1 − strength)`` (x2v.py:1139); tokens only
  integrate once the global t drops below their level (x2v.py:59)
- guidance: CFG (+ optional cfg_star rescale x2v.py:1172), STG via
  skip-layer perturbed stream (x2v.py:1193) with std-ratio rescaling
- rectified-flow sampler with SD3/LinearQuadratic shifting; stochastic
  sampling and image-cond noise refresh supported
- decode: denormalize + optional decode_timestep noise blend
  (x2v.py:343) + tone-map compression (x2v.py:388)

TPU design: forwards are batched [neg|pos] in one compiled call; the STG
stream is a second compiled variant (static skip-block set). The denoise
loop sequences compiled steps only.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.ltx")


def patchify_tokens(lat: jnp.ndarray) -> jnp.ndarray:
    """[B,C,F,H,W] → [B, F·H·W, C] (f,h,w token order)."""
    b, c, f, h, w = lat.shape
    return jnp.transpose(lat, (0, 2, 3, 4, 1)).reshape(b, f * h * w, c)


def unpatchify_tokens(tok: jnp.ndarray, f: int, h: int, w: int) -> jnp.ndarray:
    b, s, c = tok.shape
    return jnp.transpose(tok.reshape(b, f, h, w, c), (0, 4, 1, 2, 3))


def latent_coords(f: int, h: int, w: int) -> np.ndarray:
    """[3, S] token-corner latent coordinates in (f,h,w) token order."""
    ft, hy, wx = np.meshgrid(np.arange(f), np.arange(h), np.arange(w), indexing="ij")
    return np.stack([ft.reshape(-1), hy.reshape(-1), wx.reshape(-1)], axis=0)


def tone_map_latents(latents: jnp.ndarray, compression: float) -> jnp.ndarray:
    if compression <= 0:
        return latents
    scale_factor = compression * 0.75
    sig = jax.nn.sigmoid(4.0 * scale_factor * (jnp.abs(latents) - 1.0))
    return latents * (1.0 - 0.8 * scale_factor * sig)


@register_engine("ltx", "x2v")
class LTXX2VEngine(BaseEngine):
    def _encode_prompt(self, prompt: str, max_length: int = 128):
        hidden, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=max_length, use_chat_template=False
        )
        return jnp.asarray(hidden, jnp.float32), jnp.asarray(mask)

    def _vae_encode_cond(self, media: np.ndarray) -> jnp.ndarray:
        """media [1,3,T,H,W] in [−1,1] → normalized latents."""
        key = ("ltx_vae_encode", tuple(media.shape))
        fn = self._jit_cache.get(key)
        if fn is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def fn(state, x):
                return nnx.merge(graphdef, state).encode(x)

            self._jit_cache[key] = fn
        _, state = nnx.split(self.vae)
        return fn(state, jnp.asarray(media, jnp.float32))

    def _fwd(self, n_tokens: int, n_ctx: int, batch: int, skip_blocks: Tuple[int, ...]):
        key = ("ltx_fwd", n_tokens, n_ctx, batch, skip_blocks)
        fn = self._jit_cache.get(key)
        if fn is None:
            graphdef, _ = nnx.split(self.transformer)

            import functools

            @functools.partial(jax.jit, static_argnames=("skips",))
            def fn(state, tokens, ctx, ctx_mask, t_tok, coords, skips=()):
                m = nnx.merge(graphdef, state)
                return m(tokens, ctx, t_tok, encoder_attention_mask=ctx_mask,
                         video_coords=coords, skip_blocks=skips)

            fn = functools.partial(fn, skips=skip_blocks)
            self._jit_cache[key] = fn
        return fn

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        conditions: Optional[List[Dict[str, Any]]] = None,
        image: Optional[Any] = None,
        initial_latents: Optional[np.ndarray] = None,
        height: int = 480,
        width: int = 832,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: int = 30,
        num_inference_steps: int = 30,
        skip_initial_inference_steps: int = 0,
        skip_final_inference_steps: int = 0,
        seed: Optional[int] = None,
        guidance_scale: float = 3.0,
        stg_scale: float = 0.0,
        rescaling_scale: float = 1.0,
        skip_block_list: Optional[List[int]] = None,
        cfg_star_rescale: bool = False,
        image_cond_noise_scale: float = 0.15,
        timesteps: Optional[List[float]] = None,
        decode_timestep: float = 0.0,
        decode_noise_scale: Optional[float] = None,
        tone_map_compression_ratio: float = 0.0,
        return_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        render_on_step_interval: int = 5,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting LTX any-to-video pipeline")
        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")
        safe_emit_progress(progress_callback, 0.05, "Components ready")

        vae_cfg = self.vae.cfg
        s_scale, t_scale = vae_cfg.spatial_scale, vae_cfg.temporal_scale
        height -= height % s_scale
        width -= width % s_scale
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)

        # Prompts: negative defaults to ZERO embeddings (x2v.py:861).
        ctx_pos, mask_pos = self._encode_prompt(prompt or "")
        if negative_prompt:
            ctx_neg, mask_neg = self._encode_prompt(negative_prompt)
        else:
            ctx_neg, mask_neg = jnp.zeros_like(ctx_pos), jnp.zeros_like(mask_pos)
        safe_emit_progress(progress_callback, 0.15, "Prompts ready")

        cfg_t = self.transformer.cfg
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        noise = self.get_latents((1, cfg_t.in_channels, lat_f, lat_h, lat_w), seed=seed)

        # Scheduler with resolution shifting over the 5D latent shape.
        self.scheduler.set_timesteps(
            num_inference_steps,
            samples_shape=(1, cfg_t.in_channels, lat_f, lat_h, lat_w),
            timesteps=timesteps,
        )
        ts = np.asarray(self.scheduler.timesteps, np.float64)
        if skip_initial_inference_steps or skip_final_inference_steps:
            ts = ts[skip_initial_inference_steps: len(ts) - skip_final_inference_steps]
            self.scheduler.timesteps = ts.astype(np.float32)
            self.scheduler.sigmas = np.concatenate([ts, [0.0]])

        # Initial latents: pure noise, or noise blended onto an input clip.
        if initial_latents is not None:
            lat0 = jnp.asarray(initial_latents, jnp.float32)
            lats = float(ts[0]) * noise + (1.0 - float(ts[0])) * lat0
        else:
            lats = noise
        safe_emit_progress(progress_callback, 0.25, "Initialized latent noise")

        # Conditioning items → in-place latent replacement + strength mask.
        conds = list(conditions or [])
        if image is not None:
            conds.insert(0, {"image": image, "frame_number": 0, "strength": 1.0})
        cond_mask_grid = None
        if conds:
            cond_mask_grid = jnp.zeros((1, lat_f, lat_h, lat_w), jnp.float32)
            for item in conds:
                frame_no = int(item.get("frame_number", 0))
                if frame_no != 0:
                    raise NotImplementedError(
                        "non-first-frame conditioning lands with the ltx2 engine"
                    )
                strength = float(item.get("strength", item.get("conditioning_strength", 1.0)))
                media = self._load_condition_media(item, height, width)
                z = self._vae_encode_cond(media)  # [1,C,fl,h,w]
                fl = z.shape[2]
                blended = (1 - strength) * lats[:, :, :fl] + strength * z.astype(jnp.float32)
                lats = lats.at[:, :, :fl].set(blended)
                cond_mask_grid = cond_mask_grid.at[:, :fl].set(strength)
        init_lats = lats

        # Tokenize + pixel coordinates.
        tokens = patchify_tokens(lats)
        n_tok = tokens.shape[1]
        coords = latent_coords(lat_f, lat_h, lat_w).astype(np.float64)
        scales = np.array([t_scale, s_scale, s_scale], np.float64)[:, None]
        pix = coords * scales
        if cfg_t.causal_temporal_positioning:
            pix[0] = np.clip(pix[0] + 1 - t_scale, 0, None)
        pix[0] = pix[0] / fps
        coords_j = jnp.asarray(pix[None], jnp.float32)  # [1,3,S]
        cond_mask = (
            patchify_tokens(cond_mask_grid[:, None])[..., 0]
            if cond_mask_grid is not None else None
        )  # [1, S]

        do_cfg = guidance_scale > 1.0
        do_stg = stg_scale > 0 and skip_block_list
        skips = tuple(int(i) for i in (skip_block_list or []))

        ctx_len = ctx_pos.shape[1]
        fwd_main = self._fwd(n_tok, ctx_len, 2 if do_cfg else 1, ())
        fwd_stg = self._fwd(n_tok, ctx_len, 1, skips) if do_stg else None

        if do_cfg:
            ctx_b = jnp.concatenate([ctx_neg, ctx_pos], axis=0)
            mask_b = jnp.concatenate([mask_neg, mask_pos], axis=0)
        else:
            ctx_b, mask_b = ctx_pos, mask_pos
        nb = ctx_b.shape[0]
        coords_b = jnp.tile(coords_j, (nb, 1, 1))

        _, tf_state = nnx.split(self.transformer)
        model_dtype = self.transformer.dtype
        denoise_cb = make_mapped_progress(progress_callback, 0.3, 0.9)
        rng = np.random.default_rng(seed if seed is not None else 0)

        for i, t in enumerate(ts):
            t_f = float(t)
            # Refresh noise on hard-conditioned tokens (x2v.py:95).
            if cond_mask is not None and image_cond_noise_scale > 0:
                fresh = jnp.asarray(
                    rng.standard_normal(init_lats.shape, np.float32))
                noised_init = init_lats + image_cond_noise_scale * (t_f ** 2) * fresh
                grid = unpatchify_tokens(tokens, lat_f, lat_h, lat_w)
                hard = (cond_mask_grid > 1.0 - 1e-6)[:, None]
                grid = jnp.where(hard, noised_init, grid)
                tokens = patchify_tokens(grid)

            # Per-token timesteps: conditioned tokens hold at 1−strength.
            if cond_mask is not None:
                t_tok = jnp.minimum(jnp.full_like(cond_mask, t_f), 1.0 - cond_mask)
            else:
                t_tok = jnp.full((1, 1), t_f, jnp.float32)
            t_tok_b = jnp.tile(t_tok, (nb, 1))

            tok_b = jnp.tile(tokens.astype(model_dtype), (nb, 1, 1))
            out = fwd_main(tf_state, tok_b, ctx_b.astype(model_dtype), mask_b,
                           t_tok_b, coords_b).astype(jnp.float32)
            if do_cfg:
                v_neg, v_pos = out[:1], out[1:2]
                if cfg_star_rescale:
                    dot = jnp.sum(v_pos * v_neg)
                    sq = jnp.sum(jnp.square(v_neg)) + 1e-8
                    v_neg = (dot / sq) * v_neg
                v = v_neg + guidance_scale * (v_pos - v_neg)
            else:
                v_pos = out[:1]
                v = v_pos
            if do_stg:
                v_ptb = fwd_stg(tf_state, tokens.astype(model_dtype),
                                ctx_pos.astype(model_dtype), mask_pos,
                                t_tok, coords_j).astype(jnp.float32)
                v = v + stg_scale * (v_pos - v_ptb)
                if rescaling_scale != 1.0:
                    factor = jnp.std(v_pos) / jnp.maximum(jnp.std(v), 1e-8)
                    factor = rescaling_scale * factor + (1 - rescaling_scale)
                    v = v * factor

            new_tokens = self.scheduler.step_tokens(
                v, t_tok if cond_mask is not None else jnp.full((1, n_tok), t_f), tokens
            )
            if cond_mask is not None:
                denoise_now = (t_f - 1e-6 < (1.0 - cond_mask))[..., None]
                tokens = jnp.where(denoise_now, new_tokens, tokens)
            else:
                tokens = new_tokens

            if (
                render_on_step and render_on_step_callback is not None
                and (i + 1) % render_on_step_interval == 0 and i + 1 < len(ts)
            ):
                try:
                    render_on_step_callback(self.decode_latents(
                        unpatchify_tokens(tokens, lat_f, lat_h, lat_w),
                        decode_timestep, decode_noise_scale,
                        tone_map_compression_ratio, seed), i)
                except Exception:
                    logger.exception("preview callback failed")
            if denoise_cb is not None:
                denoise_cb(min((i + 1) / len(ts), 1.0),
                           f"Denoising step {i + 1}/{len(ts)}")

        safe_emit_progress(progress_callback, 0.9, "Denoising complete")
        lats = unpatchify_tokens(tokens, lat_f, lat_h, lat_w)
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return lats
        frames = self.decode_latents(lats, decode_timestep, decode_noise_scale,
                                     tone_map_compression_ratio, seed)
        safe_emit_progress(progress_callback, 1.0, "Completed LTX pipeline")
        return frames

    def _load_condition_media(self, item: Dict[str, Any], height: int, width: int) -> np.ndarray:
        """→ [1,3,T,H,W] float32 in [−1,1]. Accepts HWC uint8 arrays, file
        paths, or already-[T,H,W,3] clips."""
        import cv2

        media = item.get("image") if item.get("image") is not None else item.get("video")
        img = (np.asarray(media) if (not isinstance(media, str) and np.asarray(media).ndim == 4)
               else self.load_image_input(media))
        frames = img[None] if img.ndim == 3 else img  # [T,H,W,3]
        out = np.stack([
            cv2.resize(f, (width, height), interpolation=cv2.INTER_LANCZOS4)
            for f in frames
        ])
        f32 = out.astype(np.float32) / 127.5 - 1.0
        return np.transpose(f32, (3, 0, 1, 2))[None]  # [1,3,T,H,W]

    def decode_latents(self, lats: jnp.ndarray, decode_timestep: float = 0.0,
                       decode_noise_scale: Optional[float] = None,
                       tone_map_compression_ratio: float = 0.0,
                       seed: Optional[int] = None) -> List[np.ndarray]:
        z = jnp.asarray(lats, jnp.float32)
        timestep = None
        if getattr(self.vae.cfg, "timestep_conditioning", False):
            dns = decode_timestep if decode_noise_scale is None else decode_noise_scale
            fresh = jnp.asarray(
                np.random.default_rng(seed if seed is not None else 0)
                .standard_normal(z.shape), jnp.float32)
            z = (1.0 - dns) * z + dns * fresh
            timestep = jnp.full((z.shape[0],), float(decode_timestep), jnp.float32)
        z = tone_map_latents(z, tone_map_compression_ratio)
        key = ("ltx_vae_decode", tuple(z.shape), timestep is not None)
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, z, t):
                m = nnx.merge(graphdef, state)
                return m.decode(z, timestep=t, noise_key=jax.random.key(0))

            self._jit_cache[key] = dec
        _, vae_state = nnx.split(self.vae)
        video = dec(vae_state, z, timestep)
        b, c, t, h, w = video.shape
        frames = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames)
