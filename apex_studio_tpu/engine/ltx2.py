"""LTX-2 engines — joint audio-video generation (ti2v).

Counterpart of the reference's ``src/engine/ltx2/ti2v.py`` (LTX2TI2VEngine):
text → video+audio latents denoised jointly by the dual-stream DiT, with
optional image conditioning injected into the video latent grid at frame 0
(latent replacement + per-token timesteps holding conditioned tokens clean —
ti2v.py:106 prepare_latents_image_conditioning).

The audio stream always flows through the transformer (the block couples the
modalities); when the manifest ships the ``audio_vae`` + ``vocoder``
components, ``decode_audio`` turns audio latents into waveform samples for the
runner's wav mux (``return_audio_latents`` skips that). Distilled checkpoints
run the same engine with fewer steps (the reference's ltx2 `-distilled`
manifests only change defaults).
"""

from __future__ import annotations

import logging
import math
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.ltx2")


def _patchify_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, T, H, W] → [B, T·H·W, C] (patch 1, token order t-major)."""
    b, c = x.shape[:2]
    return x.reshape(b, c, -1).transpose(0, 2, 1)


def _unpatchify_tokens(tok: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
    b, _, c = tok.shape
    return tok.transpose(0, 2, 1).reshape(b, c, t, h, w)


@register_engine("ltx2", "ti2v")
class LTX2TI2VEngine(BaseEngine):
    def _get_connectors(self):
        """ltx2.connectors helper (reference ti2v.py:871): per-stream text
        connector transformers. None when the manifest doesn't declare it."""
        spec = self.component_specs.get("connectors")
        if spec is None:
            return None
        if "connectors" not in self.helpers:
            from apex_studio_tpu.models.registry import helper_registry

            self.helpers["connectors"] = self._instantiate_family(
                helper_registry, spec, "ltx2_connectors")
        return self.helpers["connectors"]

    def _encode_prompt(self, prompt: str, max_length: Optional[int] = None):
        """→ (ctx_video, ctx_audio, mask). With connectors: all-layer Gemma
        hidden states packed (shared/__init__.py:73) → connector stacks, and
        the mask is all-ones (registers fill the padding). Without: both
        streams read the same hidden states (legacy path)."""
        conn = self._get_connectors()
        if conn is None:
            hidden, mask = self.text_encoder.encode(
                [prompt], max_sequence_length=max_length or 256,
                use_chat_template=False,
            )
            h = jnp.asarray(hidden, jnp.float32)
            return h, h, jnp.asarray(mask)

        from apex_studio_tpu.models.ltx2_connectors import pack_text_embeds

        length = max_length or 1024  # reference default; 128-register multiple
        hidden_all, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=length, use_chat_template=False,
            output="hidden_states_all",
        )
        mask = jnp.asarray(mask)
        packed = pack_text_embeds(jnp.asarray(hidden_all), mask)
        key = ("ltx2_connectors", tuple(packed.shape))
        fn = self._jit_cache.get(key)
        if fn is None:
            graphdef, _ = nnx.split(conn)

            @jax.jit
            def fn(state, packed, mask):
                return nnx.merge(graphdef, state)(packed, mask.astype(bool))

            self._jit_cache[key] = fn
        _, state = nnx.split(conn)
        ctx_v, ctx_a = fn(state, packed.astype(conn.text_proj_in.dtype), mask)
        ones = jnp.ones_like(mask)
        return (jnp.asarray(ctx_v, jnp.float32),
                jnp.asarray(ctx_a, jnp.float32), ones)

    def _vae_encode(self, media: np.ndarray) -> jnp.ndarray:
        key = ("ltx2_vae_encode", tuple(media.shape))
        fn = self._jit_cache.get(key)
        if fn is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def fn(state, x):
                return nnx.merge(graphdef, state).encode(x)

            self._jit_cache[key] = fn
        _, state = nnx.split(self.vae)
        return fn(state, jnp.asarray(media, jnp.float32))

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        image: Optional[Any] = None,
        height: int = 512,
        width: int = 768,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: float = 25.0,
        num_inference_steps: int = 40,
        guidance_scale: float = 4.0,
        stg_scale: float = 0.0,
        stg_blocks: Optional[List[int]] = None,
        modality_scale: float = 1.0,
        guidance_rescale: float = 0.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        image_strength: float = 1.0,
        latents: Optional[Any] = None,
        audio_latents: Optional[Any] = None,
        noise_scale: float = 1.0,
        upsample: bool = False,
        return_latents: bool = False,
        return_audio_latents: bool = False,
        render_on_step: bool = False,
        render_on_step_callback: Optional[Callable] = None,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting LTX-2 ti2v pipeline")
        for ctype in ("text_encoder", "vae", "transformer", "scheduler"):
            if getattr(self, ctype if ctype != "vae" else "vae", None) is None:
                self.load_component_by_type(ctype)
        safe_emit_progress(progress_callback, 0.05, "Components ready")

        s_scale = self.vae.spatial_compression_ratio
        t_scale = self.vae.temporal_compression_ratio
        height -= height % s_scale
        width -= width % s_scale
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale
        if latents is not None:
            # stage-2 entry: the provided latent grid defines the geometry
            lat_f, lat_h, lat_w = latents.shape[2:]
            num_frames = (lat_f - 1) * t_scale + 1

        cfg_t = self.transformer.cfg
        # audio latent frames spanning the clip's duration
        alps = (cfg_t.audio_sampling_rate / cfg_t.audio_hop_length
                / cfg_t.audio_scale_factor)
        audio_f = max(1, int(math.ceil(num_frames / fps * alps)))

        ctx_pos, ctxa_pos, mask_pos = self._encode_prompt(prompt or "")
        if negative_prompt:
            ctx_neg, ctxa_neg, mask_neg = self._encode_prompt(negative_prompt)
        else:
            ctx_neg, ctxa_neg, mask_neg = (jnp.zeros_like(ctx_pos),
                                           jnp.zeros_like(ctxa_pos),
                                           jnp.zeros_like(mask_pos))
        safe_emit_progress(progress_callback, 0.15, "Prompts ready")

        lats = self.get_latents((1, cfg_t.in_channels, lat_f, lat_h, lat_w), seed=seed)
        a_lats = self.get_latents(
            (1, cfg_t.audio_in_channels, audio_f),
            seed=None if seed is None else seed + 1)
        if latents is not None:
            # ltx-core GaussianNoiser (reference ti2v.py:302): renoise the
            # stage-1 grid to the first distilled stage-2 sigma
            ns = float(noise_scale)
            lats = lats * ns + jnp.asarray(latents, jnp.float32) * (1.0 - ns)
            if audio_latents is not None:
                al = jnp.asarray(audio_latents, jnp.float32)
                a_lats = a_lats[:, :, :al.shape[2]] * ns + al * (1.0 - ns)
                audio_f = a_lats.shape[2]
        a_tokens = a_lats.transpose(0, 2, 1)  # [1, Sa, C]

        self.scheduler.set_timesteps(
            num_inference_steps,
            samples_shape=(1, cfg_t.in_channels, lat_f, lat_h, lat_w),
            timesteps=timesteps,
        )
        ts = np.asarray(self.scheduler.timesteps, np.float64)

        # image conditioning: replace frame-0 latents, hold them clean
        cond_mask = None
        if image is not None:
            arr = self.load_image_input(image)
            import cv2

            arr = cv2.resize(arr, (width, height), interpolation=cv2.INTER_AREA)
            media = (arr.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
            z = self._vae_encode(media[None, :, None])  # [1, C, 1, h, w]
            s = float(image_strength)
            blended = (1 - s) * lats[:, :, :1] + s * z.astype(jnp.float32)
            lats = lats.at[:, :, :1].set(blended)
            grid = jnp.zeros((1, lat_f, lat_h, lat_w), jnp.float32)
            cond_mask = _patchify_tokens(grid.at[:, :1].set(s)[:, None])[..., 0]
        init_lats = lats
        safe_emit_progress(progress_callback, 0.25, "Latents initialized")

        tokens = _patchify_tokens(lats)
        n_tok = tokens.shape[1]
        do_cfg = guidance_scale > 1.0
        nb = 2 if do_cfg else 1
        ctx_b = (jnp.concatenate([ctx_neg, ctx_pos], 0) if do_cfg else ctx_pos)
        ctxa_b = (jnp.concatenate([ctxa_neg, ctxa_pos], 0) if do_cfg else ctxa_pos)
        mask_b = (jnp.concatenate([mask_neg, mask_pos], 0) if do_cfg else mask_pos)

        graphdef, tf_state = nnx.split(self.transformer)
        key = ("ltx2_step", n_tok, audio_f, int(ctx_b.shape[1]), nb)
        fwd = self._jit_cache.get(key)
        if fwd is None:
            import functools

            # vshape/fps are static: the rope coordinate grids are host
            # numpy constants folded into the compiled program
            @functools.partial(jax.jit, static_argnames=("vshape", "fps_"))
            def fwd(state, tok, atok, t_tok, t_a, ctx, ctxa, cmask, vshape, fps_):
                m = nnx.merge(graphdef, state)
                return m(tok, atok, t_tok, ctx, video_shape=vshape, fps=fps_,
                         t_audio=t_a, ctx_audio=ctxa, ctx_mask=cmask)

            self._jit_cache[key] = fwd
        model_dtype = self.transformer.dtype
        denoise_cb = make_mapped_progress(progress_callback, 0.3, 0.9)
        vshape = (lat_f, lat_h, lat_w)

        for i, t in enumerate(ts):
            t_f = float(t)
            if cond_mask is not None:
                t_tok = jnp.minimum(jnp.full_like(cond_mask, t_f), 1.0 - cond_mask)
            else:
                t_tok = jnp.full((1, n_tok), t_f, jnp.float32)
            t_tok_b = jnp.tile(t_tok, (nb, 1))
            t_a_b = jnp.full((nb,), t_f, jnp.float32)
            tok_b = jnp.tile(tokens.astype(model_dtype), (nb, 1, 1))
            atok_b = jnp.tile(a_tokens.astype(model_dtype), (nb, 1, 1))
            v_out, a_out = fwd(tf_state, tok_b, atok_b, t_tok_b, t_a_b,
                               ctx_b.astype(model_dtype),
                               ctxa_b.astype(model_dtype), mask_b, vshape,
                               float(fps))
            v_cond = v_out[1:2] if do_cfg else v_out
            a_cond = a_out[1:2] if do_cfg else a_out
            # MultiModalGuider (reference src/engine/ltx2/multimodal_guidance.py):
            # pred = cond + (cfg-1)(cond-uncond) + stg(cond-ptb) + (ms-1)(cond-mod)
            v, a = v_cond, a_cond
            if do_cfg:
                v = v + (guidance_scale - 1.0) * (v_cond - v_out[:1])
                a = a + (guidance_scale - 1.0) * (a_cond - a_out[:1])
            if stg_scale != 0.0:
                v_ptb, a_ptb = self._guidance_pass(
                    tok_b[-1:], atok_b[-1:], t_tok_b[-1:], t_a_b[-1:],
                    ctx_pos.astype(model_dtype), ctxa_pos.astype(model_dtype),
                    mask_pos, vshape, float(fps),
                    skip_blocks=tuple(stg_blocks) if stg_blocks is not None
                    else tuple(range(len(self.transformer.blocks))))
                v = v + stg_scale * (v_cond - v_ptb)
                a = a + stg_scale * (a_cond - a_ptb)
            if modality_scale != 1.0:
                v_mod, a_mod = self._guidance_pass(
                    tok_b[-1:], atok_b[-1:], t_tok_b[-1:], t_a_b[-1:],
                    ctx_pos.astype(model_dtype), ctxa_pos.astype(model_dtype),
                    mask_pos, vshape, float(fps),
                    skip_av_cross=True)
                v = v + (modality_scale - 1.0) * (v_cond - v_mod)
                a = a + (modality_scale - 1.0) * (a_cond - a_mod)
            if guidance_rescale != 0.0:
                # scalar std ratio across the tensor (guider.calculate)
                factor = jnp.std(v_cond) / (jnp.std(v) + 1e-12)
                v = v * (guidance_rescale * factor + (1.0 - guidance_rescale))
                fa = jnp.std(a_cond) / (jnp.std(a) + 1e-12)
                a = a * (guidance_rescale * fa + (1.0 - guidance_rescale))
            dt = float((ts[i + 1] if i + 1 < len(ts) else 0.0) - t_f)
            tokens = tokens + dt * v.astype(jnp.float32)
            a_tokens = a_tokens + dt * a.astype(jnp.float32)
            if cond_mask is not None:
                # conditioned tokens stay at their clean values
                hard = (cond_mask > 1.0 - 1e-6)[..., None]
                tokens = jnp.where(hard, _patchify_tokens(init_lats), tokens)
            safe_emit_progress(denoise_cb, (i + 1) / len(ts),
                               f"denoise step {i + 1}/{len(ts)}")

        lats = _unpatchify_tokens(tokens, lat_f, lat_h, lat_w)
        audio_lats = a_tokens.transpose(0, 2, 1)

        if upsample:
            up = self._get_upsampler()
            if up is None:
                safe_emit_progress(progress_callback, 0.9,
                                   "No latent_upsampler in manifest — "
                                   "skipping stage 2")
            else:
                safe_emit_progress(progress_callback, 0.9,
                                   "Upsampling latents (stage-2 prep)")
                lats = self._upsample_latents(lats, up)
                # stage-2 refinement (reference ti2v.py:1608): rerun at the
                # lifted resolution over the distilled stage-2 sigmas with
                # guidance off; conditioning is baked into the latents.
                sigmas = [0.909375, 0.725, 0.421875]
                return self.run(
                    prompt=prompt, negative_prompt=None,
                    height=lats.shape[3] * s_scale,
                    width=lats.shape[4] * s_scale,
                    num_frames=num_frames, fps=fps,
                    num_inference_steps=len(sigmas), timesteps=sigmas,
                    guidance_scale=1.0, stg_scale=0.0, modality_scale=1.0,
                    guidance_rescale=0.0, seed=seed,
                    latents=lats, audio_latents=audio_lats,
                    noise_scale=sigmas[0], upsample=False,
                    return_latents=return_latents,
                    return_audio_latents=return_audio_latents,
                    progress_callback=progress_callback, offload=offload,
                )

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return (lats, audio_lats) if return_audio_latents else lats

        key = ("ltx2_vae_decode", tuple(lats.shape))
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef_v, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, z):
                return nnx.merge(graphdef_v, state).decode(z)

            self._jit_cache[key] = dec
        _, vae_state = nnx.split(self.vae)
        video = dec(vae_state, lats.astype(jnp.float32))
        b, c, t, h, w = video.shape
        frames = self.tensor_to_frames(
            jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w))
        if return_audio_latents:
            safe_emit_progress(progress_callback, 1.0, "Completed LTX-2 pipeline")
            return frames, audio_lats
        audio = self.decode_audio(audio_lats)
        safe_emit_progress(progress_callback, 1.0, "Completed LTX-2 pipeline")
        if audio is not None:
            waveform, sr = audio
            return frames, waveform, sr
        return frames

    def _get_upsampler(self):
        """Instantiate the ltx2.upsampler helper (reference
        src/helpers/ltx2/upsampler.py:197) from the manifest's
        ``latent_upsampler`` component spec, if present."""
        spec = (self.component_specs.get("latent_upsampler")
                or self.component_specs.get("upsampler"))
        if spec is None:
            return None
        if "latent_upsampler" not in self.helpers:
            from apex_studio_tpu.models.registry import helper_registry

            self.helpers["latent_upsampler"] = self._instantiate_family(
                helper_registry, spec, "ltx2_upsampler")
        return self.helpers["latent_upsampler"]

    def _upsample_latents(self, lats: jnp.ndarray, up) -> jnp.ndarray:
        """upsample_video (reference upsampler.py:334): denormalize with the
        VAE stats, run the upsampler, re-normalize. Jitted per latent shape."""
        from apex_studio_tpu.models.ltx2_upsampler import upsample_latents

        key = ("ltx2_upsample", tuple(lats.shape))
        fn = self._jit_cache.get(key)
        if fn is None:
            gd_u, _ = nnx.split(up)
            gd_v, _ = nnx.split(self.vae)

            @jax.jit
            def fn(su, sv, z):
                return upsample_latents(z, nnx.merge(gd_v, sv),
                                        nnx.merge(gd_u, su))

            self._jit_cache[key] = fn
        _, su = nnx.split(up)
        _, sv = nnx.split(self.vae)
        return fn(su, sv, lats.astype(jnp.float32))

    def _guidance_pass(self, tok, atok, t_tok, t_a, ctx, ctxa, cmask, vshape,
                       fps_, skip_blocks: tuple = (), skip_av_cross: bool = False):
        """Extra forward for STG (self-attn skipped in ``skip_blocks``) or
        isolated-modality (a2v/v2a cross skipped) guidance branches."""
        graphdef, tf_state = nnx.split(self.transformer)
        key = ("ltx2_guidance", tok.shape[1], atok.shape[1], ctx.shape[1],
               skip_blocks, skip_av_cross)
        fn = self._jit_cache.get(key)
        if fn is None:
            import functools

            @functools.partial(jax.jit, static_argnames=("vshape", "fps_"))
            def fn(state, tok, atok, t_tok, t_a, ctx, ctxa, cmask, vshape, fps_):
                m = nnx.merge(graphdef, state)
                return m(tok, atok, t_tok, ctx, video_shape=vshape, fps=fps_,
                         t_audio=t_a, ctx_audio=ctxa, ctx_mask=cmask,
                         skip_video_self_attn_blocks=skip_blocks or None,
                         skip_audio_self_attn_blocks=skip_blocks or None,
                         skip_av_cross_attn=skip_av_cross)

            self._jit_cache[key] = fn
        return fn(tf_state, tok, atok, t_tok, t_a, ctx, ctxa, cmask, vshape, fps_)

    def decode_audio(self, audio_lats: jnp.ndarray):
        """Audio latents (B, z·M', Sa) → (waveform (C, N), sample_rate), or
        None when the manifest ships no audio VAE/vocoder (reference always
        has both: manifest ltx2-*.yml audio_vae + ltx2.vocoder helper)."""
        spec = self.component_specs.get("audio_vae")
        voc_spec = self.component_specs.get("vocoder")
        if spec is None or voc_spec is None:
            return None
        from apex_studio_tpu.models.registry import helper_registry, vae_registry

        if "audio_vae" not in self.helpers:
            self.helpers["audio_vae"] = self._instantiate_family(
                vae_registry, spec, "ltx2_audio_vae")
        if "vocoder" not in self.helpers:
            self.helpers["vocoder"] = self._instantiate_family(
                helper_registry, voc_spec, "ltx2_vocoder")
        audio_vae = self.helpers["audio_vae"]
        vocoder = self.helpers["vocoder"]
        z = audio_vae.unpatchify(
            audio_lats.transpose(0, 2, 1),
            audio_vae.cfg.latent_channels,
            audio_vae.cfg.mel_bins // audio_vae.cfg.temporal_compression_ratio)
        key = ("ltx2_audio_decode", tuple(z.shape))
        fn = self._jit_cache.get(key)
        if fn is None:
            gd_v, _ = nnx.split(audio_vae)
            gd_voc, _ = nnx.split(vocoder)

            @jax.jit
            def fn(sv, svoc, z):
                mel = nnx.merge(gd_v, sv).decode(z)
                return nnx.merge(gd_voc, svoc)(mel)

            self._jit_cache[key] = fn
        _, sv = nnx.split(audio_vae)
        _, svoc = nnx.split(vocoder)
        wav = np.asarray(fn(sv, svoc, z.astype(jnp.float32)))[0]
        return wav, int(vocoder.cfg.output_sampling_rate)


class LTX2KeyframeVideoBase(LTX2TI2VEngine):
    """Keyframe-token-append conditioning (reference
    ``src/engine/ltx2/shared/keyframe_engine.py`` LTX2KeyframeConditioningMixin
    + ``shared/keyframe_video_base.py``): each conditioning image/video is
    VAE-encoded, packed into tokens, APPENDED to the base latent sequence with
    RoPE coords time-shifted by its pixel frame index, and held (1-strength)
    clean by a per-token denoise mask. Only the base tokens are decoded."""

    allow_conditioning_video = True

    def run(
        self,
        image: Optional[Any] = None,
        image_strengths: Optional[Any] = None,
        image_pixel_frame_indices: Optional[Any] = None,
        conditioning_video: Optional[Any] = None,
        conditioning_video_strength: float = 1.0,
        conditioning_video_pixel_frame_index: int = 0,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 512,
        width: int = 768,
        duration: Optional[float] = None,
        num_frames: Optional[int] = None,
        fps: float = 25.0,
        num_inference_steps: int = 40,
        guidance_scale: float = 3.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        upsample: bool = False,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        import cv2

        safe_emit_progress(progress_callback, 0.0, "Starting LTX-2 keyframe pipeline")
        for ctype in ("text_encoder", "vae", "transformer", "scheduler"):
            if getattr(self, ctype, None) is None:
                self.load_component_by_type(ctype)

        s_scale = self.vae.spatial_compression_ratio
        t_scale = self.vae.temporal_compression_ratio
        height -= height % s_scale
        width -= width % s_scale
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_f = (num_frames - 1) // t_scale + 1
        lat_h, lat_w = height // s_scale, width // s_scale

        cfg_t = self.transformer.cfg
        alps = (cfg_t.audio_sampling_rate / cfg_t.audio_hop_length
                / cfg_t.audio_scale_factor)
        audio_f = max(1, int(math.ceil(num_frames / fps * alps)))

        ctx_pos, ctxa_pos, mask_pos = self._encode_prompt(prompt or "")
        if negative_prompt:
            ctx_neg, ctxa_neg, mask_neg = self._encode_prompt(negative_prompt)
        else:
            ctx_neg, ctxa_neg, mask_neg = (jnp.zeros_like(ctx_pos),
                                           jnp.zeros_like(ctxa_pos),
                                           jnp.zeros_like(mask_pos))

        # --- base tokens (pure noise) ---
        base_grid = self.get_latents((1, cfg_t.in_channels, lat_f, lat_h, lat_w),
                                     seed=seed)
        tokens = _patchify_tokens(base_grid)
        base_tok = tokens.shape[1]
        clean = tokens
        dmask = jnp.ones((1, base_tok), jnp.float32)
        coords = self.transformer.video_coords(lat_f, lat_h, lat_w, fps, batch=1)

        # --- conditioning items ---
        conds: List[Any] = []
        if image is not None:
            images = image if isinstance(image, (list, tuple)) else [image]
            strengths = (image_strengths if isinstance(image_strengths, (list, tuple))
                         else [image_strengths if image_strengths is not None else 1.0]
                         * len(images))
            idxs = (image_pixel_frame_indices
                    if isinstance(image_pixel_frame_indices, (list, tuple))
                    else [image_pixel_frame_indices or 0] * len(images))
            for im, s, ix in zip(images, strengths, idxs):
                arr = self.load_image_input(im)
                arr = cv2.resize(arr, (width, height), interpolation=cv2.INTER_AREA)
                px = (arr.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
                conds.append((px[None, :, None], float(s if s is not None else 1.0),
                              int(ix or 0)))
        if conditioning_video is not None and self.allow_conditioning_video:
            from apex_studio_tpu.preprocess.base import load_frames

            frames_in = (load_frames(conditioning_video)
                         if isinstance(conditioning_video, str)
                         else list(conditioning_video))
            nf = max(1, len(frames_in) - (len(frames_in) - 1) % t_scale)
            vid = np.stack([
                cv2.resize(np.asarray(f), (width, height),
                           interpolation=cv2.INTER_AREA) for f in frames_in[:nf]])
            px = (vid.astype(np.float32) / 127.5 - 1.0).transpose(3, 0, 1, 2)[None]
            conds.append((px, float(conditioning_video_strength),
                          int(conditioning_video_pixel_frame_index)))

        rng = np.random.default_rng(0 if seed is None else seed + 17)
        for px, strength, pixel_idx in conds:
            z = self.encode_video_latents(px)  # [1,C,Tc,h,w] (disk-cached)
            ctoks = _patchify_tokens(z.astype(jnp.float32))
            ccoords = self.transformer.video_coords(z.shape[2], lat_h, lat_w, fps,
                                                    batch=1)
            # shift the time axis by the keyframe's pixel timestamp
            # (video_coords now returns host numpy for the f64 rope path)
            ccoords = np.array(ccoords)
            ccoords[:, 0] += float(pixel_idx) / float(fps)
            d = float(np.clip(1.0 - strength, 0.0, 1.0))
            cmask = jnp.full((1, ctoks.shape[1]), d, jnp.float32)
            cnoise = jnp.asarray(rng.standard_normal(ctoks.shape), jnp.float32)
            cinit = cnoise * d + ctoks * (1.0 - d)
            tokens = jnp.concatenate([tokens, cinit], axis=1)
            clean = jnp.concatenate([clean, ctoks], axis=1)
            dmask = jnp.concatenate([dmask, cmask], axis=1)
            coords = np.concatenate([np.asarray(coords), ccoords], axis=2)

        a_lats = self.get_latents((1, cfg_t.audio_in_channels, audio_f),
                                  seed=None if seed is None else seed + 1)
        a_tokens = a_lats.transpose(0, 2, 1)

        self.scheduler.set_timesteps(
            num_inference_steps,
            samples_shape=(1, cfg_t.in_channels, lat_f, lat_h, lat_w),
            timesteps=timesteps)
        ts = np.asarray(self.scheduler.timesteps, np.float64)

        n_tok = tokens.shape[1]
        do_cfg = guidance_scale > 1.0
        nb = 2 if do_cfg else 1
        ctx_b = jnp.concatenate([ctx_neg, ctx_pos], 0) if do_cfg else ctx_pos
        ctxa_b = jnp.concatenate([ctxa_neg, ctxa_pos], 0) if do_cfg else ctxa_pos
        mask_b = jnp.concatenate([mask_neg, mask_pos], 0) if do_cfg else mask_pos
        coords_b = jnp.tile(coords, (nb, 1, 1))

        graphdef, tf_state = nnx.split(self.transformer)
        key = ("ltx2_kf_step", n_tok, audio_f, int(ctx_b.shape[1]), nb)
        fwd = self._jit_cache.get(key)
        if fwd is None:
            import functools

            @functools.partial(jax.jit, static_argnames=("vshape", "fps_"))
            def fwd(state, tok, atok, t_tok, t_a, ctx, ctxa, cmask, vc, vshape, fps_):
                m = nnx.merge(graphdef, state)
                return m(tok, atok, t_tok, ctx, video_shape=vshape, fps=fps_,
                         t_audio=t_a, ctx_audio=ctxa, ctx_mask=cmask,
                         video_coords=vc)

            self._jit_cache[key] = fwd
        model_dtype = self.transformer.dtype
        denoise_cb = make_mapped_progress(progress_callback, 0.3, 0.9)
        vshape = (lat_f, lat_h, lat_w)

        for i, t in enumerate(ts):
            t_f = float(t)
            # per-token timestep: masked tokens (denoise_mask→0) stay clean
            t_tok = jnp.tile(t_f * dmask, (nb, 1))
            t_a_b = jnp.full((nb,), t_f, jnp.float32)
            tok_b = jnp.tile(tokens.astype(model_dtype), (nb, 1, 1))
            atok_b = jnp.tile(a_tokens.astype(model_dtype), (nb, 1, 1))
            v_out, a_out = fwd(tf_state, tok_b, atok_b, t_tok, t_a_b,
                               ctx_b.astype(model_dtype),
                               ctxa_b.astype(model_dtype), mask_b, coords_b,
                               vshape, float(fps))
            if do_cfg:
                v = v_out[:1] + guidance_scale * (v_out[1:2] - v_out[:1])
                a = a_out[:1] + guidance_scale * (a_out[1:2] - a_out[:1])
            else:
                v, a = v_out, a_out
            dt = float((ts[i + 1] if i + 1 < len(ts) else 0.0) - t_f)
            tokens = tokens + dt * v.astype(jnp.float32)
            a_tokens = a_tokens + dt * a.astype(jnp.float32)
            # re-impose clean conditioning each step (keyframe_video_base:411)
            m = dmask[..., None]
            tokens = tokens * m + clean * (1.0 - m)
            safe_emit_progress(denoise_cb, (i + 1) / len(ts),
                               f"denoise step {i + 1}/{len(ts)}")

        lats = _unpatchify_tokens(tokens[:, :base_tok], lat_f, lat_h, lat_w)

        if upsample:
            # appended conditioning tokens are already stripped — the
            # upsampler sees only the base video grid
            # (reference keyframe_video_base.py:424-443)
            up = self._get_upsampler()
            if up is not None:
                safe_emit_progress(progress_callback, 0.9,
                                   "Upsampling latents (stage-2 prep)")
                lats = self._upsample_latents(lats, up)
                sigmas_d = [0.909375, 0.725, 0.421875]
                return LTX2TI2VEngine.run(
                    self, prompt=prompt,
                    height=lats.shape[3] * s_scale,
                    width=lats.shape[4] * s_scale,
                    num_frames=num_frames, fps=fps,
                    num_inference_steps=len(sigmas_d), timesteps=sigmas_d,
                    guidance_scale=1.0, seed=seed, latents=lats,
                    audio_latents=a_tokens.transpose(0, 2, 1),
                    noise_scale=sigmas_d[0], upsample=False,
                    return_latents=return_latents,
                    progress_callback=progress_callback,
                )
            safe_emit_progress(progress_callback, 0.9,
                               "No latent_upsampler in manifest — skipping "
                               "stage 2")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return lats

        key = ("ltx2_vae_decode", tuple(lats.shape))
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef_v, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, z):
                return nnx.merge(graphdef_v, state).decode(z)

            self._jit_cache[key] = dec
        _, vae_state = nnx.split(self.vae)
        video = dec(vae_state, lats.astype(jnp.float32))
        b, c, t, h, w = video.shape
        frames = self.tensor_to_frames(
            jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w))
        safe_emit_progress(progress_callback, 1.0, "Completed keyframe pipeline")
        return frames


@register_engine("ltx2", "ic_lora")
class LTX2ICLoraEngine(LTX2KeyframeVideoBase):
    """IC-LoRA: keyframe images + optional control video as appended keyframe
    tokens (reference src/engine/ltx2/ic_lora.py)."""


@register_engine("ltx2", "keyframe_interpolation")
class LTX2KeyframeInterpolationEngine(LTX2KeyframeVideoBase):
    """Keyframe interpolation: image-only keyframe conditioning (reference
    src/engine/ltx2/keyframe_interpolation.py)."""

    allow_conditioning_video = False


@register_engine("ltx2", "multimodal_guidance")
class LTX2MultimodalGuidanceEngine(LTX2TI2VEngine):
    """ti2v with the MultiModalGuider branches surfaced as first-class
    defaults (reference src/engine/ltx2/multimodal_guidance.py MultiModalGuider:
    CFG + spatiotemporal guidance (self-attn-skipped perturbed pass) +
    isolated-modality guidance (a2v/v2a cross-attn skipped))."""

    def run(self, *, stg_scale: float = 1.0, modality_scale: float = 1.0,
            guidance_rescale: float = 0.0, **kwargs: Any):
        return super().run(stg_scale=stg_scale, modality_scale=modality_scale,
                           guidance_rescale=guidance_rescale, **kwargs)
