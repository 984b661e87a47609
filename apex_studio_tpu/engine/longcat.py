"""LongCat-Video engines (t2v, i2v, vc, continuation, long_video,
interactive, refine).

Counterpart of the reference's ``src/engine/longcat/`` family: all modes share
one backbone + Wan VAE + UMT5 prompt encoder and compose:

- t2v (t2v.py): CFG-zero* guidance — the unconditional branch is rescaled by
  the optimized projection scale before the usual CFG mix (shared.py:545),
  the model output is negated for the flow-match step (t2v.py:173), sigmas
  are linspace(1, 0.001) (shared.py:479; distilled checkpoints subsample the
  distillation grid).
- i2v (i2v.py): first-frame latent occupies the first latent slot; cond
  frames run at t=0 with cond-isolated attention (num_cond_latents).
- vc (vc.py): video continuation — trailing ``num_cond_frames`` input frames
  become clean context; with ``use_kv_cache`` their per-block K/V are cached
  once (t=0, cross-attn skipped) and each denoise step runs only the noise
  frames against the cache.
- continuation (continuation.py): resample input fps → one vc segment.
- long_video (long_video.py): t2v for the base segment then repeated vc.
- interactive (interactive.py): one prompt per segment (sentence-split).
- refine (refine.py): 720p (+2x temporal) refinement — the stage-1 video is
  trilinearly upsampled, VAE-encoded, noised to ``t_thresh`` and denoised on
  the truncated schedule, no CFG.
"""

from __future__ import annotations

import logging
import math
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.longcat")


def optimized_scale(pos: np.ndarray, neg: np.ndarray) -> np.ndarray:
    """CFG-zero* projection scale (shared.py:545)."""
    b = pos.shape[0]
    p, n = pos.reshape(b, -1), neg.reshape(b, -1)
    dot = (p * n).sum(axis=1, keepdims=True)
    sq = (n * n).sum(axis=1, keepdims=True) + 1e-8
    return (dot / sq).reshape(b, 1, 1, 1, 1)


def split_into_sentences(text: str) -> List[str]:
    """Light-weight sentence splitter (shared.py:560) for interactive mode."""
    parts = re.split(r"(?<=[.!?])\s+", text.replace("\n", " "))
    return [p.strip() for p in parts if p.strip()]


class LongCatShared(BaseEngine):
    def load_components(self) -> None:
        for ctype in ("text_encoder", "transformer", "vae"):
            if getattr(self, ctype, None) is None:
                self.load_component_by_type(ctype)

    def encode_prompt(self, prompt: str, max_sequence_length: int = 512):
        hidden, mask = self.text_encoder.encode(
            [prompt or ""], max_sequence_length=max_sequence_length,
            use_chat_template=False)
        return jnp.asarray(hidden), jnp.asarray(mask)

    def sigmas_for(self, steps: int, use_distill: bool = False,
                   num_distill_steps: int = 16) -> np.ndarray:
        if use_distill:
            grid = np.round(np.arange(1, num_distill_steps + 1)
                            * (1000 // num_distill_steps)).astype(np.int64)
            idx = np.floor(np.linspace(0, num_distill_steps, num=steps,
                                       endpoint=False)).astype(np.int64)
            sig = grid[::-1][idx].astype(np.float64) / 1000.0
        else:
            sig = np.linspace(1.0, 0.001, steps)
        return np.concatenate([sig, [0.0]])

    # -- latent helpers ---------------------------------------------------------

    def _vae_call(self, op: str, x: jnp.ndarray) -> jnp.ndarray:
        graphdef, state = nnx.split(self.vae)
        key = (f"longcat_vae_{op}", tuple(x.shape))
        fn = self._jit_cache.get(key)
        if fn is None:

            @jax.jit
            def fn(s, v):
                m = nnx.merge(graphdef, s)
                return m.encode(v) if op == "encode" else m.decode(v)

            self._jit_cache[key] = fn
        return fn(state, x.astype(jnp.float32))

    def _fwd(self, shapes_key, num_cond_latents: int, num_ctx_latents: int,
             use_cfg: bool, guidance_scale: float, cached: bool):
        key = ("longcat_step", shapes_key, num_cond_latents, num_ctx_latents,
               use_cfg, guidance_scale, cached)
        fwd = self._jit_cache.get(key)
        if fwd is None:
            graphdef, _ = nnx.split(self.transformer)

            @jax.jit
            def fwd(state, x, t, ctx, mask, nctx, nmask, cache):
                m = nnx.merge(graphdef, state)
                kw = dict(num_cond_latents=num_cond_latents,
                          num_ctx_latents=num_ctx_latents,
                          kv_cache=cache if cached else None)
                pos = m(x.astype(m.dtype), t, ctx, mask, **kw)
                if not use_cfg:
                    return pos
                neg = m(x.astype(m.dtype), t, nctx, nmask, **kw)
                b = pos.shape[0]
                p = pos.reshape(b, -1)
                n = neg.reshape(b, -1)
                st = ((p * n).sum(1, keepdims=True)
                      / ((n * n).sum(1, keepdims=True) + 1e-8))
                st = st.reshape(b, 1, 1, 1, 1)
                return neg * st + guidance_scale * (pos - neg * st)

            self._jit_cache[key] = fwd
        return fwd

    def denoise(
        self,
        latents: jnp.ndarray,
        sigmas: np.ndarray,
        context,
        neg_context,
        guidance_scale: float,
        num_cond_latents: int = 0,
        kv_cache=None,
        num_ctx_latents: int = 0,
        progress_callback: Optional[Callable] = None,
    ) -> jnp.ndarray:
        ctx, mask = context
        nctx, nmask = neg_context if neg_context is not None else context
        use_cfg = neg_context is not None and guidance_scale > 1.0
        _, tf_state = nnx.split(self.transformer)
        lat_t = latents.shape[2]
        fwd = self._fwd((tuple(latents.shape), int(ctx.shape[1])),
                        num_cond_latents, num_ctx_latents, use_cfg,
                        float(guidance_scale), kv_cache is not None)
        x = latents.astype(jnp.float32)
        n_steps = len(sigmas) - 1
        for i in range(n_steps):
            t_frames = np.full((1, lat_t), sigmas[i] * 1000.0, np.float32)
            t_frames[:, :num_cond_latents] = 0.0
            v = fwd(tf_state, x, jnp.asarray(t_frames), ctx, mask, nctx, nmask,
                    kv_cache).astype(jnp.float32)
            # model predicts the negated flow (t2v.py:173): x' = x - dt·pred
            step = np.float32(sigmas[i + 1] - sigmas[i])
            if num_cond_latents > 0:
                upd = x[:, :, num_cond_latents:] + step * (
                    -v[:, :, num_cond_latents:])
                x = x.at[:, :, num_cond_latents:].set(upd)
            else:
                x = x + step * (-v)
            if progress_callback is not None:
                safe_emit_progress(progress_callback, (i + 1) / n_steps,
                                   f"step {i + 1}/{n_steps}")
        return x

    def build_kv_cache(self, cond_latents: jnp.ndarray, text_len: int):
        """Cache per-block pre-RoPE K/V of the clean context (shared.py:487)."""
        graphdef, state = nnx.split(self.transformer)
        d_txt = self.transformer.cfg.caption_channels
        empty = jnp.zeros((1, text_len, d_txt), jnp.float32)

        key = ("longcat_kv", tuple(cond_latents.shape), text_len)
        fn = self._jit_cache.get(key)
        if fn is None:

            @jax.jit
            def fn(s, z, y):
                m = nnx.merge(graphdef, s)
                t = jnp.zeros((z.shape[0], z.shape[2]), jnp.float32)
                _, caches = m(z.astype(m.dtype), t, y, return_kv=True,
                              skip_crs_attn=True)
                return caches

            self._jit_cache[key] = fn
        return fn(state, cond_latents, empty)

    def decode_video(self, latents: jnp.ndarray) -> List[np.ndarray]:
        out = self._vae_call("decode", latents)  # [B, 3, T, H, W]
        b, c, t, h, w = out.shape
        frames = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames)

    def _frames_tensor(self, frames: List[np.ndarray], height: int,
                       width: int) -> jnp.ndarray:
        import cv2

        arr = np.stack([cv2.resize(np.asarray(f), (width, height),
                                   interpolation=cv2.INTER_LANCZOS4)
                        for f in frames])
        return jnp.asarray(arr.astype(np.float32) / 127.5 - 1.0
                           ).transpose(3, 0, 1, 2)[None]

    def _geometry(self, height, width, num_frames):
        t_scale = self.vae.cfg.temporal_scale
        s_scale = self.vae.cfg.spatial_scale
        _, ph, pw = self.transformer.cfg.patch_size
        height -= height % (s_scale * ph)
        width -= width % (s_scale * pw)
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)
        lat_t = (num_frames - 1) // t_scale + 1
        return height, width, num_frames, lat_t, height // s_scale, width // s_scale

    def generate_t2v(self, prompt, negative_prompt, height, width, num_frames,
                     num_inference_steps, guidance_scale, seed, use_distill,
                     progress_callback=None):
        self.load_components()
        height, width, num_frames, lat_t, lat_h, lat_w = self._geometry(
            height, width, num_frames)
        ctx = self.encode_prompt(prompt or "")
        nctx = (self.encode_prompt(negative_prompt or "")
                if guidance_scale > 1.0 else None)
        z_dim = self.transformer.cfg.in_channels
        x = self.get_latents((1, z_dim, lat_t, lat_h, lat_w), seed=seed)
        sig = self.sigmas_for(num_inference_steps, use_distill)
        x = self.denoise(x, sig, ctx, nctx, guidance_scale,
                         progress_callback=progress_callback)
        return x, (height, width, num_frames)

    def generate_vc(self, frames, prompt, negative_prompt, height, width,
                    num_frames, num_cond_frames, num_inference_steps,
                    guidance_scale, seed, use_kv_cache=True, use_distill=False,
                    progress_callback=None):
        """Continue ``frames`` by ``num_frames`` new frames; returns latents
        for [cond + new] and the pixel geometry."""
        self.load_components()
        t_scale = self.vae.cfg.temporal_scale
        height, width, num_frames, _, lat_h, lat_w = self._geometry(
            height, width, num_frames)
        num_cond_frames = min(num_cond_frames, len(frames))
        num_cond_frames = max(1, num_cond_frames
                              - (num_cond_frames - 1) % t_scale)
        cond_px = self._frames_tensor(frames[-num_cond_frames:], height, width)
        cond_lat = self._vae_call("encode", cond_px)
        num_cond_latents = cond_lat.shape[2]

        lat_new = (num_frames - 1) // t_scale + 1
        z_dim = self.transformer.cfg.in_channels
        ctx = self.encode_prompt(prompt or "")
        nctx = (self.encode_prompt(negative_prompt or "")
                if guidance_scale > 1.0 else None)
        noise = self.get_latents((1, z_dim, lat_new, lat_h, lat_w), seed=seed)
        sig = self.sigmas_for(num_inference_steps, use_distill)
        if use_kv_cache:
            cache = self.build_kv_cache(cond_lat, int(ctx[0].shape[1]))
            x = self.denoise(noise, sig, ctx, nctx, guidance_scale,
                             kv_cache=cache, num_ctx_latents=num_cond_latents,
                             progress_callback=progress_callback)
            full = jnp.concatenate([cond_lat, x], axis=2)
        else:
            stacked = jnp.concatenate([cond_lat, noise], axis=2)
            full = self.denoise(stacked, sig, ctx, nctx, guidance_scale,
                                num_cond_latents=num_cond_latents,
                                progress_callback=progress_callback)
        return full, num_cond_frames, (height, width)


@register_engine("longcat", "t2v")
class LongCatT2VEngine(LongCatShared):
    def run(self, prompt=None, negative_prompt=None, height: int = 480,
            width: int = 832, duration=None, fps: int = 15,
            num_frames: Optional[int] = None, num_inference_steps: int = 50,
            guidance_scale: float = 4.0, use_distill: bool = False,
            seed: Optional[int] = None, return_latents: bool = False,
            progress_callback: Optional[Callable] = None, offload: bool = True,
            **_: Any):
        safe_emit_progress(progress_callback, 0.0, "Starting LongCat t2v")
        if num_frames is None:
            num_frames = int(round((duration or 6.2) * fps)) + 1
        cb = make_mapped_progress(progress_callback, 0.1, 0.9)
        x, _ = self.generate_t2v(prompt, negative_prompt, height, width,
                                 num_frames, num_inference_steps,
                                 guidance_scale, seed, use_distill, cb)
        if return_latents:
            return x
        frames = self.decode_video(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames


@register_engine("longcat", "i2v")
class LongCatI2VEngine(LongCatShared):
    def run(self, image=None, prompt=None, negative_prompt=None,
            height: int = 480, width: int = 832, duration=None, fps: int = 15,
            num_frames: Optional[int] = None, num_inference_steps: int = 50,
            guidance_scale: float = 4.0, use_distill: bool = False,
            seed: Optional[int] = None, return_latents: bool = False,
            progress_callback: Optional[Callable] = None, offload: bool = True,
            **_: Any):
        safe_emit_progress(progress_callback, 0.0, "Starting LongCat i2v")
        self.load_components()
        if image is None:
            raise ValueError("i2v requires an input image")
        img = self.load_image_input(image)
        if num_frames is None:
            num_frames = int(round((duration or 6.2) * fps)) + 1
        height, width, num_frames, lat_t, lat_h, lat_w = self._geometry(
            height, width, num_frames)
        cond_px = self._frames_tensor([img], height, width)
        cond_lat = self._vae_call("encode", cond_px)  # [1, C, 1, h, w]

        ctx = self.encode_prompt(prompt or "")
        nctx = (self.encode_prompt(negative_prompt or "")
                if guidance_scale > 1.0 else None)
        z_dim = self.transformer.cfg.in_channels
        noise = self.get_latents((1, z_dim, lat_t, lat_h, lat_w), seed=seed)
        x = jnp.concatenate([cond_lat.astype(jnp.float32),
                             noise[:, :, 1:].astype(jnp.float32)], axis=2)
        sig = self.sigmas_for(num_inference_steps, use_distill)
        cb = make_mapped_progress(progress_callback, 0.2, 0.9)
        x = self.denoise(x, sig, ctx, nctx, guidance_scale,
                         num_cond_latents=1, progress_callback=cb)
        if return_latents:
            return x
        frames = self.decode_video(x)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames


@register_engine("longcat", "vc")
class LongCatVCEngine(LongCatShared):
    def run(self, video=None, prompt=None, negative_prompt=None,
            height: int = 480, width: int = 832, duration=None, fps: int = 15,
            num_frames: Optional[int] = None, num_cond_frames: int = 13,
            num_inference_steps: int = 50, guidance_scale: float = 4.0,
            use_kv_cache: bool = True, use_distill: bool = False,
            seed: Optional[int] = None, return_latents: bool = False,
            progress_callback: Optional[Callable] = None, offload: bool = True,
            **_: Any):
        safe_emit_progress(progress_callback, 0.0, "Starting LongCat vc")
        if video is None:
            raise ValueError("vc requires an input video")
        frames = self._load_frames(video)
        if num_frames is None:
            num_frames = int(round((duration or 6.2) * fps)) + 1
        cb = make_mapped_progress(progress_callback, 0.15, 0.9)
        full, n_cond, _ = self.generate_vc(
            frames, prompt, negative_prompt, height, width, num_frames,
            num_cond_frames, num_inference_steps, guidance_scale, seed,
            use_kv_cache, use_distill, cb)
        if return_latents:
            return full
        out = self.decode_video(full)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return out

    def _load_frames(self, video) -> List[np.ndarray]:
        if isinstance(video, (str, bytes)) or hasattr(video, "__fspath__"):
            from apex_studio_tpu.preprocess.base import load_frames

            return load_frames(video)
        return [np.asarray(f) for f in video]


@register_engine("longcat", "continuation")
class LongCatContinuationEngine(LongCatVCEngine):
    """Resample the source to the model fps, then one vc segment
    (continuation.py:38)."""

    def run(self, video=None, fps: int = 15, source_fps: Optional[int] = None,
            **kwargs: Any):
        frames = self._load_frames(video)
        if source_fps and source_fps > fps:
            stride = max(1, round(source_fps / fps))
            frames = frames[::stride]
        return super().run(video=frames, fps=fps, **kwargs)


@register_engine("longcat", "long_video")
class LongCatLongVideoEngine(LongCatVCEngine):
    """t2v base segment then repeated vc continuation (long_video.py:46)."""

    def run(self, prompt=None, prompts: Optional[List[str]] = None,
            negative_prompt=None, num_segments: int = 3, height: int = 480,
            width: int = 832, duration=None, fps: int = 15,
            num_frames: Optional[int] = None, num_cond_frames: int = 13,
            num_inference_steps: int = 50, guidance_scale: float = 4.0,
            use_distill: bool = False, seed: Optional[int] = None,
            progress_callback: Optional[Callable] = None, offload: bool = True,
            **_: Any):
        safe_emit_progress(progress_callback, 0.0, "Starting LongCat long video")
        if num_frames is None:
            num_frames = int(round((duration or 6.2) * fps)) + 1
        seg_prompts = prompts or [prompt] * (num_segments + 1)
        num_segments = len(seg_prompts) - 1

        total = num_segments + 1
        cb = make_mapped_progress(progress_callback, 0.05, 0.95)
        x, _ = self.generate_t2v(seg_prompts[0], negative_prompt, height,
                                 width, num_frames, num_inference_steps,
                                 guidance_scale, seed, use_distill,
                                 make_mapped_progress(cb, 0.0, 1.0 / total))
        all_frames = self.decode_video(x)
        for s in range(num_segments):
            seg_cb = make_mapped_progress(cb, (s + 1) / total, (s + 2) / total)
            full, n_cond, _ = self.generate_vc(
                all_frames, seg_prompts[s + 1], negative_prompt, height, width,
                num_frames, num_cond_frames, num_inference_steps,
                guidance_scale, None if seed is None else seed + s + 1,
                True, use_distill, seg_cb)
            seg_frames = self.decode_video(full)
            all_frames.extend(seg_frames[n_cond:])
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return all_frames


@register_engine("longcat", "interactive")
class LongCatInteractiveEngine(LongCatLongVideoEngine):
    """One prompt per segment; a single prompt is sentence-split
    (interactive.py:97)."""

    def run(self, prompt=None, prompts: Optional[List[str]] = None,
            **kwargs: Any):
        if not prompts and prompt:
            prompts = split_into_sentences(prompt)
        if not prompts:
            raise ValueError("interactive mode needs at least one prompt")
        return super().run(prompts=prompts, **kwargs)


@register_engine("longcat", "refine")
class LongCatRefineEngine(LongCatShared):
    def run(self, video=None, prompt=None, height: int = 720,
            width: int = 1280, num_inference_steps: int = 50,
            t_thresh: float = 0.5, spatial_refine_only: bool = False,
            seed: Optional[int] = None, return_latents: bool = False,
            progress_callback: Optional[Callable] = None, offload: bool = True,
            **_: Any):
        safe_emit_progress(progress_callback, 0.0, "Starting LongCat refine")
        self.load_components()
        if video is None:
            raise ValueError("refine requires an input video")
        frames = (LongCatVCEngine._load_frames(self, video))
        t_scale = self.vae.cfg.temporal_scale
        height, width, _, _, lat_h, lat_w = self._geometry(height, width, 1)

        n_in = len(frames)
        new_n = n_in if spatial_refine_only else 2 * n_in
        px = self._frames_tensor(frames, height, width)  # [1,3,T,H,W]
        if new_n != n_in:
            # trilinear-in-time upsample (refine.py:113)
            px = jax.image.resize(px, (1, 3, new_n, height, width), "trilinear")
        # pad the tail so frames map to whole latent slots (refine.py:142;
        # the causal Wan VAE wants 1 + k·t_scale frames)
        pad_back = (t_scale - (new_n - 1) % t_scale) % t_scale
        if pad_back:
            px = jnp.concatenate(
                [px, jnp.repeat(px[:, :, -1:], pad_back, axis=2)], axis=2)

        z = self._vae_call("encode", px)
        noise = self.get_latents(tuple(z.shape), seed=seed)
        x = (1.0 - t_thresh) * z.astype(jnp.float32) + t_thresh * noise

        sig_full = self.sigmas_for(num_inference_steps)[:-1]
        sig = np.concatenate([[t_thresh], sig_full[sig_full < t_thresh], [0.0]])
        ctx = self.encode_prompt(prompt or "")
        cb = make_mapped_progress(progress_callback, 0.2, 0.9)
        x = self.denoise(x, sig, ctx, None, 1.0, progress_callback=cb)
        if return_latents:
            return x
        out = self.decode_video(x)[:new_n]
        safe_emit_progress(progress_callback, 1.0, "Refine complete")
        return out
