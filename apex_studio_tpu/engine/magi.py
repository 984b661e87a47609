"""MAGI-1 engines — chunk-autoregressive video generation.

Counterpart of the reference's ``src/engine/magi/`` (t2v.py, i2v.py, v2v.py +
shared/denoise.py MagiDenoise): latent time is split into fixed-width chunks;
a sliding window of ``window_size`` chunks denoises simultaneously, each chunk
at a different point of the schedule, so chunk i is conditioned on the
already-clean chunks before it (block-causal attention). 3-way CFG combines
text, previous-chunk, and unconditional branches with t-bucketed scales
(denoise.py:655).

TPU-native differences from the reference loop (denoise.py:47):
- No KV cache: clean context re-enters the forward as explicit clean chunks,
  bounded by ``context_chunks`` (default = window_size). The reference keeps
  all clean chunks in a CUDA KV cache; recompute over a bounded window keeps
  shapes static per stage (a handful of jit variants) and lets the MXU see
  one large batched attention instead of paged gathers.
- The three CFG branches are three jitted forwards with shared compiled
  programs; per-chunk CFG scales are applied host-side (numpy) since they're
  schedule constants.
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

logger = logging.getLogger("apex.engine.magi")


class MagiShared(BaseEngine):
    context_chunks: int = 4  # clean chunks re-fed as context (no KV cache)

    def load_components(self, return_latents: bool) -> None:
        if self.text_encoder is None:
            self.load_component_by_type("text_encoder")
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

    def encode_prompt(self, prompt: str, max_sequence_length: int = 800):
        hidden, mask = self.text_encoder.encode(
            [prompt], max_sequence_length=max_sequence_length, use_chat_template=False
        )
        return jnp.asarray(hidden), jnp.asarray(mask).astype(bool)

    # -- jitted forwards --------------------------------------------------------------

    def _fwd(self, shapes: Tuple, dropout: bool, block_causal: bool):
        key = ("magi_fwd", shapes, dropout, block_causal)
        fwd = self._jit_cache.get(key)
        if fwd is None:
            graphdef, _ = nnx.split(self.transformer)

            @jax.jit
            def fwd(state, x, t, y, y_mask):
                return nnx.merge(graphdef, state)(
                    x, t, y, y_mask, caption_dropout=dropout,
                    block_causal=block_causal)

            self._jit_cache[key] = fwd
        return fwd

    def _forward(self, x, t_vec, y, y_mask, dropout, block_causal=True):
        fwd = self._fwd((tuple(x.shape), tuple(y.shape)), dropout, block_causal)
        _, state = nnx.split(self.transformer)
        t = jnp.asarray(t_vec, jnp.float32)[None].repeat(x.shape[0], 0)
        return fwd(state, x, t, y, y_mask)

    # -- CFG --------------------------------------------------------------------------

    @staticmethod
    def _cfg_scales(t_active: np.ndarray, cfg_t_range, prev_scales, text_scales):
        idx = np.searchsorted(np.asarray(cfg_t_range) - 1e-7, t_active) - 1
        idx = np.clip(idx, 0, len(prev_scales) - 1)
        return (np.asarray(prev_scales)[idx], np.asarray(text_scales)[idx])

    def _cfg_forward(self, x_seq, t_full, n_ctx, ctx, ctx_mask, neg, neg_mask,
                     cfg_number, cfg_t_range, prev_chunk_scales, text_scales,
                     chunk_width):
        """x_seq: (B, C, (n_ctx+R)·cw, H, W); t_full: len n_ctx+R.
        Returns the velocity for the R active chunks."""
        b = x_seq.shape[0]
        r_seq = len(t_full)
        r_act = r_seq - n_ctx

        def tile_y(base, base_mask, n):
            y = jnp.broadcast_to(base[:, None], (b, n, *base.shape[1:]))
            m = jnp.broadcast_to(base_mask[:, None], (b, n, base_mask.shape[-1]))
            return y, m

        # captions per chunk: clean context chunks use the negative entry
        # (reference: prompt_embeds[1:2, 0:1] for the extra clean chunk)
        y_t, m_t = tile_y(ctx, ctx_mask, r_act)
        y_n, m_n = tile_y(neg, neg_mask, r_act)
        if n_ctx:
            y_c, m_c = tile_y(neg, neg_mask, n_ctx)
            y_text = jnp.concatenate([y_c, y_t], axis=1)
            m_text = jnp.concatenate([m_c, m_t], axis=1)
            y_null = jnp.concatenate([y_c, y_n], axis=1)
            m_null = jnp.concatenate([m_c, m_n], axis=1)
        else:
            y_text, m_text, y_null, m_null = y_t, m_t, y_n, m_n

        out_text = self._forward(x_seq, t_full, y_text, m_text, dropout=False)
        act = out_text[:, :, n_ctx * chunk_width:]
        if cfg_number != 3:
            return act

        out_pre = self._forward(x_seq, t_full, y_null, m_null, dropout=True)[
            :, :, n_ctx * chunk_width:]
        # uncond: each active chunk in isolation (batched, no prefix, r=1)
        x_act = x_seq[:, :, n_ctx * chunk_width:]
        c, h, w = x_act.shape[1], x_act.shape[3], x_act.shape[4]
        xu = x_act.reshape(b, c, r_act, chunk_width, h, w)
        xu = xu.transpose(0, 2, 1, 3, 4, 5).reshape(b * r_act, c, chunk_width, h, w)
        tu = np.repeat(t_full[n_ctx:], 1)  # (r_act,)
        yu = jnp.broadcast_to(neg[:, None], (b, r_act, *neg.shape[1:]))
        yu = yu.reshape(b * r_act, 1, *neg.shape[1:])
        mu = jnp.broadcast_to(neg_mask[:, None], (b, r_act, neg_mask.shape[-1]))
        mu = mu.reshape(b * r_act, 1, -1)
        fwd = self._fwd((tuple(xu.shape), tuple(yu.shape)), True, False)
        _, state = nnx.split(self.transformer)
        t_u = jnp.asarray(tu, jnp.float32).reshape(1, -1).T  # (r_act, 1) per item
        t_u = jnp.tile(t_u, (b, 1))
        out_u = fwd(state, xu, t_u, yu, mu)
        out_u = out_u.reshape(b, r_act, c, chunk_width, h, w)
        out_u = out_u.transpose(0, 2, 1, 3, 4, 5).reshape(b, c, r_act * chunk_width, h, w)

        prev_s, text_s = self._cfg_scales(
            np.asarray(t_full[n_ctx:]), cfg_t_range, prev_chunk_scales, text_scales)
        prev_s = jnp.asarray(np.repeat(prev_s, chunk_width), act.dtype)
        text_s = jnp.asarray(np.repeat(text_s, chunk_width), act.dtype)
        ps = prev_s.reshape(1, 1, -1, 1, 1)
        ts_ = text_s.reshape(1, 1, -1, 1, 1)
        return (1.0 - ps) * out_u + (ps - ts_) * out_pre + ts_ * act

    # -- denoise ----------------------------------------------------------------------

    def denoise(
        self,
        x: jnp.ndarray,                 # (B, C, T_lat, H, W) noise
        ctx, ctx_mask, neg, neg_mask,
        num_inference_steps: int,
        chunk_width: int,
        window_size: int,
        cfg_number: int,
        cfg_t_range, text_scales, prev_chunk_scales,
        prefix_chunks: int = 0,
        clean_frames: Optional[jnp.ndarray] = None,  # (B,C,F,H,W) kept clean
        progress_callback=None,
    ) -> jnp.ndarray:
        sched = self.scheduler
        d = max(1, num_inference_steps // window_size)
        sched.set_scheduler_params(chunk_width, d)
        num_chunks = x.shape[2] // chunk_width
        window_size = min(window_size, num_chunks - prefix_chunks) or 1
        total = d * (num_chunks + window_size - 1 - prefix_chunks)

        if clean_frames is not None:
            f = clean_frames.shape[2]
            x = x.at[:, :, :f].set(clean_frames)

        for step in range(total):
            stage, idx = divmod(step, d)
            i = prefix_chunks + stage
            chunk_start = max(prefix_chunks, i - window_size + 1)
            chunk_end = min(num_chunks, i + 1)
            t_start = max(0, i - (num_chunks - 1))
            t_end = (min(window_size, i - prefix_chunks + 1)
                     if i - prefix_chunks < window_size else window_size)
            n_ctx = min(chunk_start, self.context_chunks)
            t_act = sched.chunk_timesteps(t_start, t_end, idx)
            t_full = np.concatenate(
                [np.full(n_ctx, sched.clean_t, np.float32), t_act])

            lo = (chunk_start - n_ctx) * chunk_width
            hi = chunk_end * chunk_width
            x_seq = x[:, :, lo:hi]
            flow = self._cfg_forward(
                x_seq, t_full, n_ctx, ctx, ctx_mask, neg, neg_mask,
                cfg_number, cfg_t_range, prev_chunk_scales, text_scales,
                chunk_width)
            x_act = x[:, :, chunk_start * chunk_width: hi]
            x_act = sched.step(x_act, flow, t_start, t_end, idx)
            x = x.at[:, :, chunk_start * chunk_width: hi].set(x_act)
            if clean_frames is not None:
                f = clean_frames.shape[2]
                x = x.at[:, :, :f].set(clean_frames)
            safe_emit_progress(progress_callback, (step + 1) / total,
                               f"magi stage {stage + 1} step {idx + 1}/{d}")
        return x

    # -- shared run -------------------------------------------------------------------

    def _run(
        self,
        prompt: str,
        negative_prompt: Optional[str],
        height: int, width: int, num_frames: int,
        num_inference_steps: int, seed,
        chunk_width: int, window_size: int,
        cfg_number: int, cfg_t_range, text_scales, prev_chunk_scales,
        return_latents: bool,
        progress_callback,
        prefix_latents: Optional[jnp.ndarray] = None,
        prefix_is_chunks: bool = False,
        **_: Any,
    ):
        self.load_components(return_latents)
        safe_emit_progress(progress_callback, 0.05, "components ready")
        ctx, ctx_mask = self.encode_prompt(prompt)
        neg, neg_mask = self.encode_prompt(negative_prompt or "")
        safe_emit_progress(progress_callback, 0.15, "prompt encoded")

        st = self.vae.spatial_compression_ratio
        tt = self.vae.temporal_compression_ratio
        t_lat = max(1, math.ceil(num_frames / tt))
        num_chunks = max(1, math.ceil(t_lat / chunk_width))
        t_lat = num_chunks * chunk_width
        z_ch = getattr(self.transformer.cfg, "in_channels", 16)
        if getattr(self.transformer.cfg, "half_channel_vae", False):
            z_ch //= 2
        shape = (1, z_ch, t_lat, height // st, width // st)
        x = self.get_latents(shape, seed=seed)

        prefix_chunks = 0
        clean_frames = None
        if prefix_latents is not None:
            if prefix_is_chunks:
                pf = prefix_latents.shape[2]
                prefix_chunks = pf // chunk_width
                x = x.at[:, :, :pf].set(prefix_latents)
                clean_frames = prefix_latents
            else:
                clean_frames = prefix_latents  # sub-chunk prefix (i2v)

        self.get_timesteps(self.scheduler, num_inference_steps)
        x = self.denoise(
            x, ctx, ctx_mask, neg, neg_mask, num_inference_steps,
            chunk_width, window_size, cfg_number, cfg_t_range, text_scales,
            prev_chunk_scales, prefix_chunks=prefix_chunks,
            clean_frames=clean_frames,
            progress_callback=make_mapped_progress(progress_callback, 0.2, 0.9),
        )
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "completed pipeline")
        return frames

    def decode_latents(self, z: jnp.ndarray) -> List[np.ndarray]:
        key = ("magi_vae_decode", tuple(z.shape))
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(self.vae)

            @jax.jit
            def dec(state, z):
                return nnx.merge(graphdef, state).decode(z)

            self._jit_cache[key] = dec
        _, state = nnx.split(self.vae)
        video = dec(state, z.astype(jnp.float32))
        b, c, t, h, w = video.shape
        frames = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames)

    # encode_video_latents inherited from BaseEngine (disk-cached).


_DEFAULTS = dict(
    chunk_width=6, window_size=4, cfg_number=3,
    cfg_t_range=(0.0, 0.0217, 0.1, 0.3, 0.999),
    text_scales=(7.5, 7.5, 7.5, 0.0, 0.0),
    prev_chunk_scales=(1.5, 1.5, 1.5, 1.0, 1.0),
)


@register_engine("magi", "t2v")
class MagiT2VEngine(MagiShared):
    def run(self, prompt: str = "", negative_prompt: Optional[str] = None,
            height: int = 512, width: int = 512, duration: Any = 96,
            fps: int = 24, num_frames: Optional[int] = None,
            num_inference_steps: int = 64, seed: Optional[int] = None,
            return_latents: bool = False, progress_callback=None,
            **kwargs: Any):
        if num_frames is None:
            num_frames = int(duration) if str(duration).isdigit() else 96
        opts = {**_DEFAULTS, **{k: v for k, v in kwargs.items() if k in _DEFAULTS}}
        return self._run(prompt, negative_prompt, height, width, num_frames,
                         num_inference_steps, seed, return_latents=return_latents,
                         progress_callback=progress_callback, **opts)


@register_engine("magi", "i2v")
class MagiI2VEngine(MagiShared):
    """First latent frame is pinned to the encoded image (reference i2v uses a
    1-frame prefix video, denoise.py:968 prepare_prefix_video)."""

    def run(self, image: Any = None, prompt: str = "",
            negative_prompt: Optional[str] = None,
            height: int = 512, width: int = 512, duration: Any = 96,
            fps: int = 24, num_frames: Optional[int] = None,
            num_inference_steps: int = 64, seed: Optional[int] = None,
            return_latents: bool = False, progress_callback=None,
            **kwargs: Any):
        if num_frames is None:
            num_frames = int(duration) if str(duration).isdigit() else 96
        opts = {**_DEFAULTS, **{k: v for k, v in kwargs.items() if k in _DEFAULTS}}
        self.load_components(return_latents)
        arr = self.load_image_input(image)
        import cv2

        arr = cv2.resize(arr, (width, height), interpolation=cv2.INTER_AREA)
        ttc = self.vae.temporal_compression_ratio
        vid = jnp.asarray(arr, jnp.float32).transpose(2, 0, 1)[None, :, None]
        vid = (vid / 127.5 - 1.0)
        vid = jnp.tile(vid, (1, 1, ttc, 1, 1))  # one latent frame worth
        prefix = self.encode_video_latents(vid)
        return self._run(prompt, negative_prompt, height, width, num_frames,
                         num_inference_steps, seed, return_latents=return_latents,
                         progress_callback=progress_callback,
                         prefix_latents=prefix, prefix_is_chunks=False, **opts)


@register_engine("magi", "v2v")
class MagiV2VEngine(MagiShared):
    """Continue a video: its latent chunks become the clean prefix
    (reference v2v.py prefix_video path)."""

    def run(self, video: Any = None, prompt: str = "",
            negative_prompt: Optional[str] = None,
            height: int = 512, width: int = 512, duration: Any = 96,
            fps: int = 24, num_frames: Optional[int] = None,
            num_inference_steps: int = 64, seed: Optional[int] = None,
            return_latents: bool = False, progress_callback=None,
            **kwargs: Any):
        if num_frames is None:
            num_frames = int(duration) if str(duration).isdigit() else 96
        opts = {**_DEFAULTS, **{k: v for k, v in kwargs.items() if k in _DEFAULTS}}
        self.load_components(return_latents)
        frames = self.load_video_input(video, height, width)
        vid = jnp.asarray(np.stack(frames), jnp.float32)  # (F, H, W, 3)
        vid = vid.transpose(3, 0, 1, 2)[None] / 127.5 - 1.0
        tt = self.vae.temporal_compression_ratio
        f = (vid.shape[2] // tt) * tt
        prefix = self.encode_video_latents(vid[:, :, :f])
        cw = opts["chunk_width"]
        pc = prefix.shape[2] // cw
        prefix = prefix[:, :, : pc * cw] if pc else prefix
        return self._run(prompt, negative_prompt, height, width,
                         num_frames, num_inference_steps, seed,
                         return_latents=return_latents,
                         progress_callback=progress_callback,
                         prefix_latents=prefix, prefix_is_chunks=bool(pc), **opts)

    def load_video_input(self, video: Any, height: int, width: int):
        import cv2

        from apex_studio_tpu.preprocess.base import load_frames

        frames = load_frames(video) if isinstance(video, str) else list(video)
        return [cv2.resize(np.asarray(fr), (width, height),
                           interpolation=cv2.INTER_AREA) for fr in frames]
