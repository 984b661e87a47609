"""FlashVSR streaming video upscaler engine.

Counterpart of the reference's ``src/engine/flashvsr/upscale.py`` (+ manifest
``upscalers/flashvsr-1.1-tiny.yml``): one-step (DMD) wan-DiT video SR driven
in causal chunks — first 6 latent frames, then 2 per step — with a rolling
self-attention KV cache, LQ-pixel conditioning injected before block 0, and a
TCDecoder (identity-deepened TAEHV, z=784 = 16 latent + pixel-shuffled LQ
cond) for decoding.

TPU structure: the LQ conv features for the whole clip are computed in ONE
jitted call (`FVLQProj` full-sequence == the reference's chunked conv caches,
see models/transformers/flashvsr.py), then the denoise loop runs exactly two
jit programs — one for the 6-frame warmup chunk and one steady-state 2-frame
step with donated KV caches.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import safe_emit_progress

logger = logging.getLogger("apex.engine.flashvsr")


def largest_8n1_leq(n: int) -> int:
    """Largest 8n+1 ≤ n (upscale.py:22)."""
    return 0 if n < 1 else ((n - 1) // 8) * 8 + 1


@register_engine("flashvsr", "upscale")
class FlashVSRUpscaleEngine(BaseEngine):
    def _load_context(self, length: int = 512) -> jnp.ndarray:
        """The reference ships a fixed positive-prompt T5 embedding
        (``posi_prompt.pth``, upscale.py:14); fall back to zeros when the
        asset is absent (the distilled model is prompt-insensitive)."""
        text_dim = self.transformer.cfg.text_dim
        p = self._resolve_path("flashvsr/posi_prompt.pth")
        if p is not None:
            try:
                from apex_studio_tpu.loaders.safetensors_io import load_torch_checkpoint

                sd = load_torch_checkpoint(p)
                arr = next(iter(sd.values()))
                return jnp.asarray(arr, jnp.float32).reshape(1, -1, text_dim)
            except Exception:
                logger.exception("posi_prompt load failed; using zeros")
        return jnp.zeros((1, length, text_dim), jnp.float32)

    def run(
        self,
        video: Optional[Any] = None,
        image: Optional[Any] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        upscale_factor: float = 4.0,
        seed: Optional[int] = None,
        kv_ratio: float = 3.0,
        local_range: int = 11,
        num_inference_steps: int = 1,
        guidance_scale: float = 1.0,
        max_frames: int = 121,
        fps: float = 24.0,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting FlashVSR upscale")
        for ctype in ("transformer", "vae"):
            if getattr(self, ctype, None) is None:
                self.load_component_by_type(ctype)

        import cv2

        from apex_studio_tpu.preprocess.base import load_frames

        if video is not None:
            frames_in = (load_frames(video, max_frames=max_frames)
                         if isinstance(video, str) else list(video)[:max_frames])
        elif image is not None:
            frames_in = [self.load_image_input(image)] * 25
        else:
            raise ValueError("flashvsr upscale needs a video or an image")

        # Pad tail with the last frame (reference appends 4 copies), clamp to
        # 8n+1, and require at least 25 frames (3 streaming chunks).
        frames_in = list(frames_in) + [frames_in[-1]] * 4
        F = largest_8n1_leq(len(frames_in))
        if F < 25:
            frames_in = frames_in + [frames_in[-1]] * (25 - len(frames_in))
            F = 25
        frames_in = frames_in[:F]

        h0, w0 = np.asarray(frames_in[0]).shape[:2]
        height = height or int(round(h0 * upscale_factor))
        width = width or int(round(w0 * upscale_factor))
        # mod 128 (reference _aspect_ratio_resize mod_value=128): latent mod
        # 16 so the (2,8,8) streaming window tiles evenly.
        height -= height % 128
        width -= width % 128
        height = max(height, 128)
        width = max(width, 128)

        up = [cv2.resize(np.asarray(fr), (width, height),
                         interpolation=cv2.INTER_LANCZOS4) for fr in frames_in]
        vid = jnp.asarray(np.stack(up), jnp.float32)
        vid = vid.transpose(3, 0, 1, 2)[None] / 127.5 - 1.0  # [1,3,F,H,W]

        n = (F - 1) // 8
        t_lat = 2 * n
        n_chunks = n - 2
        lat_h, lat_w = height // 8, width // 8
        h_tok, w_tok = lat_h // 2, lat_w // 2  # patch (1,2,2)

        rng = np.random.default_rng(seed if seed is not None else 0)
        noise = jnp.asarray(
            rng.standard_normal((1, self.transformer.cfg.in_dim, t_lat, lat_h, lat_w)),
            jnp.float32)

        safe_emit_progress(progress_callback, 0.1, "Preparing LQ features")
        graphdef, state = nnx.split(self.transformer)

        @jax.jit
        def lq_features(s, v):
            return nnx.merge(graphdef, s).LQ_proj_in(v)

        lq_all = lq_features(state, vid)  # list of [1, t_lat*h_tok*w_tok, D]

        context = self._load_context()
        t_emb, t_mod, ctx_kv = self._jit_cache.get("fv_ctx", (None, None, None))
        if t_emb is None:
            m = self.transformer
            t_emb, t_mod = m.time_embed(1000.0)
            ctx_kv = m.context_kv(context)
            self._jit_cache["fv_ctx"] = (t_emb, t_mod, ctx_kv)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def step(s, x_chunk, caches, lq, cos, sin):
            m = nnx.merge(graphdef, s)
            pred, new_caches = m(x_chunk, t_emb, t_mod, cos, sin, ctx_kv,
                                 lq_tokens=lq, caches=caches)
            return x_chunk - pred.astype(x_chunk.dtype), new_caches

        tok_per_lat = h_tok * w_tok
        out_chunks: List[jnp.ndarray] = []
        caches = None
        safe_emit_progress(progress_callback, 0.2, "Denoising (streaming)")
        for c in range(n_chunks):
            if c == 0:
                lat_slice = (0, 6)
                f_start = 0
            else:
                lat_slice = (4 + 2 * c, 6 + 2 * c)
                f_start = 4 + 2 * c
            a, b = lat_slice
            x_chunk = noise[:, :, a:b]
            lq = [t[:, a * tok_per_lat:b * tok_per_lat] for t in lq_all]
            cos, sin = self.transformer.rope_for_chunk(b - a, h_tok, w_tok, f_start)
            x_out, caches = step(state, x_chunk, caches, lq, cos, sin)
            out_chunks.append(x_out)
            safe_emit_progress(
                progress_callback, 0.2 + 0.6 * (c + 1) / n_chunks,
                f"FlashVSR chunk {c + 1}/{n_chunks}")

        latents = jnp.concatenate(out_chunks, axis=2)  # [1,16,t_lat,h,w]
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return latents

        safe_emit_progress(progress_callback, 0.85, "Decoding (TCDecoder)")
        from apex_studio_tpu.models.vaes.tae_vae import TAEVAE

        vae_graph, vae_state = nnx.split(self.vae)
        if isinstance(self.vae, TAEVAE):
            # tiny variant: TCDecoder wants the LQ video as channel cond
            cond = vid[:, :, :8 * n - 3]  # head-padded to 4·t_lat inside decode

            @jax.jit
            def dec(s, z, cv):
                return nnx.merge(vae_graph, s).decode(z, cond=cv)

            videoc = dec(vae_state, latents, cond)
        else:  # full variant decodes through the standard wan VAE

            @jax.jit
            def dec(s, z):
                return nnx.merge(vae_graph, s).decode(z)

            videoc = dec(vae_state, latents)  # [1,3,4T-3,H,W]
        bb, cc, tt, hh, ww = videoc.shape
        frames = self.tensor_to_frames(
            jnp.transpose(videoc, (0, 2, 1, 3, 4)).reshape(bb * tt, cc, hh, ww))
        safe_emit_progress(progress_callback, 1.0, "Upscale complete")
        return frames
