"""HunyuanVideo Framepack transformer in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/hunyuanvideo/framepack/model.py:134``
(HunyuanVideoFramepackTransformer3DModel, diffusers layout): the HunyuanVideo
dual/single-stream DiT extended with FramePack anti-drifting context —
multi-scale CLEAN history latents (1x/2x/4x patch embedders,
``HunyuanVideoHistoryPatchEmbed``, model.py:100) PREPENDED to the token
sequence with RoPE tables built from explicit frame indices
(``HunyuanVideoFramepackRotaryPosEmbed``, model.py:46; 2x/4x tables are the
full-resolution tables center-avg-pooled, model.py:507 _pad_rotary_emb), and a
SigLIP image projection (``FramepackClipVisionProjection``, model.py:87)
prepended to the text stream.

Only the first ``original_context_length`` tokens are projected out.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.hunyuanvideo import (
    HunyuanVideoConfig,
    HunyuanVideoTransformer3DModel,
)
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.rope import precompute_axial_freqs


def _avg_pool_rope(tab: np.ndarray, t: int, h: int, w: int, k: int) -> np.ndarray:
    """Center-downsample a [T·H·W, D/2] rope table by kernel k per axis with
    replicate edge padding (model.py:530 _pad_for_3d_conv + avg_pool3d)."""
    d = tab.shape[-1]
    x = tab.reshape(t, h, w, d)
    pt, ph, pw = (k - t % k) % k, (k - h % k) % k, (k - w % k) % k
    x = np.pad(x, ((0, pt), (0, ph), (0, pw), (0, 0)), mode="edge")
    tt, hh, ww = x.shape[:3]
    x = x.reshape(tt // k, k, hh // k, k, ww // k, k, d).mean(axis=(1, 3, 5))
    return x.reshape(-1, d)


class FramepackHistoryEmbed(nnx.Module):
    """HunyuanVideoHistoryPatchEmbed: three patch-size conv embedders for
    clean 1x / 2x / 4x history latents, implemented as patchify+Linear."""

    def __init__(self, cin: int, dim: int, *, dtype, param_dtype, rngs):
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj = Linear(cin * 1 * 2 * 2, dim, **kw)
        self.proj_2x = Linear(cin * 2 * 4 * 4, dim, **kw)
        self.proj_4x = Linear(cin * 4 * 8 * 8, dim, **kw)

    @staticmethod
    def _patch(x: jnp.ndarray, pt: int, p: int) -> jnp.ndarray:
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t // pt, pt, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // p) * (w // p), c * pt * p * p)

    def embed(self, x, scale: int, dtype):
        if scale == 1:
            return self.proj(self._patch(x, 1, 2).astype(dtype))
        if scale == 2:
            return self.proj_2x(self._patch(x, 2, 4).astype(dtype))
        return self.proj_4x(self._patch(x, 4, 8).astype(dtype))


class FramepackImageProjection(nnx.Module):
    def __init__(self, cin: int, dim: int, *, dtype, param_dtype, rngs):
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.up = Linear(cin, dim * 3, **kw)
        self.down = Linear(dim * 3, dim, **kw)

    def __call__(self, x):
        return self.down(nnx.silu(self.up(x)))


@transformer_registry.register(
    "hunyuanvideo.framepack",
    aliases=("framepack", "HunyuanVideoFramepackTransformer3DModel"))
class HunyuanVideoFramepackTransformer3DModel(HunyuanVideoTransformer3DModel):
    config_class = HunyuanVideoConfig

    def __init__(self, cfg: Optional[HunyuanVideoConfig] = None, *,
                 dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        cfg = cfg or HunyuanVideoConfig()
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.clean_x_embedder = FramepackHistoryEmbed(cfg.in_channels, cfg.dim, **kw)
        image_proj_dim = getattr(cfg, "image_proj_dim", 1152)
        self.image_projection = FramepackImageProjection(image_proj_dim, cfg.dim, **kw)

    def rope_for_indices(self, frame_indices: np.ndarray, h_tok: int, w_tok: int):
        """RoPE tables for explicit (possibly non-contiguous) frame indices
        (framepack rope, model.py:61). Returns numpy [T·H·W, D/2] cos/sin."""
        ids = np.stack(
            np.meshgrid(np.asarray(frame_indices), np.arange(h_tok),
                        np.arange(w_tok), indexing="ij"),
            axis=-1,
        ).reshape(1, -1, 3)
        cos, sin = precompute_axial_freqs(ids, self.cfg.rope_axes_dim,
                                          self.cfg.rope_theta)
        return np.asarray(cos)[0], np.asarray(sin)[0]

    def __call__(
        self,
        x: jnp.ndarray,                    # [B, C, T, H, W] noisy section
        t: jnp.ndarray,                    # [B] timestep (0..1000)
        text: jnp.ndarray,                 # [B, Lt, 4096]
        text_mask: Optional[jnp.ndarray] = None,
        pooled: Optional[jnp.ndarray] = None,
        guidance: Optional[jnp.ndarray] = None,
        image_embeds: Optional[jnp.ndarray] = None,   # [B, Li, image_proj_dim]
        indices_latents: Optional[np.ndarray] = None,
        latents_clean: Optional[jnp.ndarray] = None,
        indices_latents_clean: Optional[np.ndarray] = None,
        latents_history_2x: Optional[jnp.ndarray] = None,
        indices_latents_history_2x: Optional[np.ndarray] = None,
        latents_history_4x: Optional[jnp.ndarray] = None,
        indices_latents_history_4x: Optional[np.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        h_tok, w_tok = hh // cfg.patch_size, ww // cfg.patch_size
        if indices_latents is None:
            indices_latents = np.arange(tt)

        # condition embedding (same as base)
        t_freq = timestep_embedding(t.astype(jnp.float32), 256, flip_sin_to_cos=True)
        temb = self.time_linear_2(nnx.silu(self.time_linear_1(t_freq.astype(self.dtype))))
        if pooled is not None:
            temb = temb + self.text_linear_2(nnx.silu(self.text_linear_1(
                pooled.astype(self.dtype))))
        if self.guidance_linear_1 is not None and guidance is not None:
            g_freq = timestep_embedding(guidance.astype(jnp.float32), 256,
                                        flip_sin_to_cos=True)
            temb = temb + self.guidance_linear_2(nnx.silu(self.guidance_linear_1(
                g_freq.astype(self.dtype))))

        img = self.x_embedder(self.patchify(x).astype(self.dtype))
        n_out = img.shape[1]
        cos, sin = self.rope_for_indices(indices_latents, h_tok, w_tok)

        # Prepend multi-scale history (model.py:455 _pack_history_states:
        # clean first relative to main, then 2x, then 4x at the FRONT).
        segments: List[Tuple[jnp.ndarray, np.ndarray, np.ndarray]] = []
        if latents_clean is not None:
            ctoks = self.clean_x_embedder.embed(latents_clean, 1, self.dtype)
            ccos, csin = self.rope_for_indices(indices_latents_clean, h_tok, w_tok)
            segments.append((ctoks, ccos, csin))
        if latents_history_2x is not None:
            htoks = self.clean_x_embedder.embed(latents_history_2x, 2, self.dtype)
            t2 = len(np.asarray(indices_latents_history_2x))
            c2, s2 = self.rope_for_indices(indices_latents_history_2x, h_tok, w_tok)
            c2 = _avg_pool_rope(c2, t2, h_tok, w_tok, 2)
            s2 = _avg_pool_rope(s2, t2, h_tok, w_tok, 2)
            segments.append((htoks, c2, s2))
        if latents_history_4x is not None:
            htoks = self.clean_x_embedder.embed(latents_history_4x, 4, self.dtype)
            t4 = len(np.asarray(indices_latents_history_4x))
            c4, s4 = self.rope_for_indices(indices_latents_history_4x, h_tok, w_tok)
            c4 = _avg_pool_rope(c4, t4, h_tok, w_tok, 4)
            s4 = _avg_pool_rope(s4, t4, h_tok, w_tok, 4)
            segments.append((htoks, c4, s4))
        # prepend order: 4x, 2x, clean, main (each cat goes to the front)
        for toks, pc, ps in segments:
            img = jnp.concatenate([toks, img], axis=1)
            cos = np.concatenate([pc, cos], axis=0)
            sin = np.concatenate([ps, sin], axis=0)
        rope_cos = jnp.asarray(cos)[None, :, None, :]
        rope_sin = jnp.asarray(sin)[None, :, None, :]

        txt = self.context_embedder(text.astype(self.dtype), t, text_mask)
        if image_embeds is not None:
            img_txt = self.image_projection(image_embeds.astype(self.dtype))
            txt = jnp.concatenate([img_txt, txt], axis=1)
            if text_mask is not None:
                text_mask = jnp.concatenate(
                    [jnp.ones((b, img_txt.shape[1]), text_mask.dtype), text_mask],
                    axis=1)

        n_img = img.shape[1]
        mask = None
        if text_mask is not None:
            mask = jnp.concatenate(
                [jnp.ones((b, n_img), bool), text_mask.astype(bool)], axis=1)

        # framepack has no token-replace path → temb_tr None, n_first unused
        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, None, 0, rope_cos, rope_sin, mask)
        xseq = jnp.concatenate([img, txt], axis=1)
        for blk in self.single_transformer_blocks:
            xseq = blk(xseq, n_img, temb, None, 0, rope_cos, rope_sin, mask)
        img = xseq[:, :n_img][:, -n_out:]  # history tokens are context only

        from apex_studio_tpu.ops.norms import layer_norm

        scale, shift = jnp.split(
            self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        out = self.proj_out(img)
        return self.unpatchify(out, tt, hh, ww)
