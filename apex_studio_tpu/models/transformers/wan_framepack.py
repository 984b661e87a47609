"""Wan Apex-Framepack — long-video generation via compressed context packing.

Counterpart of the reference's
``src/transformer/wan/apex_framepack/model.py:1274``
(WanApexFramepackTransformer3DModel) + ``module.py`` schedules: the video is
denoised in sections of ``num_indices`` latent frames; already-generated
frames re-enter the sequence as *compressed context* — recent frames at full
resolution (factor 1) and progressively older frames space-time pooled by
factor-2/4/8 patch embedders — so the attention cost of arbitrary-length
videos stays bounded (the FramePack recipe, anchored bidirectionally:
frames 0-1 are generated first and act as the global anchor while the rest
fills in back-to-front).

TPU notes: each (context layout, section shape) pair is one compiled program;
the compressed context enters as extra tokens with RoPE evaluated at the
*center positions* of each pooled block (equivalent to the reference's
center_down_sample of the rope grid, model.py:402), so positions stay exact
without complex-tensor reshuffling.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.wan import (
    WanConfig,
    WanTransformer3DModel,
)
from apex_studio_tpu.ops.rope import precompute_axial_freqs


@dataclasses.dataclass
class WanFramepackConfig(WanConfig):
    # factor → (kt, kh, kw) latent-space compression kernels (k1h2w2 …)
    framepack_compressors: Tuple[Tuple[int, Tuple[int, int, int]], ...] = (
        (1, (1, 2, 2)), (2, (2, 4, 4)), (4, (4, 8, 8)), (8, (8, 16, 16)),
    )
    num_indices: int = 9          # target frames per section (Schedule G9)
    context_buckets: Tuple[Tuple[str, int, int], ...] = (
        ("F_1", 1, 1), ("F_2", 2, 2), ("F_4", 16, 4), ("F_8", 32, 8),
    )  # (name, max frames, compression factor), nearest-first

    @classmethod
    def from_dict(cls, cfg: dict) -> "WanFramepackConfig":
        import re

        cfg = dict(cfg)
        fc = cfg.get("framepack_compressors")
        if isinstance(fc, dict):  # reference format {1: "k1h2w2", ...}
            parsed = []
            for k, v in fc.items():
                m = re.match(r"k(\d+)h(\d+)w(\d+)", str(v))
                parsed.append((int(k), (int(m[1]), int(m[2]), int(m[3]))))
            cfg["framepack_compressors"] = tuple(sorted(parsed))
        elif isinstance(fc, (list, tuple)):
            cfg["framepack_compressors"] = tuple(
                (int(f), tuple(k)) for f, k in fc)
        if isinstance(cfg.get("context_buckets"), list):
            cfg["context_buckets"] = tuple(
                (str(n), int(a), int(b)) for n, a, b in cfg["context_buckets"])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


class LatentEmbedPacker(nnx.Module):
    """Per-compression-factor patch embedders (model.py:224): a factor-f
    embedder is a Conv3d with kernel=stride (f, 2f, 2f) — here the patchify
    reshape + Linear the MXU actually wants."""

    def __init__(self, in_channels: int, dim: int,
                 compressors: Sequence[Tuple[int, Tuple[int, int, int]]],
                 *, dtype, param_dtype, rngs: nnx.Rngs):
        self.kernels: Dict[str, Tuple[int, int, int]] = {}
        embedders = {}
        for factor, k in compressors:
            self.kernels[str(factor)] = tuple(k)
            embedders[str(factor)] = Linear(
                in_channels * int(np.prod(k)), dim, use_bias=True,
                dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.embedders = nnx.Dict(embedders)

    @staticmethod
    def _pad_to_multiple(x: jnp.ndarray, k: Tuple[int, int, int]) -> jnp.ndarray:
        """Edge-replicate pad T/H/W up to kernel multiples (pad_for_3d_conv)."""
        b, c, t, h, w = x.shape
        pt, ph, pw = (-t % k[0], -h % k[1], -w % k[2])
        if pt or ph or pw:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pt), (0, ph), (0, pw)),
                        mode="edge")
        return x

    def embed(self, x: jnp.ndarray, factor: str) -> jnp.ndarray:
        """(B, C, T, H, W) → (B, N, dim) tokens at the given compression."""
        k = self.kernels[factor]
        x = self._pad_to_multiple(x, k)
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t // k[0], k[0], h // k[1], k[1], w // k[2], k[2])
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        x = x.reshape(b, -1, c * int(np.prod(k)))
        emb = self.embedders[factor]
        return emb(x.astype(emb.dtype))

    def grid_shape(self, t: int, h: int, w: int, factor: str):
        k = self.kernels[factor]
        return (math.ceil(t / k[0]), math.ceil(h / k[1]), math.ceil(w / k[2]))


class FramepackSchedule:
    """Host-side section planner (module.py:111 Schedule_F2K1_G9_*): anchor
    frames [0, 2) first, then fill remaining frames back-to-front in windows
    of ``num_indices``; context = past anchor (factor 1) + future buckets."""

    def __init__(self, num_indices: int,
                 buckets: Sequence[Tuple[str, int, int]]):
        self.num_indices = int(num_indices)
        self.buckets = list(buckets)

    def num_sections(self, total_frames: int) -> int:
        return math.ceil(max(0, total_frames - 2) / self.num_indices) + 1

    def get_inference_inputs(self, total_frames: int, denoised: np.ndarray):
        """→ (past_idx, future_idx, target_idx) as numpy int arrays (None for
        absent parts); mirrors module.py:210 get_inference_inputs."""
        idx = np.arange(total_frames)
        if denoised.all():
            return None, None, None
        if not denoised.any():
            return None, None, idx[:2]
        end = total_frames - 1
        while denoised[end]:
            end -= 1
        end += 1
        start = max(end - self.num_indices, 2)
        target = idx[start:end]
        future = idx[end:] if end < total_frames else None
        past = idx[:2]
        return past, future, target

    def split_future(self, future: np.ndarray) -> List[Tuple[np.ndarray, int]]:
        """Nearest-first bucket split → [(indices, factor)] ascending time."""
        out: List[Tuple[List[int], int]] = []
        counts = {name: 0 for name, _, _ in self.buckets}
        chunks: Dict[str, List[int]] = {name: [] for name, _, _ in self.buckets}
        for f in future:
            for name, limit, _ in self.buckets:
                if counts[name] < limit:
                    chunks[name].append(int(f))
                    counts[name] += 1
                    break
        return [(np.asarray(chunks[name]), factor)
                for name, _, factor in self.buckets if chunks[name]]


@transformer_registry.register(
    "wan.apex_framepack",
    aliases=("wan_framepack", "WanApexFramepackTransformer3DModel"))
class WanApexFramepackTransformer3DModel(WanTransformer3DModel):
    config_class = WanFramepackConfig

    def __init__(self, cfg: WanFramepackConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.latent_embed_packer = LatentEmbedPacker(
            cfg.in_channels, cfg.dim, cfg.framepack_compressors,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.framepack_schedule = FramepackSchedule(cfg.num_indices,
                                                    cfg.context_buckets)
        # base patch_embedding is unused — the factor-1 packer plays its role
        self.patch_embedding = None

    def _rope_at(self, t_pos: np.ndarray, h_tok: int, w_tok: int,
                 h_step: float = 1.0, w_step: float = 1.0):
        """RoPE tables at explicit (possibly pooled-center) positions."""
        hs = np.arange(h_tok, dtype=np.float64) * h_step + (h_step - 1) / 2.0
        ws = np.arange(w_tok, dtype=np.float64) * w_step + (w_step - 1) / 2.0
        grid = np.stack(np.meshgrid(np.asarray(t_pos, np.float64), hs, ws,
                                    indexing="ij"), axis=-1).reshape(1, -1, 3)
        cos, sin = precompute_axial_freqs(jnp.asarray(grid, jnp.float32),
                                          self.cfg.rope_axes_dims, theta=10000.0)
        return cos[:, :, None, :], sin[:, :, None, :]

    def _chunk_tokens(self, latents: jnp.ndarray, frame_idx: np.ndarray,
                     factor: int):
        """Compressed context chunk → (tokens, rope_cos, rope_sin)."""
        b, c, t, h, w = latents.shape
        ph, pw = self.cfg.patch_size[1], self.cfg.patch_size[2]
        key = str(factor)
        kt, kh, kw = self.latent_embed_packer.kernels[key]
        tok = self.latent_embed_packer.embed(latents, key)
        tg, hg, wg = self.latent_embed_packer.grid_shape(t, h, w, key)
        # temporal centers: the middle source frame of each pooled block
        # (padded with the last frame), matching center_down_sample_3d
        fi = np.asarray(frame_idx, np.float64)
        pad = (-len(fi)) % kt
        if pad:
            fi = np.concatenate([fi, np.repeat(fi[-1:], pad)])
        t_pos = fi.reshape(-1, kt)[:, kt // 2]
        cos, sin = self._rope_at(t_pos, hg, wg,
                                 h_step=kh / ph, w_step=kw / pw)
        return tok, cos, sin

    def __call__(self, x, t, context, latent_context=None, indices=None,
                 context_image=None, fps_index=None):
        """x: (B, C, Tt, H, W) target section latents; ``indices``: absolute
        latent-frame indices of the section; ``latent_context``:
        [(latents, frame_indices, factor)] already-denoised context."""
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        ph, pw = cfg.patch_size[1], cfg.patch_size[2]
        if indices is None:
            indices = np.arange(tt)

        # conditioning (identical to the base model path)
        t_freq_in = t
        tokens_unused, temb, temb6, ctx, ctx_img, _, _, per_frame = \
            self._prepare_cond_packed(x, t_freq_in, context, context_image,
                                      fps_index)

        tgt_tok, tgt_cos, tgt_sin = self._chunk_tokens(x, np.asarray(indices), 1)
        n_target = tgt_tok.shape[1]
        parts, coss, sins = [], [], []
        for (lat, fidx, factor) in (latent_context or []):
            ptok, pcos, psin = self._chunk_tokens(lat, np.asarray(fidx),
                                                  int(factor))
            parts.append(ptok)
            coss.append(pcos)
            sins.append(psin)
        parts.append(tgt_tok)
        coss.append(tgt_cos)
        sins.append(tgt_sin)
        tokens = jnp.concatenate(parts, axis=1)
        rope_cos = jnp.concatenate(coss, axis=1)
        rope_sin = jnp.concatenate(sins, axis=1)

        for blk in self.blocks:
            tokens = blk(tokens, ctx, temb6, rope_cos, rope_sin,
                         context_image=ctx_img)
        tokens = tokens[:, -n_target:]
        return self._finalize(tokens, temb, per_frame, tt, hh, ww)

    def _prepare_cond_packed(self, x, t, context, context_image, fps_index):
        """The base `_prepare_cond` without its patch_embedding (the packer
        embeds the target instead)."""
        saved = self.patch_embedding
        self.patch_embedding = self.latent_embed_packer.embedders["1"]
        try:
            # factor-1 kernel equals the base patch size, so the Linear is
            # shape-compatible with base patchify
            out = WanTransformer3DModel._prepare_cond(
                self, x, t, context, context_image, fps_index)
        finally:
            self.patch_embedding = saved
        return out
