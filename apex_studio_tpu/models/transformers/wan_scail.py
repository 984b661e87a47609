"""Wan SCAIL (pose-driven character video) DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/wan/scail/model.py:1017`` (SCAILModel): one joint
self-attention sequence over three token streams —
- the **reference image** latents (1 frame, full resolution, RoPE t=0,
  i2v-style all-ones mask channels, model.py:1251),
- the **noisy video** latents (RoPE t starting at 1 + rope_T_shift so the
  reference keeps slot 0, all-zeros mask channels),
- the **pose video** latents at half resolution through their own patch
  embedding; their RoPE h/w tables are the *pairwise complex averages* of the
  full-resolution tables (model.py:214) plus a large global offset
  (``pose_rope_shift``) separating pose from video positions.
Text cross-attention prepends projected CLIP reference-image tokens
(model.py:990 MLPProj), exactly like original Wan i2v.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, LayerNorm, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, rope_freqs_1d


@dataclasses.dataclass
class WanScailConfig:
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    in_dim: int = 20                    # 16 latents + 4 i2v mask channels
    dim: int = 5120
    ffn_dim: int = 13824
    freq_dim: int = 256
    text_dim: int = 4096
    text_len: int = 512
    out_dim: int = 16
    num_heads: int = 40
    num_layers: int = 40
    cross_attn_norm: bool = True
    eps: float = 1e-6
    image_dim: int = 1280
    pose_rope_shift: Tuple[int, int, int] = (0, 512, 512)

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def rope_axes_dims(self) -> Tuple[int, int, int]:
        d = self.head_dim
        h = w = 2 * (d // 6)
        return (d - 2 * h, h, w)

    @classmethod
    def from_dict(cls, cfg: dict) -> "WanScailConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        for key in ("patch_size", "pose_rope_shift"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)


class ScailBlock(nnx.Module):
    def __init__(self, cfg: WanScailConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.to_o = Linear(d, d, **kw)
        self.norm_q = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.norm_k = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.c_to_q = Linear(d, d, **kw)
        self.c_to_k = Linear(d, d, **kw)
        self.c_to_v = Linear(d, d, **kw)
        self.c_to_o = Linear(d, d, **kw)
        self.c_norm_q = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.c_norm_k = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.k_img = Linear(d, d, **kw)
        self.v_img = Linear(d, d, **kw)
        self.norm_k_img = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.norm3_weight = (nnx.Param(jnp.ones((d,), jnp.float32))
                             if cfg.cross_attn_norm else None)
        self.norm3_bias = (nnx.Param(jnp.zeros((d,), jnp.float32))
                           if cfg.cross_attn_norm else None)
        self.ffn = GELUMLP(d, cfg.ffn_dim, approximate=True, **kw)
        self.modulation = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 6, d), jnp.float32))
        self.heads = cfg.num_heads
        self.head_dim = cfg.head_dim
        self.eps = cfg.eps

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    def __call__(self, x, e6, context, n_clip, rope_cos, rope_sin):
        mods = (self.modulation.value + e6).astype(x.dtype)
        sh, sc, g = mods[:, 0:1], mods[:, 1:2], mods[:, 2:3]
        fsh, fsc, fg = mods[:, 3:4], mods[:, 4:5], mods[:, 5:6]
        b, s, c = x.shape

        norm_x = layer_norm(x, eps=self.eps) * (1 + sc) + sh
        q = apply_rope(self._heads(self.norm_q(self.to_q(norm_x))),
                       rope_cos, rope_sin)
        k = apply_rope(self._heads(self.norm_k(self.to_k(norm_x))),
                       rope_cos, rope_sin)
        v = self._heads(self.to_v(norm_x))
        x = x + self.to_o(attention_op(q, k, v).reshape(b, s, c)) * g

        if self.norm3_weight is not None:
            norm_x = layer_norm(x, self.norm3_weight.value,
                                self.norm3_bias.value, self.eps)
        else:
            norm_x = x
        # i2v cross-attn: CLIP tokens carry their own kv (model.py:713)
        ctx_img, ctx_txt = context[:, :n_clip], context[:, n_clip:]
        qc = self._heads(self.c_norm_q(self.c_to_q(norm_x)))
        kt = self._heads(self.c_norm_k(self.c_to_k(ctx_txt)))
        vt = self._heads(self.c_to_v(ctx_txt))
        out = attention_op(qc, kt, vt)
        ki = self._heads(self.norm_k_img(self.k_img(ctx_img)))
        vi = self._heads(self.v_img(ctx_img))
        out = out + attention_op(qc, ki, vi)
        x = x + self.c_to_o(out.reshape(b, s, c))

        norm_x = layer_norm(x, eps=self.eps) * (1 + fsc) + fsh
        return x + self.ffn(norm_x) * fg


@transformer_registry.register("wan.scail", aliases=("SCAILModel", "wan_scail"))
class SCAILModel(nnx.Module):
    config_class = WanScailConfig

    @staticmethod
    def sharding_rules(cfg: "WanScailConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|c_to_q|c_to_k|c_to_v|k_img|v_img)\.kernel",
                 P(None, "tp")),
                (r"(to_o|c_to_o)\.kernel", P("tp", None)),
                (r"ffn\.fc1\.kernel", P(None, "tp")),
                (r"ffn\.fc2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    def __init__(self, cfg: WanScailConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch = int(np.prod(cfg.patch_size))
        self.patch_embedding = Linear(cfg.in_dim * patch, d, **kw)
        self.patch_embedding_pose = Linear(cfg.in_dim * patch, d, **kw)
        self.text_embedding_1 = Linear(cfg.text_dim, d, **kw)
        self.text_embedding_2 = Linear(d, d, **kw)
        self.time_embedding_1 = Linear(cfg.freq_dim, d, **kw)
        self.time_embedding_2 = Linear(d, d, **kw)
        self.time_projection = Linear(d, 6 * d, **kw)
        # img_emb MLPProj (model.py:990)
        self.img_norm_in = LayerNorm(cfg.image_dim, eps=1e-5, rngs=rngs)
        self.img_linear_1 = Linear(cfg.image_dim, cfg.image_dim, **kw)
        self.img_linear_2 = Linear(cfg.image_dim, d, **kw)
        self.img_norm_out = LayerNorm(d, eps=1e-5, rngs=rngs)
        self.blocks = nnx.List(
            [ScailBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)])
        self.head_norm_mod = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 2, d), jnp.float32))
        self.head = Linear(d, cfg.out_dim * patch, **kw)

    def _patchify(self, x):
        b, c, t, h, w = x.shape
        pt, ph, pw = self.cfg.patch_size
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // ph) * (w // pw), -1)

    def _seg_tables(self, t_pos, h_pos, w_pos, downsample_hw=False):
        """cos/sin for one segment. With ``downsample_hw`` the h/w tables are
        pairwise complex averages of consecutive positions (model.py:214)."""
        dt, dh, dw = self.cfg.rope_axes_dims

        def table(pos, dim, avg):
            inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64)
                                     / dim))
            ang = np.asarray(pos, np.float64)[:, None] * inv
            c, s = np.cos(ang), np.sin(ang)
            if avg:
                c = 0.5 * (c[0::2] + c[1::2])
                s = 0.5 * (s[0::2] + s[1::2])
            return c.astype(np.float32), s.astype(np.float32)

        ct, st = table(t_pos, dt, False)
        ch, sh_ = table(h_pos, dh, downsample_hw)
        cw, sw = table(w_pos, dw, downsample_hw)
        f, h, w = len(ct), len(ch), len(cw)
        cos = np.concatenate([
            np.broadcast_to(ct[:, None, None], (f, h, w, ct.shape[-1])),
            np.broadcast_to(ch[None, :, None], (f, h, w, ch.shape[-1])),
            np.broadcast_to(cw[None, None, :], (f, h, w, cw.shape[-1])),
        ], axis=-1).reshape(f * h * w, -1)
        sin = np.concatenate([
            np.broadcast_to(st[:, None, None], (f, h, w, st.shape[-1])),
            np.broadcast_to(sh_[None, :, None], (f, h, w, sh_.shape[-1])),
            np.broadcast_to(sw[None, None, :], (f, h, w, sw.shape[-1])),
        ], axis=-1).reshape(f * h * w, -1)
        return cos, sin

    def rope_tables(self, n_t, n_h, n_w, t_shift: int = 0):
        cfg = self.cfg
        gs = cfg.pose_rope_shift
        ref = self._seg_tables([0], np.arange(n_h), np.arange(n_w))
        vid = self._seg_tables(np.arange(1 + t_shift, 1 + t_shift + n_t),
                               np.arange(n_h), np.arange(n_w))
        pose = self._seg_tables(np.arange(1 + t_shift, 1 + t_shift + n_t),
                                np.arange(gs[1], gs[1] + n_h),
                                np.arange(gs[2], gs[2] + n_w),
                                downsample_hw=True)
        cos = np.concatenate([ref[0], vid[0], pose[0]], axis=0)
        sin = np.concatenate([ref[1], vid[1], pose[1]], axis=0)
        return (jnp.asarray(cos, jnp.float32)[None, :, None, :],
                jnp.asarray(sin, jnp.float32)[None, :, None, :])

    def __call__(
        self,
        x: jnp.ndarray,                  # [B, 16, T, H, W] noisy latents
        t: jnp.ndarray,                  # [B]
        context: jnp.ndarray,            # [B, L, text_dim]
        pose_latents: jnp.ndarray,       # [B, 16, T, H/2, W/2]
        reference_latents: jnp.ndarray,  # [B, 16, 1, H, W]
        clip_embeds: jnp.ndarray,        # [B, 257, image_dim]
        rope_t_shift: int = 0,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, z, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size
        n_t, n_h, n_w = tt // pt, hh // ph, ww // pw

        def with_mask(v, ones):
            m = jnp.ones if ones else jnp.zeros
            mask = m((v.shape[0], cfg.in_dim - v.shape[1]) + v.shape[2:],
                     v.dtype)
            return jnp.concatenate([v, mask], axis=1)

        vid_tok = self.patch_embedding(
            self._patchify(with_mask(x, False)).astype(self.dtype))
        ref_tok = self.patch_embedding(
            self._patchify(with_mask(reference_latents, True)).astype(self.dtype))
        pose_tok = self.patch_embedding_pose(
            self._patchify(with_mask(pose_latents, True)).astype(self.dtype))
        n_ref, n_vid = ref_tok.shape[1], vid_tok.shape[1]
        seq = jnp.concatenate([ref_tok, vid_tok, pose_tok], axis=1)

        freq = timestep_embedding(t.astype(jnp.float32), cfg.freq_dim,
                                  flip_sin_to_cos=True)
        e = self.time_embedding_2(nnx.silu(
            self.time_embedding_1(freq.astype(self.dtype)))).astype(jnp.float32)
        e6 = self.time_projection(nnx.silu(e.astype(self.dtype))).reshape(
            b, 6, cfg.dim).astype(jnp.float32)

        # text padded/truncated to text_len (model.py:1378)
        L = context.shape[1]
        if L < cfg.text_len:
            context = jnp.concatenate(
                [context, jnp.zeros((b, cfg.text_len - L, context.shape[-1]),
                                    context.dtype)], axis=1)
        else:
            context = context[:, :cfg.text_len]
        ctx = self.text_embedding_2(nnx.gelu(
            self.text_embedding_1(context.astype(self.dtype)), approximate=True))
        y = self.img_norm_in(clip_embeds.astype(self.dtype))
        y = self.img_linear_2(nnx.gelu(self.img_linear_1(y), approximate=False))
        ctx_clip = self.img_norm_out(y)
        full_ctx = jnp.concatenate([ctx_clip, ctx], axis=1)

        rope_cos, rope_sin = self.rope_tables(n_t, n_h, n_w, rope_t_shift)
        for blk in self.blocks:
            seq = blk(seq, e6, full_ctx, ctx_clip.shape[1], rope_cos, rope_sin)

        vid = seq[:, n_ref:n_ref + n_vid]
        mods = (self.head_norm_mod.value + e[:, None, :]).astype(jnp.float32)
        shift, scale = mods[:, 0:1], mods[:, 1:2]
        out = (layer_norm(vid.astype(jnp.float32), eps=cfg.eps)
               * (1 + scale) + shift).astype(self.dtype)
        out = self.head(out)
        out = out.reshape(b, n_t, n_h, n_w, cfg.out_dim, pt, ph, pw)
        out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return out.reshape(b, cfg.out_dim, tt, hh, ww)
