"""StepVideo (Step-Video-T2V/TI2V 30B) DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/stepvideo/base/model.py:32`` (StepVideoModel) +
``modules.py``: a PixArt-style adaLN-single transformer —
- per-frame 2D patch embed (patch 1), frames flattened into one joint
  sequence ``b (f l) d`` (model.py:224);
- self-attention with fused no-bias wqkv, per-head affine RMS qk-norm, and
  NeoX-style 3D RoPE split over head channels [64, 32, 32] for (f, h, w)
  (modules.py:20 RoPE1D.get_cos_sin duplicates freqs + rotate_half);
- cross-attention (wq / fused wkv, qk-norm, no rope) over the projected
  caption tokens — step-LLM features (6144) through the PixArt text
  projection, with CLIP features (1024) projected and PREPENDED
  (model.py:218-222);
- per-block scale_shift_table [6, dim] + the shared adaLN-single timestep
  6·dim vector (modules.py:390, t rescaled ×1000);
- i2v: condition latents channel-concat (in_channels×2, model.py:66) and a
  motion-score embedding in the image adaLN variant.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.flashvsr import FVLayerNorm, FVLinear
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding


@dataclasses.dataclass
class StepVideoConfig:
    num_attention_heads: int = 48
    attention_head_dim: int = 128
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 48
    patch_size: int = 1
    norm_eps: float = 1e-6
    caption_channels: Tuple[int, ...] = (6144, 1024)
    rope_ch_split: Tuple[int, ...] = (64, 32, 32)
    model_type: str = "t2v"
    use_additional_conditions: bool = False

    @classmethod
    def from_dict(cls, cfg: dict) -> "StepVideoConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        for key in ("caption_channels", "rope_ch_split"):
            if key in kw and isinstance(kw[key], (list, tuple)):
                kw[key] = tuple(kw[key])
            elif key in kw:
                kw[key] = (kw[key],)
        return cls(**kw)

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


class SVRMSNorm(nnx.Module):
    """Per-head-dim affine RMSNorm (modules.py:121)."""

    def __init__(self, dim, *, rngs):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + 1e-6)
        return (x32 * self.weight.value).astype(x.dtype)


def _neox_rope_tables(d: int, n: int, base: float = 1e4):
    inv = 1.0 / base ** (np.arange(0, d, 2, np.float64) / d)
    ang = np.outer(np.arange(n, dtype=np.float64), inv)
    ang = np.concatenate([ang, ang], axis=-1)  # duplicated (NeoX convention)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def rope3d_tables(ch_split: Tuple[int, ...], f: int, h: int, w: int):
    """Per-token cos/sin [S, head_dim] for the (f,h,w) grid with NeoX
    half-rotation per channel chunk (RoPE3D, modules.py:68-118)."""
    sizes = (f, h, w)
    grids = np.meshgrid(np.arange(f), np.arange(h), np.arange(w), indexing="ij")
    pos = [g.reshape(-1) for g in grids]
    coss, sins = [], []
    for i, d in enumerate(ch_split):
        cos, sin = _neox_rope_tables(d, sizes[i])
        coss.append(cos[pos[i]])
        sins.append(sin[pos[i]])
    return (jnp.asarray(np.concatenate(coss, -1)),
            jnp.asarray(np.concatenate(sins, -1)))


def _apply_neox_rope(x, cos, sin, ch_split):
    """x: [B, S, H, D]; rotate each channel chunk with its table (f32 math,
    result back in x.dtype)."""
    outs = []
    o = 0
    x32 = x.astype(jnp.float32)
    for i, d in enumerate(ch_split):
        xd = x32[..., o:o + d]
        c = cos[None, :, None, o:o + d]
        s = sin[None, :, None, o:o + d]
        x1, x2 = xd[..., :d // 2], xd[..., d // 2:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        outs.append(xd * c + rot * s)
        o += d
    return jnp.concatenate(outs, axis=-1).astype(x.dtype)


class StepVideoBlock(nnx.Module):
    def __init__(self, cfg: StepVideoConfig, *, dtype, rngs):
        d = cfg.dim
        kw = dict(dtype=dtype, rngs=rngs)
        self.norm1 = FVLayerNorm(d, 1e-5, affine=True, rngs=rngs)
        self.norm2 = FVLayerNorm(d, 1e-5, affine=True, rngs=rngs)
        self.wqkv = FVLinear(d, 3 * d, bias=False, **kw)
        self.wo = FVLinear(d, d, bias=False, **kw)
        self.q_norm = SVRMSNorm(cfg.attention_head_dim, rngs=rngs)
        self.k_norm = SVRMSNorm(cfg.attention_head_dim, rngs=rngs)
        self.c_wq = FVLinear(d, d, bias=False, **kw)
        self.c_wkv = FVLinear(d, 2 * d, bias=False, **kw)
        self.c_wo = FVLinear(d, d, bias=False, **kw)
        self.cq_norm = SVRMSNorm(cfg.attention_head_dim, rngs=rngs)
        self.ck_norm = SVRMSNorm(cfg.attention_head_dim, rngs=rngs)
        self.ff_in = FVLinear(d, 4 * d, bias=False, **kw)
        self.ff_out = FVLinear(4 * d, d, bias=False, **kw)
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (6, d), jnp.float32) / d ** 0.5)
        self.cfg = cfg

    def __call__(self, x, ctx, t6, rope_cos, rope_sin, ctx_bias=None):
        cfg = self.cfg
        b, s, d = x.shape
        nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
        mods = (self.scale_shift_table.value[None] + t6.reshape(-1, 6, d))
        sh1, sc1, g1, sh2, sc2, g2 = [m[:, None].astype(x.dtype)
                                      for m in jnp.moveaxis(mods, 1, 0)]
        h = self.norm1(x) * (1 + sc1) + sh1
        qkv = self.wqkv(h).reshape(b, s, nh, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _apply_neox_rope(self.q_norm(q), rope_cos, rope_sin, cfg.rope_ch_split)
        k = _apply_neox_rope(self.k_norm(k), rope_cos, rope_sin, cfg.rope_ch_split)
        out = attention_op(q, k, v).reshape(b, s, d)
        x = x + self.wo(out) * g1

        q = self.cq_norm(self.c_wq(x).reshape(b, s, nh, hd))
        kv = self.c_wkv(ctx).reshape(b, ctx.shape[1], nh, 2 * hd)
        ck, cv = jnp.split(kv, 2, axis=-1)
        ck = self.ck_norm(ck)
        out = attention_op(q, ck, cv, bias=ctx_bias).reshape(b, s, d)
        x = x + self.c_wo(out)

        h = self.norm2(x) * (1 + sc2) + sh2
        h = self.ff_out(jax.nn.gelu(self.ff_in(h), approximate=True))
        return x + h * g2


@transformer_registry.register(
    "stepvideo.base", aliases=("stepvideo", "StepVideoModel"))
class StepVideoModel(nnx.Module):
    config_class = StepVideoConfig

    def __init__(self, cfg: Optional[StepVideoConfig] = None, *,
                 dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg = cfg or StepVideoConfig()
        d = cfg.dim
        kw = dict(dtype=dtype, rngs=rngs)
        cin = cfg.in_channels * (2 if cfg.model_type == "i2v" else 1)
        p = cfg.patch_size
        self.pos_embed = FVLinear(cin * p * p, d, **kw)  # PatchEmbed proj
        self.blocks = nnx.List([StepVideoBlock(cfg, **kw)
                                for _ in range(cfg.num_layers)])
        self.norm_out = FVLayerNorm(d, cfg.norm_eps, affine=False, rngs=rngs)
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (2, d), jnp.float32) / d ** 0.5)
        self.proj_out = FVLinear(d, p * p * cfg.out_channels, **kw)
        # adaLN-single (timestep → dim MLP → 6·dim)
        self.t_linear_1 = FVLinear(256, d, **kw)
        self.t_linear_2 = FVLinear(d, d, **kw)
        self.adaln_linear = FVLinear(d, 6 * d, **kw)
        # captions: step-LLM + optional CLIP
        cap = cfg.caption_channels[0]
        self.caption_norm = FVLayerNorm(cap, cfg.norm_eps, affine=False, rngs=rngs)
        self.caption_linear_1 = FVLinear(cap, d, **kw)
        self.caption_linear_2 = FVLinear(d, d, **kw)
        self.clip_projection = (FVLinear(cfg.caption_channels[1], d, **kw)
                                if len(cfg.caption_channels) > 1 else None)
        self.dtype = dtype

    @staticmethod
    def sharding_rules(cfg: "StepVideoConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(wqkv|c_wq|c_wkv|ff_in)\.kernel", P(None, "tp")),
                (r"(wo|c_wo|ff_out)\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    def __call__(self, x, t, text, text_mask=None, clip_text=None,
                 condition: Optional[jnp.ndarray] = None):
        """x: [B,C,F,H,W] latents (t in [0,1], rescaled ×1000 internally);
        text: [B,L,6144]; clip_text: [B,Lc,1024]; condition: i2v latents
        channel-concat (model.py:253)."""
        cfg = self.cfg
        if condition is not None:
            x = jnp.concatenate([x, condition.astype(x.dtype)], axis=1)
        b, c, f, hh, ww = x.shape
        p = cfg.patch_size
        h_tok, w_tok = hh // p, ww // p
        # per-frame 2D patchify → joint sequence (f l)
        xt = x.transpose(0, 2, 3, 4, 1).reshape(
            b, f, h_tok, p, w_tok, p, c) if p > 1 else None
        if p == 1:
            tokens = x.transpose(0, 2, 3, 4, 1).reshape(b, f * h_tok * w_tok, c)
        else:
            tokens = x.reshape(b, c, f, h_tok, p, w_tok, p).transpose(
                0, 2, 3, 5, 1, 4, 6).reshape(b, f * h_tok * w_tok, c * p * p)
        tokens = self.pos_embed(tokens.astype(self.dtype))

        t_emb = timestep_embedding(t.astype(jnp.float32) * 1000.0, 256,
                                   flip_sin_to_cos=True)
        emb = self.t_linear_2(jax.nn.silu(self.t_linear_1(t_emb.astype(self.dtype))))
        t6 = self.adaln_linear(jax.nn.silu(emb))

        ctx = self.caption_linear_2(jax.nn.gelu(
            self.caption_linear_1(self.caption_norm(text.astype(self.dtype))),
            approximate=True))
        bias = None
        n_txt = ctx.shape[1]
        if self.clip_projection is not None and clip_text is not None:
            clip = self.clip_projection(clip_text.astype(self.dtype))
            ctx = jnp.concatenate([clip, ctx], axis=1)
        # The reference truncates the cross-attn kv stream to the TEXT mask
        # length and marks the first sum(mask) positions valid
        # (model.py:128 prepare_attn_mask: kv_seqlens = mask.sum;
        # encoder_hidden_states[:, :max(kv_seqlens)]) — clip tokens ride
        # first, the text tail beyond sum(mask)-Lc is dropped.
        ctx = ctx[:, :n_txt]
        if text_mask is not None:
            kv_len = jnp.sum(text_mask.astype(jnp.int32), axis=1)  # [B]
            pos = jnp.arange(n_txt)[None, :]
            valid = pos < kv_len[:, None]
            neg = jnp.asarray(-1e30, jnp.float32)
            bias = jnp.where(valid[:, None, None, :], 0.0, neg)

        rope_cos, rope_sin = rope3d_tables(cfg.rope_ch_split, f, h_tok, w_tok)
        for blk in self.blocks:
            tokens = blk(tokens, ctx, t6, rope_cos, rope_sin, ctx_bias=bias)

        sst = self.scale_shift_table.value[None] + emb.astype(jnp.float32)[:, None]
        shift, scale = sst[:, 0][:, None], sst[:, 1][:, None]
        tokens = self.norm_out(tokens) * (1 + scale.astype(tokens.dtype)) \
            + shift.astype(tokens.dtype)
        out = self.proj_out(tokens)
        out = out.reshape(b, f, h_tok, w_tok, p, p, cfg.out_channels)
        out = out.transpose(0, 6, 1, 2, 4, 3, 5).reshape(
            b, cfg.out_channels, f, h_tok * p, w_tok * p)
        return out
