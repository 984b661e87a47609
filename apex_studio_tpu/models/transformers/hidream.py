"""HiDream-I1 image MMDiT with MoE feed-forwards, in JAX/NNX.

Counterpart of the reference's ``src/transformer/hidream/base/model.py``
(HiDreamImageTransformer2DModel; MoE gate :158, MOEFeedForwardSwiGLU :238,
double/single blocks :440/:326): a flux-style double+single-stream DiT where
the image-stream FFN is a DeepSeek-style MoE — softmax top-k routing
(weights NOT renormalized, norm_topk_prob=False) over routed SwiGLU experts
plus a half-width always-on shared expert. Conditioning stacks pooled
CLIP-L+G with T5 tokens and one Llama hidden state PER BLOCK
(config.llama_layers), appended to the shared text stream block by block.

TPU MoE note: dense scan-over-experts with routing-weight masks (static
shapes); see hunyuanimage3.py for the same trade-off discussion.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops.attention import attention
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class HiDreamConfig:
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 16
    num_single_layers: int = 32
    attention_head_dim: int = 128
    num_attention_heads: int = 20
    text_emb_dim: int = 2048          # pooled CLIP-L + CLIP-G
    caption_dim: int = 4096           # T5 & Llama feature dim
    num_routed_experts: int = 4
    num_activated_experts: int = 2
    axes_dims_rope: Tuple[int, ...] = (64, 32, 32)  # sums to head_dim 128
    llama_layers: Tuple[int, ...] = ()
    rope_theta: float = 10000.0

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "HiDreamConfig":
        cfg = dict(cfg)
        if isinstance(cfg.get("caption_channels"), list):
            cfg["caption_dim"] = cfg["caption_channels"][0]
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in cfg.items() if k in known}
        return cls(**kw)


class _SwiGLU(nnx.Module):
    """LLaMA-style SwiGLU: the nominal hidden width is shrunk to 2/3 and
    rounded UP to a multiple of 256 (reference HiDreamImageFeedForwardSwiGLU,
    model.py:38-42) — real HiDream-I1 checkpoints bake this into w1/w2/w3."""

    def __init__(self, dim: int, hidden: int, *, dtype, rngs,
                 multiple_of: int = 256):
        hidden = int(2 * hidden / 3)
        hidden = multiple_of * ((hidden + multiple_of - 1) // multiple_of)
        kw = dict(use_bias=False, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.w1 = Linear(dim, hidden, **kw)
        self.w2 = Linear(hidden, dim, **kw)
        self.w3 = Linear(dim, hidden, **kw)

    def __call__(self, x):
        return self.w2(nnx.silu(self.w1(x)) * self.w3(x))


class _MoESwiGLU(nnx.Module):
    """Shared half-width expert + top-k routed experts; gate weights come
    from raw softmax scores (no renormalization — model.py:200)."""

    def __init__(self, dim: int, hidden: int, n_routed: int, n_active: int,
                 *, dtype, rngs):
        self.shared_experts = _SwiGLU(dim, hidden // 2, dtype=dtype, rngs=rngs)
        self.experts = nnx.List([
            _SwiGLU(dim, hidden, dtype=dtype, rngs=rngs) for _ in range(n_routed)
        ])
        init = nnx.initializers.normal(1.0 / math.sqrt(dim))
        self.gate_weight = nnx.Param(
            init(rngs.params(), (n_routed, dim), jnp.float32))
        self.top_k = n_active
        self.n_routed = n_routed

    def __call__(self, x):
        scores = jax.nn.softmax(
            x.astype(jnp.float32) @ self.gate_weight.value.T, axis=-1)
        topw, topi = jax.lax.top_k(scores, self.top_k)
        onehot = jax.nn.one_hot(topi, self.n_routed, dtype=scores.dtype)
        w_full = (onehot * topw[..., None]).sum(axis=-2)
        out = jnp.zeros_like(x, dtype=jnp.float32)
        for e, expert in enumerate(self.experts):
            out = out + (w_full[..., e:e + 1].astype(x.dtype)
                         * expert(x)).astype(jnp.float32)
        out = out + self.shared_experts(x).astype(jnp.float32)
        return out.astype(x.dtype)


class _HiDreamAttention(nnx.Module):
    def __init__(self, cfg: HiDreamConfig, single: bool, *, dtype, rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.to_out = Linear(d, d, **kw)
        self.q_rms_norm = RMSNorm(d)
        self.k_rms_norm = RMSNorm(d)
        if not single:
            self.to_q_t = Linear(d, d, **kw)
            self.to_k_t = Linear(d, d, **kw)
            self.to_v_t = Linear(d, d, **kw)
            self.to_out_t = Linear(d, d, **kw)
            self.q_rms_norm_t = RMSNorm(d)
            self.k_rms_norm_t = RMSNorm(d)
        self.single = single
        self.heads = cfg.num_attention_heads
        self.hd = cfg.attention_head_dim

    def _split(self, x):
        b, s, d = x.shape
        return x.reshape(b, s, self.heads, self.hd)

    def __call__(self, img, txt=None, rope=None):
        b = img.shape[0]
        qi = self._split(self.q_rms_norm(self.to_q(img)).astype(img.dtype))
        ki = self._split(self.k_rms_norm(self.to_k(img)).astype(img.dtype))
        vi = self._split(self.to_v(img))
        if self.single:
            q, k, v = qi, ki, vi
        else:
            qt = self._split(self.q_rms_norm_t(self.to_q_t(txt)).astype(img.dtype))
            kt = self._split(self.k_rms_norm_t(self.to_k_t(txt)).astype(img.dtype))
            vt = self._split(self.to_v_t(txt))
            q = jnp.concatenate([qi, qt], axis=1)
            k = jnp.concatenate([ki, kt], axis=1)
            v = jnp.concatenate([vi, vt], axis=1)
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = attention(q, k, v)
        out = out.reshape(b, out.shape[1], -1)
        if self.single:
            return self.to_out(out)
        n_img = img.shape[1]
        return self.to_out(out[:, :n_img]), self.to_out_t(out[:, n_img:])


def _ff(cfg: HiDreamConfig, *, dtype, rngs):
    d = cfg.dim
    if cfg.num_routed_experts > 0:
        return _MoESwiGLU(d, 4 * d, cfg.num_routed_experts,
                          cfg.num_activated_experts, dtype=dtype, rngs=rngs)
    return _SwiGLU(d, 4 * d, dtype=dtype, rngs=rngs)


class _DoubleBlock(nnx.Module):
    def __init__(self, cfg: HiDreamConfig, *, dtype, rngs):
        d = cfg.dim
        self.adaln = Linear(d, 12 * d, use_bias=True, dtype=dtype,
                            param_dtype=dtype, rngs=rngs)
        self.norm1_i = LayerNorm(d, elementwise_affine=False)
        self.norm1_t = LayerNorm(d, elementwise_affine=False)
        self.attn1 = _HiDreamAttention(cfg, single=False, dtype=dtype, rngs=rngs)
        self.norm3_i = LayerNorm(d, elementwise_affine=False)
        self.ff_i = _ff(cfg, dtype=dtype, rngs=rngs)
        self.norm3_t = LayerNorm(d, elementwise_affine=False)
        self.ff_t = _SwiGLU(d, 4 * d, dtype=dtype, rngs=rngs)

    def __call__(self, img, txt, temb, rope):
        mods = jnp.split(self.adaln(nnx.silu(temb))[:, None], 12, axis=-1)
        (sh_i, sc_i, g_i, sh_mi, sc_mi, g_mi,
         sh_t, sc_t, g_t, sh_mt, sc_mt, g_mt) = mods
        ni = self.norm1_i(img).astype(img.dtype) * (1 + sc_i) + sh_i
        nt = self.norm1_t(txt).astype(img.dtype) * (1 + sc_t) + sh_t
        ai, at = self.attn1(ni, nt, rope)
        img = img + g_i * ai
        txt = txt + g_t * at
        ni = self.norm3_i(img).astype(img.dtype) * (1 + sc_mi) + sh_mi
        img = img + g_mi * self.ff_i(ni)
        nt = self.norm3_t(txt).astype(img.dtype) * (1 + sc_mt) + sh_mt
        txt = txt + g_mt * self.ff_t(nt)
        return img, txt


class _SingleBlock(nnx.Module):
    def __init__(self, cfg: HiDreamConfig, *, dtype, rngs):
        d = cfg.dim
        self.adaln = Linear(d, 6 * d, use_bias=True, dtype=dtype,
                            param_dtype=dtype, rngs=rngs)
        self.norm1_i = LayerNorm(d, elementwise_affine=False)
        self.attn1 = _HiDreamAttention(cfg, single=True, dtype=dtype, rngs=rngs)
        self.norm3_i = LayerNorm(d, elementwise_affine=False)
        self.ff_i = _ff(cfg, dtype=dtype, rngs=rngs)

    def __call__(self, x, temb, rope):
        sh, sc, g, sh_m, sc_m, g_m = jnp.split(
            self.adaln(nnx.silu(temb))[:, None], 6, axis=-1)
        n = self.norm1_i(x).astype(x.dtype) * (1 + sc) + sh
        x = x + g * self.attn1(n, rope=rope)
        n = self.norm3_i(x).astype(x.dtype) * (1 + sc_m) + sh_m
        return x + g_m * self.ff_i(n)


@transformer_registry.register(
    "hidream.base", aliases=("hidream", "HiDreamImageTransformer2DModel"))
class HiDreamImageTransformer2DModel(nnx.Module):
    config_class = HiDreamConfig

    def __init__(self, cfg: HiDreamConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        if not cfg.llama_layers:
            cfg = dataclasses.replace(
                cfg, llama_layers=tuple(range(
                    cfg.num_layers + cfg.num_single_layers)))
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.x_embedder = Linear(cfg.in_channels * cfg.patch_size ** 2, d, **kw)
        self.t_in_1 = Linear(256, d, **kw)
        self.t_in_2 = Linear(d, d, **kw)
        self.p_in_1 = Linear(cfg.text_emb_dim, d, **kw)
        self.p_in_2 = Linear(d, d, **kw)
        n_proj = len(cfg.llama_layers) + 1  # + the T5 projection (last)
        # TextProjection is bias-free in the reference (model.py:316)
        pkw = dict(kw, use_bias=False)
        self.caption_projection = nnx.List(
            [Linear(cfg.caption_dim, d, **pkw) for _ in range(n_proj)])
        self.double_stream_blocks = nnx.List(
            [_DoubleBlock(cfg, dtype=dtype, rngs=rngs)
             for _ in range(cfg.num_layers)])
        self.single_stream_blocks = nnx.List(
            [_SingleBlock(cfg, dtype=dtype, rngs=rngs)
             for _ in range(cfg.num_single_layers)])
        self.final_adaln = Linear(d, 2 * d, **kw)
        self.final_norm = LayerNorm(d, elementwise_affine=False)
        self.proj_out = Linear(d, cfg.patch_size ** 2 * cfg.out_channels, **kw)

    @staticmethod
    def sharding_rules(cfg: "HiDreamConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules([
            (r".*(to_q|to_k|to_v|to_q_t|to_k_t|to_v_t|w1|w3)\.kernel", P(None, "tp")),
            (r".*(to_out|to_out_t|w2)\.kernel", P("tp", None)),
        ])

    def patchify(self, x):
        """Token features are [p1, p2, C] — channel FASTEST — matching the
        reference pipeline's packing (model.py:690 `.permute(0, 2, 3, 1)`),
        which is the layout x_embedder's checkpoint weights expect."""
        p = self.cfg.patch_size
        b, c, h, w = x.shape
        x = x.reshape(b, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 3, 5, 1)
        return x.reshape(b, (h // p) * (w // p), p * p * c)

    def unpatchify(self, tok, h, w):
        """Output features are [p1, p2, C] per the reference's inference
        unpatchify (model.py:634 `.reshape(1, pH, pW, p1, p2, C).permute(0,
        5, 1, 3, 2, 4)`)."""
        p = self.cfg.patch_size
        c = self.cfg.out_channels
        b = tok.shape[0]
        x = tok.reshape(b, h // p, w // p, p, p, c)
        x = x.transpose(0, 5, 1, 3, 2, 4)
        return x.reshape(b, c, h, w)

    def __call__(self, x, t, t5_ctx, llama_ctx, pooled):
        """x (B,C,H,W); t (B,) 0..1000; t5_ctx (B,Lt,caption_dim);
        llama_ctx: list of per-block hidden states (B,Ll,caption_dim) of
        length num_layers+num_single_layers; pooled (B, text_emb_dim)."""
        cfg = self.cfg
        b, c, hh, ww = x.shape
        gh, gw = hh // cfg.patch_size, ww // cfg.patch_size
        img = self.x_embedder(self.patchify(x).astype(self.dtype))

        half = 128
        freqs = jnp.asarray(np.exp(
            -math.log(10000.0) * np.arange(half, dtype=np.float64) / half),
            jnp.float32)
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        sincos = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        temb = self.t_in_2(nnx.silu(self.t_in_1(sincos.astype(self.dtype))))
        temb = temb + self.p_in_2(nnx.silu(self.p_in_1(pooled.astype(self.dtype))))

        llama_proj = [self.caption_projection[i](h_.astype(self.dtype))
                      for i, h_ in enumerate(llama_ctx)]
        t5_proj = self.caption_projection[-1](t5_ctx.astype(self.dtype))
        initial_txt = jnp.concatenate([t5_proj, llama_proj[-1]], axis=1)
        n_init = initial_txt.shape[1]

        # joint rope over (batch/0, row, col) ids — the published config uses
        # 3 axes (e.g. 64+32+32=128) with the leading axis pinned to 0, like
        # flux (reference patchify img_ids, model.py:664); text ids are zero.
        n_axes = len(cfg.axes_dims_rope)
        ids_img = np.stack(np.meshgrid(np.arange(gh), np.arange(gw),
                                       indexing="ij"), axis=-1).reshape(1, -1, 2)
        if n_axes == 3:
            ids_img = np.concatenate(
                [np.zeros((1, ids_img.shape[1], 1), ids_img.dtype), ids_img],
                axis=-1)
        n_txt = n_init + llama_proj[0].shape[1]
        ids = np.concatenate(
            [ids_img, np.zeros((1, n_txt, n_axes), ids_img.dtype)], axis=1)
        cos, sin = precompute_axial_freqs(jnp.asarray(ids, jnp.float32),
                                          cfg.axes_dims_rope, cfg.rope_theta)
        rope = (cos[:, :, None, :], sin[:, :, None, :])

        bid = 0
        txt = initial_txt
        for blk in self.double_stream_blocks:
            cur = jnp.concatenate([txt, llama_proj[bid]], axis=1)
            img, cur_out = blk(img, cur, temb, rope)
            txt = cur_out[:, :n_init]
            bid += 1

        x_seq = jnp.concatenate([img, txt], axis=1)
        n_img_txt = x_seq.shape[1]
        for blk in self.single_stream_blocks:
            cur = jnp.concatenate([x_seq, llama_proj[bid]], axis=1)
            cur = blk(cur, temb, rope)
            x_seq = cur[:, :n_img_txt]
            bid += 1

        img = x_seq[:, : gh * gw]
        sh, sc = jnp.split(self.final_adaln(nnx.silu(temb))[:, None], 2, axis=-1)
        img = self.final_norm(img).astype(img.dtype) * (1 + sc) + sh
        return self.unpatchify(self.proj_out(img).astype(jnp.float32), hh, ww)
