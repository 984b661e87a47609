"""Wan Lynx (face-ID personalized video) DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/wan/lynx/model.py:522`` + ``src/helpers/wan/lynx.py``
(WanLynxEngine adapters): the Wan t2v backbone whose cross-attention gains an
**IP-adapter branch** (helpers/wan/lynx.py:359 WanIPAttnProcessor) — queries
also attend to face identity tokens through per-block ``to_k_ip``/``to_v_ip``
projections (plus learned register tokens), scaled by ``ip_scale`` — and a
**Perceiver Resampler** (helpers/wan/lynx.py:285) that distills ArcFace
embeddings into those identity tokens.

The lite variant ships no register tokens (``ip_registers=0``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, LayerNorm, Linear, RMSNorm
from apex_studio_tpu.models.registry import text_encoder_registry, transformer_registry
from apex_studio_tpu.models.transformers.wan import WanAttention, WanConfig
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class WanLynxConfig(WanConfig):
    ip_cross_attention_dim: int = 2048
    ip_registers: int = 16
    num_ip_layers: Optional[int] = None   # default: every block

    @classmethod
    def from_dict(cls, cfg: dict) -> "WanLynxConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "patch_size" in kw:
            kw["patch_size"] = tuple(kw["patch_size"])
        return cls(**kw)


class PerceiverAttention(nnx.Module):
    def __init__(self, dim: int, dim_head: int, heads: int, *, rngs: nnx.Rngs):
        inner = dim_head * heads
        kw = dict(use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32,
                  rngs=rngs)
        self.norm1 = LayerNorm(dim, eps=1e-5, rngs=rngs)
        self.norm2 = LayerNorm(dim, eps=1e-5, rngs=rngs)
        self.to_q = Linear(dim, inner, **kw)
        self.to_kv = Linear(dim, 2 * inner, **kw)
        self.to_out = Linear(inner, dim, **kw)
        self.heads, self.dim_head = heads, dim_head

    def __call__(self, x, latents):
        x = self.norm1(x)
        latents = self.norm2(latents)
        b, l, _ = latents.shape
        q = self.to_q(latents).reshape(b, l, self.heads, self.dim_head)
        kv_in = jnp.concatenate([x, latents], axis=1)
        kv = self.to_kv(kv_in).reshape(b, kv_in.shape[1], 2, self.heads,
                                       self.dim_head)
        out = attention_op(q, kv[:, :, 0], kv[:, :, 1]).reshape(b, l, -1)
        return self.to_out(out)


@text_encoder_registry.register("LynxResampler", aliases=("lynx_resampler",))
class LynxResampler(nnx.Module):
    """Perceiver resampler: face embeddings → identity tokens
    (helpers/wan/lynx.py:285)."""

    @dataclasses.dataclass
    class Config:
        dim: int = 1024
        depth: int = 8
        dim_head: int = 64
        heads: int = 16
        num_queries: int = 8
        embedding_dim: int = 512
        output_dim: int = 2048
        ff_mult: int = 4

        @classmethod
        def from_dict(cls, cfg: dict) -> "LynxResampler.Config":
            known = {f.name for f in dataclasses.fields(cls)}
            return cls(**{k: v for k, v in cfg.items() if k in known})

    config_class = Config

    def __init__(self, cfg: "LynxResampler.Config", *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        d = cfg.dim
        kw = dict(use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32,
                  rngs=rngs)
        self.latents = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, cfg.num_queries, d), jnp.float32))
        self.proj_in = Linear(cfg.embedding_dim, d, **kw)
        self.proj_out = Linear(d, cfg.output_dim, **kw)
        self.norm_out = LayerNorm(cfg.output_dim, eps=1e-5, rngs=rngs)
        self.attn_layers = nnx.List(
            [PerceiverAttention(d, cfg.dim_head, cfg.heads, rngs=rngs)
             for _ in range(cfg.depth)])
        self.ff_layers = nnx.List(
            [GELUMLP(d, d * cfg.ff_mult, approximate=False, use_bias=False,
                     dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
             for _ in range(cfg.depth)])

    def __call__(self, x):  # [B, N, embedding_dim]
        x = self.proj_in(x.astype(jnp.float32))
        lat = jnp.broadcast_to(self.latents.value,
                               (x.shape[0],) + self.latents.value.shape[1:])
        for attn, ff in zip(self.attn_layers, self.ff_layers):
            lat = attn(x, lat) + lat
            lat = ff(lat) + lat
        return self.norm_out(self.proj_out(lat))


class LynxBlock(nnx.Module):
    """Wan block whose cross-attention carries the IP branch."""

    def __init__(self, cfg: WanLynxConfig, with_ip: bool, *, dtype,
                 param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        lkw = dict(use_bias=True, **kw)
        self.attn1 = WanAttention(cfg, cross=False, **kw)
        self.attn2 = WanAttention(cfg, cross=True, **kw)
        if with_ip:
            self.to_k_ip = Linear(cfg.ip_cross_attention_dim, d, **lkw)
            self.to_v_ip = Linear(cfg.ip_cross_attention_dim, d, **lkw)
            if cfg.ip_registers > 0:
                self.registers = nnx.Param(
                    nnx.initializers.normal(1.0 / math.sqrt(d))(
                        rngs.params(),
                        (1, cfg.ip_registers, cfg.ip_cross_attention_dim),
                        jnp.float32))
            else:
                self.registers = None
        else:
            self.to_k_ip = self.to_v_ip = self.registers = None
        self.norm2_weight = (nnx.Param(jnp.ones((d,), jnp.float32))
                             if cfg.cross_attn_norm else None)
        self.norm2_bias = (nnx.Param(jnp.zeros((d,), jnp.float32))
                           if cfg.cross_attn_norm else None)
        self.ffn = GELUMLP(d, cfg.ffn_dim, approximate=True, **kw)
        self.scale_shift_table = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 6, d), jnp.float32))
        self.eps = cfg.eps
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def _ip_attn(self, norm_x, ip_tokens, ip_scale):
        b, s, c = norm_x.shape
        if self.registers is not None:
            regs = jnp.broadcast_to(
                self.registers.value,
                (ip_tokens.shape[0],) + self.registers.value.shape[1:])
            ip_tokens = jnp.concatenate(
                [ip_tokens, regs.astype(ip_tokens.dtype)], axis=1)
        q = self.attn2.norm_q(self.attn2.to_q(norm_x))
        q = q.reshape(b, s, self.heads, self.head_dim)
        k = self.attn2.norm_k(self.to_k_ip(ip_tokens)).reshape(
            b, ip_tokens.shape[1], self.heads, self.head_dim)
        v = self.to_v_ip(ip_tokens).reshape(
            b, ip_tokens.shape[1], self.heads, self.head_dim)
        return attention_op(q, k, v).reshape(b, s, c) * ip_scale

    def __call__(self, x, context, temb6, rope_cos, rope_sin,
                 ip_tokens=None, ip_scale=1.0):
        mods = (self.scale_shift_table.value + temb6).astype(x.dtype)
        sh, sc, g = mods[:, 0:1], mods[:, 1:2], mods[:, 2:3]
        csh, csc, cg = mods[:, 3:4], mods[:, 4:5], mods[:, 5:6]
        norm_x = layer_norm(x, eps=self.eps) * (1 + sc) + sh
        x = x + self.attn1(norm_x, rope_cos=rope_cos, rope_sin=rope_sin) * g
        if self.norm2_weight is not None:
            norm_x = layer_norm(x, self.norm2_weight.value,
                                self.norm2_bias.value, self.eps)
        else:
            norm_x = x
        cross = self.attn2(norm_x, context=context)
        if self.to_k_ip is not None and ip_tokens is not None:
            cross = cross + self._ip_attn(norm_x, ip_tokens.astype(x.dtype),
                                          ip_scale)
        x = x + cross
        norm_x = layer_norm(x, eps=self.eps) * (1 + csc) + csh
        return x + self.ffn(norm_x) * cg


@transformer_registry.register(
    "wan.lynx", aliases=("WanLynxTransformer3DModel", "wan_lynx")
)
class WanLynxTransformer3DModel(nnx.Module):
    config_class = WanLynxConfig

    @staticmethod
    def sharding_rules(cfg: "WanLynxConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|to_k_ip|to_v_ip|add_k_proj|add_v_proj)\.kernel",
                 P(None, "tp")),
                (r"to_out\.kernel", P("tp", None)),
                (r"ffn\.fc1\.kernel", P(None, "tp")),
                (r"ffn\.fc2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    def __init__(self, cfg: WanLynxConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch = int(np.prod(cfg.patch_size))
        self.patch_embedding = Linear(cfg.in_channels * patch, d, **kw)
        self.time_embedder_linear_1 = Linear(cfg.freq_dim, d, **kw)
        self.time_embedder_linear_2 = Linear(d, d, **kw)
        self.time_proj = Linear(d, 6 * d, **kw)
        self.text_embedder_linear_1 = Linear(cfg.text_dim, d, **kw)
        self.text_embedder_linear_2 = Linear(d, d, **kw)
        n_ip = cfg.num_ip_layers if cfg.num_ip_layers is not None else cfg.num_layers
        self.blocks = nnx.List(
            [LynxBlock(cfg, with_ip=i < n_ip, dtype=dtype,
                       param_dtype=param_dtype, rngs=rngs)
             for i in range(cfg.num_layers)])
        self.norm_out_scale_shift = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 2, d), jnp.float32))
        self.proj_out = Linear(d, cfg.out_channels * patch, **kw)

    def _patchify(self, x):
        b, c, t, h, w = x.shape
        pt, ph, pw = self.cfg.patch_size
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // ph) * (w // pw), -1)

    def rope_tables(self, t_tok, h_tok, w_tok):
        ids = np.stack(np.meshgrid(np.arange(t_tok), np.arange(h_tok),
                                   np.arange(w_tok), indexing="ij"),
                       axis=-1).reshape(1, -1, 3)
        cos, sin = precompute_axial_freqs(ids, self.cfg.rope_axes_dims, 10000.0)
        return cos[:, :, None, :], sin[:, :, None, :]

    def __call__(
        self,
        x: jnp.ndarray,                  # [B, C, T, H, W]
        t: jnp.ndarray,                  # [B]
        context: jnp.ndarray,            # [B, L, text_dim]
        ip_tokens: Optional[jnp.ndarray] = None,  # [B, N_ip, ip_dim]
        ip_scale: float = 1.0,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, _, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size
        n_t, n_h, n_w = tt // pt, hh // ph, ww // pw

        freq = timestep_embedding(t.astype(jnp.float32), cfg.freq_dim,
                                  flip_sin_to_cos=True)
        temb = self.time_embedder_linear_2(nnx.silu(
            self.time_embedder_linear_1(freq.astype(self.dtype))))
        temb6 = self.time_proj(nnx.silu(temb)).reshape(b, 6, cfg.dim
                                                       ).astype(jnp.float32)
        ctx = self.text_embedder_linear_2(nnx.gelu(
            self.text_embedder_linear_1(context.astype(self.dtype)),
            approximate=True))

        tokens = self.patch_embedding(self._patchify(x).astype(self.dtype))
        rope_cos, rope_sin = self.rope_tables(n_t, n_h, n_w)
        for blk in self.blocks:
            tokens = blk(tokens, ctx, temb6, rope_cos, rope_sin,
                         ip_tokens=ip_tokens, ip_scale=ip_scale)

        shift, scale = jnp.split(
            self.norm_out_scale_shift.value
            + temb.astype(jnp.float32)[:, None, :], 2, axis=1)
        out = layer_norm(tokens, eps=cfg.eps) * (1 + scale.astype(tokens.dtype)) \
            + shift.astype(tokens.dtype)
        out = self.proj_out(out)
        out = out.reshape(b, n_t, n_h, n_w, cfg.out_channels, pt, ph, pw)
        out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return out.reshape(b, cfg.out_channels, tt, hh, ww)
