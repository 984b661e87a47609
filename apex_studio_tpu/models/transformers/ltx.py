"""LTX-Video DiT, tpu-native.

Contract parity with the reference's ``src/transformer/ltx/base/model.py``
(LTXVideoTransformer3DModel):
- token-sequence latents [B, S, C] (patch 1×1×1: the 32×/8× compression lives
  in the VAE), ``patchify_proj`` Linear in → inner
- PixArt AdaLayerNormSingle: sinusoidal-256 → MLP → inner, then
  SiLU + Linear → 6·inner ``temb``; supports PER-TOKEN timesteps
  (model.py:1390 ``timestep.flatten()`` → view(B, S, 6·inner)) which LTX uses
  to hold conditioning tokens at their own noise level
- per-block ``scale_shift_table`` [6, inner] added to temb →
  (shift/scale/gate)×2 (model.py:1172)
- block: RMSNorm (no affine) → scale/shift → self-attn (bias=True,
  qk RMSNorm over the FULL inner dim pre-head-split, RoPE) → gate; cross-attn
  on the raw residual stream (no pre-norm when adaptive norm is on,
  model.py:1121); RMSNorm → scale/shift → GELU-tanh FF → gate
- RoPE over fractional coords (t/max_t, h/max_h, w/max_w): dim//6 exp-spaced
  frequencies per axis ``theta**linspace(0,1)·π/2`` evaluated at ``2·frac−1``,
  interleaved per frequency across axes, repeat×2, leading dim%6 pad with
  cos=1/sin=0 (model.py:837)
- final: LayerNorm (no affine) + table[2, inner] (shift, scale order) +
  proj_out (model.py:1440)

TPU design: everything is one jittable token-sequence program; RoPE tables
are computed in-graph in f32 from the (traced) coordinate tensor so one
compiled step serves any fps/crop offsets at the same shape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import (
    GELUMLP,
    LayerNorm,
    Linear,
    RMSNorm,
    TimestepEmbedder,
)
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops.attention import attention


@dataclass
class LTXVideoConfig:
    in_channels: int = 128
    out_channels: int = 128
    num_layers: int = 28
    num_attention_heads: int = 32
    attention_head_dim: int = 64
    caption_channels: int = 4096
    cross_attention_dim: int = 2048
    norm_eps: float = 1e-6
    qk_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    # positional_embedding_max_pos (frames, height, width)
    max_pos: Tuple[int, int, int] = (20, 2048, 2048)
    timestep_scale: float = 1000.0
    causal_temporal_positioning: bool = False
    extra: Dict[str, Any] = field(default_factory=dict)

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LTXVideoConfig":
        known = {
            "in_channels": d.get("in_channels", 128),
            "out_channels": d.get("out_channels") or d.get("in_channels", 128),
            "num_layers": d.get("num_layers", 28),
            "num_attention_heads": d.get("num_attention_heads", 32),
            "attention_head_dim": d.get("attention_head_dim", 64),
            "caption_channels": d.get("caption_channels", 4096),
            "cross_attention_dim": d.get("cross_attention_dim", 2048),
            "norm_eps": d.get("norm_eps", 1e-6),
            "rope_theta": d.get("positional_embedding_theta", 10000.0),
            "max_pos": tuple(d.get("positional_embedding_max_pos", (20, 2048, 2048))),
            "timestep_scale": d.get("timestep_scale_multiplier") or 1000.0,
            "causal_temporal_positioning": d.get("causal_temporal_positioning", False),
        }
        extra = {k: v for k, v in d.items() if k not in known}
        return cls(**known, extra=extra)


def ltx_rope_freqs(coords: jnp.ndarray, dim: int, theta: float,
                   max_pos: Tuple[int, int, int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """coords [B, 3, S] (t in seconds·fps-normalised, y, x in pixels) →
    (cos, sin) each [B, S, dim]. Mirrors LTXVideoRotaryPosEmbed (exp spacing).
    """
    n = dim // 6
    frac = jnp.stack(
        [coords[:, i].astype(jnp.float32) / max_pos[i] for i in range(3)], axis=-1
    )  # [B, S, 3]
    # theta**linspace(log_theta(1)=0, log_theta(theta)=1, n) ∈ [1, theta]
    indices = theta ** jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
    indices = indices * (math.pi / 2)
    # [B, S, 3, n] → transpose freq-major → [B, S, n, 3] → flatten
    freqs = indices[None, None, None, :] * (frac[..., None] * 2.0 - 1.0)
    freqs = jnp.swapaxes(freqs, -1, -2).reshape(*freqs.shape[:2], 3 * n)
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1)
    pad = dim % 6
    if pad:
        cos = jnp.concatenate([jnp.ones_like(cos[..., :pad]), cos], axis=-1)
        sin = jnp.concatenate([jnp.zeros_like(sin[..., :pad]), sin], axis=-1)
    return cos, sin


def apply_ltx_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Interleaved rotation over the full inner dim (pre-head-split)."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return x * cos.astype(x.dtype) + rot * sin.astype(x.dtype)


class LTXAttention(nnx.Module):
    """Self- or cross-attention with full-dim qk RMSNorm and optional RoPE."""

    def __init__(self, dim: int, heads: int, *, qk_eps: float, dtype, rngs: nnx.Rngs):
        kw = dict(use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.to_q = Linear(dim, dim, **kw)
        self.to_k = Linear(dim, dim, **kw)
        self.to_v = Linear(dim, dim, **kw)
        self.to_out = Linear(dim, dim, **kw)
        self.q_norm = RMSNorm(dim, eps=qk_eps)
        self.k_norm = RMSNorm(dim, eps=qk_eps)
        self.heads = heads

    def __call__(self, x, context=None, rope=None, mask_bias=None,
                 skip_mode: Optional[str] = None):
        b, s, d = x.shape
        q = self.q_norm(self.to_q(x)).astype(x.dtype)
        kv_in = x if context is None else context
        k = self.k_norm(self.to_k(kv_in)).astype(x.dtype)
        v = self.to_v(kv_in)
        if rope is not None and context is None:
            cos, sin = rope
            q = apply_ltx_rope(q, cos, sin)
            k = apply_ltx_rope(k, cos, sin)
        # STG perturbed stream (attention.py:118): replace the attention
        # output by the attention INPUT ("attention_skip") or by the value
        # projection ("attention_values").
        if skip_mode == "attention_skip":
            return self.to_out(x)
        if skip_mode == "attention_values":
            return self.to_out(v)
        hd = d // self.heads
        q = q.reshape(b, s, self.heads, hd)
        k = k.reshape(b, -1, self.heads, hd)
        v = v.reshape(b, -1, self.heads, hd)
        out = attention(q, k, v, bias=mask_bias)
        return self.to_out(out.reshape(b, s, d))


class LTXBlock(nnx.Module):
    def __init__(self, cfg: LTXVideoConfig, *, dtype, rngs: nnx.Rngs):
        dim = cfg.inner_dim
        self.norm1 = RMSNorm(dim, eps=cfg.norm_eps, elementwise_affine=False)
        self.attn1 = LTXAttention(dim, cfg.num_attention_heads,
                                  qk_eps=cfg.qk_norm_eps, dtype=dtype, rngs=rngs)
        self.attn2 = LTXAttention(dim, cfg.num_attention_heads,
                                  qk_eps=cfg.qk_norm_eps, dtype=dtype, rngs=rngs)
        self.norm2 = RMSNorm(dim, eps=cfg.norm_eps, elementwise_affine=False)
        self.ff = GELUMLP(dim, 4 * dim, use_bias=True, approximate=True,
                          dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.scale_shift_table = nnx.Param(
            jnp.asarray(np.random.default_rng(0).normal(size=(6, dim)) / dim**0.5,
                        jnp.float32)
        )

    def __call__(self, x, temb, context, rope, ctx_bias,
                 skip_mode: Optional[str] = None):
        # temb [B, Tt, 6, dim] with Tt ∈ {1, S}
        ada = self.scale_shift_table.value[None, None] + temb
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            ada[:, :, i].astype(x.dtype) for i in range(6)
        ]
        h = self.norm1(x).astype(x.dtype) * (1 + scale_msa) + shift_msa
        x = x + gate_msa * self.attn1(h, rope=rope, skip_mode=skip_mode)
        # reference applies cross-attn on the un-normed residual stream
        x = x + self.attn2(x, context=context, mask_bias=ctx_bias)
        h = self.norm2(x).astype(x.dtype) * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * self.ff(h)
        return x


@transformer_registry.register("ltx.base", aliases=("ltx", "LTXVideoTransformer3DModel"))
class LTXVideoTransformer3D(nnx.Module):
    config_class = LTXVideoConfig

    def __init__(self, cfg: LTXVideoConfig, *, dtype=jnp.bfloat16,
                 param_dtype=None, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        dim = cfg.inner_dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.patchify_proj = Linear(cfg.in_channels, dim, **kw)
        # AdaLayerNormSingle: PixArt combined timestep embedder + Linear→6·dim
        self.time_embed = TimestepEmbedder(dim, freq_size=256, dtype=dtype,
                                           param_dtype=dtype, rngs=rngs)
        self.time_proj = Linear(dim, 6 * dim, **kw)
        # PixArtAlphaTextProjection: Linear → GELU(tanh) → Linear
        self.caption_in = Linear(cfg.caption_channels, dim, **kw)
        self.caption_out = Linear(dim, dim, **kw)
        self.blocks = nnx.List([
            LTXBlock(cfg, dtype=dtype, rngs=rngs) for _ in range(cfg.num_layers)
        ])
        self.norm_out = LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.proj_out = Linear(dim, cfg.out_channels, **kw)
        self.scale_shift_table = nnx.Param(
            jnp.asarray(np.random.default_rng(1).normal(size=(2, dim)) / dim**0.5,
                        jnp.float32)
        )

    @staticmethod
    def sharding_rules(cfg: "LTXVideoConfig"):
        from apex_studio_tpu.parallel.sharding import ShardingRules

        return ShardingRules(rules=[
            (r"\.attn\d\.to_(q|k|v)\.kernel$", (None, "tp")),
            (r"\.attn\d\.to_out\.kernel$", ("tp", None)),
            (r"\.ff\.fc1\.kernel$", (None, "tp")),
            (r"\.ff\.fc2\.kernel$", ("tp", None)),
        ])

    def __call__(
        self,
        hidden_states: jnp.ndarray,      # [B, S, C]
        encoder_hidden_states: jnp.ndarray,  # [B, Sc, caption_channels]
        timestep: jnp.ndarray,           # [B, 1] or [B, S] in [0, 1]
        encoder_attention_mask: Optional[jnp.ndarray] = None,  # [B, Sc]
        video_coords: Optional[jnp.ndarray] = None,            # [B, 3, S]
        skip_blocks: Tuple[int, ...] = (),
        skip_strategy: str = "attention_values",
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, s, _ = hidden_states.shape
        rope = ltx_rope_freqs(video_coords, cfg.inner_dim, cfg.rope_theta, cfg.max_pos)

        ctx_bias = None
        if encoder_attention_mask is not None:
            neg = (1.0 - encoder_attention_mask.astype(jnp.float32)) * -10000.0
            ctx_bias = neg[:, None, None, :]  # [B, 1, 1, Sc]

        x = self.patchify_proj(hidden_states.astype(self.dtype))

        t = timestep.astype(jnp.float32) * cfg.timestep_scale  # [B, Tt]
        emb = self.time_embed(t.reshape(-1)).reshape(b, t.shape[1], -1)  # [B,Tt,dim]
        temb = self.time_proj(nnx.silu(emb)).astype(jnp.float32)
        temb = temb.reshape(b, t.shape[1], 6, cfg.inner_dim)

        context = self.caption_out(
            nnx.gelu(self.caption_in(encoder_hidden_states.astype(self.dtype)),
                     approximate=True)
        )

        skip_set = frozenset(skip_blocks)
        for i, block in enumerate(self.blocks):
            mode = skip_strategy if i in skip_set else None
            x = block(x, temb, context, rope, ctx_bias, skip_mode=mode)

        # final table order: [shift, scale] (model.py:1443)
        vals = self.scale_shift_table.value[None, None] + emb.astype(jnp.float32)[:, :, None]
        shift, scale = vals[:, :, 0].astype(x.dtype), vals[:, :, 1].astype(x.dtype)
        x = self.norm_out(x).astype(x.dtype) * (1 + scale) + shift
        return self.proj_out(x)
