"""Ovis-Image (Ovis-U1 image branch) MMDiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/ovis/base/model.py:456`` (OvisImageTransformer2DModel):
Flux-shaped joint-attention MMDiT — 6 dual + 27 single blocks at dim 3072
(24 heads x 128), packed 2x2 latents (in_channels 64) with 3-axis RoPE
(16, 56, 56) theta 10000 — but with SwiGLU feed-forwards in the dual blocks
(diffusers FeedForward activation_fn="swiglu", fused value‖gate projection),
a SiLU-gated MLP in the single blocks (model.py:300), an RMSNorm ahead of the
context embedder (model.py:521), timestep-only conditioning (no pooled text,
no guidance embeds), and *diagonal* text RoPE ids — text token i sits at
(0, i, i) in the position grid (engine/ovis/t2i.py:126).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.flux import (
    FluxJointAttention,
    FluxTransformer2DModel,
)
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class OvisConfig:
    patch_size: int = 1
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 6
    num_single_layers: int = 27
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 2048
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    mlp_ratio: float = 4.0

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "OvisConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


class FusedSwiGLU(nnx.Module):
    """fc2(value * silu(gate)) with a fused value‖gate projection — diffusers
    FeedForward(activation_fn="swiglu") parameter layout (net.0.proj/net.2)."""

    def __init__(self, dim: int, hidden: int, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.fc1 = Linear(dim, 2 * hidden, **kw)
        self.fc2 = Linear(hidden, dim, **kw)

    def __call__(self, x):
        value, gate = jnp.split(self.fc1(x), 2, axis=-1)
        return self.fc2(value * nnx.silu(gate))


class OvisDoubleBlock(nnx.Module):
    def __init__(self, cfg: OvisConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1_linear = Linear(d, 6 * d, **kw)
        self.norm1_context_linear = Linear(d, 6 * d, **kw)
        self.attn = FluxJointAttention(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        hidden = int(d * cfg.mlp_ratio)
        self.ff = FusedSwiGLU(d, hidden, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.ff_context = FusedSwiGLU(d, hidden, dtype=dtype, param_dtype=param_dtype,
                                      rngs=rngs)

    @staticmethod
    def _mod(linear, temb):
        return jnp.split(linear(nnx.silu(temb))[:, None, :], 6, axis=-1)

    def __call__(self, img, txt, temb, rope_cos, rope_sin):
        sh_i, sc_i, g_i, sh2_i, sc2_i, g2_i = self._mod(self.norm1_linear, temb)
        sh_t, sc_t, g_t, sh2_t, sc2_t, g2_t = self._mod(self.norm1_context_linear, temb)
        img_n = layer_norm(img, eps=1e-6) * (1 + sc_i) + sh_i
        txt_n = layer_norm(txt, eps=1e-6) * (1 + sc_t) + sh_t
        attn_i, attn_t = self.attn(img_n, txt_n, rope_cos, rope_sin)
        img = img + g_i * attn_i
        txt = txt + g_t * attn_t
        img = img + g2_i * self.ff(layer_norm(img, eps=1e-6) * (1 + sc2_i) + sh2_i)
        txt = txt + g2_t * self.ff_context(
            layer_norm(txt, eps=1e-6) * (1 + sc2_t) + sh2_t)
        return img, txt


class OvisSingleBlock(nnx.Module):
    """Parallel attention + SiLU-gated MLP over the fused [txt, img] sequence
    (model.py:260: proj_mlp → value‖gate, out = silu(gate)·value)."""

    def __init__(self, cfg: OvisConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm_linear = Linear(d, 3 * d, **kw)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.norm_q = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_k = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.mlp_hidden = int(d * cfg.mlp_ratio)
        self.proj_mlp = Linear(d, 2 * self.mlp_hidden, **kw)
        self.proj_out = Linear(d + self.mlp_hidden, d, **kw)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def __call__(self, x, temb, rope_cos, rope_sin):
        b, s, _ = x.shape
        shift, scale, gate = jnp.split(
            self.norm_linear(nnx.silu(temb))[:, None, :], 3, axis=-1)
        xn = layer_norm(x, eps=1e-6) * (1 + scale) + shift
        q = self.norm_q(self.to_q(xn).reshape(b, s, self.heads, self.head_dim))
        k = self.norm_k(self.to_k(xn).reshape(b, s, self.heads, self.head_dim))
        v = self.to_v(xn).reshape(b, s, self.heads, self.head_dim)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = attention_op(q, k, v).reshape(b, s, -1)
        value, mgate = jnp.split(self.proj_mlp(xn), 2, axis=-1)
        mlp = nnx.silu(mgate) * value
        return x + gate * self.proj_out(jnp.concatenate([attn, mlp], axis=-1))


@transformer_registry.register(
    "ovis.base", aliases=("ovis", "OvisImageTransformer2DModel")
)
class OvisImageTransformer2DModel(nnx.Module):
    config_class = OvisConfig

    def __init__(self, cfg: OvisConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.x_embedder = Linear(cfg.in_channels, d, **kw)
        self.context_embedder_norm = RMSNorm(cfg.joint_attention_dim, eps=1e-6, rngs=rngs)
        self.context_embedder = Linear(cfg.joint_attention_dim, d, **kw)
        self.timestep_linear_1 = Linear(256, d, **kw)
        self.timestep_linear_2 = Linear(d, d, **kw)
        self.transformer_blocks = nnx.List(
            [OvisDoubleBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)]
        )
        self.single_transformer_blocks = nnx.List(
            [OvisSingleBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_single_layers)]
        )
        self.norm_out_linear = Linear(d, 2 * d, **kw)
        self.proj_out = Linear(d, cfg.patch_size**2 * cfg.out_channels, **kw)

    @staticmethod
    def sharding_rules(cfg: "OvisConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj|proj_mlp)\.kernel",
                 P(None, "tp")),
                (r"(to_out|to_add_out|proj_out)\.kernel", P("tp", None)),
                (r"(ff|ff_context)\.fc1\.kernel", P(None, "tp")),
                (r"(ff|ff_context)\.fc2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    pack_latents = staticmethod(FluxTransformer2DModel.pack_latents)
    unpack_latents = staticmethod(FluxTransformer2DModel.unpack_latents)

    def rope_tables(self, n_txt: int, h_tok: int, w_tok: int):
        txt_ids = np.zeros((n_txt, 3), np.int64)
        txt_ids[:, 1] = np.arange(n_txt)  # diagonal text positions
        txt_ids[:, 2] = np.arange(n_txt)  # (engine/ovis/t2i.py:126)
        img_ids = np.zeros((h_tok, w_tok, 3), np.int64)
        img_ids[..., 1] = np.arange(h_tok)[:, None]
        img_ids[..., 2] = np.arange(w_tok)[None, :]
        ids = np.concatenate([txt_ids, img_ids.reshape(-1, 3)], axis=0)
        cos, sin = precompute_axial_freqs(
            jnp.asarray(ids)[None], self.cfg.axes_dims_rope, self.cfg.rope_theta)
        return cos[:, :, None, :], sin[:, :, None, :]

    def __call__(
        self,
        hidden_states: jnp.ndarray,          # [B, N_img, 64] packed latents
        encoder_hidden_states: jnp.ndarray,  # [B, N_txt, joint_dim]
        timestep: jnp.ndarray,               # [B] in [0, 1]
        grid_hw: Optional[Tuple[int, int]] = None,
    ) -> jnp.ndarray:
        b, n_img, _ = hidden_states.shape
        n_txt = encoder_hidden_states.shape[1]
        if grid_hw is None:
            side = int(round(float(np.sqrt(n_img))))
            grid_hw = (side, side)

        t_freq = timestep_embedding(timestep.astype(jnp.float32) * 1000.0, 256,
                                    flip_sin_to_cos=True)
        temb = self.timestep_linear_2(
            nnx.silu(self.timestep_linear_1(t_freq.astype(self.dtype))))

        img = self.x_embedder(hidden_states.astype(self.dtype))
        txt = self.context_embedder(
            self.context_embedder_norm(encoder_hidden_states.astype(self.dtype)))
        rope_cos, rope_sin = self.rope_tables(n_txt, *grid_hw)

        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, rope_cos, rope_sin)
        x = jnp.concatenate([txt, img], axis=1)
        for blk in self.single_transformer_blocks:
            x = blk(x, temb, rope_cos, rope_sin)
        img = x[:, n_txt:]

        scale, shift = jnp.split(
            self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        return self.proj_out(img)
