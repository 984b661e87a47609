"""Flux DiT (MMDiT: 19 double-stream + 38 single-stream blocks) in JAX/NNX.

Behavioral counterpart of the reference's ``src/transformer/flux/`` (diffusers
FluxTransformer2DModel, 1,013 LoC) rebuilt TPU-first:

- packed 2×2 latents (64-dim tokens) as in engine/flux/shared.py:30; token
  grids are static per resolution so RoPE tables are trace-time constants
- joint attention concatenates [txt, img] and flows through ops.attention
  (Pallas flash on TPU); per-head RMS qk-norm in f32
- conditioning: timestep (×1000 sinusoidal) + guidance embed (dev models) +
  CLIP pooled embed → one temb; adaLN projections take silu(temb)

Weight names mirror diffusers so the key converter is mostly mechanical.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class FluxConfig:
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19            # double-stream
    num_single_layers: int = 38     # single-stream
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096  # T5 features
    pooled_projection_dim: int = 768  # CLIP pooled
    guidance_embeds: bool = True
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "FluxConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


class FluxTimeTextEmbed(nnx.Module):
    """timestep + (guidance) + pooled-text → temb (diffusers time_text_embed)."""

    def __init__(self, cfg: FluxConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.timestep_linear_1 = Linear(256, d, **kw)
        self.timestep_linear_2 = Linear(d, d, **kw)
        if cfg.guidance_embeds:
            self.guidance_linear_1 = Linear(256, d, **kw)
            self.guidance_linear_2 = Linear(d, d, **kw)
        else:
            self.guidance_linear_1 = self.guidance_linear_2 = None
        self.text_linear_1 = Linear(cfg.pooled_projection_dim, d, **kw)
        self.text_linear_2 = Linear(d, d, **kw)

    def __call__(self, t, pooled, guidance=None):
        # diffusers Timesteps: sin-first=False ordering ([cos|sin] after flip);
        # flip_sin_to_cos=True with scale 1000 applied by the pipeline.
        t_freq = timestep_embedding(t * 1000.0, 256, flip_sin_to_cos=True)
        temb = self.timestep_linear_2(nnx.silu(self.timestep_linear_1(t_freq)))
        if self.guidance_linear_1 is not None and guidance is not None:
            g_freq = timestep_embedding(guidance * 1000.0, 256, flip_sin_to_cos=True)
            temb = temb + self.guidance_linear_2(nnx.silu(self.guidance_linear_1(g_freq)))
        temb = temb + self.text_linear_2(nnx.silu(self.text_linear_1(pooled)))
        return temb


class FluxJointAttention(nnx.Module):
    """Joint attention over [txt, img] with separate projections per stream."""

    def __init__(self, cfg: FluxConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.add_q_proj = Linear(d, d, **kw)
        self.add_k_proj = Linear(d, d, **kw)
        self.add_v_proj = Linear(d, d, **kw)
        self.to_out = Linear(d, d, **kw)
        self.to_add_out = Linear(d, d, **kw)
        self.norm_q = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_k = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_added_q = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_added_k = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def __call__(self, img, txt, rope_cos, rope_sin, mask_bias=None):
        b, n_img, _ = img.shape
        n_txt = txt.shape[1]

        def split(x, proj_q, proj_k, proj_v, nq, nk):
            q = proj_q(x).reshape(b, x.shape[1], self.heads, self.head_dim)
            k = proj_k(x).reshape(b, x.shape[1], self.heads, self.head_dim)
            v = proj_v(x).reshape(b, x.shape[1], self.heads, self.head_dim)
            return nq(q), nk(k), v

        q_i, k_i, v_i = split(img, self.to_q, self.to_k, self.to_v, self.norm_q, self.norm_k)
        q_t, k_t, v_t = split(
            txt, self.add_q_proj, self.add_k_proj, self.add_v_proj,
            self.norm_added_q, self.norm_added_k,
        )
        q = jnp.concatenate([q_t, q_i], axis=1)
        k = jnp.concatenate([k_t, k_i], axis=1)
        v = jnp.concatenate([v_t, v_i], axis=1)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        out = attention_op(q, k, v, bias=mask_bias).reshape(b, n_txt + n_img, -1)
        txt_out, img_out = out[:, :n_txt], out[:, n_txt:]
        return self.to_out(img_out), self.to_add_out(txt_out)


class FluxDoubleBlock(nnx.Module):
    def __init__(self, cfg: FluxConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1_linear = Linear(d, 6 * d, **kw)
        self.norm1_context_linear = Linear(d, 6 * d, **kw)
        self.attn = FluxJointAttention(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.ff = GELUMLP(d, 4 * d, approximate=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.ff_context = GELUMLP(d, 4 * d, approximate=True, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)

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
        txt = txt + g2_t * self.ff_context(layer_norm(txt, eps=1e-6) * (1 + sc2_t) + sh2_t)
        return img, txt


class FluxSingleBlock(nnx.Module):
    """Parallel attention+MLP block over the fused [txt, img] sequence."""

    def __init__(self, cfg: FluxConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm_linear = Linear(d, 3 * d, **kw)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.norm_q = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_k = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.proj_mlp = Linear(d, 4 * d, **kw)
        self.proj_out = Linear(5 * d, d, **kw)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def __call__(self, x, temb, rope_cos, rope_sin):
        b, s, _ = x.shape
        shift, scale, gate = jnp.split(self.norm_linear(nnx.silu(temb))[:, None, :], 3, axis=-1)
        xn = layer_norm(x, eps=1e-6) * (1 + scale) + shift

        q = self.norm_q(self.to_q(xn).reshape(b, s, self.heads, self.head_dim))
        k = self.norm_k(self.to_k(xn).reshape(b, s, self.heads, self.head_dim))
        v = self.to_v(xn).reshape(b, s, self.heads, self.head_dim)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = attention_op(q, k, v).reshape(b, s, -1)
        mlp = nnx.gelu(self.proj_mlp(xn), approximate=True)
        return x + gate * self.proj_out(jnp.concatenate([attn, mlp], axis=-1))


@transformer_registry.register("flux.base", aliases=("flux",))
class FluxTransformer2DModel(nnx.Module):
    config_class = FluxConfig

    def __init__(self, cfg: FluxConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.x_embedder = Linear(cfg.in_channels, d, use_bias=True, **kw)
        self.context_embedder = Linear(cfg.joint_attention_dim, d, use_bias=True, **kw)
        self.time_text_embed = FluxTimeTextEmbed(cfg, **kw)
        self.transformer_blocks = nnx.List(
            [FluxDoubleBlock(cfg, **kw) for _ in range(cfg.num_layers)]
        )
        self.single_transformer_blocks = nnx.List(
            [FluxSingleBlock(cfg, **kw) for _ in range(cfg.num_single_layers)]
        )
        self.norm_out_linear = Linear(d, 2 * d, use_bias=True, **kw)
        self.proj_out = Linear(d, cfg.out_channels, use_bias=True, **kw)

    @staticmethod
    def sharding_rules(cfg: "FluxConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj)\.kernel", P(None, "tp")),
                (r"(to_out|to_add_out)\.kernel", P("tp", None)),
                (r"(ff|ff_context)\.fc1\.kernel", P(None, "tp")),
                (r"(ff|ff_context)\.fc2\.kernel", P("tp", None)),
                (r"proj_mlp\.kernel", P(None, "tp")),
                (r"proj_out\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    # -- geometry -----------------------------------------------------------------

    def img_ids(self, h_tok: int, w_tok: int) -> np.ndarray:
        ids = np.zeros((h_tok, w_tok, 3), np.int64)
        ids[..., 1] = np.arange(h_tok)[:, None]
        ids[..., 2] = np.arange(w_tok)[None, :]
        return ids.reshape(-1, 3)

    def rope_tables(self, n_txt: int, h_tok: int, w_tok: int,
                    cond_grid_hw: Optional[Tuple[int, int]] = None):
        txt_ids = np.zeros((n_txt, 3), np.int64)
        parts = [txt_ids, self.img_ids(h_tok, w_tok)]
        if cond_grid_hw is not None:
            # Kontext convention: conditioning image tokens live at t-index 1;
            # DreamOmni2 stacks several references at t-index i+1 with
            # accumulated w-offsets (engine/flux/dreamomni2.py:398-407).
            grids = ([cond_grid_hw] if isinstance(cond_grid_hw[0], int)
                     else list(cond_grid_hw))
            w_off = 0
            for i, g in enumerate(grids):
                cond_ids = self.img_ids(*g)
                cond_ids[:, 0] = i + 1
                cond_ids[:, 2] += w_off
                parts.append(cond_ids)
                w_off += g[1]
        ids = np.concatenate(parts, axis=0)
        cos, sin = precompute_axial_freqs(
            jnp.asarray(ids)[None], self.cfg.axes_dims_rope, self.cfg.rope_theta
        )
        return cos[:, :, None, :], sin[:, :, None, :]

    @staticmethod
    def pack_latents(x: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] → [B, (H/2)(W/2), 4C] (2×2 pixel-shuffle packing)."""
        b, c, h, w = x.shape
        x = x.reshape(b, c, h // 2, 2, w // 2, 2)
        return x.transpose(0, 2, 4, 1, 3, 5).reshape(b, (h // 2) * (w // 2), c * 4)

    @staticmethod
    def unpack_latents(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, d = tokens.shape
        c = d // 4
        x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
        return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, c, h, w)

    # -- forward -------------------------------------------------------------------

    def __call__(
        self,
        hidden_states: jnp.ndarray,       # [B, N_img, 64] packed latents
        encoder_hidden_states: jnp.ndarray,  # [B, N_txt, joint_dim] T5 features
        pooled_projections: jnp.ndarray,  # [B, pooled_dim] CLIP pooled
        timestep: jnp.ndarray,            # [B] in [0, 1]
        guidance: Optional[jnp.ndarray] = None,  # [B]
        grid_hw: Optional[Tuple[int, int]] = None,  # token grid (h_tok, w_tok)
        cond_tokens: Optional[jnp.ndarray] = None,  # Kontext: [B, N_cond, 64]
        cond_grid_hw: Optional[Tuple[int, int]] = None,
    ) -> jnp.ndarray:
        b, n_img, _ = hidden_states.shape
        n_txt = encoder_hidden_states.shape[1]
        if grid_hw is None:
            side = int(round(float(np.sqrt(n_img))))
            grid_hw = (side, side)

        temb = self.time_text_embed(
            timestep.astype(jnp.float32), pooled_projections.astype(self.dtype), guidance
        )
        if cond_tokens is not None:
            # Kontext: clean conditioning latents ride the image stream; only
            # the leading n_img tokens are denoised/returned.
            hidden_states = jnp.concatenate(
                [hidden_states, cond_tokens.astype(hidden_states.dtype)], axis=1
            )
        img = self.x_embedder(hidden_states.astype(self.dtype))
        txt = self.context_embedder(encoder_hidden_states.astype(self.dtype))
        rope_cos, rope_sin = self.rope_tables(n_txt, *grid_hw, cond_grid_hw=cond_grid_hw)

        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, rope_cos, rope_sin)

        x = jnp.concatenate([txt, img], axis=1)
        for blk in self.single_transformer_blocks:
            x = blk(x, temb, rope_cos, rope_sin)
        img = x[:, n_txt : n_txt + n_img]  # drop Kontext conditioning tokens

        # AdaLayerNormContinuous ordering: scale first, then shift.
        scale, shift = jnp.split(self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        return self.proj_out(img)
