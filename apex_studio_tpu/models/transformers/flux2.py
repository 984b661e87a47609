"""Flux 2 DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/flux2/base/model.py:728`` (Flux2Transformer2DModel): 8
dual-stream + 48 single-stream blocks at dim 6144 (48 heads x 128), Mistral
(3-layer-stacked, 15360-dim) text conditioning, bias-free linears throughout.

Key differences from Flux 1 this module reproduces:
- modulation is **shared across blocks**, computed once per step from temb
  (``double_stream_modulation_img/txt`` = 2 sets of shift/scale/gate each,
  ``single_stream_modulation`` = 1 set; model.py:824-834) — not per-block adaLN
- FFN is a fused SwiGLU (linear_in to 2x inner, silu(x1)*x2; model.py:91)
  with mlp_ratio 3
- single blocks are ViT-22B-style parallel attention+MLP with ONE fused
  input projection ``to_qkv_mlp_proj`` and fused ``to_out`` (model.py:359)
- 4-axis RoPE (32,32,32,32) theta 2000 over (T, H, W, L) ids: text tokens get
  (0,0,0,l), image tokens (t_ref, h, w, 0) — reference latents from edit
  inputs ride the image stream with t_ref = 10, 20, ... (shared.py:317)
- sequence layout [txt, img] (txt first), timestep/guidance scaled x1000
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class Flux2Config:
    patch_size: int = 1
    in_channels: int = 128
    out_channels: Optional[int] = None
    num_layers: int = 8
    num_single_layers: int = 48
    attention_head_dim: int = 128
    num_attention_heads: int = 48
    joint_attention_dim: int = 15360
    timestep_guidance_channels: int = 256
    mlp_ratio: float = 3.0
    axes_dims_rope: Tuple[int, ...] = (32, 32, 32, 32)
    rope_theta: float = 2000.0
    guidance_embeds: bool = True

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "Flux2Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


class Flux2FeedForward(nnx.Module):
    """linear_out(silu(x1) * x2) where (x1, x2) = split(linear_in(x))."""

    def __init__(self, dim: int, inner: int, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.linear_in = Linear(dim, 2 * inner, **kw)
        self.linear_out = Linear(inner, dim, **kw)

    def __call__(self, x):
        x1, x2 = jnp.split(self.linear_in(x), 2, axis=-1)
        return self.linear_out(nnx.silu(x1) * x2)


class Flux2DualBlock(nnx.Module):
    def __init__(self, cfg: Flux2Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.to_out = Linear(d, d, **kw)
        self.add_q_proj = Linear(d, d, **kw)
        self.add_k_proj = Linear(d, d, **kw)
        self.add_v_proj = Linear(d, d, **kw)
        self.to_add_out = Linear(d, d, **kw)
        self.norm_q = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_k = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_added_q = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_added_k = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        inner = int(d * cfg.mlp_ratio)
        self.ff = Flux2FeedForward(d, inner, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.ff_context = Flux2FeedForward(d, inner, dtype=dtype, param_dtype=param_dtype,
                                           rngs=rngs)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def __call__(self, img, txt, mods_img, mods_txt, rope_cos, rope_sin):
        b, n_img, _ = img.shape
        n_txt = txt.shape[1]
        (sh, sc, g), (sh2, sc2, g2) = mods_img
        (csh, csc, cg), (csh2, csc2, cg2) = mods_txt

        img_n = layer_norm(img, eps=1e-6) * (1 + sc) + sh
        txt_n = layer_norm(txt, eps=1e-6) * (1 + csc) + csh

        def heads(x, proj):
            return proj(x).reshape(b, x.shape[1], self.heads, self.head_dim)

        q_t = self.norm_added_q(heads(txt_n, self.add_q_proj))
        k_t = self.norm_added_k(heads(txt_n, self.add_k_proj))
        v_t = heads(txt_n, self.add_v_proj)
        q_i = self.norm_q(heads(img_n, self.to_q))
        k_i = self.norm_k(heads(img_n, self.to_k))
        v_i = heads(img_n, self.to_v)

        q = apply_rope(jnp.concatenate([q_t, q_i], axis=1), rope_cos, rope_sin)
        k = apply_rope(jnp.concatenate([k_t, k_i], axis=1), rope_cos, rope_sin)
        v = jnp.concatenate([v_t, v_i], axis=1)
        out = attention_op(q, k, v).reshape(b, n_txt + n_img, -1)
        txt = txt + self.to_add_out(out[:, :n_txt]) * cg
        img = img + self.to_out(out[:, n_txt:]) * g

        img = img + self.ff(layer_norm(img, eps=1e-6) * (1 + sc2) + sh2) * g2
        txt = txt + self.ff_context(layer_norm(txt, eps=1e-6) * (1 + csc2) + csh2) * cg2
        return img, txt


class Flux2SingleBlock(nnx.Module):
    """ViT-22B-style parallel block: one fused qkv+mlp in-proj, one fused
    out-proj over [attn | swiglu(mlp)] (reference model.py:359-454)."""

    def __init__(self, cfg: Flux2Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.mlp_hidden = int(d * cfg.mlp_ratio)
        self.to_qkv_mlp_proj = Linear(d, 3 * d + 2 * self.mlp_hidden, **kw)
        self.to_out = Linear(d + self.mlp_hidden, d, **kw)
        self.norm_q = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_k = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def __call__(self, x, mods, rope_cos, rope_sin):
        b, s, d = x.shape
        shift, scale, gate = mods
        xn = layer_norm(x, eps=1e-6) * (1 + scale) + shift
        proj = self.to_qkv_mlp_proj(xn)
        qkv, mlp = proj[..., : 3 * d], proj[..., 3 * d :]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = self.norm_q(q.reshape(b, s, self.heads, self.head_dim))
        k = self.norm_k(k.reshape(b, s, self.heads, self.head_dim))
        v = v.reshape(b, s, self.heads, self.head_dim)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = attention_op(q, k, v).reshape(b, s, -1)
        m1, m2 = jnp.split(mlp, 2, axis=-1)
        return x + gate * self.to_out(
            jnp.concatenate([attn, nnx.silu(m1) * m2], axis=-1)
        )


@transformer_registry.register("flux2.base", aliases=("flux2", "Flux2Transformer2DModel"))
class Flux2Transformer2DModel(nnx.Module):
    config_class = Flux2Config

    def __init__(self, cfg: Flux2Config, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        ch = cfg.timestep_guidance_channels
        self.timestep_linear_1 = Linear(ch, d, **kw)
        self.timestep_linear_2 = Linear(d, d, **kw)
        if cfg.guidance_embeds:
            self.guidance_linear_1 = Linear(ch, d, **kw)
            self.guidance_linear_2 = Linear(d, d, **kw)
        else:
            self.guidance_linear_1 = self.guidance_linear_2 = None
        # Shared (per-step, not per-block) modulation projections.
        self.double_stream_modulation_img = Linear(d, 6 * d, **kw)
        self.double_stream_modulation_txt = Linear(d, 6 * d, **kw)
        self.single_stream_modulation = Linear(d, 3 * d, **kw)
        self.x_embedder = Linear(cfg.in_channels, d, **kw)
        self.context_embedder = Linear(cfg.joint_attention_dim, d, **kw)
        self.transformer_blocks = nnx.List(
            [Flux2DualBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)]
        )
        self.single_transformer_blocks = nnx.List(
            [Flux2SingleBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_single_layers)]
        )
        self.norm_out_linear = Linear(d, 2 * d, **kw)
        out_c = cfg.out_channels or cfg.in_channels
        self.proj_out = Linear(d, cfg.patch_size**2 * out_c, **kw)

    @staticmethod
    def sharding_rules(cfg: "Flux2Config"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj|to_qkv_mlp_proj)\.kernel",
                 P(None, "tp")),
                (r"(to_out|to_add_out)\.kernel", P("tp", None)),
                (r"(ff|ff_context)\.linear_in\.kernel", P(None, "tp")),
                (r"(ff|ff_context)\.linear_out\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    def rope_tables(self, n_txt: int, grid_hw: Tuple[int, int],
                    cond_grids: Tuple[Tuple[int, int], ...] = ()):
        """(T,H,W,L) ids: txt = (0,0,0,l); latent = (0,h,w,0); the k-th edit
        reference image = (10*(k+1), h, w, 0) (reference shared.py:266-365)."""
        ids = [np.stack([np.zeros(n_txt), np.zeros(n_txt), np.zeros(n_txt),
                         np.arange(n_txt)], axis=-1)]
        h, w = grid_hw
        hh, ww = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        ids.append(np.stack([np.zeros(h * w), hh.reshape(-1), ww.reshape(-1),
                             np.zeros(h * w)], axis=-1))
        for k, (ch, cw) in enumerate(cond_grids):
            hh, ww = np.meshgrid(np.arange(ch), np.arange(cw), indexing="ij")
            n = ch * cw
            ids.append(np.stack([np.full(n, 10.0 * (k + 1)), hh.reshape(-1),
                                 ww.reshape(-1), np.zeros(n)], axis=-1))
        all_ids = np.concatenate(ids, axis=0)[None]
        cos, sin = precompute_axial_freqs(all_ids, self.cfg.axes_dims_rope,
                                          self.cfg.rope_theta)
        return cos[:, :, None, :], sin[:, :, None, :]

    @staticmethod
    def pack_latents(x: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] → [B, (H/2)(W/2), 4C] (2x2 pixel-shuffle packing —
        flux2 packs in the pipeline like flux1, shared.py:395)."""
        b, c, h, w = x.shape
        x = x.reshape(b, c, h // 2, 2, w // 2, 2)
        return x.transpose(0, 2, 4, 1, 3, 5).reshape(b, (h // 2) * (w // 2), c * 4)

    @staticmethod
    def unpack_latents(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, d = tokens.shape
        c = d // 4
        x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
        return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, c, h, w)

    def _mods(self, linear, temb, sets: int):
        out = linear(nnx.silu(temb))[:, None, :]
        parts = jnp.split(out, 3 * sets, axis=-1)
        return tuple(tuple(parts[3 * i : 3 * (i + 1)]) for i in range(sets))

    def __call__(
        self,
        hidden_states: jnp.ndarray,        # [B, N_img, in_channels] packed
        encoder_hidden_states: jnp.ndarray,  # [B, L, 15360] stacked Mistral
        timestep: jnp.ndarray,             # [B] in [0, 1]
        guidance: Optional[jnp.ndarray] = None,  # [B] in [0, ~10]
        grid_hw: Optional[Tuple[int, int]] = None,
        cond_tokens: Optional[jnp.ndarray] = None,  # edit refs [B, N_cond, C]
        cond_grids: Tuple[Tuple[int, int], ...] = (),
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, n_img, _ = hidden_states.shape
        n_txt = encoder_hidden_states.shape[1]
        if grid_hw is None:
            side = int(round(float(np.sqrt(n_img))))
            grid_hw = (side, side)

        t_freq = timestep_embedding(timestep.astype(jnp.float32) * 1000.0,
                                    cfg.timestep_guidance_channels, flip_sin_to_cos=True)
        temb = self.timestep_linear_2(nnx.silu(self.timestep_linear_1(
            t_freq.astype(self.dtype))))
        if self.guidance_linear_1 is not None and guidance is not None:
            g_freq = timestep_embedding(guidance.astype(jnp.float32) * 1000.0,
                                        cfg.timestep_guidance_channels, flip_sin_to_cos=True)
            temb = temb + self.guidance_linear_2(nnx.silu(self.guidance_linear_1(
                g_freq.astype(self.dtype))))

        mods_img = self._mods(self.double_stream_modulation_img, temb, 2)
        mods_txt = self._mods(self.double_stream_modulation_txt, temb, 2)
        (mods_single,) = self._mods(self.single_stream_modulation, temb, 1)

        if cond_tokens is not None:
            hidden_states = jnp.concatenate(
                [hidden_states, cond_tokens.astype(hidden_states.dtype)], axis=1
            )
        img = self.x_embedder(hidden_states.astype(self.dtype))
        txt = self.context_embedder(encoder_hidden_states.astype(self.dtype))
        rope_cos, rope_sin = self.rope_tables(n_txt, grid_hw, cond_grids)

        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, mods_img, mods_txt, rope_cos, rope_sin)

        x = jnp.concatenate([txt, img], axis=1)
        for blk in self.single_transformer_blocks:
            x = blk(x, mods_single, rope_cos, rope_sin)
        img = x[:, n_txt : n_txt + n_img]  # drop edit-reference tokens

        scale, shift = jnp.split(self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        return self.proj_out(img)


# -- control (VACE-style hint chain) ---------------------------------------------------


@dataclasses.dataclass
class Flux2ControlConfig(Flux2Config):
    """reference transformer/flux2/control/model.py:102 — a parallel chain of
    dual blocks over the packed [control latents ‖ inverted mask ‖ inpaint
    latents] context, emitting per-layer hints added into the main double
    stream at ``control_layers``."""

    control_layers: Tuple[int, ...] = (0, 2, 4, 6)
    control_in_dim: int = 260


class Flux2ControlChainBlock(Flux2DualBlock):
    """control/model.py:38 — Flux2TransformerBlock + zero-init before_proj
    (block 0 only) and after_proj hint head."""

    def __init__(self, cfg: Flux2Config, first: bool, *, dtype, param_dtype,
                 rngs: nnx.Rngs):
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        if first:
            self.before_proj = Linear(d, d, **kw)
            self.before_proj.kernel.value = jnp.zeros_like(
                self.before_proj.kernel.value)
        else:
            self.before_proj = None
        self.after_proj = Linear(d, d, **kw)
        self.after_proj.kernel.value = jnp.zeros_like(
            self.after_proj.kernel.value)


@transformer_registry.register(
    "flux2.control", aliases=("Flux2ControlTransformer2DModel",))
class Flux2ControlTransformer2DModel(Flux2Transformer2DModel):
    config_class = Flux2ControlConfig

    def __init__(self, cfg: Flux2ControlConfig = None, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs=None):
        from flax import nnx as _nnx

        cfg = cfg or Flux2ControlConfig()
        rngs = rngs or _nnx.Rngs(0)
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.control_img_in = Linear(cfg.control_in_dim, cfg.dim, **kw)
        self.control_transformer_blocks = nnx.List([
            Flux2ControlChainBlock(cfg, first=(j == 0), dtype=dtype,
                                   param_dtype=param_dtype, rngs=rngs)
            for j in range(len(cfg.control_layers))])

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        timestep: jnp.ndarray,
        guidance: Optional[jnp.ndarray] = None,
        grid_hw: Optional[Tuple[int, int]] = None,
        cond_tokens: Optional[jnp.ndarray] = None,
        cond_grids: Tuple[Tuple[int, int], ...] = (),
        control_context: Optional[jnp.ndarray] = None,
        control_context_scale: float = 1.0,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, n_img, _ = hidden_states.shape
        n_txt = encoder_hidden_states.shape[1]
        if grid_hw is None:
            side = int(round(float(np.sqrt(n_img))))
            grid_hw = (side, side)

        t_freq = timestep_embedding(timestep.astype(jnp.float32) * 1000.0,
                                    cfg.timestep_guidance_channels,
                                    flip_sin_to_cos=True)
        temb = self.timestep_linear_2(nnx.silu(self.timestep_linear_1(
            t_freq.astype(self.dtype))))
        if self.guidance_linear_1 is not None and guidance is not None:
            g_freq = timestep_embedding(guidance.astype(jnp.float32) * 1000.0,
                                        cfg.timestep_guidance_channels,
                                        flip_sin_to_cos=True)
            temb = temb + self.guidance_linear_2(nnx.silu(
                self.guidance_linear_1(g_freq.astype(self.dtype))))

        mods_img = self._mods(self.double_stream_modulation_img, temb, 2)
        mods_txt = self._mods(self.double_stream_modulation_txt, temb, 2)
        (mods_single,) = self._mods(self.single_stream_modulation, temb, 1)

        if cond_tokens is not None:
            hidden_states = jnp.concatenate(
                [hidden_states, cond_tokens.astype(hidden_states.dtype)], axis=1)
        img = self.x_embedder(hidden_states.astype(self.dtype))
        txt = self.context_embedder(encoder_hidden_states.astype(self.dtype))
        rope_cos, rope_sin = self.rope_tables(n_txt, grid_hw, cond_grids)

        # control hint chain (control/model.py:183): the control stream runs
        # its own dual blocks, threading the SAME txt stream forward; each
        # block's after_proj is the hint for one main layer
        hints = []
        ctx_txt = txt
        if control_context is not None:
            c = self.control_img_in(control_context.astype(self.dtype))
            for blk in self.control_transformer_blocks:
                if blk.before_proj is not None:
                    c = blk.before_proj(c) + img
                c, ctx_txt = blk(c, ctx_txt, mods_img, mods_txt, rope_cos,
                                 rope_sin)
                hints.append(blk.after_proj(c))

        mapping = {layer: j for j, layer in enumerate(cfg.control_layers)}
        for i, blk in enumerate(self.transformer_blocks):
            img, txt = blk(img, txt, mods_img, mods_txt, rope_cos, rope_sin)
            if hints and i in mapping:
                img = img + hints[mapping[i]] * control_context_scale

        x = jnp.concatenate([txt, img], axis=1)
        for blk in self.single_transformer_blocks:
            x = blk(x, mods_single, rope_cos, rope_sin)
        img = x[:, n_txt : n_txt + n_img]

        scale, shift = jnp.split(
            self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        return self.proj_out(img)
