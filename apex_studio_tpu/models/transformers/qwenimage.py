"""QwenImage MMDiT (60 dual-stream blocks, 3072 dim) in JAX/NNX.

Behavioral counterpart of the reference's ``src/transformer/qwenimage/``
(diffusers QwenImageTransformer2DModel, 1,244 LoC):

- packed 2×2 latents (64-dim tokens) like Flux
- joint attention over [txt, img]; per-head RMS qk-norm on both streams;
  RoPE applied per-stream: image tokens get centered (frame, y−h/2, x−w/2)
  axial positions, text tokens get positions offset past the image extent
  (scale_rope convention)
- per-stream modulation: silu(temb) → 6·dim (shift/scale/gate for attn and mlp)
- conditioning text is Qwen2.5-VL final hidden states (RMS-normed then
  projected); timestep embedding is sinusoidal(t·1000 scale) → MLP
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

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
class QwenImageConfig:
    patch_size: int = 2
    in_channels: int = 64
    out_channels: int = 16
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    guidance_embeds: bool = False

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "QwenImageConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


class QwenImageBlock(nnx.Module):
    def __init__(self, cfg: QwenImageConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.img_mod = Linear(d, 6 * d, **kw)
        self.txt_mod = Linear(d, 6 * d, **kw)
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
        self.img_mlp = GELUMLP(d, 4 * d, approximate=True, dtype=dtype,
                               param_dtype=param_dtype, rngs=rngs)
        self.txt_mlp = GELUMLP(d, 4 * d, approximate=True, dtype=dtype,
                               param_dtype=param_dtype, rngs=rngs)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    @staticmethod
    def _mod6(linear, temb):
        return jnp.split(linear(nnx.silu(temb))[:, None, :], 6, axis=-1)

    def __call__(self, img, txt, temb, img_cos, img_sin, txt_cos, txt_sin):
        b, n_img, _ = img.shape
        n_txt = txt.shape[1]
        i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = self._mod6(self.img_mod, temb)
        t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = self._mod6(self.txt_mod, temb)

        img_n = layer_norm(img, eps=1e-6) * (1 + i_sc1) + i_sh1
        txt_n = layer_norm(txt, eps=1e-6) * (1 + t_sc1) + t_sh1

        def heads(x, proj):
            return proj(x).reshape(b, x.shape[1], self.heads, self.head_dim)

        q_i = apply_rope(self.norm_q(heads(img_n, self.to_q)), img_cos, img_sin)
        k_i = apply_rope(self.norm_k(heads(img_n, self.to_k)), img_cos, img_sin)
        v_i = heads(img_n, self.to_v)
        q_t = apply_rope(self.norm_added_q(heads(txt_n, self.add_q_proj)), txt_cos, txt_sin)
        k_t = apply_rope(self.norm_added_k(heads(txt_n, self.add_k_proj)), txt_cos, txt_sin)
        v_t = heads(txt_n, self.add_v_proj)

        q = jnp.concatenate([q_t, q_i], axis=1)
        k = jnp.concatenate([k_t, k_i], axis=1)
        v = jnp.concatenate([v_t, v_i], axis=1)
        out = attention_op(q, k, v).reshape(b, n_txt + n_img, -1)
        txt = txt + self.to_add_out(out[:, :n_txt]) * t_g1
        img = img + self.to_out(out[:, n_txt:]) * i_g1

        img = img + self.img_mlp(layer_norm(img, eps=1e-6) * (1 + i_sc2) + i_sh2) * i_g2
        txt = txt + self.txt_mlp(layer_norm(txt, eps=1e-6) * (1 + t_sc2) + t_sh2) * t_g2
        return img, txt


@transformer_registry.register("qwenimage.base", aliases=("qwenimage",))
class QwenImageTransformer2DModel(nnx.Module):
    config_class = QwenImageConfig

    def __init__(self, cfg: QwenImageConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.img_in = Linear(cfg.in_channels, d, **kw)
        self.txt_norm = RMSNorm(cfg.joint_attention_dim, eps=1e-6, rngs=rngs)
        self.txt_in = Linear(cfg.joint_attention_dim, d, **kw)
        self.timestep_linear_1 = Linear(256, d, **kw)
        self.timestep_linear_2 = Linear(d, d, **kw)
        self.transformer_blocks = nnx.List(
            [QwenImageBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)]
        )
        self.norm_out_linear = Linear(d, 2 * d, **kw)
        self.proj_out = Linear(d, cfg.patch_size**2 * cfg.out_channels, **kw)

    @staticmethod
    def sharding_rules(cfg: "QwenImageConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj)\.kernel", P(None, "tp")),
                (r"(to_out|to_add_out)\.kernel", P("tp", None)),
                (r"(img_mlp|txt_mlp)\.fc1\.kernel", P(None, "tp")),
                (r"(img_mlp|txt_mlp)\.fc2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    # -- geometry (scale_rope convention) ---------------------------------------------

    def rope_tables(self, h_tok: int, w_tok: int, n_txt: int, extra_segments=()):
        """Axial RoPE ids. ``extra_segments`` adds condition-image token grids
        (QwenImage Edit: each conditioning image is a later "frame", getting
        frame id 1, 2, … while keeping centered spatial coordinates — the
        diffusers img_shapes convention)."""
        segs = [(h_tok, w_tok)] + list(extra_segments)
        parts = []
        for frame, (ht, wt) in enumerate(segs):
            ids = np.zeros((ht, wt, 3), np.int64)
            ids[..., 0] = frame
            ids[..., 1] = (np.arange(ht) - ht // 2)[:, None]
            ids[..., 2] = (np.arange(wt) - wt // 2)[None, :]
            parts.append(ids.reshape(-1, 3))
        img_ids = np.concatenate(parts, axis=0)
        max_vid = max(max(ht // 2, wt // 2) for ht, wt in segs)
        txt_ids = np.stack([max_vid + np.arange(n_txt)] * 3, axis=-1)
        icos, isin = precompute_axial_freqs(
            jnp.asarray(img_ids)[None], self.cfg.axes_dims_rope, self.cfg.rope_theta
        )
        tcos, tsin = precompute_axial_freqs(
            jnp.asarray(txt_ids)[None], self.cfg.axes_dims_rope, self.cfg.rope_theta
        )
        expand = lambda a: a[:, :, None, :]
        return expand(icos), expand(isin), expand(tcos), expand(tsin)

    pack_latents = staticmethod(lambda x: _pack(x))
    unpack_latents = staticmethod(lambda t, h, w: _unpack(t, h, w))

    def __call__(
        self,
        hidden_states: jnp.ndarray,          # [B, N_img, 64]
        encoder_hidden_states: jnp.ndarray,  # [B, N_txt, 3584]
        timestep: jnp.ndarray,               # [B] in [0, 1]
        grid_hw: Tuple[int, int] = None,
        extra_segments: Tuple[Tuple[int, int], ...] = (),
        controlnet_block_samples: Optional[List[jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        b, n_img, _ = hidden_states.shape
        n_txt = encoder_hidden_states.shape[1]
        if grid_hw is None:
            side = int(round(float(np.sqrt(n_img))))
            grid_hw = (side, side)

        t_freq = timestep_embedding(timestep.astype(jnp.float32) * 1000.0, 256,
                                    flip_sin_to_cos=True)
        temb = self.timestep_linear_2(nnx.silu(self.timestep_linear_1(t_freq.astype(self.dtype))))

        img = self.img_in(hidden_states.astype(self.dtype))
        txt = self.txt_in(self.txt_norm(encoder_hidden_states.astype(self.dtype)))
        icos, isin, tcos, tsin = self.rope_tables(*grid_hw, n_txt, extra_segments)

        for bi, blk in enumerate(self.transformer_blocks):
            img, txt = blk(img, txt, temb, icos, isin, tcos, tsin)
            if controlnet_block_samples is not None:
                # diffusers residual injection: ceil-interval block mapping
                # (reference base/model.py:970-977)
                interval = int(np.ceil(len(self.transformer_blocks)
                                       / len(controlnet_block_samples)))
                img = img + controlnet_block_samples[bi // interval].astype(img.dtype)

        scale, shift = jnp.split(self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        return self.proj_out(img)


def _pack(x: jnp.ndarray) -> jnp.ndarray:
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(b, (h // 2) * (w // 2), c * 4)


def _unpack(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b, n, d = tokens.shape
    c = d // 4
    x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, c, h, w)


@dataclasses.dataclass
class QwenImageControlNetConfig(QwenImageConfig):
    """diffusers QwenImageControlNetModel geometry (a shallow copy of the
    main DiT's dual-stream blocks + zero-init per-block output linears;
    reference engine src/engine/qwenimage/controlnet.py consumes it)."""

    num_layers: int = 5
    extra_condition_channels: int = 0  # union variants stack extra channels

    @classmethod
    def from_dict(cls, cfg: dict) -> "QwenImageControlNetConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


@transformer_registry.register(
    "qwenimage.controlnet", aliases=("QwenImageControlNetModel",))
class QwenImageControlNetModel(nnx.Module):
    """ControlNet branch: img_in + zero-init controlnet_x_embedder on the
    packed control latents, N dual-stream blocks, zero-init per-block output
    linears scaled by conditioning_scale. Residuals are added into the main
    DiT at ceil-interval blocks (base/model.py:970)."""

    config_class = QwenImageControlNetConfig

    def __init__(self, cfg: Optional[QwenImageControlNetConfig] = None, *,
                 dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg = cfg or QwenImageControlNetConfig()
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.img_in = Linear(cfg.in_channels, d, **kw)
        self.controlnet_x_embedder = Linear(
            cfg.in_channels + cfg.extra_condition_channels, d, **kw)
        self.txt_norm = RMSNorm(cfg.joint_attention_dim, eps=1e-6, rngs=rngs)
        self.txt_in = Linear(cfg.joint_attention_dim, d, **kw)
        self.timestep_linear_1 = Linear(256, d, **kw)
        self.timestep_linear_2 = Linear(d, d, **kw)
        self.transformer_blocks = nnx.List(
            [QwenImageBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)]
        )
        self.controlnet_blocks = nnx.List(
            [Linear(d, d, **kw) for _ in range(cfg.num_layers)]
        )
        self._rope_helper = QwenImageTransformer2DModel.rope_tables

    @staticmethod
    def sharding_rules(cfg: "QwenImageControlNetConfig"):
        """Same dual-stream blocks as the backbone → same TP layout; the
        zero-init per-block output linears and embedders replicate."""
        return QwenImageTransformer2DModel.sharding_rules(cfg)

    def rope_tables(self, h_tok, w_tok, n_txt, extra_segments=()):
        return QwenImageTransformer2DModel.rope_tables(
            self, h_tok, w_tok, n_txt, extra_segments)

    def __call__(self, hidden_states, controlnet_cond, encoder_hidden_states,
                 timestep, grid_hw=None, conditioning_scale: float = 1.0):
        b, n_img, _ = hidden_states.shape
        n_txt = encoder_hidden_states.shape[1]
        if grid_hw is None:
            side = int(round(float(np.sqrt(n_img))))
            grid_hw = (side, side)
        t_freq = timestep_embedding(timestep.astype(jnp.float32) * 1000.0, 256,
                                    flip_sin_to_cos=True)
        temb = self.timestep_linear_2(
            nnx.silu(self.timestep_linear_1(t_freq.astype(self.dtype))))
        img = (self.img_in(hidden_states.astype(self.dtype))
               + self.controlnet_x_embedder(controlnet_cond.astype(self.dtype)))
        txt = self.txt_in(self.txt_norm(encoder_hidden_states.astype(self.dtype)))
        icos, isin, tcos, tsin = self.rope_tables(*grid_hw, n_txt)
        samples = []
        for blk, out_lin in zip(self.transformer_blocks, self.controlnet_blocks):
            img, txt = blk(img, txt, temb, icos, isin, tcos, tsin)
            samples.append(out_lin(img) * conditioning_scale)
        return samples
