"""Bria FIBO MMDiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/fibo/base/model.py:401`` (BriaFiboTransformer2DModel):
Flux-shaped joint-attention MMDiT — 19 dual + 38 single blocks at dim 3072
(24 heads x 128), unpacked latent tokens (patch 1), 3-axis RoPE
(16, 56, 56) theta 10000 — whose text stream is *refreshed per block*: the
second half of the text channels is replaced by a per-block projection of a
text-encoder hidden layer (model.py:489 caption_projection, model.py:581
channel splice), mirroring the reference exactly. Text key-padding masks ride
the whole [txt, img] sequence (engine/fibo/ti2i.py:203).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.flux import FluxJointAttention
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class FiboConfig:
    patch_size: int = 1
    in_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    guidance_embeds: bool = False
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    time_theta: float = 10000.0
    text_encoder_dim: int = 2048
    mlp_ratio: float = 4.0

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "FiboConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


class FiboDoubleBlock(nnx.Module):
    def __init__(self, cfg: FiboConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1_linear = Linear(d, 6 * d, **kw)
        self.norm1_context_linear = Linear(d, 6 * d, **kw)
        self.attn = FluxJointAttention(cfg, dtype=dtype, param_dtype=param_dtype,
                                       rngs=rngs)
        hidden = int(d * cfg.mlp_ratio)
        self.ff = GELUMLP(d, hidden, approximate=True, dtype=dtype,
                          param_dtype=param_dtype, rngs=rngs)
        self.ff_context = GELUMLP(d, hidden, approximate=True, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)

    @staticmethod
    def _mod(linear, temb):
        return jnp.split(linear(nnx.silu(temb))[:, None, :], 6, axis=-1)

    def __call__(self, img, txt, temb, rope_cos, rope_sin, mask):
        sh_i, sc_i, g_i, sh2_i, sc2_i, g2_i = self._mod(self.norm1_linear, temb)
        sh_t, sc_t, g_t, sh2_t, sc2_t, g2_t = self._mod(self.norm1_context_linear, temb)
        img_n = layer_norm(img, eps=1e-6) * (1 + sc_i) + sh_i
        txt_n = layer_norm(txt, eps=1e-6) * (1 + sc_t) + sh_t
        attn_i, attn_t = self.attn(img_n, txt_n, rope_cos, rope_sin, mask_bias=mask)
        img = img + g_i * attn_i
        txt = txt + g_t * attn_t
        img = img + g2_i * self.ff(layer_norm(img, eps=1e-6) * (1 + sc2_i) + sh2_i)
        txt = txt + g2_t * self.ff_context(
            layer_norm(txt, eps=1e-6) * (1 + sc2_t) + sh2_t)
        return img, txt


class FiboSingleBlock(nnx.Module):
    """Parallel attention + GELU MLP over the fused [txt, img] sequence with a
    key-padding mask (model.py:181)."""

    def __init__(self, cfg: FiboConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm_linear = Linear(d, 3 * d, **kw)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.norm_q = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_k = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        hidden = int(d * cfg.mlp_ratio)
        self.proj_mlp = Linear(d, hidden, **kw)
        self.proj_out = Linear(d + hidden, d, **kw)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def __call__(self, x, temb, rope_cos, rope_sin, mask):
        b, s, _ = x.shape
        shift, scale, gate = jnp.split(
            self.norm_linear(nnx.silu(temb))[:, None, :], 3, axis=-1)
        xn = layer_norm(x, eps=1e-6) * (1 + scale) + shift
        q = self.norm_q(self.to_q(xn).reshape(b, s, self.heads, self.head_dim))
        k = self.norm_k(self.to_k(xn).reshape(b, s, self.heads, self.head_dim))
        v = self.to_v(xn).reshape(b, s, self.heads, self.head_dim)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = attention_op(q, k, v, mask=mask).reshape(b, s, -1)
        mlp = nnx.gelu(self.proj_mlp(xn), approximate=True)
        return x + gate * self.proj_out(jnp.concatenate([attn, mlp], axis=-1))


@transformer_registry.register(
    "fibo.base", aliases=("fibo", "BriaFiboTransformer2DModel")
)
class BriaFiboTransformer2DModel(nnx.Module):
    config_class = FiboConfig

    def __init__(self, cfg: FiboConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.x_embedder = Linear(cfg.in_channels, d, **kw)
        self.context_embedder = Linear(cfg.joint_attention_dim, d, **kw)
        self.time_linear_1 = Linear(256, d, **kw)
        self.time_linear_2 = Linear(d, d, **kw)
        self.transformer_blocks = nnx.List(
            [FiboDoubleBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)]
        )
        self.single_transformer_blocks = nnx.List(
            [FiboSingleBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_single_layers)]
        )
        # One caption projection per block (model.py:489): text_encoder layer
        # features → half the text-stream width, no bias.
        n_total = cfg.num_layers + cfg.num_single_layers
        self.caption_projection = nnx.List(
            [Linear(cfg.text_encoder_dim, d // 2, use_bias=False, dtype=dtype,
                    param_dtype=param_dtype, rngs=rngs) for _ in range(n_total)]
        )
        self.norm_out_linear = Linear(d, 2 * d, **kw)
        self.proj_out = Linear(d, cfg.patch_size**2 * cfg.in_channels, **kw)

    @staticmethod
    def sharding_rules(cfg: "FiboConfig"):
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

    def rope_tables(self, n_txt: int, h_tok: int, w_tok: int):
        txt_ids = np.zeros((n_txt, 3), np.int64)
        img_ids = np.zeros((h_tok, w_tok, 3), np.int64)
        img_ids[..., 1] = np.arange(h_tok)[:, None]
        img_ids[..., 2] = np.arange(w_tok)[None, :]
        ids = np.concatenate([txt_ids, img_ids.reshape(-1, 3)], axis=0)
        cos, sin = precompute_axial_freqs(
            jnp.asarray(ids)[None], self.cfg.axes_dims_rope, self.cfg.rope_theta)
        return cos[:, :, None, :], sin[:, :, None, :]

    def _splice_text(self, txt: jnp.ndarray, layer: jnp.ndarray, idx: int):
        half = self.cfg.dim // 2
        proj = self.caption_projection[idx](layer.astype(self.dtype))
        return jnp.concatenate([txt[..., :half], proj], axis=-1)

    def __call__(
        self,
        hidden_states: jnp.ndarray,          # [B, N_img, C] latent tokens
        encoder_hidden_states: jnp.ndarray,  # [B, N_txt, joint_dim]
        text_encoder_layers: Sequence[jnp.ndarray],  # per-block [B, N_txt, te_dim]
        timestep: jnp.ndarray,               # [B] raw scheduler t (0..1000)
        text_mask: Optional[jnp.ndarray] = None,     # [B, N_txt] 1=real
        grid_hw: Optional[Tuple[int, int]] = None,
    ) -> jnp.ndarray:
        b, n_img, _ = hidden_states.shape
        n_txt = encoder_hidden_states.shape[1]
        if grid_hw is None:
            side = int(round(float(np.sqrt(n_img))))
            grid_hw = (side, side)

        t_freq = timestep_embedding(timestep.astype(jnp.float32), 256,
                                    flip_sin_to_cos=True,
                                    max_period=self.cfg.time_theta)
        temb = self.time_linear_2(
            nnx.silu(self.time_linear_1(t_freq.astype(self.dtype))))

        img = self.x_embedder(hidden_states.astype(self.dtype))
        txt = self.context_embedder(encoder_hidden_states.astype(self.dtype))
        rope_cos, rope_sin = self.rope_tables(n_txt, *grid_hw)

        mask = None
        if text_mask is not None:
            mask = jnp.concatenate(
                [text_mask.astype(bool), jnp.ones((b, n_img), bool)], axis=1)

        # layer list trimmed/padded to one per block (ti2i.py:545)
        n_total = len(self.transformer_blocks) + len(self.single_transformer_blocks)
        layers = list(text_encoder_layers)
        layers = (layers[len(layers) - n_total:] if len(layers) >= n_total
                  else layers + [layers[-1]] * (n_total - len(layers)))

        bi = 0
        for blk in self.transformer_blocks:
            txt = self._splice_text(txt, layers[bi], bi)
            bi += 1
            img, txt = blk(img, txt, temb, rope_cos, rope_sin, mask)
        for blk in self.single_transformer_blocks:
            txt = self._splice_text(txt, layers[bi], bi)
            bi += 1
            x = jnp.concatenate([txt, img], axis=1)
            x = blk(x, temb, rope_cos, rope_sin, mask)
            txt, img = x[:, :n_txt], x[:, n_txt:]

        scale, shift = jnp.split(
            self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        return self.proj_out(img)
