"""HunyuanVideo (original, Dec-2024) DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/hunyuanvideo/base/model.py:851``
(HunyuanVideoTransformer3DModel, diffusers layout): 20 dual-stream + 40
single-stream blocks at dim 3072 (24 heads x 128), llava-llama-3 text tokens
refined by a 2-block token refiner, CLIP-L pooled projection + timestep (+
distilled guidance) conditioning, 3-axis RoPE (16,56,56) theta 256 applied to
image tokens only, patch (1,2,2).

Image conditioning variants (model.py:893 ``image_condition_type``):
- ``latent_concat``  — i2v v1: condition latents concatenated on channels
  (in_channels 2C+1), plain blocks.
- ``token_replace``  — i2v v2: first-frame latents replace the first-frame
  noise tokens; those tokens are modulated with a t=0 embedding
  (TokenReplace blocks, model.py:98,164,642,726).

Sequence layout is [img, txt] (img first — the opposite of Flux) and the
only attention mask is text key-padding, carried as a [B, S] boolean into the
Pallas flash kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.hunyuanvideo15 import TokenRefiner
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class HunyuanVideoConfig:
    in_channels: int = 16
    out_channels: int = 16
    num_attention_heads: int = 24
    attention_head_dim: int = 128
    num_layers: int = 20
    num_single_layers: int = 40
    num_refiner_layers: int = 2
    mlp_ratio: float = 4.0
    patch_size: int = 2
    patch_size_t: int = 1
    guidance_embeds: bool = True
    text_embed_dim: int = 4096
    pooled_projection_dim: int = 768
    rope_theta: float = 256.0
    rope_axes_dim: Tuple[int, ...] = (16, 56, 56)
    image_condition_type: Optional[str] = None  # None | latent_concat | token_replace

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "HunyuanVideoConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "rope_axes_dim" in kw:
            kw["rope_axes_dim"] = tuple(kw["rope_axes_dim"])
        return cls(**kw)


def _select_mod(mods, mods_tr, n_first: int, n_total: int):
    """Per-token modulation select for token_replace conditioning: the first
    ``n_first`` image tokens take the t=0 modulation (reference
    TokenReplaceAdaLayerNormZero, model.py:118-163)."""
    if mods_tr is None:
        return mods
    sel = (np.arange(n_total) < n_first)[None, :, None]
    sel = jnp.asarray(sel)
    return tuple(jnp.where(sel, tr, m) for m, tr in zip(mods, mods_tr))


class HunyuanVideoDualBlock(nnx.Module):
    def __init__(self, cfg: HunyuanVideoConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1_linear = Linear(d, 6 * d, **kw)
        self.norm1_context_linear = Linear(d, 6 * d, **kw)
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
        hidden = int(d * cfg.mlp_ratio)
        self.ff = GELUMLP(d, hidden, approximate=True, dtype=dtype,
                          param_dtype=param_dtype, rngs=rngs)
        self.ff_context = GELUMLP(d, hidden, approximate=True, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    @staticmethod
    def _ada6(linear, temb):
        return jnp.split(linear(nnx.silu(temb))[:, None, :], 6, axis=-1)

    def __call__(self, img, txt, temb, temb_tr, n_first, rope_cos, rope_sin, mask_bias):
        b, n_img, _ = img.shape
        n_txt = txt.shape[1]
        mods = self._ada6(self.norm1_linear, temb)
        if temb_tr is not None:
            mods = _select_mod(mods, self._ada6(self.norm1_linear, temb_tr), n_first, n_img)
        sh, sc, g, sh2, sc2, g2 = mods
        csh, csc, cg, csh2, csc2, cg2 = self._ada6(self.norm1_context_linear, temb)

        img_n = layer_norm(img, eps=1e-6) * (1 + sc) + sh
        txt_n = layer_norm(txt, eps=1e-6) * (1 + csc) + csh

        def heads(x, proj):
            return proj(x).reshape(b, x.shape[1], self.heads, self.head_dim)

        q_i = apply_rope(self.norm_q(heads(img_n, self.to_q)), rope_cos, rope_sin)
        k_i = apply_rope(self.norm_k(heads(img_n, self.to_k)), rope_cos, rope_sin)
        v_i = heads(img_n, self.to_v)
        q_t = self.norm_added_q(heads(txt_n, self.add_q_proj))
        k_t = self.norm_added_k(heads(txt_n, self.add_k_proj))
        v_t = heads(txt_n, self.add_v_proj)

        q = jnp.concatenate([q_i, q_t], axis=1)
        k = jnp.concatenate([k_i, k_t], axis=1)
        v = jnp.concatenate([v_i, v_t], axis=1)
        out = attention_op(q, k, v, mask=mask_bias).reshape(b, n_img + n_txt, -1)
        img = img + self.to_out(out[:, :n_img]) * g
        txt = txt + self.to_add_out(out[:, n_img:]) * cg

        img = img + self.ff(layer_norm(img, eps=1e-6) * (1 + sc2) + sh2) * g2
        txt = txt + self.ff_context(layer_norm(txt, eps=1e-6) * (1 + csc2) + csh2) * cg2
        return img, txt


class HunyuanVideoSingleBlock(nnx.Module):
    """Parallel attention+MLP over the fused [img, txt] sequence
    (reference model.py:469; RoPE on the image part only)."""

    def __init__(self, cfg: HunyuanVideoConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
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

    def __call__(self, x, n_img, temb, temb_tr, n_first, rope_cos, rope_sin, mask_bias):
        b, s, _ = x.shape
        mods = jnp.split(self.norm_linear(nnx.silu(temb))[:, None, :], 3, axis=-1)
        if temb_tr is not None:
            # token_replace single block: first-frame img tokens take t=0 mods.
            mods_tr = jnp.split(self.norm_linear(nnx.silu(temb_tr))[:, None, :], 3, axis=-1)
            mods = _select_mod(mods, mods_tr, n_first, s)
        shift, scale, gate = mods
        xn = layer_norm(x, eps=1e-6) * (1 + scale) + shift

        def heads(proj):
            return proj(xn).reshape(b, s, self.heads, self.head_dim)

        q = self.norm_q(heads(self.to_q))
        k = self.norm_k(heads(self.to_k))
        v = heads(self.to_v)
        q_i = apply_rope(q[:, :n_img], rope_cos, rope_sin)
        k_i = apply_rope(k[:, :n_img], rope_cos, rope_sin)
        q = jnp.concatenate([q_i, q[:, n_img:]], axis=1)
        k = jnp.concatenate([k_i, k[:, n_img:]], axis=1)
        attn = attention_op(q, k, v, mask=mask_bias).reshape(b, s, -1)
        mlp = nnx.gelu(self.proj_mlp(xn), approximate=True)
        return x + gate * self.proj_out(jnp.concatenate([attn, mlp], axis=-1))


@transformer_registry.register(
    "hunyuanvideo.base", aliases=("hunyuanvideo", "HunyuanVideoTransformer3DModel")
)
class HunyuanVideoTransformer3DModel(nnx.Module):
    config_class = HunyuanVideoConfig

    def __init__(self, cfg: HunyuanVideoConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch_dim = cfg.in_channels * cfg.patch_size_t * cfg.patch_size**2
        self.x_embedder = Linear(patch_dim, d, **kw)
        # The HYV15 TokenRefiner is the same module family (duck-typed config:
        # dim / mlp_ratio / heads / head_dim / text_embed_dim / refiner layers).
        self.context_embedder = TokenRefiner(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        # Condition embedding (model.py:207): timestep MLP + pooled CLIP text
        # MLP (+ guidance MLP).
        self.time_linear_1 = Linear(256, d, **kw)
        self.time_linear_2 = Linear(d, d, **kw)
        self.text_linear_1 = Linear(cfg.pooled_projection_dim, d, **kw)
        self.text_linear_2 = Linear(d, d, **kw)
        if cfg.guidance_embeds:
            self.guidance_linear_1 = Linear(256, d, **kw)
            self.guidance_linear_2 = Linear(d, d, **kw)
        else:
            self.guidance_linear_1 = self.guidance_linear_2 = None
        self.transformer_blocks = nnx.List(
            [HunyuanVideoDualBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)]
        )
        self.single_transformer_blocks = nnx.List(
            [HunyuanVideoSingleBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_single_layers)]
        )
        self.norm_out_linear = Linear(d, 2 * d, **kw)
        self.proj_out = Linear(
            d, cfg.patch_size_t * cfg.patch_size**2 * cfg.out_channels, **kw
        )

    @staticmethod
    def sharding_rules(cfg: "HunyuanVideoConfig"):
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

    def rope_tables(self, t_tok: int, h_tok: int, w_tok: int):
        ids = np.stack(
            np.meshgrid(np.arange(t_tok), np.arange(h_tok), np.arange(w_tok), indexing="ij"),
            axis=-1,
        ).reshape(1, -1, 3)
        cos, sin = precompute_axial_freqs(ids, self.cfg.rope_axes_dim, self.cfg.rope_theta)
        return cos[:, :, None, :], sin[:, :, None, :]

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        # [B,C,T,H,W] → [B, (T/pt)(H/p)(W/p), C·pt·p·p]
        b, c, t, h, w = x.shape
        pt, p = self.cfg.patch_size_t, self.cfg.patch_size
        x = x.reshape(b, c, t // pt, pt, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // p) * (w // p), c * pt * p * p)

    def unpatchify(self, tokens: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
        b = tokens.shape[0]
        pt, p = self.cfg.patch_size_t, self.cfg.patch_size
        c = self.cfg.out_channels
        x = tokens.reshape(b, t // pt, h // p, w // p, c, pt, p, p)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return x.reshape(b, c, t, h, w)

    def __call__(
        self,
        x: jnp.ndarray,                # [B, C, T, H, W] latents
        t: jnp.ndarray,                # [B] timestep (0..1000)
        text: jnp.ndarray,             # [B, Lt, 4096] llama features
        text_mask: Optional[jnp.ndarray] = None,   # [B, Lt] 1=real
        pooled: Optional[jnp.ndarray] = None,      # [B, 768] CLIP-L pooled
        guidance: Optional[jnp.ndarray] = None,    # [B] distilled guidance ×1000
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        n_first = (hh // cfg.patch_size) * (ww // cfg.patch_size)  # first-frame tokens

        t_freq = timestep_embedding(t.astype(jnp.float32), 256, flip_sin_to_cos=True)
        temb = self.time_linear_2(nnx.silu(self.time_linear_1(t_freq.astype(self.dtype))))
        if pooled is not None:
            temb = temb + self.text_linear_2(nnx.silu(self.text_linear_1(
                pooled.astype(self.dtype))))
        temb_tr = None
        if cfg.image_condition_type == "token_replace":
            z_freq = timestep_embedding(jnp.zeros_like(t, dtype=jnp.float32), 256,
                                        flip_sin_to_cos=True)
            temb_tr = self.time_linear_2(nnx.silu(self.time_linear_1(
                z_freq.astype(self.dtype))))
            if pooled is not None:
                temb_tr = temb_tr + self.text_linear_2(nnx.silu(self.text_linear_1(
                    pooled.astype(self.dtype))))
        if self.guidance_linear_1 is not None and guidance is not None:
            g_freq = timestep_embedding(guidance.astype(jnp.float32), 256,
                                        flip_sin_to_cos=True)
            temb = temb + self.guidance_linear_2(nnx.silu(self.guidance_linear_1(
                g_freq.astype(self.dtype))))
            if temb_tr is not None:
                temb_tr = temb_tr + self.guidance_linear_2(nnx.silu(self.guidance_linear_1(
                    g_freq.astype(self.dtype))))

        img = self.x_embedder(self.patchify(x).astype(self.dtype))
        txt = self.context_embedder(text.astype(self.dtype), t, text_mask)
        rope_cos, rope_sin = self.rope_tables(
            tt // cfg.patch_size_t, hh // cfg.patch_size, ww // cfg.patch_size
        )

        n_img = img.shape[1]
        mask = None
        if text_mask is not None:
            # Key-padding over [img | txt]: img always valid.
            mask = jnp.concatenate(
                [jnp.ones((b, n_img), bool), text_mask.astype(bool)], axis=1
            )

        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, temb_tr, n_first, rope_cos, rope_sin, mask)

        xseq = jnp.concatenate([img, txt], axis=1)
        for blk in self.single_transformer_blocks:
            xseq = blk(xseq, n_img, temb, temb_tr, n_first, rope_cos, rope_sin, mask)
        img = xseq[:, :n_img]

        # AdaLayerNormContinuous: scale first, then shift.
        scale, shift = jnp.split(self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        return self.unpatchify(self.proj_out(img), tt, hh, ww)
