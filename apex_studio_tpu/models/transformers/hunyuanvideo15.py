"""HunyuanVideo 1.5 DiT (54 dual-stream blocks, 2048 dim) in JAX/NNX.

Counterpart of the reference's ``src/transformer/hunyuanvideo15/base/model.py``
(HunyuanVideo15Transformer3DModel:697). Structure:

- x_embedder: patch (1,1,1) Conv3d ≡ Linear over 65-channel latents
  (32 noise + 32 cond + 1 mask for i2v packing)
- context_embedder: 2-block token refiner over Qwen2.5-VL features, gated by
  timestep + masked-mean pooled text
- byT5 glyph branch (3-linear GELU projection) and SigLIP image branch, each
  tagged with a learned cond-type embedding and packed valid-tokens-first
- dual-stream blocks: AdaLayerNormZero per stream, joint attention over
  [img, txt] with per-head RMS qk-norm, RoPE (θ=256, axes 16/56/56) on image
  tokens only, gelu FFNs
- output: AdaLayerNormContinuous + linear to 32 channels

The reference's RoPE/FFN chunking profiles are single-GPU memory hacks; here
the same budget is covered by sharding + XLA fusion.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, LayerNorm, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class HYV15Config:
    in_channels: int = 65
    out_channels: int = 32
    num_attention_heads: int = 16
    attention_head_dim: int = 128
    num_layers: int = 54
    num_refiner_layers: int = 2
    mlp_ratio: float = 4.0
    patch_size: int = 1
    patch_size_t: int = 1
    text_embed_dim: int = 3584
    text_embed_2_dim: int = 1472
    image_embed_dim: int = 1152
    rope_theta: float = 256.0
    rope_axes_dim: Tuple[int, ...] = (16, 56, 56)
    guidance_embeds: bool = False

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "HYV15Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "rope_axes_dim" in kw:
            kw["rope_axes_dim"] = tuple(kw["rope_axes_dim"])
        return cls(**kw)


class RefinerBlock(nnx.Module):
    """Plain-attention token refiner block with adaLN output gates."""

    def __init__(self, cfg: HYV15Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = LayerNorm(d, eps=1e-6, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.to_out = Linear(d, d, **kw)
        self.norm2 = LayerNorm(d, eps=1e-6, rngs=rngs)
        # "linear-silu" FFN: proj → silu → out.
        self.ff_in = Linear(d, int(d * cfg.mlp_ratio), **kw)
        self.ff_out = Linear(int(d * cfg.mlp_ratio), d, **kw)
        self.ada_linear = Linear(d, 2 * d, **kw)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def __call__(self, x, temb, mask):
        b, s, _ = x.shape
        y = self.norm1(x)
        q = self.to_q(y).reshape(b, s, self.heads, self.head_dim)
        k = self.to_k(y).reshape(b, s, self.heads, self.head_dim)
        v = self.to_v(y).reshape(b, s, self.heads, self.head_dim)
        attn = self.to_out(attention_op(q, k, v, mask=mask).reshape(b, s, -1))

        gate_msa, gate_mlp = jnp.split(
            self.ada_linear(nnx.silu(temb))[:, None, :], 2, axis=-1
        )
        x = x + attn * gate_msa
        return x + self.ff_out(nnx.silu(self.ff_in(self.norm2(x)))) * gate_mlp


class TokenRefiner(nnx.Module):
    def __init__(self, cfg: HYV15Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.timestep_linear_1 = Linear(256, d, **kw)
        self.timestep_linear_2 = Linear(d, d, **kw)
        self.text_linear_1 = Linear(cfg.text_embed_dim, d, **kw)
        self.text_linear_2 = Linear(d, d, **kw)
        self.proj_in = Linear(cfg.text_embed_dim, d, **kw)
        self.refiner_blocks = nnx.List(
            [RefinerBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_refiner_layers)]
        )

    def __call__(self, text, timestep, mask):
        if mask is None:
            pooled = text.mean(axis=1)
        else:
            m = mask.astype(jnp.float32)[..., None]
            pooled = (text.astype(jnp.float32) * m).sum(1) / jnp.maximum(m.sum(1), 1e-6)
            pooled = pooled.astype(text.dtype)
        t_freq = timestep_embedding(timestep.astype(jnp.float32), 256, flip_sin_to_cos=True)
        temb = self.timestep_linear_2(nnx.silu(self.timestep_linear_1(t_freq.astype(text.dtype))))
        temb = temb + self.text_linear_2(nnx.silu(self.text_linear_1(pooled)))
        x = self.proj_in(text)
        attn_mask = mask if mask is None else mask.astype(bool)
        for blk in self.refiner_blocks:
            x = blk(x, temb, attn_mask)
        return x


class HYV15Block(nnx.Module):
    def __init__(self, cfg: HYV15Config, *, dtype, param_dtype, rngs: nnx.Rngs):
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
        self.ff = GELUMLP(d, int(d * cfg.mlp_ratio), approximate=True,
                          dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.ff_context = GELUMLP(d, int(d * cfg.mlp_ratio), approximate=True,
                                  dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    @staticmethod
    def _ada6(linear, temb):
        return jnp.split(linear(nnx.silu(temb))[:, None, :], 6, axis=-1)

    def __call__(self, img, txt, temb, rope_cos, rope_sin):
        b, n_img, _ = img.shape
        n_txt = txt.shape[1]
        sh, sc, g, sh2, sc2, g2 = self._ada6(self.norm1_linear, temb)
        csh, csc, cg, csh2, csc2, cg2 = self._ada6(self.norm1_context_linear, temb)

        img_n = layer_norm(img, eps=1e-6) * (1 + sc) + sh
        txt_n = layer_norm(txt, eps=1e-6) * (1 + csc) + csh

        def heads(x, proj):
            return proj(x).reshape(b, x.shape[1], self.heads, self.head_dim)

        q_i = self.norm_q(heads(img_n, self.to_q))
        k_i = self.norm_k(heads(img_n, self.to_k))
        v_i = heads(img_n, self.to_v)
        q_i = apply_rope(q_i, rope_cos, rope_sin)
        k_i = apply_rope(k_i, rope_cos, rope_sin)
        q_t = self.norm_added_q(heads(txt_n, self.add_q_proj))
        k_t = self.norm_added_k(heads(txt_n, self.add_k_proj))
        v_t = heads(txt_n, self.add_v_proj)

        q = jnp.concatenate([q_i, q_t], axis=1)
        k = jnp.concatenate([k_i, k_t], axis=1)
        v = jnp.concatenate([v_i, v_t], axis=1)
        out = attention_op(q, k, v).reshape(b, n_img + n_txt, -1)
        img = img + self.to_out(out[:, :n_img]) * g
        txt = txt + self.to_add_out(out[:, n_img:]) * cg

        img = img + self.ff(layer_norm(img, eps=1e-6) * (1 + sc2) + sh2) * g2
        txt = txt + self.ff_context(layer_norm(txt, eps=1e-6) * (1 + csc2) + csh2) * cg2
        return img, txt


@transformer_registry.register("hunyuanvideo15.base", aliases=("hunyuanvideo15",))
class HunyuanVideo15Transformer3DModel(nnx.Module):
    config_class = HYV15Config

    def __init__(self, cfg: HYV15Config, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch_dim = cfg.in_channels * cfg.patch_size_t * cfg.patch_size**2
        self.x_embedder = Linear(patch_dim, d, **kw)
        self.context_embedder = TokenRefiner(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        # byT5 projection: norm + 3 linears with GELU.
        self.byt5_norm = LayerNorm(cfg.text_embed_2_dim, eps=1e-5, rngs=rngs)
        self.byt5_linear_1 = Linear(cfg.text_embed_2_dim, 2048, **kw)
        self.byt5_linear_2 = Linear(2048, 2048, **kw)
        self.byt5_linear_3 = Linear(2048, d, **kw)
        # image projection.
        self.img_norm_in = LayerNorm(cfg.image_embed_dim, eps=1e-5, rngs=rngs)
        self.img_linear_1 = Linear(cfg.image_embed_dim, cfg.image_embed_dim, **kw)
        self.img_linear_2 = Linear(cfg.image_embed_dim, d, **kw)
        self.img_norm_out = LayerNorm(d, eps=1e-5, rngs=rngs)
        # time embedding.
        self.time_linear_1 = Linear(256, d, **kw)
        self.time_linear_2 = Linear(d, d, **kw)
        self.cond_type_embed = nnx.Param(
            nnx.initializers.normal(0.02)(rngs.params(), (3, d), param_dtype)
        )
        self.transformer_blocks = nnx.List(
            [HYV15Block(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)]
        )
        self.norm_out_linear = Linear(d, 2 * d, **kw)
        self.proj_out = Linear(d, cfg.patch_size_t * cfg.patch_size**2 * cfg.out_channels, **kw)

    @staticmethod
    def sharding_rules(cfg: "HYV15Config"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj)\.kernel", P(None, "tp")),
                (r"(to_out|to_add_out)\.kernel", P("tp", None)),
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
        """[B,C,T,H,W] → [B, N, C·pt·p·p], conv-ordered features [C, pt, ph, pw]
        (x_embedder is Conv3d(kernel=stride=patch) in the reference; the actual
        patch size comes from the published config.json at load time)."""
        pt, p = self.cfg.patch_size_t, self.cfg.patch_size
        b, c, t, h, w = x.shape
        if pt == 1 and p == 1:
            return x.reshape(b, c, t * h * w).transpose(0, 2, 1)
        x = x.reshape(b, c, t // pt, pt, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // p) * (w // p), c * pt * p * p)

    def unpatchify(self, tokens: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
        """proj_out features are channel-SLOWEST [C, pt, ph, pw] per the
        reference (hunyuanvideo15/base/model.py:1144 `.reshape(b, f', h', w',
        -1, p_t, p_h, p_w).permute(0, 4, 1, 5, 2, 6, 3, 7)`) — note this is the
        opposite of wan's channel-fastest order."""
        pt, p = self.cfg.patch_size_t, self.cfg.patch_size
        b = tokens.shape[0]
        c = self.cfg.out_channels
        if pt == 1 and p == 1:
            return tokens.transpose(0, 2, 1).reshape(b, c, t, h, w)
        x = tokens.reshape(b, t // pt, h // p, w // p, c, pt, p, p)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return x.reshape(b, c, t, h, w)

    def __call__(
        self,
        x: jnp.ndarray,                   # [B, 65, T, H, W] packed latents
        t: jnp.ndarray,                   # [B] timestep (0..1000)
        text: jnp.ndarray,                # [B, Lt, 3584] Qwen2.5-VL features
        text_mask: Optional[jnp.ndarray] = None,   # [B, Lt]
        text_2: Optional[jnp.ndarray] = None,      # [B, Lb, 1472] byT5 glyph
        text_2_mask: Optional[jnp.ndarray] = None,
        image_embeds: Optional[jnp.ndarray] = None,  # [B, Li, 1152] SigLIP
        image_stream_zeroed: bool = False,  # static: t2v zero-vision branch
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape

        t_freq = timestep_embedding(t.astype(jnp.float32), 256, flip_sin_to_cos=True)
        temb = self.time_linear_2(nnx.silu(self.time_linear_1(t_freq.astype(self.dtype))))

        img = self.x_embedder(self.patchify(x).astype(self.dtype))
        rope_cos, rope_sin = self.rope_tables(
            tt // cfg.patch_size_t, hh // cfg.patch_size, ww // cfg.patch_size
        )

        # Conditioning streams, each offset by its cond-type embedding.
        ctype = self.cond_type_embed.value.astype(self.dtype)
        txt = self.context_embedder(text.astype(self.dtype), t, text_mask) + ctype[0]
        streams = [txt]
        if text_2 is not None:
            y = self.byt5_norm(text_2.astype(self.dtype))
            y = self.byt5_linear_2(nnx.gelu(self.byt5_linear_1(y), approximate=False))
            y = self.byt5_linear_3(nnx.gelu(y, approximate=False)) + ctype[1]
            if text_2_mask is not None:
                y = y * text_2_mask.astype(y.dtype)[..., None]
            streams.insert(0, y)  # byT5 ahead of mllm (reference packing order)
        if image_embeds is not None:
            if image_stream_zeroed:
                # t2v: the reference keeps the vision slots in context but
                # zeroes the PROJECTED stream before adding the cond-type
                # embedding (model.py:1033 is_t2v branch) — so the tokens are
                # exactly the bare cond-type-2 embedding, not proj(0)+emb.
                z = jnp.broadcast_to(
                    ctype[2], (x.shape[0], image_embeds.shape[1], cfg.dim)
                )
            else:
                z = self.img_linear_1(self.img_norm_in(image_embeds.astype(self.dtype)))
                z = self.img_norm_out(self.img_linear_2(nnx.gelu(z, approximate=False))) + ctype[2]
            streams.insert(0, z)  # image first

        # Static packing: [image, byt5, mllm]; padding stays zeroed and
        # attended (reference skips the joint mask to keep flash attention,
        # model.py:1104 "CRITICAL: Skip masking entirely").
        if text_mask is not None:
            txt_zeroed = streams[-1] * text_mask.astype(self.dtype)[..., None]
            streams[-1] = txt_zeroed
        ctx = jnp.concatenate(streams, axis=1)

        for blk in self.transformer_blocks:
            img, ctx = blk(img, ctx, temb, rope_cos, rope_sin)

        # AdaLayerNormContinuous: scale first, then shift.
        scale, shift = jnp.split(self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        return self.unpatchify(self.proj_out(img), tt, hh, ww)
