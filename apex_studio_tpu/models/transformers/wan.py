"""Wan 2.1/2.2 video DiT in JAX/NNX.

Counterpart of the reference's ``src/transformer/wan/base/model.py``
(WanTransformer3DModel:1337, WanTransformerBlock:1020, WanAttention:551,
WanRotaryPosEmbed:847), rebuilt TPU-first:

- blocks: fp32 LayerNorm (no affine) modulated by a learned scale_shift_table
  + per-sample time projection [B,6,dim]; self-attention with 3D RoPE
  (t/h/w = d−4⌊d/6⌋ / 2⌊d/6⌋ / 2⌊d/6⌋ halves, θ=10000); cross-attention over
  UMT5 text features (plus CLIP image features for i2v via add_k/v projections);
  gelu-approximate FFN
- qk-norm is RMS **across heads** (full inner dim), matching
  qk_norm="rms_norm_across_heads"
- RoPE tables are trace-time constants per latent shape; attention flows
  through ops.attention (Pallas flash on TPU)
- the reference's FFN/norm chunking profiles (model.py:1485) are memory hacks
  a single chip needs; here sharding + remat replace them
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
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
class WanConfig:
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 40
    attention_head_dim: int = 128
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    ffn_dim: int = 13824
    num_layers: int = 40
    cross_attn_norm: bool = True
    eps: float = 1e-6
    # SkyReels (reference transformer/skyreels/base/model.py:81): a 2-entry
    # fps embedding whose 6·dim projection is added to every block's temb.
    inject_sample_info: bool = False
    image_dim: Optional[int] = None         # 1280 for i2v (CLIP features)
    added_kv_proj_dim: Optional[int] = None  # set for i2v cross-attn image kv
    rope_max_seq_len: int = 1024
    pos_embed_seq_len: Optional[int] = None

    # VACE (reference transformer/wan/vace/model.py:269)
    vace_layers: Tuple[int, ...] = ()
    vace_in_channels: int = 96

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def rope_axes_dims(self) -> Tuple[int, int, int]:
        d = self.attention_head_dim
        h = w = 2 * (d // 6)
        return (d - 2 * h, h, w)

    @classmethod
    def from_dict(cls, cfg: dict) -> "WanConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "patch_size" in kw:
            kw["patch_size"] = tuple(kw["patch_size"])
        return cls(**kw)


class WanAttention(nnx.Module):
    """Self- or cross-attention with across-heads RMS qk-norm."""

    def __init__(self, cfg: WanConfig, cross: bool, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.to_out = Linear(d, d, **kw)
        self.norm_q = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.norm_k = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        if cross and cfg.added_kv_proj_dim is not None:
            self.add_k_proj = Linear(cfg.added_kv_proj_dim, d, **kw)
            self.add_v_proj = Linear(cfg.added_kv_proj_dim, d, **kw)
            self.norm_added_k = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        else:
            self.add_k_proj = self.add_v_proj = self.norm_added_k = None
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    def __call__(self, x, context=None, rope_cos=None, rope_sin=None, context_image=None,
                 ctx_bias=None):
        ctx = x if context is None else context
        q = self._heads(self.norm_q(self.to_q(x)))
        k = self._heads(self.norm_k(self.to_k(ctx)))
        v = self._heads(self.to_v(ctx))
        if rope_cos is not None:
            q = apply_rope(q, rope_cos, rope_sin)
            k = apply_rope(k, rope_cos, rope_sin)
        out = attention_op(q, k, v, bias=ctx_bias)
        if context_image is not None and self.add_k_proj is not None:
            k_img = self._heads(self.norm_added_k(self.add_k_proj(context_image)))
            v_img = self._heads(self.add_v_proj(context_image))
            out = out + attention_op(q, k_img, v_img)
        b, s, _, _ = q.shape
        return self.to_out(out.reshape(b, s, -1))


class WanTransformerBlock(nnx.Module):
    def __init__(self, cfg: WanConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.attn1 = WanAttention(cfg, cross=False, **kw)
        self.attn2 = WanAttention(cfg, cross=True, **kw)
        self.norm2_weight = (
            nnx.Param(jnp.ones((d,), jnp.float32)) if cfg.cross_attn_norm else None
        )
        self.norm2_bias = (
            nnx.Param(jnp.zeros((d,), jnp.float32)) if cfg.cross_attn_norm else None
        )
        self.ffn = GELUMLP(d, cfg.ffn_dim, approximate=True, **kw)
        self.scale_shift_table = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(rngs.params(), (1, 6, d), jnp.float32)
        )
        self.eps = cfg.eps

    def __call__(self, x, context, temb6, rope_cos, rope_sin, context_image=None,
                 ctx_bias=None):
        # temb6: [B, 6, dim] f32, or [B, N, 6, dim] per-token (diffusion forcing)
        if temb6.ndim == 4:
            mods = (self.scale_shift_table.value[:, :, None] + temb6.swapaxes(1, 2)).astype(x.dtype)
            shift_msa, scale_msa, gate_msa = mods[:, 0], mods[:, 1], mods[:, 2]
            c_shift, c_scale, c_gate = mods[:, 3], mods[:, 4], mods[:, 5]
        else:
            mods = (self.scale_shift_table.value + temb6).astype(x.dtype)
            shift_msa, scale_msa, gate_msa = mods[:, 0:1], mods[:, 1:2], mods[:, 2:3]
            c_shift, c_scale, c_gate = mods[:, 3:4], mods[:, 4:5], mods[:, 5:6]

        norm_x = layer_norm(x, eps=self.eps) * (1 + scale_msa) + shift_msa
        x = x + self.attn1(norm_x, rope_cos=rope_cos, rope_sin=rope_sin) * gate_msa

        if self.norm2_weight is not None:
            norm_x = layer_norm(x, self.norm2_weight.value, self.norm2_bias.value, self.eps)
        else:
            norm_x = x
        x = x + self.attn2(norm_x, context=context, context_image=context_image,
                           ctx_bias=ctx_bias)

        norm_x = layer_norm(x, eps=self.eps) * (1 + c_scale) + c_shift
        return x + self.ffn(norm_x) * c_gate


@transformer_registry.register("wan.base", aliases=("wan",))
class WanTransformer3DModel(nnx.Module):
    config_class = WanConfig

    def __init__(self, cfg: WanConfig, *, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        patch_dim = cfg.in_channels * int(np.prod(cfg.patch_size))
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        lkw = dict(use_bias=True, **kw)
        # patch_embedding is a stride=patch Conv3d ≡ Linear over flattened patches.
        self.patch_embedding = Linear(patch_dim, d, **lkw)
        self.time_embedder_linear_1 = Linear(cfg.freq_dim, d, **lkw)
        self.time_embedder_linear_2 = Linear(d, d, **lkw)
        self.time_proj = Linear(d, 6 * d, **lkw)
        self.text_embedder_linear_1 = Linear(cfg.text_dim, d, **lkw)
        self.text_embedder_linear_2 = Linear(d, d, **lkw)
        if cfg.inject_sample_info:
            self.fps_embedding = nnx.Param(
                nnx.initializers.normal(0.02)(rngs.params(), (2, d), jnp.float32)
            )
            self.fps_projection_1 = Linear(d, d, **lkw)
            self.fps_projection_2 = Linear(d, 6 * d, **lkw)
        if cfg.image_dim is not None:
            self.img_norm1 = nnx.Param(jnp.ones((cfg.image_dim,), jnp.float32))
            self.img_norm1_bias = nnx.Param(jnp.zeros((cfg.image_dim,), jnp.float32))
            self.img_ff1 = Linear(cfg.image_dim, cfg.image_dim, **lkw)
            self.img_ff2 = Linear(cfg.image_dim, d, **lkw)
            self.img_norm2 = nnx.Param(jnp.ones((d,), jnp.float32))
            self.img_norm2_bias = nnx.Param(jnp.zeros((d,), jnp.float32))
        else:
            self.img_ff1 = None
        self.blocks = nnx.List([WanTransformerBlock(cfg, **kw) for _ in range(cfg.num_layers)])
        self.proj_out = Linear(d, cfg.out_channels * int(np.prod(cfg.patch_size)), **lkw)
        self.scale_shift_table = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(rngs.params(), (1, 2, d), jnp.float32)
        )

    @staticmethod
    def sharding_rules(cfg: "WanConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|add_k_proj|add_v_proj)\.kernel", P(None, "tp")),
                (r"to_out\.kernel", P("tp", None)),
                (r"ffn\.fc1\.kernel", P(None, "tp")),
                (r"ffn\.fc2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    # -- geometry --------------------------------------------------------------------

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, C, T, H, W] → [B, N, C·pt·ph·pw], token order (t, h, w).

        Matches Conv3d(kernel=stride=patch): features ordered [C, pt, ph, pw].
        """
        pt, ph, pw = self.cfg.patch_size
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // ph) * (w // pw), c * pt * ph * pw)

    def unpatchify(self, tokens: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
        """proj_out feature order is [pt, ph, pw, C] — channel FASTEST — per the
        reference's reshape (model.py:1870: `.reshape(b, f', h', w', p_t, p_h,
        p_w, -1).permute(0, 7, 1, 4, 2, 5, 3, 6)`). Real Wan checkpoints bake
        this into proj_out.weight, so the convention is load-bearing
        (tests/test_parity_wan_dit.py)."""
        pt, ph, pw = self.cfg.patch_size
        c = self.cfg.out_channels
        b = tokens.shape[0]
        x = tokens.reshape(b, t // pt, h // ph, w // pw, pt, ph, pw, c)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, c, t, h, w)

    def rope_tables(self, t_tok: int, h_tok: int, w_tok: int):
        ids = np.stack(
            np.meshgrid(np.arange(t_tok), np.arange(h_tok), np.arange(w_tok), indexing="ij"),
            axis=-1,
        ).reshape(1, -1, 3)
        cos, sin = precompute_axial_freqs(ids, self.cfg.rope_axes_dims, theta=10000.0)
        return cos[:, :, None, :], sin[:, :, None, :]

    # -- forward ---------------------------------------------------------------------

    def _prepare_cond(self, x, t, context, context_image, fps_index):
        """Shared conditioning prep: (tokens, temb, temb6, ctx, ctx_img,
        rope_cos, rope_sin, per_frame)."""
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size

        per_frame = t.ndim == 2  # diffusion forcing (skyreels df)
        t_freq = timestep_embedding(
            t.reshape(-1).astype(jnp.float32), cfg.freq_dim, flip_sin_to_cos=True
        )
        temb = self.time_embedder_linear_2(
            nnx.silu(self.time_embedder_linear_1(t_freq.astype(self.dtype)))
        )
        temb6 = self.time_proj(nnx.silu(temb)).astype(jnp.float32).reshape(-1, 6, cfg.dim)
        if cfg.inject_sample_info and fps_index is not None:
            fps_emb = self.fps_embedding.value[fps_index].astype(self.dtype)
            fps6 = self.fps_projection_2(
                nnx.silu(self.fps_projection_1(fps_emb))
            ).astype(jnp.float32).reshape(b, 6, cfg.dim)
            temb6 = temb6 + (jnp.tile(fps6, (temb6.shape[0] // b, 1, 1))
                             if per_frame else fps6)
        if per_frame:
            # [B·T_lat, …] → broadcast each frame's conditioning over its
            # h·w tokens: [B, N_tokens, …] with token order (t, h, w).
            f_lat = t.shape[1]
            hw = (hh // ph) * (ww // pw)
            assert f_lat == tt // pt
            temb = jnp.repeat(temb.reshape(b, f_lat, cfg.dim), hw, axis=1)
            temb6 = jnp.repeat(temb6.reshape(b, f_lat, 6, cfg.dim), hw, axis=1)

        ctx = self.text_embedder_linear_2(
            nnx.gelu(self.text_embedder_linear_1(context.astype(self.dtype)), approximate=True)
        )
        ctx_img = None
        if context_image is not None and self.img_ff1 is not None:
            y = layer_norm(context_image.astype(self.dtype), self.img_norm1.value,
                           self.img_norm1_bias.value)
            y = self.img_ff2(nnx.gelu(self.img_ff1(y), approximate=False))
            ctx_img = layer_norm(y, self.img_norm2.value, self.img_norm2_bias.value)

        tokens = self.patch_embedding(self.patchify(x).astype(self.dtype))
        rope_cos, rope_sin = self.rope_tables(tt // pt, hh // ph, ww // pw)
        return tokens, temb, temb6, ctx, ctx_img, rope_cos, rope_sin, per_frame

    def _finalize(self, tokens, temb, per_frame, tt, hh, ww):
        cfg = self.cfg
        # Final modulated norm: table order is (shift, scale).
        if per_frame:
            table = self.scale_shift_table.value[:, :, None] \
                + temb.astype(jnp.float32)[:, None, :, :]   # [B, 2, N, d]
            shift = table[:, 0].astype(tokens.dtype)
            scale = table[:, 1].astype(tokens.dtype)
        else:
            table = self.scale_shift_table.value + temb.astype(jnp.float32)[:, None, :]
            shift, scale = table[:, 0:1].astype(tokens.dtype), table[:, 1:2].astype(tokens.dtype)
        tokens = layer_norm(tokens, eps=cfg.eps) * (1 + scale) + shift
        return self.unpatchify(self.proj_out(tokens), tt, hh, ww)

    def __call__(
        self,
        x: jnp.ndarray,                 # [B, C, T, H, W] latents
        t: jnp.ndarray,                 # [B] or [B, T_lat] timesteps (0..1000)
        context: jnp.ndarray,           # [B, L, text_dim] UMT5 features
        context_image: Optional[jnp.ndarray] = None,  # [B, Li, image_dim] CLIP
        fps_index: Optional[jnp.ndarray] = None,      # [B] int 0|1 (skyreels)
        ctx_bias: Optional[jnp.ndarray] = None,       # [B,1,S,L] cross-attn bias
        shot_ids: Optional[jnp.ndarray] = None,       # [B, S] per-token shot id
    ) -> jnp.ndarray:
        b, c, tt, hh, ww = x.shape
        tokens, temb, temb6, ctx, ctx_img, rope_cos, rope_sin, per_frame = \
            self._prepare_cond(x, t, context, context_image, fps_index)
        if shot_ids is not None and getattr(self, "shot_embedding", None) is not None:
            tokens = tokens + self.shot_embedding.value[shot_ids].astype(tokens.dtype)
        for blk in self.blocks:
            tokens = blk(tokens, ctx, temb6, rope_cos, rope_sin,
                         context_image=ctx_img, ctx_bias=ctx_bias)
        return self._finalize(tokens, temb, per_frame, tt, hh, ww)


# SkyReels V2 is this architecture with inject_sample_info=True and
# diffusion-forcing per-frame timesteps (reference transformer/skyreels/base/
# model.py:362 SkyReelsTransformer3DModel).
transformer_registry.add(
    "skyreels.base", WanTransformer3DModel,
    aliases=("skyreels", "SkyReelsTransformer3DModel"),
)


# -- causal / autoregressive variant ---------------------------------------------------


@transformer_registry.register("wan.causal", aliases=("wan_causal", "WanCausalTransformer3DModel"))
class WanCausalTransformer3DModel(WanTransformer3DModel):
    """Block-causal Wan DiT for autoregressive long-video generation.

    Behavioral counterpart of the reference's CausVid/Self-Forcing variant
    (``src/transformer/wan/causal/model.py``; engine ``src/engine/wan/causal.py``):
    each latent-frame block attends to a KV cache of previously committed
    blocks plus itself, with optional local attention windows and sink tokens.

    TPU-first design: the reference mutates per-layer python dict caches; here
    the cache is a fixed-size functional pytree ``(k, v)`` of shape
    [L, B, S_max, H, D] updated with ``lax.dynamic_update_slice`` and masked by
    a traced valid-length — one compiled program serves every block position
    (RoPE tables for the block's absolute positions are passed in as inputs).
    Cross-attention k/v are recomputed per call (XLA makes them negligible next
    to self-attention; the reference caches them as a CPU-side optimization).
    """

    def init_cache(self, batch: int, max_tokens: int):
        l = len(self.blocks)
        h, dh = self.cfg.num_attention_heads, self.cfg.attention_head_dim
        shape = (l, batch, max_tokens, h, dh)
        return jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype)

    def forward_causal(
        self,
        x: jnp.ndarray,                # [B, C, T_blk, H, W] current block latents
        t: jnp.ndarray,                # [B, T_blk] per-frame timesteps (0..1000)
        context: jnp.ndarray,          # [B, L, text_dim]
        k_cache: jnp.ndarray,          # [L, B, S_max, H, D]
        v_cache: jnp.ndarray,
        cache_pos,                     # traced int32 — committed tokens in cache
        rope_cos: jnp.ndarray,         # tables for THIS block's absolute positions
        rope_sin: jnp.ndarray,
        local_tokens: int = -1,        # attend to at most this many recent tokens
        sink_tokens: int = 0,          # plus always the first `sink` tokens
    ):
        """→ (flow_pred [B,C,T_blk,H,W], (k_cache', v_cache') with this block
        written at cache_pos)."""
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size

        t_freq = timestep_embedding(
            t.reshape(-1).astype(jnp.float32), cfg.freq_dim, flip_sin_to_cos=True
        )
        temb = self.time_embedder_linear_2(
            nnx.silu(self.time_embedder_linear_1(t_freq.astype(self.dtype)))
        )
        temb6 = self.time_proj(nnx.silu(temb)).astype(jnp.float32).reshape(-1, 6, cfg.dim)
        f_lat = t.shape[1]
        hw = (hh // ph) * (ww // pw)
        temb = jnp.repeat(temb.reshape(b, f_lat, cfg.dim), hw, axis=1)
        temb6 = jnp.repeat(temb6.reshape(b, f_lat, 6, cfg.dim), hw, axis=1)

        ctx = self.text_embedder_linear_2(
            nnx.gelu(self.text_embedder_linear_1(context.astype(self.dtype)), approximate=True)
        )
        tokens = self.patch_embedding(self.patchify(x).astype(self.dtype))

        n_new = tokens.shape[1]
        s_max = k_cache.shape[2]
        pos = jnp.arange(s_max)
        end = cache_pos + n_new
        valid = pos < end
        if local_tokens > 0:
            window = valid & (pos >= end - local_tokens)
            if sink_tokens > 0:
                window = window | (valid & (pos < sink_tokens))
            valid = window
        mask = jnp.broadcast_to(valid[None], (b, s_max))

        new_k, new_v = [], []
        for i, blk in enumerate(self.blocks):
            mods = (blk.scale_shift_table.value[:, :, None]
                    + temb6.swapaxes(1, 2)).astype(tokens.dtype)
            shift_msa, scale_msa, gate_msa = mods[:, 0], mods[:, 1], mods[:, 2]
            c_shift, c_scale, c_gate = mods[:, 3], mods[:, 4], mods[:, 5]

            norm_x = layer_norm(tokens, eps=blk.eps) * (1 + scale_msa) + shift_msa
            attn = blk.attn1
            q = attn._heads(attn.norm_q(attn.to_q(norm_x)))
            k_new = attn._heads(attn.norm_k(attn.to_k(norm_x)))
            v_new = attn._heads(attn.to_v(norm_x))
            q = apply_rope(q, rope_cos, rope_sin)
            k_new = apply_rope(k_new, rope_cos, rope_sin)
            k_all = jax.lax.dynamic_update_slice(
                k_cache[i], k_new.astype(k_cache.dtype), (0, cache_pos, 0, 0)
            )
            v_all = jax.lax.dynamic_update_slice(
                v_cache[i], v_new.astype(v_cache.dtype), (0, cache_pos, 0, 0)
            )
            out = attention_op(q, k_all, v_all, mask=mask).reshape(b, n_new, -1)
            tokens = tokens + attn.to_out(out) * gate_msa
            new_k.append(k_all)
            new_v.append(v_all)

            if blk.norm2_weight is not None:
                norm_x = layer_norm(tokens, blk.norm2_weight.value,
                                    blk.norm2_bias.value, blk.eps)
            else:
                norm_x = tokens
            tokens = tokens + blk.attn2(norm_x, context=ctx)

            norm_x = layer_norm(tokens, eps=blk.eps) * (1 + c_scale) + c_shift
            tokens = tokens + blk.ffn(norm_x) * c_gate

        table = self.scale_shift_table.value[:, :, None] \
            + temb.astype(jnp.float32)[:, None, :, :]
        shift = table[:, 0].astype(tokens.dtype)
        scale = table[:, 1].astype(tokens.dtype)
        tokens = layer_norm(tokens, eps=cfg.eps) * (1 + scale) + shift
        out = self.unpatchify(self.proj_out(tokens), tt, hh, ww)
        return out, (jnp.stack(new_k), jnp.stack(new_v))

    def causal_rope_tables(self, start_frame: int, n_frames: int, h_tok: int, w_tok: int):
        """RoPE tables for a block starting at absolute latent frame
        ``start_frame`` (host-side numpy; passed into the jitted step)."""
        ids = np.stack(
            np.meshgrid(np.arange(start_frame, start_frame + n_frames),
                        np.arange(h_tok), np.arange(w_tok), indexing="ij"),
            axis=-1,
        ).reshape(1, -1, 3)
        cos, sin = precompute_axial_freqs(ids, self.cfg.rope_axes_dims, theta=10000.0)
        return cos[:, :, None, :], sin[:, :, None, :]


# -- VACE variant -----------------------------------------------------------------------


class WanVACEBlock(WanTransformerBlock):
    """A Wan block running on the control stream, with an input projection on
    the first block (adds the video tokens) and a per-block output projection
    producing the hint (reference vace/model.py:80)."""

    def __init__(self, cfg: WanConfig, first: bool, *, dtype, param_dtype,
                 rngs: nnx.Rngs):
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj_in = Linear(cfg.dim, cfg.dim, **kw) if first else None
        self.proj_out = Linear(cfg.dim, cfg.dim, **kw)

    def run_control(self, hidden, context, control, temb6, rope_cos, rope_sin):
        if self.proj_in is not None:
            control = self.proj_in(control) + hidden
        control = super().__call__(control, context, temb6, rope_cos, rope_sin)
        return self.proj_out(control), control


@transformer_registry.register(
    "wan.vace", aliases=("wan_vace", "WanVACETransformer3DModel"))
class WanVACETransformer3DModel(WanTransformer3DModel):
    """Wan + VACE control branch: the 96-channel conditioning video
    (inactive/reactive latents + space-to-depth mask) flows through a stack of
    control blocks whose per-block hints are added into the main stream at the
    configured layers (reference vace/model.py:605 forward)."""

    def __init__(self, cfg: WanConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        if not cfg.vace_layers:
            cfg = dataclasses.replace(cfg, vace_layers=tuple(
                range(0, cfg.num_layers, max(1, cfg.num_layers // 8))))
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch_dim = cfg.vace_in_channels * int(np.prod(cfg.patch_size))
        self.vace_patch_embedding = Linear(patch_dim, cfg.dim, **kw)
        self.vace_blocks = nnx.List([
            WanVACEBlock(cfg, first=(i == 0), dtype=dtype,
                         param_dtype=param_dtype, rngs=rngs)
            for i in range(len(cfg.vace_layers))
        ])

    def patchify_control(self, control: jnp.ndarray) -> jnp.ndarray:
        pt, ph, pw = self.cfg.patch_size
        b, c, t, h, w = control.shape
        x = control.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // ph) * (w // pw), c * pt * ph * pw)

    def __call__(self, x, t, context, control=None, control_scale=None,
                 context_image=None, fps_index=None):
        b, c, tt, hh, ww = x.shape
        tokens, temb, temb6, ctx, ctx_img, rope_cos, rope_sin, per_frame = \
            self._prepare_cond(x, t, context, context_image, fps_index)
        if control is not None:
            ctl = self.vace_patch_embedding(
                self.patchify_control(control).astype(self.dtype))
            if ctl.shape[1] < tokens.shape[1]:  # pad to the main sequence
                pad = jnp.zeros(
                    (b, tokens.shape[1] - ctl.shape[1], ctl.shape[-1]), ctl.dtype)
                ctl = jnp.concatenate([ctl, pad], axis=1)
            n_vace = len(self.vace_blocks)
            if control_scale is None:
                control_scale = jnp.ones((n_vace,), jnp.float32)
            hints = []
            for vb in self.vace_blocks:
                hint, ctl = vb.run_control(tokens, ctx, ctl, temb6,
                                           rope_cos, rope_sin)
                hints.append(hint)
            hint_by_layer = dict(zip(self.cfg.vace_layers, range(n_vace)))
        else:
            hint_by_layer = {}
        for i, blk in enumerate(self.blocks):
            tokens = blk(tokens, ctx, temb6, rope_cos, rope_sin,
                         context_image=ctx_img)
            if i in hint_by_layer:
                j = hint_by_layer[i]
                tokens = tokens + hints[j] * control_scale[j].astype(tokens.dtype)
        return self._finalize(tokens, temb, per_frame, tt, hh, ww)


# -- Fun / Phantom variant --------------------------------------------------------------


@transformer_registry.register(
    "wan.fun",
    aliases=("wan_fun", "wan.phantom", "WanFunTransformer3DModel",
             "Wan2_2FunTransformerModel"))
class WanFunTransformer3DModel(WanTransformer3DModel):
    """Wan with subject-reference token appending (reference
    transformer/wan/fun/model.py:851): VAE latents of subject reference
    images are patch-embedded with the shared patch embedding and appended
    to the sequence (rope extended over the extra frames), then sliced off
    before unpatchify. Serves the fun / fun_control / phantom engines; the
    control-video channel concat of fun_control happens engine-side."""

    def __call__(self, x, t, context, subject_ref=None, context_image=None,
                 fps_index=None):
        if subject_ref is None:
            return super().__call__(x, t, context,
                                    context_image=context_image,
                                    fps_index=fps_index)
        b, c, tt, hh, ww = x.shape
        n_ref_frames = subject_ref.shape[2]
        # The concat-in-time trick: patchify([x | ref]) produces exactly
        # [main tokens..., ref tokens...] with rope spanning T+T_ref frames.
        # Channel counts may differ (control variants); pad the ref to match.
        if subject_ref.shape[1] < c:
            pad = jnp.zeros((b, c - subject_ref.shape[1], n_ref_frames, hh, ww),
                            subject_ref.dtype)
            subject_ref = jnp.concatenate([subject_ref, pad], axis=1)
        xr = jnp.concatenate([x, subject_ref.astype(x.dtype)], axis=2)
        tokens, temb, temb6, ctx, ctx_img, cos, sin, per_frame = \
            self._prepare_cond(xr, t, context, context_image, fps_index)
        for blk in self.blocks:
            tokens = blk(tokens, ctx, temb6, cos, sin, context_image=ctx_img)
        pt, ph, pw = self.cfg.patch_size
        n_main = (tt // pt) * (hh // ph) * (ww // pw)
        tokens = tokens[:, :n_main]
        return self._finalize(tokens, temb, per_frame, tt, hh, ww)


# -- ReCamMaster variant ----------------------------------------------------------------


class WanRecamBlock(WanTransformerBlock):
    """Wan block with a zero-init camera-pose encoder whose embedding is
    added to the tokens before attention (reference transformer/wan/recam/
    model.py:207-225)."""

    def __init__(self, cfg: WanConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.cam_encoder = Linear(12, cfg.dim, use_bias=True, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)
        self.cam_encoder.kernel.value = jnp.zeros_like(
            self.cam_encoder.kernel.value)

    def __call__(self, x, context, temb6, rope_cos, rope_sin,
                 context_image=None, cam_tokens=None):
        if cam_tokens is not None:
            x = x + cam_tokens.astype(x.dtype)
        return super().__call__(x, context, temb6, rope_cos, rope_sin,
                                context_image=context_image)


@transformer_registry.register(
    "wan.recam", aliases=("wan_recam", "WanRecamTransformer3DModel"))
class WanRecamTransformer3DModel(WanTransformer3DModel):
    """ReCamMaster: the target clip and the source clip are concatenated in
    TIME; per-block camera encodings (relative 3×4 extrinsics, 12 values per
    latent frame) are broadcast over the spatial grid and added each layer
    (reference engine/wan/recam.py:314 latent concat, model.py:222)."""

    def __init__(self, cfg: WanConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.blocks = nnx.List([
            WanRecamBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            for _ in range(cfg.num_layers)
        ])

    def __call__(self, x, t, context, cam_emb=None, context_image=None,
                 fps_index=None):
        b, c, tt, hh, ww = x.shape
        pt, ph, pw = self.cfg.patch_size
        tokens, temb, temb6, ctx, ctx_img, cos, sin, per_frame = \
            self._prepare_cond(x, t, context, context_image, fps_index)
        for blk in self.blocks:
            cam_tokens = None
            if cam_emb is not None:
                ce = blk.cam_encoder(cam_emb.astype(blk.cam_encoder.dtype))
                f_lat = ce.shape[1]
                reps = (tt // pt) // f_lat
                ce = jnp.repeat(ce, reps, axis=1)  # target+source halves
                hw = (hh // ph) * (ww // pw)
                cam_tokens = jnp.repeat(ce, hw, axis=1)
            tokens = blk(tokens, ctx, temb6, cos, sin, context_image=ctx_img,
                         cam_tokens=cam_tokens)
        return self._finalize(tokens, temb, per_frame, tt, hh, ww)


# -- HoloCine joint multi-shot variant -------------------------------------------------


@transformer_registry.register("wan.holocine", aliases=("holocine",))
class WanHolocineTransformer3DModel(WanTransformer3DModel):
    """HoloCine multi-shot Wan DiT (reference engine/wan/holocine.py
    _run_inference_step / HoloCine model_fn_wan_video): the base Wan
    architecture plus an optional learned per-shot token embedding added
    after patchify (holocine.py:177-187) and a per-token cross-attention
    bias that routes each video token to its own shot's caption span plus
    the global span (holocine.py:204-263 — built by the engine and passed
    as ``ctx_bias``). An optional extra shot-mask input channel rides on
    ``in_channels`` (holocine.py:136-158)."""

    def __init__(self, cfg: WanConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        n_shots = int(getattr(cfg, "max_shots", 0) or 20)
        self.shot_embedding = nnx.Param(
            nnx.initializers.normal(0.02)(rngs.params(), (n_shots, cfg.dim),
                                          jnp.float32))
