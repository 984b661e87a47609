"""Mochi-1 AsymmDiT in JAX/NNX.

Behavioral counterpart of the reference's ``src/transformer/mochi/base/
model.py`` (MochiTransformer3DModel, 536 LoC + attention.py): an
*asymmetric* dual-stream DiT —

- video stream at ``dim = heads·head_dim`` (3072), text stream at
  ``pooled_projection_dim`` (1536); joint attention projects text into the
  video width (added_q/k/v 1536→3072) and projects the attention result back
  (to_add_out 3072→1536); the last block drops the text update
- conditioning: sinusoidal timestep embedding + an attention-pooled caption
  embedding, summed into one ``temb`` (MochiCombinedTimestepCaptionEmbedding)
- "RMSNormZero" modulation: silu(temb) → 4 chunks (scale_attn, gate_attn,
  scale_mlp, gate_mlp); residuals are gated through tanh(gate) · rms(out)
  and there are **no shifts** (scale-only modulation, param-free RMS norms)
- per-head *learned-frequency* 3D RoPE (pos_frequencies [3, H, D/2]) over
  centered (t, y, x) token coordinates
- FFN: SwiGLU, asymmetric inner dims per stream
- final: scale-only modulated RMSNorm → proj to patch²·out_channels
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear, TimestepEmbedder
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.norms import layer_norm, rms_norm


@dataclasses.dataclass
class MochiConfig:
    patch_size: int = 2
    num_attention_heads: int = 24
    attention_head_dim: int = 128
    num_layers: int = 48
    in_channels: int = 12
    out_channels: int = 12
    text_embed_dim: int = 4096
    pooled_projection_dim: int = 1536
    time_embed_dim: int = 256
    ff_mult: int = 4  # nominal; actual inner = (mult·dim·2)//3 (LLaMA-style)

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "MochiConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


class MochiSwiGLU(nnx.Module):
    def __init__(self, dim: int, inner: int, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj_in = Linear(dim, 2 * inner, **kw)
        self.proj_out = Linear(inner, dim, **kw)

    def __call__(self, x):
        a, g = jnp.split(self.proj_in(x), 2, axis=-1)
        return self.proj_out(a * nnx.silu(g))


class MochiAttentionPool(nnx.Module):
    """Masked attention pooling of text features → conditioning vector."""

    def __init__(self, text_dim: int, out_dim: int, heads: int = 8, *,
                 dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(text_dim, text_dim, **kw)
        self.to_kv = Linear(text_dim, 2 * text_dim, **kw)
        self.to_out = Linear(text_dim, out_dim, **kw)
        self.heads = heads
        self.head_dim = text_dim // heads

    def __call__(self, txt, mask):
        b, n, d = txt.shape
        mean = jnp.sum(txt * mask[..., None], axis=1, keepdims=True) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True)[..., None], 1.0
        )
        q = self.to_q(mean).reshape(b, 1, self.heads, self.head_dim)
        kv = self.to_kv(jnp.concatenate([mean, txt], axis=1))
        # to_kv packs [k(D) | v(D)] as two D-sized halves (diffusers
        # MochiAttentionPool `.unflatten(2, (2, -1))`), NOT per-head pairs
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, n + 1, self.heads, self.head_dim)
        v = v.reshape(b, n + 1, self.heads, self.head_dim)
        bias = jnp.where(
            jnp.concatenate([jnp.ones((b, 1), mask.dtype), mask], axis=1).astype(bool),
            0.0, -1e9,
        )[:, None, None, :].astype(jnp.float32)
        out = attention_op(q, k, v, bias=bias)
        return self.to_out(out.reshape(b, d))


class MochiRoPE(nnx.Module):
    """Per-head learned-frequency 3D RoPE over centered (t, y, x) coords."""

    def __init__(self, heads: int, head_dim: int, *, rngs: nnx.Rngs):
        init = nnx.initializers.normal(1.0)
        self.pos_frequencies = nnx.Param(
            init(rngs.params(), (3, heads, head_dim // 2), jnp.float32)
        )

    # spatial positions are bin CENTERS of a grid rescaled to the 192x192
    # token target area (reference MochiRoPE._get_positions, model.py:298:
    # scale = sqrt(target_area/(h*w)); centers of linspace(-d*scale/2,
    # d*scale/2, d+1)) — the learned pos_frequencies were trained against
    # exactly these coordinates
    TARGET_AREA = 192 * 192

    def tables(self, t: int, h: int, w: int):
        scale = (self.TARGET_AREA / (h * w)) ** 0.5

        def centers(num):
            return scale * (np.arange(num, dtype=np.float64) + 0.5 - num / 2.0)

        ids = np.stack(
            np.meshgrid(
                np.arange(t, dtype=np.float64),
                centers(h),
                centers(w),
                indexing="ij",
            ),
            axis=-1,
        ).reshape(-1, 3).astype(np.float32)
        angles = jnp.einsum("nd,dhf->nhf", jnp.asarray(ids), self.pos_frequencies.value)
        return jnp.cos(angles), jnp.sin(angles)  # [N, H, D/2]


def _rope_rotate(x, cos, sin):
    # x [B, N, H, D]; cos/sin [N, H, D/2]; interleaved pairs
    x32 = x.astype(jnp.float32)
    xr, xi = x32[..., 0::2], x32[..., 1::2]
    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    return jnp.stack([out_r, out_i], axis=-1).reshape(x.shape).astype(x.dtype)


class MochiJointAttention(nnx.Module):
    def __init__(self, cfg: MochiConfig, last: bool, *, dtype, param_dtype, rngs: nnx.Rngs):
        d, td = cfg.dim, cfg.pooled_projection_dim
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.add_q_proj = Linear(td, d, **kw)
        self.add_k_proj = Linear(td, d, **kw)
        self.add_v_proj = Linear(td, d, **kw)
        self.to_out = Linear(d, d, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        # to_add_out carries a bias in the reference (MochiAttention
        # out_bias=True default; model.py:185 leaves it unset)
        self.to_add_out = None if last else Linear(
            d, td, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm_q = nnx.Param(jnp.ones((cfg.attention_head_dim,), jnp.float32))
        self.norm_k = nnx.Param(jnp.ones((cfg.attention_head_dim,), jnp.float32))
        self.norm_added_q = nnx.Param(jnp.ones((cfg.attention_head_dim,), jnp.float32))
        self.norm_added_k = nnx.Param(jnp.ones((cfg.attention_head_dim,), jnp.float32))
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def __call__(self, vid, txt, cos, sin):
        b, nv, _ = vid.shape
        nt = txt.shape[1]
        split = lambda x, n: x.reshape(b, n, self.heads, self.head_dim)
        q = rms_norm(split(self.to_q(vid), nv), self.norm_q.value)
        k = rms_norm(split(self.to_k(vid), nv), self.norm_k.value)
        v = split(self.to_v(vid), nv)
        q = _rope_rotate(q, cos, sin)
        k = _rope_rotate(k, cos, sin)
        tq = rms_norm(split(self.add_q_proj(txt), nt), self.norm_added_q.value)
        tk = rms_norm(split(self.add_k_proj(txt), nt), self.norm_added_k.value)
        tv = split(self.add_v_proj(txt), nt)
        out = attention_op(
            jnp.concatenate([q, tq], axis=1),
            jnp.concatenate([k, tk], axis=1),
            jnp.concatenate([v, tv], axis=1),
        ).reshape(b, nv + nt, -1)
        vid_out = self.to_out(out[:, :nv])
        txt_out = self.to_add_out(out[:, nv:]) if self.to_add_out is not None else None
        return vid_out, txt_out


class MochiBlock(nnx.Module):
    def __init__(self, cfg: MochiConfig, last: bool, *, dtype, param_dtype, rngs: nnx.Rngs):
        d, td = cfg.dim, cfg.pooled_projection_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.mod_x = Linear(d, 4 * d, **kw)
        self.mod_y = Linear(d, (4 if not last else 1) * td, **kw)
        self.attn = MochiJointAttention(cfg, last, **kw)
        # reference model.py:169: ff_inner = (4·dim·2)//3 per stream — real
        # Mochi checkpoints bake this into proj_in/proj_out shapes
        self.ff_x = MochiSwiGLU(d, (cfg.ff_mult * d * 2) // 3, **kw)
        self.ff_y = None if last else MochiSwiGLU(td, (cfg.ff_mult * td * 2) // 3, **kw)
        self.last = last

    def __call__(self, vid, txt, temb, cos, sin):
        mods_x = self.mod_x(nnx.silu(temb))[:, None, :]
        sa_x, ga_x, sm_x, gm_x = jnp.split(mods_x, 4, axis=-1)
        mods_y = self.mod_y(nnx.silu(temb))[:, None, :]
        if self.last:
            sa_y = mods_y
            ga_y = sm_y = gm_y = None
        else:
            sa_y, ga_y, sm_y, gm_y = jnp.split(mods_y, 4, axis=-1)

        # block norms use eps=1e-6 (reference MochiTransformerBlock eps
        # default, model.py:164); only the attention qk norms are 1e-5
        v_n = rms_norm(vid, eps=1e-6) * (1 + sa_x)
        t_n = rms_norm(txt, eps=1e-6) * (1 + sa_y)
        a_v, a_t = self.attn(v_n, t_n, cos, sin)
        vid = vid + jnp.tanh(ga_x) * rms_norm(a_v, eps=1e-6)
        if a_t is not None:
            txt = txt + jnp.tanh(ga_y) * rms_norm(a_t, eps=1e-6)

        vid = vid + jnp.tanh(gm_x) * rms_norm(
            self.ff_x(rms_norm(vid, eps=1e-6) * (1 + sm_x)), eps=1e-6)
        if self.ff_y is not None:
            txt = txt + jnp.tanh(gm_y) * rms_norm(
                self.ff_y(rms_norm(txt, eps=1e-6) * (1 + sm_y)), eps=1e-6)
        return vid, txt


@transformer_registry.register("mochi.base", aliases=("mochi", "MochiTransformer3DModel"))
class MochiTransformer3DModel(nnx.Module):
    config_class = MochiConfig

    def __init__(self, cfg: MochiConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        p = cfg.patch_size
        self.patch_proj = Linear(cfg.in_channels * p * p, cfg.dim, **kw)
        self.time_embed = TimestepEmbedder(cfg.dim, freq_size=cfg.time_embed_dim, **kw)
        self.pooler = MochiAttentionPool(cfg.text_embed_dim, cfg.dim, **kw)
        self.caption_proj = Linear(cfg.text_embed_dim, cfg.pooled_projection_dim, **kw)
        self.rope = MochiRoPE(cfg.num_attention_heads, cfg.attention_head_dim, rngs=rngs)
        self.blocks = nnx.List(
            [MochiBlock(cfg, last=i == cfg.num_layers - 1, **kw) for i in range(cfg.num_layers)]
        )
        # AdaLayerNormContinuous: linear(silu(temb)) -> (scale, shift), scale
        # FIRST, over a no-affine LayerNorm (reference model.py:437)
        self.norm_out_linear = Linear(cfg.dim, 2 * cfg.dim, **kw)
        self.proj_out = Linear(cfg.dim, p * p * cfg.out_channels, **kw)

    @staticmethod
    def sharding_rules(cfg: "MochiConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj)\.kernel", P(None, "tp")),
                (r"(to_out|to_add_out)\.kernel", P("tp", None)),
                (r"(ff_x|ff_y)\.proj_in\.kernel", P(None, "tp")),
                (r"(ff_x|ff_y)\.proj_out\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    def pack_latents(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.cfg.patch_size
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t, h // p, p, w // p, p)
        return x.transpose(0, 2, 3, 5, 1, 4, 6).reshape(b, t * (h // p) * (w // p), c * p * p)

    def unpack_latents(self, tokens: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
        """proj_out features are checkpoint-ordered [p1, p2, C] — channel
        FASTEST (reference model.py:524 `.reshape(B, F, H', W', p, p, -1)
        .permute(0, 6, 1, 2, 4, 3, 5)`); the input side stays conv-ordered
        [C, p, p]. Validated in tests/test_parity_mochi_dit.py."""
        p = self.cfg.patch_size
        b, n, d = tokens.shape
        c = d // (p * p)
        x = tokens.reshape(b, t, h // p, w // p, p, p, c)
        return x.transpose(0, 6, 1, 2, 4, 3, 5).reshape(b, c, t, h, w)

    def __call__(
        self,
        hidden_states: jnp.ndarray,          # [B, C, T, H, W]
        timestep: jnp.ndarray,               # [B] in [0, 1000)
        encoder_hidden_states: jnp.ndarray,  # [B, N_txt, text_embed_dim]
        encoder_attention_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, c, t, h, w = hidden_states.shape
        p = self.cfg.patch_size
        if encoder_attention_mask is None:
            encoder_attention_mask = jnp.ones(encoder_hidden_states.shape[:2], jnp.float32)

        temb = self.time_embed(timestep.astype(jnp.float32)) + self.pooler(
            encoder_hidden_states.astype(self.dtype), encoder_attention_mask
        )
        vid = self.patch_proj(self.pack_latents(hidden_states).astype(self.dtype))
        txt = self.caption_proj(encoder_hidden_states.astype(self.dtype))
        cos, sin = self.rope.tables(t, h // p, w // p)

        for blk in self.blocks:
            vid, txt = blk(vid, txt, temb, cos, sin)

        scale, shift = jnp.split(
            self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        vid = layer_norm(vid, eps=1e-6) * (1 + scale) + shift
        return self.unpack_latents(self.proj_out(vid), t, h, w)
