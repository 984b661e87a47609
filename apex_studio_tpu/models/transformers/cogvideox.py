"""CogVideoX DiT in JAX/NNX.

Behavioral counterpart of the reference's ``src/transformer/cogvideo/``
(diffusers CogVideoXTransformer3DModel, 1,689 LoC in the reference tree):

- video tokens: per-frame 2×2 spatial patches projected by a linear patch
  embed; text tokens (T5 features) projected into the same width and
  *prepended* to the sequence — every block attends over [text ‖ video]
- "LayerNormZero" conditioning: silu(temb) → 6 chunks giving (shift, scale,
  gate) for the video stream and the text stream separately, around both the
  attention and the FFN; the FFN runs on the concatenated sequence
- attention: single fused QKV over the joint sequence, per-head LayerNorm
  qk-norm, 3D RoPE applied to the *video* positions only (text unrotated) —
  the CogVideoX-5B / 1.5 convention (2B's learned positional embeddings are
  subsumed: pass use_rotary_positional_embeddings=false to disable rotation)
- final: LayerNorm → AdaLN (silu(temb) → 2 chunks) on video tokens → proj to
  patch_size² · out_channels

TPU-first notes: the joint sequence keeps one static shape per (res, frames,
text-len) bucket so XLA compiles once; attention dispatches through the
attention registry (Pallas flash on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, LayerNorm, Linear, TimestepEmbedder
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class CogVideoXConfig:
    num_attention_heads: int = 48
    attention_head_dim: int = 64
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 42
    text_embed_dim: int = 4096
    time_embed_dim: int = 512
    patch_size: int = 2
    temporal_compression_ratio: int = 4
    sample_height: int = 60
    sample_width: int = 90
    use_rotary_positional_embeddings: bool = True
    rope_theta: float = 10000.0

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def rope_axes_dims(self) -> Tuple[int, int, int]:
        # diffusers get_3d_rotary_pos_embed: head_dim split t:h:w = 1:2:2 quarters
        d = self.attention_head_dim
        return (d // 4, 3 * d // 8, 3 * d // 8)

    @classmethod
    def from_dict(cls, cfg: dict) -> "CogVideoXConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


class CogLayerNormZero(nnx.Module):
    """silu(temb) → Linear(6·dim): (shift, scale, gate) × (video, text)."""

    def __init__(self, cond_dim: int, dim: int, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.linear = Linear(cond_dim, 6 * dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm = LayerNorm(dim, eps=1e-5, elementwise_affine=True, rngs=rngs)

    def __call__(self, vid, txt, temb):
        mods = self.linear(nnx.silu(temb))[:, None, :]
        shift, scale, gate, t_shift, t_scale, t_gate = jnp.split(mods, 6, axis=-1)
        vid = self.norm(vid) * (1 + scale) + shift
        txt = self.norm(txt) * (1 + t_scale) + t_shift
        return vid, txt, gate, t_gate


class CogVideoXAttention(nnx.Module):
    def __init__(self, cfg: CogVideoXConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d, kw = cfg.dim, dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.to_out = Linear(d, d, **kw)
        self.norm_q = LayerNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_k = LayerNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def __call__(self, seq, n_txt: int, cos, sin):
        b, n, _ = seq.shape
        split = lambda x: x.reshape(b, n, self.heads, self.head_dim)
        q = self.norm_q(split(self.to_q(seq)))
        k = self.norm_k(split(self.to_k(seq)))
        v = split(self.to_v(seq))
        if cos is not None:
            # rotate video positions only; text tokens (the first n_txt) pass through
            q = jnp.concatenate([q[:, :n_txt], apply_rope(q[:, n_txt:], cos, sin)], axis=1)
            k = jnp.concatenate([k[:, :n_txt], apply_rope(k[:, n_txt:], cos, sin)], axis=1)
        out = attention_op(q, k, v)
        return self.to_out(out.reshape(b, n, -1))


class CogVideoXBlock(nnx.Module):
    def __init__(self, cfg: CogVideoXConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = CogLayerNormZero(cfg.time_embed_dim, cfg.dim, **kw)
        self.attn1 = CogVideoXAttention(cfg, **kw)
        self.norm2 = CogLayerNormZero(cfg.time_embed_dim, cfg.dim, **kw)
        self.ff = GELUMLP(cfg.dim, 4 * cfg.dim, **kw)

    def __call__(self, vid, txt, temb, cos, sin):
        n_txt = txt.shape[1]
        v_n, t_n, v_gate, t_gate = self.norm1(vid, txt, temb)
        attn = self.attn1(jnp.concatenate([t_n, v_n], axis=1), n_txt, cos, sin)
        txt = txt + t_gate * attn[:, :n_txt]
        vid = vid + v_gate * attn[:, n_txt:]

        v_n, t_n, v_gate, t_gate = self.norm2(vid, txt, temb)
        ff = self.ff(jnp.concatenate([t_n, v_n], axis=1))
        txt = txt + t_gate * ff[:, :n_txt]
        vid = vid + v_gate * ff[:, n_txt:]
        return vid, txt


@transformer_registry.register("cogvideo.base", aliases=("cogvideox", "CogVideoXTransformer3DModel"))
class CogVideoXTransformer3DModel(nnx.Module):
    config_class = CogVideoXConfig

    def __init__(self, cfg: CogVideoXConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        p = cfg.patch_size
        self.patch_embed_proj = Linear(cfg.in_channels * p * p, cfg.dim, **kw)
        self.text_proj = Linear(cfg.text_embed_dim, cfg.dim, **kw)
        self.time_embed = TimestepEmbedder(cfg.time_embed_dim, freq_size=cfg.dim, **kw)
        self.transformer_blocks = nnx.List(
            [CogVideoXBlock(cfg, **kw) for _ in range(cfg.num_layers)]
        )
        self.norm_final = LayerNorm(cfg.dim, eps=1e-5, rngs=rngs)
        self.norm_out_linear = Linear(cfg.time_embed_dim, 2 * cfg.dim, **kw)
        self.proj_out = Linear(cfg.dim, p * p * cfg.out_channels, **kw)

    @staticmethod
    def sharding_rules(cfg: "CogVideoXConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v)\.kernel", P(None, "tp")),
                (r"to_out\.kernel", P("tp", None)),
                (r"ff\.fc1\.kernel", P(None, "tp")),
                (r"ff\.fc2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    def rope_tables(self, t_tok: int, h_tok: int, w_tok: int):
        if not self.cfg.use_rotary_positional_embeddings:
            return None, None
        ids = np.stack(
            np.meshgrid(np.arange(t_tok), np.arange(h_tok), np.arange(w_tok), indexing="ij"),
            axis=-1,
        ).reshape(-1, 3)
        cos, sin = precompute_axial_freqs(
            jnp.asarray(ids)[None], self.cfg.rope_axes_dims, self.cfg.rope_theta
        )
        return cos[:, :, None, :], sin[:, :, None, :]

    def pack_latents(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B,C,T,H,W] → [B, T·(H/p)·(W/p), C·p²] video tokens."""
        p = self.cfg.patch_size
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t, h // p, p, w // p, p)
        return x.transpose(0, 2, 3, 5, 1, 4, 6).reshape(b, t * (h // p) * (w // p), c * p * p)

    def unpack_latents(self, tokens: jnp.ndarray, t: int, h: int, w: int) -> jnp.ndarray:
        p = self.cfg.patch_size
        b, n, d = tokens.shape
        c = d // (p * p)
        x = tokens.reshape(b, t, h // p, w // p, c, p, p)
        return x.transpose(0, 4, 1, 2, 5, 3, 6).reshape(b, c, t, h, w)

    def __call__(
        self,
        hidden_states: jnp.ndarray,          # [B, C, T, H, W] latent video
        timestep: jnp.ndarray,               # [B]
        encoder_hidden_states: jnp.ndarray,  # [B, N_txt, text_embed_dim]
    ) -> jnp.ndarray:
        b, c, t, h, w = hidden_states.shape
        p = self.cfg.patch_size

        temb = self.time_embed(timestep.astype(jnp.float32))
        vid = self.patch_embed_proj(self.pack_latents(hidden_states).astype(self.dtype))
        txt = self.text_proj(encoder_hidden_states.astype(self.dtype))
        cos, sin = self.rope_tables(t, h // p, w // p)

        for blk in self.transformer_blocks:
            vid, txt = blk(vid, txt, temb, cos, sin)

        seq = self.norm_final(jnp.concatenate([txt, vid], axis=1))
        vid = seq[:, txt.shape[1]:]
        # diffusers AdaLayerNorm chunk order is (shift, scale)
        shift, scale = jnp.split(
            self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1
        )
        vid = layer_norm(vid, eps=1e-5) * (1 + scale) + shift
        return self.unpack_latents(self.proj_out(vid), t, h, w)
