"""Wan HuMo (human-centric audio+text+image video) DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/wan/humo/model.py:1101`` (HumoWanTransformerModel): the Wan
t2v backbone whose every block gains a **per-frame audio cross-attention**
between the text cross-attention and the FFN (model.py:803
AudioCrossAttentionWrapper / WanT2VCrossAttentionGather): each latent frame's
video tokens attend only to that frame's 16 projected audio context tokens.
Audio tokens come from a 3-linear **AudioProjModel** (model.py:137) over
windowed wav2vec layer stacks. Reference-image conditioning rides the
i2v-style channel concat (4-ch mask flagging the reference frames appended
at the *end* of the latent sequence + 16-ch latents; engine humo.py:571).
"""

from __future__ import annotations

import dataclasses
import math
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
class WanHuMoConfig:
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    in_dim: int = 36                    # 16 noise + 4 mask + 16 cond latents
    dim: int = 5120
    ffn_dim: int = 13824
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 40
    num_layers: int = 40
    cross_attn_norm: bool = True
    eps: float = 1e-6
    insert_audio: bool = True
    audio_token_num: int = 16
    audio_kv_dim: int = 1536
    # AudioProjModel (model.py:137)
    audio_window: int = 8               # rows per latent-frame window
    audio_blocks: int = 13              # wav2vec hidden states stacked
    audio_channels: int = 768
    audio_intermediate_dim: int = 512

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def rope_axes_dims(self) -> Tuple[int, int, int]:
        d = self.head_dim
        h = w = 2 * (d // 6)
        return (d - 2 * h, h, w)

    @classmethod
    def from_dict(cls, cfg: dict) -> "WanHuMoConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "patch_size" in kw:
            kw["patch_size"] = tuple(kw["patch_size"])
        return cls(**kw)


class HuMoAudioProj(nnx.Module):
    """Windowed wav2vec stacks → 16 audio context tokens per latent frame
    (model.py:137 AudioProjModel)."""

    def __init__(self, cfg: WanHuMoConfig, *, rngs: nnx.Rngs):
        in_dim = cfg.audio_window * cfg.audio_blocks * cfg.audio_channels
        kw = dict(use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32,
                  rngs=rngs)
        self.glob_1 = Linear(in_dim, cfg.audio_intermediate_dim, **kw)
        self.glob_2 = Linear(cfg.audio_intermediate_dim,
                             cfg.audio_intermediate_dim, **kw)
        self.glob_3 = Linear(cfg.audio_intermediate_dim,
                             cfg.audio_token_num * cfg.audio_kv_dim, **kw)
        self.glob_norm = LayerNorm(cfg.audio_kv_dim, eps=1e-5, rngs=rngs)
        self.cfg = cfg

    def __call__(self, windows):  # [B, F, W, blocks, C]
        b, f = windows.shape[:2]
        x = windows.reshape(b * f, -1).astype(jnp.float32)
        x = nnx.relu(self.glob_1(x))
        x = nnx.relu(self.glob_2(x))
        tok = self.glob_3(x).reshape(b, f, self.cfg.audio_token_num,
                                     self.cfg.audio_kv_dim)
        return self.glob_norm(tok)


class HuMoBlock(nnx.Module):
    def __init__(self, cfg: WanHuMoConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.to_o = Linear(d, d, **kw)
        self.norm_q = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.norm_k = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.c_to_q = Linear(d, d, **kw)
        self.c_to_k = Linear(d, d, **kw)
        self.c_to_v = Linear(d, d, **kw)
        self.c_to_o = Linear(d, d, **kw)
        self.c_norm_q = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.c_norm_k = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.norm3_weight = (nnx.Param(jnp.ones((d,), jnp.float32))
                             if cfg.cross_attn_norm else None)
        self.norm3_bias = (nnx.Param(jnp.zeros((d,), jnp.float32))
                           if cfg.cross_attn_norm else None)
        if cfg.insert_audio:
            self.a_to_q = Linear(d, d, **kw)
            self.a_to_k = Linear(cfg.audio_kv_dim, d, **kw)
            self.a_to_v = Linear(cfg.audio_kv_dim, d, **kw)
            self.a_to_o = Linear(d, d, **kw)
            self.a_norm_q = RMSNorm(d, eps=cfg.eps, rngs=rngs)
            self.a_norm_k = RMSNorm(d, eps=cfg.eps, rngs=rngs)
            self.norm1_audio_weight = nnx.Param(jnp.ones((d,), jnp.float32))
            self.norm1_audio_bias = nnx.Param(jnp.zeros((d,), jnp.float32))
        else:
            self.a_to_q = None
        self.ffn = GELUMLP(d, cfg.ffn_dim, approximate=True, **kw)
        self.modulation = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 6, d), jnp.float32))
        self.heads = cfg.num_heads
        self.head_dim = cfg.head_dim
        self.eps = cfg.eps

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    def _audio_attn(self, x, audio_tokens, n_frames):
        # x [B, S, C] (S = n_frames · HW); audio_tokens [B, F_a, 16, kv_dim]
        b, s, c = x.shape
        hw = s // n_frames
        xq = layer_norm(x, self.norm1_audio_weight.value,
                        self.norm1_audio_bias.value, self.eps)
        q = self.a_norm_q(self.a_to_q(xq))
        q = q.reshape(b * n_frames, hw, self.heads, self.head_dim)
        n_tok = audio_tokens.shape[2]
        f_a = audio_tokens.shape[1]
        a = audio_tokens.reshape(b * f_a, n_tok, -1).astype(x.dtype)
        k = self.a_norm_k(self.a_to_k(a)).reshape(b * f_a, n_tok, self.heads,
                                                  self.head_dim)
        v = self.a_to_v(a).reshape(b * f_a, n_tok, self.heads, self.head_dim)
        n = min(q.shape[0], k.shape[0])  # truncate mismatch (model.py:787)
        out = attention_op(q[:n], k[:n], v[:n]).reshape(b, -1, c)
        if out.shape[1] < s:  # audio shorter than video: zero-fill the tail
            out = jnp.concatenate(
                [out, jnp.zeros((b, s - out.shape[1], c), out.dtype)], axis=1)
        return self.a_to_o(out)

    def __call__(self, x, e6, context, audio_tokens, n_frames, rope_cos,
                 rope_sin):
        mods = (self.modulation.value + e6).astype(jnp.float32)
        sh, sc, g = mods[:, 0:1], mods[:, 1:2], mods[:, 2:3]
        fsh, fsc, fg = mods[:, 3:4], mods[:, 4:5], mods[:, 5:6]
        b, s, c = x.shape

        norm_x = (layer_norm(x.astype(jnp.float32), eps=self.eps) * (1 + sc)
                  + sh).astype(x.dtype)
        q = apply_rope(self._heads(self.norm_q(self.to_q(norm_x))),
                       rope_cos, rope_sin)
        k = apply_rope(self._heads(self.norm_k(self.to_k(norm_x))),
                       rope_cos, rope_sin)
        v = self._heads(self.to_v(norm_x))
        attn = self.to_o(attention_op(q, k, v).reshape(b, s, c))
        x = (x.astype(jnp.float32) + attn.astype(jnp.float32) * g).astype(x.dtype)

        if self.norm3_weight is not None:
            norm_x = layer_norm(x, self.norm3_weight.value,
                                self.norm3_bias.value, self.eps)
        else:
            norm_x = x
        qc = self._heads(self.c_norm_q(self.c_to_q(norm_x)))
        kc = self._heads(self.c_norm_k(self.c_to_k(context)))
        vc = self._heads(self.c_to_v(context))
        x = x + self.c_to_o(attention_op(qc, kc, vc).reshape(b, s, c))

        if self.a_to_q is not None and audio_tokens is not None:
            x = x + self._audio_attn(x, audio_tokens, n_frames)

        norm_x = (layer_norm(x.astype(jnp.float32), eps=self.eps) * (1 + fsc)
                  + fsh).astype(x.dtype)
        return (x.astype(jnp.float32)
                + self.ffn(norm_x).astype(jnp.float32) * fg).astype(x.dtype)


@transformer_registry.register(
    "wan.humo", aliases=("HumoWanTransformerModel", "wan_humo")
)
class HumoWanTransformerModel(nnx.Module):
    config_class = WanHuMoConfig

    @staticmethod
    def sharding_rules(cfg: "WanHuMoConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|c_to_q|c_to_k|c_to_v|a_to_q|a_to_k|a_to_v)\.kernel",
                 P(None, "tp")),
                (r"(to_o|c_to_o|a_to_o)\.kernel", P("tp", None)),
                (r"ffn\.fc1\.kernel", P(None, "tp")),
                (r"ffn\.fc2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    def __init__(self, cfg: WanHuMoConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch = int(np.prod(cfg.patch_size))
        self.patch_embedding = Linear(cfg.in_dim * patch, d, **kw)
        self.text_embedding_1 = Linear(cfg.text_dim, d, **kw)
        self.text_embedding_2 = Linear(d, d, **kw)
        self.time_embedding_1 = Linear(cfg.freq_dim, d, **kw)
        self.time_embedding_2 = Linear(d, d, **kw)
        self.time_projection = Linear(d, 6 * d, **kw)
        self.audio_proj = (HuMoAudioProj(cfg, rngs=rngs)
                           if cfg.insert_audio else None)
        self.blocks = nnx.List(
            [HuMoBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)])
        self.head_norm_mod = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 2, d), jnp.float32))
        self.head = Linear(d, cfg.out_dim * patch, **kw)

    def _patchify(self, x):
        b, c, t, h, w = x.shape
        pt, ph, pw = self.cfg.patch_size
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // ph) * (w // pw), -1)

    def rope_tables(self, t_tok, h_tok, w_tok):
        ids = np.stack(np.meshgrid(np.arange(t_tok), np.arange(h_tok),
                                   np.arange(w_tok), indexing="ij"),
                       axis=-1).reshape(1, -1, 3)
        cos, sin = precompute_axial_freqs(ids, self.cfg.rope_axes_dims, 10000.0)
        return cos[:, :, None, :], sin[:, :, None, :]

    def __call__(
        self,
        x: jnp.ndarray,                  # [B, 16, T, H, W] noisy latents
        t: jnp.ndarray,                  # [B]
        context: jnp.ndarray,            # [B, L, text_dim]
        audio_windows: Optional[jnp.ndarray] = None,  # [B,F,W,blocks,C]
        y: Optional[jnp.ndarray] = None,  # [B, 20, T, H, W] mask+cond
    ) -> jnp.ndarray:
        cfg = self.cfg
        if y is not None:
            x = jnp.concatenate([x, y.astype(x.dtype)], axis=1)
        b, _, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size
        n_t, n_h, n_w = tt // pt, hh // ph, ww // pw

        freq = timestep_embedding(t.astype(jnp.float32), cfg.freq_dim,
                                  flip_sin_to_cos=True)
        e = self.time_embedding_2(nnx.silu(
            self.time_embedding_1(freq.astype(self.dtype)))).astype(jnp.float32)
        e6 = self.time_projection(nnx.silu(e.astype(self.dtype))).reshape(
            b, 6, cfg.dim).astype(jnp.float32)
        ctx = self.text_embedding_2(nnx.gelu(
            self.text_embedding_1(context.astype(self.dtype)), approximate=True))

        audio_tokens = None
        if self.audio_proj is not None and audio_windows is not None:
            audio_tokens = self.audio_proj(audio_windows)

        tokens = self.patch_embedding(self._patchify(x).astype(self.dtype))
        rope_cos, rope_sin = self.rope_tables(n_t, n_h, n_w)
        for blk in self.blocks:
            tokens = blk(tokens, e6, ctx, audio_tokens, n_t, rope_cos, rope_sin)

        mods = (self.head_norm_mod.value + e[:, None, :]).astype(jnp.float32)
        shift, scale = mods[:, 0:1], mods[:, 1:2]
        out = (layer_norm(tokens.astype(jnp.float32), eps=cfg.eps)
               * (1 + scale) + shift).astype(self.dtype)
        out = self.head(out)
        out = out.reshape(b, n_t, n_h, n_w, cfg.out_dim, pt, ph, pw)
        out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return out.reshape(b, cfg.out_dim, tt, hh, ww)
