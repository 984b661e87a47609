"""Wan MultiTalk (multi-person audio-driven i2v) DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/wan/multitalk/model.py:982`` (WanMultiTalkTransformer3DModel):
the Wan i2v backbone (CLIP image tokens prepended to the text context) plus,
after every cross-attention, a **per-frame audio cross-attention**
(model.py:216 SingleStreamAttention) whose keys/values come from 32 projected
audio context tokens per latent frame (model.py:493 AudioProjModel — windowed
wav2vec features for the first frame and the 4-pixel-frame groups behind each
later latent frame).

Multi-speaker routing (L-RoPE, model.py:355 SingleStreamMutiAttention): each
self-attention also measures how strongly every visual token attends into the
masked reference-image regions of each speaker (attention.py:123
get_attn_map_with_target); those per-speaker maps place 1-D rotary positions
on the audio queries — tokens won by speaker 1 rotate into [0, 4), speaker 2
into [20, 24), background to 12 — while each speaker's audio keys sit at
their band's center, so speakers only hear their own audio.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
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
class WanMultiTalkConfig:
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 40
    attention_head_dim: int = 128
    in_channels: int = 36
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    ffn_dim: int = 13824
    num_layers: int = 40
    cross_attn_norm: bool = True
    eps: float = 1e-6
    image_dim: Optional[int] = 1280
    added_kv_proj_dim: Optional[int] = 1280
    # audio conditioning
    audio_window: int = 5
    vae_scale: int = 4
    audio_blocks: int = 12           # wav2vec hidden layers consumed
    audio_channels: int = 768
    intermediate_dim: int = 512
    audio_output_dim: int = 768
    context_tokens: int = 32
    norm_output_audio: bool = True
    norm_input_visual: bool = True
    class_range: int = 24
    class_interval: int = 4

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def rope_axes_dims(self) -> Tuple[int, int, int]:
        d = self.attention_head_dim
        h = w = 2 * (d // 6)
        return (d - 2 * h, h, w)

    @classmethod
    def from_dict(cls, cfg: dict) -> "WanMultiTalkConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "patch_size" in kw:
            kw["patch_size"] = tuple(kw["patch_size"])
        return cls(**kw)


class AudioProjModel(nnx.Module):
    """Windowed wav2vec features → 32 context tokens per latent frame
    (model.py:493)."""

    def __init__(self, cfg: WanMultiTalkConfig, *, rngs: nnx.Rngs):
        mid = cfg.audio_window // 2
        seq_len_vf = (mid + 1) + (cfg.vae_scale - 2) + (cfg.audio_window - mid)
        in1 = cfg.audio_window * cfg.audio_blocks * cfg.audio_channels
        in1_vf = seq_len_vf * cfg.audio_blocks * cfg.audio_channels
        kw = dict(use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32,
                  rngs=rngs)
        self.proj1 = Linear(in1, cfg.intermediate_dim, **kw)
        self.proj1_vf = Linear(in1_vf, cfg.intermediate_dim, **kw)
        self.proj2 = Linear(cfg.intermediate_dim, cfg.intermediate_dim, **kw)
        self.proj3 = Linear(cfg.intermediate_dim,
                            cfg.context_tokens * cfg.audio_output_dim, **kw)
        self.norm = (LayerNorm(cfg.audio_output_dim, eps=1e-5, rngs=rngs)
                     if cfg.norm_output_audio else None)
        self.cfg = cfg

    def __call__(self, first, latter_windows):
        """first [B, 1, W, blocks, C]; latter [B, F-1, W_vf, blocks, C] →
        [B, F, context_tokens, out_dim]."""
        cfg = self.cfg
        b = first.shape[0]
        x1 = nnx.relu(self.proj1(first.reshape(b, 1, -1)))
        xf = nnx.relu(self.proj1_vf(
            latter_windows.reshape(b, latter_windows.shape[1], -1)))
        x = jnp.concatenate([x1, xf], axis=1)
        x = nnx.relu(self.proj2(x))
        tok = self.proj3(x).reshape(b, x.shape[1], cfg.context_tokens,
                                    cfg.audio_output_dim)
        if self.norm is not None:
            tok = self.norm(tok)
        return tok


def rope_1d_pairs(x, positions, head_dim):
    """Interleaved-pair 1-D rope at data-dependent float positions
    (model.py:303 RotaryPositionalEmbedding1D)."""
    inv = 1.0 / (10000.0 ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                             / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv  # [..., S, D/2]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    # x: [B, S, H, D]; positions: [S] or [B, S] — insert the head axis
    cos, sin = cos[..., None, :], sin[..., None, :]
    return apply_rope(x, cos, sin)


def ref_attn_maps(q, k_ref, masks):
    """Per-class probability mass of each visual token's attention on the
    masked first-frame regions (attention.py:12). q [B, M, H, D];
    k_ref [B, R, H, D]; masks [C, R] → [C, M]."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3) * scale  # [B,H,M,D]
    kf = k_ref.astype(jnp.float32).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(qf @ kf.transpose(0, 1, 3, 2), axis=-1)  # [B,H,M,R]
    m = masks.astype(jnp.float32)
    counts = jnp.maximum(m.sum(-1), 1.0)
    per_class = jnp.einsum("bhmr,cr->cbhm", attn, m) / counts[:, None, None, None]
    return per_class.mean(axis=2)[:, 0]  # mean over heads, B=1 → [C, M]


class MultiTalkBlock(nnx.Module):
    def __init__(self, cfg: WanMultiTalkConfig, *, dtype, param_dtype,
                 rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        # self attention
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.to_out = Linear(d, d, **kw)
        self.norm_q = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.norm_k = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        # text/image cross attention
        self.c_to_q = Linear(d, d, **kw)
        self.c_to_k = Linear(d, d, **kw)
        self.c_to_v = Linear(d, d, **kw)
        self.c_to_out = Linear(d, d, **kw)
        self.c_norm_q = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        self.c_norm_k = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        if cfg.added_kv_proj_dim is not None:
            self.add_k_proj = Linear(cfg.added_kv_proj_dim, d, **kw)
            self.add_v_proj = Linear(cfg.added_kv_proj_dim, d, **kw)
            self.norm_added_k = RMSNorm(d, eps=cfg.eps, rngs=rngs)
        else:
            self.add_k_proj = self.add_v_proj = self.norm_added_k = None
        self.norm2_weight = (nnx.Param(jnp.ones((d,), jnp.float32))
                             if cfg.cross_attn_norm else None)
        self.norm2_bias = (nnx.Param(jnp.zeros((d,), jnp.float32))
                           if cfg.cross_attn_norm else None)
        # audio cross attention (per frame)
        self.a_q_linear = Linear(d, d, **kw)
        self.a_kv_linear = Linear(cfg.audio_output_dim, 2 * d, **kw)
        self.a_proj = Linear(d, d, **kw)
        self.norm_x_weight = (nnx.Param(jnp.ones((d,), jnp.float32))
                              if cfg.norm_input_visual else None)
        self.norm_x_bias = (nnx.Param(jnp.zeros((d,), jnp.float32))
                            if cfg.norm_input_visual else None)
        self.ffn = GELUMLP(d, cfg.ffn_dim, approximate=True, **kw)
        self.scale_shift_table = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 6, d), jnp.float32))
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim
        self.cfg = cfg

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.heads, self.head_dim)

    def _audio_attn(self, x, audio_tokens, shape, x_ref_map, human_num):
        cfg = self.cfg
        n_t, n_h, n_w = shape
        b, n, c = x.shape
        s = n_h * n_w
        xf = x.reshape(b * n_t, s, c)
        q = self._heads(self.a_q_linear(xf).reshape(b * n_t, s, c))
        # audio_tokens: [B, F, n_tok, C_a] → per-frame kv batch
        n_tok = audio_tokens.shape[2]
        kv = self.a_kv_linear(audio_tokens.reshape(b * n_t, n_tok, -1)
                              .astype(x.dtype))
        kv = kv.reshape(b * n_t, n_tok, 2, self.heads, self.head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]
        if human_num > 1 and x_ref_map is not None:
            # L-RoPE routing (model.py:396)
            def band(m, lo, hi):
                mn, mx = m.min(), m.max()
                return (m - mn) / (mx - mn + 1e-8) * (hi - lo) + lo

            h1 = band(x_ref_map[0], 0.0, cfg.class_interval)
            h2 = band(x_ref_map[1], cfg.class_range - cfg.class_interval,
                      cfg.class_range)
            back = jnp.full_like(h1, cfg.class_range // 2)
            winner = jnp.argmax(x_ref_map[:2], axis=0)
            pos = jnp.where(winner == 0, h1, h2)
            if x_ref_map.shape[0] > 2:
                is_back = jnp.argmax(x_ref_map, axis=0) == 2
                pos = jnp.where(is_back, back, pos)
            q_full = q.reshape(b, n_t * s, self.heads, self.head_dim)
            q_full = rope_1d_pairs(q_full, pos, self.head_dim)
            q = q_full.reshape(b * n_t, s, self.heads, self.head_dim)
            per = n_tok // 2
            k_pos = jnp.concatenate([
                jnp.full((per,), (0.0 + cfg.class_interval) / 2.0),
                jnp.full((n_tok - per,),
                         (2 * cfg.class_range - cfg.class_interval) / 2.0)])
            k = rope_1d_pairs(k, k_pos, self.head_dim)
        out = attention_op(q, k, v).reshape(b * n_t, s, c)
        return self.a_proj(out).reshape(b, n, c)

    def __call__(self, x, context, context_image, temb6, rope_cos, rope_sin,
                 audio_tokens, shape, ref_masks, human_num):
        mods = (self.scale_shift_table.value + temb6).astype(x.dtype)
        sh, sc, g = mods[:, 0:1], mods[:, 1:2], mods[:, 2:3]
        csh, csc, cg = mods[:, 3:4], mods[:, 4:5], mods[:, 5:6]

        n_t, n_h, n_w = shape
        norm_x = layer_norm(x, eps=self.cfg.eps) * (1 + sc) + sh
        q = apply_rope(self._heads(self.norm_q(self.to_q(norm_x))),
                       rope_cos, rope_sin)
        k = apply_rope(self._heads(self.norm_k(self.to_k(norm_x))),
                       rope_cos, rope_sin)
        v = self._heads(self.to_v(norm_x))
        b, n, c = x.shape
        attn = attention_op(q, k, v).reshape(b, n, c)
        x_ref_map = None
        if human_num > 1 and ref_masks is not None:
            x_ref_map = ref_attn_maps(
                q.reshape(b, n, self.heads, self.head_dim),
                k[:, :n_h * n_w].reshape(b, n_h * n_w, self.heads, self.head_dim),
                ref_masks)
        x = x + self.to_out(attn) * g

        if self.norm2_weight is not None:
            norm_x = layer_norm(x, self.norm2_weight.value,
                                self.norm2_bias.value, self.cfg.eps)
        else:
            norm_x = x
        qc = self._heads(self.c_norm_q(self.c_to_q(norm_x)))
        kc = self._heads(self.c_norm_k(self.c_to_k(context)))
        vc = self._heads(self.c_to_v(context))
        cross = attention_op(qc, kc, vc)
        if context_image is not None and self.add_k_proj is not None:
            ki = self._heads(self.norm_added_k(self.add_k_proj(context_image)))
            vi = self._heads(self.add_v_proj(context_image))
            cross = cross + attention_op(qc, ki, vi)
        x = x + self.c_to_out(cross.reshape(b, n, c))

        if self.norm_x_weight is not None:
            norm_x = layer_norm(x, self.norm_x_weight.value,
                                self.norm_x_bias.value, self.cfg.eps)
        else:
            norm_x = x
        x = x + self._audio_attn(norm_x, audio_tokens, shape, x_ref_map,
                                 human_num)

        norm_x = layer_norm(x, eps=self.cfg.eps) * (1 + csc) + csh
        return x + self.ffn(norm_x) * cg


@transformer_registry.register(
    "wan.multitalk", aliases=("WanMultiTalkTransformer3DModel", "wan_multitalk")
)
class WanMultiTalkTransformer3DModel(nnx.Module):
    config_class = WanMultiTalkConfig

    @staticmethod
    def sharding_rules(cfg: "WanMultiTalkConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|c_to_q|c_to_k|c_to_v|add_k_proj|add_v_proj|a_q_linear|a_kv_linear)\.kernel",
                 P(None, "tp")),
                (r"(to_out|c_to_out|a_proj)\.kernel", P("tp", None)),
                (r"ffn\.fc1\.kernel", P(None, "tp")),
                (r"ffn\.fc2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    def __init__(self, cfg: WanMultiTalkConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch_dim = cfg.in_channels * int(np.prod(cfg.patch_size))
        self.patch_embedding = Linear(patch_dim, d, **kw)
        self.time_embedder_linear_1 = Linear(cfg.freq_dim, d, **kw)
        self.time_embedder_linear_2 = Linear(d, d, **kw)
        self.time_proj = Linear(d, 6 * d, **kw)
        self.text_embedder_linear_1 = Linear(cfg.text_dim, d, **kw)
        self.text_embedder_linear_2 = Linear(d, d, **kw)
        if cfg.image_dim is not None:
            self.img_norm1 = nnx.Param(jnp.ones((cfg.image_dim,), jnp.float32))
            self.img_norm1_bias = nnx.Param(jnp.zeros((cfg.image_dim,), jnp.float32))
            self.img_ff1 = Linear(cfg.image_dim, cfg.image_dim, **kw)
            self.img_ff2 = Linear(cfg.image_dim, d, **kw)
            self.img_norm2 = nnx.Param(jnp.ones((d,), jnp.float32))
            self.img_norm2_bias = nnx.Param(jnp.zeros((d,), jnp.float32))
        self.audio_proj = AudioProjModel(cfg, rngs=rngs)
        self.blocks = nnx.List(
            [MultiTalkBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)])
        self.norm_out_scale_shift = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 2, d), jnp.float32))
        self.proj_out = Linear(d, cfg.out_channels * int(np.prod(cfg.patch_size)),
                               **kw)

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

    def windowed_audio(self, audio_cond: jnp.ndarray):
        """[H?, F_pix, W, blocks, C] per-speaker windows → first / latter
        splits the AudioProjModel expects (model.py:1310)."""
        cfg = self.cfg
        mid = cfg.audio_window // 2
        first = audio_cond[:, :1]
        latter = audio_cond[:, 1:]
        h, f_rest, w, bl, c = latter.shape
        groups = latter.reshape(h, f_rest // cfg.vae_scale, cfg.vae_scale, w, bl, c)
        first_g = groups[:, :, :1, :mid + 1].reshape(h, groups.shape[1], -1, bl, c)
        mid_g = groups[:, :, 1:-1, mid:mid + 1].reshape(h, groups.shape[1], -1, bl, c)
        last_g = groups[:, :, -1:, mid:].reshape(h, groups.shape[1], -1, bl, c)
        latter_w = jnp.concatenate([first_g, mid_g, last_g], axis=2)
        return first, latter_w

    def __call__(
        self,
        x: jnp.ndarray,                      # [B, C_in, T, H, W] (noise‖cond)
        t: jnp.ndarray,                      # [B]
        text: jnp.ndarray,                   # [B, L, text_dim]
        image_embeds: Optional[jnp.ndarray],  # [B, L_img, image_dim]
        audio_cond: jnp.ndarray,             # [humans, F_pix, W, blocks, C_a]
        ref_target_masks: Optional[jnp.ndarray] = None,  # [C, n_h·n_w]
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, _, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size
        n_t, n_h, n_w = tt // pt, hh // ph, ww // pw
        human_num = int(audio_cond.shape[0])

        t_freq = timestep_embedding(t.astype(jnp.float32), cfg.freq_dim,
                                    flip_sin_to_cos=True)
        temb = self.time_embedder_linear_2(nnx.silu(
            self.time_embedder_linear_1(t_freq.astype(self.dtype))))
        temb6 = self.time_proj(nnx.silu(temb)).reshape(b, 6, cfg.dim)
        ctx = self.text_embedder_linear_2(nnx.gelu(
            self.text_embedder_linear_1(text.astype(self.dtype)),
            approximate=True))
        ctx_img = None
        if image_embeds is not None and cfg.image_dim is not None:
            y = layer_norm(image_embeds.astype(self.dtype),
                           self.img_norm1.value, self.img_norm1_bias.value, 1e-5)
            y = self.img_ff2(nnx.gelu(self.img_ff1(y), approximate=False))
            ctx_img = layer_norm(y, self.img_norm2.value,
                                 self.img_norm2_bias.value, 1e-5)

        # audio tokens per latent frame, speakers concatenated on tokens
        first, latter = self.windowed_audio(audio_cond)
        tok = self.audio_proj(first, latter)  # [humans, F_lat, 32, C_a]
        tok = jnp.concatenate(jnp.split(tok, human_num, axis=0), axis=2)

        tokens = self.patch_embedding(self._patchify(x).astype(self.dtype))
        rope_cos, rope_sin = self.rope_tables(n_t, n_h, n_w)

        for blk in self.blocks:
            tokens = blk(tokens, ctx, ctx_img, temb6, rope_cos, rope_sin,
                         tok, (n_t, n_h, n_w), ref_target_masks, human_num)

        shift, scale = jnp.split(
            self.norm_out_scale_shift.value + temb.astype(jnp.float32)[:, None, :],
            2, axis=1)
        out = layer_norm(tokens, eps=cfg.eps) * (1 + scale.astype(tokens.dtype)) \
            + shift.astype(tokens.dtype)
        out = self.proj_out(out)
        out = out.reshape(b, n_t, n_h, n_w, cfg.out_channels, pt, ph, pw)
        out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return out.reshape(b, cfg.out_channels, tt, hh, ww)
