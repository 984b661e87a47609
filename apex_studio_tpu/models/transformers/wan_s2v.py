"""Wan 2.2 S2V (speech-to-video) DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/wan/s2v/model.py:886`` (WanS2VTransformer3DModel): the Wan
backbone extended with
- a **CausalAudioEncoder** (model.py:217): SiLU-weighted sum over wav2vec
  layers, then a causal conv stack (stride 4 total) producing per-latent-frame
  audio tokens (4 + 1 learned padding) and a global AdaIN vector;
- **AudioInjector** (model.py:249): after selected blocks the noise-video
  tokens are reshaped per frame, AdaLN-conditioned on the global audio vector
  and cross-attend to that frame's audio tokens;
- a **reference image** at RoPE time 30 and **motion context** at negative
  times (model.py:552 WanS2VRotaryPosEmbed) appended to the sequence, tagged
  through a 3-way ``trainable_condition_mask`` embedding;
- optional **FramePackMotioner** (model.py:315): motion history zipped into
  [1, 2, 16]-frame buckets patchified at 1x/2x/4x;
- **zero-timestep** conditioning (model.py:1335): cond tokens are modulated
  with the t=0 AdaLN row while noise tokens use the sampled t.

All position tables are precomputed host-side from static shapes; negative
motion times fall out of the angle computation directly (cos even / sin odd
replaces the reference's conjugate trick, model.py:694).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, LayerNorm, Linear
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.wan import WanAttention
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class WanS2VConfig:
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 40
    attention_head_dim: int = 128
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    audio_dim: int = 1280
    num_wav2vec_layers: int = 25
    audio_inject_layers: Tuple[int, ...] = (0, 4, 8, 12, 16, 20, 24, 27)
    enable_adain: bool = True
    adain_mode: str = "attn_norm"
    pose_dim: Optional[int] = 16
    ffn_dim: int = 13824
    num_layers: int = 40
    cross_attn_norm: bool = True
    eps: float = 1e-6
    added_kv_proj_dim: Optional[int] = None
    enable_framepack: bool = False
    framepack_drop_mode: str = "padd"
    zero_timestep: bool = True
    num_audio_token: int = 4

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def rope_axes_dims(self) -> Tuple[int, int, int]:
        d = self.attention_head_dim
        h = w = 2 * (d // 6)
        return (d - 2 * h, h, w)

    @classmethod
    def from_dict(cls, cfg: dict) -> "WanS2VConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        for key in ("patch_size", "audio_inject_layers"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)


class CausalConv1d(nnx.Module):
    """Replicate-padded causal conv over [B, T, C] (model.py:112)."""

    def __init__(self, cin, cout, kernel=3, stride=1, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel_w = nnx.Param(
            init(rngs.params(), (kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.k, self.stride = kernel, stride

    def __call__(self, x):
        pad = jnp.repeat(x[:, :1], self.k - 1, axis=1)
        x = jnp.concatenate([pad, x], axis=1)
        y = jax.lax.conv_general_dilated(
            x, self.kernel_w.value, window_strides=(self.stride,),
            padding=((0, 0),), dimension_numbers=("NHC", "HIO", "NHC"))
        return y + self.bias.value


class MotionEncoder(nnx.Module):
    """Causal conv stack over time (stride 4) → per-frame token stacks
    (model.py:137 MotionEncoder_tc)."""

    def __init__(self, in_dim: int, hidden_dim: int, num_heads: int,
                 need_global: bool, *, rngs: nnx.Rngs):
        self.num_heads = num_heads
        self.need_global = need_global
        self.conv1_local = CausalConv1d(in_dim, hidden_dim // 4 * num_heads,
                                        3, rngs=rngs)
        if need_global:
            self.conv1_global = CausalConv1d(in_dim, hidden_dim // 4, 3, rngs=rngs)
            self.final_linear = Linear(hidden_dim, hidden_dim, use_bias=True,
                                       dtype=jnp.float32,
                                       param_dtype=jnp.float32, rngs=rngs)
        self.conv2 = CausalConv1d(hidden_dim // 4, hidden_dim // 2, 3, stride=2,
                                  rngs=rngs)
        self.conv3 = CausalConv1d(hidden_dim // 2, hidden_dim, 3, stride=2,
                                  rngs=rngs)
        self.padding_tokens = nnx.Param(
            jnp.zeros((1, 1, 1, hidden_dim), jnp.float32))

    def _trunk(self, x):
        # x: [B*, T, hidden/4] → norms are affine-free layernorms
        x = nnx.silu(layer_norm(x, eps=1e-6))
        x = self.conv2(x)
        x = nnx.silu(layer_norm(x, eps=1e-6))
        x = self.conv3(x)
        return nnx.silu(layer_norm(x, eps=1e-6))

    def __call__(self, x):  # [B, T, C_in]
        b = x.shape[0]
        local = self.conv1_local(x)  # [B, T, heads·h/4]
        t = local.shape[1]
        local = local.reshape(b, t, self.num_heads, -1)
        local = local.transpose(0, 2, 1, 3).reshape(b * self.num_heads, t, -1)
        local = self._trunk(local)  # [B·heads, T/4, hidden]
        f = local.shape[1]
        local = local.reshape(b, self.num_heads, f, -1).transpose(0, 2, 1, 3)
        pad = jnp.broadcast_to(self.padding_tokens.value,
                               (b, f, 1, local.shape[-1]))
        x_local = jnp.concatenate([local, pad], axis=2)  # [B, F, heads+1, C]
        if not self.need_global:
            return None, x_local
        g = self._trunk(self.conv1_global(x))
        g = self.final_linear(g)  # [B, F, hidden]
        return g, x_local


class CausalAudioEncoder(nnx.Module):
    def __init__(self, cfg: WanS2VConfig, *, rngs: nnx.Rngs):
        self.weights = nnx.Param(
            jnp.full((1, cfg.num_wav2vec_layers, 1, 1), 0.01, jnp.float32))
        self.encoder = MotionEncoder(cfg.audio_dim, cfg.dim,
                                     cfg.num_audio_token,
                                     need_global=cfg.enable_adain, rngs=rngs)

    def __call__(self, features):  # [B, L, C, T]
        w = nnx.silu(self.weights.value)
        feat = (features.astype(jnp.float32) * w / w.sum(axis=1, keepdims=True)
                ).sum(axis=1)  # [B, C, T]
        return self.encoder(feat.transpose(0, 2, 1))


class AudioInjectorLayer(nnx.Module):
    def __init__(self, cfg: WanS2VConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.attn = WanAttention(cfg, cross=True, dtype=dtype,
                                 param_dtype=param_dtype, rngs=rngs)
        d = cfg.dim
        if cfg.enable_adain:
            self.adain_linear = Linear(d, 2 * d, use_bias=True, dtype=jnp.float32,
                                       param_dtype=jnp.float32, rngs=rngs)
        else:
            self.adain_linear = None

    def __call__(self, frame_tokens, audio_tokens, global_vec):
        # frame_tokens [B·F, HW, C]; audio_tokens [B·F, n, C]; global [B·F, C]
        if self.adain_linear is not None and global_vec is not None:
            sh_sc = self.adain_linear(nnx.silu(global_vec.astype(jnp.float32)))
            shift, scale = jnp.split(sh_sc[:, None, :], 2, axis=-1)
            normed = layer_norm(frame_tokens, eps=1e-5) * (1 + scale) + shift
        else:
            normed = layer_norm(frame_tokens, eps=1e-6)
        return self.attn(normed.astype(frame_tokens.dtype), context=audio_tokens)


class WanS2VBlock(nnx.Module):
    """Wan block with two-segment modulation: noise tokens use the sampled-t
    AdaLN row, conditioning tokens the t=0 row (model.py:797)."""

    def __init__(self, cfg: WanS2VConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.attn1 = WanAttention(cfg, cross=False, **kw)
        self.attn2 = WanAttention(cfg, cross=True, **kw)
        self.norm2_weight = (nnx.Param(jnp.ones((d,), jnp.float32))
                             if cfg.cross_attn_norm else None)
        self.norm2_bias = (nnx.Param(jnp.zeros((d,), jnp.float32))
                           if cfg.cross_attn_norm else None)
        self.ffn = GELUMLP(d, cfg.ffn_dim, approximate=True, **kw)
        self.scale_shift_table = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 6, d), jnp.float32))
        self.eps = cfg.eps

    def _seg(self, mods_t, mods_0, n_noise, n_total):
        sel = jnp.asarray((np.arange(n_total) < n_noise)[None, :, None])
        return tuple(jnp.where(sel, a, b) for a, b in zip(mods_t, mods_0))

    def __call__(self, x, context, temb6_t, temb6_0, n_noise, rope_cos, rope_sin):
        n = x.shape[1]

        def rows(t6):
            mods = (self.scale_shift_table.value + t6).astype(x.dtype)
            return tuple(mods[:, i:i + 1] for i in range(6))

        sh, sc, g, csh, csc, cg = self._seg(rows(temb6_t), rows(temb6_0), n_noise, n)
        norm_x = layer_norm(x, eps=self.eps) * (1 + sc) + sh
        x = x + self.attn1(norm_x, rope_cos=rope_cos, rope_sin=rope_sin) * g
        if self.norm2_weight is not None:
            norm_x = layer_norm(x, self.norm2_weight.value, self.norm2_bias.value,
                                self.eps)
        else:
            norm_x = x
        x = x + self.attn2(norm_x, context=context)
        norm_x = layer_norm(x, eps=self.eps) * (1 + csc) + csh
        return x + self.ffn(norm_x) * cg


class FramePackMotioner(nnx.Module):
    """Zip motion history into [1, 2, 16]-frame buckets patchified at
    1x/2x/4x (model.py:315)."""

    def __init__(self, cfg: WanS2VConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        z = cfg.in_channels
        self.proj = Linear(z * 1 * 2 * 2, d, **kw)
        self.proj_2x = Linear(z * 2 * 4 * 4, d, **kw)
        self.proj_4x = Linear(z * 4 * 8 * 8, d, **kw)
        self.buckets = (1, 2, 16)

    @staticmethod
    def _patch(x, pt, ph, pw):
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, (t // pt) * (h // ph) * (w // pw), -1)

    def __call__(self, motion_latents):
        """[B, C, T_m, h, w] → (tokens [B, N, d], grid specs for rope)."""
        b, c, t_m, h, w = motion_latents.shape
        total = sum(self.buckets)
        pad = jnp.zeros((b, c, total, h, w), motion_latents.dtype)
        overlap = min(total, t_m)
        pad = pad.at[:, :, -overlap:].set(motion_latents[:, :, -overlap:])
        post, two_x, four_x = (pad[:, :, -1:], pad[:, :, -3:-1], pad[:, :, :16])
        tok = [self.proj(self._patch(post, 1, 2, 2)),
               self.proj_2x(self._patch(two_x, 2, 4, 4)),
               self.proj_4x(self._patch(four_x, 4, 8, 8))]
        grids = [
            (np.linspace(-1, -1, 1), np.arange(h // 2), np.arange(w // 2)),
            (np.linspace(-3, -3 + 1 - 1, 1), np.linspace(0, h // 2 - 1, h // 4),
             np.linspace(0, w // 2 - 1, w // 4)),
            (np.linspace(-19, -19 + 16 - 1, 4), np.linspace(0, h // 2 - 1, h // 8),
             np.linspace(0, w // 2 - 1, w // 8)),
        ]
        return jnp.concatenate(tok, axis=1), grids


def _grid_ids(t_pos, h_pos, w_pos) -> np.ndarray:
    tt, hh, ww = np.meshgrid(np.asarray(t_pos, np.float64),
                             np.asarray(h_pos, np.float64),
                             np.asarray(w_pos, np.float64), indexing="ij")
    return np.stack([tt, hh, ww], axis=-1).reshape(-1, 3)


@transformer_registry.register(
    "wan.s2v", aliases=("WanS2VTransformer3DModel", "wan_s2v")
)
class WanS2VTransformer3DModel(nnx.Module):
    config_class = WanS2VConfig

    @staticmethod
    def sharding_rules(cfg: "WanS2VConfig"):
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

    def __init__(self, cfg: WanS2VConfig, *, dtype=jnp.bfloat16,
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
        self.causal_audio_encoder = CausalAudioEncoder(cfg, rngs=rngs)
        if cfg.pose_dim is not None:
            self.pose_embedder = Linear(
                cfg.pose_dim * int(np.prod(cfg.patch_size)), d, **kw)
        else:
            self.pose_embedder = None
        self.trainable_condition_mask = nnx.Param(
            nnx.initializers.normal(0.02)(rngs.params(), (3, d), jnp.float32))
        self.blocks = nnx.List(
            [WanS2VBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)])
        inject = sorted(i for i in cfg.audio_inject_layers if i < cfg.num_layers)
        self.audio_inject_map = {layer: idx for idx, layer in enumerate(inject)}
        self.injector = nnx.List(
            [AudioInjectorLayer(cfg, dtype=dtype, param_dtype=param_dtype,
                                rngs=rngs) for _ in inject])
        if cfg.enable_framepack:
            self.frame_packer = FramePackMotioner(cfg, dtype=dtype,
                                                  param_dtype=param_dtype,
                                                  rngs=rngs)
        else:
            self.frame_packer = None
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

    def _temb(self, t):
        freq = timestep_embedding(t.astype(jnp.float32), self.cfg.freq_dim,
                                  flip_sin_to_cos=True)
        temb = self.time_embedder_linear_2(nnx.silu(
            self.time_embedder_linear_1(freq.astype(self.dtype))))
        proj = self.time_proj(nnx.silu(temb)).reshape(
            t.shape[0], 6, self.cfg.dim).astype(jnp.float32)
        return temb.astype(jnp.float32), proj

    def rope_tables(self, segments: Sequence[np.ndarray]):
        ids = np.concatenate(segments, axis=0)[None]
        cos, sin = precompute_axial_freqs(ids, self.cfg.rope_axes_dims, 10000.0)
        return cos[:, :, None, :], sin[:, :, None, :]

    def __call__(
        self,
        x: jnp.ndarray,                    # [B, C, T, H, W] noisy latents
        t: jnp.ndarray,                    # [B] timestep (0..1000)
        text: jnp.ndarray,                 # [B, L, text_dim]
        motion_latents: jnp.ndarray,       # [B, C, T_m, h, w]
        audio_embeds: jnp.ndarray,         # [B, L_w2v, C_a, T_a]
        image_latents: jnp.ndarray,        # [B, C, 1, h_i, w_i]
        pose_latents: Optional[jnp.ndarray] = None,  # [B, pose_dim, T, H, W]
        motion_frames: Tuple[int, int] = (17, 5),
        drop_motion_frames: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, _, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size
        n_t, n_h, n_w = tt // pt, hh // ph, ww // pw

        # conditioning embeddings
        temb_t, proj_t = self._temb(t)
        _, proj_0 = self._temb(jnp.zeros_like(t))
        if not cfg.zero_timestep:
            proj_0 = proj_t
        ctx = self.text_embedder_linear_2(nnx.gelu(
            self.text_embedder_linear_1(text.astype(self.dtype)), approximate=True))

        # audio: prepend motion_frames[0] copies of the first column
        # (model.py:1326), encode, drop the motion span
        first = jnp.repeat(audio_embeds[..., :1], motion_frames[0], axis=-1)
        audio_full = jnp.concatenate([first, audio_embeds], axis=-1)
        audio_global, audio_tokens = self.causal_audio_encoder(audio_full)
        audio_tokens = audio_tokens[:, motion_frames[1]:]
        if audio_global is not None:
            audio_global = audio_global[:, motion_frames[1]:]

        # token streams
        tokens = self.patch_embedding(self._patchify(x).astype(self.dtype))
        if self.pose_embedder is not None and pose_latents is not None:
            tokens = tokens + self.pose_embedder(
                self._patchify(pose_latents).astype(self.dtype))
        n_noise = tokens.shape[1]
        img_tok = self.patch_embedding(
            self._patchify(image_latents).astype(self.dtype))
        h_i, w_i = image_latents.shape[-2] // ph, image_latents.shape[-1] // pw

        segs = [
            _grid_ids(np.arange(n_t), np.arange(n_h), np.arange(n_w)),
            _grid_ids(np.asarray([30.0]), np.arange(h_i), np.arange(w_i)),
        ]
        parts = [tokens, img_tok]
        mask_ids = [np.zeros(n_noise, np.int64),
                    np.ones(img_tok.shape[1], np.int64)]

        if not drop_motion_frames and motion_latents.shape[2] > 0:
            if self.frame_packer is not None:
                mot_tok, grids = self.frame_packer(
                    motion_latents.astype(self.dtype))
                for g in grids:
                    segs.append(_grid_ids(*g))
            else:
                t_m = motion_latents.shape[2]
                mot_tok = self.patch_embedding(
                    self._patchify(motion_latents).astype(self.dtype))
                m_h = motion_latents.shape[-2] // ph
                m_w = motion_latents.shape[-1] // pw
                segs.append(_grid_ids(np.arange(-t_m, 0), np.arange(m_h),
                                      np.arange(m_w)))
            parts.append(mot_tok)
            mask_ids.append(np.full(mot_tok.shape[1], 2, np.int64))

        seq = jnp.concatenate(parts, axis=1)
        mask = jnp.asarray(np.concatenate(mask_ids))
        seq = seq + self.trainable_condition_mask.value[mask].astype(seq.dtype)
        rope_cos, rope_sin = self.rope_tables(segs)

        n_frames_audio = audio_tokens.shape[1]
        for i, blk in enumerate(self.blocks):
            seq = blk(seq, ctx, proj_t, proj_0, n_noise, rope_cos, rope_sin)
            if i in self.audio_inject_map:
                inj = self.injector[self.audio_inject_map[i]]
                vid = seq[:, :n_noise]
                per_frame = vid.reshape(b * n_frames_audio,
                                        n_noise // n_frames_audio, -1)
                a_tok = audio_tokens.reshape(
                    b * n_frames_audio, audio_tokens.shape[2], -1
                ).astype(seq.dtype)
                g_vec = (audio_global.reshape(b * n_frames_audio, -1)
                         if audio_global is not None else None)
                res = inj(per_frame, a_tok, g_vec)
                res = res.reshape(b, n_noise, -1)
                seq = jnp.concatenate([vid + res, seq[:, n_noise:]], axis=1)

        out = seq[:, :n_noise]
        shift, scale = jnp.split(
            (self.norm_out_scale_shift.value + temb_t[:, None, :]), 2, axis=1)
        out = layer_norm(out, eps=cfg.eps) * (1 + scale.astype(out.dtype)) \
            + shift.astype(out.dtype)
        out = self.proj_out(out)
        out = out.reshape(b, n_t, n_h, n_w, cfg.out_channels, pt, ph, pw)
        out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return out.reshape(b, cfg.out_channels, tt, hh, ww)
