"""Wan 2.2 Animate (character animation / replacement) DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/wan/animate/model.py:946`` (WanAnimateTransformer3DModel):
the Wan i2v backbone (CLIP reference-image tokens in cross-attention) plus
- a StyleGAN-style **motion encoder** (model.py:286): equalized-lr convs with
  fused leaky-ReLU and blur-pooled residual downsampling distill each face
  frame into a ``motion_dim`` code, re-expanded through the QR-orthonormalized
  synthesis basis (model.py:340);
- a causal **face encoder** (model.py:362): stride-4 causal conv stack turning
  per-frame motion vectors into per-latent-frame token stacks (heads + 1
  learned padding token), shifted right by one zero frame for the reference
  slot;
- **face adapter** cross-attention every ``inject_face_latents_blocks``
  blocks (model.py:436): video tokens, reshaped per latent frame, attend to
  that frame's face tokens and the result is added residually;
- a **pose stream**: VAE-encoded pose latents patch-embedded and added to
  every generated frame's tokens (the reference slot 0 is skipped,
  model.py:1284).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, LayerNorm, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.wan import WanAttention, WanTransformerBlock, WanConfig
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs

_MOTION_CHANNELS = {512: 64, 256: 128, 128: 256, 64: 512, 32: 512, 16: 512,
                    8: 512, 4: 512}


@dataclasses.dataclass
class WanAnimateConfig:
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
    added_kv_proj_dim: Optional[int] = None
    motion_encoder_size: int = 512
    motion_style_dim: int = 512
    motion_dim: int = 20
    motion_encoder_dim: int = 512
    face_encoder_hidden_dim: int = 1024
    face_encoder_num_heads: int = 4
    inject_face_latents_blocks: int = 5
    # SkyReels-style extras my WanTransformerBlock duck-types on
    inject_sample_info: bool = False
    vace_layers: Tuple[int, ...] = ()

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def rope_axes_dims(self) -> Tuple[int, int, int]:
        d = self.attention_head_dim
        h = w = 2 * (d // 6)
        return (d - 2 * h, h, w)

    @classmethod
    def from_dict(cls, cfg: dict) -> "WanAnimateConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "patch_size" in kw:
            kw["patch_size"] = tuple(kw["patch_size"])
        return cls(**kw)


def _fused_leaky(x, bias, slope=0.2, scale=math.sqrt(2.0)):
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, x * slope) * scale


class MotionConv(nnx.Module):
    """Equalized-lr conv (NHWC) with optional blur pre-filter and fused
    leaky-ReLU (model.py:101)."""

    def __init__(self, cin, cout, kernel, stride=1, padding=0, use_bias=True,
                 blur: bool = False, use_activation=True, *, rngs: nnx.Rngs):
        self.weight = nnx.Param(
            nnx.initializers.normal(1.0)(rngs.params(),
                                         (kernel, kernel, cin, cout),
                                         jnp.float32))
        self.scale = 1.0 / math.sqrt(cin * kernel * kernel)
        self.stride, self.padding = stride, padding
        self.use_activation = use_activation
        if use_activation:
            self.act_bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
            self.bias = None
        else:
            self.act_bias = None
            self.bias = (nnx.Param(jnp.zeros((cout,), jnp.float32))
                         if use_bias else None)
        self.blur = blur
        if blur:
            k = np.asarray([1.0, 3.0, 3.0, 1.0])
            k2 = np.outer(k, k)
            self.blur_kernel = jnp.asarray(k2 / k2.sum(), jnp.float32)
            p = (4 - stride) + (kernel - 1)
            self.blur_pad = ((p + 1) // 2, p // 2)
        self.cin = cin

    def __call__(self, x):  # NHWC
        if self.blur:
            bk = jnp.tile(self.blur_kernel[:, :, None, None], (1, 1, 1, self.cin))
            x = jax.lax.conv_general_dilated(
                x, bk, window_strides=(1, 1),
                padding=(self.blur_pad, self.blur_pad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.cin)
        y = jax.lax.conv_general_dilated(
            x, self.weight.value * self.scale,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_activation:
            return _fused_leaky(y, self.act_bias.value)
        if self.bias is not None:
            y = y + self.bias.value
        return y


class MotionLinear(nnx.Module):
    def __init__(self, din, dout, use_activation=False, *, rngs: nnx.Rngs):
        self.weight = nnx.Param(
            nnx.initializers.normal(1.0)(rngs.params(), (din, dout), jnp.float32))
        self.scale = 1.0 / math.sqrt(din)
        self.use_activation = use_activation
        self.bias = nnx.Param(jnp.zeros((dout,), jnp.float32))

    def __call__(self, x):
        y = x @ (self.weight.value * self.scale)
        if self.use_activation:
            return _fused_leaky(y, self.bias.value)
        return y + self.bias.value


class MotionResBlock(nnx.Module):
    def __init__(self, cin, cout, *, rngs: nnx.Rngs):
        self.conv1 = MotionConv(cin, cin, 3, padding=1, rngs=rngs)
        self.conv2 = MotionConv(cin, cout, 3, stride=2, blur=True, rngs=rngs)
        self.conv_skip = MotionConv(cin, cout, 1, stride=2, blur=True,
                                    use_bias=False, use_activation=False,
                                    rngs=rngs)

    def __call__(self, x):
        h = self.conv2(self.conv1(x))
        return (h + self.conv_skip(x)) / math.sqrt(2.0)


class WanAnimateMotionEncoder(nnx.Module):
    def __init__(self, cfg: WanAnimateConfig, *, rngs: nnx.Rngs):
        size = cfg.motion_encoder_size
        self.conv_in = MotionConv(3, _MOTION_CHANNELS[size], 1, rngs=rngs)
        self.res_blocks = nnx.List([])
        cin = _MOTION_CHANNELS[size]
        for i in range(int(math.log2(size)), 2, -1):
            cout = _MOTION_CHANNELS[2 ** (i - 1)]
            self.res_blocks.append(MotionResBlock(cin, cout, rngs=rngs))
            cin = cout
        self.conv_out = MotionConv(cin, cfg.motion_style_dim, 4, use_bias=False,
                                   use_activation=False, rngs=rngs)
        self.motion_network = nnx.List(
            [MotionLinear(cfg.motion_style_dim, cfg.motion_style_dim, rngs=rngs)
             for _ in range(4)]
            + [MotionLinear(cfg.motion_style_dim, cfg.motion_dim, rngs=rngs)])
        self.motion_synthesis_weight = nnx.Param(
            nnx.initializers.normal(1.0)(rngs.params(),
                                         (cfg.motion_encoder_dim, cfg.motion_dim),
                                         jnp.float32))

    def __call__(self, face_nhwc):  # [F, S, S, 3] → [F, out_dim]
        x = self.conv_in(face_nhwc)
        for blk in self.res_blocks:
            x = blk(x)
        x = self.conv_out(x)  # [F, 1, 1, style]
        feat = x.reshape(x.shape[0], -1)
        for lin in self.motion_network:
            feat = lin(feat)
        w = self.motion_synthesis_weight.value.astype(jnp.float32) + 1e-8
        q, _ = jnp.linalg.qr(w)  # [out_dim, motion_dim] orthonormal columns
        # diag(alpha) @ Q^T summed over the motion axis (model.py:344)
        return (feat.astype(jnp.float32)[:, :, None] * q.T[None]).sum(axis=1)


class WanAnimateFaceEncoder(nnx.Module):
    """Causal stride-4 conv stack over time (model.py:362)."""

    def __init__(self, cfg: WanAnimateConfig, *, rngs: nnx.Rngs):
        from apex_studio_tpu.models.transformers.wan_s2v import CausalConv1d

        d_in, hid = cfg.motion_encoder_dim, cfg.face_encoder_hidden_dim
        self.num_heads = cfg.face_encoder_num_heads
        self.conv1_local = CausalConv1d(d_in, hid * self.num_heads, 3, rngs=rngs)
        self.conv2 = CausalConv1d(hid, hid, 3, stride=2, rngs=rngs)
        self.conv3 = CausalConv1d(hid, hid, 3, stride=2, rngs=rngs)
        self.out_proj = Linear(hid, cfg.dim, use_bias=True, dtype=jnp.float32,
                               param_dtype=jnp.float32, rngs=rngs)
        self.padding_tokens = nnx.Param(
            jnp.zeros((1, 1, 1, cfg.dim), jnp.float32))

    def __call__(self, motion_vec):  # [B, F, C] → [B, F/4, heads+1, dim]
        b, t, _ = motion_vec.shape
        x = self.conv1_local(motion_vec)
        x = x.reshape(b, x.shape[1], self.num_heads, -1)
        x = x.transpose(0, 2, 1, 3).reshape(b * self.num_heads, x.shape[1], -1)
        x = nnx.silu(layer_norm(x, eps=1e-6))
        x = nnx.silu(layer_norm(self.conv2(x), eps=1e-6))
        x = nnx.silu(layer_norm(self.conv3(x), eps=1e-6))
        x = self.out_proj(x)
        f = x.shape[1]
        x = x.reshape(b, self.num_heads, f, -1).transpose(0, 2, 1, 3)
        pad = jnp.broadcast_to(self.padding_tokens.value,
                               (b, f, 1, x.shape[-1]))
        return jnp.concatenate([x, pad], axis=2)


class FaceAdapterCrossAttention(nnx.Module):
    """Per-latent-frame cross-attention to face tokens (model.py:436)."""

    def __init__(self, cfg: WanAnimateConfig, *, dtype, param_dtype,
                 rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.to_out = Linear(d, d, **kw)
        self.norm_q = RMSNorm(cfg.attention_head_dim, eps=cfg.eps, rngs=rngs)
        self.norm_k = RMSNorm(cfg.attention_head_dim, eps=cfg.eps, rngs=rngs)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim
        self.eps = cfg.eps

    def __call__(self, x, face_tokens):
        # x [B, S, C]; face_tokens [B, T, N, C]; T must divide S
        b, s, c = x.shape
        t, n = face_tokens.shape[1], face_tokens.shape[2]
        xq = layer_norm(x, eps=self.eps)
        fk = layer_norm(face_tokens, eps=self.eps).astype(x.dtype)
        q = self.norm_q(self.to_q(xq).reshape(b, s, self.heads, self.head_dim))
        k = self.norm_k(self.to_k(fk).reshape(b, t, n, self.heads, self.head_dim))
        v = self.to_v(fk).reshape(b, t, n, self.heads, self.head_dim)
        q = q.reshape(b * t, s // t, self.heads, self.head_dim)
        k = k.reshape(b * t, n, self.heads, self.head_dim)
        v = v.reshape(b * t, n, self.heads, self.head_dim)
        out = attention_op(q, k, v).reshape(b, s, c)
        return self.to_out(out)


@transformer_registry.register(
    "wan.animate", aliases=("WanAnimateTransformer3DModel", "wan_animate")
)
class WanAnimateTransformer3DModel(nnx.Module):
    config_class = WanAnimateConfig

    @staticmethod
    def sharding_rules(cfg: "WanAnimateConfig"):
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

    def __init__(self, cfg: WanAnimateConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch = int(np.prod(cfg.patch_size))
        self.patch_embedding = Linear(cfg.in_channels * patch, d, **kw)
        self.pose_patch_embedding = Linear(cfg.out_channels * patch, d, **kw)
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
        self.motion_encoder = WanAnimateMotionEncoder(cfg, rngs=rngs)
        self.face_encoder = WanAnimateFaceEncoder(cfg, rngs=rngs)
        # duck-typed Wan blocks (self-attn + text/image cross-attn + 6-mod)
        block_cfg = WanConfig(
            patch_size=cfg.patch_size,
            num_attention_heads=cfg.num_attention_heads,
            attention_head_dim=cfg.attention_head_dim,
            in_channels=cfg.in_channels, out_channels=cfg.out_channels,
            text_dim=cfg.text_dim, freq_dim=cfg.freq_dim, ffn_dim=cfg.ffn_dim,
            num_layers=cfg.num_layers, cross_attn_norm=cfg.cross_attn_norm,
            eps=cfg.eps, image_dim=cfg.image_dim,
            added_kv_proj_dim=cfg.dim if cfg.image_dim is not None else None)
        self.blocks = nnx.List(
            [WanTransformerBlock(block_cfg, dtype=dtype, param_dtype=param_dtype,
                                 rngs=rngs) for _ in range(cfg.num_layers)])
        n_adapters = cfg.num_layers // cfg.inject_face_latents_blocks
        self.face_adapter = nnx.List(
            [FaceAdapterCrossAttention(cfg, dtype=dtype, param_dtype=param_dtype,
                                       rngs=rngs)
             for _ in range(max(n_adapters, 1))])
        self.norm_out_scale_shift = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 2, d), jnp.float32))
        self.proj_out = Linear(d, cfg.out_channels * patch, **kw)

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
        x: jnp.ndarray,                       # [B, 36, T+1, H, W]
        t: jnp.ndarray,                       # [B]
        text: jnp.ndarray,                    # [B, L, text_dim]
        image_embeds: Optional[jnp.ndarray],  # [B, L_img, image_dim]
        pose_latents: Optional[jnp.ndarray],  # [B, 16, T, H, W]
        face_pixel_values: Optional[jnp.ndarray],  # [B, 3, S_f, 512, 512]
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, _, tt, hh, ww = x.shape
        pt, ph, pw = cfg.patch_size
        n_t, n_h, n_w = tt // pt, hh // ph, ww // pw
        s_frame = n_h * n_w

        t_freq = timestep_embedding(t.astype(jnp.float32), cfg.freq_dim,
                                    flip_sin_to_cos=True)
        temb = self.time_embedder_linear_2(nnx.silu(
            self.time_embedder_linear_1(t_freq.astype(self.dtype))))
        temb6 = self.time_proj(nnx.silu(temb)).reshape(b, 6, cfg.dim
                                                       ).astype(jnp.float32)
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

        tokens = self.patch_embedding(self._patchify(x).astype(self.dtype))
        if pose_latents is not None:
            pose_tok = self.pose_patch_embedding(
                self._patchify(pose_latents).astype(self.dtype))
            gen = tokens[:, s_frame:] + pose_tok  # slot 0 is the reference
            tokens = jnp.concatenate([tokens[:, :s_frame], gen], axis=1)

        face_tokens = None
        if face_pixel_values is not None:
            f = face_pixel_values.shape[2]
            faces = face_pixel_values.transpose(0, 2, 3, 4, 1).reshape(
                b * f, face_pixel_values.shape[3], face_pixel_values.shape[4], 3)
            motion_vec = self.motion_encoder(faces.astype(jnp.float32))
            motion_vec = motion_vec.reshape(b, f, -1)
            face_tokens = self.face_encoder(motion_vec)
            zero = jnp.zeros_like(face_tokens[:, :1])
            face_tokens = jnp.concatenate([zero, face_tokens], axis=1)

        rope_cos, rope_sin = self.rope_tables(n_t, n_h, n_w)
        for i, blk in enumerate(self.blocks):
            tokens = blk(tokens, ctx, temb6, rope_cos, rope_sin,
                         context_image=ctx_img)
            if face_tokens is not None and i % cfg.inject_face_latents_blocks == 0:
                adapter = self.face_adapter[i // cfg.inject_face_latents_blocks]
                tokens = tokens + adapter(tokens, face_tokens)

        shift, scale = jnp.split(
            self.norm_out_scale_shift.value + temb.astype(jnp.float32)[:, None, :],
            2, axis=1)
        out = layer_norm(tokens, eps=cfg.eps) * (1 + scale.astype(tokens.dtype)) \
            + shift.astype(tokens.dtype)
        out = self.proj_out(out)
        out = out.reshape(b, n_t, n_h, n_w, cfg.out_channels, pt, ph, pw)
        out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return out.reshape(b, cfg.out_channels, tt, hh, ww)
