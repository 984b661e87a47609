"""SAM2-class promptable segmentation in JAX/NNX.

Counterpart of the reference's SAM2 integration (``src/mask/mask.py:57``
ModelType zoo + ``build_sam2_video_predictor``; the reference consumes the
published sam2 package). This is a first-party JAX implementation of the
SAM2 image-segmentation stack:

- Hiera trunk (hierarchical ViT: windowed attention, q-pooling between
  stages, global attention at selected layers) + FPN neck → 256-ch image
  embedding at stride 16 with stride-4/8 skip features
- SAM prompt encoder: random-Fourier positional encoding, point/box labels,
  optional dense mask prompt
- SAM two-way mask decoder: 2-layer token↔image transformer, transposed-conv
  upscaling with high-res skips, per-mask hypernetwork MLPs, IoU head,
  object-score token (SAM2 addition)

The module mirrors the official checkpoint key nesting so the converter in
loaders/converters.py ("sam2") loads published weights; tests exercise tiny
random configs (checkpoints cannot be fetched in this environment). Video
tracking runs the memory-bank path (memory encoder + memory attention, this
file :468 and mask/predictor.py:174); per-frame re-prompting from the previous
mask (mask/segment.py) remains as the fallback tracker.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear
from apex_studio_tpu.ops import attention as attention_op


@dataclasses.dataclass
class SAM2Config:
    # Hiera trunk (defaults = sam2-hiera-small-ish; tiny configs in tests)
    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (1, 2, 11, 2)
    window_specs: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (7, 10, 13)
    img_size: int = 1024
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3
    # Neck / decoder
    d_model: int = 256
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask_outputs: int = 3

    @classmethod
    def from_dict(cls, cfg: dict) -> "SAM2Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        for key in ("stages", "window_specs", "global_att_blocks"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)


# ------------------------------------------------------------------ Hiera trunk


class Conv2dHW(nnx.Module):
    """Conv over NHWC with torch-layout kernels handled by the converter."""

    def __init__(self, cin, cout, kernel, stride=1, padding=0, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        k = (kernel, kernel) if isinstance(kernel, int) else kernel
        self.kernel = nnx.Param(init(rngs.params(), (*k, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride = (stride, stride) if isinstance(stride, int) else stride
        self.padding = (padding, padding) if isinstance(padding, int) else padding

    def __call__(self, x):
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=self.stride,
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + self.bias.value


def _window_partition(x, w):
    b, h, wdt, c = x.shape
    ph, pw = (-h) % w, (-wdt) % w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, ww = x.shape[1], x.shape[2]
    x = x.reshape(b, hh // w, w, ww // w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w, w, c), (hh, ww)


def _window_unpartition(win, w, padded_hw, orig_hw):
    hh, ww = padded_hw
    h, wdt = orig_hw
    b = win.shape[0] // ((hh // w) * (ww // w))
    x = win.reshape(b, hh // w, ww // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hh, ww, -1)
    return x[:, :h, :wdt]


class HieraBlock(nnx.Module):
    def __init__(self, dim: int, dim_out: int, heads: int, window: int,
                 q_pool: bool, *, rngs: nnx.Rngs):
        self.norm1 = LayerNorm(dim, eps=1e-6, rngs=rngs)
        kw = dict(use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
        self.qkv = Linear(dim, 3 * dim_out, **kw)
        self.proj_attn = Linear(dim_out, dim_out, **kw)
        self.norm2 = LayerNorm(dim_out, eps=1e-6, rngs=rngs)
        self.mlp_lin1 = Linear(dim_out, 4 * dim_out, **kw)
        self.mlp_lin2 = Linear(4 * dim_out, dim_out, **kw)
        self.proj = Linear(dim, dim_out, **kw) if dim != dim_out else None
        self.dim, self.dim_out, self.heads = dim, dim_out, heads
        self.window = window
        self.q_pool = q_pool

    def _attend(self, x):
        b, h, w, _ = x.shape
        qkv = self.qkv(x).reshape(b, h * w, 3, self.heads, -1)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            # Query pooling: 2x2 max-pool on q (Hiera stage transition).
            hd = q.shape[-1]
            qm = q.reshape(b, h, w, self.heads * hd)
            qm = jax.lax.reduce_window(
                qm, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            h2, w2 = qm.shape[1], qm.shape[2]
            q = qm.reshape(b, h2 * w2, self.heads, hd)
            out = attention_op(q, k, v)
            out = out.reshape(b, h2, w2, -1)
        else:
            out = attention_op(q, k, v).reshape(b, h, w, -1)
        return self.proj_attn(out)

    def __call__(self, x):
        shortcut = x
        y = self.norm1(x)
        if self.proj is not None:
            # Stage transition: project the residual and pool it like q.
            shortcut = self.proj(y)
        if self.q_pool:
            shortcut = jax.lax.reduce_window(
                shortcut, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        if self.window > 0:
            win, padded = _window_partition(y, self.window)
            if self.q_pool:
                # Windowed attention with q-pool: attend globally instead
                # (pool transitions use global attention for correctness).
                att = self._attend(y)
            else:
                att = self._attend(win)
                att = _window_unpartition(att, self.window, padded, y.shape[1:3])
        else:
            att = self._attend(y)
        x = shortcut + att
        return x + self.mlp_lin2(nnx.gelu(self.mlp_lin1(self.norm2(x)), approximate=False))


class HieraTrunk(nnx.Module):
    def __init__(self, cfg: SAM2Config, *, rngs: nnx.Rngs):
        self.patch_embed = Conv2dHW(3, cfg.embed_dim, cfg.patch_kernel,
                                    cfg.patch_stride, cfg.patch_padding, rngs=rngs)
        side = cfg.img_size // cfg.patch_stride
        self.pos_embed = nnx.Param(
            nnx.initializers.normal(0.02)(rngs.params(), (1, side, side, cfg.embed_dim),
                                          jnp.float32)
        )
        blocks = []
        self.channel_list: List[int] = []
        dim, heads = cfg.embed_dim, cfg.num_heads
        idx = 0
        stage_ends = np.cumsum(cfg.stages) - 1
        for s, depth in enumerate(cfg.stages):
            window = cfg.window_specs[s]
            for d in range(depth):
                q_pool = s > 0 and d == 0
                dim_out = dim * 2 if q_pool else dim
                h_out = heads * 2 if q_pool else heads
                win = 0 if idx in cfg.global_att_blocks else window
                blocks.append(HieraBlock(dim, dim_out, h_out, win, q_pool, rngs=rngs))
                dim, heads = dim_out, h_out
                idx += 1
            self.channel_list.append(dim)
        self.blocks = nnx.List(blocks)
        self._stage_ends = [int(e) for e in stage_ends]

    def __call__(self, x):  # x: [B, H, W, 3]
        x = self.patch_embed(x)
        pe = self.pos_embed.value
        if pe.shape[1:3] != x.shape[1:3]:
            pe = jax.image.resize(pe, (1, x.shape[1], x.shape[2], pe.shape[-1]), "bilinear")
        x = x + pe
        feats = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self._stage_ends:
                feats.append(x)
        return feats  # strides 4, 8, 16, 32


class FpnNeck(nnx.Module):
    """1x1 convs to d_model + top-down sum over the selected levels."""

    def __init__(self, cfg: SAM2Config, channel_list: Sequence[int], *, rngs: nnx.Rngs):
        self.convs = nnx.List(
            [Conv2dHW(c, cfg.d_model, 1, 1, 0, rngs=rngs) for c in channel_list]
        )

    def __call__(self, feats):
        outs = [conv(f) for conv, f in zip(self.convs, feats)]
        # Top-down: add upsampled deeper features (SAM2 fuses the top two).
        for i in range(len(outs) - 2, len(outs) - 3, -1):
            if i < 0:
                break
            up = jax.image.resize(outs[i + 1], outs[i].shape, "nearest")
            outs[i] = outs[i] + up
        return outs


# ------------------------------------------------------ prompt encoder / decoder


class PromptEncoder(nnx.Module):
    def __init__(self, cfg: SAM2Config, *, rngs: nnx.Rngs):
        d = cfg.d_model
        init = nnx.initializers.normal(1.0)
        # Random-Fourier positional encoding matrix (SAM PositionEmbeddingRandom).
        self.pe_gaussian = nnx.Param(init(rngs.params(), (2, d // 2), jnp.float32))
        emb = nnx.initializers.normal(0.02)
        # 0: neg point, 1: pos point, 2: box TL, 3: box BR (+ not-a-point).
        self.point_embeddings = nnx.List(
            [nnx.Param(emb(rngs.params(), (1, d), jnp.float32)) for _ in range(4)]
        )
        self.not_a_point_embed = nnx.Param(emb(rngs.params(), (1, d), jnp.float32))
        self.no_mask_embed = nnx.Param(emb(rngs.params(), (1, d), jnp.float32))
        self.d_model = d

    def encode_coords(self, coords01: jnp.ndarray) -> jnp.ndarray:
        """[..., 2] normalized (x, y) in [0,1] → [..., d_model]."""
        c = 2.0 * coords01 - 1.0
        proj = (2.0 * np.pi) * (c @ self.pe_gaussian.value)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def dense_pe(self, h: int, w: int) -> jnp.ndarray:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [h,w,2]
        return self.encode_coords(grid)

    def __call__(self, points01: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """points01: [B, N, 2] in [0,1]; labels: [B, N] ∈ {-1 pad, 0 neg,
        1 pos, 2 box TL, 3 box BR} → sparse embeddings [B, N, d]."""
        pe = self.encode_coords(points01)
        table = jnp.concatenate(
            [p.value for p in self.point_embeddings] + [self.not_a_point_embed.value],
            axis=0,
        )  # [5, d]
        idx = jnp.where(labels < 0, 4, labels)
        typ = table[idx]
        pad = (labels < 0)[..., None]
        return jnp.where(pad, typ, pe + typ)


class TwoWayAttention(nnx.Module):
    def __init__(self, d: int, heads: int, downsample: int = 1, *, rngs: nnx.Rngs):
        inner = d // downsample
        kw = dict(use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
        self.q_proj = Linear(d, inner, **kw)
        self.k_proj = Linear(d, inner, **kw)
        self.v_proj = Linear(d, inner, **kw)
        self.out_proj = Linear(inner, d, **kw)
        self.heads = heads
        self.head_dim = inner // heads

    def __call__(self, q, k, v):
        b, nq, _ = q.shape
        nk = k.shape[1]
        qh = self.q_proj(q).reshape(b, nq, self.heads, self.head_dim)
        kh = self.k_proj(k).reshape(b, nk, self.heads, self.head_dim)
        vh = self.v_proj(v).reshape(b, nk, self.heads, self.head_dim)
        out = attention_op(qh, kh, vh).reshape(b, nq, -1)
        return self.out_proj(out)


class TwoWayBlock(nnx.Module):
    def __init__(self, cfg: SAM2Config, skip_first_pe: bool, *, rngs: nnx.Rngs):
        d, h = cfg.d_model, cfg.decoder_heads
        kw = dict(use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
        self.self_attn = TwoWayAttention(d, h, rngs=rngs)
        self.norm1 = LayerNorm(d, eps=1e-5, rngs=rngs)
        self.cross_attn_token_to_image = TwoWayAttention(d, h, 2, rngs=rngs)
        self.norm2 = LayerNorm(d, eps=1e-5, rngs=rngs)
        self.mlp_lin1 = Linear(d, cfg.decoder_mlp_dim, **kw)
        self.mlp_lin2 = Linear(cfg.decoder_mlp_dim, d, **kw)
        self.norm3 = LayerNorm(d, eps=1e-5, rngs=rngs)
        self.cross_attn_image_to_token = TwoWayAttention(d, h, 2, rngs=rngs)
        self.norm4 = LayerNorm(d, eps=1e-5, rngs=rngs)
        self.skip_first_pe = skip_first_pe

    def __call__(self, tokens, image, token_pe, image_pe):
        q = tokens if self.skip_first_pe else tokens + token_pe
        tokens = self.norm1(tokens + self.self_attn(q, q, tokens))
        q = tokens + token_pe
        k = image + image_pe
        tokens = self.norm2(tokens + self.cross_attn_token_to_image(q, k, image))
        tokens = self.norm3(
            tokens + self.mlp_lin2(nnx.relu(self.mlp_lin1(tokens)))
        )
        q = tokens + token_pe
        image = self.norm4(image + self.cross_attn_image_to_token(k, q, tokens))
        return tokens, image


class MLP(nnx.Module):
    def __init__(self, din, dhid, dout, depth, *, rngs: nnx.Rngs, sigmoid=False):
        kw = dict(use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
        dims = [din] + [dhid] * (depth - 1) + [dout]
        self.layers = nnx.List(
            [Linear(dims[i], dims[i + 1], **kw) for i in range(depth)]
        )
        self.sigmoid = sigmoid

    def __call__(self, x):
        for i, lin in enumerate(self.layers):
            x = lin(x)
            if i < len(self.layers) - 1:
                x = nnx.relu(x)
        return nnx.sigmoid(x) if self.sigmoid else x


class ConvTranspose2x(nnx.Module):
    def __init__(self, cin, cout, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (2, 2, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x):
        y = jax.lax.conv_transpose(
            x, self.kernel.value, strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + self.bias.value


class MaskDecoder(nnx.Module):
    def __init__(self, cfg: SAM2Config, *, rngs: nnx.Rngs):
        d = cfg.d_model
        emb = nnx.initializers.normal(0.02)
        n_masks = cfg.num_multimask_outputs + 1
        self.iou_token = nnx.Param(emb(rngs.params(), (1, d), jnp.float32))
        self.mask_tokens = nnx.Param(emb(rngs.params(), (n_masks, d), jnp.float32))
        self.obj_score_token = nnx.Param(emb(rngs.params(), (1, d), jnp.float32))
        self.layers = nnx.List(
            [TwoWayBlock(cfg, skip_first_pe=(i == 0), rngs=rngs)
             for i in range(cfg.decoder_depth)]
        )
        self.final_attn_token_to_image = TwoWayAttention(d, cfg.decoder_heads, 2, rngs=rngs)
        self.norm_final_attn = LayerNorm(d, eps=1e-5, rngs=rngs)
        self.upscale1 = ConvTranspose2x(d, d // 4, rngs=rngs)
        self.upscale2 = ConvTranspose2x(d // 4, d // 8, rngs=rngs)
        self.upscale_norm = LayerNorm(d // 4, eps=1e-6, rngs=rngs)
        self.output_hypernetworks_mlps = nnx.List(
            [MLP(d, d, d // 8, 3, rngs=rngs) for _ in range(n_masks)]
        )
        self.iou_prediction_head = MLP(d, d, n_masks, 3, rngs=rngs)
        self.pred_obj_score_head = MLP(d, d, 1, 3, rngs=rngs)
        self.n_masks = n_masks

    def __call__(self, image_embed, image_pe, sparse_prompt, hires_feats=None):
        """image_embed [B,h,w,d]; sparse_prompt [B,N,d] → (masks [B,M,4h,4w],
        iou [B,M], obj_score [B,1])."""
        b, h, w, d = image_embed.shape
        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(self.obj_score_token.value[None], (b, 1, d)),
                jnp.broadcast_to(self.iou_token.value[None], (b, 1, d)),
                jnp.broadcast_to(self.mask_tokens.value[None], (b, self.n_masks, d)),
                sparse_prompt,
            ],
            axis=1,
        )
        token_pe = tokens  # SAM adds the prompt tokens themselves as PE
        image = image_embed.reshape(b, h * w, d)
        img_pe = image_pe.reshape(1, h * w, d)
        img_pe = jnp.broadcast_to(img_pe, (b, h * w, d))

        x_img = image
        for blk in self.layers:
            tokens, x_img = blk(tokens, x_img, token_pe, img_pe)
        q = tokens + token_pe
        tokens = self.norm_final_attn(
            tokens + self.final_attn_token_to_image(q, x_img + img_pe, x_img)
        )

        obj_tok = tokens[:, 0]
        iou_tok = tokens[:, 1]
        mask_toks = tokens[:, 2 : 2 + self.n_masks]

        src = x_img.reshape(b, h, w, d)
        up = self.upscale1(src)
        if hires_feats is not None and hires_feats[0] is not None:
            up = up + hires_feats[0]  # stride-8 skip (d/4 channels)
        up = nnx.gelu(self.upscale_norm(up), approximate=False)
        up = self.upscale2(up)
        if hires_feats is not None and hires_feats[1] is not None:
            up = up + hires_feats[1]  # stride-4 skip (d/8 channels)
        up = nnx.gelu(up, approximate=False)  # [B, 4h, 4w, d/8]

        hyper = jnp.stack(
            [mlp(mask_toks[:, i]) for i, mlp in enumerate(self.output_hypernetworks_mlps)],
            axis=1,
        )  # [B, M, d/8]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
        iou = self.iou_prediction_head(iou_tok)
        obj = self.pred_obj_score_head(obj_tok)
        return masks, iou, obj


# ----------------------------------------------------------------- full model


class SAM2ImageModel(nnx.Module):
    config_class = SAM2Config

    def __init__(self, cfg: SAM2Config, *, dtype=jnp.float32, param_dtype=jnp.float32,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.trunk = HieraTrunk(cfg, rngs=rngs)
        self.neck = FpnNeck(cfg, self.trunk.channel_list, rngs=rngs)
        d = cfg.d_model
        # High-res skip projections (SAM2 conv_s0/conv_s1 1x1 convs).
        self.conv_s0 = Conv2dHW(d, d // 8, 1, 1, 0, rngs=rngs)
        self.conv_s1 = Conv2dHW(d, d // 4, 1, 1, 0, rngs=rngs)
        self.prompt_encoder = PromptEncoder(cfg, rngs=rngs)
        self.mask_decoder = MaskDecoder(cfg, rngs=rngs)

    def encode_image(self, image01: jnp.ndarray):
        """image01: [B, H, W, 3] in [0,1], normalized inside."""
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (image01 - mean) / std
        feats = self.trunk(x)
        outs = self.neck(feats)
        s4, s8, s16 = outs[0], outs[1], outs[2]
        return s16, self.conv_s1(s8), self.conv_s0(s4)

    def predict(self, image01, points01, labels):
        """→ (mask_logits [B,M,H/4,W/4], iou [B,M], obj [B,1])."""
        s16, hi_s8, hi_s4 = self.encode_image(image01)
        pe = self.prompt_encoder.dense_pe(s16.shape[1], s16.shape[2])[None]
        sparse = self.prompt_encoder(points01, labels)
        return self.mask_decoder(s16, pe, sparse, hires_feats=(hi_s8, hi_s4))


# ------------------------------------------------------------------------------
# Video memory bank (SAM2 memory attention + memory encoder)
# ------------------------------------------------------------------------------


class LayerNorm2d(nnx.Module):
    """Channel LayerNorm over [B,H,W,C] (sam2 LayerNorm2d, channels-first in
    torch; weights are [C])."""

    def __init__(self, dim, *, rngs):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        y = (x32 - mu) / jnp.sqrt(var + 1e-6)
        return (y * self.weight.value + self.bias.value).astype(x.dtype)


class MaskDownSampler(nnx.Module):
    """sam2 memory_encoder.mask_downsampler: 4× stride-2 3x3 convs
    (1→4→16→64→256) each followed by LayerNorm2d+GELU, then a 1x1 conv."""

    def __init__(self, d: int, *, rngs):
        chans = [1, 4, 16, 64, 256]
        self.encoder = nnx.List(sum(
            [[Conv2dHW(chans[i], chans[i + 1], 3, 2, 1, rngs=rngs),
              LayerNorm2d(chans[i + 1], rngs=rngs)] for i in range(4)],
            []) + [Conv2dHW(256, d, 1, 1, 0, rngs=rngs)])

    def __call__(self, m):  # [B,H,W,1] mask (16x total downsample)
        x = m
        for i in range(4):
            x = self.encoder[2 * i](x)
            x = jax.nn.gelu(self.encoder[2 * i + 1](x))
        return self.encoder[8](x)


class DWConv7(nnx.Module):
    """Depthwise 7x7 conv, kernel HWIO with I=1 (torch [C,1,7,7])."""

    def __init__(self, d: int, *, rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (7, 7, 1, d), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((d,), jnp.float32))

    def __call__(self, x):
        h = jax.lax.conv_general_dilated(
            x, self.kernel.value, (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1])
        return h + self.bias.value


class Linear2(nnx.Module):
    def __init__(self, cin, cout, *, rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x):
        return x @ self.kernel.value + self.bias.value


class CXBlock(nnx.Module):
    """ConvNeXt block (sam2 memory_encoder.fuser.layers): depthwise 7x7,
    LayerNorm, pointwise MLP ×4, layer-scale gamma."""

    def __init__(self, d: int, *, rngs):
        self.dwconv = DWConv7(d, rngs=rngs)
        self.norm = LayerNorm2d(d, rngs=rngs)
        self.pwconv1 = Linear2(d, 4 * d, rngs=rngs)
        self.pwconv2 = Linear2(4 * d, d, rngs=rngs)
        self.gamma = nnx.Param(jnp.full((d,), 1e-6, jnp.float32))

    def __call__(self, x):  # [B,H,W,C]
        h = self.norm(self.dwconv(x))
        h = self.pwconv2(jax.nn.gelu(self.pwconv1(h)))
        return x + h * self.gamma.value


class MemoryEncoder(nnx.Module):
    """sam2 memory_encoder: downsampled mask + projected pixel features →
    fused 64-dim memory features."""

    def __init__(self, d_model: int, d_mem: int, *, rngs):
        self.mask_downsampler = MaskDownSampler(d_model, rngs=rngs)
        self.pix_feat_proj = Conv2dHW(d_model, d_model, 1, 1, 0, rngs=rngs)
        self.fuser = nnx.List([CXBlock(d_model, rngs=rngs) for _ in range(2)])
        self.out_proj = Conv2dHW(d_model, d_mem, 1, 1, 0, rngs=rngs)

    def __call__(self, pix_feat, mask_logits_hi):
        """pix_feat [B,h,w,256]; mask_logits_hi [B,16h,16w,1] (sigmoid-scaled
        inside per sam2: sigmoid then downsample)."""
        m = jax.nn.sigmoid(mask_logits_hi)
        m = self.mask_downsampler(m)
        x = self.pix_feat_proj(pix_feat) + m
        for blk in self.fuser:
            x = blk(x)
        return self.out_proj(x)


class MemAttnLayer(nnx.Module):
    """memory_attention.layers.N: self-attn (RoPE on the current frame grid),
    cross-attn to memory tokens (kv dim 64), MLP."""

    def __init__(self, d: int, d_mem: int, heads: int = 1, *, rngs):
        self.self_attn = _MemAttention(d, d, heads, rngs=rngs)
        self.cross_attn_image = _MemAttention(d, d_mem, heads, rngs=rngs)
        self.linear1 = Linear2(d, 4 * d, rngs=rngs)
        self.linear2 = Linear2(4 * d, d, rngs=rngs)
        self.norm1 = LayerNorm2d(d, rngs=rngs)
        self.norm2 = LayerNorm2d(d, rngs=rngs)
        self.norm3 = LayerNorm2d(d, rngs=rngs)

    def __call__(self, x, mem_kv, x_pe, mem_pe):
        h = self.norm1(x)
        x = x + self.self_attn(h + x_pe, h + x_pe, h)
        h = self.norm2(x)
        x = x + self.cross_attn_image(h + x_pe, mem_kv + mem_pe, mem_kv)
        h = self.norm3(x)
        return x + self.linear2(jax.nn.relu(self.linear1(h)))


class _MemAttention(nnx.Module):
    def __init__(self, d: int, kv_in: int, heads: int, *, rngs):
        self.q_proj = Linear2(d, d, rngs=rngs)
        self.k_proj = Linear2(kv_in, d, rngs=rngs)
        self.v_proj = Linear2(kv_in, d, rngs=rngs)
        self.out_proj = Linear2(d, d, rngs=rngs)
        self.heads = heads
        self.d = d

    def __call__(self, q, k, v):
        b = q.shape[0]
        hd = self.d // self.heads
        qh = self.q_proj(q).reshape(b, -1, self.heads, hd)
        kh = self.k_proj(k).reshape(b, -1, self.heads, hd)
        vh = self.v_proj(v).reshape(b, -1, self.heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) / np.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, -1, self.d)
        return self.out_proj(out)


class SAM2VideoModel(SAM2ImageModel):
    """SAM2 with the video memory bank: per-frame features are CONDITIONED on
    encoded memories of previous frames (memory attention) before the mask
    decoder runs promptless, and each predicted mask is encoded into the
    rolling bank (reference contract: mask/mask.py:8
    build_sam2_video_predictor; sam2 memory design). Re-prompting from the
    previous mask remains the fallback for checkpoints without memory
    weights."""

    NUM_MASKMEM = 7

    def __init__(self, cfg: SAM2Config, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        d = cfg.d_model
        d_mem = getattr(cfg, "mem_dim", 64)
        self.memory_encoder = MemoryEncoder(d, d_mem, rngs=rngs)
        self.memory_attention = nnx.List(
            [MemAttnLayer(d, d_mem, rngs=rngs) for _ in range(4)])
        self.memory_attention_norm = LayerNorm2d(d, rngs=rngs)
        self.obj_ptr_proj = MLP(d, d, d, 3, rngs=rngs)
        self.no_mem_embed = nnx.Param(jnp.zeros((1, 1, d), jnp.float32))
        self.maskmem_tpos_enc = nnx.Param(
            jnp.zeros((self.NUM_MASKMEM, 1, 1, d_mem), jnp.float32))
        self._d_mem = d_mem

    def condition_features(self, s16, memories):
        """s16 [B,h,w,256]; memories: list of (feat [B,h,w,64], age 0..6).
        → conditioned s16."""
        b, h, w, d = s16.shape
        x = s16.reshape(b, h * w, d)
        if not memories:
            return (x + self.no_mem_embed.value).reshape(b, h, w, d)
        x_pe = self.prompt_encoder.dense_pe(h, w)[None].reshape(b, h * w, d)
        kv, pe = [], []
        for feat, age in memories:
            kv.append(feat.reshape(b, -1, self._d_mem))
            tpos = self.maskmem_tpos_enc.value[min(age, self.NUM_MASKMEM - 1), 0]
            pe.append(jnp.broadcast_to(tpos, (b, feat.shape[1] * feat.shape[2],
                                              self._d_mem)))
        mem_kv = jnp.concatenate(kv, axis=1)
        mem_pe = jnp.concatenate(pe, axis=1)
        for layer in self.memory_attention:
            x = layer(x, mem_kv, x_pe, mem_pe)
        x = self.memory_attention_norm(x)
        return x.reshape(b, h, w, d)

    def track_step(self, image01, memories, points01=None, labels=None):
        """One video step: encode frame, condition on the memory bank, decode
        a mask (with prompts only on conditioning frames), encode the new
        memory. → (mask_logits, iou, memory_feat)."""
        s16, hi_s8, hi_s4 = self.encode_image(image01)
        cond = self.condition_features(s16, memories)
        pe = self.prompt_encoder.dense_pe(cond.shape[1], cond.shape[2])[None]
        if points01 is None:
            points01 = jnp.zeros((1, 1, 2), jnp.float32)
            labels = jnp.full((1, 1), -1, jnp.int32)  # padding-only prompt
        sparse = self.prompt_encoder(points01, labels)
        masks, iou, _ = self.mask_decoder(cond, pe, sparse,
                                          hires_feats=(hi_s8, hi_s4))
        best = jnp.argmax(iou[0])
        mask = masks[:, best]
        up = jax.image.resize(mask[..., None],
                              (mask.shape[0], cond.shape[1] * 16,
                               cond.shape[2] * 16, 1), "bilinear")
        mem = self.memory_encoder(s16, up)
        return mask, iou, mem
