"""Metric3D v2 monocular metric depth + surface normals, first-party JAX.

Counterpart of the reference's vendored mono stack
(``src/preprocess/metric3d/``): a DINOv2-reg ViT backbone
(``mono/model/backbones/ViT_DINO_reg.py``) feeding the RAFT-style
DPT decoder ``RAFTDepthNormalDPT5``
(``mono/model/decode_heads/RAFTDepthNormalDPTDecoder5.py``) — DPT token
readout → multi-scale fusion → log-bin depth expectation + normal head →
3-level ConvGRU iterative refinement with convex upsampling. The reference
needs no mmcv at runtime (its ``custom_mmpkg`` vendors the config reader), so
this family ships first-party rather than dependency-gated.

Inference pipeline parity (``mono/utils/do_test.py``):
- canonical-space scaling: focal-normalised resize to the 616x1064 crop with
  mean-color padding (``transform_test_data_scalecano`` / ``resize_for_input``)
- ImageNet mean/std normalisation in 0-255 space
- depth rendered via matplotlib colormap (``gray_to_colormap``), normals as
  the inverted 127*n+128 map (``vis_surface_normal``; ``__init__.py:163``).

Checkpoints: JUGGHM/Metric3D ``metric_depth_vit_{small,large}_800k.pth``
(``model_state_dict`` with ``depth_model.encoder/decoder`` prefixes;
``convert_metric3d_keys`` maps them, ``apply_state_dict`` infers transposes).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear
from apex_studio_tpu.preprocess.base import (
    BasePreprocessor,
    Frame,
    preprocessor_registry,
)
from apex_studio_tpu.preprocess.depth_anything import (
    BlockUpsample,
    Conv,
    DAv2Config,
    _VitBlock,
    resize_bilinear_ac,
)

_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclass
class Metric3DConfig:
    # backbone (DINOv2-reg)
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    num_register_tokens: int = 4
    pos_grid: int = 37  # 518 / 14
    mlp_ratio: float = 4.0
    # decoder (RAFTDepthNormalDPT5)
    feature_channels: Sequence[int] = (96, 192, 384, 768)
    decoder_channels: Sequence[int] = (48, 96, 192, 384, 384)
    hidden_dim: int = 48
    n_gru_layers: int = 3
    n_downsample: int = 2
    iters: int = 4
    slow_fast_gru: bool = True
    num_anchors: int = 256
    min_depth: float = 0.1
    max_depth: float = 200.0
    regress_scale: float = 100.0
    crop_size: Tuple[int, int] = (616, 1064)
    # giant2 extras: SwiGLU FFN + pre-norm multi-scale feature taps
    ffn: str = "mlp"
    multi_output: bool = False

    @classmethod
    def small(cls) -> "Metric3DConfig":
        return cls()  # vit.raft5.small.py defaults

    @classmethod
    def large(cls) -> "Metric3DConfig":
        return cls(embed_dim=1024, depth=24, num_heads=16,
                   feature_channels=(256, 512, 1024, 1024),
                   decoder_channels=(128, 256, 512, 1024, 1024),
                   hidden_dim=128, iters=8)

    @classmethod
    def giant2(cls) -> "Metric3DConfig":
        return cls(embed_dim=1536, depth=40, num_heads=24,
                   feature_channels=(384, 768, 1536, 1536),
                   decoder_channels=(192, 384, 768, 1536, 1536),
                   hidden_dim=192, iters=8, ffn="swiglu", multi_output=True)

    @classmethod
    def tiny(cls) -> "Metric3DConfig":
        """Test-scale config (pos grid matches a 56x98 input: no pos interp)."""
        return cls(embed_dim=32, depth=2, num_heads=2, pos_grid=4,
                   feature_channels=(8, 16, 32, 32),
                   decoder_channels=(8, 8, 16, 32, 32),
                   hidden_dim=8, iters=2, num_anchors=16,
                   crop_size=(56, 112))

    def _dav2(self) -> DAv2Config:
        return DAv2Config(
            encoder="metric3d", embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            patch_size=self.patch_size, pos_grid=self.pos_grid,
        )


# ---------------------------------------------------------------------------
# Backbone
# ---------------------------------------------------------------------------


class _SwiGLUFFN(nnx.Module):
    """SwiGLUFFNFused (ViT_DINO_reg.py:335/390, giant2's ffn_layer='swiglu'):
    hidden = round8(in * mlp_ratio * 2/3), fused w12 gate+value projection."""

    def __init__(self, d: int, mlp_ratio: float, *, rngs: nnx.Rngs):
        hidden = (int(d * mlp_ratio * 2 / 3) + 7) // 8 * 8
        kw = dict(dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
        self.w12 = Linear(d, 2 * hidden, **kw)
        self.w3 = Linear(hidden, d, **kw)

    def __call__(self, x):
        x1, x2 = jnp.split(self.w12(x), 2, axis=-1)
        return self.w3(nnx.silu(x1) * x2)


class _M3DViT(nnx.Module):
    """DINOv2 with register tokens (ViT_DINO_reg.py forward_features).

    multi_output=False (small/large): every pyramid slot reads the same
    final-norm hidden states. multi_output=True (giant2): pre-norm taps every
    depth/4 blocks, no final norm (the chunked multi-output branch)."""

    def __init__(self, cfg: Metric3DConfig, *, rngs: nnx.Rngs):
        d = cfg.embed_dim
        self.cfg = cfg
        self.patch_embed = Conv(3, d, kernel=cfg.patch_size, stride=cfg.patch_size,
                                padding=0, rngs=rngs)
        self.cls_token = nnx.Param(jnp.zeros((1, 1, d), jnp.float32))
        self.register_tokens = nnx.Param(
            jnp.zeros((1, cfg.num_register_tokens, d), jnp.float32))
        self.pos_embed = nnx.Param(
            jnp.zeros((1, 1 + cfg.pos_grid * cfg.pos_grid, d), jnp.float32))
        blk_cfg = cfg._dav2()
        self.blocks = nnx.List([_VitBlock(blk_cfg, rngs=rngs)
                                for _ in range(cfg.depth)])
        if cfg.ffn == "swiglu":
            for blk in self.blocks:
                blk.mlp = _SwiGLUFFN(d, cfg.mlp_ratio, rngs=rngs)
        self.norm = LayerNorm(d)

    def _interp_pos(self, gh: int, gw: int) -> jnp.ndarray:
        pe = self.pos_embed.value
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
        g = self.cfg.pos_grid
        if (gh, gw) == (g, g):
            return pe
        grid = patch_pe.reshape(1, g, g, -1)
        grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), "bicubic",
                                antialias=False)
        return jnp.concatenate([cls_pe, grid.reshape(1, gh * gw, -1)], axis=1)

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """x: NHWC float (H, W multiples of patch_size) → 4 x [B, 1+R+N, D]."""
        b, H, W, _ = x.shape
        cfg = self.cfg
        p = cfg.patch_size
        gh, gw = H // p, W // p
        tok = self.patch_embed(x).reshape(b, gh * gw, -1)
        cls = jnp.broadcast_to(self.cls_token.value, (b, 1, tok.shape[-1]))
        tok = jnp.concatenate([cls, tok], axis=1) + self._interp_pos(gh, gw)
        reg = jnp.broadcast_to(
            self.register_tokens.value,
            (b,) + self.register_tokens.value.shape[1:])
        tok = jnp.concatenate([tok[:, :1], reg, tok[:, 1:]], axis=1)
        if cfg.multi_output:
            every = len(self.blocks) // 4
            feats = []
            for i, blk in enumerate(self.blocks):
                tok = blk(tok)
                if (i + 1) % every == 0:
                    feats.append(tok)  # pre-norm taps (multi_output branch)
            return feats[:4]
        for blk in self.blocks:
            tok = blk(tok)
        tok = self.norm(tok)
        return [tok, tok, tok, tok]


# ---------------------------------------------------------------------------
# Decoder building blocks (all NHWC)
# ---------------------------------------------------------------------------


def _nearest_scale(x: jnp.ndarray, sf: float) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest', scale_factor=sf): out = floor(in*sf),
    src index = floor(dst * in / out)."""
    b, h, w, c = x.shape
    oh, ow = int(h * sf), int(w * sf)
    iy = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    ix = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, iy][:, :, ix]


class _Readout(nnx.Module):
    """DPT readout with cls+register projection (Readout, decoder5.py:868)."""

    def __init__(self, d: int, n_learn: int, *, rngs: nnx.Rngs):
        kw = dict(dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
        self.project_patch = Linear(d, d, **kw)
        self.project_learn = Linear(n_learn * d, d, use_bias=False, **kw)

    def __call__(self, patch: jnp.ndarray, learn: jnp.ndarray) -> jnp.ndarray:
        x = self.project_patch(patch) + self.project_learn(learn)
        return nnx.gelu(x, approximate=False)


class _Token2Feature(nnx.Module):
    """Readout + scale-specific resampling (Token2Feature, decoder5.py:901)."""

    def __init__(self, d: int, cout: int, scale, n_learn: int, *, rngs: nnx.Rngs):
        self.readoper = _Readout(d, n_learn, rngs=rngs)
        self.scale = scale
        if isinstance(scale, int) and scale > 1:
            self.sample = BlockUpsample(d, cout, scale, rngs=rngs)
        elif isinstance(scale, float) and scale > 1:
            self.sample = Conv(d, cout, kernel=1, padding=0, rngs=rngs)
        else:
            self.sample = None

    def __call__(self, patch: jnp.ndarray, learn: jnp.ndarray) -> jnp.ndarray:
        x = self.readoper(patch, learn)  # (B, gh, gw, d)
        if isinstance(self.scale, float) and self.scale > 1:
            x = _nearest_scale(x, self.scale)
        if self.sample is not None:
            x = self.sample(x)
        return x


class _EncoderFeature(nnx.Module):
    def __init__(self, cfg: Metric3DConfig, *, rngs: nnx.Rngs):
        d = cfg.embed_dim
        ch = cfg.feature_channels
        n_learn = 1 + cfg.num_register_tokens
        self.read_3 = _Token2Feature(d, ch[3], 1, n_learn, rngs=rngs)
        self.read_2 = _Token2Feature(d, ch[2], 1, n_learn, rngs=rngs)
        self.read_1 = _Token2Feature(d, ch[1], 2, n_learn, rngs=rngs)
        self.read_0 = _Token2Feature(d, ch[0], 7 / 2, n_learn, rngs=rngs)

    def __call__(self, pairs):
        """pairs: 4 x (patch, learn), earliest backbone tap first; read_3
        consumes the deepest tap (EncoderFeature.forward, decoder5.py:1012)."""
        return (self.read_3(*pairs[3]), self.read_2(*pairs[2]),
                self.read_1(*pairs[1]), self.read_0(*pairs[0]))


class _ConvBlock(nnx.Module):
    """Pre-activation residual conv pair (ConvBlock, decoder5.py:793).

    Quirk preserved: the reference's ``self.act`` is an *inplace* ReLU, so
    ``out = act(x)`` rewrites ``x`` itself and the closing ``x + out``
    residual actually adds ``relu(x)``, not ``x``. Published checkpoints are
    trained under that semantic, so we reproduce it functionally."""

    def __init__(self, c: int, *, rngs: nnx.Rngs):
        self.conv1 = Conv(c, c, rngs=rngs)
        self.conv2 = Conv(c, c, rngs=rngs)

    def __call__(self, x):
        a = nnx.relu(x)
        return a + self.conv2(nnx.relu(self.conv1(a)))


class _FuseBlock(nnx.Module):
    """DPT fusion (FuseBlock, decoder5.py:824): branch add → trunk →
    align-corners bilinear upsample → 1x1 out conv."""

    def __init__(self, cin: int, cout: int, *, fuse: bool = True,
                 upsample: bool = True, scale_factor: float = 2.0,
                 rngs: nnx.Rngs):
        self.way_trunk = _ConvBlock(cin, rngs=rngs)
        self.way_branch = _ConvBlock(cin, rngs=rngs) if fuse else None
        self.out_conv = Conv(cin, cout, kernel=1, padding=0, rngs=rngs)
        self.upsample = upsample
        self.scale_factor = scale_factor

    def __call__(self, x1, x2=None):
        if x2 is not None:
            x1 = x1 + self.way_branch(x2)
        out = self.way_trunk(x1)
        if self.upsample:
            b, h, w, _ = out.shape
            out = resize_bilinear_ac(out, int(h * self.scale_factor),
                                     int(w * self.scale_factor))
        return self.out_conv(out)


class _DecoderFeature(nnx.Module):
    def __init__(self, cfg: Metric3DConfig, *, rngs: nnx.Rngs):
        ch = cfg.decoder_channels
        self.upconv_3 = _FuseBlock(ch[4], ch[3], fuse=False, upsample=False,
                                   rngs=rngs)
        self.upconv_2 = _FuseBlock(ch[3], ch[2], rngs=rngs)
        self.upconv_1 = _FuseBlock(ch[2], ch[1] + 2, scale_factor=7 / 4,
                                   rngs=rngs)

    def __call__(self, x, x2, x1):
        x = self.upconv_3(x)       # 1/14
        x = self.upconv_2(x, x2)   # 1/7
        return self.upconv_1(x, x1)  # 1/4


class _ResidualBlockLN(nnx.Module):
    """ResidualBlock with norm_fn='layer' (decoder5.py:635): LN over channels."""

    def __init__(self, cin: int, c: int, *, rngs: nnx.Rngs):
        self.conv1 = Conv(cin, c, rngs=rngs)
        self.conv2 = Conv(c, c, rngs=rngs)
        self.norm1 = LayerNorm(c, eps=1e-5)
        self.norm2 = LayerNorm(c, eps=1e-5)
        if cin != c:
            self.down_conv = Conv(cin, c, kernel=1, padding=0, rngs=rngs)
            self.norm3 = LayerNorm(c, eps=1e-5)
        else:
            self.down_conv = None

    def __call__(self, x):
        y = nnx.relu(self.norm1(self.conv1(x)))
        y = nnx.relu(self.norm2(self.conv2(y)))
        if self.down_conv is not None:
            x = self.norm3(self.down_conv(x))
        return nnx.relu(x + y)


class _ContextBranch(nnx.Module):
    """Sequential(ResidualBlock, Conv) — one hidden/context tap."""

    def __init__(self, cin: int, c: int, *, rngs: nnx.Rngs):
        self.res = _ResidualBlockLN(cin, c, rngs=rngs)
        self.out = Conv(c, c, rngs=rngs)

    def __call__(self, x):
        return self.out(self.res(x))


class _ContextFeatureEncoder(nnx.Module):
    def __init__(self, cfg: Metric3DConfig, *, rngs: nnx.Rngs):
        ch = cfg.feature_channels
        hd = cfg.hidden_dim
        self.outputs04 = nnx.List([_ContextBranch(ch[0], hd, rngs=rngs)
                                   for _ in range(2)])
        self.outputs08 = nnx.List([_ContextBranch(ch[1], hd, rngs=rngs)
                                   for _ in range(2)])
        self.outputs16 = nnx.List([_ContextBranch(ch[2], hd, rngs=rngs)
                                   for _ in range(2)])

    def __call__(self, x04, x08, x16):
        return ([f(x04) for f in self.outputs04],
                [f(x08) for f in self.outputs08],
                [f(x16) for f in self.outputs16])


class _ConvGRU(nnx.Module):
    def __init__(self, hidden: int, cin: int, *, rngs: nnx.Rngs):
        self.convz = Conv(hidden + cin, hidden, rngs=rngs)
        self.convr = Conv(hidden + cin, hidden, rngs=rngs)
        self.convq = Conv(hidden + cin, hidden, rngs=rngs)

    def __call__(self, h, cz, cr, cq, *x_list):
        x = jnp.concatenate(x_list, axis=-1)
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(self.convz(hx) + cz)
        r = jax.nn.sigmoid(self.convr(hx) + cr)
        q = jnp.tanh(self.convq(jnp.concatenate([r * h, x], axis=-1)) + cq)
        return (1 - z) * h + z * q


class _FlowHead(nnx.Module):
    def __init__(self, cin: int, hidden: int, *, rngs: nnx.Rngs):
        self.conv1d = Conv(cin, hidden // 2, rngs=rngs)
        self.conv2d = Conv(hidden // 2, 2, rngs=rngs)
        self.conv1n = Conv(cin, hidden // 2, rngs=rngs)
        self.conv2n = Conv(hidden // 2, 4, rngs=rngs)

    def __call__(self, x):
        depth = self.conv2d(nnx.relu(self.conv1d(x)))
        normal = self.conv2n(nnx.relu(self.conv1n(x)))
        return jnp.concatenate([depth, normal], axis=-1)


def _pool2x(x):
    return _avg_pool(x, 3, 2, 1)


def _avg_pool(x, k: int, s: int, p: int):
    """torch avg_pool2d with count_include_pad=True."""
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (p, p), (p, p), (0, 0)])
    return out / float(k * k)


def _interp_to(x, dest):
    return resize_bilinear_ac(x, dest.shape[1], dest.shape[2])


class _UpdateBlock(nnx.Module):
    """BasicMultiUpdateBlock (decoder5.py:531): 3-level GRU cascade + flow
    head + convex-upsampling mask."""

    def __init__(self, cfg: Metric3DConfig, *, rngs: nnx.Rngs):
        hd = cfg.hidden_dim
        n = cfg.n_gru_layers
        enc = 6  # no corr volume
        self.n_gru_layers = n
        self.gru08 = _ConvGRU(hd, enc + hd * (n > 1), rngs=rngs)
        self.gru16 = _ConvGRU(hd, hd * (n == 3) + hd, rngs=rngs)
        self.gru32 = _ConvGRU(hd, hd, rngs=rngs)
        self.flow_head = _FlowHead(hd, 2 * hd, rngs=rngs)
        factor = 2 ** cfg.n_downsample
        self.mask_conv1 = Conv(hd, hd, rngs=rngs)
        self.mask_conv2 = Conv(hd, factor * factor * 9, kernel=1, padding=0,
                               rngs=rngs)

    def __call__(self, net, inp, flow=None, iter08=True, iter16=True,
                 iter32=True, update=True):
        if iter32:
            net[2] = self.gru32(net[2], *inp[2], _pool2x(net[1]))
        if iter16:
            if self.n_gru_layers > 2:
                net[1] = self.gru16(net[1], *inp[1],
                                    _interp_to(_pool2x(net[0]), net[1]),
                                    _interp_to(net[2], net[1]))
            else:
                net[1] = self.gru16(net[1], *inp[1],
                                    _interp_to(_pool2x(net[0]), net[1]))
        if iter08:
            if self.n_gru_layers > 1:
                net[0] = self.gru08(net[0], *inp[0], flow,
                                    _interp_to(net[1], net[0]))
            else:
                net[0] = self.gru08(net[0], *inp[0], flow)
        if not update:
            return net, None, None
        delta = self.flow_head(net[0])
        mask = 0.25 * self.mask_conv2(nnx.relu(self.mask_conv1(net[0])))
        return net, mask, delta


def _unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC → (B, H, W, 9, C), neighbors in F.unfold order (ky, kx)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    taps = [xp[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)]
    return jnp.stack(taps, axis=3)


def _convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray, factor: int):
    """RAFT convex upsampling (decoder5.py upsample_flow), NHWC."""
    b, h, w, d = flow.shape
    m = mask.reshape(b, h, w, 9, factor, factor)
    m = jax.nn.softmax(m, axis=3)
    taps = _unfold3x3(flow)  # (B, H, W, 9, D)
    up = jnp.einsum("bhwkuv,bhwkd->bhuwvd", m, taps)
    return up.reshape(b, h * factor, w * factor, d)


class RAFTDepthNormalDecoder(nnx.Module):
    """RAFTDepthNormalDPT5 (decoder5.py:1071), inference path."""

    def __init__(self, cfg: Metric3DConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        ch = cfg.decoder_channels
        used = ch[1]
        self.token2feature = _EncoderFeature(cfg, rngs=rngs)
        self.decoder_mono = _DecoderFeature(cfg, rngs=rngs)
        self.depth_reg_conv1 = Conv(used, cfg.num_anchors, rngs=rngs)
        self.depth_reg_conv2 = Conv(cfg.num_anchors, cfg.num_anchors,
                                    kernel=1, padding=0, rngs=rngs)
        self.normal_conv1 = Conv(used, 128, rngs=rngs)
        self.normal_conv2 = Conv(128, 128, kernel=1, padding=0, rngs=rngs)
        self.normal_conv3 = Conv(128, 128, kernel=1, padding=0, rngs=rngs)
        self.normal_conv4 = Conv(128, 3, kernel=1, padding=0, rngs=rngs)
        self.context_feature_encoder = _ContextFeatureEncoder(cfg, rngs=rngs)
        self.context_zqr_convs = nnx.List([
            Conv(cfg.hidden_dim, cfg.hidden_dim * 3, rngs=rngs)
            for _ in range(cfg.n_gru_layers)])
        self.update_block = _UpdateBlock(cfg, rngs=rngs)

    def _clamp(self, x):
        c = self.cfg
        y = nnx.relu(x - c.min_depth) + c.min_depth
        return c.max_depth - nnx.relu(c.max_depth - y)

    def _norm_normalize(self, x):
        n = jnp.sqrt(jnp.sum(x[..., :3] ** 2, axis=-1, keepdims=True)) + 1e-10
        kappa = jax.nn.elu(x[..., 3:4]) + 1.0 + 0.01
        return jnp.concatenate([x[..., :3] / n, kappa], axis=-1)

    def __call__(self, pairs):
        cfg = self.cfg
        x, x2, x1, x0 = self.token2feature(pairs)
        ref = self.decoder_mono(x, x2, x1)  # (B, h4, w4, used+2)
        feat = ref[..., :-2]
        depth_conf = ref[..., -2:-1]
        normal_conf = ref[..., -1:]

        prob = jax.nn.softmax(
            self.depth_reg_conv2(nnx.relu(self.depth_reg_conv1(feat))), axis=-1)
        bins = jnp.exp(jnp.linspace(math.log(cfg.min_depth),
                                    math.log(cfg.max_depth), cfg.num_anchors))
        d = jnp.sum(prob * bins, axis=-1, keepdims=True)
        depth_pred = (self._clamp(d) - cfg.max_depth) / cfg.regress_scale

        n = self.normal_conv2(nnx.relu(self.normal_conv1(feat)))
        n = self.normal_conv4(nnx.relu(self.normal_conv3(nnx.relu(n))))
        normal_pred = self._norm_normalize(
            jnp.concatenate([n, normal_conf], axis=-1))

        flow = jnp.concatenate([depth_pred, depth_conf, normal_pred], axis=-1)

        # Quirk preserved (decoder5.py:1344): decoder_mono's inplace ReLUs
        # mutate the shared encoder-feature tensors before the context
        # encoder reads them — x1/x2 arrive already rectified, x0 untouched.
        cnet = self.context_feature_encoder(x0, nnx.relu(x1), nnx.relu(x2))
        net = [jnp.tanh(c[0]) for c in cnet]
        inp = [nnx.relu(c[1]) for c in cnet]
        inp = [tuple(jnp.split(conv(i), 3, axis=-1))
               for i, conv in zip(inp, self.context_zqr_convs)]

        factor = 2 ** cfg.n_downsample
        up_flow = None
        for _ in range(cfg.iters):
            if cfg.n_gru_layers == 3 and cfg.slow_fast_gru:
                net, _, _ = self.update_block(net, inp, iter32=True,
                                              iter16=False, iter08=False,
                                              update=False)
            if cfg.n_gru_layers >= 2 and cfg.slow_fast_gru:
                net, _, _ = self.update_block(
                    net, inp, iter32=cfg.n_gru_layers == 3, iter16=True,
                    iter08=False, update=False)
            net, mask, delta = self.update_block(
                net, inp, flow=flow, iter32=cfg.n_gru_layers == 3,
                iter16=cfg.n_gru_layers >= 2)
            flow = flow + delta
            up_flow = _convex_upsample(flow, mask, factor)

        depth = self._clamp(up_flow[..., :1] * cfg.regress_scale + cfg.max_depth)
        conf = up_flow[..., 1:2]
        normal = self._norm_normalize(up_flow[..., 2:6])
        return depth, conf, normal


class Metric3DModel(nnx.Module):
    """encoder + decoder (DensePredModel, dense_pipeline.py:6)."""

    def __init__(self, cfg: Optional[Metric3DConfig] = None, *,
                 rngs: Optional[nnx.Rngs] = None):
        cfg = cfg or Metric3DConfig.small()
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = _M3DViT(cfg, rngs=rngs)
        self.decoder = RAFTDepthNormalDecoder(cfg, rngs=rngs)

    def __call__(self, x: jnp.ndarray):
        """x: NHWC normalized image, H/W multiples of patch_size →
        (depth (B,H',W',1), confidence, normal+kappa (B,H',W',4)) where
        H' = H * factor / 4-equivalent of the reference layout."""
        cfg = self.cfg
        b, H, W, _ = x.shape
        feats = self.encoder(x)
        gh, gw = H // cfg.patch_size, W // cfg.patch_size
        n_learn = 1 + cfg.num_register_tokens
        pairs = [
            (tok[:, n_learn:].reshape(b, gh, gw, cfg.embed_dim),
             tok[:, :n_learn].reshape(b, 1, 1, n_learn * cfg.embed_dim))
            for tok in feats
        ]
        return self.decoder(pairs)


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------

_SEQ_RENAMES = [
    ("decoder.depth_regressor.0.", "decoder.depth_reg_conv1."),
    ("decoder.depth_regressor.2.", "decoder.depth_reg_conv2."),
    ("decoder.normal_predictor.0.", "decoder.normal_conv1."),
    ("decoder.normal_predictor.2.", "decoder.normal_conv2."),
    ("decoder.normal_predictor.4.", "decoder.normal_conv3."),
    ("decoder.normal_predictor.6.", "decoder.normal_conv4."),
    ("decoder.update_block.mask.0.", "decoder.update_block.mask_conv1."),
    ("decoder.update_block.mask.2.", "decoder.update_block.mask_conv2."),
]


def convert_metric3d_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """JUGGHM/Metric3D ``model_state_dict`` → our attribute paths (values keep
    torch layout; state_mapping infers conv/linear transposes)."""
    import re

    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        v = np.asarray(v)
        for pre in ("module.", "model.", "depth_model."):
            if k.startswith(pre):
                k = k[len(pre):]
        if k.startswith("encoder."):
            r = k[len("encoder."):]
            if r.startswith("mask_token"):
                continue
            # chunked blocks: blocks.<chunk>.<idx>. → blocks.<idx>.
            r = re.sub(r"^blocks\.\d+\.(\d+)\.", r"blocks.\1.", r)
            r = r.replace("patch_embed.proj.weight", "patch_embed.kernel")
            r = r.replace("patch_embed.proj.bias", "patch_embed.bias")
            for lin in ("attn.qkv", "attn.proj", "mlp.fc1", "mlp.fc2",
                        "mlp.w12", "mlp.w3"):
                r = r.replace(f"{lin}.weight", f"{lin}.kernel")
            out[f"encoder.{r}"] = v
            continue
        if not k.startswith("decoder."):
            continue
        for a, b in _SEQ_RENAMES:
            if k.startswith(a):
                k = b + k[len(a):]
        # token2feature readouts: project_* are Linears
        k = k.replace("readoper.project_patch.weight",
                      "readoper.project_patch.kernel")
        k = k.replace("readoper.project_learn.weight",
                      "readoper.project_learn.kernel")
        # read_0 sample is Sequential(conv1x1); read_1 a ConvTranspose2d
        k = k.replace(".sample.0.", ".sample.")
        if "read_1.sample.weight" in k and v.ndim == 4:
            # ConvTranspose2d (in, out, kh, kw) → BlockUpsample w (kh, kw, in, out)
            out[k.replace(".sample.weight", ".sample.w")] = v.transpose(2, 3, 0, 1)
            continue
        # context branches: Sequential(ResidualBlock, Conv) → .res / .out
        k = re.sub(r"(outputs(?:04|08|16)\.\d+)\.0\.", r"\1.res.", k)
        k = re.sub(r"(outputs(?:04|08|16)\.\d+)\.1\.", r"\1.out.", k)
        k = k.replace(".res.downsample.0.", ".res.down_conv.")
        k = k.replace(".res.downsample.1.", ".res.norm3.")
        # Remaining 4D .weight leaves are convs → our Conv.kernel (HWIO via
        # state_mapping's inferred transpose). LayerNorm .weight/.bias match.
        if k.endswith(".weight") and v.ndim == 4:
            k = k[: -len(".weight")] + ".kernel"
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# Preprocessor
# ---------------------------------------------------------------------------


def _gray_to_colormap(img: np.ndarray, cmap: str = "Greys") -> np.ndarray:
    """metric3d __init__.py:113 gray_to_colormap via matplotlib."""
    import matplotlib

    img = np.maximum(img, 0.0)
    mask_invalid = img < 1e-10
    img = img / (img.max() + 1e-8)
    norm = matplotlib.colors.Normalize(vmin=0, vmax=1.1)
    cm = matplotlib.colormaps[cmap]
    colored = (cm(norm(img))[:, :, :3] * 255).astype(np.uint8)
    colored[mask_invalid] = 0
    return colored


@preprocessor_registry.register("metric3d", aliases=("Metric3DDetector",
                                                     "metric3d_normal"))
class Metric3DPreprocessor(BasePreprocessor):
    """Metric depth (and normals) via Metric3D v2 (reference
    src/preprocess/metric3d/__init__.py). output_type: depth | normal."""

    name = "metric3d"
    hf_repo = "JUGGHM/Metric3D"
    params_schema = {"detect_resolution": 512, "fx": 1000.0, "fy": 1000.0,
                     "output_type": "depth"}

    def __init__(self, model: Optional[Metric3DModel] = None,
                 variant: str = "small"):
        self._model = model
        self._variant = variant
        self._jit = None

    def setup(self) -> None:
        if self._model is not None:
            return
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

        sd = load_preprocessor_weights(
            f"metric_depth_vit_{self._variant}_800k", hf_repo=self.hf_repo,
            hf_filename=f"metric_depth_vit_{self._variant}_800k.pth")
        cfg = {"large": Metric3DConfig.large, "giant2": Metric3DConfig.giant2,
               "small": Metric3DConfig.small}[self._variant]()
        self._model = Metric3DModel(cfg, rngs=nnx.Rngs(0))
        apply_state_dict(self._model, convert_metric3d_keys(sd), strict=False)

    def _fn(self):
        if self._jit is None:
            graphdef, state = nnx.split(self._model)

            @jax.jit
            def run(state, x):
                return nnx.merge(graphdef, state)(x)

            self._jit = (run, state)
        return self._jit

    def process_frame(self, frame: Frame, detect_resolution: int = 512,
                      fx: float = 1000.0, fy: float = 1000.0,
                      output_type: str = "depth", **_) -> Frame:
        import cv2

        cfg = self._model.cfg
        h0, w0 = frame.shape[:2]
        crop_h, crop_w = cfg.crop_size
        # canonical-space resize (do_test.py transform_test_data_scalecano):
        # fx=fy=1000 keeps the canonical ratio at 1; resize to fit the crop.
        scale = min(crop_h / h0, crop_w / w0)
        rh, rw = int(scale * h0), int(scale * w0)
        img = cv2.resize(np.asarray(frame)[..., :3], (rw, rh),
                         interpolation=cv2.INTER_LINEAR)
        pad_h, pad_w = crop_h - rh, crop_w - rw
        pt, pl = pad_h // 2, pad_w // 2
        pb, pr = pad_h - pt, pad_w - pl
        img = cv2.copyMakeBorder(img, pt, pb, pl, pr, cv2.BORDER_CONSTANT,
                                 value=_MEAN.tolist())
        x = (img.astype(np.float32) - _MEAN) / _STD
        run, state = self._fn()
        depth, conf, normal = run(state, jnp.asarray(x)[None])
        depth = np.asarray(depth)[0, pt:crop_h - pb, pl:crop_w - pr, 0]
        if output_type == "normal":
            nrm = np.asarray(normal)[0, pt:crop_h - pb, pl:crop_w - pr, :3]
            nrm = nrm / (np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-8)
            vis = (nrm * 127 + 128).astype(np.uint8)
            out = 255 - vis  # reference inverts for ControlNet (__init__.py:163)
        else:
            out = _gray_to_colormap(depth, "Greys")
        return cv2.resize(out, (w0, h0), interpolation=cv2.INTER_LINEAR)
