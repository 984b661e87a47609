"""GMFlow / UniMatch optical flow in JAX.

Counterpart of the reference's ``src/preprocess/unimatch`` (UniMatch,
unimatch/unimatch.py:21, flow task): a 6-level residual CNN encoder with
non-affine instance norm (backbone.py:59), a 6-block single-head feature
transformer with swin split-window attention and DETR sine positions
(transformer.py:232, attention.py:48, position.py:9), global/local
correlation softmax matching (matching.py:7/47), self-attention flow
propagation (attention.py:184) and RAFT-style convex upsampling
(utils.py:165). Supports the published gmflow-scale1 and gmflow-scale2
configurations plus the scale2-regrefine6 tier (reference
__init__.py:115-158): a RAFT-style BasicUpdateBlock (reg_refine.py) iterates
6 local-correlation GRU refinements on the final flow and convex-upsamples
with its predicted mask.

Everything runs inside one jit per image-shape; flow visualization uses the
standard Middlebury color wheel (utils/flow_viz.py).
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.base import (
    BasePreprocessor,
    Frame,
    preprocessor_registry,
)

logger = logging.getLogger(__name__)

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


# -- primitives ------------------------------------------------------------------------


def _conv2d(x, w, stride=1, pad=0, dilation=1):
    pad = pad if isinstance(pad, tuple) else (pad, pad)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _instance_norm(x, eps=1e-5):
    """Non-affine InstanceNorm2d (backbone norms carry no parameters)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _Conv(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, pad=0, dilation=1,
                 bias=True, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        kh, kw = k if isinstance(k, tuple) else (k, k)
        self.kernel = nnx.Param(init(rngs.params(), (kh, kw, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32)) if bias else None
        self.stride, self.pad, self.dilation = stride, pad, dilation

    def __call__(self, x):
        y = _conv2d(x, self.kernel.value, self.stride, self.pad, self.dilation)
        return y if self.bias is None else y + self.bias.value


class _LinearNB(nnx.Module):
    def __init__(self, cin, cout, bias=False, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32)) if bias else None

    def __call__(self, x):
        y = x @ self.kernel.value
        return y if self.bias is None else y + self.bias.value


class _LayerNorm(nnx.Module):
    def __init__(self, dim, *, rngs: nnx.Rngs):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))

    def __call__(self, x):
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return ((x - mean) * jax.lax.rsqrt(var + 1e-5)
                * self.weight.value + self.bias.value)


# -- backbone --------------------------------------------------------------------------


class _ResidualBlock(nnx.Module):
    """backbone.py:6 — two 3×3 convs (no bias) + instance norms + skip."""

    def __init__(self, cin, cout, stride=1, *, rngs: nnx.Rngs):
        self.conv1 = _Conv(cin, cout, 3, stride, 1, bias=False, rngs=rngs)
        self.conv2 = _Conv(cout, cout, 3, 1, 1, bias=False, rngs=rngs)
        self.downsample = (_Conv(cin, cout, 1, stride, 0, bias=True, rngs=rngs)
                           if stride != 1 or cin != cout else None)

    def __call__(self, x):
        y = jax.nn.relu(_instance_norm(self.conv1(x)))
        y = jax.nn.relu(_instance_norm(self.conv2(y)))
        if self.downsample is not None:
            x = _instance_norm(self.downsample(x))
        return jax.nn.relu(x + y)


class CNNEncoder(nnx.Module):
    """backbone.py:59 — 1/2, 1/4, then 1/8 (scale1) or 1/4 + trident
    multi-scale (scale2)."""

    def __init__(self, output_dim=128, num_output_scales=1, *,
                 rngs: nnx.Rngs):
        self.num_branch = num_output_scales
        dims = [64, 96, 128]
        self.conv1 = _Conv(3, dims[0], 7, 2, 3, bias=False, rngs=rngs)
        self.layer1 = nnx.List([
            _ResidualBlock(dims[0], dims[0], rngs=rngs),
            _ResidualBlock(dims[0], dims[0], rngs=rngs)])
        self.layer2 = nnx.List([
            _ResidualBlock(dims[0], dims[1], 2, rngs=rngs),
            _ResidualBlock(dims[1], dims[1], rngs=rngs)])
        stride = 2 if num_output_scales == 1 else 1
        self.layer3 = nnx.List([
            _ResidualBlock(dims[1], dims[2], stride, rngs=rngs),
            _ResidualBlock(dims[2], dims[2], rngs=rngs)])
        self.conv2 = _Conv(dims[2], output_dim, 1, bias=True, rngs=rngs)
        if num_output_scales > 1:
            # trident conv: one shared 3×3 kernel applied at strides 1, 2
            init = nnx.initializers.lecun_normal()
            self.trident_kernel = nnx.Param(
                init(rngs.params(), (3, 3, output_dim, output_dim), jnp.float32))
        else:
            self.trident_kernel = None

    def __call__(self, x) -> List[jnp.ndarray]:
        x = jax.nn.relu(_instance_norm(self.conv1(x)))
        for blk in self.layer1:
            x = blk(x)
        for blk in self.layer2:
            x = blk(x)
        for blk in self.layer3:
            x = blk(x)
        x = self.conv2(x)
        if self.trident_kernel is None:
            return [x]
        k = self.trident_kernel.value
        return [_conv2d(x, k, stride=s, pad=1) for s in (1, 2)]


# -- positions / swin helpers ----------------------------------------------------------


def sine_position(h: int, w: int, dim: int) -> np.ndarray:
    """DETR PositionEmbeddingSine (position.py:9) → [h, w, dim] numpy."""
    half = dim // 2
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    scale = 2 * math.pi
    y = y / (y[-1:, :] + 1e-6) * scale
    x = x / (x[:, -1:] + 1e-6) * scale
    dim_t = np.arange(half, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / half)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])], -1
                  ).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])], -1
                  ).reshape(h, w, -1)
    return np.concatenate([py, px], axis=-1)


def _split_windows(x, k):
    """[B, H, W, C] → [B·k·k, H/k, W/k, C] (utils.py:37)."""
    b, h, w, c = x.shape
    x = x.reshape(b, k, h // k, k, w // k, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b * k * k, h // k, w // k, c)


def _merge_windows(x, k, h, w):
    b = x.shape[0] // (k * k)
    c = x.shape[-1]
    x = x.reshape(b, k, k, h // k, w // k, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def swin_shift_mask(h: int, w: int, k: int) -> np.ndarray:
    """utils.py:101 — [k·k, hw/k², hw/k²] additive mask for shifted windows."""
    wh, ww = h // k, w // k
    sh, sw = wh // 2, ww // 2
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for ws in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.reshape(1, k, wh, k, ww, 1).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(k * k, wh * ww)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _attend(q, k, v, mask=None):
    c = q.shape[-1]
    scores = jnp.einsum("blc,bmc->blm", q, k) / math.sqrt(c)
    if mask is not None:
        scores = scores + mask
    return jnp.einsum("blm,bmc->blc", jax.nn.softmax(scores, axis=-1), v)


def _swin_attention(q, k, v, h, w, num_splits, with_shift, attn_mask):
    """attention.py:48 single_head_split_window_attention. q/k/v [B, L, C]."""
    b, _, c = q.shape
    if num_splits <= 1:
        return _attend(q, k, v)
    qs = q.reshape(b, h, w, c)
    ks = k.reshape(b, h, w, c)
    vs = v.reshape(b, h, w, c)
    if with_shift:
        sh, sw = (h // num_splits) // 2, (w // num_splits) // 2
        qs = jnp.roll(qs, (-sh, -sw), axis=(1, 2))
        ks = jnp.roll(ks, (-sh, -sw), axis=(1, 2))
        vs = jnp.roll(vs, (-sh, -sw), axis=(1, 2))
    qw = _split_windows(qs, num_splits).reshape(b * num_splits ** 2, -1, c)
    kw = _split_windows(ks, num_splits).reshape(b * num_splits ** 2, -1, c)
    vw = _split_windows(vs, num_splits).reshape(b * num_splits ** 2, -1, c)
    mask = None
    if with_shift and attn_mask is not None:
        mask = jnp.tile(attn_mask, (b, 1, 1))
    out = _attend(qw, kw, vw, mask)
    out = _merge_windows(
        out.reshape(b * num_splits ** 2, h // num_splits, w // num_splits, c),
        num_splits, h, w)
    if with_shift:
        out = jnp.roll(out, (sh, sw), axis=(1, 2))
    return out.reshape(b, -1, c)


# -- transformer -----------------------------------------------------------------------


class TransformerLayer(nnx.Module):
    def __init__(self, d=128, no_ffn=False, expansion=4, *, rngs: nnx.Rngs):
        self.q_proj = _LinearNB(d, d, rngs=rngs)
        self.k_proj = _LinearNB(d, d, rngs=rngs)
        self.v_proj = _LinearNB(d, d, rngs=rngs)
        self.merge = _LinearNB(d, d, rngs=rngs)
        self.norm1 = _LayerNorm(d, rngs=rngs)
        self.no_ffn = no_ffn
        if not no_ffn:
            self.mlp0 = _LinearNB(2 * d, 2 * d * expansion, rngs=rngs)
            self.mlp2 = _LinearNB(2 * d * expansion, d, rngs=rngs)
            self.norm2 = _LayerNorm(d, rngs=rngs)

    def __call__(self, source, target, h, w, num_splits, with_shift,
                 attn_mask):
        q = self.q_proj(source)
        k = self.k_proj(target)
        v = self.v_proj(target)
        msg = _swin_attention(q, k, v, h, w, num_splits, with_shift, attn_mask)
        msg = self.norm1(self.merge(msg))
        if not self.no_ffn:
            msg = self.mlp2(jax.nn.gelu(
                self.mlp0(jnp.concatenate([source, msg], -1)),
                approximate=False))
            msg = self.norm2(msg)
        return source + msg


class TransformerBlock(nnx.Module):
    def __init__(self, d=128, expansion=4, *, rngs: nnx.Rngs):
        self.self_attn = TransformerLayer(d, no_ffn=True, expansion=expansion,
                                          rngs=rngs)
        self.cross_attn_ffn = TransformerLayer(d, expansion=expansion,
                                               rngs=rngs)

    def __call__(self, source, target, h, w, num_splits, with_shift,
                 attn_mask):
        source = self.self_attn(source, source, h, w, num_splits, with_shift,
                                attn_mask)
        return self.cross_attn_ffn(source, target, h, w, num_splits,
                                   with_shift, attn_mask)


# -- matching / propagation ------------------------------------------------------------


def _coords_grid(h, w):
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    return np.stack([xs, ys], axis=-1)  # [H, W, 2] (x, y)


def global_correlation_flow(f0, f1):
    """matching.py:7 — softmax over all-pairs correlation → expected
    correspondence. f0/f1 [B, H, W, C] → flow [B, H, W, 2]."""
    b, h, w, c = f0.shape
    corr = jnp.einsum("bic,bjc->bij", f0.reshape(b, -1, c),
                      f1.reshape(b, -1, c)) / math.sqrt(c)
    prob = jax.nn.softmax(corr, axis=-1)
    grid = jnp.asarray(_coords_grid(h, w).reshape(-1, 2))
    corres = jnp.einsum("bij,jk->bik", prob, grid).reshape(b, h, w, 2)
    return corres - grid.reshape(1, h, w, 2)


def _resize_align_corners(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """F.interpolate(..., mode='bilinear', align_corners=True)."""
    b, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b_ = x[:, y0][:, :, x1]
    c_ = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (a * (1 - fy) * (1 - fx) + b_ * (1 - fy) * fx
            + c_ * fy * (1 - fx) + d * fy * fx)


def _bilinear_sample(img, coords):
    """img [B, H, W, C], coords [B, H, W, 2] absolute (x, y), zero pad."""
    b, h, w, c = img.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def gather(ix, iy):
        valid = ((ix >= 0) & (ix < w) & (iy >= 0) & (iy < h))
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, h * w, c)
        idx = iyc * w + ixc
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1).astype(jnp.int32), axis=1)
        vals = vals.reshape(b, *ix.shape[1:], c)
        return vals * valid[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    return (v00 * ((1 - fx) * (1 - fy))[..., None]
            + v01 * (fx * (1 - fy))[..., None]
            + v10 * ((1 - fx) * fy)[..., None]
            + v11 * (fx * fy)[..., None])


def flow_warp(feature, flow):
    """geometry.py:74 — sample feature at coords + flow."""
    b, h, w, _ = feature.shape
    grid = jnp.asarray(_coords_grid(h, w))[None]
    return _bilinear_sample(feature, grid + flow)


def local_correlation_flow(f0, f1, radius):
    """matching.py:47 — correlation over a (2R+1)² window."""
    b, h, w, c = f0.shape
    grid = jnp.asarray(_coords_grid(h, w))[None]  # [1, H, W, 2]
    offs = np.stack(np.meshgrid(
        np.arange(-radius, radius + 1, dtype=np.float32),
        np.arange(-radius, radius + 1, dtype=np.float32), indexing="ij"),
        axis=-1)[..., ::-1].reshape(-1, 2)  # [(2R+1)², 2] (x, y)
    n = offs.shape[0]
    corrs = []
    coords_all = []
    for i in range(n):
        coords = grid + jnp.asarray(offs[i])
        sampled = _bilinear_sample(f1, jnp.broadcast_to(coords, f1.shape[:3] + (2,)))
        corr = (f0 * sampled).sum(-1) / math.sqrt(c)
        valid = ((coords[..., 0] >= 0) & (coords[..., 0] < w)
                 & (coords[..., 1] >= 0) & (coords[..., 1] < h))
        corr = jnp.where(valid, corr, -1e9)
        corrs.append(corr)
        coords_all.append(jnp.broadcast_to(coords, (b, h, w, 2)))
    corr = jnp.stack(corrs, axis=-1)               # [B, H, W, N]
    coords = jnp.stack(coords_all, axis=-2)        # [B, H, W, N, 2]
    prob = jax.nn.softmax(corr, axis=-1)
    corres = (prob[..., None] * coords).sum(-2)
    return corres - jnp.asarray(_coords_grid(h, w))[None]


class SelfAttnPropagation(nnx.Module):
    """attention.py:184 — flow smoothing: q/k from feature, v = flow."""

    def __init__(self, dim, *, rngs: nnx.Rngs):
        self.q_proj = _LinearNB(dim, dim, bias=True, rngs=rngs)
        self.k_proj = _LinearNB(dim, dim, bias=True, rngs=rngs)

    def __call__(self, feature, flow, local_radius: int = 0):
        b, h, w, c = feature.shape
        if local_radius > 0:
            return self._local(feature, flow, local_radius)
        q = self.q_proj(feature.reshape(b, -1, c))
        k = self.k_proj(q)  # reference quirk: k projects the projected q
        v = flow.reshape(b, -1, flow.shape[-1])
        out = _attend(q, k, v)
        return out.reshape(b, h, w, -1)

    def _local(self, feature, flow, radius):
        b, h, w, c = feature.shape
        ksz = 2 * radius + 1
        q = self.q_proj(feature.reshape(b, -1, c)).reshape(b, h, w, c)
        kf = self.k_proj(feature.reshape(b, -1, c)).reshape(b, h, w, c)
        kp = jnp.pad(kf, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
        vp = jnp.pad(flow, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
        scores = []
        vals = []
        for dy in range(ksz):
            for dx in range(ksz):
                kwin = kp[:, dy:dy + h, dx:dx + w]
                scores.append((q * kwin).sum(-1) / math.sqrt(c))
                vals.append(vp[:, dy:dy + h, dx:dx + w])
        scores = jnp.stack(scores, axis=-1)           # [B, H, W, K²]
        vals = jnp.stack(vals, axis=-2)               # [B, H, W, K², 2]
        prob = jax.nn.softmax(scores, axis=-1)
        return (prob[..., None] * vals).sum(-2)


def upsample_flow_with_mask(flow, mask, factor):
    """utils.py:165 — RAFT convex upsampling. flow [B, H, W, 2],
    mask [B, H, W, 9·factor²]."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, factor, factor)
    mask = jax.nn.softmax(mask, axis=3)
    fl = jnp.pad(flow * factor, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = []
    for dy in range(3):
        for dx in range(3):
            neigh.append(fl[:, dy:dy + h, dx:dx + w])
    neigh = jnp.stack(neigh, axis=3)                  # [B, H, W, 9, 2]
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, neigh)  # [B,H,W,u,v,2]
    up = up.transpose(0, 1, 3, 2, 4, 5)               # [B, H, u, W, v, 2]
    return up.reshape(b, h * factor, w * factor, 2)


def local_correlation_with_flow(f0, f1, flow, radius: int = 4):
    """matching.py:117 — RAW local correlation sampled at coords+flow with
    zero padding (the reg_refine stage's cost volume). → [B, H, W, (2R+1)²]"""
    b, h, w, c = f0.shape
    grid = jnp.asarray(_coords_grid(h, w))[None]  # [1, H, W, 2] (x, y)
    offs = np.stack(np.meshgrid(
        np.arange(-radius, radius + 1, dtype=np.float32),
        np.arange(-radius, radius + 1, dtype=np.float32), indexing="ij"),
        axis=-1)[..., ::-1].reshape(-1, 2)
    corrs = []
    base = grid + flow
    for i in range(offs.shape[0]):
        coords = base + jnp.asarray(offs[i])
        sampled = _bilinear_sample(f1, jnp.broadcast_to(coords, (b, h, w, 2)))
        valid = ((coords[..., 0] >= 0) & (coords[..., 0] < w)
                 & (coords[..., 1] >= 0) & (coords[..., 1] < h))
        corr = (f0 * sampled).sum(-1) / math.sqrt(c)
        corrs.append(jnp.where(valid, corr, 0.0))  # zero padding_mode
    return jnp.stack(corrs, axis=-1)


class _FlowHead(nnx.Module):
    """reg_refine.py:6."""

    def __init__(self, input_dim=128, hidden_dim=256, out_dim=2, *, rngs):
        self.conv1 = _Conv(input_dim, hidden_dim, 3, 1, 1, rngs=rngs)
        self.conv2 = _Conv(hidden_dim, out_dim, 3, 1, 1, rngs=rngs)

    def __call__(self, x):
        return self.conv2(jax.nn.relu(self.conv1(x)))


class _SepConvGRU(nnx.Module):
    """reg_refine.py:25 — separable (1×5)+(5×1) conv GRU."""

    def __init__(self, hidden_dim=128, input_dim=256, k=5, *, rngs):
        cin = hidden_dim + input_dim
        self.convz1 = _Conv(cin, hidden_dim, (1, k), 1, (0, (k - 1) // 2), rngs=rngs)
        self.convr1 = _Conv(cin, hidden_dim, (1, k), 1, (0, (k - 1) // 2), rngs=rngs)
        self.convq1 = _Conv(cin, hidden_dim, (1, k), 1, (0, (k - 1) // 2), rngs=rngs)
        self.convz2 = _Conv(cin, hidden_dim, (k, 1), 1, ((k - 1) // 2, 0), rngs=rngs)
        self.convr2 = _Conv(cin, hidden_dim, (k, 1), 1, ((k - 1) // 2, 0), rngs=rngs)
        self.convq2 = _Conv(cin, hidden_dim, (k, 1), 1, ((k - 1) // 2, 0), rngs=rngs)

    def __call__(self, h, x):
        for convz, convr, convq in ((self.convz1, self.convr1, self.convq1),
                                    (self.convz2, self.convr2, self.convq2)):
            hx = jnp.concatenate([h, x], axis=-1)
            z = jax.nn.sigmoid(convz(hx))
            r = jax.nn.sigmoid(convr(hx))
            q = jnp.tanh(convq(jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class _BasicMotionEncoder(nnx.Module):
    """reg_refine.py:73."""

    def __init__(self, corr_channels=81, flow_channels=2, *, rngs):
        self.convc1 = _Conv(corr_channels, 256, 1, rngs=rngs)
        self.convc2 = _Conv(256, 192, 3, 1, 1, rngs=rngs)
        self.convf1 = _Conv(flow_channels, 128, 7, 1, 3, rngs=rngs)
        self.convf2 = _Conv(128, 64, 3, 1, 1, rngs=rngs)
        self.conv = _Conv(64 + 192, 128 - flow_channels, 3, 1, 1, rngs=rngs)

    def __call__(self, flow, corr):
        cor = jax.nn.relu(self.convc2(jax.nn.relu(self.convc1(corr))))
        flo = jax.nn.relu(self.convf2(jax.nn.relu(self.convf1(flow))))
        out = jax.nn.relu(self.conv(jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nnx.Module):
    """reg_refine.py:98 — RAFT-style GRU update with convex-upsample mask."""

    def __init__(self, corr_channels=81, hidden_dim=128, context_dim=128,
                 downsample_factor=4, flow_dim=2, *, rngs):
        self.encoder = _BasicMotionEncoder(corr_channels, flow_dim, rngs=rngs)
        self.gru = _SepConvGRU(hidden_dim, context_dim + hidden_dim, rngs=rngs)
        self.flow_head = _FlowHead(hidden_dim, 256, flow_dim, rngs=rngs)
        self.mask_conv1 = _Conv(hidden_dim, 256, 3, 1, 1, rngs=rngs)
        self.mask_conv2 = _Conv(256, downsample_factor ** 2 * 9, 1, rngs=rngs)

    def __call__(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = self.gru(net, inp)
        delta = self.flow_head(net)
        mask = self.mask_conv2(jax.nn.relu(self.mask_conv1(net)))
        return net, mask, delta


# -- model -----------------------------------------------------------------------------


@dataclass
class GMFlowConfig:
    num_scales: int = 1
    feature_channels: int = 128
    upsample_factor: int = 8
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    attn_splits_list: Tuple[int, ...] = (2,)
    corr_radius_list: Tuple[int, ...] = (-1,)
    prop_radius_list: Tuple[int, ...] = (-1,)
    reg_refine: bool = False       # unimatch.py:30 (scale2-regrefine6 tier)
    num_reg_refine: int = 1


class GMFlow(nnx.Module):
    """UniMatch flow path (unimatch.py:21, reg_refine=False)."""

    def __init__(self, cfg: GMFlowConfig = None, *, rngs: Optional[nnx.Rngs] = None):
        cfg = cfg or GMFlowConfig()
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        d = cfg.feature_channels
        self.backbone = CNNEncoder(d, cfg.num_scales, rngs=rngs)
        self.layers = nnx.List([
            TransformerBlock(d, cfg.ffn_dim_expansion, rngs=rngs)
            for _ in range(cfg.num_transformer_layers)])
        self.feature_flow_attn = SelfAttnPropagation(d, rngs=rngs)
        if not cfg.reg_refine:
            # standard RAFT-style upsampler (unimatch.py:56: only built when
            # reg_refine is off for the flow task)
            self.upsampler_conv1 = _Conv(2 + d, 256, 3, 1, 1, rngs=rngs)
            self.upsampler_conv2 = _Conv(256, cfg.upsample_factor ** 2 * 9, 1,
                                         rngs=rngs)
        else:
            self.upsampler_conv1 = self.upsampler_conv2 = None
            self.refine_proj = _Conv(d, 256, 1, rngs=rngs)
            self.refine = BasicUpdateBlock(
                corr_channels=(2 * 4 + 1) ** 2,
                downsample_factor=cfg.upsample_factor, rngs=rngs)

    def _transform(self, f0, f1, h, w, num_splits):
        attn_mask = None
        if num_splits > 1:
            attn_mask = jnp.asarray(swin_shift_mask(h, w, num_splits))
        c = f0.shape[-1]
        cat0 = jnp.concatenate([f0, f1], 0).reshape(-1, h * w, c)
        cat1 = jnp.concatenate([f1, f0], 0).reshape(-1, h * w, c)
        for i, layer in enumerate(self.layers):
            with_shift = num_splits > 1 and i % 2 == 1
            cat0 = layer(cat0, cat1, h, w, num_splits, with_shift, attn_mask)
            half = cat0.shape[0] // 2
            cat1 = jnp.concatenate([cat0[half:], cat0[:half]], 0)
        half = cat0.shape[0] // 2
        return (cat0[:half].reshape(-1, h, w, c),
                cat0[half:].reshape(-1, h, w, c))

    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        """img0/img1 [B, H, W, 3] in 0..255 → flow [B, H, W, 2]."""
        cfg = self.cfg
        x = (jnp.concatenate([img0, img1], 0) / 255.0 - _MEAN) / _STD
        feats = self.backbone(x)[::-1]  # low → high res
        flow = None
        for scale_idx in range(cfg.num_scales):
            f = feats[scale_idx]
            b2 = f.shape[0] // 2
            f0, f1 = f[:b2], f[b2:]
            f0_ori, f1_ori = f0, f1  # pre-warp/pos features (unimatch.py:180)
            h, w = f0.shape[1:3]
            if scale_idx > 0:
                # F.interpolate scale 2 with align_corners=True (unimatch.py:196)
                flow = _resize_align_corners(flow, h, w) * 2.0
                f1 = flow_warp(f1, flow)
            splits = cfg.attn_splits_list[scale_idx]
            pos = jnp.asarray(sine_position(
                h // splits if splits > 1 else h,
                w // splits if splits > 1 else w, cfg.feature_channels))
            if splits > 1:
                f0 = _merge_windows(
                    _split_windows(f0, splits) + pos, splits, h, w)
                f1 = _merge_windows(
                    _split_windows(f1, splits) + pos, splits, h, w)
            else:
                f0 = f0 + pos
                f1 = f1 + pos
            f0, f1 = self._transform(f0, f1, h, w, splits)
            radius = cfg.corr_radius_list[scale_idx]
            if radius == -1:
                pred = global_correlation_flow(f0, f1)
            else:
                pred = local_correlation_flow(f0, f1, radius)
            flow = pred if flow is None else flow + pred
            prop_radius = cfg.prop_radius_list[scale_idx]
            flow = self.feature_flow_attn(
                f0, flow, local_radius=max(prop_radius, 0))
            if scale_idx == cfg.num_scales - 1:
                if not cfg.reg_refine:
                    concat = jnp.concatenate([flow, f0], axis=-1)
                    mask = self.upsampler_conv2(
                        jax.nn.relu(self.upsampler_conv1(concat)))
                    flow = upsample_flow_with_mask(flow, mask,
                                                   cfg.upsample_factor)
                else:
                    # task-specific local regression refinement
                    # (unimatch.py:345-455, flow task): RAFT update block over
                    # a raw local cost volume at coords+flow; GRU state
                    # restarts from refine_proj each iteration (:401) exactly
                    # like the reference; the LAST iteration's mask drives the
                    # convex upsample.
                    proj = self.refine_proj(f0)
                    half = proj.shape[-1] // 2
                    up_mask = None
                    for _ in range(cfg.num_reg_refine):
                        corr = local_correlation_with_flow(
                            f0_ori, f1_ori, flow, radius=4)
                        net = jnp.tanh(proj[..., :half])
                        inp = jax.nn.relu(proj[..., half:])
                        net, up_mask, dflow = self.refine(net, inp, corr, flow)
                        flow = flow + dflow
                    flow = upsample_flow_with_mask(flow, up_mask,
                                                   cfg.upsample_factor)
        return flow


GMFLOW_CONFIGS = {
    # reference __init__.py:115-158
    "gmflow-scale1": GMFlowConfig(),
    "gmflow-scale2": GMFlowConfig(
        num_scales=2, upsample_factor=4, attn_splits_list=(2, 8),
        corr_radius_list=(-1, 4), prop_radius_list=(-1, 1)),
    "gmflow-scale2-regrefine6": GMFlowConfig(
        num_scales=2, upsample_factor=4, attn_splits_list=(2, 8),
        corr_radius_list=(-1, 4), prop_radius_list=(-1, 1),
        reg_refine=True, num_reg_refine=6),
}


def convert_gmflow_keys(sd: dict) -> dict:
    """torch UniMatch state dict → flat jax paths (HWIO kernels)."""
    out = {}

    def conv(t, j):
        out[f"{j}.kernel"] = np.asarray(sd[f"{t}.weight"],
                                        np.float32).transpose(2, 3, 1, 0)
        if f"{t}.bias" in sd:
            out[f"{j}.bias"] = np.asarray(sd[f"{t}.bias"], np.float32)

    def linear(t, j):
        out[f"{j}.kernel"] = np.asarray(sd[f"{t}.weight"], np.float32).T
        if f"{t}.bias" in sd:
            out[f"{j}.bias"] = np.asarray(sd[f"{t}.bias"], np.float32)

    conv("backbone.conv1", "backbone.conv1")
    for li, layer in enumerate(("layer1", "layer2", "layer3"), 0):
        for bi in range(2):
            t = f"backbone.{layer}.{bi}"
            j = f"backbone.{layer}.{bi}"
            conv(f"{t}.conv1", f"{j}.conv1")
            conv(f"{t}.conv2", f"{j}.conv2")
            if f"{t}.downsample.0.weight" in sd:
                conv(f"{t}.downsample.0", f"{j}.downsample")
    conv("backbone.conv2", "backbone.conv2")
    if "backbone.trident_conv.weight" in sd:
        out["backbone.trident_kernel"] = np.asarray(
            sd["backbone.trident_conv.weight"],
            np.float32).transpose(2, 3, 1, 0)
    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("transformer.layers."))
    for i in range(n_layers):
        for part, ours in (("self_attn", "self_attn"),
                           ("cross_attn_ffn", "cross_attn_ffn")):
            t = f"transformer.layers.{i}.{part}"
            j = f"layers.{i}.{ours}"
            for p in ("q_proj", "k_proj", "v_proj", "merge"):
                linear(f"{t}.{p}", f"{j}.{p}")
            out[f"{j}.norm1.weight"] = np.asarray(sd[f"{t}.norm1.weight"],
                                                  np.float32)
            out[f"{j}.norm1.bias"] = np.asarray(sd[f"{t}.norm1.bias"],
                                                np.float32)
            if f"{t}.mlp.0.weight" in sd:
                linear(f"{t}.mlp.0", f"{j}.mlp0")
                linear(f"{t}.mlp.2", f"{j}.mlp2")
                out[f"{j}.norm2.weight"] = np.asarray(
                    sd[f"{t}.norm2.weight"], np.float32)
                out[f"{j}.norm2.bias"] = np.asarray(
                    sd[f"{t}.norm2.bias"], np.float32)
    linear("feature_flow_attn.q_proj", "feature_flow_attn.q_proj")
    linear("feature_flow_attn.k_proj", "feature_flow_attn.k_proj")
    if "upsampler.0.weight" in sd:
        conv("upsampler.0", "upsampler_conv1")
        conv("upsampler.2", "upsampler_conv2")
    if "refine_proj.weight" in sd:  # scale2-regrefine6 tier (reg_refine.py)
        conv("refine_proj", "refine_proj")
        for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
            conv(f"refine.encoder.{name}", f"refine.encoder.{name}")
        for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
            conv(f"refine.gru.{name}", f"refine.gru.{name}")
        conv("refine.flow_head.conv1", "refine.flow_head.conv1")
        conv("refine.flow_head.conv2", "refine.flow_head.conv2")
        conv("refine.mask.0", "refine.mask_conv1")
        conv("refine.mask.2", "refine.mask_conv2")
    return out


# -- visualization ---------------------------------------------------------------------


def _make_colorwheel() -> np.ndarray:
    """Middlebury color wheel (utils/flow_viz.py)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[:RY, 0] = 255
    wheel[:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """[H, W, 2] flow → HWC uint8 Middlebury visualization."""
    u = flow[..., 0].astype(np.float64)
    v = flow[..., 1].astype(np.float64)
    rad = np.sqrt(u ** 2 + v ** 2)
    rad_max = max(rad.max(), 1e-5)
    u, v = u / rad_max, v / rad_max
    rad = np.sqrt(u ** 2 + v ** 2)
    wheel = _make_colorwheel()
    ncols = wheel.shape[0]
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros((*u.shape, 3), np.uint8)
    for i in range(3):
        col0 = wheel[k0, i] / 255.0
        col1 = wheel[k1, i] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., i] = np.floor(255 * col)
    return img


@preprocessor_registry.register("optical_flow", aliases=("unimatch",
                                                         "UnimatchDetector",
                                                         "flow",
                                                         "ptlflow",
                                                         "PTLFlowDetector"))
class OpticalFlowPreprocessor(BasePreprocessor):
    """Frame-pair optical flow colormaps (reference src/preprocess/unimatch
    inference_flow); per-frame output is the flow to the next frame,
    repeated for the final frame."""

    name = "optical_flow"
    params_schema = {"variant": "gmflow-scale1", "detect_resolution": 384}
    weights_id = "unimatch"

    def __init__(self, model: Optional[GMFlow] = None,
                 variant: str = "gmflow-scale1"):
        self.model = model
        self.variant = variant
        self._fwd = None

    def _ensure_model(self, variant: str) -> GMFlow:
        if self.model is None or variant != self.variant:
            self.variant = variant
            self.model = GMFlow(GMFLOW_CONFIGS[variant], rngs=nnx.Rngs(0))
            self._fwd = None
            from apex_studio_tpu.preprocess.weights import (
                load_preprocessor_weights)

            fname = {"gmflow-scale1": "gmflow-scale1-mixdata.pth",
                     "gmflow-scale2": "gmflow-scale2-mixdata.pth",
                     "gmflow-scale2-regrefine6":
                         "gmflow-scale2-regrefine6-mixdata.pth"}[variant]
            try:
                sd = load_preprocessor_weights(
                    variant, hf_repo="hr16/Unimatch", hf_filename=fname)
            except Exception:
                sd = None
                logger.warning("unimatch weights unavailable; random init")
            if sd:
                if "model" in sd:
                    sd = sd["model"]
                tree = convert_gmflow_keys(sd)
                graphdef, state = nnx.split(self.model)
                for path, leaf in state.flat_state():
                    nm = ".".join(str(p) for p in path)
                    if nm in tree:
                        leaf.value = jnp.asarray(tree[nm])
                self.model = nnx.merge(graphdef, state)
        return self.model

    def predict_flow(self, frame0: Frame, frame1: Frame,
                     detect_resolution: int = 384,
                     variant: str = "gmflow-scale1") -> np.ndarray:
        import cv2

        model = self._ensure_model(variant)
        h, w = frame0.shape[:2]
        pf = 8 if model.cfg.num_scales == 1 else 16
        size = max(pf, int(detect_resolution) // pf * pf)
        a = cv2.resize(frame0, (size, size)).astype(np.float32)
        b = cv2.resize(frame1, (size, size)).astype(np.float32)
        if self._fwd is None:
            graphdef, _ = nnx.split(model)

            @jax.jit
            def fwd(state, i0, i1):
                return nnx.merge(graphdef, state)(i0, i1)

            self._fwd = fwd
        _, state = nnx.split(model)
        flow = np.asarray(self._fwd(state, jnp.asarray(a)[None],
                                    jnp.asarray(b)[None])[0])
        flow = cv2.resize(flow, (w, h), interpolation=cv2.INTER_LINEAR)
        flow[..., 0] *= w / size
        flow[..., 1] *= h / size
        return flow

    def __call__(self, frames, progress_callback=None, **params):
        single = isinstance(frames, np.ndarray) and frames.ndim == 3
        batch = [frames] if single else list(frames)
        if len(batch) < 2:
            return [np.zeros_like(batch[0])]
        out = []
        for i in range(len(batch) - 1):
            flow = self.predict_flow(
                batch[i], batch[i + 1],
                detect_resolution=params.get("detect_resolution", 384),
                variant=params.get("variant", self.variant))
            out.append(flow_to_image(flow))
            if progress_callback:
                progress_callback((i + 1) / (len(batch) - 1),
                                  f"flow {i + 1}/{len(batch) - 1}")
        out.append(out[-1].copy())
        return out

    def process_frame(self, frame: Frame, **_) -> Frame:  # pragma: no cover
        raise NotImplementedError("optical flow needs frame pairs")
