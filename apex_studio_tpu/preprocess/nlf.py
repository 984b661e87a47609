"""NLF (Neural Localizer Fields) 3D human body lifting — JAX.

First-party implementation of the reference's NLF multiperson estimator
(``src/preprocess/dwpose_nlf/nlf``), the 3D stage behind the ``dwpose_nlf``
preprocessor used for wan-scail conditioning. The consumed output is the
nonparametric SMPL-joint estimate (``joints3d_nonparam`` in
``nlf/pt/multiperson/multiperson_model.py:321``); the SMPL/SMPLX parametric
fitting that the reference also runs feeds only result keys the renderer
never reads, so it is intentionally not implemented.

Pipeline (reference counterparts in parentheses):

1. linearize sRGB frames (``multiperson_model.py:1118 im_to_linear``),
2. per-detection perspective crop: rotate the camera to look at the box
   center, scale so the box fills ``proc_side``, homography-warp through an
   image pyramid (``multiperson_model.py:786 _get_crops``,
   ``warping.py:9 warp_images_with_pyramid``), gamma-correct with the
   single-aug gamma 0.8 (test-time augmentation count is 1 in the consumed
   ``detect_smpl_batched`` path),
3. crop model: EfficientNetV2-L backbone (vendored-torchvision layout,
   ``backbones/efficientnet.py:443 _efficientnet_conf``) -> 1x1 link layer ->
   per-canonical-point dynamic weights from the GPS localizer field
   (``models/field.py:22 GPSField``) applied as a 1x1 conv
   (``models/nlf_model.py:243 apply_weights3d_same_canonicals``) -> 2.5D
   heatmap decode -> absolute reconstruction by full-perspective least
   squares (``ptu3d.py:9 reconstruct_absolute``),
4. plausibility filtering + pose NMS (``plausibility_check.py``),
5. ``joints3d_nonparam`` = the 24 SMPL-joint block of the 1048 canonical
   points (1024 surface vertices + 24 joints, ``model_config.yaml
   smpl_config.cano_all``).

Weights load from the published ``nlf_l_multi`` safetensors checkpoint via
:func:`convert_nlf_checkpoint`; there is no fast-weights training here, the
field weights for the canonical points are computed once at load.
"""

from __future__ import annotations

import dataclasses
import logging
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.efficientnet import BNInf

logger = logging.getLogger("apex.preprocess.nlf")


# ------------------------------------------------------------------ config


@dataclasses.dataclass(frozen=True)
class NLFConfig:
    """nlf_l tier (reference nlf/model_config.yaml)."""

    proc_side: int = 384
    stride: int = 32
    centered_stride: bool = True
    box_size_m: float = 2.2
    depth: int = 8                 # depth bins of the 2.5D heatmap
    backbone_link_dim: int = 512
    field_posenc_dim: int = 1024
    field_hidden_size: int = 384
    gps_pos_enc_dim: int = 512
    gps_hidden_dim: int = 2048
    uncert_bias: float = 0.0
    uncert_bias2: float = 0.001
    backbone_channels: int = 1280
    n_points: int = 1048           # 1024 cano vertices + 24 SMPL joints
    n_joints: int = 24
    # EfficientNetV2 stage table: (fused, expand, kernel, stride, out_ch,
    # repeats). v2_l per the vendored torchvision conf.
    stages: Tuple[Tuple[bool, int, int, int, int, int], ...] = (
        (True, 1, 3, 1, 32, 4),
        (True, 4, 3, 2, 64, 7),
        (True, 4, 3, 2, 96, 7),
        (False, 4, 3, 2, 192, 10),
        (False, 6, 3, 1, 224, 19),
        (False, 6, 3, 2, 384, 25),   # bottomright_stride under centered_stride
        (False, 6, 3, 1, 640, 7),
    )
    stem_ch: int = 32
    bn_eps: float = 1e-3

    @classmethod
    def tiny(cls) -> "NLFConfig":
        """Small variant for tests (same topology, 1-2 blocks per stage)."""
        return cls(
            proc_side=64, stride=32, backbone_link_dim=24,
            field_posenc_dim=32, field_hidden_size=16, gps_pos_enc_dim=16,
            gps_hidden_dim=24, backbone_channels=48, n_points=36, n_joints=24,
            # channels are multiples of 8 like the reference's adjust_channels
            stages=((True, 1, 3, 1, 8, 1), (True, 4, 3, 2, 16, 1),
                    (True, 4, 3, 2, 16, 1), (False, 4, 3, 2, 16, 1),
                    (False, 6, 3, 1, 16, 1), (False, 6, 3, 2, 24, 2),
                    (False, 6, 3, 1, 32, 1)),
            stem_ch=8)


def _tf_same_pad(k: int, shift: int = 0) -> Tuple[Tuple[int, int], ...]:
    """fixed_padding_layer semantics (efficientnet.py:1326): TF-style total
    pad k-1 with the smaller half first; ``shift`` moves one row/col of
    padding to the end (bottomright_stride)."""
    beg = (k - 1) // 2
    end = k - 1 - beg
    return ((beg - shift, end + shift), (beg - shift, end + shift))


def _conv(in_ch, out_ch, k, stride, rngs, *, groups=1, bias=False, pad=0):
    padding = [(pad, pad), (pad, pad)] if isinstance(pad, int) else list(pad)
    return nnx.Conv(in_ch, out_ch, kernel_size=(k, k), strides=(stride, stride),
                    padding=padding, feature_group_count=groups, use_bias=bias,
                    rngs=rngs)


class _SqueezeExcite(nnx.Module):
    """torchvision SqueezeExcitation: avgpool -> fc1 -> SiLU -> fc2 -> sigmoid."""

    def __init__(self, ch: int, squeeze_ch: int, rngs: nnx.Rngs):
        self.fc1 = nnx.Conv(ch, squeeze_ch, (1, 1), use_bias=True, rngs=rngs)
        self.fc2 = nnx.Conv(squeeze_ch, ch, (1, 1), use_bias=True, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = jax.nn.silu(self.fc1(s))
        return x * jax.nn.sigmoid(self.fc2(s))


class _FusedMBConv(nnx.Module):
    """FusedMBConv (efficientnet.py:207): padded kxk (expand or plain) +
    optional 1x1 project; residual when stride 1 and in==out. BatchRenorm2d
    at eval time is plain BN with running statistics."""

    def __init__(self, in_ch, out_ch, expand, k, stride, shift, eps, rngs):
        mid = _make_divisible(in_ch * expand, 8)
        self.expanded = mid != in_ch
        pad = _tf_same_pad(k, shift)
        if self.expanded:
            self.conv_exp = _conv(in_ch, mid, k, stride, rngs, pad=pad)
            self.bn_exp = BNInf(mid, eps, rngs)
            self.conv_proj = _conv(mid, out_ch, 1, 1, rngs)
            self.bn_proj = BNInf(out_ch, eps, rngs)
        else:
            self.conv_exp = _conv(in_ch, out_ch, k, stride, rngs, pad=pad)
            self.bn_exp = BNInf(out_ch, eps, rngs)
        self.has_skip = stride == 1 and in_ch == out_ch

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.silu(self.bn_exp(self.conv_exp(x)))
        if self.expanded:
            y = self.bn_proj(self.conv_proj(y))
        return x + y if self.has_skip else y


class _MBConv(nnx.Module):
    """MBConv (efficientnet.py:133): 1x1 expand -> padded kxk depthwise ->
    SE (squeeze to in_ch//4) -> 1x1 project."""

    def __init__(self, in_ch, out_ch, expand, k, stride, shift, eps, rngs):
        mid = _make_divisible(in_ch * expand, 8)
        self.conv_exp = _conv(in_ch, mid, 1, 1, rngs)
        self.bn_exp = BNInf(mid, eps, rngs)
        self.conv_dw = _conv(mid, mid, k, stride, rngs, groups=mid,
                             pad=_tf_same_pad(k, shift))
        self.bn_dw = BNInf(mid, eps, rngs)
        self.se = _SqueezeExcite(mid, max(1, in_ch // 4), rngs)
        self.conv_proj = _conv(mid, out_ch, 1, 1, rngs)
        self.bn_proj = BNInf(out_ch, eps, rngs)
        self.has_skip = stride == 1 and in_ch == out_ch

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.silu(self.bn_exp(self.conv_exp(x)))
        y = jax.nn.silu(self.bn_dw(self.conv_dw(y)))
        y = self.se(y)
        y = self.bn_proj(self.conv_proj(y))
        return x + y if self.has_skip else y


def _make_divisible(v: float, divisor: int) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return int(new_v)


class EffNetV2Features(nnx.Module):
    """EfficientNetV2 ``features`` stack in the vendored-torchvision layout:
    stem -> stages -> 1x1 head conv, all norms with running statistics.
    Input is the *linear-light* crop in [0, 1]; the builder's PreprocLayer
    2x-1 scaling (builder.py:20) is applied here."""

    def __init__(self, cfg: NLFConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        self.conv_stem = _conv(3, cfg.stem_ch, 3, 2, rngs, pad=_tf_same_pad(3))
        self.bn_stem = BNInf(cfg.stem_ch, cfg.bn_eps, rngs)
        stages = []
        in_ch = cfg.stem_ch
        for si, (fused, e, k, s, out_ch, reps) in enumerate(cfg.stages):
            blocks = []
            for bi in range(reps):
                stride = s if bi == 0 else 1
                # centered_stride routes the stride-2 stage at index 5 through
                # bottom-right-shifted padding (efficientnet.py:519)
                shift = 1 if (si == 5 and bi == 0 and stride == 2
                              and cfg.centered_stride) else 0
                cls = _FusedMBConv if fused else _MBConv
                blocks.append(cls(in_ch, out_ch, e, k, stride, shift,
                                  cfg.bn_eps, rngs))
                in_ch = out_ch
            stages.append(nnx.List(blocks))
        self.blocks = nnx.List(stages)
        self.conv_head = _conv(in_ch, cfg.backbone_channels, 1, 1, rngs)
        self.bn_head = BNInf(cfg.backbone_channels, cfg.bn_eps, rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (N, H, W, 3) linear [0,1] -> (N, H/32, W/32, C)."""
        x = 2.0 * x - 1.0
        x = jax.nn.silu(self.bn_stem(self.conv_stem(x)))
        for stage in self.blocks:
            for block in stage:
                x = block(x)
        return jax.nn.silu(self.bn_head(self.conv_head(x)))


# ------------------------------------------------------------ localizer field


class GPSField(nnx.Module):
    """GPS localizer field (models/field.py): canonical (x,y,z) -> dynamic
    per-point conv weights. Norm mode is "dynamic" in the shipped config:
    min/max over the *current* point set."""

    def __init__(self, cfg: NLFConfig, rngs: nnx.Rngs):
        c = cfg
        out_dim = (c.backbone_link_dim + 1) * (c.depth + 2)
        self.fourier = nnx.Linear(3, c.gps_pos_enc_dim // 2, use_bias=False,
                                  rngs=rngs)
        self.gps_l1 = nnx.Linear(c.gps_pos_enc_dim, c.gps_hidden_dim, rngs=rngs)
        self.gps_l2 = nnx.Linear(c.gps_hidden_dim, c.field_posenc_dim, rngs=rngs)
        self.r_sqrt_eigva = nnx.Param(jnp.ones((c.field_posenc_dim,), jnp.float32))
        self.pred_l1 = nnx.Linear(c.field_posenc_dim, c.field_hidden_size,
                                  rngs=rngs)
        self.pred_l2 = nnx.Linear(c.field_hidden_size, out_dim, rngs=rngs)
        self.factor = 1.0 / math.sqrt(np.float32(c.gps_pos_enc_dim))
        self.posenc_dim = c.field_posenc_dim
        self.eps = 1e-6

    def __call__(self, points: jax.Array) -> jax.Array:
        """points: (P, 3) -> (P, (c+1)*(depth+2)) weights."""
        mini = jnp.min(points, axis=0)
        maxi = jnp.max(points, axis=0)
        center = (mini + maxi) / 2
        denom = jnp.clip(maxi - mini, min=self.eps)
        x = (points - center) / denom
        f = self.fourier(x)
        x = jnp.concatenate([jnp.sin(f), jnp.cos(f)], axis=-1) * self.factor
        x = self.gps_l2(jax.nn.gelu(self.gps_l1(x), approximate=False))
        lbo = x[..., :self.posenc_dim] * self.r_sqrt_eigva.value * 0.1
        h = jax.nn.gelu(self.pred_l1(lbo), approximate=False)
        return self.pred_l2(h)


class NLFCropModel(nnx.Module):
    """Single-crop NLF model (models/nlf_model.py NLFModel + LocalizerHead)."""

    def __init__(self, cfg: NLFConfig = None, rngs: nnx.Rngs = None):
        cfg = cfg or NLFConfig()
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.backbone = EffNetV2Features(cfg, rngs)
        self.link_conv = _conv(cfg.backbone_channels, cfg.backbone_link_dim,
                               1, 1, rngs)
        self.link_bn = BNInf(cfg.backbone_link_dim, cfg.bn_eps, rngs)
        self.field = GPSField(cfg, rngs)
        # canonical point cloud (1024 vertex subset + 24 joints), from the
        # checkpoint buffer cano_all_smpl
        self.canonical = nnx.Param(jnp.zeros((cfg.n_points, 3), jnp.float32))

    # -- field weights (computed once per loaded model) --------------------

    def field_weights(self, points: Optional[jax.Array] = None
                      ) -> Tuple[jax.Array, jax.Array]:
        """(P, C_out, c_in) kernel + (P, C_out) bias for the dynamic 1x1 conv
        (nlf_model.py:232 transpose_weights)."""
        pts = self.canonical.value if points is None else points
        raw = self.field(pts)
        c_in = self.cfg.backbone_link_dim
        c_out = self.cfg.depth + 2
        resh = raw.reshape(pts.shape[0], c_in + 1, c_out)
        return jnp.transpose(resh[:, :-1, :], (0, 2, 1)), resh[:, -1, :]

    # -- decode -------------------------------------------------------------

    def decode(self, feats: jax.Array, w: jax.Array, b: jax.Array
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """feats: (N, h, w, c_link) link-layer output; returns
        coords2d (N,P,2) px, coords3d (N,P,3) m, uncertainties (N,P)."""
        cfg = self.cfg
        n, fh, fw, c = feats.shape
        p = w.shape[0]
        c_out = cfg.depth + 2
        # dynamic 1x1 conv: (N,h,w,c) x (P,C,c) -> (N,P,C,h,w)
        logits = jnp.einsum("nhwc,pCc->npChw", feats, w) + b[None, :, :, None, None]
        logits = logits.astype(jnp.float32)
        uncert_map = logits[:, :, 0]
        xy_soft = _soft_argmax_2d(logits[:, :, 1])
        heat = jax.nn.softmax(logits[:, :, 2:].reshape(n, p, -1), axis=-1)
        heat = heat.reshape(n, p, cfg.depth, fh, fw)
        heat2d = jnp.sum(heat, axis=2)
        uncert = jnp.einsum("nphw,nphw->np", uncert_map, heat2d)
        uncert = jax.nn.softplus(uncert + cfg.uncert_bias) + cfg.uncert_bias2
        coords25d = _decode_heatmap_3d(heat)      # (N,P,3): x,y,z in [0,1]
        coords2d = _heatmap_to_image(coords25d[..., :2], cfg)
        xy_metric = (_heatmap_to_image(xy_soft, cfg) * cfg.box_size_m
                     / cfg.proc_side)
        coords3d = jnp.concatenate(
            [xy_metric, coords25d[..., 2:] * cfg.box_size_m], axis=-1)
        return coords2d, coords3d, uncert

    def __call__(self, crops: jax.Array, w: jax.Array, b: jax.Array,
                 intrinsics: jax.Array):
        """crops (N,S,S,3) linear [0,1]; returns absolute (N,P,3) mm +
        uncertainties (N,P) (nlf_model.py:72 predict_multi_same_canonicals)."""
        feats = jax.nn.silu(self.link_bn(self.link_conv(self.backbone(crops))))
        coords2d, coords3d, uncert = self.decode(feats, w, b)
        abs3d = reconstruct_absolute(coords2d, coords3d, uncert, intrinsics,
                                     self.cfg)
        return abs3d, uncert * 3.0   # fix_uncert_factor false -> x3


def _soft_argmax_2d(logits: jax.Array) -> jax.Array:
    """(..., h, w) -> (..., 2) soft-argmax in [0,1] x [0,1] (x then y)."""
    *lead, h, w = logits.shape
    p = jax.nn.softmax(logits.reshape(*lead, h * w), axis=-1).reshape(
        *lead, h, w)
    xs = jnp.linspace(0.0, 1.0, w)
    ys = jnp.linspace(0.0, 1.0, h)
    x = jnp.sum(jnp.sum(p, axis=-2) * xs, axis=-1)
    y = jnp.sum(jnp.sum(p, axis=-1) * ys, axis=-1)
    return jnp.stack([x, y], axis=-1)


def _decode_heatmap_3d(heat: jax.Array) -> jax.Array:
    """(N,P,D,h,w) normalized heatmap -> (N,P,3) expected (x,y,z) in [0,1]
    (ptu.decode_heatmap over dims [4,3,2])."""
    n, p, d, h, w = heat.shape
    xs = jnp.linspace(0.0, 1.0, w)
    ys = jnp.linspace(0.0, 1.0, h)
    zs = jnp.linspace(0.0, 1.0, d) if d > 1 else jnp.asarray([0.5])
    x = jnp.einsum("npdhw,w->np", heat, xs)
    y = jnp.einsum("npdhw,h->np", heat, ys)
    z = jnp.einsum("npdhw,d->np", heat, zs)
    return jnp.stack([x, y, z], axis=-1)


def _heatmap_to_image(coords: jax.Array, cfg: NLFConfig) -> jax.Array:
    """[0,1] heatmap coords -> pixel coords (models/util.py:5)."""
    last = cfg.proc_side - 1
    last_center = last - (last % cfg.stride)
    out = coords * last_center
    if cfg.centered_stride:
        out = out + cfg.stride // 2
    return out


# --------------------------------------------------- absolute reconstruction


def _is_within_fov(imcoords: jax.Array, cfg: NLFConfig, border: float
                   ) -> jax.Array:
    offset = 0.0 if cfg.centered_stride else -cfg.stride / 2.0
    lower = cfg.stride * border + offset
    upper = cfg.proc_side - cfg.stride * border + offset
    return jnp.all((imcoords >= lower) & (imcoords <= upper), axis=-1)


def _mean_masked(x: jax.Array, valid: jax.Array, axis: int) -> jax.Array:
    v = valid[..., None].astype(x.dtype)
    s = jnp.sum(x * v, axis=axis, keepdims=True)
    n = jnp.sum(v, axis=axis, keepdims=True)
    return jnp.nan_to_num(s / jnp.where(n == 0, 1.0, n))


def reconstruct_ref_fullpersp(norm2d: jax.Array, rel3d: jax.Array,
                              valid: jax.Array) -> jax.Array:
    """Least-squares reference point (ptu3d.py:112 reconstruct_ref_fullpersp):
    solve for t s.t. norm2d*(z_rel+t_z) ~= (xy_rel + t_xy) in a weighted LS
    sense, via the regularized normal equations."""
    nb, npt, _ = norm2d.shape

    def _rms_norm(x):
        # ptu.rms_normalize_and_reshape: reduce_mean_masked sums x^2 over both
        # coordinate dims but divides by the count of *mask* elements (the
        # mask broadcasts with a size-1 coord dim), i.e. by n_valid.
        v = valid[..., None].astype(x.dtype)
        num = jnp.sum(jnp.square(x) * v, axis=(1, 2), keepdims=True)
        cnt = jnp.sum(v, axis=(1, 2), keepdims=True)
        scale = jnp.sqrt(jnp.nan_to_num(num / jnp.where(cnt == 0, 1.0, cnt))
                         + 1e-10)
        return scale, (x / scale).reshape(nb, npt * 2, 1)

    eyes = jnp.tile(jnp.eye(2, dtype=norm2d.dtype)[None], (nb, npt, 1))
    scale2d, resh2d = _rms_norm(norm2d)
    a_mat = jnp.concatenate([eyes, -resh2d], axis=2)     # (nb, 2P, 3)

    rel_backproj = norm2d * rel3d[:, :, 2:] - rel3d[:, :, :2]
    scale_rb, b_vec = _rms_norm(rel_backproj)

    wts = valid.astype(norm2d.dtype) + 1e-8
    wts = jnp.repeat(wts, 2, axis=1)[..., None]          # (nb, 2P, 1)
    aw = wts * a_mat
    gram = jnp.einsum("bni,bnj->bij", aw, a_mat)
    gram = gram + 1e-4 * jnp.eye(3, dtype=gram.dtype)
    atb = jnp.einsum("bni,bnj->bij", aw, b_vec)
    ref = jnp.linalg.solve(gram, atb)[..., 0]            # (nb, 3)

    scale_rb = scale_rb[:, 0, 0]
    scale2d = scale2d[:, 0, 0]
    return jnp.concatenate(
        [ref[:, :2] * scale_rb[:, None],
         ref[:, 2:] * (scale_rb / scale2d)[:, None]], axis=1)


def reconstruct_absolute(coords2d: jax.Array, coords3d: jax.Array,
                         uncert: jax.Array, intrinsics: jax.Array,
                         cfg: NLFConfig) -> jax.Array:
    """ptu3d.reconstruct_absolute with the LocalizerHead's fixed arguments
    (nlf_model.py:365): border factors (1.0, 0.6), mix 0.5, full perspective,
    validity = uncertainty < 0.3. Returns mm."""
    inv_k = jnp.linalg.inv(intrinsics.astype(coords2d.dtype))
    homog = jnp.concatenate([coords2d, jnp.ones_like(coords2d[..., :1])],
                            axis=-1)
    norm2d = jnp.einsum("bnk,bjk->bnj", homog, inv_k)[..., :2]

    in_fov1 = _is_within_fov(coords2d, cfg, 1.0) & (uncert < 0.3)
    ref = reconstruct_ref_fullpersp(norm2d, coords3d, in_fov1)

    abs_3d = coords3d + ref[:, None, :]
    z = coords3d[..., 2] + ref[:, None, 2]
    homog_n = jnp.concatenate([norm2d, jnp.ones_like(norm2d[..., :1])], axis=-1)
    abs_2d = homog_n * z[..., None]

    abs_2d = 0.5 * abs_3d + 0.5 * abs_2d                 # mix_3d_inside_fov

    proj = abs_3d / jnp.maximum(0.1, abs_3d[..., 2:])
    proj = jnp.einsum("bnk,bjk->bnj", proj, intrinsics[..., :2, :])
    in_fov2 = _is_within_fov(proj, cfg, 0.6) & (abs_3d[..., 2] > 0.001)
    return jnp.where(in_fov2[..., None], abs_2d, abs_3d) * 1000.0


# ----------------------------------------------------------- crop extraction


def intrinsics_from_fov(h: int, w: int, fov_degrees: float = 55.0
                        ) -> np.ndarray:
    """ptu3d.intrinsic_matrix_from_field_of_view (principal point at the
    pixel-center convention (size-1)/2)."""
    focal = max(h, w) / (np.tan(np.deg2rad(fov_degrees) / 2) * 2)
    return np.array([[focal, 0, (w - 1) / 2],
                     [0, focal, (h - 1) / 2],
                     [0, 0, 1]], np.float32)


def _lookat(forward: np.ndarray, up: np.ndarray) -> np.ndarray:
    """ptu3d.lookat_matrix for a single vector."""
    new_z = forward / np.linalg.norm(forward)
    new_x = np.cross(new_z, up)
    if np.linalg.norm(new_x) == 0:
        new_x = np.array([new_z[2], 0.0, -new_z[0]], np.float32)
    new_x = new_x / np.linalg.norm(new_x)
    new_y = np.cross(new_z, new_x)
    return np.stack([new_x, new_y, new_z], axis=0).astype(np.float32)


def crop_transforms(boxes: np.ndarray, intrinsics: np.ndarray, proc_side: int,
                    aug_scale: float = 1.0
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-box camera reorientation (multiperson_model.py:889
    _get_new_rotation_and_scale): rotation looking at the box center and the
    zoom that makes the reprojected box fill ``proc_side``.

    boxes: (B, 4+) pixel (x, y, w, h[, score]). Returns (R (B,3,3),
    new_K (B,3,3), crop_scales (B,))."""
    up = np.array([0, -1, 0], np.float32)
    inv_k = np.linalg.inv(intrinsics)
    rs, ks, scales = [], [], []
    for box in boxes:
        x, y, w, h = [float(v) for v in box[:4]]
        pts = np.array([[x + w / 2, y + h / 2, 1],
                        [x + w / 2, y, 1], [x + w, y + h / 2, 1],
                        [x + w / 2, y + h, 1], [x, y + h / 2, 1]], np.float32)
        cam = pts @ inv_k.T
        r = _lookat(cam[0], up)
        side = cam[1:5] @ (intrinsics @ r).T
        side = side[:, :2] / side[:, 2:]
        size = max(np.linalg.norm(side[0] - side[2]),
                   np.linalg.norm(side[1] - side[3]))
        scale = proc_side / size * aug_scale
        new_k = np.array([[intrinsics[0, 0] * scale, 0, proc_side / 2],
                          [0, intrinsics[1, 1] * scale, proc_side / 2],
                          [0, 0, 1]], np.float32)
        rs.append(r)
        ks.append(new_k)
        scales.append(scale)
    return (np.stack(rs).astype(np.float32), np.stack(ks).astype(np.float32),
            np.asarray(scales, np.float32))


def _corner_scale_mat(factor: float) -> np.ndarray:
    shift = (factor - 1.0) / 2.0
    return np.array([[factor, 0, shift], [0, factor, shift], [0, 0, 1]],
                    np.float32)


def warp_crop(image: jax.Array, intrinsics: np.ndarray,
              new_invprojmat: np.ndarray, out_side: int) -> jax.Array:
    """Homography warp (warping.py:72 warp_single_image): bilinear sample
    with align_corners semantics, zero padding. image: (H, W, 3) float."""
    ih, iw = image.shape[:2]
    xs, ys = jnp.meshgrid(jnp.arange(out_side, dtype=jnp.float32),
                          jnp.arange(out_side, dtype=jnp.float32),
                          indexing="xy")
    new_h = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    old = new_h @ jnp.asarray(new_invprojmat).T
    old = old[..., :2] / old[..., 2:]
    old = jnp.concatenate([old, jnp.ones_like(old[..., :1])], axis=-1)
    old = (old @ jnp.asarray(intrinsics).T)[..., :2]
    x, y = old[..., 0], old[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def _gather(yy, xx):
        ok = ((xx >= 0) & (xx <= iw - 1) & (yy >= 0) & (yy <= ih - 1))
        xi = jnp.clip(xx, 0, iw - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, ih - 1).astype(jnp.int32)
        return image[yi, xi] * ok[..., None]

    out = ((1 - wy)[..., None] * ((1 - wx)[..., None] * _gather(y0, x0)
                                  + wx[..., None] * _gather(y0, x0 + 1))
           + wy[..., None] * ((1 - wx)[..., None] * _gather(y0 + 1, x0)
                              + wx[..., None] * _gather(y0 + 1, x0 + 1)))
    return out


def extract_crops(image_linear: jax.Array, boxes: np.ndarray,
                  intrinsics: np.ndarray, proc_side: int,
                  gamma: float = 0.8) -> Tuple[jax.Array, np.ndarray,
                                               np.ndarray]:
    """Full crop path for one image: pyramid level choice + homography warp +
    the TTA gamma (multiperson_model.py:786 _get_crops with num_aug=1).
    Returns (crops (B,S,S,3), new_K (B,3,3), R (B,3,3))."""
    r, new_k, scales = crop_transforms(boxes, intrinsics, proc_side)
    # 3-level box-filter pyramid; level per crop = clip(floor(-log2(s)), 0, 2)
    levels = [image_linear]
    for _ in range(2):
        im = levels[-1]
        h2, w2 = (im.shape[0] // 2) * 2, (im.shape[1] // 2) * 2
        im = im[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2, 3).mean(axis=(1, 3))
        levels.append(im)
    ilevel = np.clip(np.floor(-np.log2(scales)), 0, 2).astype(np.int32)
    crops = []
    for i in range(len(boxes)):
        li = int(ilevel[i])
        k_level = _corner_scale_mat(1 / 2 ** li) @ intrinsics
        invproj = np.linalg.inv(new_k[i] @ r[i])
        crops.append(warp_crop(levels[li], k_level, invproj, proc_side))
    out = jnp.stack(crops) ** (gamma / 2.2)
    return out, new_k, r


# --------------------------------------------------------------- plausibility


def is_uncertainty_low(uncert: np.ndarray) -> np.ndarray:
    return np.mean((uncert < 0.25).astype(np.float32), axis=-1) > 1 / 3


def is_pose_consistent_with_box(pose2d: np.ndarray, box: np.ndarray
                                ) -> np.ndarray:
    start = pose2d.min(axis=-2)
    end = pose2d.max(axis=-2)
    b0 = box[..., :2]
    b1 = box[..., :2] + box[..., 2:4]
    area = np.prod(box[..., 2:4], axis=-1)
    inter = np.prod(np.maximum(np.minimum(b1, end) - np.maximum(b0, start), 0),
                    axis=-1)
    return inter > 0.25 * area


def pose_nms(poses3d: np.ndarray, scores: np.ndarray, valid: np.ndarray,
             overlap_threshold: float = 0.4) -> np.ndarray:
    """plausibility_check.pose_non_max_suppression."""
    idx = np.flatnonzero(valid)
    if idx.size == 0:
        return idx
    poses = poses3d[idx]
    sq = np.mean(np.square(poses), axis=(-2, -1), keepdims=True)
    ms = (sq[None, :] + sq[:, None]) / 2
    f1 = np.sqrt(ms / sq[None, :])
    f2 = np.sqrt(ms / sq[:, None])
    dists = np.linalg.norm(f1 * poses[None] - f2 * poses[:, None], axis=-1)
    k = max(1, poses.shape[-2] // 5)
    best = np.sort(dists, axis=-1)[..., :k]
    overlaps = np.mean(np.maximum(1 - best / 300, 0), axis=-1)

    order = np.argsort(-scores[idx], kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        order = rest[overlaps[i, rest] <= overlap_threshold]
    return idx[np.asarray(keep, np.int64)]


# ------------------------------------------------------------------ estimator


class NLFEstimator:
    """Multi-person nonparametric NLF estimation (the consumed subset of
    MultipersonNLF.detect_smpl_batched). Detection boxes come from the
    caller (the dwpose_nlf preprocessor already has DWPose person boxes —
    the reference masks the frame to those boxes and re-detects with a
    bundled YOLOv8x ONNX; onnxruntime is not in this image, so the DWPose
    boxes are used directly)."""

    def __init__(self, model: NLFCropModel):
        self.model = model
        self._w, self._b = None, None
        self._fwd = None

    def _weights(self):
        if self._w is None:
            w, b = self.model.field_weights()
            self._w = jax.device_put(w)
            self._b = jax.device_put(b)
        return self._w, self._b

    def estimate(self, image_rgb: np.ndarray, boxes: np.ndarray
                 ) -> List[np.ndarray]:
        """image: (H, W, 3) uint8; boxes: (B, 5) pixel (x, y, w, h, score).
        Returns per-surviving-person (24, 3) camera-space joints in mm."""
        if len(boxes) == 0:
            return []
        cfg = self.model.cfg
        h, w = image_rgb.shape[:2]
        k = intrinsics_from_fov(h, w)
        linear = (jnp.asarray(image_rgb, jnp.float32) / 255.0) ** 2.2
        crops, new_k, r = extract_crops(linear, boxes, k, cfg.proc_side)
        w_t, b_t = self._weights()
        if self._fwd is None:
            self._fwd = jax.jit(self.model.__call__)
        poses, uncert = self._fwd(crops, w_t, b_t, jnp.asarray(new_k))
        poses = np.asarray(poses, np.float64) @ np.asarray(r, np.float64)
        uncert = np.asarray(uncert)

        # plausibility filter + NMS (multiperson_model.py:633 _filter_poses)
        proj = poses / np.maximum(poses[..., 2:], 0.1)
        pose2d = np.einsum("bnk,jk->bnj", proj.astype(np.float32), k[:2, :])
        valid = is_uncertainty_low(uncert) & is_pose_consistent_with_box(
            pose2d, boxes[:, :4])
        scores = boxes[:, 4] if boxes.shape[1] > 4 else np.ones(len(boxes))
        keep = pose_nms(poses.astype(np.float32), scores / np.mean(
            uncert, axis=-1), valid)
        return [poses[i, cfg.n_points - cfg.n_joints:, :].astype(np.float32)
                for i in keep]


# -------------------------------------------------------------- weight loading


def convert_nlf_checkpoint(sd: Dict[str, np.ndarray],
                           cfg: Optional[NLFConfig] = None
                           ) -> Dict[str, np.ndarray]:
    """Published ``nlf_l_multi`` safetensors (MultipersonNLF state dict) ->
    flat paths for :class:`NLFCropModel`. Backbone keys follow the vendored
    torchvision Sequential layout ``crop_model.backbone.1.<i>...`` (builder
    wraps [PreprocLayer, features])."""
    pre = "crop_model."
    sd = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)} | {
        k: v for k, v in sd.items() if not k.startswith(pre)}
    out: Dict[str, np.ndarray] = {}

    def _bn(dst: str, src: str) -> None:
        out[f"{dst}.scale"] = sd[f"{src}.weight"]
        out[f"{dst}.bias"] = sd[f"{src}.bias"]
        out[f"{dst}.mean"] = sd[f"{src}.running_mean"]
        out[f"{dst}.var"] = sd[f"{src}.running_var"]

    f = "backbone.1"   # Sequential(preproc, features)
    out["backbone.conv_stem.kernel"] = sd[f"{f}.0.0.weight"]
    _bn("backbone.bn_stem", f"{f}.0.1")
    cfg = cfg or NLFConfig()
    for si, (fused, e, _k, _s, out_ch, reps) in enumerate(cfg.stages):
        for bi in range(reps):
            src = f"{f}.{si + 1}.{bi}.block"
            dst = f"backbone.blocks.{si}.{bi}"
            if fused:
                expanded = f"{src}.1.0.weight" in sd
                out[f"{dst}.conv_exp.kernel"] = sd[f"{src}.0.0.weight"]
                _bn(f"{dst}.bn_exp", f"{src}.0.1")
                if expanded:
                    out[f"{dst}.conv_proj.kernel"] = sd[f"{src}.1.0.weight"]
                    _bn(f"{dst}.bn_proj", f"{src}.1.1")
            else:
                out[f"{dst}.conv_exp.kernel"] = sd[f"{src}.0.0.weight"]
                _bn(f"{dst}.bn_exp", f"{src}.0.1")
                out[f"{dst}.conv_dw.kernel"] = sd[f"{src}.1.0.weight"]
                _bn(f"{dst}.bn_dw", f"{src}.1.1")
                out[f"{dst}.se.fc1.kernel"] = sd[f"{src}.2.fc1.weight"]
                out[f"{dst}.se.fc1.bias"] = sd[f"{src}.2.fc1.bias"]
                out[f"{dst}.se.fc2.kernel"] = sd[f"{src}.2.fc2.weight"]
                out[f"{dst}.se.fc2.bias"] = sd[f"{src}.2.fc2.bias"]
                out[f"{dst}.conv_proj.kernel"] = sd[f"{src}.3.0.weight"]
                _bn(f"{dst}.bn_proj", f"{src}.3.1")
    n_stages = len(cfg.stages)
    out["backbone.conv_head.kernel"] = sd[f"{f}.{n_stages + 1}.0.weight"]
    _bn("backbone.bn_head", f"{f}.{n_stages + 1}.1")

    out["link_conv.kernel"] = sd["heatmap_head.layer.0.weight"]
    _bn("link_bn", "heatmap_head.layer.1")

    wf = "heatmap_head.weight_field"
    out["field.fourier.kernel"] = sd[f"{wf}.gps_net.learnable_fourier.linear.weight"]
    out["field.gps_l1.kernel"] = sd[f"{wf}.gps_net.mlp.0.weight"]
    out["field.gps_l1.bias"] = sd[f"{wf}.gps_net.mlp.0.bias"]
    out["field.gps_l2.kernel"] = sd[f"{wf}.gps_net.mlp.2.weight"]
    out["field.gps_l2.bias"] = sd[f"{wf}.gps_net.mlp.2.bias"]
    out["field.pred_l1.kernel"] = sd[f"{wf}.pred_mlp.0.weight"]
    out["field.pred_l1.bias"] = sd[f"{wf}.pred_mlp.0.bias"]
    out["field.pred_l2.kernel"] = sd[f"{wf}.pred_mlp.2.weight"]
    out["field.pred_l2.bias"] = sd[f"{wf}.pred_mlp.2.bias"]
    out["field.r_sqrt_eigva"] = sd[f"{wf}.r_sqrt_eigva"]
    out["canonical"] = sd["cano_all_smpl"]
    return out


def load_nlf(path) -> NLFEstimator:
    """Build the l-tier estimator from a checkpoint path."""
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.preprocess.weights import _load_any

    sd = _load_any(path)
    model = NLFCropModel(NLFConfig(), nnx.Rngs(0))
    apply_state_dict(model, convert_nlf_checkpoint(sd), strict=False)
    return NLFEstimator(model)
