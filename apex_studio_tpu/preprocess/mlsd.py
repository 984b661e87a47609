"""M-LSD line segment detector in JAX/NNX.

Counterpart of the reference's ``src/preprocess/mlsd`` — MobileV2_MLSD_Large
(models/mbv2_mlsd_large.py:267): a truncated MobileNetV2 trunk (14 features,
TFLite-style asymmetric stride-2 padding, mbv2_mlsd_large.py:104/121) feeding
an FPN of A/B blocks up to full·¼ resolution and a dilated C head; the line
decode (utils.py:19 deccode_output_score_and_ptss + utils.py:49 pred_lines)
takes channel 0 as the center heat-map (sigmoid + 3×3 local-max NMS, top-200)
and channels 1:5 as start/end displacement vectors, keeping segments over the
score/length thresholds; the preprocessor draws them 1px white on black
(__init__.py:69).
"""

from __future__ import annotations

import logging
from typing import List, Optional

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


class _ConvBNReLU6(nnx.Module):
    """ConvBNReLU (mbv2_mlsd_large.py:96): TFLite padding — stride 2 pads
    (0,1,0,1) explicitly, stride 1 pads symmetrically; ReLU6."""

    def __init__(self, cin: int, cout: int, k: int = 3, stride: int = 1,
                 groups: int = 1, tf_pad: bool = True, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(
            init(rngs.params(), (k, k, cin // groups, cout), jnp.float32))
        self.bn_scale = nnx.Param(jnp.ones((cout,), jnp.float32))
        self.bn_bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.bn_mean = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.bn_var = nnx.Param(jnp.ones((cout,), jnp.float32))
        self.k, self.stride, self.groups = k, stride, groups
        self.tf_pad = tf_pad

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.stride == 2 and self.tf_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = ((0, 0), (0, 0))
        else:
            p = (self.k - 1) // 2
            pad = ((p, p), (p, p))  # torch-style symmetric (any stride)
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(self.stride, self.stride),
            padding=pad, feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = (y - self.bn_mean.value) * jax.lax.rsqrt(self.bn_var.value + 1e-5)
        y = y * self.bn_scale.value + self.bn_bias.value
        return jnp.clip(y, 0.0, 6.0)


class _ConvBN(nnx.Module):
    """1×1 pointwise-linear conv + eval BN (no activation)."""

    def __init__(self, cin: int, cout: int, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (1, 1, cin, cout), jnp.float32))
        self.bn_scale = nnx.Param(jnp.ones((cout,), jnp.float32))
        self.bn_bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.bn_mean = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.bn_var = nnx.Param(jnp.ones((cout,), jnp.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = (y - self.bn_mean.value) * jax.lax.rsqrt(self.bn_var.value + 1e-5)
        return y * self.bn_scale.value + self.bn_bias.value


class _InvertedResidual(nnx.Module):
    """mbv2_mlsd_large.py:132 — pw-expand → dw → pw-linear, skip on s1."""

    def __init__(self, cin: int, cout: int, stride: int, expand: int,
                 tf_pad: bool = True, *, rngs: nnx.Rngs):
        hidden = int(round(cin * expand))
        self.expand = (None if expand == 1
                       else _ConvBNReLU6(cin, hidden, 1, rngs=rngs))
        self.dw = _ConvBNReLU6(hidden, hidden, 3, stride, groups=hidden,
                               tf_pad=tf_pad, rngs=rngs)
        self.pw = _ConvBN(hidden, cout, rngs=rngs)
        self.use_res = stride == 1 and cin == cout

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x if self.expand is None else self.expand(x)
        h = self.pw(self.dw(h))
        return x + h if self.use_res else h


class _ConvBnRelu(nnx.Module):
    """Plain conv (biased) + eval BN + ReLU used by the FPN blocks."""

    def __init__(self, cin: int, cout: int, k: int, pad: int = 0,
                 dilation: int = 1, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (k, k, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.bn_scale = nnx.Param(jnp.ones((cout,), jnp.float32))
        self.bn_bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.bn_mean = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.bn_var = nnx.Param(jnp.ones((cout,), jnp.float32))
        self.pad, self.dilation = pad, dilation

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p, d = self.pad, self.dilation
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(1, 1),
            padding=((p, p), (p, p)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + self.bias.value
        y = (y - self.bn_mean.value) * jax.lax.rsqrt(self.bn_var.value + 1e-5)
        return jax.nn.relu(y * self.bn_scale.value + self.bn_bias.value)


def _up2(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate scale 2 bilinear align_corners=True."""
    b, h, w, c = x.shape
    return _resize_align_corners(x, 2 * h, 2 * w)


def _resize_align_corners(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
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


class _BlockA(nnx.Module):
    """mbv2_mlsd_large.py:9 — 1×1 conv both inputs, optional ×2 up, concat."""

    def __init__(self, in1: int, in2: int, out1: int, out2: int,
                 upscale: bool = True, *, rngs: nnx.Rngs):
        self.conv1 = _ConvBnRelu(in2, out2, 1, rngs=rngs)
        self.conv2 = _ConvBnRelu(in1, out1, 1, rngs=rngs)
        self.upscale = upscale

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        b = self.conv1(b)
        a = self.conv2(a)
        if self.upscale:
            b = _up2(b)
        return jnp.concatenate([a, b], axis=-1)


class _BlockB(nnx.Module):
    """mbv2_mlsd_large.py:32 — residual 3×3 then 3×3 projection."""

    def __init__(self, cin: int, cout: int, *, rngs: nnx.Rngs):
        self.conv1 = _ConvBnRelu(cin, cin, 3, pad=1, rngs=rngs)
        self.conv2 = _ConvBnRelu(cin, cout, 3, pad=1, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv2(self.conv1(x) + x)


class _BlockC(nnx.Module):
    """mbv2_mlsd_large.py:52 — dilated 3×3, 3×3, 1×1 head (plain conv)."""

    def __init__(self, cin: int, cout: int, *, rngs: nnx.Rngs):
        self.conv1 = _ConvBnRelu(cin, cin, 3, pad=5, dilation=5, rngs=rngs)
        self.conv2 = _ConvBnRelu(cin, cin, 3, pad=1, rngs=rngs)
        init = nnx.initializers.lecun_normal()
        self.conv3_kernel = nnx.Param(
            init(rngs.params(), (1, 1, cin, cout), jnp.float32))
        self.conv3_bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv2(self.conv1(x))
        return jax.lax.conv_general_dilated(
            x, self.conv3_kernel.value, window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + self.conv3_bias.value


# (expand, cout, n, stride) — truncated MobileNetV2 (mbv2_mlsd_large.py:184)
_MBV2_SETTING = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                 (6, 96, 3, 1)]
_FPN_SELECTED = (1, 3, 6, 10, 13)


class MLSDModel(nnx.Module):
    """MobileV2_MLSD_Large. NHWC 4-channel (RGB + ones) ±1 input →
    [B, h/2, w/2, 9] tpMap (center heat + 4 displacement + aux)."""

    def __init__(self, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        feats = [_ConvBNReLU6(4, 32, 3, 2, rngs=rngs)]
        cin = 32
        for expand, cout, n, s in _MBV2_SETTING:
            for i in range(n):
                feats.append(_InvertedResidual(
                    cin, cout, s if i == 0 else 1, expand, rngs=rngs))
                cin = cout
        self.features = nnx.List(feats)
        self.block15 = _BlockA(64, 96, 64, 64, upscale=False, rngs=rngs)
        self.block16 = _BlockB(128, 64, rngs=rngs)
        self.block17 = _BlockA(32, 64, 64, 64, rngs=rngs)
        self.block18 = _BlockB(128, 64, rngs=rngs)
        self.block19 = _BlockA(24, 64, 64, 64, rngs=rngs)
        self.block20 = _BlockB(128, 64, rngs=rngs)
        self.block21 = _BlockA(16, 64, 64, 64, rngs=rngs)
        self.block22 = _BlockB(128, 64, rngs=rngs)
        self.block23 = _BlockC(64, 16, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fpn = []
        for i, f in enumerate(self.features):
            x = f(x)
            if i in _FPN_SELECTED:
                fpn.append(x)
        c1, c2, c3, c4, c5 = fpn
        x = self.block16(self.block15(c4, c5))
        x = self.block18(self.block17(c3, x))
        x = self.block20(self.block19(c2, x))
        x = self.block22(self.block21(c1, x))
        x = self.block23(x)
        return x[..., 7:]


def convert_mlsd_keys(sd: dict) -> dict:
    """torch MobileV2_MLSD_Large state dict → flat jax paths + layouts."""
    out = {}

    def put_conv(prefix_t, prefix_j, biased=False, depthwise=False):
        w = np.asarray(sd[f"{prefix_t}.weight"], np.float32)
        if depthwise:
            # [C,1,kh,kw] → HWIO [kh,kw,1,C]
            out[f"{prefix_j}.kernel"] = w.transpose(2, 3, 1, 0)
        else:
            out[f"{prefix_j}.kernel"] = w.transpose(2, 3, 1, 0)
        if biased and f"{prefix_t}.bias" in sd:
            out[f"{prefix_j}.bias"] = np.asarray(sd[f"{prefix_t}.bias"], np.float32)

    def put_bn(prefix_t, prefix_j):
        out[f"{prefix_j}.bn_scale"] = np.asarray(sd[f"{prefix_t}.weight"], np.float32)
        out[f"{prefix_j}.bn_bias"] = np.asarray(sd[f"{prefix_t}.bias"], np.float32)
        out[f"{prefix_j}.bn_mean"] = np.asarray(
            sd[f"{prefix_t}.running_mean"], np.float32)
        out[f"{prefix_j}.bn_var"] = np.asarray(
            sd[f"{prefix_t}.running_var"], np.float32)

    # features.0 is a bare ConvBNReLU; the rest are InvertedResiduals
    put_conv("backbone.features.0.0", "features.0")
    put_bn("backbone.features.0.1", "features.0")
    idx = 1
    cin = 32
    for expand, cout, n, s in _MBV2_SETTING:
        for i in range(n):
            t = f"backbone.features.{idx}.conv"
            j = f"features.{idx}"
            li = 0
            if expand != 1:
                put_conv(f"{t}.{li}.0", f"{j}.expand")
                put_bn(f"{t}.{li}.1", f"{j}.expand")
                li += 1
            put_conv(f"{t}.{li}.0", f"{j}.dw", depthwise=True)
            put_bn(f"{t}.{li}.1", f"{j}.dw")
            put_conv(f"{t}.{li + 1}", f"{j}.pw")
            put_bn(f"{t}.{li + 2}", f"{j}.pw")
            cin = cout
            idx += 1
    for blk in (15, 17, 19, 21):
        for c in (1, 2):
            put_conv(f"block{blk}.conv{c}.0", f"block{blk}.conv{c}",
                     biased=True)
            put_bn(f"block{blk}.conv{c}.1", f"block{blk}.conv{c}")
    for blk in (16, 18, 20, 22):
        for c in (1, 2):
            put_conv(f"block{blk}.conv{c}.0", f"block{blk}.conv{c}",
                     biased=True)
            put_bn(f"block{blk}.conv{c}.1", f"block{blk}.conv{c}")
    for c in (1, 2):
        put_conv(f"block23.conv{c}.0", f"block23.conv{c}", biased=True)
        put_bn(f"block23.conv{c}.1", f"block23.conv{c}")
    out["block23.conv3_kernel"] = np.asarray(
        sd["block23.conv3.weight"], np.float32).transpose(2, 3, 1, 0)
    out["block23.conv3_bias"] = np.asarray(sd["block23.conv3.bias"], np.float32)
    return out


def decode_lines(tpmap: np.ndarray, score_thr: float = 0.10,
                 dist_thr: float = 20.0, topk: int = 200,
                 ksize: int = 3) -> np.ndarray:
    """utils.py:19 + utils.py:49 — center heat NMS + displacement decode.
    tpmap: [h, w, 9] (channel 0 center, 1:5 displacement). Returns
    [N, 4] (x0, y0, x1, y1) at 2× the map resolution."""
    from scipy.ndimage import maximum_filter

    center = tpmap[..., 0]
    heat = 1.0 / (1.0 + np.exp(-center))
    hmax = maximum_filter(heat, size=ksize, mode="constant")
    heat = np.where(hmax == heat, heat, 0.0).reshape(-1)
    h, w = center.shape
    order = np.argsort(heat)[::-1][:topk]
    scores = heat[order]
    yy, xx = order // w, order % w
    disp = tpmap[..., 1:5]
    start = disp[..., :2]
    end = disp[..., 2:]
    dist = np.sqrt(((start - end) ** 2).sum(-1))
    segs = []
    for y, x, s in zip(yy, xx, scores):
        if s > score_thr and dist[y, x] > dist_thr:
            dx0, dy0, dx1, dy1 = disp[y, x]
            segs.append([x + dx0, y + dy0, x + dx1, y + dy1])
    if not segs:
        return np.zeros((0, 4), np.float32)
    return 2.0 * np.asarray(segs, np.float32)


@preprocessor_registry.register("mlsd", aliases=("MLSDdetector",))
class MLSDPreprocessor(BasePreprocessor):
    """Wireframe line map (reference src/preprocess/mlsd/__init__.py:23)."""

    name = "mlsd"
    params_schema = {"thr_v": 0.1, "thr_d": 0.1, "detect_resolution": 512}
    weights_id = "mlsd"

    def __init__(self, model: Optional[MLSDModel] = None):
        self.model = model
        self._fwd = None

    def _ensure_model(self) -> MLSDModel:
        if self.model is None:
            self.model = MLSDModel(rngs=nnx.Rngs(0))
            from apex_studio_tpu.preprocess.weights import (
                load_preprocessor_weights)

            try:
                sd = load_preprocessor_weights(
                    "mlsd", hf_repo="lllyasviel/Annotators",
                    hf_filename="mlsd_large_512_fp32.pth")
            except Exception:
                sd = None
                logger.warning("mlsd weights unavailable; random init")
            if sd:
                tree = convert_mlsd_keys(sd)
                graphdef, state = nnx.split(self.model)
                for path, leaf in state.flat_state():
                    nm = ".".join(str(p) for p in path)
                    if nm in tree:
                        leaf.value = jnp.asarray(tree[nm])
                self.model = nnx.merge(graphdef, state)
        return self.model

    def process_frame(self, frame: Frame, thr_v: float = 0.1,
                      thr_d: float = 0.1, detect_resolution: int = 512,
                      **_) -> Frame:
        import cv2

        model = self._ensure_model()
        h, w = frame.shape[:2]
        size = int(detect_resolution)
        img = cv2.resize(frame, (size, size), interpolation=cv2.INTER_AREA)
        x = np.concatenate(
            [img.astype(np.float32), np.ones((size, size, 1), np.float32)],
            axis=-1)
        x = x / 127.5 - 1.0
        if self._fwd is None:
            graphdef, _ = nnx.split(model)

            @jax.jit
            def fwd(state, inp):
                return nnx.merge(graphdef, state)(inp)

            self._fwd = fwd
        _, state = nnx.split(model)
        tpmap = np.asarray(self._fwd(state, jnp.asarray(x)[None])[0])
        # reference passes thr_d straight through as the map-pixel distance
        # threshold (mlsd/__init__.py:72 → utils.py:49 dist_thr)
        lines = decode_lines(tpmap, score_thr=thr_v, dist_thr=thr_d)
        out = np.zeros((size, size, 3), np.uint8)
        for x0, y0, x1, y1 in lines:
            cv2.line(out, (int(x0), int(y0)), (int(x1), int(y1)),
                     (255, 255, 255), 1)
        return cv2.resize(out, (w, h), interpolation=cv2.INTER_NEAREST)
