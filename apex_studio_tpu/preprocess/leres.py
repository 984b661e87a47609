"""LeReS relative depth (AdelaiDepth res101), first-party JAX.

Counterpart of the reference's vendored ``src/preprocess/leres/``: a
ResNeXt101-32x8d encoder (``leres/Resnext_torch.py`` — the torchvision ResNet
recipe) with the FTB/FFM/AO fusion decoder (``leres/network_auxi.py``),
run at the padded detect resolution and rendered as the reference does
(16-bit normalise → 8-bit → invert; ``leres/__init__.py:100-126``). The
``boost`` path (pix2pix merge network) is not implemented — ``boost=False``
is the reference's default.

Quirk preserved: FTB's ``conv_branch`` opens with an *inplace* ReLU, so the
skip connection actually adds ``relu(conv1(x))``, not ``conv1(x)``
(network_auxi.py:165 ``x = x + self.conv_branch(x)`` after the in-place
mutation). Checkpoints are trained under that semantic.

Checkpoint: ``lllyasviel/Annotators res101.pth`` → ``checkpoint["depth_model"]``
with ``module.`` prefixes; BatchNorms are folded to inference affine using the
stored running stats.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.base import (
    BasePreprocessor,
    Frame,
    preprocessor_registry,
)
from apex_studio_tpu.preprocess.depth_anything import Conv, resize_bilinear_ac

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class _BN(nnx.Module):
    """Inference BatchNorm2d: running-stats affine (torch eps 1e-5)."""

    def __init__(self, c: int):
        self.weight = nnx.Param(jnp.ones((c,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((c,), jnp.float32))
        self.running_mean = nnx.Param(jnp.zeros((c,), jnp.float32))
        self.running_var = nnx.Param(jnp.ones((c,), jnp.float32))

    def __call__(self, x):
        inv = jax.lax.rsqrt(self.running_var.value + 1e-5)
        return (x - self.running_mean.value) * (inv * self.weight.value) \
            + self.bias.value


class _GroupedConv(nnx.Module):
    """3x3 grouped conv, NHWC (the ResNeXt cardinality conv)."""

    def __init__(self, cin: int, cout: int, stride: int, groups: int, *,
                 rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(
            init(rngs.params(), (3, 3, cin // groups, cout), jnp.float32))
        self.stride = stride
        self.groups = groups

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.kernel.value, (self.stride, self.stride),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)


class _Bottleneck(nnx.Module):
    expansion = 4

    def __init__(self, cin: int, planes: int, stride: int, groups: int,
                 base_width: int, has_down: bool, *, rngs: nnx.Rngs):
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = Conv(cin, width, kernel=1, padding=0, use_bias=False,
                          rngs=rngs)
        self.bn1 = _BN(width)
        self.conv2 = _GroupedConv(width, width, stride, groups, rngs=rngs)
        self.bn2 = _BN(width)
        self.conv3 = Conv(width, planes * 4, kernel=1, padding=0,
                          use_bias=False, rngs=rngs)
        self.bn3 = _BN(planes * 4)
        if has_down:
            self.down_conv = Conv(cin, planes * 4, kernel=1, stride=stride,
                                  padding=0, use_bias=False, rngs=rngs)
            self.down_bn = _BN(planes * 4)
        else:
            self.down_conv = None

    def __call__(self, x):
        out = nnx.relu(self.bn1(self.conv1(x)))
        out = nnx.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        identity = x if self.down_conv is None else self.down_bn(self.down_conv(x))
        return nnx.relu(out + identity)


def _max_pool_3x3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


class _ResNeXt101(nnx.Module):
    """torchvision resnext101_32x8d returning the 4 stage features
    (Resnext_torch.py:253 _forward_impl)."""

    def __init__(self, *, rngs: nnx.Rngs):
        self.conv1 = Conv(3, 64, kernel=7, stride=2, padding=3,
                          use_bias=False, rngs=rngs)
        self.bn1 = _BN(64)
        blocks = (3, 4, 23, 3)
        groups, base_width = 32, 8
        cin = 64
        for li, (planes, n) in enumerate(zip((64, 128, 256, 512), blocks)):
            stride = 1 if li == 0 else 2
            layer = []
            for bi in range(n):
                s = stride if bi == 0 else 1
                has_down = bi == 0 and (s != 1 or cin != planes * 4)
                layer.append(_Bottleneck(cin, planes, s, groups, base_width,
                                         has_down, rngs=rngs))
                cin = planes * 4
            setattr(self, f"layer{li + 1}", nnx.List(layer))

    def __call__(self, x) -> List[jnp.ndarray]:
        x = nnx.relu(self.bn1(self.conv1(x)))
        x = _max_pool_3x3s2(x)
        feats = []
        for li in range(4):
            for blk in getattr(self, f"layer{li + 1}"):
                x = blk(x)
            feats.append(x)
        return feats


class _FTB(nnx.Module):
    """Feature transform block (network_auxi.py:126), with the inplace-ReLU
    skip quirk: out = relu(a + conv(relu(bn(conv(a))))) where a = relu(conv1(x))."""

    def __init__(self, cin: int, mid: int, *, rngs: nnx.Rngs):
        self.conv1 = Conv(cin, mid, rngs=rngs)
        self.branch_conv1 = Conv(mid, mid, rngs=rngs)
        self.branch_bn = _BN(mid)
        self.branch_conv2 = Conv(mid, mid, rngs=rngs)

    def __call__(self, x):
        a = nnx.relu(self.conv1(x))
        b = self.branch_conv2(nnx.relu(self.branch_bn(self.branch_conv1(a))))
        return nnx.relu(a + b)


class _FFM(nnx.Module):
    def __init__(self, cin: int, mid: int, cout: int, upfactor: int, *,
                 rngs: nnx.Rngs):
        self.ftb1 = _FTB(cin, mid, rngs=rngs)
        self.ftb2 = _FTB(mid, cout, rngs=rngs)
        self.upfactor = upfactor

    def __call__(self, low, high):
        x = self.ftb2(self.ftb1(low) + high)
        b, h, w, _ = x.shape
        return resize_bilinear_ac(x, h * self.upfactor, w * self.upfactor)


class _AO(nnx.Module):
    def __init__(self, cin: int, cout: int, upfactor: int, *, rngs: nnx.Rngs):
        self.conv1 = Conv(cin, cin // 2, rngs=rngs)
        self.bn = _BN(cin // 2)
        self.conv2 = Conv(cin // 2, cout, rngs=rngs)
        self.upfactor = upfactor

    def __call__(self, x):
        x = self.conv2(nnx.relu(self.bn(self.conv1(x))))
        b, h, w, _ = x.shape
        return resize_bilinear_ac(x, h * self.upfactor, w * self.upfactor)


class _LeReSDecoder(nnx.Module):
    """network_auxi.py:16 Decoder."""

    def __init__(self, *, rngs: nnx.Rngs):
        inch = (256, 512, 1024, 2048)
        mid = (256, 256, 256, 512)
        self.conv = _FTB(inch[3], mid[3], rngs=rngs)
        self.conv1 = Conv(mid[3], mid[2], rngs=rngs)
        self.ffm2 = _FFM(inch[2], mid[2], mid[2], 2, rngs=rngs)
        self.ffm1 = _FFM(inch[1], mid[1], mid[1], 2, rngs=rngs)
        self.ffm0 = _FFM(inch[0], mid[0], mid[0], 2, rngs=rngs)
        self.outconv = _AO(mid[0], 1, 2, rngs=rngs)

    def __call__(self, feats):
        x_32 = self.conv1(self.conv(feats[3]))
        b, h, w, _ = x_32.shape
        x_16 = resize_bilinear_ac(x_32, h * 2, w * 2)
        x_8 = self.ffm2(feats[2], x_16)
        x_4 = self.ffm1(feats[1], x_8)
        x_2 = self.ffm0(feats[0], x_4)
        return self.outconv(x_2)


class LeReSModel(nnx.Module):
    """RelDepthModel(backbone='resnext101') (multi_depth_model_woauxi.py:8)."""

    def __init__(self, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.encoder = _ResNeXt101(rngs=rngs)
        self.decoder = _LeReSDecoder(rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: NHWC ImageNet-normalized → relative depth (B, H, W, 1)."""
        return self.decoder(self.encoder(x))


def convert_leres_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """res101.pth ``depth_model`` state dict → our attribute paths."""
    import re

    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        v = np.asarray(v)
        for pre in ("module.", "depth_model."):
            if k.startswith(pre):
                k = k[len(pre):]
        if k.endswith("num_batches_tracked"):
            continue
        k = k.replace("encoder_modules.", "encoder.")
        k = k.replace("decoder_modules.", "decoder.")
        # bottleneck downsample Sequential(conv, bn)
        k = k.replace(".downsample.0.", ".down_conv.")
        k = k.replace(".downsample.1.", ".down_bn.")
        # FTB conv_branch Sequential(ReLU, Conv, BN, ReLU, Conv)
        k = k.replace(".conv_branch.1.", ".branch_conv1.")
        k = k.replace(".conv_branch.2.", ".branch_bn.")
        k = k.replace(".conv_branch.4.", ".branch_conv2.")
        # AO adapt_conv Sequential(Conv, BN, ReLU, Conv, Upsample)
        k = k.replace(".adapt_conv.0.", ".conv1.")
        k = k.replace(".adapt_conv.1.", ".bn.")
        k = k.replace(".adapt_conv.3.", ".conv2.")
        if k.endswith(".weight") and v.ndim == 4:
            k = k[: -len(".weight")] + ".kernel"
        out[k] = v
    return out


@preprocessor_registry.register("leres", aliases=("LeresDetector",))
class LeReSPreprocessor(BasePreprocessor):
    """LeReS inverse relative depth map (reference leres/__init__.py)."""

    name = "leres"
    hf_repo = "lllyasviel/Annotators"
    params_schema = {"detect_resolution": 512, "thr_a": 0, "thr_b": 0}

    def __init__(self, model: Optional[LeReSModel] = None):
        self._model = model
        self._jit = None

    def setup(self) -> None:
        if self._model is not None:
            return
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

        sd = load_preprocessor_weights("res101", hf_repo=self.hf_repo,
                                       hf_filename="res101.pth")
        if "depth_model" in sd:
            sd = sd["depth_model"]
        self._model = LeReSModel(rngs=nnx.Rngs(0))
        apply_state_dict(self._model, convert_leres_keys(sd), strict=False)

    def _fn(self):
        if self._jit is None:
            graphdef, state = nnx.split(self._model)

            @jax.jit
            def run(state, x):
                return nnx.merge(graphdef, state)(x)

            self._jit = (run, state)
        return self._jit

    def process_frame(self, frame: Frame, detect_resolution: int = 512,
                      thr_a: int = 0, thr_b: int = 0, **_) -> Frame:
        import cv2

        h0, w0 = frame.shape[:2]
        # resize_image_with_pad semantics (util.py:172): short side to the
        # detect resolution, edge-pad to multiples of 64
        k = float(detect_resolution) / float(min(h0, w0))
        ht, wt = int(round(h0 * k)), int(round(w0 * k))
        interp = cv2.INTER_CUBIC if k > 1 else cv2.INTER_AREA
        img = cv2.resize(np.asarray(frame)[..., :3], (wt, ht),
                         interpolation=interp)
        img = np.pad(img, [[0, (-ht) % 64], [0, (-wt) % 64], [0, 0]],
                     mode="edge")
        x = (img.astype(np.float32) / 255.0 - _MEAN) / _STD
        run, state = self._fn()
        depth = np.asarray(run(state, jnp.asarray(x)[None]))[0, :ht, :wt, 0]
        # 16-bit normalise → 8-bit → invert (leres/__init__.py:100-126)
        dmin, dmax = float(depth.min()), float(depth.max())
        if dmax - dmin > np.finfo(np.float32).eps:
            out16 = (65535.0 * (depth - dmin) / (dmax - dmin)).astype(np.uint16)
        else:
            out16 = np.zeros(depth.shape, np.uint16)
        out8 = cv2.convertScaleAbs(out16, alpha=255.0 / 65535.0)
        if thr_a:
            out8 = cv2.threshold(out8, thr_a / 100 * 255, 255,
                                 cv2.THRESH_TOZERO)[1]
        out8 = cv2.bitwise_not(out8)
        if thr_b:
            out8 = cv2.threshold(out8, thr_b / 100 * 255, 255,
                                 cv2.THRESH_TOZERO)[1]
        vis = np.repeat(out8[:, :, None], 3, axis=2)
        return cv2.resize(vis, (w0, h0), interpolation=cv2.INTER_CUBIC)
