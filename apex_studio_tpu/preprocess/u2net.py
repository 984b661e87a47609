"""U2Net salient-object segmentation in JAX — the rembg background remover.

Behavioral counterpart of the reference's ``src/preprocess/rembg`` (which
delegates to the rembg library's onnx U2Net session): same 320x320
ImageNet-normalized input contract, min-max normalized saliency map, optional
mask post-processing and background-color compositing, RGBA output.

The network is the public U2-Net architecture (Qin et al. 2020): nested
U-blocks (RSU-7..4 + dilated RSU-4F) with six side outputs fused by a 1x1
conv.  ``u2net`` is the 176MB full model, ``u2netp`` the 4.7MB light one.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.base import BasePreprocessor, Frame, preprocessor_registry


class _ConvBnRelu(nnx.Module):
    """conv 3x3 (dilated) + eval-mode batchnorm + relu (torch REBNCONV)."""

    def __init__(self, cin: int, cout: int, dilation: int = 1, *,
                 rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (3, 3, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.bn_scale = nnx.Param(jnp.ones((cout,), jnp.float32))
        self.bn_bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.bn_mean = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.bn_var = nnx.Param(jnp.ones((cout,), jnp.float32))
        self.dilation = dilation

    def __call__(self, x):
        d = self.dilation
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(1, 1),
            padding=((d, d), (d, d)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + self.bias.value
        y = (y - self.bn_mean.value) * jax.lax.rsqrt(self.bn_var.value + 1e-5)
        y = y * self.bn_scale.value + self.bn_bias.value
        return nnx.relu(y)


def _pool(x):
    """maxpool 2x2 stride 2, torch ceil_mode=True."""
    h, w = x.shape[1], x.shape[2]
    return nnx.max_pool(x, (2, 2), strides=(2, 2),
                        padding=((0, h % 2), (0, w % 2)))


def _up_to(x, ref):
    """Bilinear resize to ref's spatial dims (torch F.upsample bilinear)."""
    b, h, w, c = ref.shape
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


class _RSU(nnx.Module):
    """Residual U-block of depth L with pooling (torch RSU7..RSU4)."""

    def __init__(self, depth: int, cin: int, mid: int, cout: int, *,
                 rngs: nnx.Rngs):
        self.depth = depth
        self.convin = _ConvBnRelu(cin, cout, rngs=rngs)
        enc = [_ConvBnRelu(cout, mid, rngs=rngs)]
        for _ in range(depth - 2):
            enc.append(_ConvBnRelu(mid, mid, rngs=rngs))
        self.enc = nnx.List(enc)
        self.bottom = _ConvBnRelu(mid, mid, dilation=2, rngs=rngs)
        dec = [_ConvBnRelu(2 * mid, mid, rngs=rngs)
               for _ in range(depth - 2)]
        dec.append(_ConvBnRelu(2 * mid, cout, rngs=rngs))
        self.dec = nnx.List(dec)

    def __call__(self, x):
        xin = self.convin(x)
        feats = []
        h = xin
        for i, conv in enumerate(self.enc):
            h = conv(h)
            feats.append(h)
            if i < len(self.enc) - 1:
                h = _pool(h)
        h = self.bottom(h)
        for i, conv in enumerate(self.dec):
            skip = feats[-(i + 1)]
            if i > 0:
                h = _up_to(h, skip)
            h = conv(jnp.concatenate([h, skip], axis=-1))
        return _up_to(h, xin) + xin if h.shape[1] != xin.shape[1] else h + xin


class _RSU4F(nnx.Module):
    """Dilated residual U-block, no pooling (torch RSU4F)."""

    def __init__(self, cin: int, mid: int, cout: int, *, rngs: nnx.Rngs):
        self.convin = _ConvBnRelu(cin, cout, rngs=rngs)
        self.enc = nnx.List([
            _ConvBnRelu(cout, mid, dilation=1, rngs=rngs),
            _ConvBnRelu(mid, mid, dilation=2, rngs=rngs),
            _ConvBnRelu(mid, mid, dilation=4, rngs=rngs),
        ])
        self.bottom = _ConvBnRelu(mid, mid, dilation=8, rngs=rngs)
        self.dec = nnx.List([
            _ConvBnRelu(2 * mid, mid, dilation=4, rngs=rngs),
            _ConvBnRelu(2 * mid, mid, dilation=2, rngs=rngs),
            _ConvBnRelu(2 * mid, cout, dilation=1, rngs=rngs),
        ])

    def __call__(self, x):
        xin = self.convin(x)
        f1 = self.enc[0](xin)
        f2 = self.enc[1](f1)
        f3 = self.enc[2](f2)
        h = self.bottom(f3)
        h = self.dec[0](jnp.concatenate([h, f3], axis=-1))
        h = self.dec[1](jnp.concatenate([h, f2], axis=-1))
        h = self.dec[2](jnp.concatenate([h, f1], axis=-1))
        return h + xin


class _SideConv(nnx.Module):
    """3x3 conv to a 1-channel side logit map."""

    def __init__(self, cin: int, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (3, 3, cin, 1), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((1,), jnp.float32))

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + self.bias.value


class U2Net(nnx.Module):
    """Full / light U2-Net. ``light=False`` → u2net, True → u2netp."""

    def __init__(self, light: bool = False, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        if light:
            st = [(7, 3, 16, 64), (6, 64, 16, 64), (5, 64, 16, 64),
                  (4, 64, 16, 64)]
            f5, f6 = (64, 16, 64), (64, 16, 64)
            dd = [(128, 16, 64)] * 5
            dec_depths = [4, 5, 6, 7]
            side_ch = [64] * 6
        else:
            st = [(7, 3, 32, 64), (6, 64, 32, 128), (5, 128, 64, 256),
                  (4, 256, 128, 512)]
            f5, f6 = (512, 256, 512), (512, 256, 512)
            dd = [(1024, 256, 512), (1024, 128, 256), (512, 64, 128),
                  (256, 32, 64), (128, 16, 64)]
            dec_depths = [4, 5, 6, 7]
            side_ch = [64, 64, 128, 256, 512, 512]
        self.stage1 = _RSU(st[0][0], *st[0][1:], rngs=rngs)
        self.stage2 = _RSU(st[1][0], *st[1][1:], rngs=rngs)
        self.stage3 = _RSU(st[2][0], *st[2][1:], rngs=rngs)
        self.stage4 = _RSU(st[3][0], *st[3][1:], rngs=rngs)
        self.stage5 = _RSU4F(*f5, rngs=rngs)
        self.stage6 = _RSU4F(*f6, rngs=rngs)
        self.stage5d = _RSU4F(*dd[0], rngs=rngs)
        self.stage4d = _RSU(dec_depths[0], *dd[1], rngs=rngs)
        self.stage3d = _RSU(dec_depths[1], *dd[2], rngs=rngs)
        self.stage2d = _RSU(dec_depths[2], *dd[3], rngs=rngs)
        self.stage1d = _RSU(dec_depths[3], *dd[4], rngs=rngs)
        self.side1 = _SideConv(side_ch[0], rngs=rngs)
        self.side2 = _SideConv(side_ch[1], rngs=rngs)
        self.side3 = _SideConv(side_ch[2], rngs=rngs)
        self.side4 = _SideConv(side_ch[3], rngs=rngs)
        self.side5 = _SideConv(side_ch[4], rngs=rngs)
        self.side6 = _SideConv(side_ch[5], rngs=rngs)
        init = nnx.initializers.lecun_normal()
        self.outconv_kernel = nnx.Param(
            init(rngs.params(), (1, 1, 6, 1), jnp.float32))
        self.outconv_bias = nnx.Param(jnp.zeros((1,), jnp.float32))

    def __call__(self, x):
        h1 = self.stage1(x)
        h2 = self.stage2(_pool(h1))
        h3 = self.stage3(_pool(h2))
        h4 = self.stage4(_pool(h3))
        h5 = self.stage5(_pool(h4))
        h6 = self.stage6(_pool(h5))
        h6u = _up_to(h6, h5)
        d5 = self.stage5d(jnp.concatenate([h6u, h5], axis=-1))
        d4 = self.stage4d(jnp.concatenate([_up_to(d5, h4), h4], axis=-1))
        d3 = self.stage3d(jnp.concatenate([_up_to(d4, h3), h3], axis=-1))
        d2 = self.stage2d(jnp.concatenate([_up_to(d3, h2), h2], axis=-1))
        d1 = self.stage1d(jnp.concatenate([_up_to(d2, h1), h1], axis=-1))
        s1 = self.side1(d1)
        s2 = _up_to(self.side2(d2), d1)
        s3 = _up_to(self.side3(d3), d1)
        s4 = _up_to(self.side4(d4), d1)
        s5 = _up_to(self.side5(d5), d1)
        s6 = _up_to(self.side6(h6), d1)
        cat = jnp.concatenate([s1, s2, s3, s4, s5, s6], axis=-1)
        d0 = jax.lax.conv_general_dilated(
            cat, self.outconv_kernel.value, window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        d0 = d0 + self.outconv_bias.value
        return jax.nn.sigmoid(d0)


def convert_u2net_keys(sd: dict) -> dict:
    """u2net.pth torch keys → this module's tree.

    Torch RSU layers are named rebnconvin / rebnconv1..7 / rebnconv7 (bottom,
    dilation 2) / rebnconv6d..1d, each with conv_s1 + bn_s1; sides are
    side1..6, fuse is outconv.
    """
    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        if parts[0] == "outconv":
            if parts[1] == "weight":
                out["outconv_kernel"] = v.transpose(2, 3, 1, 0)
            else:
                out["outconv_bias"] = v
            continue
        stage = parts[0]                      # stage1, stage2d, side3, ...
        if stage.startswith("side"):
            if parts[1] == "weight":
                out[f"{stage}.kernel"] = v.transpose(2, 3, 1, 0)
            else:
                out[f"{stage}.bias"] = v
            continue
        layer, sub, attr = parts[1], parts[2], parts[3]
        # map torch layer name → our module path
        if layer == "rebnconvin":
            ours = "convin"
        elif layer.endswith("d"):             # decoder: rebnconv6d..1d
            idx = int(layer[len("rebnconv"):-1])
            # torch counts depth-1..1 downward; our dec list is in call order
            # rebnconv{depth-1}d is dec[0], rebnconv1d is dec[-1]
            ours = f"dec.__DEPTH{idx}__"
        else:
            idx = int(layer[len("rebnconv"):])
            ours = f"enc.{idx - 1}"           # provisional; bottom fixed below
        name = {"conv_s1": {"weight": "kernel", "bias": "bias"},
                "bn_s1": {"weight": "bn_scale", "bias": "bn_bias",
                          "running_mean": "bn_mean",
                          "running_var": "bn_var"}}.get(sub, {}).get(attr)
        if name is None:
            continue
        if name == "kernel":
            v = v.transpose(2, 3, 1, 0)
        out[f"{stage}.{ours}.{name}"] = v
    return out


def _finalize_u2net_tree(tree: dict, model: U2Net) -> dict:
    """Resolve per-stage depth-dependent names (bottom conv, decoder order)."""
    graphdef, state = nnx.split(model)
    shapes = {".".join(str(p) for p in path): leaf.value.shape
              for path, leaf in state.flat_state()}
    fixed = {}
    # discover each stage's encoder length from the model itself
    enc_len = {}
    for name in shapes:
        if ".enc." in name:
            stage = name.split(".enc.")[0]
            idx = int(name.split(".enc.")[1].split(".")[0])
            enc_len[stage] = max(enc_len.get(stage, 0), idx + 1)
    for k, v in tree.items():
        if "__DEPTH" in k:
            stage = k.split(".dec.")[0]
            idx = int(k.split("__DEPTH")[1].split("__")[0])
            n_dec = enc_len.get(stage, 3)     # dec count == enc count
            k = k.replace(f"dec.__DEPTH{idx}__", f"dec.{n_dec - idx}")
        elif ".enc." in k:
            stage = k.split(".enc.")[0]
            idx = int(k.split(".enc.")[1].split(".")[0])
            if idx == enc_len.get(stage, 99):  # torch's last = our bottom
                k = k.replace(f"enc.{idx}", "bottom")
        fixed[k] = v
    return {k: v for k, v in fixed.items()
            if k in shapes and shapes[k] == v.shape}


_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


@preprocessor_registry.register("rembg", aliases=("background_removal", "u2net"))
class RembgPreprocessor(BasePreprocessor):
    """Background removal via native-JAX U2Net (reference
    src/preprocess/rembg RembgDetector, rembg-library behavior)."""

    name = "rembg"
    params_schema = {"model_name": "u2net", "post_process_mask": False,
                     "bgcolor": None, "only_mask": False}
    weights_id = "u2net"

    def __init__(self, model: Optional[U2Net] = None,
                 model_name: str = "u2net"):
        self.model = model
        self.model_name = model_name
        self._fwd = None

    def _ensure_model(self, model_name: str):
        if self.model is None or model_name != self.model_name:
            self.model_name = model_name
            self.model = U2Net(light=model_name == "u2netp")
            self._fwd = None
            from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

            try:
                sd = load_preprocessor_weights(
                    model_name, hf_repo="tomjackson2023/rembg",
                    hf_filename=f"{model_name}.pth")
            except Exception:
                sd = None
            if sd:
                tree = _finalize_u2net_tree(convert_u2net_keys(sd), self.model)
                graphdef, state = nnx.split(self.model)
                for path, leaf in state.flat_state():
                    name = ".".join(str(p) for p in path)
                    if name in tree:
                        leaf.value = jnp.asarray(tree[name])
                self.model = nnx.merge(graphdef, state)
        return self.model

    def predict_mask(self, frame: Frame, model_name: str = "u2net") -> np.ndarray:
        """HW float [0,1] saliency map at the input resolution."""
        import cv2

        model = self._ensure_model(model_name)
        h, w = frame.shape[:2]
        x = cv2.resize(frame, (320, 320), interpolation=cv2.INTER_LINEAR)
        x = x.astype(np.float32)
        x = x / max(x.max(), 1e-6)
        x = (x - _MEAN) / _STD
        if self._fwd is None:
            graphdef, state = nnx.split(model)

            @jax.jit
            def fwd(s, v):
                return nnx.merge(graphdef, s)(v)

            self._fwd = (fwd, state)
        fwd, state = self._fwd
        d0 = np.asarray(fwd(state, jnp.asarray(x)[None]))[0, :, :, 0]
        mi, ma = d0.min(), d0.max()
        d0 = (d0 - mi) / max(ma - mi, 1e-6)
        return cv2.resize(d0, (w, h), interpolation=cv2.INTER_LANCZOS4).clip(0, 1)

    def process_frame(self, frame: Frame, model_name: str = "u2net",
                      post_process_mask: bool = False,
                      bgcolor: Optional[Sequence[int]] = None,
                      only_mask: bool = False, **_: Any) -> Frame:
        import cv2

        mask = self.predict_mask(frame, model_name)
        m8 = (mask * 255).astype(np.uint8)
        if post_process_mask:
            # rembg.post_process: open + gaussian blur + re-binarize ramp
            kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
            m8 = cv2.morphologyEx(m8, cv2.MORPH_OPEN, kernel)
            m8 = cv2.GaussianBlur(m8, (5, 5), sigmaX=2, sigmaY=2,
                                  borderType=cv2.BORDER_DEFAULT)
            m8 = np.where(m8 < 127, 0, 255).astype(np.uint8)
        if only_mask:
            return np.repeat(m8[:, :, None], 3, axis=2)
        rgba = np.dstack([frame[:, :, :3], m8])
        if bgcolor is not None:
            bg = np.zeros_like(rgba)
            bg[:, :, :3] = np.asarray(bgcolor[:3], np.uint8)
            bg[:, :, 3] = 255
            a = m8.astype(np.float32)[:, :, None] / 255.0
            rgb = rgba[:, :, :3].astype(np.float32) * a + \
                bg[:, :, :3].astype(np.float32) * (1 - a)
            return np.dstack([rgb.astype(np.uint8),
                              np.full_like(m8, 255)])
        return rgba
