"""TEED (Tiny and Efficient Edge Detector) in JAX.

Behavioral counterpart of the reference's ``src/preprocess/teed``
(ted.py TED + __init__.py TEDDetector): a ~58K-parameter three-block edge
net with smish activations, three upsampling heads and a depthwise
double-fusion head.  Raw 0-255 RGB goes in (the torch model is trained
without input normalization); the four edge maps are averaged, squashed by a
sigmoid and quantized by ``safe_step`` (util.py:122).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.base import BasePreprocessor, Frame, preprocessor_registry
from apex_studio_tpu.preprocess.depth_anything import Conv


def smish(x):
    """x * tanh(log(1 + sigmoid(x))) (teed/Fsmish.py)."""
    return x * jnp.tanh(jnp.log1p(jax.nn.sigmoid(x)))


class _Deconv(nnx.Module):
    """ConvTranspose2d(k, stride=2, padding=p) as lhs-dilated conv.

    Kernel stored HWIO as ``w`` (torch (in,out,kH,kW) transposed 2,3,0,1),
    spatially flipped at call; symmetric pad k-1-p reproduces torch's
    output length (in-1)*2 + k - 2p.
    """

    def __init__(self, cin: int, cout: int, k: int, p: int, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.w = nnx.Param(init(rngs.params(), (k, k, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.pad = k - 1 - p

    def __call__(self, x):
        kern = jnp.flip(self.w.value, (0, 1))
        y = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.bias.value


class _DWConv(nnx.Module):
    """Depthwise 3x3 conv (groups == cin), torch weight (cout,1,3,3) →
    HWIO (3,3,1,cout)."""

    def __init__(self, cin: int, mult: int, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(
            init(rngs.params(), (3, 3, 1, cin * mult), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cin * mult,), jnp.float32))
        self.groups = cin

    def __call__(self, x):
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(1, 1),
            padding=((1, 1), (1, 1)), feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.bias.value


class _DoubleConvBlock(nnx.Module):
    def __init__(self, cin, mid, cout=None, stride=1, use_act=True, *,
                 rngs: nnx.Rngs):
        cout = mid if cout is None else cout
        self.conv1 = Conv(cin, mid, 3, stride=stride, padding=1, rngs=rngs)
        self.conv2 = Conv(mid, cout, 3, padding=1, rngs=rngs)
        self.use_act = use_act

    def __call__(self, x):
        x = smish(self.conv1(x))
        x = self.conv2(x)
        return smish(x) if self.use_act else x


class _DenseLayer(nnx.Module):
    """conv(3x3, pad 2) → smish → conv(3x3, valid); returns
    0.5 * (new + skip) (ted.py:101)."""

    def __init__(self, cin, cout, *, rngs: nnx.Rngs):
        self.conv1 = Conv(cin, cout, 3, padding=2, rngs=rngs)
        self.conv2 = Conv(cout, cout, 3, padding=0, rngs=rngs)

    def __call__(self, x, skip):
        h = self.conv2(smish(self.conv1(smish(x))))
        return 0.5 * (h + skip)


class _UpBlock1(nnx.Module):
    """UpConvBlock(up_scale=1): 1x1 conv → smish → deconv k2 s2 p0."""

    def __init__(self, cin, *, rngs: nnx.Rngs):
        self.conv = Conv(cin, 1, 1, padding=0, rngs=rngs)
        self.deconv = _Deconv(1, 1, 2, 0, rngs=rngs)

    def __call__(self, x):
        return self.deconv(smish(self.conv(x)))


class _UpBlock2(nnx.Module):
    """UpConvBlock(up_scale=2): two rounds of 1x1 conv → smish →
    deconv k4 s2 p1 (16 intermediate features)."""

    def __init__(self, cin, *, rngs: nnx.Rngs):
        self.conv_a = Conv(cin, 16, 1, padding=0, rngs=rngs)
        self.deconv_a = _Deconv(16, 16, 4, 1, rngs=rngs)
        self.conv_b = Conv(16, 1, 1, padding=0, rngs=rngs)
        self.deconv_b = _Deconv(1, 1, 4, 1, rngs=rngs)

    def __call__(self, x):
        x = self.deconv_a(smish(self.conv_a(x)))
        return self.deconv_b(smish(self.conv_b(x)))


class _DoubleFusion(nnx.Module):
    """Depthwise attention fusion (ted.py:73): dw 3→24, dw 24→24, channel
    sum, smish."""

    def __init__(self, *, rngs: nnx.Rngs):
        self.dwconv1 = _DWConv(3, 8, rngs=rngs)
        self.dwconv2 = _DWConv(24, 1, rngs=rngs)

    def __call__(self, x):
        attn = self.dwconv1(smish(x))
        attn2 = self.dwconv2(smish(attn))
        return smish(jnp.sum(attn2 + attn, axis=-1, keepdims=True))


class TED(nnx.Module):
    """ted.py:212 TED — NHWC raw-pixel input, returns 4 edge logit maps."""

    def __init__(self, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.block_1 = _DoubleConvBlock(3, 16, 16, stride=2, rngs=rngs)
        self.block_2 = _DoubleConvBlock(16, 32, use_act=False, rngs=rngs)
        self.dblock_3 = _DenseLayer(32, 48, rngs=rngs)
        self.side_1 = Conv(16, 32, 1, stride=2, padding=0, rngs=rngs)
        self.pre_dense_3 = Conv(32, 48, 1, padding=0, rngs=rngs)
        self.up_block_1 = _UpBlock1(16, rngs=rngs)
        self.up_block_2 = _UpBlock1(32, rngs=rngs)
        self.up_block_3 = _UpBlock2(48, rngs=rngs)
        self.block_cat = _DoubleFusion(rngs=rngs)

    def __call__(self, x):
        b1 = self.block_1(x)                         # H/2, 16
        b1_side = self.side_1(b1)                    # H/4, 32
        b2 = self.block_2(b1)                        # H/2, 32
        b2_down = nnx.max_pool(b2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        b2_add = b2_down + b1_side                   # H/4, 32
        b3 = self.dblock_3(b2_add, self.pre_dense_3(b2_down))  # H/4, 48
        o1 = self.up_block_1(b1)
        o2 = self.up_block_2(b2)
        o3 = self.up_block_3(b3)
        cat = jnp.concatenate([o1, o2, o3], axis=-1)
        fused = self.block_cat(cat)
        return o1, o2, o3, fused


def convert_teed_keys(sd: dict) -> dict:
    """7_model.pth torch keys → this module's tree."""
    ren = {
        "dblock_3.denselayer1.": "dblock_3.",
        "side_1.conv.": "side_1.",
        "pre_dense_3.conv.": "pre_dense_3.",
        "up_block_1.features.0.": "up_block_1.conv.",
        "up_block_1.features.2.": "up_block_1.deconv.",
        "up_block_2.features.0.": "up_block_2.conv.",
        "up_block_2.features.2.": "up_block_2.deconv.",
        "up_block_3.features.0.": "up_block_3.conv_a.",
        "up_block_3.features.2.": "up_block_3.deconv_a.",
        "up_block_3.features.3.": "up_block_3.conv_b.",
        "up_block_3.features.5.": "up_block_3.deconv_b.",
        "block_cat.DWconv1.": "block_cat.dwconv1.",
        "block_cat.DWconv2.": "block_cat.dwconv2.",
    }
    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        for old, new in ren.items():
            if k.startswith(old):
                k = new + k[len(old):]
                break
        if k.endswith(".weight") and v.ndim == 4:
            if ".deconv" in k:
                # ConvTranspose2d (in,out,kH,kW) → HW-in-out, stored unflipped
                out[k[:-7] + ".w"] = v.transpose(2, 3, 0, 1)
            else:
                out[k[:-7] + ".kernel"] = v.transpose(2, 3, 1, 0)
        else:
            out[k.replace(".weight", ".kernel")] = v
    return out


@preprocessor_registry.register("teed", aliases=("softedge_teed", "ted"))
class TEEDPreprocessor(BasePreprocessor):
    name = "teed"
    params_schema = {"safe_steps": 2}
    weights_id = "teed"

    def __init__(self, model: Optional[TED] = None):
        self.model = model
        self._fwd = None

    def _ensure_model(self):
        if self.model is None:
            self.model = TED()
            from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

            try:
                sd = load_preprocessor_weights(
                    "teed", hf_repo="bdsqlsz/qinglong_controlnet-lllite",
                    hf_filename="Annotators/7_model.pth")
            except Exception:
                sd = None
            if sd:
                self._load(convert_teed_keys(sd))
        return self.model

    def _load(self, tree: dict) -> None:
        graphdef, state = nnx.split(self.model)
        for path, leaf in state.flat_state():
            name = ".".join(str(p) for p in path)
            if name in tree and tree[name].shape == leaf.value.shape:
                leaf.value = jnp.asarray(tree[name])
        self.model = nnx.merge(graphdef, state)

    def process_frame(self, frame: Frame, safe_steps: int = 2,
                      **_: Any) -> Frame:
        import cv2

        model = self._ensure_model()
        h, w = frame.shape[:2]
        ph, pw = (-h) % 8, (-w) % 8
        x = np.pad(frame, ((0, ph), (0, pw), (0, 0)), mode="edge")
        if self._fwd is None or self._fwd[0] != x.shape:
            graphdef, state = nnx.split(model)

            @jax.jit
            def fwd(s, v):
                return nnx.merge(graphdef, s)(v)

            self._fwd = (x.shape, fwd, state)
        _, fwd, state = self._fwd
        maps = fwd(state, jnp.asarray(x.astype(np.float32))[None])
        maps = [cv2.resize(np.asarray(m)[0, :, :, 0], (w, h),
                           interpolation=cv2.INTER_LINEAR) for m in maps]
        edge = 1.0 / (1.0 + np.exp(-np.mean(np.stack(maps, 2), axis=2,
                                            dtype=np.float64)))
        if safe_steps:
            edge = (edge.astype(np.float32) * (safe_steps + 1)).astype(
                np.int32).astype(np.float32) / safe_steps
        out = (edge * 255.0).clip(0, 255).astype(np.uint8)
        return np.repeat(out[:, :, None], 3, axis=2)
