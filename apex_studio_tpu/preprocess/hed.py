"""HED soft-edge detector (ControlNet HED) in JAX.

Behavioral counterpart of the reference's ``src/preprocess/hed``
(ControlNetHED_Apache2 + HEDdetector): a 5-stage VGG-style conv stack with a
1-channel projection per stage; the five projections are bilinearly resized
to the input, averaged and squashed by a sigmoid. ``safe`` quantizes the edge
ramp (util.safe_step) and ``scribble`` turns the soft edge into a binary
sketch via directional NMS + blur + threshold (hed/__init__.py:135).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.base import BasePreprocessor, Frame, preprocessor_registry
from apex_studio_tpu.preprocess.depth_anything import Conv


class _DoubleConvBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, layers: int, *, rngs: nnx.Rngs):
        self.convs = nnx.List(
            [Conv(cin if i == 0 else cout, cout, 3, padding=1, rngs=rngs)
             for i in range(layers)])
        self.projection = Conv(cout, 1, 1, padding=0, rngs=rngs)

    def __call__(self, x, down_sampling: bool = False):
        if down_sampling:
            x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        for conv in self.convs:
            x = nnx.relu(conv(x))
        return x, self.projection(x)


class ControlNetHED(nnx.Module):
    def __init__(self, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.norm = nnx.Param(jnp.zeros((1, 1, 1, 3), jnp.float32))
        self.block1 = _DoubleConvBlock(3, 64, 2, rngs=rngs)
        self.block2 = _DoubleConvBlock(64, 128, 2, rngs=rngs)
        self.block3 = _DoubleConvBlock(128, 256, 3, rngs=rngs)
        self.block4 = _DoubleConvBlock(256, 512, 3, rngs=rngs)
        self.block5 = _DoubleConvBlock(512, 512, 3, rngs=rngs)

    def __call__(self, x):  # NHWC raw-pixel-range input
        h = x - self.norm.value
        h, p1 = self.block1(h)
        h, p2 = self.block2(h, down_sampling=True)
        h, p3 = self.block3(h, down_sampling=True)
        h, p4 = self.block4(h, down_sampling=True)
        h, p5 = self.block5(h, down_sampling=True)
        return p1, p2, p3, p4, p5


def convert_hed_keys(sd: dict) -> dict:
    """ControlNetHED.pth torch keys → this module's tree (values: OIHW conv
    kernels transposed to HWIO; the norm reshaped to NHWC)."""
    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k == "norm":
            out["norm"] = v.reshape(1, 1, 1, 3)
            continue
        nk = k.replace(".weight", ".kernel")
        if nk.endswith(".kernel") and v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)
        out[nk] = v
    return out


def nms_sketch(x: np.ndarray, t: int, s: float) -> np.ndarray:
    """Directional dilation NMS (reference preprocess/util.py:98)."""
    import cv2

    x = cv2.GaussianBlur(x.astype(np.float32), (0, 0), s)
    kernels = [np.array(k, np.uint8) for k in (
        [[0, 0, 0], [1, 1, 1], [0, 0, 0]],
        [[0, 1, 0], [0, 1, 0], [0, 1, 0]],
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        [[0, 0, 1], [0, 1, 0], [1, 0, 0]])]
    y = np.zeros_like(x)
    for f in kernels:
        np.putmask(y, cv2.dilate(x, kernel=f) == x, x)
    z = np.zeros_like(y, dtype=np.uint8)
    z[y > t] = 255
    return z


@preprocessor_registry.register("hed", aliases=("softedge_hed", "softedge"))
class HEDPreprocessor(BasePreprocessor):
    name = "hed"
    params_schema = {"safe": False, "scribble": False}
    weights_id = "hed"

    def __init__(self, model: Optional[ControlNetHED] = None):
        self.model = model
        self._fwd = None

    def _ensure_model(self):
        if self.model is None:
            self.model = ControlNetHED()
            from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

            try:
                sd = load_preprocessor_weights(
                    "hed", hf_repo="lllyasviel/Annotators",
                    hf_filename="ControlNetHED.pth")
            except Exception:
                sd = None
            if sd:
                self._load(convert_hed_keys(sd))
        return self.model

    def _load(self, tree: dict) -> None:
        graphdef, state = nnx.split(self.model)
        flat = state.flat_state()
        for path, leaf in flat:
            name = ".".join(str(p) for p in path)
            if name in tree and tree[name].shape == leaf.value.shape:
                leaf.value = jnp.asarray(tree[name])
        self.model = nnx.merge(graphdef, state)

    def process_frame(self, frame: Frame, safe: bool = False,
                      scribble: bool = False, **_: Any) -> Frame:
        import cv2

        model = self._ensure_model()
        h, w = frame.shape[:2]
        # pad to /16 so the four maxpools stay aligned
        ph, pw = (-h) % 16, (-w) % 16
        x = np.pad(frame, ((0, ph), (0, pw), (0, 0)), mode="edge")
        if self._fwd is None or self._fwd[0] != x.shape:
            graphdef, state = nnx.split(model)

            @jax.jit
            def fwd(s, v):
                return nnx.merge(graphdef, s)(v)

            self._fwd = (x.shape, fwd, state)
        _, fwd, state = self._fwd
        edges = fwd(state, jnp.asarray(x.astype(np.float32))[None])
        maps = [cv2.resize(np.asarray(e)[0, :, :, 0], (w, h),
                           interpolation=cv2.INTER_LINEAR) for e in edges]
        edge = 1.0 / (1.0 + np.exp(-np.mean(np.stack(maps, 2), axis=2,
                                            dtype=np.float64)))
        if safe:
            edge = (edge * 3.0).astype(np.int32).astype(np.float32) / 2.0
        out = (edge * 255.0).clip(0, 255).astype(np.uint8)
        if scribble:
            out = nms_sketch(out, 127, 3.0)
            out = cv2.GaussianBlur(out, (0, 0), 3.0)
            out = np.where(out > 4, 255, 0).astype(np.uint8)
        return np.repeat(out[:, :, None], 3, axis=2)


@preprocessor_registry.register("scribble_hed")
class ScribbleHEDPreprocessor(HEDPreprocessor):
    name = "scribble_hed"

    def process_frame(self, frame: Frame, **kw: Any) -> Frame:
        kw["scribble"] = True
        return super().process_frame(frame, **kw)
