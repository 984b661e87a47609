"""PiDiNet soft-edge detector in JAX.

Behavioral counterpart of the reference's ``src/preprocess/pidi``
(PiDiNet carv4, inplane=60, dil=24, sa=True): pixel-difference convolutions
folded into vanilla kernels at load time —
- **cd** (central difference): W'[center] -= ΣW (model.py:306),
- **ad** (angular difference): W' = W − W[clockwise-shuffled] (model.py:327),
- **rd** (radial difference): 3x3 weights scattered ±into a 5x5 buffer
  (model.py:350) — so the runtime network is plain depthwise/1x1 convs:
4 stages (stride-2 maxpool between), CDCM dilated fusion, CSAM spatial
attention, per-stage MapReduce edge maps upsampled and fused by a 1x1
classifier; all five sigmoids, last one is the output (model.py:684).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.base import BasePreprocessor, Frame, preprocessor_registry
from apex_studio_tpu.preprocess.depth_anything import Conv

_CARV4 = ["cd", "ad", "rd", "cv"] * 4


class _DWConv(nnx.Module):
    """Depthwise conv, kernel (k, k, 1, C)."""

    def __init__(self, ch, k, padding, dilation=1, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (k, k, 1, ch), jnp.float32))
        self.padding, self.dilation, self.ch = padding, dilation, ch

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(1, 1),
            padding=((self.padding, self.padding),) * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.ch)


class _PDCBlock(nnx.Module):
    def __init__(self, pdc, cin, cout, stride=1, *, rngs: nnx.Rngs):
        self.stride = stride
        if stride > 1:
            self.shortcut = Conv(cin, cout, 1, padding=0, rngs=rngs)
        else:
            self.shortcut = None
        k = 5 if pdc == "rd" else 3
        self.conv1 = _DWConv(cin, k, k // 2, rngs=rngs)
        self.conv2 = Conv(cin, cout, 1, padding=0, use_bias=False, rngs=rngs)

    def __call__(self, x):
        if self.stride > 1:
            x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        y = self.conv2(nnx.relu(self.conv1(x)))
        if self.shortcut is not None:
            x = self.shortcut(x)
        return y + x


class _CDCM(nnx.Module):
    def __init__(self, cin, cout, *, rngs: nnx.Rngs):
        self.conv1 = Conv(cin, cout, 1, padding=0, rngs=rngs)
        self.branches = nnx.List(
            [_DilConv(cout, d, rngs=rngs) for d in (5, 7, 9, 11)])

    def __call__(self, x):
        x = self.conv1(nnx.relu(x))
        return sum(b(x) for b in self.branches)


class _DilConv(nnx.Module):
    def __init__(self, ch, dilation, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (3, 3, ch, ch), jnp.float32))
        self.dilation = dilation

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(1, 1),
            padding=((self.dilation, self.dilation),) * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _CSAM(nnx.Module):
    def __init__(self, ch, *, rngs: nnx.Rngs):
        self.conv1 = Conv(ch, 4, 1, padding=0, rngs=rngs)
        self.conv2 = Conv(4, 1, 3, padding=1, use_bias=False, rngs=rngs)

    def __call__(self, x):
        y = nnx.sigmoid(self.conv2(self.conv1(nnx.relu(x))))
        return x * y


class PiDiNet(nnx.Module):
    def __init__(self, inplane: int = 60, dil: int = 24, *,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.init_block = Conv(3, inplane, 3, padding=1, use_bias=False,
                               rngs=rngs)
        c = inplane
        self.blocks1 = nnx.List([_PDCBlock(_CARV4[i], c, c, rngs=rngs)
                                 for i in (1, 2, 3)])
        self.blocks2 = nnx.List(
            [_PDCBlock(_CARV4[4], c, 2 * c, stride=2, rngs=rngs)]
            + [_PDCBlock(_CARV4[i], 2 * c, 2 * c, rngs=rngs) for i in (5, 6, 7)])
        self.blocks3 = nnx.List(
            [_PDCBlock(_CARV4[8], 2 * c, 4 * c, stride=2, rngs=rngs)]
            + [_PDCBlock(_CARV4[i], 4 * c, 4 * c, rngs=rngs)
               for i in (9, 10, 11)])
        self.blocks4 = nnx.List(
            [_PDCBlock(_CARV4[12], 4 * c, 4 * c, stride=2, rngs=rngs)]
            + [_PDCBlock(_CARV4[i], 4 * c, 4 * c, rngs=rngs)
               for i in (13, 14, 15)])
        planes = [c, 2 * c, 4 * c, 4 * c]
        self.dilations = nnx.List([_CDCM(p, dil, rngs=rngs) for p in planes])
        self.attentions = nnx.List([_CSAM(dil, rngs=rngs) for _ in planes])
        self.conv_reduces = nnx.List(
            [Conv(dil, 1, 1, padding=0, rngs=rngs) for _ in planes])
        self.classifier = Conv(4, 1, 1, padding=0, rngs=rngs)

    def __call__(self, x):  # NHWC in [0,1] (BGR order like the reference)
        h, w = x.shape[1:3]
        x = self.init_block(x)
        feats = []
        for blocks in (self.blocks1, self.blocks2, self.blocks3, self.blocks4):
            for blk in blocks:
                x = blk(x)
            feats.append(x)
        maps = []
        for i, f in enumerate(feats):
            e = self.conv_reduces[i](self.attentions[i](self.dilations[i](f)))
            e = jax.image.resize(e, (e.shape[0], h, w, 1), "bilinear")
            maps.append(e)
        out = self.classifier(jnp.concatenate(maps, axis=-1))
        return nnx.sigmoid(out)


def convert_pidinet_keys(sd: dict) -> dict:
    """table5_pidinet.pth state_dict (raw carv4 PDC weights) → folded vanilla
    kernels in this module's tree (reference model.py:300 createConvFunc)."""
    out = {}
    stage_of = {"1": "blocks1", "2": "blocks2", "3": "blocks3", "4": "blocks4"}

    def fold(pdc, w):  # w: (O, I, 3, 3) torch layout
        if pdc == "cd":
            w = w.copy()
            w[:, :, 1, 1] -= w.sum(axis=(2, 3))
            return w
        if pdc == "ad":
            flat = w.reshape(w.shape[0], w.shape[1], 9)
            shuf = flat[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]
            return (flat - shuf).reshape(w.shape)
        if pdc == "rd":
            buf = np.zeros((w.shape[0], w.shape[1], 25), w.dtype)
            flat = w.reshape(w.shape[0], w.shape[1], 9)
            buf[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = flat[:, :, 1:]
            buf[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -flat[:, :, 1:]
            return buf.reshape(w.shape[0], w.shape[1], 5, 5)
        return w

    def hwio(w):
        return np.asarray(w).transpose(2, 3, 1, 0)

    layer_idx = {"init_block": 0}
    for s, names in (("1", ["block1_1", "block1_2", "block1_3"]),
                     ("2", ["block2_1", "block2_2", "block2_3", "block2_4"]),
                     ("3", ["block3_1", "block3_2", "block3_3", "block3_4"]),
                     ("4", ["block4_1", "block4_2", "block4_3", "block4_4"])):
        for j, n in enumerate(names):
            layer_idx[n] = (stage_of[s], j)

    base = 1
    pdc_of = {}
    for s, names in (("1", ["block1_1", "block1_2", "block1_3"]),
                     ("2", ["block2_1", "block2_2", "block2_3", "block2_4"]),
                     ("3", ["block3_1", "block3_2", "block3_3", "block3_4"]),
                     ("4", ["block4_1", "block4_2", "block4_3", "block4_4"])):
        for n in names:
            pdc_of[n] = _CARV4[base]
            base += 1

    for k, v in sd.items():
        k = k.replace("module.", "")
        v = np.asarray(v)
        parts = k.split(".")
        top = parts[0]
        if top == "init_block":
            if parts[-1] == "weight":
                out["init_block.kernel"] = hwio(fold(_CARV4[0], v))
            else:
                out["init_block.bias"] = v
        elif top in pdc_of:
            stage, j = layer_idx[top]
            sub, leaf = parts[1], parts[-1]
            name = f"{stage}.{j}.{sub}"
            if sub == "conv1" and leaf == "weight":
                w = fold(pdc_of[top], v)  # (C, 1, k, k) depthwise
                out[f"{name}.kernel"] = np.asarray(w).transpose(2, 3, 1, 0)
            elif sub == "conv2" and leaf == "weight":
                out[f"{name}.kernel"] = hwio(v)
            elif sub == "shortcut":
                out[f"{name}.{'kernel' if leaf == 'weight' else 'bias'}"] = \
                    hwio(v) if leaf == "weight" else v
        elif top == "dilations":
            i, sub, leaf = parts[1], parts[2], parts[-1]
            if sub == "conv1":
                out[f"dilations.{i}.conv1."
                    f"{'kernel' if leaf == 'weight' else 'bias'}"] = \
                    hwio(v) if leaf == "weight" else v
            else:  # conv2_1..conv2_4
                bidx = int(sub[-1]) - 1
                out[f"dilations.{i}.branches.{bidx}.kernel"] = hwio(v)
        elif top == "attentions":
            i, sub, leaf = parts[1], parts[2], parts[-1]
            out[f"attentions.{i}.{sub}."
                f"{'kernel' if leaf == 'weight' else 'bias'}"] = \
                hwio(v) if leaf == "weight" else v
        elif top == "conv_reduces":
            i, leaf = parts[1], parts[-1]
            out[f"conv_reduces.{i}."
                f"{'kernel' if leaf == 'weight' else 'bias'}"] = \
                hwio(v) if leaf == "weight" else v
        elif top == "classifier":
            out[f"classifier.{'kernel' if parts[-1] == 'weight' else 'bias'}"] \
                = hwio(v) if parts[-1] == "weight" else v
    return out


@preprocessor_registry.register(
    "pidinet", aliases=("softedge_pidinet", "pidi", "scribble_pidinet")
)
class PiDiNetPreprocessor(BasePreprocessor):
    name = "pidinet"
    params_schema = {"safe": False, "scribble": False, "apply_filter": False}

    def __init__(self, model: Optional[PiDiNet] = None):
        self.model = model
        self._fwd = None

    def _ensure(self):
        if self.model is None:
            m = PiDiNet()
            from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

            try:
                sd = load_preprocessor_weights(
                    "pidinet", hf_repo="lllyasviel/Annotators",
                    hf_filename="table5_pidinet.pth")
            except Exception:
                sd = None
            if sd:
                if "state_dict" in sd:
                    sd = sd["state_dict"]
                tree = convert_pidinet_keys(sd)
                graphdef, state = nnx.split(m)
                for path, leaf in state.flat_state():
                    nm = ".".join(str(p) for p in path)
                    if nm in tree and tree[nm].shape == leaf.value.shape:
                        leaf.value = jnp.asarray(tree[nm])
                m = nnx.merge(graphdef, state)
            self.model = m
        return self.model

    def process_frame(self, frame: Frame, safe: bool = False,
                      scribble: bool = False, apply_filter: bool = False,
                      **_: Any) -> Frame:
        model = self._ensure()
        h, w = frame.shape[:2]
        ph, pw = (-h) % 8, (-w) % 8
        x = np.pad(frame[:, :, ::-1], ((0, ph), (0, pw), (0, 0)), mode="edge")
        if self._fwd is None or self._fwd[0] != x.shape:
            graphdef, state = nnx.split(model)

            @jax.jit
            def fwd(s, v):
                return nnx.merge(graphdef, s)(v)

            self._fwd = (x.shape, fwd, state)
        _, fwd, state = self._fwd
        edge = np.asarray(fwd(state, jnp.asarray(x.astype(np.float32) / 255.0)
                              [None]))[0, :h, :w, 0]
        if apply_filter:
            edge = (edge > 0.5).astype(np.float32)
        if safe:
            edge = (edge * 3.0).astype(np.int32).astype(np.float32) / 2.0
        out = (edge * 255.0).clip(0, 255).astype(np.uint8)
        if scribble:
            from apex_studio_tpu.preprocess.hed import nms_sketch
            import cv2

            out = nms_sketch(out, 127, 3.0)
            out = cv2.GaussianBlur(out, (0, 0), 3.0)
            out = np.where(out > 4, 255, 0).astype(np.uint8)
        return np.repeat(out[:, :, None], 3, axis=2)
