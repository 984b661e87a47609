"""MangaLineExtraction in JAX/NNX.

Counterpart of the reference's ``src/preprocess/manga_line`` — the
``res_skip`` network (model_torch.py:198): a BN-first residual U-Net over a
raw 0-255 grayscale image. Encoder blocks 0-4 (24→384 channels, stride-2 on
each block's LAST unit), nearest-×2 upsampling decoder blocks 5-8 with
1×1-conv skips from the mirrored encoder stage, a 16-channel refine block
and a 1×1 head. Output is a 0-255 line intensity map, inverted by the
wrapper (__init__.py:82 ``255 - line``)."""

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


class _BnReluConv(nnx.Module):
    """model_torch.py:7 — BatchNorm(eps 1e-3) → LeakyReLU(0.2) → conv."""

    def __init__(self, cin: int, cout: int, k: int = 3, stride: int = 1, *,
                 rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.bn_scale = nnx.Param(jnp.ones((cin,), jnp.float32))
        self.bn_bias = nnx.Param(jnp.zeros((cin,), jnp.float32))
        self.bn_mean = nnx.Param(jnp.zeros((cin,), jnp.float32))
        self.bn_var = nnx.Param(jnp.ones((cin,), jnp.float32))
        self.kernel = nnx.Param(init(rngs.params(), (k, k, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.k, self.stride = k, stride

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = (x - self.bn_mean.value) * jax.lax.rsqrt(self.bn_var.value + 1e-3)
        x = x * self.bn_scale.value + self.bn_bias.value
        x = jnp.where(x >= 0, x, 0.2 * x)
        p = self.k // 2
        return jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + self.bias.value


def _up2_nearest(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class _Conv1x1(nnx.Module):
    def __init__(self, cin: int, cout: int, stride: int = 1, *,
                 rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (1, 1, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride = stride

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + self.bias.value


class _BasicBlock(nnx.Module):
    """model_torch.py:119 — conv1 → residual conv, 1×1 shortcut when the
    shape changes."""

    def __init__(self, cin: int, cout: int, stride: int = 1, *,
                 rngs: nnx.Rngs):
        self.conv1 = _BnReluConv(cin, cout, 3, stride, rngs=rngs)
        self.residual = _BnReluConv(cout, cout, 3, rngs=rngs)
        self.shortcut = (_Conv1x1(cin, cout, stride, rngs=rngs)
                         if cin != cout or stride != 1 else None)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self.residual(self.conv1(x))
        sc = x if self.shortcut is None else self.shortcut(x)
        return sc + y


class _UBasicBlock(nnx.Module):
    """model_torch.py:136 — upsampling unit: conv path and shortcut both
    nearest-×2 upsampled."""

    def __init__(self, cin: int, cout: int, *, rngs: nnx.Rngs):
        self.conv1 = _BnReluConv(cin, cout, 3, rngs=rngs)
        self.residual = _BnReluConv(cout, cout, 3, rngs=rngs)
        self.shortcut = _Conv1x1(cin, cout, rngs=rngs) if cin != cout else None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self.residual(_up2_nearest(self.conv1(x)))
        sc = x if self.shortcut is None else self.shortcut(x)
        return _up2_nearest(sc) + y if self.shortcut is not None \
            else _up2_nearest(x) + y


class MangaLineModel(nnx.Module):
    """res_skip (model_torch.py:198). NHWC 1-channel 0-255 float input."""

    _ENC = [(1, 24, 2, True), (24, 48, 3, False), (48, 96, 5, False),
            (96, 192, 7, False), (192, 384, 12, False)]
    _DEC = [(384, 192, 7), (192, 96, 5), (96, 48, 3), (48, 24, 2)]

    def __init__(self, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)

        def enc(cin, cout, reps, first):
            blocks = []
            for i in range(reps):
                stride = 2 if (i == reps - 1 and not first) else 1
                blocks.append(_BasicBlock(cin if i == 0 else cout, cout,
                                          stride, rngs=rngs))
            return nnx.List(blocks)

        def dec(cin, cout, reps):
            blocks: List[nnx.Module] = [_UBasicBlock(cin, cout, rngs=rngs)]
            blocks += [_BasicBlock(cout, cout, rngs=rngs)
                       for _ in range(reps - 1)]
            return nnx.List(blocks)

        self.block0 = enc(*self._ENC[0][:3], self._ENC[0][3])
        self.block1 = enc(*self._ENC[1][:3], self._ENC[1][3])
        self.block2 = enc(*self._ENC[2][:3], self._ENC[2][3])
        self.block3 = enc(*self._ENC[3][:3], self._ENC[3][3])
        self.block4 = enc(*self._ENC[4][:3], self._ENC[4][3])
        self.block5 = dec(*self._DEC[0])
        self.block6 = dec(*self._DEC[1])
        self.block7 = dec(*self._DEC[2])
        self.block8 = dec(*self._DEC[3])
        self.block9 = enc(24, 16, 2, True)
        self.conv15 = _BnReluConv(16, 1, 1, rngs=rngs)

    @staticmethod
    def _run(blocks, x):
        for b in blocks:
            x = b(x)
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x0 = self._run(self.block0, x)
        x1 = self._run(self.block1, x0)
        x2 = self._run(self.block2, x1)
        x3 = self._run(self.block3, x2)
        x4 = self._run(self.block4, x3)
        res1 = x3 + self._run(self.block5, x4)
        res2 = x2 + self._run(self.block6, res1)
        res3 = x1 + self._run(self.block7, res2)
        res4 = x0 + self._run(self.block8, res3)
        x9 = self._run(self.block9, res4)
        return self.conv15(x9)


def convert_manga_line_keys(sd: dict) -> dict:
    """torch res_skip state dict → flat jax paths (HWIO kernels). The
    identity res1-res4 shortcuts carry no params; 1×1 shortcuts inside
    blocks map to ``.shortcut``."""
    out = {}

    def put_brc(t, j):
        out[f"{j}.bn_scale"] = np.asarray(sd[f"{t}.0.weight"], np.float32)
        out[f"{j}.bn_bias"] = np.asarray(sd[f"{t}.0.bias"], np.float32)
        out[f"{j}.bn_mean"] = np.asarray(sd[f"{t}.0.running_mean"], np.float32)
        out[f"{j}.bn_var"] = np.asarray(sd[f"{t}.0.running_var"], np.float32)
        out[f"{j}.kernel"] = np.asarray(
            sd[f"{t}.2.weight"], np.float32).transpose(2, 3, 1, 0)
        out[f"{j}.bias"] = np.asarray(sd[f"{t}.2.bias"], np.float32)

    def put_sc(t, j):
        if f"{t}.0.weight" in sd:
            out[f"{j}.kernel"] = np.asarray(
                sd[f"{t}.0.weight"], np.float32).transpose(2, 3, 1, 0)
            out[f"{j}.bias"] = np.asarray(sd[f"{t}.0.bias"], np.float32)

    reps = {"block0": 2, "block1": 3, "block2": 5, "block3": 7, "block4": 12,
            "block5": 7, "block6": 5, "block7": 3, "block8": 2, "block9": 2}
    for blk, n in reps.items():
        for i in range(n):
            t = f"{blk}.model.{i}"
            j = f"{blk}.{i}"
            put_brc(f"{t}.conv1.model", f"{j}.conv1")
            put_brc(f"{t}.residual.model", f"{j}.residual")
            put_sc(f"{t}.shortcut.model", f"{j}.shortcut")
    put_brc("conv15.model", "conv15")
    return out


@preprocessor_registry.register("manga_line", aliases=("LineartMangaDetector",
                                                       "lineart_manga"))
class MangaLinePreprocessor(BasePreprocessor):
    """Manga/screentone line extraction (reference manga_line/__init__.py)."""

    name = "manga_line"
    params_schema = {"detect_resolution": 512}
    weights_id = "manga_line"

    def __init__(self, model: Optional[MangaLineModel] = None):
        self.model = model
        self._fwd = None

    def _ensure_model(self) -> MangaLineModel:
        if self.model is None:
            self.model = MangaLineModel(rngs=nnx.Rngs(0))
            from apex_studio_tpu.preprocess.weights import (
                load_preprocessor_weights)

            try:
                sd = load_preprocessor_weights(
                    "manga_line", hf_repo="lllyasviel/Annotators",
                    hf_filename="erika.pth")
            except Exception:
                sd = None
                logger.warning("manga_line weights unavailable; random init")
            if sd:
                sd = {k.replace("module.", ""): v for k, v in sd.items()}
                tree = convert_manga_line_keys(sd)
                graphdef, state = nnx.split(self.model)
                for path, leaf in state.flat_state():
                    nm = ".".join(str(p) for p in path)
                    if nm in tree:
                        leaf.value = jnp.asarray(tree[nm])
                self.model = nnx.merge(graphdef, state)
        return self.model

    def process_frame(self, frame: Frame, detect_resolution: int = 512,
                      **_) -> Frame:
        import cv2

        model = self._ensure_model()
        h, w = frame.shape[:2]
        size = 256 * int(np.ceil(detect_resolution / 256.0))
        img = cv2.resize(frame, (size, size), interpolation=cv2.INTER_CUBIC)
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
        if self._fwd is None:
            graphdef, _ = nnx.split(model)

            @jax.jit
            def fwd(state, x):
                return nnx.merge(graphdef, state)(x)

            self._fwd = fwd
        _, state = nnx.split(model)
        line = np.asarray(self._fwd(state, jnp.asarray(gray)[None, :, :, None]))
        line = np.clip(line[0, :, :, 0], 0, 255).astype(np.uint8)
        out = 255 - line  # __init__.py:82 inversion
        out = cv2.resize(out, (w, h), interpolation=cv2.INTER_CUBIC)
        return np.stack([out] * 3, axis=-1)
