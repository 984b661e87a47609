"""Learned lineart detector (awacke sk_model) in JAX.

Behavioral counterpart of the reference's ``src/preprocess/lineart``
(Generator, n_residual_blocks=3): reflection-padded conv stem, two stride-2
downsamples, InstanceNorm residual blocks, two transposed-conv upsamples and
a sigmoid head; the sigmoid line map is inverted to black-lines-on-white
(lineart/__init__.py:168). ``coarse=True`` routes to the sk_model2 weights.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.base import BasePreprocessor, Frame, preprocessor_registry


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _instance_norm(x, eps=1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _Conv(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (k, k, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride = stride

    def __call__(self, x, padding=((0, 0), (0, 0))):
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(self.stride, self.stride),
            padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.bias.value


class _Deconv(nnx.Module):
    """ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1) via
    lhs-dilated conv with a pre-flipped kernel stored as ``w``."""

    def __init__(self, cin, cout, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.w = nnx.Param(init(rngs.params(), (3, 3, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x):
        k = jnp.flip(self.w.value, (0, 1))  # (H,W,in,out) pre-flip → HWIO
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.bias.value


class _ResBlock(nnx.Module):
    def __init__(self, ch, *, rngs: nnx.Rngs):
        self.conv1 = _Conv(ch, ch, 3, rngs=rngs)
        self.conv2 = _Conv(ch, ch, 3, rngs=rngs)

    def __call__(self, x):
        h = nnx.relu(_instance_norm(self.conv1(_reflect_pad(x, 1))))
        h = _instance_norm(self.conv2(_reflect_pad(h, 1)))
        return x + h


class LineartGenerator(nnx.Module):
    def __init__(self, n_blocks: int = 3, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.conv_in = _Conv(3, 64, 7, rngs=rngs)
        self.down1 = _Conv(64, 128, 3, stride=2, rngs=rngs)
        self.down2 = _Conv(128, 256, 3, stride=2, rngs=rngs)
        self.res_blocks = nnx.List([_ResBlock(256, rngs=rngs)
                                    for _ in range(n_blocks)])
        self.up1 = _Deconv(256, 128, rngs=rngs)
        self.up2 = _Deconv(128, 64, rngs=rngs)
        self.conv_out = _Conv(64, 1, 7, rngs=rngs)

    def __call__(self, x):  # NHWC in [0,1]
        h = nnx.relu(_instance_norm(self.conv_in(_reflect_pad(x, 3))))
        h = nnx.relu(_instance_norm(self.down1(h, padding=((1, 1), (1, 1)))))
        h = nnx.relu(_instance_norm(self.down2(h, padding=((1, 1), (1, 1)))))
        for blk in self.res_blocks:
            h = blk(h)
        h = nnx.relu(_instance_norm(self.up1(h)))
        h = nnx.relu(_instance_norm(self.up2(h)))
        return nnx.sigmoid(self.conv_out(_reflect_pad(h, 3)))


def convert_lineart_keys(sd: dict) -> dict:
    """sk_model.pth keys (model0..model4 Sequential indices) → module tree."""
    out = {}
    ren = {
        "model0.1": "conv_in", "model1.0": "down1", "model1.3": "down2",
        "model3.0": "up1", "model3.3": "up2", "model4.1": "conv_out",
    }
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.rsplit(".", 1)
        stem, leaf = parts[0], parts[1]
        if stem.startswith("model2."):
            _, idx, _, conv_idx = stem.split(".")
            which = "conv1" if conv_idx == "1" else "conv2"
            name = f"res_blocks.{idx}.{which}"
        elif stem in ren:
            name = ren[stem]
        else:
            continue
        if leaf == "weight" and v.ndim == 4:
            if name.startswith("up"):
                out[f"{name}.w"] = v.transpose(2, 3, 0, 1)  # IOHW → HWIO(io)
            else:
                out[f"{name}.kernel"] = v.transpose(2, 3, 1, 0)
        elif leaf == "bias":
            out[f"{name}.bias"] = v
    return out


@preprocessor_registry.register(
    "lineart_realistic", aliases=("lineart_model", "lineart_coarse")
)
class LineartModelPreprocessor(BasePreprocessor):
    name = "lineart_realistic"
    params_schema = {"coarse": False}

    def __init__(self, model: Optional[LineartGenerator] = None,
                 coarse_model: Optional[LineartGenerator] = None):
        self.model = model
        self.coarse_model = coarse_model
        self._fwd = {}

    def _ensure(self, coarse: bool):
        attr = "coarse_model" if coarse else "model"
        if getattr(self, attr) is None:
            m = LineartGenerator()
            from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

            try:
                sd = load_preprocessor_weights(
                    "lineart_coarse" if coarse else "lineart_sk",
                    hf_repo="lllyasviel/Annotators",
                    hf_filename="sk_model2.pth" if coarse else "sk_model.pth")
            except Exception:
                sd = None
            if sd:
                tree = convert_lineart_keys(sd)
                graphdef, state = nnx.split(m)
                for path, leaf in state.flat_state():
                    nm = ".".join(str(p) for p in path)
                    if nm in tree and tree[nm].shape == leaf.value.shape:
                        leaf.value = jnp.asarray(tree[nm])
                m = nnx.merge(graphdef, state)
            setattr(self, attr, m)
        return getattr(self, attr)

    def process_frame(self, frame: Frame, coarse: bool = False, **_: Any) -> Frame:
        model = self._ensure(bool(coarse))
        h, w = frame.shape[:2]
        ph, pw = (-h) % 4, (-w) % 4
        x = np.pad(frame, ((0, ph), (0, pw), (0, 0)), mode="edge")
        key = (bool(coarse), x.shape)
        if key not in self._fwd:
            graphdef, state = nnx.split(model)

            @jax.jit
            def fwd(s, v):
                return nnx.merge(graphdef, s)(v)

            self._fwd[key] = (fwd, state)
        fwd, state = self._fwd[key]
        line = fwd(state, jnp.asarray(x.astype(np.float32) / 255.0)[None])
        line = np.asarray(line)[0, :h, :w, 0]
        out = 255 - (line * 255.0).clip(0, 255).astype(np.uint8)
        return np.repeat(out[:, :, None], 3, axis=2)


@preprocessor_registry.register("scribble_anime", aliases=("ScribbleAnimeDetector",))
class ScribbleAnimePreprocessor(BasePreprocessor):
    """Anime-style scribble contours (reference src/preprocess/scribble_anime
    ContourInference — the SAME generator topology as the lineart sk_model,
    n_residual_blocks=3, different checkpoint netG_A_latest.pth from
    ali-vilab/VACE-Annotators). Output is the raw contour map, NOT inverted
    (scribble_anime/__init__.py:163)."""

    name = "scribble_anime"
    params_schema = {"detect_resolution": 512}
    weights_id = "scribble_anime"

    def __init__(self, model: Optional[LineartGenerator] = None):
        self.model = model
        self._fwd = {}

    def _ensure(self) -> LineartGenerator:
        if self.model is None:
            m = LineartGenerator()
            from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

            try:
                sd = load_preprocessor_weights(
                    "scribble_anime", hf_repo="ali-vilab/VACE-Annotators",
                    hf_filename="scribble/anime_style/netG_A_latest.pth")
            except Exception:
                sd = None
            if sd:
                sd = {k.replace("module.", ""): v for k, v in sd.items()}
                tree = convert_lineart_keys(sd)
                graphdef, state = nnx.split(m)
                for path, leaf in state.flat_state():
                    nm = ".".join(str(p) for p in path)
                    if nm in tree and tree[nm].shape == leaf.value.shape:
                        leaf.value = jnp.asarray(tree[nm])
                m = nnx.merge(graphdef, state)
            self.model = m
        return self.model

    def process_frame(self, frame: Frame, detect_resolution: int = 512,
                      **_: Any) -> Frame:
        import cv2

        model = self._ensure()
        h, w = frame.shape[:2]
        size = int(detect_resolution)
        size -= size % 4
        img = cv2.resize(frame, (size, size), interpolation=cv2.INTER_CUBIC)
        key = ("anime", img.shape)
        if key not in self._fwd:
            graphdef, state = nnx.split(model)

            @jax.jit
            def fwd(s, v):
                return nnx.merge(graphdef, s)(v)

            self._fwd[key] = (fwd, state)
        fwd, state = self._fwd[key]
        line = fwd(state, jnp.asarray(img.astype(np.float32) / 255.0)[None])
        contour = (np.asarray(line)[0, :, :, 0] * 255.0).clip(0, 255)
        contour = contour.astype(np.uint8)
        out = cv2.resize(contour, (w, h), interpolation=cv2.INTER_AREA)
        return np.repeat(out[:, :, None], 3, axis=2)
