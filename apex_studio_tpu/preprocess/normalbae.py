"""NormalBAE surface-normal estimation (NNET) — first-party JAX implementation.

Counterpart of the reference's ``src/preprocess/normalbae/`` (NNET,
nets/NNET.py:9 = EfficientNet-B5 encoder + uncertainty-aware decoder,
checkpoint ``scannet.pt``). The torch original needs timm only to build the
tf_efficientnet_b5 backbone (nets/submodules/encoder.py:14); here the
backbone is :class:`~apex_studio_tpu.preprocess.efficientnet.EfficientNetFeatures`
and the checkpoint's embedded timm weights convert directly.

Inference path (nets/submodules/decoder.py:69-273, mode="test"):
- conv2 1x1 on features[10] (2048ch, 1/32), four UpSampleBN stages against
  features[7]/[5]/[4]/[3];
- out_res8 = 3x3 conv → norm_normalize (unit normal + ELU-shifted kappa);
- res4/res2/res1 heads: bilinear-upsample (align_corners=True) the feature
  map and previous prediction, concat, and run the 1x1 conv stack
  (Conv1d over flattened pixels ≡ 1x1 Conv2d) → norm_normalize;
- final output = out_res1[:, :3] rendered as ((n+1)/2)*255
  (normalbae/__init__.py:92-100).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.base import BasePreprocessor, preprocessor_registry
from apex_studio_tpu.preprocess.depth_anything import resize_bilinear_ac
from apex_studio_tpu.preprocess.efficientnet import (
    BNInf,
    EffNetConfig,
    EfficientNetFeatures,
    _cw,
    convert_timm_efficientnet,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class UpSampleBN(nnx.Module):
    """conv3x3→BN→LeakyReLU twice, after bilinear(ac=True) upsample+concat
    (normalbae submodules.py:69)."""

    def __init__(self, skip_input: int, out: int, bn_eps: float, rngs: nnx.Rngs):
        self.conv_a = nnx.Conv(skip_input, out, (3, 3), padding="SAME",
                               use_bias=False, rngs=rngs)
        self.bn_a = BNInf(out, bn_eps, rngs)
        self.conv_b = nnx.Conv(out, out, (3, 3), padding="SAME",
                               use_bias=False, rngs=rngs)
        self.bn_b = BNInf(out, bn_eps, rngs)

    def __call__(self, x: jax.Array, skip: jax.Array) -> jax.Array:
        x = resize_bilinear_ac(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([x, skip], axis=-1)
        x = jax.nn.leaky_relu(self.bn_a(self.conv_a(x)), 0.01)
        return jax.nn.leaky_relu(self.bn_b(self.conv_b(x)), 0.01)


def norm_normalize(x: jax.Array) -> jax.Array:
    """Unit-normalize the normal vector, ELU-shift kappa (submodules.py:102)."""
    n, kappa = x[..., :3], x[..., 3:]
    mag = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True)) + 1e-10
    kappa = jax.nn.elu(kappa) + 1.0 + 0.01
    return jnp.concatenate([n / mag, kappa], axis=-1)


class _Head(nnx.Module):
    """Conv1d(1x1) stack head: (C+4) → 128 → 128 → 128 → 4 with ReLU."""

    def __init__(self, in_ch: int, rngs: nnx.Rngs):
        mk = lambda i, o: nnx.Conv(i, o, (1, 1), use_bias=True, rngs=rngs)
        self.c0, self.c1, self.c2, self.c3 = (mk(in_ch, 128), mk(128, 128),
                                              mk(128, 128), mk(128, 4))

    def __call__(self, x: jax.Array) -> jax.Array:
        x = jax.nn.relu(self.c0(x))
        x = jax.nn.relu(self.c1(x))
        x = jax.nn.relu(self.c2(x))
        return self.c3(x)


class NNET(nnx.Module):
    def __init__(self, cfg: Optional[EffNetConfig] = None,
                 rngs: Optional[nnx.Rngs] = None):
        cfg = cfg or EffNetConfig.b5()
        rngs = rngs or nnx.Rngs(0)
        self.encoder = EfficientNetFeatures(cfg, rngs)
        ch = self.encoder.feature_channels()
        nf = cfg.head_ch
        # decoder widths scale with the head like the reference's 2048→1024→…
        d1, d2, d3, d4 = nf // 2, nf // 4, nf // 8, nf // 16
        self.conv2 = nnx.Conv(nf, nf, (1, 1), use_bias=True, rngs=rngs)
        self.up1 = UpSampleBN(nf + ch[7], d1, cfg.bn_eps, rngs)
        self.up2 = UpSampleBN(d1 + ch[5], d2, cfg.bn_eps, rngs)
        self.up3 = UpSampleBN(d2 + ch[4], d3, cfg.bn_eps, rngs)
        self.up4 = UpSampleBN(d3 + ch[3], d4, cfg.bn_eps, rngs)
        self.out_conv_res8 = nnx.Conv(d2, 4, (3, 3), padding="SAME",
                                      use_bias=True, rngs=rngs)
        self.out_conv_res4 = _Head(d2 + 4, rngs)
        self.out_conv_res2 = _Head(d3 + 4, rngs)
        self.out_conv_res1 = _Head(d4 + 4, rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        """NHWC normalized image → NHWC [nx, ny, nz, kappa] at input res."""
        f = self.encoder(x)
        x_d0 = self.conv2(f[10])
        x_d1 = self.up1(x_d0, f[7])
        x_d2 = self.up2(x_d1, f[5])
        x_d3 = self.up3(x_d2, f[4])
        x_d4 = self.up4(x_d3, f[3])

        out_res8 = norm_normalize(self.out_conv_res8(x_d2))

        def level(feat, prev, head):
            h, w = feat.shape[1] * 2, feat.shape[2] * 2
            fm = resize_bilinear_ac(feat, h, w)
            pr = resize_bilinear_ac(prev, h, w)
            return norm_normalize(head(jnp.concatenate([fm, pr], axis=-1)))

        out_res4 = level(x_d2, out_res8, self.out_conv_res4)
        out_res2 = level(x_d3, out_res4, self.out_conv_res2)
        out_res1 = level(x_d4, out_res2, self.out_conv_res1)
        return out_res1


def convert_nnet_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """scannet.pt ``{"model": state_dict}`` keys → flat paths for NNET.
    Handles the module./model. prefixes (normalbae/__init__.py:26-38)."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}
    out = convert_timm_efficientnet(
        {k: v for k, v in sd.items()
         if k.startswith("encoder.original_model.")},
        prefix="encoder.original_model.")
    out = {f"encoder.{k}": v for k, v in out.items()}

    def conv(dst, src, one_d=False):
        # torch layout throughout; the loader's _infer_transform moves
        # 4D .kernel entries to flax HWIO. Conv1d [out,in,1] → [out,in,1,1].
        w = sd[f"{src}.weight"]
        if one_d and w.ndim == 3:
            w = w[:, :, :, None]
        out[f"{dst}.kernel"] = np.ascontiguousarray(_cw(w))
        if f"{src}.bias" in sd:
            out[f"{dst}.bias"] = sd[f"{src}.bias"]

    conv("conv2", "decoder.conv2")
    for i, name in enumerate(["up1", "up2", "up3", "up4"], start=1):
        conv(f"{name}.conv_a", f"decoder.up{i}._net.0")
        conv(f"{name}.conv_b", f"decoder.up{i}._net.3")
        for ours, theirs in ((f"{name}.bn_a", f"decoder.up{i}._net.1"),
                             (f"{name}.bn_b", f"decoder.up{i}._net.4")):
            out[f"{ours}.scale"] = sd[f"{theirs}.weight"]
            out[f"{ours}.bias"] = sd[f"{theirs}.bias"]
            out[f"{ours}.mean"] = sd[f"{theirs}.running_mean"]
            out[f"{ours}.var"] = sd[f"{theirs}.running_var"]
    conv("out_conv_res8", "decoder.out_conv_res8")
    for res in (4, 2, 1):
        for li, ci in zip((0, 2, 4, 6), ("c0", "c1", "c2", "c3")):
            conv(f"out_conv_res{res}.{ci}", f"decoder.out_conv_res{res}.{li}",
                 one_d=True)
    return out


def _pad64(h: int, w: int):
    nh = ((h + 63) // 64) * 64
    nw = ((w + 63) // 64) * 64
    return nh - h, nw - w


@preprocessor_registry.register("normalbae", aliases=("NormalBaeDetector",))
class NormalBaePreprocessor(BasePreprocessor):
    """Surface-normal map via NNET (first-party JAX). Weights:
    ``scannet.pt`` (the ControlNet annotator release)."""

    name = "normalbae"
    params_schema = {"detect_resolution": 512}

    def __init__(self, model: Optional[NNET] = None):
        self._model = model
        self._jit = None

    def setup(self) -> None:
        if self._model is not None:
            return
        import torch

        from apex_studio_tpu.preprocess.weights import resolve_preprocessor_file

        path = resolve_preprocessor_file("scannet.pt",
                                         hf_repo="lllyasviel/Annotators")
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = {k: v.float().numpy() for k, v in ckpt["model"].items()}
        model = NNET()
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict

        apply_state_dict(model, convert_nnet_keys(sd), strict=False)
        self._model = model

    def _fn(self):
        if self._jit is None:
            graphdef, state = nnx.split(self._model)

            @jax.jit
            def run(state, x):
                return nnx.merge(graphdef, state)(x)

            self._jit = functools.partial(run, state)
        return self._jit

    def process_frame(self, frame: np.ndarray, **params) -> np.ndarray:
        import cv2

        h, w = frame.shape[:2]
        res = int(params.get("detect_resolution", 512))
        scale = res / min(h, w) if res else 1.0
        th, tw = int(round(h * scale)), int(round(w * scale))
        img = cv2.resize(frame, (tw, th), interpolation=cv2.INTER_CUBIC)
        ph, pw = _pad64(th, tw)
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
        x = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        out = np.asarray(self._fn()(jnp.asarray(x)[None]))[0]
        normal = out[:th, :tw, :3]
        vis = ((normal + 1.0) * 0.5).clip(0, 1)
        vis = (vis * 255.0).astype(np.uint8)
        return cv2.resize(vis, (w, h), interpolation=cv2.INTER_CUBIC)
