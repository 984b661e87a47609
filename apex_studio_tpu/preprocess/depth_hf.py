"""MiDaS / ZoeDepth preprocessors via transformers DPT models.

Counterpart of the reference's ``src/preprocess/midas/transformers.py``
(MidasDetector) and ``src/preprocess/zoe/transformers.py`` (ZoeDetector,
ZoeDepthAnythingDetector). The REFERENCE ITSELF delegates these legacy
depth families to HuggingFace transformers torch models ("Modern MiDaS
implementation using HuggingFace transformers", midas/__init__.py:1) rather
than shipping its own net — we mirror that design: the DPT forward runs via
transformers on CPU torch (a one-shot preprocessor, not a hot path; the
TPU-native depth family is depth_anything.py), and the depth→normal
conversion (Sobel gradients with background threshold,
midas/transformers.py:198-208) is ported directly.

Without the model weights available these degrade to an informative error,
matching the reference's download-required behavior.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from apex_studio_tpu.preprocess.base import (
    BasePreprocessor,
    Frame,
    preprocessor_registry,
)

logger = logging.getLogger(__name__)

_MODEL_MAP = {
    "dpt_large": "Intel/dpt-large",
    "dpt_hybrid": "Intel/dpt-hybrid-midas",
    "midas_v21": "Intel/dpt-large",
    "midas_v21_small": "Intel/dpt-large",
}


def depth_to_normal(depth: np.ndarray, a: float = 2.0 * np.pi,
                    bg_th: float = 0.1) -> np.ndarray:
    """midas/transformers.py:198-208 — Sobel-gradient pseudo-normals with
    background suppression; BGR flip baked into the output like the
    reference."""
    import cv2

    depth = depth.astype(np.float32)
    rel = depth - depth.min()
    rel = rel / max(rel.max(), 1e-6)
    gx = cv2.Sobel(depth, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(depth, cv2.CV_32F, 0, 1, ksize=3)
    gz = np.ones_like(gx) * a
    gx[rel < bg_th] = 0
    gy[rel < bg_th] = 0
    normal = np.stack([gx, gy, gz], axis=2)
    normal /= np.sum(normal ** 2.0, axis=2, keepdims=True) ** 0.5
    return ((normal * 127.5 + 127.5).clip(0, 255)
            .astype(np.uint8)[:, :, ::-1])


class _HFDepthBase(BasePreprocessor):
    model_name: str = "Intel/dpt-large"

    def __init__(self, model_name: Optional[str] = None):
        if model_name:
            self.model_name = _MODEL_MAP.get(model_name, model_name)
        self._model = None
        self._processor = None

    def setup(self) -> None:
        if self._model is not None:
            return
        try:
            import torch  # noqa: F401
            from transformers import AutoImageProcessor, AutoModelForDepthEstimation

            from apex_studio_tpu.utils.defaults import (
                get_preprocessor_models_path)

            cache = get_preprocessor_models_path() / self.name
            self._processor = AutoImageProcessor.from_pretrained(
                self.model_name, cache_dir=cache)
            self._model = AutoModelForDepthEstimation.from_pretrained(
                self.model_name, cache_dir=cache).eval()
        except Exception as e:
            raise RuntimeError(
                f"{self.name}: transformers model {self.model_name!r} "
                f"unavailable ({e}); download it or use the TPU-native "
                f"'depth' (DepthAnythingV2) preprocessor") from e

    def _predict_depth(self, frame: Frame, detect_resolution: int) -> np.ndarray:
        import cv2
        import torch

        h, w = frame.shape[:2]
        size = int(detect_resolution)
        img = cv2.resize(frame, (size, size), interpolation=cv2.INTER_CUBIC)
        with torch.no_grad():
            inputs = self._processor(images=img, return_tensors="pt")
            depth = self._model(**inputs).predicted_depth
            depth = torch.nn.functional.interpolate(
                depth.unsqueeze(1), size=(size, size), mode="bicubic",
                align_corners=False)[0, 0].numpy()
        return cv2.resize(depth, (w, h), interpolation=cv2.INTER_CUBIC)


@preprocessor_registry.register("midas", aliases=("depth_midas",
                                                  "MidasDetector"))
class MidasPreprocessor(_HFDepthBase):
    """Relative depth (+optional normal map) via DPT (midas family)."""

    name = "midas"
    params_schema = {"a": float(2 * np.pi), "bg_th": 0.1,
                     "depth_and_normal": False, "detect_resolution": 512}

    def process_frame(self, frame: Frame, a: float = 2 * np.pi,
                      bg_th: float = 0.1, depth_and_normal: bool = False,
                      detect_resolution: int = 512, **_) -> Frame:
        depth = self._predict_depth(frame, detect_resolution)
        rel = depth - depth.min()
        rel = rel / max(rel.max(), 1e-6)
        depth_img = (rel * 255.0).clip(0, 255).astype(np.uint8)
        depth_img = np.stack([depth_img] * 3, axis=-1)
        if depth_and_normal:
            return depth_to_normal(depth, a=a, bg_th=bg_th)
        return depth_img


@preprocessor_registry.register(
    "normal_midas", aliases=("midas_normal",))
class MidasNormalPreprocessor(MidasPreprocessor):
    """Normal-map output of the midas path (depth_and_normal=True)."""

    name = "normal_midas"

    def process_frame(self, frame: Frame, **params) -> Frame:
        params["depth_and_normal"] = True
        return super().process_frame(frame, **params)


@preprocessor_registry.register("zoe", aliases=("depth_zoe", "ZoeDetector"))
class ZoePreprocessor(_HFDepthBase):
    """Metric depth via ZoeDepth (zoe/transformers.py:17); inverted so near
    is bright, matching the reference's rendering."""

    name = "zoe"
    model_name = "Intel/zoedepth-nyu-kitti"
    params_schema = {"detect_resolution": 512, "gamma_corrected": False}

    def process_frame(self, frame: Frame, detect_resolution: int = 512,
                      gamma_corrected: bool = False, **_) -> Frame:
        depth = self._predict_depth(frame, detect_resolution)
        # metric depth: invert to disparity-style vis (zoe wrapper semantics)
        vis = depth.max() - depth
        vis = vis / max(vis.max(), 1e-6)
        if gamma_corrected:
            vis = vis ** 2.2
        img = (vis * 255.0).clip(0, 255).astype(np.uint8)
        return np.stack([img] * 3, axis=-1)


@preprocessor_registry.register("depth_anything",
                                aliases=("DepthAnythingDetector",))
class DepthAnythingV1Preprocessor(MidasPreprocessor):
    """DepthAnything v1 relative depth. The reference's own modern path is an
    HF-transformers delegation (depth_anything/transformers.py:22,
    model LiheYoung/depth-anything-large-hf) — mirrored here; the v2 family
    has a first-party JAX implementation (preprocess/depth_anything.py)."""

    name = "depth_anything"
    model_name = "LiheYoung/depth-anything-large-hf"
    params_schema = {"detect_resolution": 512}

    def process_frame(self, frame: Frame, **params) -> Frame:
        params.pop("depth_and_normal", None)
        return super().process_frame(frame, **params)


@preprocessor_registry.register("zoe_depth_anything",
                                aliases=("ZoeDepthAnythingDetector",))
class ZoeDepthAnythingPreprocessor(ZoePreprocessor):
    """Metric depth, zoe_depth_anything id. The reference's implementation
    delegates to the same Intel/zoedepth-nyu-kitti transformers checkpoint as
    plain zoe (zoe/transformers.py:178-183) — kept identical for parity."""

    name = "zoe_depth_anything"
