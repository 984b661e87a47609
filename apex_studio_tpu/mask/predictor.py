"""SAM2 predictor wrapper — checkpoint resolution (auto-download), prompt
normalization, and the process-wide singleton the /mask routes use.

Checkpoint resolution order (mirrors ``src/mask/mask.py:57-80`` +
``mask.py:2069``): explicit ``APEX_SAM2_PATH`` env / ``mask_model_path``
config key → auto-download of the published checkpoint for the configured
``MASK_MODEL`` type (default ``sam2_base_plus``) into the preprocessor models
dir. When every path fails the mask API falls back to the classical GrabCut
segmenter in mask/segment.py — same wire format — and the failure is LOUD:
logged at error level and surfaced via :func:`mask_backend_status` (GET
/system/memory ``mask_backend``).
"""

from __future__ import annotations

import json
import logging
import os
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger("apex.mask.sam2")

_lock = threading.Lock()
_predictor: Optional["SAM2Predictor"] = None
_checked = False
_status: Dict[str, object] = {"backend": "classical", "model_type": None,
                              "checkpoint": None, "error": None}

# Published checkpoints per model type — reference src/mask/mask.py:65-71
# (SAM3 is the same nominal tier the reference exposes: enum + URL; its
# checkpoint loads through the same converter when key-compatible).
MODEL_WEIGHTS = {
    "sam2_tiny": "https://dl.fbaipublicfiles.com/segment_anything_2/092824/sam2.1_hiera_tiny.pt",
    "sam2_small": "https://dl.fbaipublicfiles.com/segment_anything_2/092824/sam2.1_hiera_small.pt",
    "sam2_base_plus": "https://dl.fbaipublicfiles.com/segment_anything_2/092824/sam2.1_hiera_base_plus.pt",
    "sam2_large": "https://dl.fbaipublicfiles.com/segment_anything_2/092824/sam2.1_hiera_large.pt",
    "sam3": "https://huggingface.co/1038lab/sam3/resolve/main/sam3.pt",
}


def mask_backend_status() -> Dict[str, object]:
    """Which segmentation backend /mask requests will use, and why —
    surfaced on /system/memory so a silent GrabCut fallback is impossible."""
    with _lock:
        return dict(_status)


def _resolve_checkpoint() -> Optional[Path]:
    """Explicit path (env/config) or auto-download of the configured type."""
    path = os.environ.get("APEX_SAM2_PATH")
    if not path:
        try:
            from apex_studio_tpu.utils.config_store import get_config_value

            path = get_config_value("mask_model_path")
        except Exception:  # noqa: BLE001
            path = None
    if path:
        p = Path(path)
        if p.exists():
            return p
        _status["error"] = f"configured mask_model_path missing: {path}"
        logger.error("%s", _status["error"])
        return None

    model_type = (os.environ.get("MASK_MODEL") or "sam2_base_plus").lower()
    _status["model_type"] = model_type
    url = MODEL_WEIGHTS.get(model_type)
    if url is None:
        _status["error"] = f"unknown MASK_MODEL {model_type!r}"
        logger.error("%s", _status["error"])
        return None
    from apex_studio_tpu.utils.defaults import get_preprocessor_models_path

    dest = get_preprocessor_models_path() / "sam2" / url.rsplit("/", 1)[-1]
    if dest.exists():
        return dest
    try:
        from apex_studio_tpu.downloads.api import download_file

        logger.info("downloading %s checkpoint: %s", model_type, url)
        return Path(download_file(url, dest, validate=False))
    except Exception as e:  # noqa: BLE001
        _status["error"] = f"checkpoint download failed: {e}"
        logger.error("SAM2 checkpoint auto-download failed (%s); the mask "
                     "API will use the classical GrabCut segmenter", e)
        return None


class SAM2Predictor:
    def __init__(self, model, img_size: int = 1024):
        self.model = model
        self.img_size = img_size
        self._jit = None

    @classmethod
    def from_checkpoint(cls, path: Path) -> "SAM2Predictor":
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.safetensors_io import (
            load_safetensors,
            load_sharded_safetensors,
        )
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.mask.sam2 import SAM2Config, SAM2ImageModel

        path = Path(path)
        cfg_file = path / "config.json" if path.is_dir() else path.parent / "config.json"
        cfg = SAM2Config.from_dict(json.loads(cfg_file.read_text())) if cfg_file.exists() \
            else SAM2Config()
        model = SAM2ImageModel(cfg, rngs=nnx.Rngs(0))
        sd = None
        if path.is_dir():
            if any(path.glob("*.safetensors")):
                sd = load_sharded_safetensors(path)
        elif path.suffix == ".safetensors":
            sd = load_safetensors(path)
        elif path.suffix in (".pt", ".pth", ".ckpt"):
            # the published sam2.1_hiera_*.pt checkpoints (mask/mask.py:65)
            from apex_studio_tpu.loaders.safetensors_io import load_torch_checkpoint

            sd = load_torch_checkpoint(path)
        if sd:
            mapped = convert_keys("sam2", sd)
            apply_state_dict(model, mapped, strict=False)
        return cls(model, img_size=cfg.img_size)

    def _predict_fn(self, n_points: int):
        import jax
        from flax import nnx

        if self._jit is None:
            self._jit = {}
        fn = self._jit.get(n_points)
        if fn is None:
            graphdef, _ = nnx.split(self.model)

            @jax.jit
            def fn(state, img, pts, labels):
                m = nnx.merge(graphdef, state)
                return m.predict(img, pts, labels)

            self._jit[n_points] = fn
        return fn

    def predict(
        self,
        image: np.ndarray,                      # HWC uint8 RGB
        points: Sequence[Dict[str, float]],
        point_labels: Optional[Sequence[int]] = None,
        box: Optional[Dict[str, float]] = None,
    ) -> np.ndarray:
        """→ binary mask HxW uint8 (best of the multimask outputs by IoU)."""
        import cv2
        import jax.numpy as jnp
        from flax import nnx

        h, w = image.shape[:2]
        side = self.img_size
        resized = cv2.resize(image, (side, side), interpolation=cv2.INTER_LINEAR)
        img = jnp.asarray(resized.astype(np.float32) / 255.0)[None]

        pts, labels = [], []
        for i, p in enumerate(points or []):
            pts.append([p["x"] / w, p["y"] / h])
            lab = 1 if point_labels is None else int(point_labels[i])
            labels.append(lab)
        if box is not None:
            pts.append([box["x1"] / w, box["y1"] / h])
            labels.append(2)
            pts.append([box["x2"] / w, box["y2"] / h])
            labels.append(3)
        if not pts:
            raise ValueError("SAM2 predict requires points or a box")
        # Pad to a small bucket to bound recompiles.
        bucket = max(4, int(np.ceil(len(pts) / 4) * 4))
        while len(pts) < bucket:
            pts.append([0.0, 0.0])
            labels.append(-1)

        fn = self._predict_fn(bucket)
        _, state = nnx.split(self.model)
        masks, iou, _obj = fn(
            state, img,
            jnp.asarray(np.asarray(pts, np.float32))[None],
            jnp.asarray(np.asarray(labels, np.int32))[None],
        )
        masks = np.asarray(masks)[0]  # [M, side/4, side/4]
        iou = np.asarray(iou)[0]
        best = int(np.argmax(iou[1:]) + 1) if masks.shape[0] > 1 else 0
        logit = masks[best]
        full = cv2.resize(logit, (w, h), interpolation=cv2.INTER_LINEAR)
        return (full > 0).astype(np.uint8)


def get_sam2_predictor() -> Optional[SAM2Predictor]:
    """Process-wide SAM2 predictor, or None when no checkpoint resolves —
    then the mask API uses the classical segmenter and /system/memory's
    ``mask_backend`` says so."""
    global _predictor, _checked
    with _lock:
        if _checked:
            return _predictor
        _checked = True
        path = _resolve_checkpoint()
        if path is None:
            return None
        try:
            _predictor = SAM2Predictor.from_checkpoint(path)
            _status.update(backend="sam2", checkpoint=str(path), error=None)
            logger.info("SAM2 predictor loaded from %s", path)
        except Exception as e:  # noqa: BLE001
            _status["error"] = f"checkpoint load failed: {e}"
            logger.exception(
                "failed to load SAM2 checkpoint %s; the mask API will use "
                "the classical GrabCut segmenter", path)
            _predictor = None
        return _predictor


def reset_sam2_predictor() -> None:
    global _predictor, _checked
    with _lock:
        _predictor = None
        _checked = False
        _status.update(backend="classical", model_type=None,
                       checkpoint=None, error=None)


def sam2_track_video(
    predictor: "SAM2Predictor",
    frames: Sequence[np.ndarray],
    points: Sequence[Dict[str, float]],
    point_labels: Optional[Sequence[int]] = None,
    start_frame: int = 0,
    direction: str = "forward",
    progress_callback=None,
    frame_callback=None,
) -> Dict[int, np.ndarray]:
    """SAM2 memory-bank video tracking (reference mask/mask.py:8
    build_sam2_video_predictor): the prompted frame's memory is the permanent
    CONDITIONING entry; each subsequent frame is decoded promptless after
    memory attention over [conditioning + up to 6 most-recent memories], and
    its own memory rolls into the bank. Falls back to flow tracking for
    image-only checkpoints (models without memory weights)."""
    import cv2
    import jax.numpy as jnp

    from apex_studio_tpu.mask.sam2 import SAM2VideoModel
    from apex_studio_tpu.utils.progress import safe_emit_progress

    model = predictor.model
    if not isinstance(model, SAM2VideoModel):
        from apex_studio_tpu.mask.segment import track_mask

        init = predictor.predict(frames[start_frame], points, point_labels)
        return track_mask(frames, init, start_frame, direction,
                          progress_callback=progress_callback,
                          frame_callback=frame_callback)

    side = predictor.img_size
    h, w = frames[start_frame].shape[:2]

    def prep(frame):
        r = cv2.resize(frame, (side, side), interpolation=cv2.INTER_LINEAR)
        return jnp.asarray(r.astype(np.float32) / 255.0)[None]

    pts = [[p["x"] / w, p["y"] / h] for p in points]
    labels = [1 if point_labels is None else int(point_labels[i])
              for i in range(len(points))]
    while len(pts) < 4:
        pts.append([0.0, 0.0])
        labels.append(-1)

    # conditioning frame: prompted
    mask0, _, mem0 = model.track_step(
        prep(frames[start_frame]), [],
        points01=jnp.asarray(np.asarray(pts, np.float32))[None],
        labels=jnp.asarray(np.asarray(labels, np.int32))[None])

    def to_full(logit):
        m = cv2.resize(np.asarray(logit)[0], (w, h), cv2.INTER_LINEAR)
        return (m > 0).astype(np.uint8)

    results = {start_frame: to_full(mask0)}

    def run(indices):
        recent = []  # rolling (memory, insertion order); conditioning kept
        for step, idx in enumerate(indices):
            memories = [(mem0, 0)] + [
                (m, min(age + 1, SAM2VideoModel.NUM_MASKMEM - 1))
                for age, m in enumerate(reversed(recent))]
            mask, _, mem = model.track_step(prep(frames[idx]), memories)
            results[idx] = to_full(mask)
            if frame_callback is not None:
                frame_callback(idx, results[idx])
            recent.append(mem)
            if len(recent) > SAM2VideoModel.NUM_MASKMEM - 1:
                recent.pop(0)
            safe_emit_progress(progress_callback,
                               (step + 1) / max(1, len(indices)),
                               f"tracked frame {idx}")

    n = len(frames)
    if direction in ("forward", "both"):
        run(range(start_frame + 1, n))
    if direction in ("backward", "both"):
        run(range(start_frame - 1, -1, -1))
    return results
