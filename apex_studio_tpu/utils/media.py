"""Output encoding: frames → PNG / MP4 (counterpart of utils/ffmpeg.py +
save_audio_video.py in the reference; OpenCV replaces the ffmpeg binary)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Sequence

import numpy as np

logger = logging.getLogger("apex.media")


def save_image(frame: np.ndarray, path: Path) -> Path:
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(frame).save(path)
    return path


def save_video(frames: Sequence[np.ndarray], path: Path, fps: float = 16.0) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import cv2

        h, w = frames[0].shape[:2]
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        writer = cv2.VideoWriter(str(path), fourcc, fps, (w, h))
        if not writer.isOpened():
            raise RuntimeError("cv2 VideoWriter failed to open")
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        return path
    except Exception:
        logger.exception("cv2 mp4 encode failed; falling back to imageio")
        import imageio

        imageio.mimsave(str(path), list(frames), fps=fps)
        return path
