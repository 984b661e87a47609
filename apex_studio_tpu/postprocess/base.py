"""Postprocessor framework (counterpart of src/postprocess/base.py:14)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from apex_studio_tpu.registry import Registry
from apex_studio_tpu.utils.progress import ProgressCallback

postprocessor_registry = Registry("postprocessor")


class BasePostprocessor:
    name: str = ""

    def setup(self) -> None:
        pass

    def __call__(
        self,
        frames: Sequence[np.ndarray],
        progress_callback: Optional[ProgressCallback] = None,
        **params: Any,
    ) -> List[np.ndarray]:
        raise NotImplementedError


def run_postprocessor(
    name: str,
    frames: Sequence[np.ndarray],
    params: Optional[Dict[str, Any]] = None,
    progress_callback: Optional[ProgressCallback] = None,
) -> List[np.ndarray]:
    cls = postprocessor_registry.get(name)
    proc = cls() if isinstance(cls, type) else cls
    proc.setup()
    return proc(frames, progress_callback=progress_callback, **(params or {}))
