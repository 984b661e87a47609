"""Checkpoint resolution for model-backed preprocessors.

Counterpart of the reference's ``custom_hf_download`` (src/preprocess/util.py)
used by every learned detector: look for the checkpoint in the preprocessor
models dir, otherwise fetch it from its published HF repo into that dir, then
load it as a flat numpy state dict (.safetensors native, .pth via torch-cpu).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger("apex.preprocess.weights")

_EXTS = (".safetensors", ".pth", ".pt", ".bin")


def _load_any(path: Path) -> Dict[str, np.ndarray]:
    if path.suffix == ".safetensors":
        from apex_studio_tpu.loaders.safetensors_io import load_safetensors

        return dict(load_safetensors(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # unwrap trainer containers: metric3d uses model_state_dict, leres'
    # res101.pth nests under depth_model, generic trainers use state_dict
    for container in ("state_dict", "model_state_dict", "depth_model"):
        if isinstance(sd, dict) and container in sd and isinstance(
                sd[container], dict):
            sd = sd[container]
    return {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in sd.items()
        if hasattr(v, "numpy") or isinstance(v, (np.ndarray, list, tuple, float, int))
    }


def find_local(stem: str, root: Optional[Path] = None) -> Optional[Path]:
    from apex_studio_tpu.utils.defaults import get_preprocessor_models_path

    root = root or get_preprocessor_models_path()
    for ext in _EXTS:
        p = root / f"{stem}{ext}"
        if p.exists():
            return p
    return None


def load_preprocessor_weights(
    stem: str,
    hf_repo: Optional[str] = None,
    hf_filename: Optional[str] = None,
    root: Optional[Path] = None,
) -> Dict[str, np.ndarray]:
    """Resolve + load weights for a detector. Raises FileNotFoundError with
    a fetch hint when the checkpoint is absent and can't be downloaded."""
    from apex_studio_tpu.utils.defaults import get_preprocessor_models_path

    root = root or get_preprocessor_models_path()
    local = find_local(stem, root)
    if local is None and hf_repo:
        from apex_studio_tpu.downloads.api import download_file, hf_url

        fname = hf_filename or f"{stem}.safetensors"
        dest = root / fname
        try:
            download_file(hf_url(f"{hf_repo}/{fname}"), dest)
            local = dest
        except Exception as e:
            logger.warning("preprocessor weight download failed: %s", e)
    if local is None:
        raise FileNotFoundError(
            f"no checkpoint '{stem}.*' under {root}"
            + (f" and download from {hf_repo} failed" if hf_repo else
               "; place the published checkpoint there")
        )
    return _load_any(local)


def resolve_preprocessor_file(
    filename: str,
    hf_repo: Optional[str] = None,
    root: Optional[Path] = None,
) -> Path:
    """Resolve an arbitrary preprocessor asset file (e.g. .onnx) by exact
    name, downloading it from its published repo when absent."""
    from apex_studio_tpu.utils.defaults import get_preprocessor_models_path

    root = root or get_preprocessor_models_path()
    local = root / filename
    if local.exists():
        return local
    if hf_repo:
        from apex_studio_tpu.downloads.api import download_file, hf_url

        try:
            root.mkdir(parents=True, exist_ok=True)
            download_file(hf_url(f"{hf_repo}/{filename}"), local)
            return local
        except Exception as e:
            logger.warning("preprocessor asset download failed: %s", e)
    raise FileNotFoundError(
        f"asset '{filename}' not under {root}"
        + (f" and download from {hf_repo} failed" if hf_repo else ""))
