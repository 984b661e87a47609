"""Filesystem roots and device defaults.

Counterpart of the reference's ``src/utils/defaults.py:6-45`` — every path is
overridable by environment variable and, failing that, by the persisted JSON
config (see :mod:`apex_studio_tpu.utils.config_store`).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional

_ENV_PREFIX = "APEX_"


def _env_path(name: str, default: Path) -> Path:
    raw = os.environ.get(_ENV_PREFIX + name)
    return Path(raw).expanduser() if raw else default


def home_dir() -> Path:
    """Root directory for everything the engine persists."""
    # Persisted config may relocate the home dir; env var wins.
    env = os.environ.get("APEX_HOME_DIR")
    if env:
        return Path(env).expanduser()
    try:
        from apex_studio_tpu.utils.config_store import get_config_value

        cfg = get_config_value("home_dir")
        if cfg:
            return Path(cfg).expanduser()
    except Exception:
        pass
    return Path.home() / ".apex"


APEX_HOME_DIR = home_dir()


def _sub(name: str, env: str) -> Path:
    p = _env_path(env, home_dir() / name)
    return p


def get_components_path() -> Path:
    return _sub("components", "COMPONENTS_PATH")


def get_lora_path() -> Path:
    return _sub("loras", "LORA_PATH")


def get_cache_path() -> Path:
    return _sub("cache", "CACHE_PATH")


def get_offload_path() -> Path:
    return _sub("offload", "OFFLOAD_PATH")


def get_results_path() -> Path:
    return _sub("results", "RESULTS_PATH")


def get_config_file_path() -> Path:
    return _env_path("CONFIG_PATH", home_dir() / "config.json")


def get_preprocessor_models_path() -> Path:
    return _sub("preprocessor_models", "PREPROCESSOR_MODELS_PATH")


def get_manifest_search_paths(extra: Optional[List[Path]] = None) -> List[Path]:
    """Directories scanned for apex/v1 manifest YAMLs, in priority order."""
    paths: List[Path] = []
    env = os.environ.get("APEX_MANIFEST_PATHS")
    if env:
        paths.extend(Path(p).expanduser() for p in env.split(os.pathsep) if p)
    # Manifests bundled with the framework.
    paths.append(Path(__file__).resolve().parent.parent.parent / "manifests")
    # User-installed manifests.
    paths.append(home_dir() / "manifests")
    if extra:
        paths.extend(extra)
    return [p for p in paths if p.is_dir()]


def ensure_dirs() -> None:
    for p in (
        home_dir(),
        get_components_path(),
        get_lora_path(),
        get_cache_path(),
        get_offload_path(),
        get_results_path(),
    ):
        p.mkdir(parents=True, exist_ok=True)


DEFAULT_HOST = os.environ.get("APEX_HOST", "127.0.0.1")
DEFAULT_PORT = int(os.environ.get("APEX_PORT", "8765"))
