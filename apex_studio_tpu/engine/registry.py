"""Engine registry + UniversalEngine facade.

Counterpart of ``src/engine/registry.py:40,171`` in the reference. The
reference auto-discovers ``engine/<family>/<model_type>.py``; here families
register explicitly (slightly less magic, same manifest-driven dispatch: the
server resolves (spec.engine, spec.model_type) → engine class).
"""

from __future__ import annotations

import importlib
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Type, Union

from apex_studio_tpu.manifest.loader import load_manifest

_ENGINE_MODULES = (
    "apex_studio_tpu.engine.zimage",
    "apex_studio_tpu.engine.flux",
    "apex_studio_tpu.engine.flux2",
    "apex_studio_tpu.engine.qwenimage",
    "apex_studio_tpu.engine.wan",
    "apex_studio_tpu.engine.hunyuanvideo15",
    "apex_studio_tpu.engine.hunyuanvideo",
    "apex_studio_tpu.engine.hunyuanvideo_avatar",
    "apex_studio_tpu.engine.ltx",
    "apex_studio_tpu.engine.chroma",
    "apex_studio_tpu.engine.skyreels",
    "apex_studio_tpu.engine.cogvideox",
    "apex_studio_tpu.engine.mochi",
    "apex_studio_tpu.engine.lucy",
    "apex_studio_tpu.engine.magi",
    "apex_studio_tpu.engine.ltx2",
    "apex_studio_tpu.engine.kandinsky5",
    "apex_studio_tpu.engine.cosmos2",
    "apex_studio_tpu.engine.hunyuanimage3",
    "apex_studio_tpu.engine.hidream",
    "apex_studio_tpu.engine.seedvr",
    "apex_studio_tpu.engine.flashvsr",
    "apex_studio_tpu.engine.stepvideo",
    "apex_studio_tpu.engine.hunyuanimage",
    "apex_studio_tpu.engine.ovis",
    "apex_studio_tpu.engine.fibo",
    "apex_studio_tpu.engine.longcat",
)

engine_registry: Dict[Tuple[str, str], Type] = {}


def register_engine(engine: str, *model_types: str):
    def deco(cls):
        for mt in model_types:
            engine_registry[(engine, mt)] = cls
        cls.engine_name = engine
        return cls

    return deco


def _ensure_families_loaded() -> None:
    for mod in _ENGINE_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass


def resolve_engine_class(engine: str, model_type: str) -> Type:
    _ensure_families_loaded()
    cls = engine_registry.get((engine, model_type))
    if cls is None:
        known = sorted(f"{e}/{m}" for e, m in engine_registry)
        raise KeyError(f"no engine for {engine}/{model_type}; known: {known}")
    return cls


class UniversalEngine:
    """Facade: manifest path → concrete engine instance (reference registry.py:171)."""

    def __new__(
        cls,
        yaml_path: Union[str, Path],
        model_type: Optional[str] = None,
        **kwargs: Any,
    ):
        config = load_manifest(yaml_path)
        engine = config.get("engine")
        mt = model_type or config.get("type")
        if isinstance(mt, list):
            mt = mt[0]
        engine_cls = resolve_engine_class(engine, mt)
        return engine_cls(config, yaml_path=Path(yaml_path), model_type=mt, **kwargs)
