from apex_studio_tpu.engine.registry import UniversalEngine, engine_registry, register_engine  # noqa: F401
from apex_studio_tpu.engine.base import BaseEngine  # noqa: F401
