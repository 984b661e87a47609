"""The universal registry primitive.

Everything pluggable in the framework — attention backends, transformer
families, VAE families, schedulers, engines, preprocessors — hangs off a
:class:`Registry`. This plays the role of ``FunctionRegister``/``ClassRegister``
in the reference (apps/api/src/register/__init__.py:8,146) but is a single
generic implementation with availability gating and a settable default.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, Optional


@dataclass
class _Entry:
    obj: Any
    available: bool = True
    meta: Dict[str, Any] = field(default_factory=dict)


class Registry:
    """Name → object registry with decorator registration.

    >>> attention = Registry("attention")
    >>> @attention.register("xla", default=True)
    ... def xla_attention(q, k, v, **kw): ...
    >>> attention.get()          # default backend
    >>> attention.get("xla")     # by name
    >>> attention.names()        # only available entries
    """

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, _Entry] = {}
        self._default: Optional[str] = None
        self._lock = threading.Lock()

    # -- registration ------------------------------------------------------

    def register(
        self,
        name: Optional[str] = None,
        *,
        default: bool = False,
        available: bool = True,
        aliases: Iterable[str] = (),
        **meta: Any,
    ) -> Callable[[Any], Any]:
        def deco(obj: Any) -> Any:
            key = name or getattr(obj, "__name__", None)
            if not key:
                raise ValueError(f"{self.kind}: cannot infer a registry name for {obj!r}")
            with self._lock:
                self._entries[key] = _Entry(obj, available=available, meta=dict(meta))
                for alias in aliases:
                    self._entries[alias] = self._entries[key]
                if default or self._default is None:
                    if default or available:
                        self._default = key
            return obj

        return deco

    def add(self, name: str, obj: Any, **kw: Any) -> Any:
        return self.register(name, **kw)(obj)

    # -- lookup -------------------------------------------------------------

    def get(self, name: Optional[str] = None) -> Any:
        key = name or self._default
        if key is None:
            raise KeyError(f"{self.kind}: registry is empty")
        entry = self._entries.get(key)
        if entry is None:
            raise KeyError(
                f"{self.kind}: no entry named {key!r}; known: {sorted(self._entries)}"
            )
        return entry.obj

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __getitem__(self, name: str) -> Any:
        return self.get(name)

    def meta(self, name: str) -> Dict[str, Any]:
        return self._entries[name].meta

    def names(self, *, include_unavailable: bool = False) -> list[str]:
        seen: dict[int, str] = {}
        out = []
        for k, e in self._entries.items():
            if not e.available and not include_unavailable:
                continue
            if id(e) in seen:  # alias of an already-listed entry
                continue
            seen[id(e)] = k
            out.append(k)
        return out

    # -- availability / default ---------------------------------------------

    def is_available(self, name: str) -> bool:
        e = self._entries.get(name)
        return bool(e and e.available)

    def set_available(self, name: str, available: bool) -> None:
        with self._lock:
            if name in self._entries:
                self._entries[name].available = available
                if not available and self._default == name:
                    live = [k for k in self.names() if k != name]
                    self._default = live[0] if live else None

    @property
    def default(self) -> Optional[str]:
        return self._default

    def set_default(self, name: str) -> None:
        if name not in self._entries:
            raise KeyError(f"{self.kind}: cannot default to unknown entry {name!r}")
        with self._lock:
            self._default = name
