"""LoRA resolution and weight merging.

Counterpart of the reference's ``src/lora/manager.py:63`` (LoraManager):
resolve manifest/user LoRA sources to local safetensors, normalize the format,
and apply. TPU-first difference (SURVEY.md §7 step 6): adapters are **merged
into the base weights at load time** (W ← W + scale·ΔW) instead of kept as
runtime hooks — the jitted denoise graph stays identical, zero per-step cost,
and unmerge is exact by subtracting the same delta.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
from flax import nnx

from apex_studio_tpu.loaders.converters import converter_registry
from apex_studio_tpu.lora.convert import LoraPair, lora_pairs_from_state_dict

logger = logging.getLogger("apex.lora")


def _merge8(q, s, d):
    import jax.numpy as jnp

    w = q.astype(jnp.float32) * s + d
    absmax = jnp.max(jnp.abs(w), axis=0)
    new_s = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q8 = jnp.clip(jnp.rint(w / new_s), -127, 127).astype(jnp.int8)
    return q8, new_s.astype(jnp.float32)


def _merge4(q, s, d):
    import jax.numpy as jnp

    half = q.shape[1]
    lo = (q & 0xF).astype(jnp.int8) - 8
    hi = (q >> 4).astype(jnp.int8) - 8
    w = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32) * s + d
    absmax = jnp.max(jnp.abs(w), axis=0)
    new_s = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    q4 = (jnp.clip(jnp.rint(w / new_s), -8, 7) + 8).astype(jnp.uint8)
    packed = q4[:, :half] | (q4[:, half:] << 4)
    return packed, new_s.astype(jnp.float32)


def _lazy_jit(fn):
    holder = {}

    def call(*args):
        import jax

        if "jit" not in holder:
            holder["jit"] = jax.jit(fn)
        return holder["jit"](*args)

    return call


_merge8_jit = _lazy_jit(_merge8)
_merge4_jit = _lazy_jit(_merge4)


@dataclass
class LoraSpec:
    source: str
    scale: float = 1.0
    name: Optional[str] = None

    @classmethod
    def from_manifest_entry(cls, entry: Union[str, Dict[str, Any]]) -> "LoraSpec":
        if isinstance(entry, str):
            return cls(source=entry)
        return cls(
            source=entry.get("source") or entry.get("path") or entry.get("url") or "",
            scale=float(entry.get("scale", 1.0)),
            name=entry.get("name"),
        )


class LoraManager:
    def __init__(self, lora_root: Optional[Path] = None):
        from apex_studio_tpu.utils.defaults import get_lora_path

        self.lora_root = Path(lora_root) if lora_root else get_lora_path()

    # -- resolution (reference manager.py:156) ---------------------------------------

    def resolve(self, source: str) -> Path:
        """Source forms: absolute/relative local path, path under the lora dir,
        'hf:org/repo/file.safetensors' (must already be downloaded offline),
        https URL or civitai AIR (resolved through the downloads subsystem)."""
        p = Path(source)
        if p.is_file():
            return p
        local = self.lora_root / source
        if local.is_file():
            return local
        if source.startswith("hf:"):
            cand = self.lora_root / source[3:]
            if cand.is_file():
                return cand
            from apex_studio_tpu.utils.defaults import get_components_path

            cand = get_components_path() / source[3:]
            if cand.is_file():
                return cand
        if source.startswith(("http://", "https://", "urn:air:")):
            from apex_studio_tpu.downloads.api import download_lora

            return Path(download_lora(source, self.lora_root))
        raise FileNotFoundError(f"LoRA source not found locally: {source}")

    # -- application ---------------------------------------------------------------

    @staticmethod
    def _target_param(model: nnx.Module, converted_path: str):
        from apex_studio_tpu.loaders.state_mapping import _walk

        *parents, leaf = converted_path.split(".")
        try:
            obj = _walk(model, parents)
            return getattr(obj, leaf)
        except (AttributeError, IndexError, KeyError, TypeError):
            return None

    @staticmethod
    def _target_module(model: nnx.Module, kernel_path: str):
        """Owning module of a ``...kernel`` path (for residency-aware merge)."""
        from apex_studio_tpu.loaders.state_mapping import _walk

        parts = kernel_path.split(".")[:-1]
        try:
            return _walk(model, parts)
        except (AttributeError, IndexError, KeyError, TypeError):
            return None

    @staticmethod
    def _merge_into_quantized(mod, delta: np.ndarray, sign: float) -> bool:
        """Merge a LoRA delta into an int8/int4-resident kernel entirely ON
        DEVICE: dequantize, add, requantize (per-channel scales refresh) in
        one jitted dispatch per kernel shape — no multi-GB host round trip.
        Exact unmerge is NOT preserved across the requant — the reference's
        CUDA path has the same property for its quantized tiers
        (scaled_layer.py) and re-loads instead.

        delta arrives torch-ordered [out, in]."""
        import jax
        import jax.numpy as jnp

        bits = getattr(mod, "kernel_bits", 8)
        q = mod.kernel.value
        logical_shape = ((q.shape[0], q.shape[1] * 2) if bits == 4
                         else tuple(q.shape))
        if logical_shape != delta.T.shape:
            return False

        d = jnp.asarray(np.asarray(delta.T, np.float32) * sign)
        fn = _merge4_jit if bits == 4 else _merge8_jit
        new_q, new_s = fn(q, mod.kernel_scale.value.astype(jnp.float32), d)
        mod.kernel.value = new_q
        mod.kernel_scale.value = new_s
        return True

    def pairs_for_model(
        self, sd: Dict[str, np.ndarray], converter_family: Optional[str]
    ) -> List[Tuple[str, LoraPair]]:
        """Normalize and key-convert adapter pairs to our parameter paths."""
        pairs = lora_pairs_from_state_dict(sd)
        conv = (
            converter_registry.get(converter_family)
            if converter_family and converter_family in converter_registry
            else None
        )
        out: List[Tuple[str, LoraPair]] = []
        for pair in pairs:
            torch_key = pair.module_path + ".weight"
            converted = conv.convert_key(torch_key) if conv else torch_key
            if converted is None:
                continue
            if converted.endswith(".weight"):
                converted = converted[: -len(".weight")] + ".kernel"
            out.append((converted, pair))
        return out

    def apply_to_model(
        self,
        model: nnx.Module,
        sd: Dict[str, np.ndarray],
        scale: float = 1.0,
        converter_family: Optional[str] = None,
        sign: float = 1.0,
    ) -> Tuple[int, List[str]]:
        """Merge (or with sign=-1, unmerge) adapters. Returns (applied, skipped)."""
        import jax.numpy as jnp

        applied = 0
        skipped: List[str] = []
        for path, pair in self.pairs_for_model(sd, converter_family):
            param = self._target_param(model, path)
            if param is None:
                skipped.append(path)
                continue
            delta = pair.delta(scale)  # torch [out, in]
            if path.endswith(".kernel"):
                mod = self._target_module(model, path)
                if mod is not None and getattr(mod, "kernel_scale", None) is not None:
                    if self._merge_into_quantized(mod, delta, sign):
                        applied += 1
                    else:
                        skipped.append(f"{path} (quantized target shape mismatch)")
                    continue
            kernel = param.value
            if kernel.shape == delta.T.shape:
                new = kernel + sign * jnp.asarray(delta.T, kernel.dtype)
            elif kernel.shape == delta.shape:
                new = kernel + sign * jnp.asarray(delta, kernel.dtype)
            else:
                skipped.append(f"{path} (shape {delta.shape} vs {kernel.shape})")
                continue
            param.value = new
            applied += 1
        if skipped:
            logger.warning("LoRA: %d adapters had no target (first: %s)", len(skipped), skipped[:3])
        return applied, skipped

    def load_into(
        self,
        model: nnx.Module,
        spec: Union[LoraSpec, str, Dict[str, Any]],
        converter_family: Optional[str] = None,
    ) -> int:
        if not isinstance(spec, LoraSpec):
            spec = LoraSpec.from_manifest_entry(spec)
        from apex_studio_tpu.loaders.safetensors_io import load_safetensors

        path = self.resolve(spec.source)
        sd = load_safetensors(path)
        applied, _ = self.apply_to_model(
            model, sd, scale=spec.scale, converter_family=converter_family
        )
        logger.info("LoRA %s: merged %d adapters at scale %.3f", path.name, applied, spec.scale)
        return applied
