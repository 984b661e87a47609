"""BaseEngine — manifest-driven pipeline base.

Counterpart of the reference's ``src/engine/base_engine.py:220`` rebuilt for
TPU/JAX. Responsibilities:

- parse the normalized manifest config, resolve component weight/config paths
  against the local components directory
- lazily instantiate components: scheduler (registry), transformer / vae /
  text_encoder (NNX families + safetensors + per-family key converter),
  sharded onto the active mesh at load time
- the seed→latent contract, timestep handling (incl. the reference's
  timesteps-as-indices mode, base_engine.py:2074), vae encode/decode, preview
  rendering and progress emission

Where the reference juggles VRAM (warm offload, group offloading, budget
planner), this engine relies on sharding + donation: components stay resident,
"offload" is a no-op hook kept for API compatibility unless host offload is
explicitly enabled.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from apex_studio_tpu.utils.progress import ProgressCallback, safe_emit_progress

logger = logging.getLogger("apex.engine")

_DTYPES = {
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "fp16": jnp.bfloat16,  # TPU: bf16 is the 16-bit type; fp16 manifests map here
    "float16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
}


def select_variant(model_path: Union[str, List[Dict[str, Any]], None],
                   preferred: Optional[str] = None) -> Optional[Dict[str, Any]]:
    """Pick a weight variant from a manifest model_path entry."""
    if model_path is None:
        return None
    if isinstance(model_path, str):
        return {"path": model_path, "variant": "default", "type": "safetensors"}
    if preferred:
        for v in model_path:
            if v.get("variant") == preferred or v.get("precision") == preferred:
                return dict(v)
    # Prefer plain safetensors (bf16-capable) over quantized formats.
    for v in model_path:
        if v.get("type", "safetensors") == "safetensors" and v.get("precision") not in ("fp8",):
            return dict(v)
    return dict(model_path[0])


class BaseEngine:
    def __init__(
        self,
        config: Dict[str, Any],
        yaml_path: Optional[Path] = None,
        model_type: Optional[str] = None,
        *,
        components_root: Optional[Path] = None,
        selected_components: Optional[Dict[str, Any]] = None,
        mesh=None,
        **kwargs: Any,
    ):
        from apex_studio_tpu.parallel.mesh import get_mesh
        from apex_studio_tpu.utils.defaults import get_components_path

        self.config = config
        self.yaml_path = yaml_path
        self.model_type = model_type or config.get("type")
        self.components_root = Path(components_root or get_components_path())
        self.selected_components = selected_components or {}
        self.mesh = mesh if mesh is not None else get_mesh()
        self.defaults: Dict[str, Any] = dict(config.get("defaults") or {})

        self.component_specs: Dict[str, Dict[str, Any]] = {}
        for comp in config.get("components", []) or []:
            self.component_specs[comp.get("name") or comp["type"]] = comp

        # Attention backend: request override > manifest priority list > platform
        # default (reference intersects manifest attention_types with the
        # verified set, base_engine.py:372 / api/manifest.py:646).
        requested = (self.selected_components.get("attention") or {}).get("name")
        manifest_priority = config.get("attention_types")
        if requested or manifest_priority:
            from apex_studio_tpu.ops.attention import set_default_backend
            from apex_studio_tpu.ops.attention.verify import select_backend

            try:
                choice = requested or select_backend(manifest_priority)
                set_default_backend(choice)
            except KeyError:
                logger.warning("unknown attention backend %r; keeping default", requested)

        # Lazily-populated components.
        self.scheduler = None
        self.transformer = None
        self.vae = None
        self.text_encoder = None
        self.helpers: Dict[str, Any] = {}
        self._jit_cache: Dict[Any, Any] = {}

    # -- path resolution -----------------------------------------------------------

    def _resolve_path(self, ref: Optional[str]) -> Optional[Path]:
        """Manifest path (HF-repo-relative) → local file/dir under components/."""
        if not ref:
            return None
        p = Path(ref)
        if p.is_absolute() and p.exists():
            return p
        local = self.components_root / ref
        if local.exists():
            return local
        if p.exists():
            return p.resolve()
        return None

    def _spec_for_type(self, ctype: str) -> Optional[Dict[str, Any]]:
        for spec in self.component_specs.values():
            if spec.get("type") == ctype:
                return spec
        return None

    def _load_component_config(self, spec: Dict[str, Any]) -> Dict[str, Any]:
        # Manifest extra_kwargs overlay the checkpoint config (reference
        # schema_v1 components[].extra_kwargs).
        extra = spec.get("extra_kwargs") if isinstance(spec.get("extra_kwargs"), dict) else {}
        if isinstance(spec.get("config"), dict):  # inline config (tests, custom models)
            return {**spec["config"], **extra}
        cfg_path = self._resolve_path(spec.get("config_path"))
        if cfg_path is None and spec.get("config_path"):
            raise FileNotFoundError(
                f"component config not found locally: {spec['config_path']} "
                f"(searched under {self.components_root})"
            )
        if cfg_path is None:
            return dict(extra)
        if cfg_path.is_dir():
            cfg_path = cfg_path / "config.json"
        return {**json.loads(cfg_path.read_text()), **extra}

    def _component_dtype(self, spec: Dict[str, Any]) -> Any:
        sel = self.selected_components.get(spec.get("type"), {})
        prec = sel.get("precision") or spec.get("precision") or "bf16"
        return _DTYPES.get(str(prec).lower(), jnp.bfloat16)

    def _load_state_dict(self, spec: Dict[str, Any]) -> Optional[Dict[str, np.ndarray]]:
        from apex_studio_tpu.loaders.safetensors_io import (
            dequantize_fp8_scaled,
            load_safetensors,
            load_sharded_safetensors,
        )

        sel = self.selected_components.get(spec.get("type"), {})
        variant = select_variant(spec.get("model_path"), sel.get("variant"))
        if variant is None:
            return None
        local = self._resolve_path(variant["path"])
        if local is None:
            raise FileNotFoundError(
                f"weights not downloaded: {variant['path']} "
                f"(searched under {self.components_root})"
            )
        if variant.get("type") == "gguf" or str(local).endswith(".gguf"):
            from apex_studio_tpu.quantize.gguf import load_gguf_state_dict

            return load_gguf_state_dict(local)
        sd = self._read_weights_file(local)
        # Merge extra_model_path components targeting this component type
        # (reference schema_v1 extra_model_paths; e.g. FlashVSR's separate
        # LQ_proj_in.ckpt merged into the transformer state dict).
        for extra in self.config.get("components", []) or []:
            if extra.get("type") != "extra_model_path":
                continue
            if (extra.get("component") or "transformer") != spec.get("type"):
                continue
            ev = select_variant(extra.get("model_path"), None)
            if ev is None:
                continue
            epath = self._resolve_path(ev["path"])
            if epath is None:
                raise FileNotFoundError(f"extra weights not downloaded: {ev['path']}")
            prefix = extra.get("key_prefix") or ""
            for k, v in self._read_weights_file(Path(epath)).items():
                sd[prefix + k] = v
        return dequantize_fp8_scaled(sd)

    def _read_weights_file(self, local: Path) -> Dict[str, np.ndarray]:
        from apex_studio_tpu.loaders.safetensors_io import (
            load_safetensors,
            load_sharded_safetensors,
            load_torch_checkpoint,
        )

        local = Path(local)
        if local.is_dir():
            return load_sharded_safetensors(local)
        if local.suffix in (".pth", ".ckpt", ".pt", ".pkl"):
            return load_torch_checkpoint(local)
        return load_safetensors(local)

    # -- component loading ------------------------------------------------------------

    def release_text_encoders(self, names=None) -> None:
        """Drop text-encoder weights from HBM after conditioning is encoded
        (the single-chip counterpart of the reference's CPU offload between
        pipeline stages, src/mixins/offload_mixin.py): a 5-7B encoder and a
        12-20B DiT do not fit one v5e together, but they never run
        concurrently. Repeat prompts rebuild nothing — TextEncoder.encode is
        disk-cached — and a new prompt rebuilds the encoder lazily.

        ``names`` limits the release to specific attributes (e.g. flux drops
        only the T5-XXL and keeps the 0.1GB CLIP resident)."""
        import gc

        for attr in names or ("text_encoder", "text_encoder_2", "text_encoder_3"):
            te = getattr(self, attr, None)
            if te is not None and hasattr(te, "release"):
                te.release()
        # drop jitted encode fns: they close over the encoder graphdef
        for key in [k for k in self._jit_cache
                    if isinstance(k, tuple) and k
                    and str(k[0]) in ("te_fwd", "t5_fwd", "mllm_fwd", "qwen_fwd")]:
            del self._jit_cache[key]
        gc.collect()

    def maybe_release_text_encoders(self, names=None) -> None:
        """release_text_encoders, but only where it buys HBM: on a single
        chip (or when forced via APEX_RELEASE_TEXT_ENCODERS=1). A multi-chip
        mesh shards the DiT, so encoders can stay resident for fast prompt
        turnaround."""
        forced = os.environ.get("APEX_RELEASE_TEXT_ENCODERS")
        if forced == "0":
            return
        if forced == "1" or self.mesh is None or self.mesh.devices.size <= 1:
            self.release_text_encoders(names)

    def load_component_by_type(self, ctype: str, progress: Optional[ProgressCallback] = None):
        spec = self._spec_for_type(ctype)
        if spec is None:
            raise KeyError(f"manifest has no {ctype} component")
        loader = getattr(self, f"_load_{ctype}", None)
        if loader is None:
            raise KeyError(f"no loader for component type {ctype}")
        safe_emit_progress(progress, 0.0, f"Loading {ctype}")
        from apex_studio_tpu.utils.profiling import step_trace

        with step_trace(f"load:{ctype}"):
            component = loader(spec)
        setattr(self, ctype, component)
        safe_emit_progress(progress, 1.0, f"{ctype} ready")
        return component

    def _load_scheduler(self, spec: Dict[str, Any]):
        from apex_studio_tpu.schedulers.base import create_scheduler

        sel = self.selected_components.get("scheduler", {})
        opts = spec.get("scheduler_options") or []
        base = spec.get("base")
        cfg_path = spec.get("config_path")
        chosen = sel.get("name") or spec.get("default")
        for opt in opts:
            if opt.get("name") == chosen or (chosen is None and opt is opts[0]):
                base = opt.get("base", base)
                cfg_path = opt.get("config_path", cfg_path)
                break
        if base is None and opts:
            base = opts[0].get("base")
            cfg_path = opts[0].get("config_path", cfg_path)
        cfg: Dict[str, Any] = {}
        if isinstance(spec.get("config"), dict):
            cfg = dict(spec["config"])
        else:
            local = self._resolve_path(cfg_path)
            if local is not None:
                cfg = json.loads(local.read_text())
        kwargs = spec.get("extra_kwargs") or {}
        return create_scheduler(base or "FlowMatchEulerDiscreteScheduler", cfg or None, **kwargs)

    def _instantiate_family(self, registry, spec: Dict[str, Any], converter_family: str):
        """Shared loader for transformer / vae / text_encoder families."""
        from flax import nnx

        from apex_studio_tpu.loaders.converters import converter_registry, convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.registry import _load_builtin_families

        _load_builtin_families()
        base = spec.get("base")
        cls = registry.get(base)
        synth = os.environ.get("APEX_SYNTHETIC_WEIGHTS", "")
        try:
            cfg_dict = self._load_component_config(spec)
        except FileNotFoundError:
            if not synth:
                raise
            cfg_dict = None  # synthetic mode: family defaults stand in
        cfg = cls.config_class.from_dict(cfg_dict) if cfg_dict else cls.config_class()
        dtype = self._component_dtype(spec)

        if synth:
            # Benchmark/dry-run mode: never touch checkpoints; build the model
            # abstractly (zero host allocation) and materialize random weights
            # directly ON DEVICE — big Linear kernels straight to int8/int4
            # residency so full-size DiTs fit a single chip exactly like the
            # quantized serving tier would (quantize/residency.py).
            from apex_studio_tpu.quantize.residency import (
                materialize_random_int4,
                materialize_random_int8,
            )

            from apex_studio_tpu.models.registry import transformer_registry

            model = nnx.eval_shape(
                lambda: cls(cfg, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(0)))
            seed = abs(hash((base, converter_family))) % (1 << 31)
            # int4 is the DiT tier; encoders/VAEs stay int8 (they stage out
            # via release_text_encoders and gain nothing from 4-bit, while
            # the packed-unpack graph costs compile time)
            if synth == "int4" and registry is transformer_registry:
                n = materialize_random_int4(model, seed=seed)
            elif synth in ("int8", "int4", "1", "true"):
                n = materialize_random_int8(model, seed=seed)
            else:  # "bf16": random weights, no residency
                n = materialize_random_int8(model, seed=seed, min_numel=1 << 62)
            logger.info("synthetic %s weights for %s (%d resident kernels)",
                        synth, base, n)
            if self.mesh is not None and self.mesh.size > 1:
                rules = getattr(cls, "sharding_rules", None)
                rules = rules(cfg) if callable(rules) else None
                if rules is not None:
                    from apex_studio_tpu.parallel.sharding import shard_pytree

                    nnx.update(model, shard_pytree(nnx.state(model), self.mesh, rules))
            return model

        model = cls(cfg, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(0))

        sd = self._load_state_dict(spec)
        rules = getattr(cls, "sharding_rules", None)
        rules = rules(cfg) if callable(rules) else None
        if sd is not None:
            family = converter_family if converter_family in converter_registry else None
            mapped = convert_keys(family, sd) if family else sd
            apply_state_dict(model, mapped, mesh=self.mesh, rules=rules, strict=True)
        elif self.mesh is not None and self.mesh.size > 1 and rules is not None:
            # No checkpoint (randomly-initialized component): still lay the
            # params out over the mesh so serving runs genuinely TP-sharded.
            from apex_studio_tpu.parallel.sharding import shard_pytree

            state = nnx.state(model)
            nnx.update(model, shard_pytree(state, self.mesh, rules))
        return model

    def _load_transformer(self, spec: Dict[str, Any]):
        from apex_studio_tpu.loaders.converters import converter_registry
        from apex_studio_tpu.models.registry import transformer_registry

        base = spec.get("base") or ""
        family = base.split(".")[0]
        # Sub-variants with their own checkpoint layout register a dotted
        # converter (e.g. "wan.flashvsr" → "wan_flashvsr").
        dotted = base.replace(".", "_")
        if dotted != family and dotted in converter_registry:
            family = dotted
        model = self._instantiate_family(transformer_registry, spec, family)
        self._apply_loras(model, family)
        self._apply_memory_fallback(model, spec)
        return model

    def _apply_memory_fallback(self, model, spec: Dict[str, Any]) -> None:
        """Oversized-model fallback for a single chip (reference: group/budget
        offloading, src/memory_management/group_offloading.py:851).

        Modes (env APEX_MEMORY_FALLBACK > manifest spec/defaults key
        ``memory_fallback``): ``off``, ``int8`` (force int8 residency),
        ``auto`` (int8 residency only when params won't fit the chip's free
        HBM and the mesh has nothing to shard over).

        Design decision (r3): int8 residency + mesh sharding ARE the
        oversized-model story on TPU. Host→HBM block streaming
        (parallel/host_offload.py) cannot live inside the jitted denoise
        step — device_put is a host-side op — so wiring it would mean
        de-jitting every engine's hot loop, trading the MXU's fused step for
        PCIe-bound eager execution. It stays available as an eager utility
        (stream_blocks) for offline/CPU paths only; production oversizing
        beyond int8's 2× wants more chips, not streaming.
        """
        import os

        mode = (
            os.environ.get("APEX_MEMORY_FALLBACK")
            or spec.get("memory_fallback")
            or self.config.get("memory_fallback")
            or "auto"
        )
        if mode in ("off", "none", "0"):
            return
        try:
            from apex_studio_tpu.parallel.host_offload import should_stream
            from apex_studio_tpu.quantize.residency import apply_int8_residency

            if mode == "int8":
                n = apply_int8_residency(model)
                logger.info("int8 residency forced: %d kernels quantized", n)
                return
            mesh_devs = self.mesh.devices.size if self.mesh is not None else 1
            if mesh_devs <= 1 and should_stream(model):
                n = apply_int8_residency(model)
                logger.warning(
                    "model exceeds free HBM on a single chip; int8 residency "
                    "applied to %d kernels (set APEX_MEMORY_FALLBACK=off to "
                    "disable)", n,
                )
        except Exception as e:  # fallback must never break a load that'd fit
            logger.warning("memory fallback skipped: %s", e)

    def _apply_loras(self, model, converter_family: str) -> None:
        """Merge manifest + request-selected LoRAs into the transformer
        weights at load time (reference preloads at base_engine.py:357)."""
        entries = list(self.config.get("loras") or [])
        entries += list(self.selected_components.get("loras") or [])
        if not entries:
            return
        from apex_studio_tpu.lora.manager import LoraManager, LoraSpec

        mgr = LoraManager()
        for entry in entries:
            spec = LoraSpec.from_manifest_entry(entry)
            if not spec.source:
                continue
            try:
                mgr.load_into(model, spec, converter_family=converter_family)
            except FileNotFoundError as e:
                logger.warning("skipping LoRA %s: %s", spec.source, e)

    def _load_vae(self, spec: Dict[str, Any]):
        from apex_studio_tpu.models.registry import vae_registry

        from apex_studio_tpu.loaders.converters import converter_registry

        base = spec.get("base") or "auto"
        family = "autoencoder_kl" if base in ("auto", "AutoencoderKL") else base.split(".")[0]
        # VAE checkpoints have their own key layout — prefer "<family>_vae"
        # converters (wan_vae, cogvideo_vae, …) over the DiT converter.
        if f"{family}_vae" in converter_registry:
            family = f"{family}_vae"
        return self._instantiate_family(vae_registry, spec, family)

    def _load_text_encoder(self, spec: Dict[str, Any]):
        from apex_studio_tpu.text_encoder import TextEncoder

        return TextEncoder(self, spec)

    # -- cached conditioning encode ------------------------------------------------

    def encode_video_latents(self, video) -> "jnp.ndarray":
        """Deterministic VAE encode of conditioning pixels with a
        content-addressed disk cache — the reference caches at BaseEngine
        level for every family (base_engine.py:2079), so a repeat i2v/edit
        run skips the encoder entirely.

        ``video``: [B,3,T,H,W] (or [B,3,H,W] images) in [-1,1].
        """
        import dataclasses as _dc
        import hashlib

        import jax
        from flax import nnx

        from apex_studio_tpu.utils.disk_cache import EmbeddingCache

        video = jnp.asarray(video)
        arr = np.asarray(video, np.float32)
        vae_cfg = getattr(self.vae, "cfg", None)
        cfg_dict = _dc.asdict(vae_cfg) if _dc.is_dataclass(vae_cfg) else {}
        cache = EmbeddingCache("vae_encode")
        payload = {
            "fn": "vae_encode",
            # the VAE's full config is part of the key — identical pixels
            # through different VAEs must never collide
            "vae": cfg_dict,
            "shape": list(arr.shape),
            "sha": hashlib.sha256(arr.tobytes()).hexdigest(),
        }
        hit = cache.load(payload)
        if hit is not None:
            cached = np.asarray(hit[0])
            # entries written before the f32 normalization may carry numpy's
            # void view of bf16 ("|V2") — treat those as misses and rewrite
            if cached.dtype.kind in "fiu":
                return jnp.asarray(cached)
        graphdef, vae_state = nnx.split(self.vae)
        key = ("vae_encode", tuple(video.shape))
        enc = self._jit_cache.get(key)
        if enc is None:

            @jax.jit
            def enc(state, v):
                return nnx.merge(graphdef, state).encode(v)

            self._jit_cache[key] = enc
        out = enc(vae_state, video.astype(jnp.float32))
        # store as f32: bf16 round-trips through numpy as void dtype
        cache.store(payload, np.asarray(out, np.float32))
        return out

    # -- light preview decode ------------------------------------------------------

    def _get_preview_vae(self):
        """TAEHV "light VAE" for cheap per-step previews, declared inside the
        vae component config as ``light_vae_path`` (+ optional
        ``light_vae_config``) — the reference's contract
        (manifest/video/hunyuanvideo-1.5-i2v:75, vae/hunyuanvideo15/model.py:821).
        Returns None (→ full-VAE previews) when not declared or not loadable.
        """
        if getattr(self, "_preview_vae_cache", "unset") != "unset":
            return self._preview_vae_cache
        self._preview_vae_cache = None
        spec = self._spec_for_type("vae")
        if spec is None:
            return None
        cfg_dict = dict(spec.get("config") or {}) if isinstance(
            spec.get("config"), dict) else {}
        extra = spec.get("extra_kwargs")
        if isinstance(extra, dict):
            cfg_dict.update(extra)
        path = cfg_dict.get("light_vae_path")
        light_cfg = cfg_dict.get("light_vae_config")
        if not path and light_cfg is None:
            return None
        try:
            from flax import nnx

            from apex_studio_tpu.models.vaes.tae_vae import TAEConfig, TAEVAE

            cfg = TAEConfig.from_dict(light_cfg or {})
            model = TAEVAE(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                           rngs=nnx.Rngs(0))
            if path:
                local = self._resolve_path(path)
                if local is None or not Path(local).exists():
                    if os.environ.get("APEX_SYNTHETIC_WEIGHTS", ""):
                        # bench/dry-run tier: the random-init TAE stands in —
                        # big runs depend on it so the 2.3 GB full VAE can
                        # leave HBM during the denoise.
                        self._preview_vae_cache = model
                        return model
                    logger.info("light VAE weights not present (%s); "
                                "previews use the full VAE", path)
                    return None
                from apex_studio_tpu.loaders.converters import convert_keys
                from apex_studio_tpu.loaders.safetensors_io import (
                    load_safetensors,
                    load_sharded_safetensors,
                )
                from apex_studio_tpu.loaders.state_mapping import apply_state_dict

                local = Path(local)
                sd = (load_sharded_safetensors(local) if local.is_dir()
                      else load_safetensors(local))
                apply_state_dict(model, convert_keys("tae_vae", sd), strict=True)
            self._preview_vae_cache = model
        except Exception:
            logger.exception("light VAE load failed; previews use the full VAE")
            self._preview_vae_cache = None
        return self._preview_vae_cache

    def preview_frames(self, latents, fallback=None):
        """Decode preview frames via the light TAE decoder when the manifest
        declares one — preview cost drops to a few % of a denoise step
        (reference ``use_light_vae``, engine/hunyuanvideo15/shared) — else
        through ``fallback`` (a family ``decode_latents``)."""
        vae = self._get_preview_vae()
        if vae is None:
            if fallback is None:
                raise RuntimeError("no light VAE and no fallback decoder")
            return fallback(latents)
        import jax
        from flax import nnx

        # Cap the preview clip: decoding every frame of a 121f run holds a
        # [T,H,W,64] f32 stage (~7 GB) next to the resident DiT. A leading
        # window is what the editor scrubs anyway.
        max_t = int(os.environ.get("APEX_PREVIEW_MAX_LATENT_T", "9"))
        if latents.ndim == 5 and latents.shape[2] > max_t:
            latents = latents[:, :, :max_t]

        key = ("light_preview_decode", tuple(latents.shape))
        dec = self._jit_cache.get(key)
        if dec is None:
            graphdef, _ = nnx.split(vae)

            @jax.jit
            def dec(state, z):
                return nnx.merge(graphdef, state).decode(z)

            self._jit_cache[key] = dec
        _, state = nnx.split(vae)
        video = dec(state, jnp.asarray(latents, jnp.float32))  # [B,3,T,H,W]
        b, c, t, h, w = video.shape
        frames = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        return self.tensor_to_frames(frames)

    def load_helper(self, name: str):
        """Load a helper component (auxiliary encoder) by its manifest name."""
        if name in self.helpers:
            return self.helpers[name]
        spec = self.component_specs.get(name)
        if spec is None:
            for s in self.component_specs.values():
                if s.get("type") == "helper":
                    spec = s
                    break
        if spec is None:
            raise KeyError(f"manifest has no helper component named {name!r}")
        base = spec.get("base") or ""
        from apex_studio_tpu.models.registry import text_encoder_registry

        if "CLIPVision" in base:
            family = "clip_vision"
        elif "Siglip" in base or "siglip" in base:
            family = "siglip"
        else:
            family = base.split(".")[0].lower()
        model = self._instantiate_family(text_encoder_registry, spec, family)
        self.helpers[name] = model
        return model

    # -- offload hooks (API compatibility; sharding replaces offloading) ---------------

    def _offload(self, *_names: str) -> None:
        return None

    def to_device(self, *_args: Any) -> None:
        return None

    # -- media inputs -----------------------------------------------------------------

    @staticmethod
    def load_image_input(image) -> np.ndarray:
        """Normalize an image input (HWC uint8 array, file path, or nested
        list) to an RGB HWC uint8 array. Wire-protocol jobs pass paths."""
        if isinstance(image, str):
            import cv2

            if image.startswith("data:"):
                # data URI (UI uploads, reference wire protocol): decode the
                # base64 payload after the comma
                import base64

                payload = base64.b64decode(image.split(",", 1)[1])
                arr = cv2.imdecode(np.frombuffer(payload, np.uint8),
                                   cv2.IMREAD_COLOR)
                if arr is None:
                    raise ValueError("cannot decode data-URI image")
                return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
            arr = cv2.imread(image, cv2.IMREAD_COLOR)
            if arr is None:
                raise FileNotFoundError(f"cannot read image: {image}")
            return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        return arr

    # -- seed → latents contract ----------------------------------------------------

    @staticmethod
    def get_latents(shape: Tuple[int, ...], seed: Optional[int] = None,
                    latents: Optional[np.ndarray] = None, dtype=jnp.float32) -> jnp.ndarray:
        """Draw initial noise. Matches the reference's CPU torch.Generator
        stream (base_engine `_get_latents` draws fp32 normal at latent shape);
        torch runs host-side for RNG only — no torch compute on device."""
        if latents is not None:
            return jnp.asarray(latents, dtype)
        import torch

        gen = torch.Generator("cpu")
        if seed is not None:
            gen.manual_seed(int(seed))
        noise = torch.randn(shape, generator=gen, dtype=torch.float32).numpy()
        return jnp.asarray(noise, dtype)

    # -- timesteps ------------------------------------------------------------------

    def get_timesteps(
        self,
        scheduler,
        num_inference_steps: int,
        timesteps: Optional[List[float]] = None,
        sigmas: Optional[List[float]] = None,
        **set_kwargs: Any,
    ) -> Tuple[np.ndarray, int]:
        """Reference base_engine.py:2074 semantics: explicit integer timesteps
        are *indices into the 1000-step training schedule*; floats are values."""
        if timesteps is not None:
            full = getattr(scheduler, "num_train_timesteps", 1000)
            ts = np.asarray(timesteps, np.float64)
            if np.all(np.abs(ts - np.round(ts)) < 1e-9) and ts.max() < full:
                grid = np.linspace(1.0, 1.0 / full, full)
                from apex_studio_tpu.schedulers.base import shift_sigmas

                shift = getattr(scheduler, "shift", 1.0)
                sig = shift_sigmas(grid, shift)[ts.astype(int)]
                scheduler.set_timesteps(len(ts), sigmas=sig, **set_kwargs)
            else:
                scheduler.set_timesteps(len(ts), **set_kwargs)
            return scheduler.timesteps, len(scheduler.timesteps)
        if sigmas is not None:
            scheduler.set_timesteps(len(sigmas), sigmas=np.asarray(sigmas), **set_kwargs)
            return scheduler.timesteps, len(scheduler.timesteps)
        scheduler.set_timesteps(num_inference_steps, **set_kwargs)
        return scheduler.timesteps, num_inference_steps

    # -- postprocessing ----------------------------------------------------------------

    @staticmethod
    def tensor_to_frames(img: jnp.ndarray) -> List[np.ndarray]:
        """[B,3,H,W] in [-1,1] → list of HWC uint8 frames."""
        arr = np.asarray(jnp.clip((img.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0))
        arr = (arr * 255.0 + 0.5).astype(np.uint8)
        return [np.transpose(a, (1, 2, 0)) for a in arr]

    def run(self, **kwargs: Any):  # pragma: no cover - interface
        raise NotImplementedError
