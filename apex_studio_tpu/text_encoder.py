"""Generic text encoder wrapper (counterpart of src/text_encoder/text_encoder.py:23).

Instantiates any registered LM family from a manifest component spec, owns the
tokenizer (HuggingFace `tokenizers` fast files — no torch/transformers in the
encode path), applies chat templates where the family expects them, and runs
one jitted forward to produce conditioning embeddings.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("apex.text_encoder")

# Minimal chat templates per family (the reference calls HF apply_chat_template;
# these reproduce the exact strings for the encode-only path).
_QWEN3_CHAT = "<|im_start|>user\n{prompt}<|im_end|>\n<|im_start|>assistant\n"


class TextEncoder:
    def __init__(self, engine, spec: Dict[str, Any]):
        self.engine = engine
        self.spec = spec
        self.base = spec.get("base") or ""
        self.model = None
        self._tokenizer = None

    # -- lazy pieces -----------------------------------------------------------

    def _ensure_model(self):
        if self.model is None:
            from apex_studio_tpu.models.registry import text_encoder_registry

            self.model = self.engine._instantiate_family(
                text_encoder_registry, self.spec, self._converter_family()
            )
        return self.model

    def release(self) -> None:
        """Free the encoder weights (engine.release_text_encoders). The spec
        and tokenizer survive, so the next uncached encode rebuilds lazily."""
        self.model = None

    def _converter_family(self) -> str:
        if "Qwen3" in self.base:
            return "qwen3"
        if "T5" in self.base:
            return "t5"
        if "CLIP" in self.base:
            return "clip"
        if "Llama" in self.base or "Llava" in self.base or "Mistral" in self.base:
            return "llama"
        return self.base.lower()

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            self._tokenizer = self._load_tokenizer()
        return self._tokenizer

    def _load_tokenizer(self):
        if self.spec.get("tokenizer") is not None:  # injected (tests)
            return self.spec["tokenizer"]
        from tokenizers import Tokenizer

        name = self.spec.get("tokenizer_name") or ""
        sub = (self.spec.get("tokenizer_kwargs") or {}).get("subfolder", "")
        candidates = []
        for root in (name and Path(name),):
            if not root:
                continue
            rel = root / sub if sub else root
            local = self.engine._resolve_path(str(rel / "tokenizer.json"))
            if local:
                candidates.append(local)
        if not candidates:
            raise FileNotFoundError(
                f"tokenizer.json not found for {name!r} (subfolder {sub!r}) under "
                f"{self.engine.components_root}"
            )
        return Tokenizer.from_file(str(candidates[0]))

    # -- encode ------------------------------------------------------------------

    def apply_chat_template(self, prompt: str) -> str:
        if "Qwen3" in self.base:
            return _QWEN3_CHAT.format(prompt=prompt)
        return prompt

    def tokenize(
        self,
        prompts: Sequence[str],
        max_length: int,
        pad_to_max: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        tok = self.tokenizer
        ids_batch: List[List[int]] = []
        for p in prompts:
            enc = tok.encode(p, add_special_tokens=False)
            ids = list(enc.ids)[:max_length]
            ids_batch.append(ids)
        width = max_length if pad_to_max else max(len(i) for i in ids_batch)
        pad_id = 0
        ids_arr = np.full((len(prompts), width), pad_id, np.int32)
        mask = np.zeros((len(prompts), width), np.int32)
        for i, ids in enumerate(ids_batch):
            ids_arr[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
        return ids_arr, mask

    def encode(
        self,
        prompts: Sequence[str],
        max_sequence_length: int = 512,
        use_chat_template: bool = True,
        output: str = "pre_norm",  # "pre_norm" == HF hidden_states[-2]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (hidden_states [B, L, D], mask [B, L]). Results are disk-cached
        per canonicalized inputs (reference mixins/cache_mixin.py:99)."""
        from apex_studio_tpu.utils.disk_cache import EmbeddingCache

        cache = EmbeddingCache(self._converter_family() or "te")
        cache_key = {
            "prompts": list(prompts),
            "max_len": max_sequence_length,
            "chat": use_chat_template,
            "output": output,
            "base": self.base,
            "weights": str((self.spec.get("model_path") or ""))[:256],
            # distinguish configs sharing a base but different dims (and
            # weightless test models, which would otherwise collide)
            "config": self.spec.get("config") or self.spec.get("config_path") or "",
        }
        cached = cache.load(cache_key)
        if cached is not None:
            hidden_np, mask_np = cached
            return jnp.asarray(hidden_np), jnp.asarray(mask_np)

        model = self._ensure_model()
        texts = [self.apply_chat_template(p) if use_chat_template else p for p in prompts]
        ids, mask = self.tokenize(texts, max_sequence_length)

        import jax
        from flax import nnx

        key = ("te_fwd", self.base, ids.shape, output)
        fwd = self.engine._jit_cache.get(key)
        if fwd is None:
            import inspect

            graphdef, state = nnx.split(model)
            params = inspect.signature(type(model).__call__).parameters
            takes_norm_flag = "normalize_last" in params
            want_all = output == "hidden_states_all"
            if want_all and "output_hidden_states" not in params:
                raise ValueError(
                    f"{self.base} does not expose all hidden states "
                    "(hidden_states_all output)")

            @jax.jit
            def fwd(state, ids, mask):
                m = nnx.merge(graphdef, state)
                if want_all:
                    return m(ids, attention_mask=mask, output_hidden_states=True)
                if takes_norm_flag:
                    return m(ids, attention_mask=mask, normalize_last=(output == "normed"))
                return m(ids, attention_mask=mask)

            self.engine._jit_cache[key] = fwd
        _, state = nnx.split(model)
        hidden = fwd(state, jnp.asarray(ids), jnp.asarray(mask))
        import numpy as np

        cache.store(cache_key, np.asarray(hidden, np.float32), mask)
        return hidden, jnp.asarray(mask)
