"""LLM prompt expansion (counterpart of src/prompt_extension/prompt_extend.py:40).

Expands terse user prompts into detailed cinematic descriptions using the same
Qwen-class chat LM that ZImage already ships for conditioning. Generation is
KV-cached: one jitted prefill over the prompt fills fixed-size per-layer
caches, then each new token is ONE single-token jitted decode step
(models/text_encoders/qwen3.py prefill/decode_step) — O(1) forwards per token
instead of re-running the padded full sequence. Models without decode support
fall back to the padded-recompute loop.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Optional

import numpy as np

logger = logging.getLogger("apex.prompt_extension")

SYSTEM_PROMPT = (
    "You rewrite short user prompts for a text-to-video generator. Expand the "
    "prompt into one vivid, concrete paragraph: name the subject and action, "
    "the setting, lighting, camera framing and movement, and overall style. "
    "Keep every detail the user asked for, add no text overlays, and answer "
    "with the rewritten prompt only."
)


class PromptExtender:
    def __init__(self, model, tokenizer, eos_token_id: Optional[int] = None):
        self.model = model
        self.tokenizer = tokenizer
        self.eos_token_id = eos_token_id
        self._fwd = None

    def _chat(self, prompt: str) -> str:
        return (
            f"<|im_start|>system\n{SYSTEM_PROMPT}<|im_end|>\n"
            f"<|im_start|>user\n{prompt}<|im_end|>\n<|im_start|>assistant\n"
        )

    def _forward(self, buf_len: int):
        import jax
        from flax import nnx

        if self._fwd is None:
            graphdef, _ = nnx.split(self.model)

            @jax.jit
            def fwd(state, ids, mask):
                m = nnx.merge(graphdef, state)
                hidden = m(ids, attention_mask=mask, normalize_last=True)
                # Tied-embedding logits.
                return hidden @ m.embed_tokens.value.T.astype(hidden.dtype)

            self._fwd = fwd
        return self._fwd

    def generate(
        self,
        prompt: str,
        max_new_tokens: int = 192,
        temperature: float = 0.7,
        top_p: float = 0.9,
        seed: int = 0,
        progress_callback: Optional[Callable] = None,
        use_cache: bool = True,
    ) -> str:
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.utils.progress import safe_emit_progress

        text = self._chat(prompt)
        enc = self.tokenizer.encode(text, add_special_tokens=False)
        ids = list(enc.ids)
        buf_len = len(ids) + max_new_tokens
        buf = np.zeros((1, buf_len), np.int32)
        buf[0, : len(ids)] = ids
        mask = np.zeros((1, buf_len), np.int32)
        mask[0, : len(ids)] = 1

        rng = np.random.default_rng(seed)
        pos = len(ids)
        new_tokens: list[int] = []

        def sample(logits: np.ndarray) -> int:
            if temperature <= 0:
                return int(np.argmax(logits))
            logits = logits / temperature
            probs = np.exp(logits - logits.max())
            probs /= probs.sum()
            order = np.argsort(probs)[::-1]
            csum = np.cumsum(probs[order])
            cutoff = int(np.searchsorted(csum, top_p)) + 1
            keep = order[:cutoff]
            p = probs[keep] / probs[keep].sum()
            return int(rng.choice(keep, p=p))

        _, state = nnx.split(self.model)
        if use_cache and hasattr(self.model, "decode_step"):
            import jax

            graphdef, _ = nnx.split(self.model)

            @jax.jit
            def prefill(state, ids_arr, mask_arr):
                m = nnx.merge(graphdef, state)
                hidden, caches = m.prefill(ids_arr, mask_arr, cache_len=buf_len)
                return hidden @ m.embed_tokens.value.T.astype(hidden.dtype), caches

            @jax.jit
            def decode(state, token, pos, caches):
                m = nnx.merge(graphdef, state)
                hidden, caches = m.decode_step(token, pos, caches)
                return hidden @ m.embed_tokens.value.T.astype(hidden.dtype), caches

            logits_all, caches = prefill(
                state, jnp.asarray(buf[:, : len(ids)]),
                jnp.asarray(mask[:, : len(ids)]))
            logits = np.asarray(logits_all[0, pos - 1], np.float32)
            for step in range(max_new_tokens):
                token = sample(logits)
                if self.eos_token_id is not None and token == self.eos_token_id:
                    break
                new_tokens.append(token)
                logits_t, caches = decode(
                    state, jnp.asarray([[token]], jnp.int32),
                    jnp.int32(pos), caches)
                logits = np.asarray(logits_t[0, 0], np.float32)
                pos += 1
                safe_emit_progress(
                    progress_callback, (step + 1) / max_new_tokens,
                    "extending prompt")
        else:  # padded-recompute fallback for LMs without decode_step
            fwd = self._forward(buf_len)
            for step in range(max_new_tokens):
                logits = np.asarray(
                    fwd(state, jnp.asarray(buf), jnp.asarray(mask))[0, pos - 1],
                    np.float32)
                token = sample(logits)
                if self.eos_token_id is not None and token == self.eos_token_id:
                    break
                new_tokens.append(token)
                buf[0, pos] = token
                mask[0, pos] = 1
                pos += 1
                safe_emit_progress(
                    progress_callback, (step + 1) / max_new_tokens,
                    "extending prompt")

        out = self.tokenizer.decode(new_tokens)
        # Strip any trailing chat-control artifacts.
        for stop in ("<|im_end|>", "<|endoftext|>"):
            if stop in out:
                out = out.split(stop)[0]
        return out.strip() or prompt
