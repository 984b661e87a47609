"""LLM prompt expansion (counterpart of src/prompt_extension/prompt_extend.py:40).

Expands terse user prompts into detailed cinematic descriptions using the same
Qwen-class chat LM that ZImage already ships for conditioning. Generation is a
fixed-buffer autoregressive loop: the forward is jitted once at the padded
length and sampled token-by-token (KV-cached decode is a planned optimization;
expansion budgets are ~200 tokens so the padded recompute is acceptable).
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

        fwd = self._forward(buf_len)
        _, state = nnx.split(self.model)
        rng = np.random.default_rng(seed)
        pos = len(ids)
        new_tokens: list[int] = []
        for step in range(max_new_tokens):
            logits = np.asarray(
                fwd(state, jnp.asarray(buf), jnp.asarray(mask))[0, pos - 1], np.float32
            )
            if temperature <= 0:
                token = int(np.argmax(logits))
            else:
                logits = logits / temperature
                probs = np.exp(logits - logits.max())
                probs /= probs.sum()
                order = np.argsort(probs)[::-1]
                csum = np.cumsum(probs[order])
                cutoff = int(np.searchsorted(csum, top_p)) + 1
                keep = order[:cutoff]
                p = probs[keep] / probs[keep].sum()
                token = int(rng.choice(keep, p=p))
            if self.eos_token_id is not None and token == self.eos_token_id:
                break
            new_tokens.append(token)
            buf[0, pos] = token
            mask[0, pos] = 1
            pos += 1
            safe_emit_progress(
                progress_callback, (step + 1) / max_new_tokens, "extending prompt"
            )

        out = self.tokenizer.decode(new_tokens)
        # Strip any trailing chat-control artifacts.
        for stop in ("<|im_end|>", "<|endoftext|>"):
            if stop in out:
                out = out.split(stop)[0]
        return out.strip() or prompt
