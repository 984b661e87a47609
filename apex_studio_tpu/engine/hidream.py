"""HiDream-I1 engines (t2i, edit).

Counterpart of the reference's ``src/engine/hidream/`` (t2i.py, edit.py,
shared.py): four text encoders — pooled CLIP-L + CLIP-G concatenated into the
time conditioning, T5 sequence tokens, and Llama-3.1 hidden states taken from
``llama_layers`` (one per transformer block, realized here through the llama
encoder's ``stack_layers`` multi-layer output, split back per layer) — into
the MoE MMDiT; flow-match Euler sampling with CFG.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.base import BaseEngine
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger("apex.engine.hidream")


@register_engine("hidream", "t2i", "edit")
class HiDreamT2IEngine(BaseEngine):
    def __init__(self, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        self.text_encoders: dict = {}

    def load_components(self, return_latents: bool) -> None:
        from apex_studio_tpu.text_encoder import TextEncoder

        te_specs = [s for s in self.component_specs.values()
                    if s.get("type") == "text_encoder"]

        def pick(pred, label):
            s = next((s for s in te_specs if pred(s.get("base") or "",
                                                  s.get("name") or "")), None)
            if s is None:
                raise KeyError(f"hidream manifest needs a {label} text_encoder")
            return s

        if not self.text_encoders:
            self.text_encoders = {
                "clip_l": TextEncoder(self, pick(
                    lambda b, n: "CLIP" in b and "2" not in n, "CLIP-L")),
                "clip_g": TextEncoder(self, pick(
                    lambda b, n: "CLIP" in b and "2" in n, "CLIP-G")),
                "t5": TextEncoder(self, pick(lambda b, n: "T5" in b, "T5")),
                "llama": TextEncoder(self, pick(
                    lambda b, n: "Llama" in b or "llama" in b, "Llama")),
            }
        if self.transformer is None:
            self.load_component_by_type("transformer")
        if self.vae is None:
            self.load_component_by_type("vae")
        if self.scheduler is None:
            self.load_component_by_type("scheduler")

    def _clip_pooled(self, te, prompt: str):
        ids, mask = te.tokenize([prompt], 77)
        model = te._ensure_model()
        graphdef, state = nnx.split(model)
        key = ("hidream_clip", te.base, ids.shape)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, ids, mask):
                return nnx.merge(graphdef, state)(ids, attention_mask=mask)

            self._jit_cache[key] = fwd
        _, pooled = fwd(state, jnp.asarray(ids), jnp.asarray(mask))
        return pooled

    def encode_prompt(self, prompt: str, max_sequence_length: int = 128):
        pooled = jnp.concatenate(
            [self._clip_pooled(self.text_encoders["clip_l"], prompt),
             self._clip_pooled(self.text_encoders["clip_g"], prompt)], axis=-1)
        t5_seq, _ = self.text_encoders["t5"].encode(
            [prompt], max_sequence_length=max_sequence_length,
            use_chat_template=False)
        llama = self.text_encoders["llama"]
        stacked, _ = llama.encode([prompt],
                                  max_sequence_length=max_sequence_length)
        n_layers = len(self.transformer.cfg.llama_layers)
        d = self.transformer.cfg.caption_dim
        # stack_layers concatenates the selected layers along features —
        # split back into the per-block list the transformer expects
        if stacked.shape[-1] == n_layers * d:
            llama_list = [stacked[..., i * d:(i + 1) * d]
                          for i in range(n_layers)]
        else:  # encoder returned a single layer: share it across blocks
            llama_list = [jnp.asarray(stacked)] * n_layers
        return jnp.asarray(t5_seq), llama_list, jnp.asarray(pooled)

    def run(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        image: Optional[Any] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: Optional[int] = None,
        timesteps: Optional[List[float]] = None,
        image_strength: float = 0.75,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        offload: bool = True,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting HiDream pipeline")
        self.load_components(return_latents)
        t5, llama, pooled = self.encode_prompt(prompt or "")
        nt5, nllama, npooled = self.encode_prompt(negative_prompt or "")
        safe_emit_progress(progress_callback, 0.2, "Prompts encoded")

        s_scale = 2 ** (len(getattr(self.vae.cfg, "block_out_channels",
                                    (0,) * 4)) - 1)
        lat_h, lat_w = height // s_scale, width // s_scale
        cfg_t = self.transformer.cfg
        x = self.get_latents((1, cfg_t.in_channels, lat_h, lat_w), seed=seed)
        self.scheduler.set_timesteps(
            num_inference_steps, image_seq_len=(lat_h // cfg_t.patch_size)
            * (lat_w // cfg_t.patch_size))
        ts = np.asarray(self.scheduler.timesteps, np.float64)

        if image is not None:  # edit: start from the noised input image
            import cv2

            arr = self.load_image_input(image)
            arr = cv2.resize(arr, (width, height), interpolation=cv2.INTER_AREA)
            px = (jnp.asarray(arr, jnp.float32).transpose(2, 0, 1)[None]
                  / 127.5 - 1.0)
            graphdef_v, vstate = nnx.split(self.vae)

            @jax.jit
            def enc(s, v):
                return nnx.merge(graphdef_v, s).encode(v)

            z0 = enc(vstate, px)
            start = int(len(ts) * (1.0 - image_strength))
            ts = ts[start:]
            sigma0 = float(ts[0]) / 1000.0
            x = sigma0 * x + (1.0 - sigma0) * z0.astype(jnp.float32)
            self.scheduler.timesteps = ts.astype(np.float32)
            self.scheduler.sigmas = np.concatenate([ts / 1000.0, [0.0]])

        graphdef, tf_state = nnx.split(self.transformer)
        do_cfg = guidance_scale > 1.0
        key = ("hidream_step", tuple(x.shape), int(t5.shape[1]),
               int(llama[0].shape[1]), do_cfg)
        fwd = self._jit_cache.get(key)
        if fwd is None:

            @jax.jit
            def fwd(state, x, t, t5_, ll, pl, nt5_, nll, npl):
                m = nnx.merge(graphdef, state)
                pos = m(x, t, t5_, ll, pl)
                if not do_cfg:
                    return pos
                neg = m(x, t, nt5_, nll, npl)
                return neg + guidance_scale * (pos - neg)

            self._jit_cache[key] = fwd
        dt = self.transformer.dtype
        cb = make_mapped_progress(progress_callback, 0.25, 0.9)
        for i, t in enumerate(ts):
            t_b = jnp.full((1,), float(t), jnp.float32)
            v = fwd(tf_state, x.astype(dt), t_b, t5, llama, pooled,
                    nt5, nllama, npooled)
            out = self.scheduler.step(v.astype(jnp.float32), float(t), x)
            x = out[0] if isinstance(out, tuple) else out
            safe_emit_progress(cb, (i + 1) / len(ts), f"step {i + 1}/{len(ts)}")

        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        graphdef_v, vstate = nnx.split(self.vae)
        key = ("hidream_decode", tuple(x.shape))
        dec = self._jit_cache.get(key)
        if dec is None:

            @jax.jit
            def dec(s, z):
                return nnx.merge(graphdef_v, s).decode(z)

            self._jit_cache[key] = dec
        img_out = dec(vstate, x.astype(jnp.float32))
        frames = self.tensor_to_frames(img_out)
        safe_emit_progress(progress_callback, 1.0, "Completed pipeline")
        return frames
