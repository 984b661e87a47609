"""LoRA training for DiT families (counterpart of apps/train/zimage/train.py:386).

The reference wraps the torch transformer in PEFT adapters; the TPU-native
formulation keeps the base state frozen and differentiates a small LoRA pytree
``{param_path: (A [r,in], B [out,r])}``. Inside the jitted train step the
effective weights are ``W + (alpha/r)·(B@A)ᵀ`` — XLA fuses the rank-r update
into the surrounding graph, gradients flow only into (A, B), and the optimizer
state is LoRA-sized. Mesh-ready: base state can be TP-sharded; LoRA factors
are tiny and replicated.

Checkpoints save in the diffusers-peft layout (``transformer.<path>.lora_A/
lora_B.weight``) so they load straight back through lora/manager.py and into
the reference's ecosystem.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

LoraParams = Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]  # path -> (A, B)

DEFAULT_TARGETS = r"(to_q|to_k|to_v|to_out|w1|w2|w3|fc1|fc2|add_q_proj|add_k_proj|add_v_proj|to_add_out)\.kernel$"


def _flat_state(model: nnx.Module):
    return [
        (".".join(str(p) for p in kp), leaf)
        for kp, leaf in nnx.to_flat_state(nnx.state(model))
    ]


def init_lora(
    model: nnx.Module,
    rank: int = 16,
    targets: str = DEFAULT_TARGETS,
    seed: int = 0,
    dtype=jnp.float32,
) -> LoraParams:
    """Create zero-initialized-B LoRA factors for every matching 2D kernel."""
    pat = re.compile(targets)
    rng = np.random.default_rng(seed)
    lora: LoraParams = {}
    for path, leaf in _flat_state(model):
        value = leaf.value if hasattr(leaf, "value") else leaf
        if pat.search(path) and value.ndim == 2:
            din, dout = value.shape  # ours is [in, out]
            a = jnp.asarray(rng.normal(0, 1.0 / rank, (rank, din)), dtype)
            b = jnp.zeros((dout, rank), dtype)
            lora[path] = (a, b)
    if not lora:
        raise ValueError(f"no parameters matched LoRA target pattern {targets!r}")
    return lora


def apply_lora_to_state(state, lora: LoraParams, scale: float = 1.0, alpha: Optional[float] = None):
    """Return a state pytree with W + (alpha/r)·(B@A)ᵀ folded in (jit-safe)."""
    flat = nnx.to_flat_state(state)
    out = []
    for kp, leaf in flat:
        path = ".".join(str(p) for p in kp)
        if path in lora:
            a, b = lora[path]
            r = a.shape[0]
            eff = scale * ((alpha / r) if alpha is not None else 1.0)
            value = leaf.value if hasattr(leaf, "value") else leaf
            delta = (b @ a).T.astype(value.dtype) * eff
            if hasattr(leaf, "replace"):
                leaf = leaf.replace(value + delta)
            else:
                leaf = value + delta
            out.append((kp, leaf))
        else:
            out.append((kp, leaf))
    return nnx.from_flat_state(out)


def make_train_step(
    graphdef,
    base_state,
    forward: Callable[[Any, Dict[str, jnp.ndarray]], jnp.ndarray],
    optimizer,
    scale: float = 1.0,
    remat: bool = False,
):
    """Build a jitted flow-matching LoRA train step.

    ``forward(model, batch) -> v_pred`` runs the merged model on the batch;
    the loss is MSE against the rectified-flow target (noise − x0) at the
    batch's sigmas. ``remat=True`` rematerializes the forward on the backward
    pass (jax.checkpoint), trading FLOPs for activation memory — the TPU
    answer to the reference's gradient checkpointing (train.py:221).
    """

    def _fwd(merged_state, batch):
        model = nnx.merge(graphdef, merged_state)
        return forward(model, batch)

    if remat:
        _fwd = jax.checkpoint(
            _fwd, policy=jax.checkpoint_policies.nothing_saveable
        )

    def loss_fn(lora: LoraParams, batch):
        merged = apply_lora_to_state(base_state, lora, scale=scale)
        sigma = batch["sigma"]
        while sigma.ndim < batch["x0"].ndim:
            sigma = sigma[..., None]
        xt = (1.0 - sigma) * batch["x0"] + sigma * batch["noise"]
        v_pred = _fwd(merged, {**batch, "xt": xt})
        target = batch["noise"] - batch["x0"]
        return jnp.mean((v_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    @jax.jit
    def train_step(lora: LoraParams, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(lora, batch)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        import optax

        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return train_step


def save_lora_safetensors(lora: LoraParams, path, prefix: str = "transformer") -> None:
    """Write the diffusers-peft layout (lora_A/lora_B) that lora/manager.py and
    the reference's PEFT stack both load."""
    tensors: Dict[str, np.ndarray] = {}
    for p, (a, b) in lora.items():
        torch_path = _lora_path_to_torch(p)
        tensors[f"{prefix}.{torch_path}.lora_A.weight"] = np.asarray(a, np.float32)
        tensors[f"{prefix}.{torch_path}.lora_B.weight"] = np.asarray(b, np.float32)
    write_safetensors_file(path, tensors)


def _st_dtype_name(arr: np.ndarray) -> str:
    import ml_dtypes

    return {
        np.dtype(np.float32): "F32",
        np.dtype(np.float16): "F16",
        np.dtype(ml_dtypes.bfloat16): "BF16",
    }[arr.dtype]


def write_safetensors_file(path, tensors: Dict[str, np.ndarray]) -> None:
    import json
    import struct

    header = {}
    blobs: List[bytes] = []
    offset = 0
    for name, arr in tensors.items():
        raw = np.ascontiguousarray(arr).tobytes()
        header[name] = {
            "dtype": _st_dtype_name(arr),
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        blobs.append(raw)
        offset += len(raw)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


def _lora_path_to_torch(path: str) -> str:
    """Ours (…to_q.kernel) → torch module path (…to_q)."""
    p = path[: -len(".kernel")] if path.endswith(".kernel") else path
    # SwiGLU leaf names back to HF mlp names where applicable.
    return p
