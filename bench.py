"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Round-1 flagship benchmark: ZImage-Turbo-class DiT (6B params: dim 3840,
30 layers + 2+2 refiners, heads 30) denoising a 1024x1024 image — 9 Euler
steps, cfg off (the manifest's turbo defaults), bf16, single chip, random
weights (perf only; fidelity is covered by unit tests).

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the ratio is against a FLOP-derived reference-GPU estimate: one denoise step
of this config is ~68 TFLOP (2·6.1e9 params·4.3k tokens + attention); a
4090-class card at ~80%% bf16 MFU (~165 TFLOP/s) gives ~0.41 s/step → ~3.7
s/image for 9 steps. >1.0 means faster than that estimate.

Env knobs: APEX_BENCH_PRESET=tiny|mid|full (default full on TPU, tiny on CPU).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SEC_PER_IMAGE = 3.7
STEPS = 9


def build(preset: str):
    import jax.numpy as jnp
    from flax import nnx

    from apex_studio_tpu.models.transformers.zimage import ZImageConfig, ZImageTransformer2DModel

    if preset == "tiny":
        cfg = ZImageConfig(dim=192, n_layers=2, n_refiner_layers=1, n_heads=4,
                           n_kv_heads=4, in_channels=16, cap_feat_dim=64,
                           axes_dims=(16, 16, 16), axes_lens=(64, 64, 64))
        h = w = 32
    elif preset == "mid":
        cfg = ZImageConfig(dim=1536, n_layers=12, n_refiner_layers=2, n_heads=12,
                           n_kv_heads=12, in_channels=16, cap_feat_dim=2560,
                           axes_dims=(32, 48, 48), axes_lens=(1024, 512, 512))
        h = w = 128
    else:  # full: the real Z-Image Turbo architecture
        cfg = ZImageConfig()  # dim 3840, 30 layers, heads 30, cap 2560
        h = w = 128  # 1024px / vae 8
    model = ZImageTransformer2DModel(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                                     rngs=nnx.Rngs(0))
    return model, h, w


def main() -> None:
    import jax
    import jax.numpy as jnp
    from flax import nnx

    platform = jax.default_backend()
    preset = os.environ.get(
        "APEX_BENCH_PRESET", "full" if platform == "tpu" else "tiny"
    )
    model, h, w = build(preset)
    cfg = model.cfg
    import functools

    graphdef, state = nnx.split(model)

    # Mirrors the engine's fused denoise step: forward + Euler update in one
    # dispatch, latents donated.
    @functools.partial(jax.jit, donate_argnums=(1,))
    def fused_step(state, latents, t, dt, cap, mask):
        m = nnx.merge(graphdef, state)
        v = m(latents.astype(m.dtype), t, cap, mask)
        return latents + dt * v.astype(latents.dtype)

    b, lc = 1, 96  # caption bucket (3 x 32) — typical chat-templated prompt
    rng = np.random.default_rng(0)
    base_latents = jnp.asarray(
        rng.normal(size=(b, cfg.in_channels, 1, h, w)), jnp.float32
    )
    cap = jnp.asarray(rng.normal(size=(b, lc, cfg.cap_feat_dim)), jnp.bfloat16)
    mask = jnp.ones((b, lc), bool)

    def readback(x):
        # On the axon relay block_until_ready() can return before execution
        # finishes; a device→host fetch of a dependent value is the only
        # reliable completion barrier. Fetch a tiny slice.
        return np.asarray(x[0, 0, 0, :8])

    def denoise_chain(x, n_steps):
        for i in range(n_steps):
            t_vec = jnp.full((b,), 1.0 - i / STEPS, jnp.float32)
            x = fused_step(state, x, t_vec, -0.1, cap, mask)
        return x

    # Warmup / compile (fetch to make sure execution really happened).
    readback(denoise_chain(base_latents + 0.0, 1))  # fresh buffer: the chain donates its input

    def timed(n_steps, reps):
        vals = []
        for _ in range(reps):
            start = time.perf_counter()
            readback(denoise_chain(base_latents + 0.0, n_steps))
            vals.append(time.perf_counter() - start)
        return float(np.median(vals))

    # Subtract the relay/readback overhead by differencing two chain lengths:
    # time(2*STEPS) − time(STEPS) = STEPS compiled steps, overhead-free.
    t_long = timed(2 * STEPS, 3)
    t_short = timed(STEPS, 3)
    sec_per_image = max(t_long - t_short, 1e-9)

    result = {
        "metric": f"zimage_turbo_{preset}_1024px_sec_per_image_denoise_{STEPS}steps"
        if preset == "full"
        else f"zimage_{preset}_sec_per_image_denoise_{STEPS}steps",
        "value": round(sec_per_image, 4),
        "unit": "s/image",
        "vs_baseline": round(BASELINE_SEC_PER_IMAGE / sec_per_image, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
