"""Benchmark harness. Prints JSON result lines (the driver parses the LAST
complete line; each tier is flushed the moment it is measured so a timeout
never erases an already-measured number):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Round-3 benchmark = the driver's metrics (BASELINE.json):

1. **Flux Dev 1024px, sec/image** (primary). Real Flux-Dev architecture
   (19 double + 38 single blocks, dim 3072 — 11.8B matmul params), 4096 image
   tokens + 512 T5 tokens, 28 steps, guidance-distilled (no CFG). Weights are
   int8-resident (quantize/residency.py) because 11.8B bf16 = 23.7 GB exceeds
   a 16 GB v5e chip — the same situation where a reference user on a 16 GB
   4090 runs the manifest's GGUF-Q8 variant (BASELINE.md VRAM table), so the
   configurations are comparable. Compute is bf16 on the MXU. The denoise
   step is fully fused: one jitted dispatch per step (forward + Euler update,
   latents donated). Weights are materialized ON DEVICE via jitted
   jax.random (residency.py) — no multi-GB host->device transfer.

2. **HunyuanVideo 1.5 720p I2V, sec/frame** (secondary key in the same JSON
   line). Real HYV15 architecture (54 dual-stream blocks, dim 2048, 8.2B
   matmul params), 1280x720 x 121 frames → 31x45x80 = 111,600 latent tokens,
   int8-resident. Steps are identical, so sec/frame = t_step x 50 steps / 121
   frames with min-of-2 measured steps (a full 50-step run is ~1h of bench
   time).

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the bar is the reference-GPU estimate for its own headline config: an RTX
4090-class card (the manifests' target, compute cap >= 7.5, 16-24 GB) running
Flux Dev bf16/Q8 at the publicly observed ~1.07 s/step for 28 steps at
1024px => 30.0 s/image; per-step FLOPs (74 TF, derivation in _flux_flops)
at 45% MFU of the 4090's 165 TFLOP/s bf16 peak gives the same 1.0 s/step,
so the anchor is consistent. HYV15 720p at the same 45% MFU on 6.2 PF/step
=> 83 s/step => 34.5 s/frame.

Also reported: achieved model TFLOP/s and MFU against the chip's bf16 peak
(v5e = 197 TFLOP/s).

Env knobs:
  APEX_BENCH_PRESET=tiny|full   (default: full on TPU, tiny elsewhere)
  APEX_BENCH_HYV15=0            skip the video benchmark
  APEX_BENCH_FLUX=0             skip the image benchmark (cache seeding /
                                retrying the video leg alone)
  APEX_BENCH_W8A8=0             skip the W8A8 extra leg (int8 MXU compute via
                                APEX_INT8_COMPUTE — models/layers.py _w8a8;
                                runs last, only with >=300s budget left)
  APEX_BENCH_BUDGET_S=N         wall-clock budget (default 1200); stages
                                degrade (fewer reps -> single step -> skip)
                                to emit whatever tier was reached in time
"""

from __future__ import annotations

import gc
import json
import os
import time

import numpy as np

FLUX_STEPS = 28
FLUX_BASELINE_SEC_PER_IMAGE = 30.0
HYV15_STEPS = 50
HYV15_FRAMES = 121
HYV15_BASELINE_SEC_PER_FRAME = 34.5

_T0 = time.time()
_BUDGET_S = float(os.environ.get("APEX_BENCH_BUDGET_S", "1200"))


def _remaining() -> float:
    return _BUDGET_S - (time.time() - _T0)


def _trace(msg: str) -> None:
    """Wall-clock breadcrumbs on stderr (stdout carries only JSON lines)."""
    import sys

    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_PEAK_BF16 = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v6 lite": 918e12,  # v6e (Trillium)
    "TPU v4": 275e12,
}


def _chip_peak_flops() -> tuple[str, float]:
    import jax

    kind = jax.devices()[0].device_kind
    for key, peak in _PEAK_BF16.items():
        if kind.startswith(key):
            return kind, peak
    return kind, 197e12


def _flux_flops(d: int, n_double: int, n_single: int, t_img: int, t_txt: int) -> float:
    """Matmul+attention FLOPs for one Flux forward.

    Per token per block the projections cost 2*(params seen by that token):
    double block = attn(q,k,v,out: 8d^2) + ff(d->4d->d: 16d^2) on each stream;
    single block = qkv(6d^2) + mlp_in(8d^2) + fused out((4d+d)->d: 10d^2).
    Joint attention runs over T = t_img + t_txt in every layer: 4*T^2*d
    (QK^T + PV, fwd only). AdaLN modulation is per-sample, negligible.
    """
    t = t_img + t_txt
    lin = 24 * d * d * t * n_double + 24 * d * d * t * n_single
    attn = 4 * t * t * d * (n_double + n_single)
    return float(lin + attn)


def _hyv15_flops(d: int, n_layers: int, t_img: int, t_txt: int) -> float:
    """Dual-stream block: each stream attn 8d^2 + ff 16d^2 per token; joint
    attention over T = t_img + t_txt: 4*T^2*d per layer."""
    t = t_img + t_txt
    lin = 24 * d * d * t * n_layers
    attn = 4 * t * t * d * n_layers
    return float(lin + attn)


def _readback(x):
    # On the axon relay block_until_ready() can return before execution
    # finishes; a device->host fetch of a dependent value is the only
    # reliable completion barrier.
    return np.asarray(x.ravel()[:8])


def _flux_sigmas(n_steps: int, t_img: int) -> np.ndarray:
    """FlowMatchEuler schedule with Flux's resolution-dependent dynamic shift."""
    base_shift, max_shift = 0.5, 1.15
    base_len, max_len = 256, 4096
    m = (max_shift - base_shift) / (max_len - base_len)
    mu = base_shift + m * (t_img - base_len)
    shift = np.exp(mu)
    s = np.linspace(1.0, 1.0 / n_steps, n_steps)
    s = shift * s / (1.0 + (shift - 1.0) * s)
    return np.concatenate([s, [0.0]]).astype(np.float32)


def bench_flux(tiny: bool) -> dict:
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from apex_studio_tpu.models.transformers.flux import FluxConfig, FluxTransformer2DModel
    from apex_studio_tpu.quantize.residency import materialize_random_int8

    if tiny:
        cfg = FluxConfig(num_layers=2, num_single_layers=2, attention_head_dim=64,
                         num_attention_heads=4, joint_attention_dim=128,
                         pooled_projection_dim=64, axes_dims_rope=(16, 24, 24))
        grid, t_txt, steps = 8, 32, 4
    else:
        cfg = FluxConfig()  # the real Flux Dev architecture
        grid, t_txt, steps = 64, 512, FLUX_STEPS  # 1024px -> 128x128 latents -> 64x64 packed
    t_img = grid * grid

    model = nnx.eval_shape(
        lambda: FluxTransformer2DModel(cfg, dtype=jnp.bfloat16,
                                       param_dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    )
    _trace("flux: materializing weights on device")
    n_q = materialize_random_int8(model, min_numel=1 << 20, seed=0)
    _trace(f"flux: weights ready ({n_q} int8 kernels)")
    graphdef, state = nnx.split(model)

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(6,))
    def fused_step(state, latents, txt, pooled, sig, sig_next, grid_hw):
        m = nnx.merge(graphdef, state)
        b = latents.shape[0]
        g = jnp.full((b,), 3.5, jnp.float32)
        v = m(latents, txt, pooled, jnp.broadcast_to(sig, (b,)), guidance=g, grid_hw=grid_hw)
        return latents + (sig_next - sig) * v.astype(latents.dtype)

    rng = np.random.default_rng(0)
    b = 1
    base = jnp.asarray(rng.normal(size=(b, t_img, cfg.in_channels)), jnp.bfloat16)
    txt = jnp.asarray(rng.normal(size=(b, t_txt, cfg.joint_attention_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.normal(size=(b, cfg.pooled_projection_dim)), jnp.bfloat16)
    sigmas = _flux_sigmas(steps, t_img)
    sig_dev = [(jnp.float32(sigmas[i]), jnp.float32(sigmas[i + 1])) for i in range(steps)]

    def chain(n):
        x = base + 0.0  # fresh buffer: the chain donates its input
        for i in range(n):
            s, sn = sig_dev[i % steps]
            x = fused_step(state, x, txt, pooled, s, sn, (grid, grid))
        return x

    _readback(chain(2))  # compile + execute
    _trace("flux: fused step compiled, measuring")

    # Difference two chain lengths to cancel the fixed relay/readback
    # overhead. Short chains (10 vs 2 steps) keep each rep cheap; extra reps
    # only run while the wall-clock budget allows.
    long_n, short_n = (min(10, steps), 2) if steps > 2 else (steps, 1)

    def timed(n):
        t0 = time.perf_counter()
        _readback(chain(n))
        return time.perf_counter() - t0

    t_long = timed(long_n)
    t_short = timed(short_n)
    per_step = [max(t_long - t_short, 1e-9) / (long_n - short_n)]
    while len(per_step) < 3 and _remaining() > 2.5 * (t_long + t_short):
        t_l, t_s = timed(long_n), timed(short_n)
        per_step.append(max(t_l - t_s, 1e-9) / (long_n - short_n))
    sec_per_step = float(np.median(per_step))
    sec_per_image = sec_per_step * steps

    flops = _flux_flops(cfg.dim, cfg.num_layers, cfg.num_single_layers, t_img, t_txt)
    kind, peak = _chip_peak_flops()
    achieved = flops / sec_per_step
    del state, model
    gc.collect()
    return {
        "sec_per_image": sec_per_image,
        "sec_per_step": sec_per_step,
        "steps": steps,
        "reps": len(per_step),
        "tokens": t_img + t_txt,
        "int8_kernels": n_q,
        "tflops_per_step": flops / 1e12,
        "achieved_tflops": achieved / 1e12,
        "mfu": achieved / peak,
        "chip": kind,
    }


def bench_hyv15(tiny: bool) -> dict:
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from apex_studio_tpu.models.transformers.hunyuanvideo15 import (
        HYV15Config,
        HunyuanVideo15Transformer3DModel,
    )
    from apex_studio_tpu.quantize.residency import materialize_random_int8

    if tiny:
        cfg = HYV15Config(num_attention_heads=2, attention_head_dim=32, num_layers=2,
                          num_refiner_layers=1, text_embed_dim=64, text_embed_2_dim=32,
                          image_embed_dim=48, rope_axes_dim=(8, 12, 12))
        tt, hh, ww, t_txt, t_im = 2, 6, 8, 16, 9
    else:
        cfg = HYV15Config()  # 54 dual-stream blocks, dim 2048
        # 720p x 121 frames: vae 16x spatial / 4x temporal -> 31 x 45 x 80
        tt, hh, ww, t_txt, t_im = 31, 45, 80, 256, 729
    t_img = tt * hh * ww

    model = nnx.eval_shape(
        lambda: HunyuanVideo15Transformer3DModel(cfg, dtype=jnp.bfloat16,
                                                 param_dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    )
    _trace("hyv15: materializing weights on device")
    n_q = materialize_random_int8(model, min_numel=1 << 20, seed=1)
    _trace(f"hyv15: weights ready ({n_q} int8 kernels)")
    graphdef, state = nnx.split(model)

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def fused_step(state, latents, text, text_mask, img_emb, t, dt):
        # i2v packs [noisy(32) | cond(32) | mask(1)] channels; only the noisy
        # block receives the Euler update, conditioning channels stay fixed.
        m = nnx.merge(graphdef, state)
        v = m(latents, t, text, text_mask, image_embeds=img_emb)
        c = v.shape[1]
        noisy = latents[:, :c] + dt * v.astype(latents.dtype)
        return jnp.concatenate([noisy, latents[:, c:]], axis=1)

    rng = np.random.default_rng(0)
    b = 1
    base = jnp.asarray(rng.normal(size=(b, cfg.in_channels, tt, hh, ww)), jnp.bfloat16)
    text = jnp.asarray(rng.normal(size=(b, t_txt, cfg.text_embed_dim)), jnp.bfloat16)
    tmask = jnp.ones((b, t_txt), bool)
    img_emb = jnp.asarray(rng.normal(size=(b, t_im, cfg.image_embed_dim)), jnp.bfloat16)
    tvec = jnp.full((b,), 500.0, jnp.float32)
    dt = jnp.float32(-0.02)

    x = base + 0.0
    x = fused_step(state, x, text, tmask, img_emb, tvec, dt)
    _readback(x)  # compile + execute
    _trace("hyv15: fused step compiled, measuring")
    t0 = time.perf_counter()
    x = fused_step(state, x, text, tmask, img_emb, tvec, dt)
    _readback(x)
    t1 = time.perf_counter()
    times = [t1 - t0]
    # A second timed step only if the budget allows it.
    if _remaining() > 1.5 * times[0]:
        x = fused_step(state, x, text, tmask, img_emb, tvec, dt)
        _readback(x)
        times.append(time.perf_counter() - t1)
    sec_per_step = float(min(times))

    steps, frames = (HYV15_STEPS, HYV15_FRAMES) if not tiny else (4, 5)
    sec_per_frame = sec_per_step * steps / frames
    flops = _hyv15_flops(cfg.dim, cfg.num_layers, t_img, t_txt + t_im)
    kind, peak = _chip_peak_flops()
    achieved = flops / sec_per_step
    del state, model
    gc.collect()
    return {
        "sec_per_frame": sec_per_frame,
        "sec_per_step": sec_per_step,
        "steps": steps,
        "reps": len(times),
        "tokens": t_img + t_txt + t_im,
        "int8_kernels": n_q,
        "tflops_per_step": flops / 1e12,
        "achieved_tflops": achieved / 1e12,
        "mfu": achieved / peak,
    }


def _probe_tpu(budget_s: float) -> bool:
    """jax.devices() hangs forever when the axon relay is down (it dials the
    local relay port in a retry loop). Probe in a subprocess with a hard
    timeout so an outage yields an explicit JSON record instead of rc=124
    with no output."""
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=budget_s, capture_output=True,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    if (os.environ.get("JAX_PLATFORMS", "") == "axon"
            and os.environ.get("APEX_BENCH_TPU_PROBE", "1") != "0"):
        budget = float(os.environ.get("APEX_BENCH_TPU_PROBE_S", "240"))
        if not _probe_tpu(budget):
            print(json.dumps({
                "metric": "flux_dev_1024px_sec_per_image_denoise_28steps_w8a8",
                "value": None,
                "unit": "s/image",
                "error": f"tpu relay unreachable (jax.devices() probe timed "
                         f"out after {int(budget)}s); see docs/BENCH_LOG.md "
                         f"for the last real-chip measurements",
            }), flush=True)
            return

    import jax

    from apex_studio_tpu.utils.compile_cache import enable_compile_cache

    # Persistent XLA compile cache (committed .jax_cache/): a warm cache turns
    # the multi-minute full-DiT compiles into second-scale deserializes, which
    # is what lets both bench legs fit inside the driver's wall-clock window.
    enable_compile_cache()

    platform = jax.default_backend()
    preset = os.environ.get("APEX_BENCH_PRESET", "full" if platform == "tpu" else "tiny")
    tiny = preset != "full"

    if os.environ.get("APEX_BENCH_FLUX", "1") != "0":
        flux = bench_flux(tiny)
        result = {
            "metric": "flux_dev_1024px_sec_per_image_denoise_28steps_w8a8"
            if not tiny
            else "flux_tiny_sec_per_image",
            "value": round(flux["sec_per_image"], 4),
            "unit": "s/image",
            "vs_baseline": round(FLUX_BASELINE_SEC_PER_IMAGE / flux["sec_per_image"], 3)
            if not tiny
            else 1.0,
            "flux_sec_per_step": round(flux["sec_per_step"], 4),
            "flux_mfu": round(flux["mfu"], 4),
            "flux_achieved_tflops": round(flux["achieved_tflops"], 1),
            "chip": flux["chip"],
        }
        # Flush the primary metric NOW: if the HYV15 leg is killed by an
        # external timeout, the driver's tail-parse still sees this line.
        print(json.dumps(result), flush=True)
    else:
        result = {"metric": "hyv15_only", "value": 0.0, "unit": "s/frame"}

    if os.environ.get("APEX_BENCH_HYV15", "1") != "0":
        # The HYV15 leg needs roughly compile + 2-3 steps (~80 s/step on one
        # v5e chip at the 45%-MFU anchor). Skip it rather than emit nothing.
        need = 60.0 if tiny else 420.0
        if _remaining() < need:
            result["hyv15_skipped"] = f"budget: {int(_remaining())}s left, need ~{int(need)}s"
            print(json.dumps(result), flush=True)
            return
        try:
            hyv = bench_hyv15(tiny)
            result.update(
                {
                    "hyv15_720p_sec_per_frame": round(hyv["sec_per_frame"], 4),
                    "hyv15_sec_per_step": round(hyv["sec_per_step"], 4),
                    "hyv15_vs_baseline": round(
                        HYV15_BASELINE_SEC_PER_FRAME / hyv["sec_per_frame"], 3
                    )
                    if not tiny
                    else 1.0,
                    "hyv15_mfu": round(hyv["mfu"], 4),
                    "hyv15_achieved_tflops": round(hyv["achieved_tflops"], 1),
                }
            )
        except Exception as e:  # never lose the primary metric
            result["hyv15_error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(result), flush=True)

    # Extra leg: same Flux config with the bf16-dequant compute path (W8A8 is
    # now the default for int8-resident kernels). Runs last so it can only
    # ever add information, never cost the graded metrics budget.
    if (
        os.environ.get("APEX_BENCH_W8A8", "1") != "0"
        and os.environ.get("APEX_BENCH_FLUX", "1") != "0"
        and _remaining() > (60.0 if tiny else 300.0)
    ):
        os.environ["APEX_INT8_COMPUTE"] = "0"
        try:
            f8 = bench_flux(tiny)
            result.update(
                {
                    "flux_dequant_sec_per_image": round(f8["sec_per_image"], 4),
                    "flux_dequant_sec_per_step": round(f8["sec_per_step"], 4),
                    "flux_dequant_model_tflops": round(f8["achieved_tflops"], 1),
                }
            )
        except Exception as e:
            result["dequant_error"] = f"{type(e).__name__}: {e}"[:300]
        finally:
            os.environ.pop("APEX_INT8_COMPUTE", None)
        print(json.dumps(result), flush=True)

    # End-to-end legs (bench_e2e.py): manifest → engine.run → text-encode →
    # denoise → VAE decode → file, per BASELINE.json config. Each runs in a
    # subprocess (memory isolation) while the wall-clock budget allows;
    # results merge into the cumulative JSON line as e2e_<config> keys.
    # Warm compile caches make each leg ~2-4 min; cold caches won't fit, so
    # legs degrade to "skipped" notes rather than eating the graded metrics.
    if os.environ.get("APEX_BENCH_E2E", "1") != "0" and not tiny:
        import subprocess
        import sys

        legs = ("flux", "zimage", "wan", "hyv15", "qwenimage")
        for leg in legs:
            need = 240.0
            if _remaining() < need:
                result[f"e2e_{leg}"] = f"skipped: {int(_remaining())}s left"
                continue
            budget = int(min(_remaining() - 30, 900))
            env = dict(os.environ)
            env.setdefault("APEX_E2E_RUNS", "1")
            env.setdefault("APEX_E2E_HYV15_STEPS", "2")
            _trace(f"e2e leg {leg} (budget {budget}s)")
            try:
                proc = subprocess.run(
                    [sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "bench_e2e.py"), leg, "--inline"],
                    env=env, timeout=budget, capture_output=True, text=True)
                line = next((l for l in reversed(proc.stdout.splitlines())
                             if l.startswith("{")), None)
                if line:
                    leg_res = json.loads(line)
                    key = f"e2e_{leg}"
                    if "error" in leg_res:
                        result[key] = f"error: {leg_res['error'][:200]}"
                    else:
                        result[key + "_s"] = leg_res.get("e2e_s")
                        for extra in ("sec_per_frame_e2e_50", "lora_merge_s",
                                      "mask_preprocess_s", "residency"):
                            if extra in leg_res:
                                result[f"{key}_{extra}"] = leg_res[extra]
                else:
                    result[f"e2e_{leg}"] = f"no output rc={proc.returncode}"
            except subprocess.TimeoutExpired:
                result[f"e2e_{leg}"] = f"timeout after {budget}s"
            print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
