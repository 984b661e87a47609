"""FlashVSR: LQ-projection parity vs the reference oracle, streaming-cache
shape behavior, converter round-trip, and a tiny end-to-end engine run.

Reference: src/transformer/wan/flashvsr/{model.py,utils.py},
src/engine/flashvsr/upscale.py.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")

REF = Path("/root/reference/apps/api")

TINY_CFG = dict(dim=48, in_dim=4, ffn_dim=64, out_dim=4, text_dim=16,
                freq_dim=32, num_heads=2, num_layers=2,
                lq4x_proj_in_dim=3, lq4x_proj_out_dim=48,
                lq4x_proj_layer_num=1, lq_hidden_dim1=8, lq_hidden_dim2=12)

FLASHVSR_TINY_MANIFEST = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "flashvsr-tiny-test", "name": "FlashVSR Tiny",
                 "version": "1.0.0"},
    "spec": {
        "engine": "flashvsr",
        "model_type": "upscale",
        "engine_type": "jax",
        "components": [
            {"type": "vae", "base": "tiny_wan",
             "config": {"z_dim": 4 + 3 * 4 * 64, "channels": [8, 8, 8, 8]}},
            {"type": "transformer", "base": "wan.flashvsr", "config": TINY_CFG},
        ],
        "defaults": {"run": {"num_inference_steps": 1}},
    },
}


def _import_ref_utils():
    spec = importlib.util.spec_from_file_location(
        "ref_flashvsr_utils", REF / "src/transformer/wan/flashvsr/utils.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_flashvsr_utils"] = mod
    spec.loader.exec_module(mod)
    return mod


class TestLQProjParity:
    def test_full_sequence_equals_reference_stream(self):
        """FVLQProj's single-pass conv math must reproduce the reference's
        chunked stream with conv caches (Causal_LQ4x_Proj.forward)."""
        ref_utils = _import_ref_utils()
        torch.manual_seed(0)
        oracle = ref_utils.Causal_LQ4x_Proj(in_dim=3, out_dim=8, layer_num=1).eval()
        # shrink hidden dims for test speed by rebuilding with small convs
        # (the class hardcodes 2048/3072 — patch the modules directly)
        import torch.nn as tnn

        oracle.hidden_dim1, oracle.hidden_dim2 = 8, 12
        oracle.conv1 = ref_utils.CausalConv3d(3 * 256, 8, (4, 3, 3),
                                              stride=(2, 1, 1), padding=(1, 1, 1))
        oracle.norm1 = ref_utils.RMS_norm(8, images=False)
        oracle.conv2 = ref_utils.CausalConv3d(8, 12, (4, 3, 3),
                                              stride=(2, 1, 1), padding=(1, 1, 1))
        oracle.norm2 = ref_utils.RMS_norm(12, images=False)
        oracle.linear_layers = tnn.ModuleList([tnn.Linear(12, 8)])

        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.flashvsr import (
            FlashVSRConfig, FVLQProj)

        cfg = FlashVSRConfig(lq4x_proj_in_dim=3, lq4x_proj_out_dim=8,
                             lq4x_proj_layer_num=1, lq_hidden_dim1=8,
                             lq_hidden_dim2=12)
        model = FVLQProj(cfg, dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {"LQ_proj_in." + k: v.detach().numpy()
              for k, v in oracle.state_dict().items()}
        mapped = convert_keys("wan_flashvsr", sd)
        mapped = {k[len("LQ_proj_in."):]: v for k, v in mapped.items()}
        missing, unexpected = apply_state_dict(model, mapped, strict=True)
        assert not missing and not unexpected

        rng = np.random.default_rng(0)
        # 25 frames (8n+1, n=3) at 32x32 → 6 latent frames of 2x2 tokens
        vid = rng.normal(size=(1, 3, 25, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref_out = oracle(torch.from_numpy(vid))[0].numpy()
        out = np.asarray(model(jnp.asarray(vid))[0])
        assert out.shape == ref_out.shape == (1, 6 * 2 * 2, 8)
        np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


class TestStreamingShapes:
    def test_two_stage_cache_steady_state(self):
        from apex_studio_tpu.models.transformers.flashvsr import (
            FlashVSRConfig, FlashVSRTransformer3DModel)

        cfg = FlashVSRConfig(**TINY_CFG)
        m = FlashVSRTransformer3DModel(cfg, dtype=jnp.float32,
                                       param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        rng = np.random.default_rng(0)
        h_tok = w_tok = 2  # latents 4x4, patch (1,2,2)
        ctx_kv = m.context_kv(jnp.asarray(rng.normal(size=(1, 5, cfg.text_dim)),
                                          jnp.float32))
        t, t_mod = m.time_embed(1000.0)

        def run_chunk(f, f_start, caches):
            x = jnp.asarray(rng.normal(size=(1, cfg.in_dim, f, 4, 4)), jnp.float32)
            cos, sin = m.rope_for_chunk(f, h_tok, w_tok, f_start)
            out, new = m(x, t, t_mod, cos, sin, ctx_kv, caches=caches)
            assert out.shape == x.shape
            return new

        caches = run_chunk(6, 0, None)
        keep = cfg.kv_len * 2 * h_tok * w_tok
        assert all(k.shape == (1, keep, cfg.dim) for k, _ in caches)
        caches = run_chunk(2, 6, caches)
        assert all(k.shape == (1, keep, cfg.dim) for k, _ in caches)
        caches = run_chunk(2, 8, caches)
        assert all(v.shape == (1, keep, cfg.dim) for _, v in caches)


class TestFlashVSREngine:
    def test_engine_runs_tiny_upscale(self, tmp_path):
        path = tmp_path / "flashvsr-tiny.yml"
        path.write_text(yaml.safe_dump(FLASHVSR_TINY_MANIFEST))
        from apex_studio_tpu.engine.registry import UniversalEngine

        eng = UniversalEngine(str(path))
        rng = np.random.default_rng(0)
        frames_in = [rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
                     for _ in range(25)]
        frames = eng.run(video=frames_in, upscale_factor=8.0, seed=1)
        # 25 frames → n=3 → 6 latent frames → 4·6-3 = 21 output frames
        assert len(frames) == 21
        assert frames[0].shape == (128, 128, 3)
        assert frames[0].dtype == np.uint8
