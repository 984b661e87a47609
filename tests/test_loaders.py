import json
import struct

import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.loaders.converters import convert_keys, converter_registry
from apex_studio_tpu.loaders.safetensors_io import (
    dequantize_fp8_scaled,
    load_safetensors,
    safetensors_keys,
)
from apex_studio_tpu.loaders.state_mapping import apply_state_dict, assign_by_path


def write_safetensors(path, tensors):
    """Minimal safetensors writer for tests (f32/bf16 via ml_dtypes)."""
    import ml_dtypes

    dtype_names = {
        np.dtype(np.float32): "F32",
        np.dtype(ml_dtypes.bfloat16): "BF16",
        np.dtype(ml_dtypes.float8_e4m3fn): "F8_E4M3",
    }
    header = {}
    blobs = []
    offset = 0
    for name, arr in tensors.items():
        raw = arr.tobytes()
        header[name] = {
            "dtype": dtype_names[arr.dtype],
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


class TestSafetensorsIO:
    def test_roundtrip_f32_bf16(self, tmp_path):
        import ml_dtypes

        p = tmp_path / "t.safetensors"
        a = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
        b = a.astype(ml_dtypes.bfloat16)
        write_safetensors(p, {"a": a, "b": b})
        out = load_safetensors(p)
        np.testing.assert_array_equal(out["a"], a)
        np.testing.assert_array_equal(out["b"].astype(np.float32), b.astype(np.float32))
        assert set(safetensors_keys(p)) == {"a", "b"}

    def test_selective_keys(self, tmp_path):
        p = tmp_path / "t.safetensors"
        write_safetensors(p, {"x": np.zeros((2,), np.float32), "y": np.ones((2,), np.float32)})
        out = load_safetensors(p, keys=["y"])
        assert list(out) == ["y"]

    def test_fp8_dequant_with_scale(self):
        import ml_dtypes

        w = np.array([1.0, 2.0], dtype=ml_dtypes.float8_e4m3fn)
        sd = {"lin.weight": w, "lin.weight_scale": np.array(3.0, np.float32)}
        out = dequantize_fp8_scaled(sd)
        np.testing.assert_allclose(out["lin.weight"], [3.0, 6.0])
        assert "lin.weight_scale" not in out


class TestConverters:
    def test_zimage_renames(self):
        sd = {
            "all_x_embedder.2-1.weight": np.zeros((8, 4), np.float32),
            "cap_embedder.0.weight": np.zeros((4,), np.float32),
            "cap_embedder.1.weight": np.zeros((8, 4), np.float32),
            "t_embedder.mlp.0.weight": np.zeros((4, 4), np.float32),
            "layers.0.attention.to_out.0.weight": np.zeros((8, 8), np.float32),
            "layers.0.adaLN_modulation.0.weight": np.zeros((32, 4), np.float32),
            "rope_embedder.freqs_cis": np.zeros((4,), np.float32),
        }
        out = convert_keys("zimage", sd)
        assert "x_embedder.kernel" in out
        assert "cap_embedder_norm.weight" in out
        assert "cap_embedder_linear.kernel" in out
        assert "t_embedder.in_layer.kernel" in out
        assert "layers.0.attention.to_out.kernel" in out
        assert "layers.0.adaLN_modulation.kernel" in out
        assert not any("rope" in k for k in out)

    def test_qwen3_renames(self):
        sd = {
            "model.embed_tokens.weight": np.zeros((10, 4), np.float32),
            "model.layers.0.self_attn.q_proj.weight": np.zeros((8, 4), np.float32),
            "model.layers.0.mlp.gate_proj.weight": np.zeros((16, 4), np.float32),
            "model.norm.weight": np.zeros((4,), np.float32),
            "lm_head.weight": np.zeros((10, 4), np.float32),
        }
        out = convert_keys("qwen3", sd)
        assert "embed_tokens" in out
        assert "layers.0.self_attn.q_proj.kernel" in out
        assert "layers.0.mlp.w1.kernel" in out
        assert "norm.weight" in out
        assert not any("lm_head" in k for k in out)

    def test_comfy_prefix_stripped(self):
        sd = {"model.diffusion_model.layers.0.attention.to_q.weight": np.zeros((4, 4), np.float32)}
        out = convert_keys("zimage", sd)
        assert "layers.0.attention.to_q.kernel" in out


class TestStateMapping:
    def _model(self):
        from apex_studio_tpu.models.layers import Linear

        class M(nnx.Module):
            def __init__(self):
                rngs = nnx.Rngs(0)
                self.lin = Linear(4, 8, dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
                self.blocks = nnx.List(
                    [Linear(4, 4, use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)]
                )

        return M()

    def test_apply_transposes_linear(self):
        m = self._model()
        w = np.arange(32, dtype=np.float32).reshape(8, 4)  # torch [out, in]
        apply_state_dict(
            m,
            {
                "lin.kernel": w,
                "lin.bias": np.zeros((8,), np.float32),
                "blocks.0.kernel": np.eye(4, dtype=np.float32),
            },
        )
        np.testing.assert_array_equal(np.asarray(m.lin.kernel.value), w.T)

    def test_missing_key_strict_raises(self):
        m = self._model()
        with pytest.raises(KeyError, match="missing"):
            apply_state_dict(m, {"lin.kernel": np.zeros((8, 4), np.float32)})

    def test_unexpected_key_strict_raises(self):
        m = self._model()
        with pytest.raises(KeyError, match="not in model"):
            apply_state_dict(m, {"nope.kernel": np.zeros((4, 4), np.float32)})

    def test_shape_mismatch_raises(self):
        m = self._model()
        with pytest.raises(ValueError, match="shape mismatch"):
            assign_by_path(m, "lin.bias", jnp.zeros((3,)))

    def test_non_strict_reports(self):
        m = self._model()
        missing, unexpected = apply_state_dict(
            m, {"nope.kernel": np.zeros((2, 2), np.float32)}, strict=False
        )
        assert "lin.kernel" in missing
        assert unexpected == ["nope.kernel"]


class TestFP4Load:
    """FP4-scaled checkpoint load path (reference quantize/scaled_layer.py:76
    quantize_to_fp4 / :118 dequantize_from_fp4): signed 4-bit codes in
    int8/uint8 + pow2 scale_weight fold to float at load."""

    def _fp4_pair(self, rng, shape):
        w = rng.normal(size=shape).astype(np.float32)
        amax = np.abs(w).max(axis=0, keepdims=True)
        scales = 2.0 ** np.round(np.log2(amax / 7.0))
        q = np.clip(np.rint(w / scales), -7, 7).astype(np.int8)
        return q, scales.astype(np.float32), q.astype(np.float32) * scales

    def test_int8_codes_fold(self):
        rng = np.random.default_rng(0)
        q, s, expected = self._fp4_pair(rng, (16, 8))
        out = dequantize_fp8_scaled({"blk.weight": q, "blk.scale_weight": s})
        assert "blk.scale_weight" not in out
        np.testing.assert_allclose(out["blk.weight"], expected, rtol=1e-6)

    def test_uint8_codes_fold(self):
        """Some exporters store the signed codes in a uint8 container
        (reference dispatch checks torch.uint8, scaled_layer.py:525)."""
        rng = np.random.default_rng(1)
        q, s, expected = self._fp4_pair(rng, (8, 4))
        out = dequantize_fp8_scaled(
            {"blk.weight": q.view(np.uint8), "blk.scale_weight": s})
        np.testing.assert_allclose(out["blk.weight"], expected, rtol=1e-6)

    def test_unscaled_int8_passes_through(self):
        # GGUF-style raw int8 tensors without a scale key must not be touched
        arr = np.arange(-4, 4, dtype=np.int8).reshape(2, 4)
        out = dequantize_fp8_scaled({"x.weight": arr})
        assert out["x.weight"].dtype == np.int8
        np.testing.assert_array_equal(out["x.weight"], arr)

    def test_synthetic_fp4_checkpoint_roundtrip(self, tmp_path):
        """Write an FP4-scaled safetensors file, load it through the normal
        loader chain, and check the folded weights."""
        from apex_studio_tpu.loaders.safetensors_io import (
            load_safetensors,
            save_safetensors,
        )

        rng = np.random.default_rng(2)
        q, s, expected = self._fp4_pair(rng, (32, 16))
        p = tmp_path / "fp4.safetensors"
        save_safetensors(p, {"lin.weight": q, "lin.scale_weight": s})
        sd = load_safetensors(p)
        out = dequantize_fp8_scaled(sd)
        np.testing.assert_allclose(out["lin.weight"], expected, rtol=1e-6)
