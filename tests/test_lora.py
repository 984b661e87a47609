import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.lora.convert import (
    detect_lora_format,
    lora_pairs_from_state_dict,
)
from apex_studio_tpu.lora.manager import LoraManager, LoraSpec


def peft_sd(path="transformer_blocks.0.attn.to_q", r=2, din=4, dout=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        f"transformer.{path}.lora_A.weight": rng.normal(size=(r, din)).astype(np.float32),
        f"transformer.{path}.lora_B.weight": rng.normal(size=(dout, r)).astype(np.float32),
    }


class TestFormatDetection:
    def test_peft(self):
        assert detect_lora_format(peft_sd()) == "peft"

    def test_kohya(self):
        sd = {
            "lora_unet_blocks_0_attn1_to_q.lora_down.weight": np.zeros((2, 4), np.float32),
            "lora_unet_blocks_0_attn1_to_q.lora_up.weight": np.zeros((8, 2), np.float32),
            "lora_unet_blocks_0_attn1_to_q.alpha": np.asarray(2.0, np.float32),
        }
        assert detect_lora_format(sd) == "kohya"

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            lora_pairs_from_state_dict({"foo.weight": np.zeros((2, 2), np.float32)})


class TestPairExtraction:
    def test_peft_pairs(self):
        pairs = lora_pairs_from_state_dict(peft_sd())
        assert len(pairs) == 1
        p = pairs[0]
        assert p.module_path == "transformer_blocks.0.attn.to_q"
        assert p.down.shape == (2, 4) and p.up.shape == (8, 2)
        assert p.alpha is None

    def test_kohya_pairs_with_alpha(self):
        sd = {
            "lora_unet_blocks_0_attn1_to_q.lora_down.weight": np.ones((2, 4), np.float32),
            "lora_unet_blocks_0_attn1_to_q.lora_up.weight": np.ones((8, 2), np.float32),
            "lora_unet_blocks_0_attn1_to_q.alpha": np.asarray(1.0, np.float32),
        }
        pairs = lora_pairs_from_state_dict(sd)
        assert len(pairs) == 1
        assert pairs[0].module_path == "blocks.0.attn1.to_q"
        assert pairs[0].alpha == 1.0
        # delta = (alpha/r) * up@down = 0.5 * 2s = ones*... up@down = 2.0 each
        np.testing.assert_allclose(pairs[0].delta(), np.full((8, 4), 1.0))

    def test_delta_scaling(self):
        pairs = lora_pairs_from_state_dict(peft_sd(seed=1))
        p = pairs[0]
        np.testing.assert_allclose(p.delta(2.0), 2.0 * p.delta(1.0), rtol=1e-6)


class _ToyModel(nnx.Module):
    def __init__(self):
        from apex_studio_tpu.models.layers import Linear

        rngs = nnx.Rngs(0)
        self.transformer_blocks = nnx.List([_ToyBlock(rngs)])


class _ToyBlock(nnx.Module):
    def __init__(self, rngs):
        from apex_studio_tpu.models.layers import Linear

        self.attn = _ToyAttn(rngs)


class _ToyAttn(nnx.Module):
    def __init__(self, rngs):
        from apex_studio_tpu.models.layers import Linear

        self.to_q = Linear(4, 8, use_bias=False, dtype=jnp.float32,
                           param_dtype=jnp.float32, rngs=rngs)


class TestMergeIntoModel:
    def test_merge_and_unmerge_roundtrip(self, tmp_path):
        model = _ToyModel()
        base = np.asarray(model.transformer_blocks[0].attn.to_q.kernel.value).copy()
        sd = peft_sd(seed=3)
        mgr = LoraManager(lora_root=tmp_path)

        applied, skipped = mgr.apply_to_model(model, sd, scale=0.7)
        assert applied == 1 and not skipped
        merged = np.asarray(model.transformer_blocks[0].attn.to_q.kernel.value)
        pairs = lora_pairs_from_state_dict(sd)
        expected = base + 0.7 * pairs[0].delta().T
        np.testing.assert_allclose(merged, expected, rtol=1e-5)

        mgr.apply_to_model(model, sd, scale=0.7, sign=-1.0)
        np.testing.assert_allclose(
            np.asarray(model.transformer_blocks[0].attn.to_q.kernel.value), base, atol=1e-5
        )

    def test_missing_target_reports_skipped(self):
        model = _ToyModel()
        sd = peft_sd(path="transformer_blocks.9.attn.to_q")
        mgr = LoraManager()
        applied, skipped = mgr.apply_to_model(model, sd)
        assert applied == 0 and len(skipped) == 1

    def test_load_into_from_file(self, tmp_path):
        from tests.test_loaders import write_safetensors

        sd = peft_sd(seed=5)
        path = tmp_path / "adapter.safetensors"
        write_safetensors(path, sd)
        model = _ToyModel()
        mgr = LoraManager(lora_root=tmp_path)
        n = mgr.load_into(model, LoraSpec(source="adapter.safetensors", scale=1.0))
        assert n == 1

    def test_manifest_entry_forms(self):
        s1 = LoraSpec.from_manifest_entry("some/path.safetensors")
        assert s1.scale == 1.0
        s2 = LoraSpec.from_manifest_entry({"path": "x.safetensors", "scale": 0.5, "name": "style"})
        assert s2.scale == 0.5 and s2.name == "style"


class TestQuantizedMerge:
    """LoRA merge into int8/int4-resident kernels (dequant → add → requant):
    serving-quantized weights must still accept user adapters like the
    reference's Q8 tier."""

    def _delta_err(self, bits):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.lora.manager import LoraManager
        from apex_studio_tpu.models.layers import Linear
        from apex_studio_tpu.quantize.residency import (
            apply_int4_residency,
            apply_int8_residency,
        )

        rng = np.random.default_rng(0)
        din, dout, rank = 64, 32, 4
        lin = Linear(din, dout, use_bias=False, dtype=jnp.float32,
                     param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        a = rng.normal(size=(rank, din)).astype(np.float32) * 0.1
        b = rng.normal(size=(dout, rank)).astype(np.float32) * 0.1
        delta = b @ a  # torch [out, in]
        x = jnp.asarray(rng.normal(size=(4, din)), jnp.float32)
        y_expected = np.asarray(lin(x)) + np.asarray(x) @ delta.T

        if bits == 8:
            apply_int8_residency(lin, min_numel=1)
        else:
            apply_int4_residency(lin, min_numel=1)
        ok = LoraManager._merge_into_quantized(lin, delta, 1.0)
        assert ok
        y = np.asarray(lin(x))
        return float(np.linalg.norm(y - y_expected) /
                     np.linalg.norm(y_expected))

    def test_int8_merge(self):
        assert self._delta_err(8) < 2e-2

    def test_int4_merge(self):
        assert self._delta_err(4) < 1.5e-1

    def test_apply_to_model_routes_quantized(self):
        """apply_to_model must detect the residency and use the host-side
        merge instead of adding bf16 deltas into int8 storage."""
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.lora.manager import LoraManager
        from apex_studio_tpu.models.layers import Linear
        from apex_studio_tpu.quantize.residency import apply_int8_residency

        class Toy(nnx.Module):
            def __init__(self):
                self.to_q = Linear(32, 32, use_bias=False, dtype=jnp.float32,
                                   param_dtype=jnp.float32, rngs=nnx.Rngs(0))

        toy = Toy()
        before = np.asarray(toy.to_q.kernel.value).copy()
        apply_int8_residency(toy, min_numel=1)
        rng = np.random.default_rng(1)
        sd = {
            "to_q.lora_A.weight": rng.normal(size=(2, 32)).astype(np.float32),
            "to_q.lora_B.weight": rng.normal(size=(32, 2)).astype(np.float32),
        }
        applied, skipped = LoraManager().apply_to_model(toy, sd, scale=1.0)
        assert applied == 1, skipped
        assert toy.to_q.kernel.value.dtype == jnp.int8  # still resident
        deq = (np.asarray(toy.to_q.kernel.value, np.float32)
               * np.asarray(toy.to_q.kernel_scale.value))
        delta = sd["to_q.lora_B.weight"] @ sd["to_q.lora_A.weight"]
        expected = before + delta.T
        err = np.linalg.norm(deq - expected) / np.linalg.norm(expected)
        assert err < 2e-2
