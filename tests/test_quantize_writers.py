"""GGUF writer round-trips through the first-party reader.

Covers the reference capability of src/quantize/quantize.py:20,125 (quantize a
checkpoint to GGUF at a chosen quant type) plus the Q4_1/Q5_1 dequant kernels.
"""

import numpy as np
import pytest

from apex_studio_tpu.quantize.gguf import load_gguf_state_dict, read_gguf_header
from apex_studio_tpu.quantize.writers import QUANT_TYPES, quantize_tensor, write_gguf

RNG = np.random.default_rng(7)


def _toy_state():
    return {
        "blk.0.attn_q.weight": RNG.standard_normal((64, 256)).astype(np.float32),
        "blk.0.attn_q.bias": RNG.standard_normal((64,)).astype(np.float32),
        "blk.0.norm.weight": RNG.standard_normal((64,)).astype(np.float32),
    }


# max relative RMS error per format (quantization noise bounds)
TOL = {"F16": 1e-3, "BF16": 1e-2, "Q8_0": 0.01, "Q6_K": 0.03,
       "Q5_0": 0.05, "Q5_1": 0.04, "Q4_0": 0.12, "Q4_1": 0.09}


@pytest.mark.parametrize("qtype", sorted(TOL))
def test_roundtrip(tmp_path, qtype):
    state = _toy_state()
    path = tmp_path / f"model-{qtype}.gguf"
    used = write_gguf(path, state, qtype=qtype, skip_quant=("norm",))
    out = load_gguf_state_dict(path)
    assert set(out) == set(state)
    # norms skip quantization entirely
    assert used["blk.0.norm.weight"] == "F32"
    np.testing.assert_array_equal(out["blk.0.norm.weight"], state["blk.0.norm.weight"])
    if qtype not in ("F16", "BF16"):
        # 1-D bias falls back to F32 under block formats (doesn't tile)
        np.testing.assert_array_equal(out["blk.0.attn_q.bias"], state["blk.0.attn_q.bias"])
    else:  # scalar formats legitimately round the bias
        np.testing.assert_allclose(out["blk.0.attn_q.bias"], state["blk.0.attn_q.bias"],
                                   atol=0.02)
    w = state["blk.0.attn_q.weight"]
    got = out["blk.0.attn_q.weight"]
    assert got.shape == w.shape
    rel = np.sqrt(np.mean((got - w) ** 2)) / np.sqrt(np.mean(w**2))
    assert rel < TOL[qtype], f"{qtype}: rel RMS {rel:.4f}"


def test_header_metadata(tmp_path):
    path = tmp_path / "m.gguf"
    write_gguf(path, _toy_state(), qtype="Q8_0", metadata={"apex.family": "wan"})
    meta, infos, _ = read_gguf_header(path)
    assert meta["general.architecture"] == "apex"
    assert meta["apex.family"] == "wan"
    assert len(infos) == 3
    # dims stored innermost-first
    by_name = {n: dims for n, dims, _, _ in infos}
    assert by_name["blk.0.attn_q.weight"] == (256, 64)


def test_quantize_tensor_rejects_unknown():
    with pytest.raises(ValueError):
        quantize_tensor(np.zeros((4, 32), np.float32), "Q9_9")


def test_q4_0_preserves_sign_structure():
    # d = signed-max/-8 means the max-magnitude element must reconstruct closely
    x = RNG.standard_normal((2, 32)).astype(np.float32) * 3
    raw, tid = quantize_tensor(x, "Q4_0")
    assert tid == QUANT_TYPES["Q4_0"][0]
    from apex_studio_tpu.quantize.gguf import _deq_q4_0

    got = _deq_q4_0(np.frombuffer(raw, np.uint8), 2).reshape(2, 32)
    idx = np.abs(x).argmax(axis=1)
    for i in range(2):
        assert abs(got[i, idx[i]] - x[i, idx[i]]) < 0.35 * abs(x[i, idx[i]])


@pytest.mark.parametrize("qtype", ["Q4_1", "Q5_1"])
def test_affine_formats_exact_on_linear_ramp(qtype):
    # an affine block grid hits the codebook exactly: x = m + k*d
    levels = 15 if qtype == "Q4_1" else 31
    base = np.tile(np.arange(32, dtype=np.float32) % (levels + 1), (4, 1))
    x = base * 0.5 - 2.0
    raw, _ = quantize_tensor(x, qtype)
    from apex_studio_tpu.quantize import gguf

    fn = gguf._deq_q4_1 if qtype == "Q4_1" else gguf._deq_q5_1
    got = fn(np.frombuffer(raw, np.uint8), 4).reshape(4, 32)
    np.testing.assert_allclose(got, x, atol=2e-3)
