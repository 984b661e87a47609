"""Host-RAM block streaming + int8 residency fallback (reference:
src/memory_management/group_offloading.py:851, budget_offloading.py — the
oversized-model path, tested on a toy module like the reference's
tests/memory_management/test_budget_offloading.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from apex_studio_tpu.parallel import host_offload
from apex_studio_tpu.parallel.host_offload import (
    HostOffloadedBlocks,
    hbm_budget_bytes,
    params_nbytes,
    should_stream,
    stream_blocks,
)


class Block(nnx.Module):
    def __init__(self, dim, *, rngs):
        self.fc1 = nnx.Linear(dim, dim * 2, rngs=rngs)
        self.fc2 = nnx.Linear(dim * 2, dim, rngs=rngs)

    def __call__(self, x, gate):
        return x + self.fc2(jax.nn.gelu(self.fc1(x))) * gate


def _make_blocks(n=4, dim=16, seed=0):
    rngs = nnx.Rngs(seed)
    return [Block(dim, rngs=rngs) for _ in range(n)]


def test_stream_matches_direct():
    blocks = _make_blocks()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 16)), jnp.float32)
    gate = jnp.float32(0.5)
    ref = x
    for b in blocks:
        ref = b(ref, gate)
    out = stream_blocks(blocks, x, gate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_double_buffering_bounds_residency(monkeypatch):
    """At any time at most 2 block states have been put on device and not
    yet released — the invariant that keeps peak HBM at 2 blocks."""
    blocks = _make_blocks(n=6)
    stack = HostOffloadedBlocks(blocks)
    puts = []
    real_put = jax.device_put

    def counting_put(tree, device=None):
        puts.append(1)
        return real_put(tree, device)

    monkeypatch.setattr(host_offload.jax, "device_put", counting_put)
    x = jnp.ones((1, 4, 16), jnp.float32)
    stack(x, jnp.float32(1.0))
    # one device_put per block, no re-uploads
    assert len(puts) == len(blocks)


def test_one_compile_for_all_blocks():
    blocks = _make_blocks(n=5)
    stack = HostOffloadedBlocks(blocks)
    x = jnp.ones((1, 4, 16), jnp.float32)
    stack(x, jnp.float32(1.0))
    fn = stack._fn()
    # homogeneous blocks share the jitted executable; the only extra entry is
    # the first step, whose input placement (uncommitted caller array) differs
    assert fn._cache_size() <= 2


def test_host_states_are_numpy():
    stack = HostOffloadedBlocks(_make_blocks(n=2))
    leaves = jax.tree.leaves(stack.host_states[0])
    assert all(isinstance(l, np.ndarray) for l in leaves)


def test_params_nbytes():
    blocks = _make_blocks(n=1, dim=16)
    nb = params_nbytes(blocks[0])
    # fc1: 16*32 + 32, fc2: 32*16 + 16 → 1072 f32 params
    assert nb == 1072 * 4


def test_should_stream_gate(monkeypatch):
    model = _make_blocks(n=1)[0]
    monkeypatch.setattr(host_offload, "hbm_budget_bytes", lambda device=None: 1024)
    assert should_stream(model)  # 4 KB params vs 1 KB budget
    monkeypatch.setattr(host_offload, "hbm_budget_bytes", lambda device=None: 1 << 30)
    assert not should_stream(model)
    monkeypatch.setattr(host_offload, "hbm_budget_bytes", lambda device=None: None)
    assert not should_stream(model)  # no stats → never force


def test_int8_residency_roundtrip():
    from apex_studio_tpu.models.layers import Linear
    from apex_studio_tpu.quantize.residency import apply_int8_residency

    class Toy(nnx.Module):
        def __init__(self, *, rngs):
            self.proj = Linear(256, 4096, rngs=rngs, dtype=jnp.float32,
                               param_dtype=jnp.float32)

        def __call__(self, x):
            return self.proj(x)

    toy = Toy(rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 256)), jnp.float32)
    ref = toy(x)
    n = apply_int8_residency(toy, min_numel=1)
    assert n == 1
    assert toy.proj.kernel.value.dtype == jnp.int8
    got = toy(x)
    rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02  # int8 per-channel quantization noise


def test_engine_auto_fallback_gate(monkeypatch, tmp_path):
    """BaseEngine._apply_memory_fallback quantizes when the gate trips and the
    mesh is single-device; APEX_MEMORY_FALLBACK=off disables it."""
    from apex_studio_tpu.engine import base as engine_base
    from apex_studio_tpu.models.layers import Linear
    from apex_studio_tpu.quantize import residency

    class Toy(nnx.Module):
        def __init__(self, *, rngs):
            # ≥ residency.DEFAULT_MIN_NUMEL elements so the int8 pass takes it
            self.proj = Linear(1024, 1024, rngs=rngs, dtype=jnp.float32,
                               param_dtype=jnp.float32)

    class FakeEngine:
        config = {}
        mesh = None
        _apply_memory_fallback = engine_base.BaseEngine._apply_memory_fallback

    assert residency.DEFAULT_MIN_NUMEL <= 1024 * 1024
    monkeypatch.setattr(host_offload, "hbm_budget_bytes", lambda device=None: 1)

    toy = Toy(rngs=nnx.Rngs(0))
    monkeypatch.setenv("APEX_MEMORY_FALLBACK", "off")
    FakeEngine()._apply_memory_fallback(toy, {})
    assert toy.proj.kernel.value.dtype != jnp.int8

    monkeypatch.setenv("APEX_MEMORY_FALLBACK", "int8")
    FakeEngine()._apply_memory_fallback(toy, {})
    assert toy.proj.kernel.value.dtype == jnp.int8


class TestVaeEncodeCache:
    def test_cache_roundtrip(self, tmp_path, monkeypatch):
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path))
        import numpy as np

        from apex_studio_tpu.utils.disk_cache import EmbeddingCache

        c = EmbeddingCache("vae_encode", root=tmp_path)
        payload = {"fn": "vae_encode", "sha": "abc", "shape": [1, 3, 2, 8, 8]}
        assert c.load(payload) is None
        c.store(payload, np.ones((1, 4, 1, 2, 2), np.float32))
        hit = c.load(payload)
        assert hit is not None and hit[0].shape == (1, 4, 1, 2, 2)


def test_w8a8_int8_compute_path(monkeypatch):
    """APEX_INT8_COMPUTE=1 switches int8-resident Linears to int8 MXU dots
    (dynamic per-token activation quant); must stay close to the
    dequant-to-bf16 path and work under jit."""
    from apex_studio_tpu.models.layers import Linear
    from apex_studio_tpu.quantize.residency import apply_int8_residency

    lin = Linear(256, 4096, rngs=nnx.Rngs(0), dtype=jnp.float32,
                 param_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 256)), jnp.float32)
    ref = lin(x)
    apply_int8_residency(lin, min_numel=1)
    deq = lin(x)  # weight-only int8 path
    monkeypatch.setenv("APEX_INT8_COMPUTE", "1")
    w8a8 = jax.jit(lambda x: lin(x))(x)
    monkeypatch.delenv("APEX_INT8_COMPUTE")

    assert w8a8.shape == ref.shape
    for got, tol in ((deq, 0.02), (w8a8, 0.03)):
        rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
        assert rel < tol, rel
    # activation-quant noise on top of weight quant stays small
    rel = np.linalg.norm(np.asarray(w8a8 - deq)) / np.linalg.norm(np.asarray(deq))
    assert rel < 0.015, rel
