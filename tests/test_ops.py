import numpy as np
import pytest

import jax
import jax.numpy as jnp

from apex_studio_tpu.ops import (
    apply_rope,
    attention,
    cfg_combine,
    layer_norm,
    modulate,
    precompute_axial_freqs,
    rms_norm,
    timestep_embedding,
)
from apex_studio_tpu.ops.attention import attention_registry


def make_qkv(b=2, sq=64, sk=80, h=4, d=32, dtype=jnp.float32, seed=0):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype)
    k = jax.random.normal(kk, (b, sk, h, d), dtype)
    v = jax.random.normal(kv, (b, sk, h, d), dtype)
    return q, k, v


class TestAttentionBackends:
    @pytest.mark.parametrize("backend", ["xla", "chunked"])
    def test_matches_naive(self, backend):
        q, k, v = make_qkv()
        ref = attention(q, k, v, backend="naive")
        out = attention(q, k, v, backend=backend)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_pallas_interpret_matches_naive(self, monkeypatch):
        monkeypatch.setenv("APEX_PALLAS_INTERPRET", "1")
        q, k, v = make_qkv(b=1, sq=128, sk=128, h=2, d=32)
        ref = attention(q, k, v, backend="naive")
        out = attention(q, k, v, backend="pallas_flash")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_pallas_interpret_ragged_kv(self, monkeypatch):
        # Sk not a multiple of the block size exercises the in-kernel tail mask.
        monkeypatch.setenv("APEX_PALLAS_INTERPRET", "1")
        q, k, v = make_qkv(b=1, sq=72, sk=200, h=2, d=32)
        ref = attention(q, k, v, backend="naive")
        out = attention(q, k, v, backend="pallas_flash")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_pallas_key_padding_bias(self, monkeypatch):
        monkeypatch.setenv("APEX_PALLAS_INTERPRET", "1")
        q, k, v = make_qkv(b=2, sq=64, sk=96, h=2, d=32)
        mask = jnp.arange(96)[None, :] < jnp.array([50, 96])[:, None]  # [B, Sk]
        ref = attention(q, k, v, mask=mask, backend="naive")
        out = attention(q, k, v, mask=mask, backend="pallas_flash")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_pallas_causal(self, monkeypatch):
        monkeypatch.setenv("APEX_PALLAS_INTERPRET", "1")
        q, k, v = make_qkv(b=1, sq=64, sk=64, h=2, d=32)
        ref = attention(q, k, v, is_causal=True, backend="naive")
        out = attention(q, k, v, is_causal=True, backend="pallas_flash")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_chunked_with_padding_mask(self):
        q, k, v = make_qkv(sk=100)
        mask = jnp.arange(100)[None, :] < 70
        mask = jnp.broadcast_to(mask, (2, 100))
        ref = attention(q, k, v, mask=mask, backend="naive")
        out = attention(q, k, v, mask=mask, backend="chunked")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bfloat16_path(self):
        q, k, v = make_qkv(dtype=jnp.bfloat16)
        ref = attention(q, k, v, backend="naive")
        out = attention(q, k, v, backend="xla")
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )

    def test_scale_override(self):
        q, k, v = make_qkv()
        out1 = attention(q, k, v, scale=0.5, backend="naive")
        out2 = attention(q * (0.5 / q.shape[-1] ** -0.5), k, v, backend="naive")
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_registry_names(self):
        for name in ("naive", "xla", "chunked", "pallas_flash"):
            assert name in attention_registry


class TestRoPE:
    def test_rotation_preserves_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 32))
        ids = jnp.arange(16)[None, :, None]
        cos, sin = precompute_axial_freqs(ids, [32], theta=10000.0)
        out = apply_rope(x, cos[:, :, None, :], sin[:, :, None, :])
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )

    def test_zero_position_is_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 16))
        ids = jnp.zeros((1, 4, 1), jnp.int32)
        cos, sin = precompute_axial_freqs(ids, [16])
        out = apply_rope(x, cos[:, :, None, :], sin[:, :, None, :])
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_relative_phase_property(self):
        # <RoPE(q,m), RoPE(k,n)> depends only on m - n.
        d = 16
        q = jax.random.normal(jax.random.PRNGKey(2), (d,))
        k = jax.random.normal(jax.random.PRNGKey(3), (d,))

        def rot(x, pos):
            ids = jnp.full((1, 1, 1), pos, jnp.int32)
            cos, sin = precompute_axial_freqs(ids, [d])
            return apply_rope(x[None, None, None, :], cos[:, :, None, :], sin[:, :, None, :])[
                0, 0, 0
            ]

        dot_a = jnp.dot(rot(q, 5), rot(k, 3))
        dot_b = jnp.dot(rot(q, 9), rot(k, 7))
        np.testing.assert_allclose(float(dot_a), float(dot_b), rtol=1e-4)

    def test_matches_complex_reference(self):
        # Independent reference: numpy complex arithmetic with interleaved pairs.
        d, s = 8, 6
        x = np.random.default_rng(0).normal(size=(s, d)).astype(np.float32)
        theta = 256.0
        inv = 1.0 / (theta ** (np.arange(0, d, 2) / d))
        angles = np.arange(s)[:, None] * inv[None, :]
        ref = (x.reshape(s, d // 2, 2).view(np.float32).astype(np.float64).view(np.float64)
               .reshape(s, d // 2, 2))
        comp = (ref[..., 0] + 1j * ref[..., 1]) * np.exp(1j * angles)
        expected = np.stack([comp.real, comp.imag], axis=-1).reshape(s, d)

        ids = jnp.arange(s)[None, :, None]
        cos, sin = precompute_axial_freqs(ids, [d], theta=theta)
        out = apply_rope(jnp.asarray(x)[None, :, None, :], cos[:, :, None, :], sin[:, :, None, :])
        np.testing.assert_allclose(np.asarray(out)[0, :, 0], expected, atol=1e-5)

    def test_multi_axis_dims(self):
        ids = jnp.stack(
            jnp.meshgrid(jnp.arange(2), jnp.arange(3), jnp.arange(4), indexing="ij"),
            axis=-1,
        ).reshape(1, -1, 3)
        cos, sin = precompute_axial_freqs(ids, [8, 12, 12])
        assert cos.shape == (1, 24, 16)  # sum(dims)//2


class TestNorms:
    def test_rms_norm_unit_scale(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64)) * 5.0
        out = np.asarray(rms_norm(x))
        rms = np.sqrt((out**2).mean(-1))
        np.testing.assert_allclose(rms, 1.0, rtol=1e-3)

    def test_rms_norm_weight(self):
        x = jnp.ones((2, 4))
        w = jnp.full((4,), 2.0)
        np.testing.assert_allclose(np.asarray(rms_norm(x, w)), 2.0, rtol=1e-5)

    def test_layer_norm_zero_mean(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64)) + 3.0
        out = np.asarray(layer_norm(x))
        np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.std(-1), 1.0, rtol=1e-2)

    def test_modulate_and_gate(self):
        x = jnp.ones((1, 3, 4))
        scale = jnp.full((1, 1, 4), 0.5)
        np.testing.assert_allclose(np.asarray(modulate(x, scale)), 1.5)
        np.testing.assert_allclose(
            np.asarray(modulate(x, scale, shift=jnp.full((1, 1, 4), 1.0))), 2.5
        )


class TestCFG:
    def test_plain_combine(self):
        cond = jnp.full((1, 4), 2.0)
        uncond = jnp.full((1, 4), 1.0)
        out = cfg_combine(cond, uncond, 5.0)
        np.testing.assert_allclose(np.asarray(out), 6.0)

    def test_scale_one_is_cond(self):
        cond = jax.random.normal(jax.random.PRNGKey(0), (1, 8))
        uncond = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
        np.testing.assert_allclose(
            np.asarray(cfg_combine(cond, uncond, 1.0)), np.asarray(cond), atol=1e-6
        )

    def test_normalize_preserves_cond_norm(self):
        cond = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
        uncond = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        out = cfg_combine(cond, uncond, 7.5, normalize=True)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(cond), axis=-1),
            rtol=1e-4,
        )

    def test_truncate(self):
        cond = jnp.full((1, 4), 10.0)
        uncond = jnp.zeros((1, 4))
        out = cfg_combine(cond, uncond, 2.0, truncate=5.0)
        np.testing.assert_allclose(np.asarray(out), 5.0)


class TestTimestepEmbedding:
    def test_shape_and_range(self):
        t = jnp.array([0.0, 500.0, 1000.0])
        emb = timestep_embedding(t, 256)
        assert emb.shape == (3, 256)
        assert np.abs(np.asarray(emb)).max() <= 1.0 + 1e-6

    def test_distinct_timesteps_distinct_embeddings(self):
        emb = np.asarray(timestep_embedding(jnp.array([1.0, 2.0]), 128))
        assert np.abs(emb[0] - emb[1]).max() > 1e-3

    def test_odd_dim_pads(self):
        emb = timestep_embedding(jnp.array([3.0]), 129)
        assert emb.shape == (1, 129)
