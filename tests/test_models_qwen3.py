import numpy as np
import pytest

import jax
import jax.numpy as jnp

from apex_studio_tpu.models.text_encoders.qwen3 import Qwen3Config, Qwen3TextEncoder


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = Qwen3Config(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
    )
    return Qwen3TextEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)


class TestQwen3Encoder:
    def test_hidden_state_shape(self, tiny_lm):
        ids = jnp.arange(10)[None, :] % 128
        out = tiny_lm(ids)
        assert out.shape == (1, 10, 32)

    def test_causality(self, tiny_lm):
        """Changing a later token must not affect earlier positions."""
        ids1 = jnp.array([[1, 2, 3, 4, 5]])
        ids2 = jnp.array([[1, 2, 3, 4, 99]])
        out1 = np.asarray(tiny_lm(ids1))
        out2 = np.asarray(tiny_lm(ids2))
        np.testing.assert_allclose(out1[0, :4], out2[0, :4], atol=1e-5)
        assert np.abs(out1[0, 4] - out2[0, 4]).max() > 1e-5

    def test_right_padding_does_not_change_prefix(self, tiny_lm):
        ids = jnp.array([[1, 2, 3]])
        padded = jnp.array([[1, 2, 3, 0, 0]])
        mask = jnp.array([[1, 1, 1, 0, 0]])
        out = np.asarray(tiny_lm(ids))
        out_p = np.asarray(tiny_lm(padded, attention_mask=mask))
        np.testing.assert_allclose(out[0], out_p[0, :3], atol=1e-5)

    def test_normalize_last_differs(self, tiny_lm):
        ids = jnp.array([[5, 6, 7]])
        raw = np.asarray(tiny_lm(ids))
        normed = np.asarray(tiny_lm(ids, normalize_last=True))
        assert np.abs(raw - normed).max() > 1e-6

    def test_gqa_head_counts(self, tiny_lm):
        attn = tiny_lm.layers[0].self_attn
        assert attn.heads == 4 and attn.kv_heads == 2
