import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.transformers.zimage import ZImageConfig, ZImageTransformer2DModel


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ZImageConfig(
        dim=64,
        n_layers=2,
        n_refiner_layers=1,
        n_heads=2,
        n_kv_heads=2,
        in_channels=4,
        cap_feat_dim=48,
        axes_dims=(8, 12, 12),
        axes_lens=(64, 32, 32),
    )
    return ZImageTransformer2DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)


def tiny_inputs(cfg, b=1, h=16, w=16, lc=32, seed=0):
    kx, kc, kt = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(kx, (b, cfg.in_channels, 1, h, w), jnp.float32)
    cap = jax.random.normal(kc, (b, lc, cfg.cap_feat_dim), jnp.float32)
    t = jax.random.uniform(kt, (b,))
    mask = jnp.ones((b, lc), bool)
    return x, t, cap, mask


class TestZImageForward:
    def test_output_shape_matches_input(self, tiny_model):
        x, t, cap, mask = tiny_inputs(tiny_model.cfg)
        out = tiny_model(x, t, cap, mask)
        assert out.shape == x.shape

    def test_deterministic(self, tiny_model):
        x, t, cap, mask = tiny_inputs(tiny_model.cfg)
        a = tiny_model(x, t, cap, mask)
        b = tiny_model(x, t, cap, mask)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_caption_changes_output(self, tiny_model):
        x, t, cap, mask = tiny_inputs(tiny_model.cfg)
        out1 = tiny_model(x, t, cap, mask)
        out2 = tiny_model(x, t, cap * 2.0 + 1.0, mask)
        assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4

    def test_timestep_changes_output(self, tiny_model):
        x, t, cap, mask = tiny_inputs(tiny_model.cfg)
        out1 = tiny_model(x, jnp.zeros_like(t), cap, mask)
        out2 = tiny_model(x, jnp.ones_like(t), cap, mask)
        assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4

    def test_non_square_and_nonmultiple32_tokens(self, tiny_model):
        # 24x16 latents → 12*8=96 tokens (multiple of 32); 20x12 → 60 tokens → pads to 64.
        x, t, cap, mask = tiny_inputs(tiny_model.cfg, h=20, w=12)
        out = tiny_model(x, t, cap, mask)
        assert out.shape == x.shape

    def test_jit_compiles_once_per_shape(self, tiny_model):
        model = tiny_model
        graphdef, state = nnx.split(model)
        calls = {"n": 0}

        @jax.jit
        def step(state, x, t, cap, mask):
            calls["n"] += 1
            m = nnx.merge(graphdef, state)
            return m(x, t, cap, mask)

        x, t, cap, mask = tiny_inputs(model.cfg)
        step(state, x, t, cap, mask)
        step(state, x, t + 0.1, cap, mask)
        assert calls["n"] == 1  # retrace would increment

    def test_patchify_roundtrip(self, tiny_model):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 1, 8, 8))
        tokens = tiny_model.patchify(x)
        back = tiny_model.unpatchify(tokens, 1, 8, 8)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)

    def test_pad_token_slots_do_not_leak_nans(self, tiny_model):
        x, t, cap, mask = tiny_inputs(tiny_model.cfg, h=20, w=12)
        out = np.asarray(tiny_model(x, t, cap, mask))
        assert np.isfinite(out).all()


class TestZImageConfig:
    def test_from_dict_reference_keys(self):
        cfg = ZImageConfig.from_dict(
            {
                "all_patch_size": [2],
                "all_f_patch_size": [1],
                "dim": 128,
                "n_layers": 4,
                "n_heads": 4,
                "n_kv_heads": 4,
                "axes_dims": [8, 12, 12],
                "axes_lens": [64, 32, 32],
                "cap_feat_dim": 96,
                "unknown_key": True,
            }
        )
        assert cfg.patch_size == 2 and cfg.dim == 128
        assert cfg.axes_dims == (8, 12, 12)
