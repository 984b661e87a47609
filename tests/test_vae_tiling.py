import numpy as np
import pytest

import jax
import jax.numpy as jnp

from apex_studio_tpu.models.vaes.autoencoder_kl import AutoencoderKL, AutoencoderKLConfig


@pytest.fixture(scope="module")
def vae():
    cfg = AutoencoderKLConfig(
        latent_channels=4,
        block_out_channels=(8, 16),
        layers_per_block=1,
        norm_num_groups=4,
        scaling_factor=1.0,
        shift_factor=None,
    )
    return AutoencoderKL(cfg)


class TestTiledDecode:
    def test_small_input_passthrough(self, vae):
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
        a = np.asarray(vae.decode(z))
        b = np.asarray(vae.decode_tiled(z, tile=32))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_tiled_close_to_full(self, vae):
        """Tiling with blending must approximate the full decode (boundary
        receptive-field effects only)."""
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 48, 48))
        full = np.asarray(vae.decode(z))
        tiled = np.asarray(vae.decode_tiled(z, tile=24, overlap=8))
        assert tiled.shape == full.shape
        # interiors match closely; seams blend smoothly
        diff = np.abs(tiled - full)
        assert np.median(diff) < 0.05
        assert np.isfinite(tiled).all()

    def test_non_divisible_shapes(self, vae):
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 39, 27))
        out = vae.decode_tiled(z, tile=24, overlap=8)
        assert out.shape == (1, 3, 39 * 2, 27 * 2)
        assert np.isfinite(np.asarray(out)).all()
