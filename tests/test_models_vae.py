import numpy as np
import pytest

import jax
import jax.numpy as jnp

from apex_studio_tpu.models.vaes.autoencoder_kl import AutoencoderKL, AutoencoderKLConfig


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = AutoencoderKLConfig(
        latent_channels=4,
        block_out_channels=(8, 16),
        layers_per_block=1,
        norm_num_groups=4,
        scaling_factor=0.5,
        shift_factor=0.1,
    )
    return AutoencoderKL(cfg)


class TestAutoencoderKL:
    def test_encode_shape(self, tiny_vae):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
        z = tiny_vae.encode(x)
        # 2 blocks → one downsample → spatial /2
        assert z.shape == (1, 4, 16, 16)

    def test_decode_shape(self, tiny_vae):
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16))
        img = tiny_vae.decode(z)
        assert img.shape == (1, 3, 32, 32)

    def test_moments_split(self, tiny_vae):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
        m = tiny_vae.encode_moments(x)
        assert m.shape == (1, 8, 16, 16)

    def test_scaling_shift_roundtrip_contract(self, tiny_vae):
        # encode applies (z - shift) * scale; decode must invert before convs.
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
        z = tiny_vae.encode(x)
        raw_mean = jnp.split(tiny_vae.encode_moments(x), 2, axis=1)[0]
        np.testing.assert_allclose(
            np.asarray(z),
            (np.asarray(raw_mean) - 0.1) * 0.5,
            atol=1e-5,
        )

    def test_finite(self, tiny_vae):
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
        assert np.isfinite(np.asarray(tiny_vae.decode(z))).all()

    def test_spatial_scale_property(self, tiny_vae):
        assert tiny_vae.cfg.spatial_scale == 2

    def test_config_from_dict(self):
        cfg = AutoencoderKLConfig.from_dict(
            {"block_out_channels": [128, 256, 512, 512], "latent_channels": 16, "_class": "x"}
        )
        assert cfg.spatial_scale == 8
