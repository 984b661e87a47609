"""Numeric parity for the HunyuanImage-2.1 32x DC-AE image VAE vs the
REFERENCE (`/root/reference/apps/api/src/vae/hunyuanimage/model.py`
AutoencoderKLHunyuanImage) run as a torch oracle on CPU (f64), weights
through the real converter. Covers the 2D DC-AE pixel shuffles with
group-mean/repeat shortcuts and the attention mid block."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module


@pytest.fixture(scope="module")
def pair():
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.vaes.hunyuanimage_vae import (
        AutoencoderKLHunyuanImage,
        HunyuanImageVAEConfig,
    )

    ref_mod = import_ref_module("src.vae.hunyuanimage.model")
    torch.manual_seed(0)
    ref = ref_mod.AutoencoderKLHunyuanImage(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(32, 32, 64), layers_per_block=1,
        spatial_compression_ratio=4, sample_size=64,
    ).double().eval()
    cfg = HunyuanImageVAEConfig(latent_channels=4,
                                block_out_channels=(32, 32, 64),
                                layers_per_block=1,
                                spatial_compression_ratio=4, sample_size=64)
    model = AutoencoderKLHunyuanImage(cfg, rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapped = convert_keys("hunyuanimage_vae", sd)
    missing, unexpected = apply_state_dict(model, mapped, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"
    return ref, model


class TestHunyuanImageVAEParity:
    def test_encode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(0)
        img = rng.uniform(-1, 1, size=(1, 3, 16, 16)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(
                torch.from_numpy(img).double()).latent_dist.mode().float().numpy()
        z = np.asarray(model.encode(jnp.asarray(img))) / model.cfg.scaling_factor
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=3e-4, rtol=2e-3)

    def test_decode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref.decode(torch.from_numpy(z).double()).sample.float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z) * model.cfg.scaling_factor))
        assert x.shape == x_ref.shape
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
