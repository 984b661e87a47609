"""Numeric parity for the 2D AutoencoderKL (flux/zimage/hidream/… image
families decode through it) vs the REFERENCE (`/root/reference/apps/api/src/
vae/auto/model.py` AutoencoderKL) run as a torch oracle on CPU (f64). The
shim supplies diffusers' 2D Encoder/Decoder blocks (tests/ref_oracle_vae2d.py);
the AutoencoderKL wrapper logic under test is the reference's own."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests import ref_oracle_vae2d
from tests.ref_oracle import import_ref_module


@pytest.fixture(scope="module")
def pair():
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.vaes.autoencoder_kl import (
        AutoencoderKL,
        AutoencoderKLConfig,
    )

    ref_oracle_vae2d.install()
    ref_mod = import_ref_module("src.vae.auto.model")
    torch.manual_seed(0)
    ref = ref_mod.AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        down_block_types=("DownEncoderBlock2D",) * 3,
        up_block_types=("UpDecoderBlock2D",) * 3,
        block_out_channels=(8, 8, 16), layers_per_block=1, norm_num_groups=4,
        use_quant_conv=False, use_post_quant_conv=False,
        shift_factor=0.1159, scaling_factor=0.3611,
    ).double().eval()
    cfg = AutoencoderKLConfig(latent_channels=4, block_out_channels=(8, 8, 16),
                              layers_per_block=1, norm_num_groups=4,
                              use_quant_conv=False, use_post_quant_conv=False)
    model = AutoencoderKL(cfg, rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("autoencoder_kl", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"
    return ref, model


class TestAutoencoderKLParity:
    def test_encode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(0)
        img = rng.uniform(-1, 1, size=(1, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(
                torch.from_numpy(img).double()).latent_dist.mode().float().numpy()
        # ours returns model-space latents ((z - shift) * scale)
        z = np.asarray(model.encode(jnp.asarray(img)))
        z = z / model.cfg.scaling_factor + model.cfg.shift_factor
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=3e-4, rtol=2e-3)

    def test_decode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
        with torch.no_grad():
            out = ref.decode(torch.from_numpy(z).double())
            x_ref = (out.sample if hasattr(out, "sample") else out[0]).float().numpy()
        zs = (jnp.asarray(z) - model.cfg.shift_factor) * model.cfg.scaling_factor
        x = np.asarray(model.decode(zs))
        assert x.shape == x_ref.shape
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
