"""Numeric parity for the LTX-2 causal video VAE vs the REFERENCE
(`/root/reference/apps/api/src/vae/ltx2/model.py` AutoencoderKLLTX2Video)
run as a torch oracle on CPU (f64), weights through the real converter.

This oracle caught two real structure bugs: the encoder's conv_in outputs
LATENT width (the first down block widens from there, model.py:742), and the
decoder consumes its per-block layer/inject-noise lists REVERSED (mid takes
the last entries, model.py:888-928)."""

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
    from apex_studio_tpu.models.vaes.ltx2_vae import (
        AutoencoderKLLTX2,
        LTX2VAEConfig,
    )

    ref_mod = import_ref_module("src.vae.ltx2.model")
    torch.manual_seed(0)
    ref = ref_mod.AutoencoderKLLTX2Video(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("LTX2VideoDownBlock3D",) * 2,
        decoder_block_out_channels=(8, 16),
        layers_per_block=(1, 1, 1), decoder_layers_per_block=(1, 1, 1),
        spatio_temporal_scaling=(True, True),
        decoder_spatio_temporal_scaling=(True, True),
        decoder_inject_noise=(False, False, False),
        downsample_type=("spatial", "spatiotemporal"),
        upsample_residual=(True, True), upsample_factor=(2, 2),
        patch_size=2, patch_size_t=1,
        encoder_causal=True, decoder_causal=True,
    ).double().eval()
    cfg = LTX2VAEConfig(
        latent_channels=4, block_out_channels=(8, 16),
        decoder_block_out_channels=(8, 16),
        layers_per_block=(1, 1, 1), decoder_layers_per_block=(1, 1, 1),
        spatio_temporal_scaling=(True, True),
        decoder_spatio_temporal_scaling=(True, True),
        decoder_inject_noise=(False, False, False),
        downsample_type=("spatial", "spatiotemporal"),
        upsample_residual=(True, True), upsample_factor=(2, 2),
        patch_size=2, patch_size_t=1,
    )
    model = AutoencoderKLLTX2(cfg, rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapped = convert_keys("ltx2_vae", sd)
    missing, unexpected = apply_state_dict(model, mapped, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"
    return ref, model


class TestLTX2VAEParity:
    def test_encode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(0)
        video = rng.uniform(-1, 1, size=(1, 3, 5, 16, 16)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(
                torch.from_numpy(video).double()).latent_dist.mode().float().numpy()
        z = np.asarray(model.encode(jnp.asarray(video)))
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=3e-4, rtol=2e-3)

    def test_decode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 3, 2, 2)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref.decode(torch.from_numpy(z).double()).sample.float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z)))
        assert x.shape == x_ref.shape
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
