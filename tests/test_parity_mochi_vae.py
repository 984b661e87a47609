"""Numeric parity for the Mochi-1 video VAE vs the REFERENCE
(`/root/reference/apps/api/src/vae/mochi/model.py` AutoencoderKLMochi) run as
a torch oracle on CPU (f64), weights through the real converter.

This oracle program drove a full rewrite: per-frame GroupNorm (eps 1e-5),
replicate conv padding, no resnet shortcuts, causal TIME attention in the
encoder, the (c, te, se, se) channel-slowest unshuffle, the missing
block_out/proj_out decoder tail, the end-of-decode (not per-block) phantom
frame crop — and the encoder itself, which was previously NotImplementedError."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

LAT_MEAN = tuple(float(x) for x in np.linspace(-0.1, 0.1, 4))
LAT_STD = tuple(float(x) for x in np.linspace(0.9, 1.1, 4))


@pytest.fixture(scope="module")
def pair():
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.vaes.mochi_vae import (
        AutoencoderKLMochi,
        MochiVAEConfig,
    )

    ref_mod = import_ref_module("src.vae.mochi.model")
    torch.manual_seed(0)
    ref = ref_mod.AutoencoderKLMochi(
        in_channels=15, out_channels=3,
        encoder_block_out_channels=(32, 32, 64, 64),
        decoder_block_out_channels=(32, 32, 64, 64),
        latent_channels=4, layers_per_block=(1, 1, 1, 2, 1),
        temporal_expansions=(1, 2, 3), spatial_expansions=(2, 2, 2),
        add_attention_block=(False, True, True, True, True),
        latents_mean=LAT_MEAN, latents_std=LAT_STD,
    ).double().eval()
    cfg = MochiVAEConfig(
        latent_channels=4,
        encoder_block_out_channels=(32, 32, 64, 64),
        block_out_channels=(32, 32, 64, 64),
        layers_per_block=(1, 1, 1, 2, 1),
        temporal_expansions=(1, 2, 3), spatial_expansions=(2, 2, 2),
        add_attention_block=(False, True, True, True, True),
        latents_mean=LAT_MEAN, latents_std=LAT_STD,
    )
    model = AutoencoderKLMochi(cfg, rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapped = convert_keys("mochi_vae", sd)
    missing, unexpected = apply_state_dict(model, mapped, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"
    return ref, model


class TestMochiVAEParity:
    def test_encode(self, pair):
        """Fourier features → attended causal encoder → moments; ours returns
        (mean − latents_mean)/latents_std model-space latents."""
        ref, model = pair
        rng = np.random.default_rng(0)
        video = rng.uniform(-1, 1, size=(1, 3, 7, 16, 16)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(
                torch.from_numpy(video).double()).latent_dist.mode().float().numpy()
        m = np.asarray(LAT_MEAN).reshape(1, -1, 1, 1, 1)
        s = np.asarray(LAT_STD).reshape(1, -1, 1, 1, 1)
        z = np.asarray(model.encode(jnp.asarray(video))) * s + m
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=3e-4, rtol=2e-3)

    def test_decode(self, pair):
        """6× temporal expansion with the end-of-decode phantom-frame crop:
        2 latent frames → 12 upscaled → drop 5 → 7 output frames."""
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 2, 2, 2)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref.decode(torch.from_numpy(z).double()).sample.float().numpy()
        m = np.asarray(LAT_MEAN).reshape(1, -1, 1, 1, 1)
        s = np.asarray(LAT_STD).reshape(1, -1, 1, 1, 1)
        x = np.asarray(model.decode((jnp.asarray(z) - m) / s))
        assert x.shape == x_ref.shape == (1, 3, 7, 16, 16)
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
