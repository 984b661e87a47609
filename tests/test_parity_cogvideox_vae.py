"""Numeric parity for the CogVideoX causal 3D VAE vs the REFERENCE
(`/root/reference/apps/api/src/vae/cogvideo/model.py` AutoencoderKLCogVideoX)
run as a torch oracle on CPU (f64), weights through the real converter.

This oracle program caught three real bugs: (1) causal convs must pad time by
repeating the FIRST FRAME (pad_mode="first"), not zeros; (2) the decoder's
norms are latent-conditioned CogVideoXSpatialNorm3D, not plain GroupNorm;
(3) the temporal upsampler only exempts frame 0 for odd T."""

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
    from apex_studio_tpu.models.vaes.cogvideox_vae import (
        AutoencoderKLCogVideoX,
        CogVideoXVAEConfig,
    )

    ref_mod = import_ref_module("src.vae.cogvideo.model")
    torch.manual_seed(0)
    ref = ref_mod.AutoencoderKLCogVideoX(
        down_block_types=("CogVideoXDownBlock3D",) * 2,
        up_block_types=("CogVideoXUpBlock3D",) * 2,
        block_out_channels=(8, 16), latent_channels=4, layers_per_block=1,
        norm_num_groups=4, temporal_compression_ratio=2,
    ).double().eval()
    cfg = CogVideoXVAEConfig(latent_channels=4, block_out_channels=(8, 16),
                             layers_per_block=1, norm_num_groups=4,
                             temporal_compression_ratio=2)
    model = AutoencoderKLCogVideoX(cfg, rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapped = convert_keys("cogvideo_vae", sd)
    missing, unexpected = apply_state_dict(model, mapped, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"
    return ref, model


class TestCogVideoXVAEParity:
    def test_encode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(0)
        video = rng.uniform(-1, 1, size=(1, 3, 5, 16, 16)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(
                torch.from_numpy(video).double()).latent_dist.mode().float().numpy()
        z = np.asarray(model.encode(jnp.asarray(video))) / model.cfg.scaling_factor
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=3e-4, rtol=2e-3)

    def test_decode_odd_frames(self, pair):
        """Odd latent T: the reference's frame-batched loop exempts frame 0
        from temporal upsampling — our full-sequence rule must match."""
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 3, 4, 4)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref.decode(torch.from_numpy(z).double()).sample.float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z) * model.cfg.scaling_factor))
        assert x.shape == x_ref.shape
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)

    def test_decode_even_frames(self, pair):
        """Even latent T doubles EVERY frame (no frame-0 exemption)."""
        ref, model = pair
        rng = np.random.default_rng(2)
        z = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref.decode(torch.from_numpy(z).double()).sample.float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z) * model.cfg.scaling_factor))
        assert x.shape == x_ref.shape
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
