"""Numeric parity for the LTX-2 audio (mel) VAE vs the REFERENCE
(`/root/reference/apps/api/src/vae/ltx2audio/model.py` AutoencoderKLLTX2Audio)
run as a torch oracle on CPU (f64), weights through the real converter.

The oracle fixed the decode contract: the reference crops/zero-pads the
decoder output to T'·4−3 frames × mel_bins regardless of how far ch_mult
actually upsamples (model.py:753-779)."""

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
    from apex_studio_tpu.models.vaes.ltx2_audio_vae import (
        AutoencoderKLLTX2Audio,
        LTX2AudioVAEConfig,
    )

    ref_mod = import_ref_module("src.vae.ltx2audio.model")
    torch.manual_seed(0)
    ref = ref_mod.AutoencoderKLLTX2Audio(
        base_channels=8, ch_mult=(1, 2), num_res_blocks=1,
        latent_channels=4, mel_bins=16,
    ).double().eval()
    cfg = LTX2AudioVAEConfig(base_channels=8, ch_mult=(1, 2),
                             num_res_blocks=1, latent_channels=4, mel_bins=16)
    model = AutoencoderKLLTX2Audio(cfg, rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapped = convert_keys("ltx2_audio_vae", sd)
    missing, unexpected = apply_state_dict(model, mapped, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"
    return ref, model


class TestLTX2AudioVAEParity:
    def test_encode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(0)
        mel = rng.uniform(-1, 1, size=(1, 2, 9, 16)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(
                torch.from_numpy(mel).double()).latent_dist.mode().float().numpy()
        z = np.asarray(model.encode(jnp.asarray(mel)))
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=3e-4, rtol=2e-3)

    def test_decode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 5, 8)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref.decode(torch.from_numpy(z).double()).sample.float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z)))
        assert x.shape == x_ref.shape == (1, 2, 17, 16)
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
