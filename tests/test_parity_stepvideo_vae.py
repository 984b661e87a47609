"""Numeric parity for the StepVideo causal VAE vs the REFERENCE
(`/root/reference/apps/api/src/vae/stepvideo/model.py` AutoencoderKL) run as
a torch oracle on CPU (f64), weights through the (previously missing)
stepvideo_vae converter — the stepvideo DiT converter used to swallow the
VAE's keys, so real checkpoints could never load. Covers the zero-pad
group-norm + causal convs, 2D/3D down/upsamplers, causal full attention, and
the decoder's leading phantom-frame crop."""

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
    from apex_studio_tpu.models.vaes.stepvideo_vae import (
        StepVideoVAE,
        StepVideoVAEConfig,
    )

    ref_mod = import_ref_module("src.vae.stepvideo.model")
    torch.manual_seed(0)
    # GroupNorm(32) floors channel widths at 32
    ref = ref_mod.AutoencoderKL(
        z_channels=32, encoder_ch=32, encoder_z_channels=32,
        encoder_ch_mult=(1, 1, 2, 2), decoder_ch=32,
        decoder_ch_mult=(1, 1, 2, 2), version=1,
    ).double().eval()
    cfg = StepVideoVAEConfig(z_channels=32, encoder_ch=32,
                             encoder_ch_mult=(1, 1, 2, 2), decoder_ch=32,
                             decoder_ch_mult=(1, 1, 2, 2), version=1)
    model = StepVideoVAE(cfg, rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapped = convert_keys("stepvideo_vae", sd)
    missing, unexpected = apply_state_dict(model, mapped, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"
    return ref, model


class TestStepVideoVAEParity:
    def test_encode(self, pair):
        """17-frame chunk → 5 latent frames (naive_encode path; the engine
        owns the 17-frame chunk loop)."""
        ref, model = pair
        rng = np.random.default_rng(0)
        video = rng.uniform(-1, 1, size=(1, 3, 17, 32, 32)).astype(np.float32)
        with torch.no_grad():
            # the reference's naive_encode takes [b, frames, c, h, w]
            z_ref = ref.naive_encode(
                torch.from_numpy(video.transpose(0, 2, 1, 3, 4)).double(),
                True).float().numpy().transpose(0, 2, 1, 3, 4)
        mean_ref = z_ref[:, :32]
        z = np.asarray(model.encode(jnp.asarray(video))) / model.cfg.scaling_factor
        assert z.shape == mean_ref.shape
        np.testing.assert_allclose(z, mean_ref, atol=3e-4, rtol=2e-3)

    def test_decode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 32, 5, 4, 4)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref.decode_naive(
                torch.from_numpy(z.transpose(0, 2, 1, 3, 4)).double(),
                True).float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z) * model.cfg.scaling_factor))
        assert x.shape == x_ref.shape == (1, 3, 17, 32, 32)
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
