"""Numeric parity for the MMAudio 1D mel VAE vs the REFERENCE
(`/root/reference/apps/api/src/vae/mmaudio/autoencoder/vae.py` VAE) run as a
torch oracle on CPU (f32 — its MPConv weight-norm forces float32), weights
through the real converter from the UNBAKED (pre-remove_weight_norm)
checkpoint layout.

This oracle caught two real bugs: edm2's normalize divides by
eps + ||x||/sqrt(N) (an RMS norm — `torch.add(eps, norm, alpha=sqrt(1/N))`),
not by the raw L2 norm; and the attention qkv rows are per-channel
[q_i|k_i|v_i] triplets, not [all-q|all-k|all-v] blocks."""

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
    from apex_studio_tpu.models.vaes.mmaudio_vae import (
        AutoencoderMMAudio,
        MMAudioVAEConfig,
    )

    vae_mod = import_ref_module("src.vae.mmaudio.autoencoder.vae")
    torch.manual_seed(0)
    ref = vae_mod.VAE(data_dim=80, embed_dim=4, hidden_dim=8).float().eval()
    # real checkpoints store the raw weights; the reference bakes the weight
    # norm at load (remove_weight_norm) while ours normalizes functionally
    sd = {("tod.vae." + k): v.detach().numpy().copy()
          for k, v in ref.state_dict().items()}
    ref.remove_weight_norm()
    cfg = MMAudioVAEConfig(data_dim=80, embed_dim=4, hidden_dim=8,
                           with_vocoder=False)
    model = AutoencoderMMAudio(cfg, rngs=nnx.Rngs(0))
    mapped = convert_keys("mmaudio_vae", sd)
    missing, unexpected = apply_state_dict(model, mapped, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"
    return ref, model


class TestMMAudioVAEParity:
    def test_encode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(0)
        mel = rng.uniform(-1, 1, size=(1, 80, 16)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(torch.from_numpy(mel)).mode().numpy()
        z = np.asarray(model.encode_mel(jnp.asarray(mel)))
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=1e-3, rtol=5e-3)

    def test_decode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 8)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref.decode(torch.from_numpy(z)).numpy()
        x = np.asarray(model.decode_mel(jnp.asarray(z)))
        assert x.shape == x_ref.shape == (1, 80, 16)
        np.testing.assert_allclose(x, x_ref, atol=1e-3, rtol=5e-3)
