"""Numeric parity for the MAGI-1 ViT video VAE vs the REFERENCE
(`/root/reference/apps/api/src/vae/magi/model.py` AutoencoderKLMagi) run as a
torch oracle on CPU (f64), weights through the real converter.

This oracle caught two real bugs: torch nn.LayerNorm eps is 1e-5 (ours
defaulted 1e-6), and the trilinear pos-embed resize must NOT antialias
(torch F.interpolate doesn't; jax.image.resize defaults antialias=True)."""

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
    from apex_studio_tpu.models.vaes.magi_vae import (
        AutoencoderKLMagi,
        MagiVAEConfig,
    )

    ref_mod = import_ref_module("src.vae.magi.model")
    torch.manual_seed(0)
    dd = dict(video_size=32, video_length=8, patch_size=4, patch_length=2,
              in_chans=3, z_chans=4, double_z=True, embed_dim=32, depth=2,
              num_heads=2, mlp_ratio=4.0, qkv_bias=False, with_cls_token=True,
              use_final_proj=True, conv_last_layer=True)
    ref = ref_mod.AutoencoderKLMagi(ddconfig=dd).double().eval()
    ref.tiling_enabled = False
    cfg = MagiVAEConfig(video_size=32, video_length=8, patch_size=4,
                        patch_length=2, z_chans=4, embed_dim=32, depth=2,
                        num_heads=2, with_cls_token=True, use_final_proj=True)
    model = AutoencoderKLMagi(cfg, rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapped = convert_keys("magi_vae", sd)
    missing, unexpected = apply_state_dict(model, mapped, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"
    return ref, model


class TestMagiVAEParity:
    def test_encode_configured_grid(self, pair):
        ref, model = pair
        rng = np.random.default_rng(0)
        video = rng.uniform(-1, 1, size=(1, 3, 8, 32, 32)).astype(np.float32)
        with torch.no_grad():
            moments = ref._encode(torch.from_numpy(video).double()).float().numpy()
        z = np.asarray(model.encode(jnp.asarray(video)))
        np.testing.assert_allclose(z, moments[:, :4], atol=3e-4, rtol=2e-3)

    def test_encode_resized_grid(self, pair):
        """Off-grid inputs exercise the trilinear (non-antialiased)
        pos-embed resize."""
        ref, model = pair
        rng = np.random.default_rng(1)
        video = rng.uniform(-1, 1, size=(1, 3, 4, 16, 16)).astype(np.float32)
        with torch.no_grad():
            moments = ref._encode(torch.from_numpy(video).double()).float().numpy()
        z = np.asarray(model.encode(jnp.asarray(video)))
        np.testing.assert_allclose(z, moments[:, :4], atol=3e-4, rtol=2e-3)

    def test_decode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(2)
        z = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref._decode(torch.from_numpy(z).double()).float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z)))
        assert x.shape == x_ref.shape == (1, 3, 4, 16, 16)
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
