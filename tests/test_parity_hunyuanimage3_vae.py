"""Numeric parity for the HunyuanImage-3.0 3D-conv DC-AE VAE vs the
REFERENCE (`/root/reference/apps/api/src/vae/hunyuanimage3/model.py`
AutoencoderKLConv3D) run as a torch oracle on CPU (f64), with weights
flowing through the real converter. Covers the DC-AE pixel shuffles with
group-mean/repeat shortcuts, the encoder/decoder end shortcuts, the
single-head 3D attention, and the image (T=1) expand/last-frame rules."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module


def _load(model, ref):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("hunyuanimage3_vae", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"


@pytest.fixture(scope="module")
def pair():
    from apex_studio_tpu.models.vaes.hunyuanimage3_vae import (
        AutoencoderKLConv3D,
        HunyuanImage3VAEConfig,
    )

    ref_mod = import_ref_module("src.vae.hunyuanimage3.model")
    torch.manual_seed(0)
    # channels must be multiples of 32 (the reference hardcodes
    # GroupNorm(num_groups=32), model.py:176).
    ref = ref_mod.AutoencoderKLConv3D(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(32, 32, 64), layers_per_block=1,
        ffactor_spatial=4, ffactor_temporal=2,
        sample_size=32, sample_tsize=8,
    ).double().eval()
    cfg = HunyuanImage3VAEConfig(
        latent_channels=4, block_out_channels=(32, 32, 64),
        layers_per_block=1, ffactor_spatial=4, ffactor_temporal=2,
        sample_size=32, sample_tsize=8,
    )
    model = AutoencoderKLConv3D(cfg, rngs=nnx.Rngs(0))
    _load(model, ref)
    return ref, model


class TestHunyuanImage3VAEParity:
    def test_encode_video(self, pair):
        ref, model = pair
        rng = np.random.default_rng(0)
        video = rng.uniform(-1, 1, size=(1, 3, 4, 16, 16)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(
                torch.from_numpy(video).double()).latent_dist.mode().float().numpy()
        z = np.asarray(model.encode(jnp.asarray(video)))
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=3e-4, rtol=2e-3)

    def test_decode_video(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref.decode(torch.from_numpy(z).double()).sample.float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z)))
        assert x.shape == x_ref.shape
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)

    def test_image_roundtrip_semantics(self, pair):
        """T=1 images expand to ffactor_temporal frames on encode
        (reference encode:849-850) and keep only the LAST frame on a T=1
        decode (decode:897-898)."""
        ref, model = pair
        rng = np.random.default_rng(2)
        img = rng.uniform(-1, 1, size=(1, 3, 16, 16)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(
                torch.from_numpy(img).double()).latent_dist.mode().float().numpy()
        z = np.asarray(model.encode(jnp.asarray(img)))
        # ours returns 4D latents for 4D input; the oracle keeps T
        assert z.shape == z_ref[:, :, 0].shape or z.shape == z_ref.shape[:2] + z_ref.shape[3:]
        np.testing.assert_allclose(z, z_ref[:, :, 0], atol=3e-4, rtol=2e-3)

        zt = z_ref[:, :, :1]
        with torch.no_grad():
            x_ref = ref.decode(torch.from_numpy(zt).double()).sample.float().numpy()
        assert x_ref.shape[2] == 1  # oracle keeps only the last frame
        x = np.asarray(model.decode(jnp.asarray(zt)))
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
