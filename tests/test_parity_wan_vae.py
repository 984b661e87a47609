"""Numeric parity for the Wan 3D-causal VAE vs the REFERENCE
(`/root/reference/apps/api/src/vae/wan/model.py` AutoencoderKLWan) run as a
torch oracle on CPU — causal conv padding/caching, temporal up/down sampling
and the quant convs all validated end to end through the real "wan_vae"
converter (f64 oracle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    base_dim=8,
    z_dim=4,
    dim_mult=[1, 2],
    num_res_blocks=1,
    attn_scales=[],
    temperal_downsample=[True],
)


@pytest.fixture(scope="module")
def pair():
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.vaes.wan_vae import AutoencoderKLWan, WanVAEConfig

    ref_mod = import_ref_module("src.vae.wan.model")
    torch.manual_seed(0)
    ref = ref_mod.AutoencoderKLWan(**TINY).double().eval()

    cfg = WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                       attn_scales=(), temperal_downsample=(True,))
    model = AutoencoderKLWan(cfg, rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("wan_vae", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:8]}"
    assert not missing, f"params not covered by checkpoint: {missing[:8]}"
    return ref, model


class TestWanVAEParity:
    def test_encode_mode_matches_reference(self, pair):
        ref, model = pair
        rng = np.random.default_rng(0)
        video = rng.uniform(-1, 1, size=(1, 3, 5, 16, 16)).astype(np.float32)

        with torch.no_grad():
            dist = ref.encode(torch.from_numpy(video).double()).latent_dist
            z_ref = dist.mode().float().numpy()

        z = np.asarray(model.encode(jnp.asarray(video)))
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=3e-4, rtol=2e-3)

    def test_decode_matches_reference(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)

        with torch.no_grad():
            out = ref.decode(torch.from_numpy(z).double())
            x_ref = (out.sample if hasattr(out, "sample") else out[0]).float().numpy()

        x = np.asarray(model.decode(jnp.asarray(z)))
        assert x.shape == x_ref.shape
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
