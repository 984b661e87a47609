"""Numeric parity for the LTX-Video causal VAE vs the REFERENCE
(`/root/reference/apps/api/src/vae/ltx/model.py` AutoencoderKLLTXVideo built
via from_config) run as a torch oracle on CPU (f64), weights through the real
converter. Exercises pixel-norm blocks, patchify (p=2), compress_all_res
space-to-depth downsampling, the residual depth-to-space upsampler, and
timestep-conditioned decoding."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

ENC_BLOCKS = [("res_x", {"num_layers": 1}),
              ("compress_all_res", {"multiplier": 2}),
              ("res_x", {"num_layers": 1})]
DEC_BLOCKS = [("res_x", {"num_layers": 1, "inject_noise": False}),
              ("compress_all", {"residual": True, "multiplier": 2}),
              ("res_x", {"num_layers": 1, "inject_noise": False})]


@pytest.fixture(scope="module")
def pair():
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.vaes.ltx_vae import AutoencoderKLLTX, LTXVAEConfig

    ref_mod = import_ref_module("src.vae.ltx.model")
    torch.manual_seed(0)
    ref = ref_mod.AutoencoderKLLTXVideo.from_config(dict(
        dims=3, in_channels=3, out_channels=3, latent_channels=4,
        encoder_blocks=[[n, dict(kw)] for n, kw in ENC_BLOCKS],
        decoder_blocks=[[n, dict(kw)] for n, kw in DEC_BLOCKS],
        patch_size=2, norm_layer="pixel_norm", latent_log_var="uniform",
        use_quant_conv=False, causal_decoder=False, timestep_conditioning=True,
        encoder_base_channels=16, decoder_base_channels=16,
        spatial_padding_mode="zeros",
    )).double().eval()
    cfg = LTXVAEConfig(
        latent_channels=4, base_channels=16, decoder_base_channels=16,
        patch_size=2, norm_layer="pixel_norm",
        encoder_blocks=list(ENC_BLOCKS), decoder_blocks=list(DEC_BLOCKS),
        latent_log_var="uniform", causal_decoder=False,
        timestep_conditioning=True,
    )
    model = AutoencoderKLLTX(cfg, rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mapped = convert_keys("ltx_vae", sd)
    missing, unexpected = apply_state_dict(model, mapped, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    # per-channel statistics ride real checkpoints only (identity at init)
    assert set(missing) <= {"mean_of_means", "std_of_means"}, missing
    return ref, model


class TestLTXVAEParity:
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

    def test_decode_with_timestep(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 3, 4, 4)).astype(np.float32)
        with torch.no_grad():
            x_ref = ref.decode(
                torch.from_numpy(z).double(),
                timestep=torch.tensor([0.05], dtype=torch.float64),
            ).sample.float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z),
                                    timestep=jnp.asarray([0.05], jnp.float32)))
        assert x.shape == x_ref.shape
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)
