"""Numeric parity for video VAEs vs the REFERENCE implementations
(`/root/reference/apps/api/src/vae/*/model.py`) run as torch oracles on CPU
(f64, diffusers shim), with weights flowing through the real converters.
Covers causal-conv padding, temporal down/up sampling and the quant heads —
the layouts real checkpoints bake in. (The Wan VAE has its own file:
tests/test_parity_wan_vae.py.)"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module


def _load(model, family, ref):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys(family, sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"unknown keys: {unexpected[:8]}"
    assert not missing, f"uncovered params: {missing[:8]}"


class TestHYV15VAEParity:
    """The benchmark family's DC-AE (16x spatial / 4x temporal, 32ch)."""

    @pytest.fixture(scope="class")
    def pair(self):
        from apex_studio_tpu.models.vaes.hunyuanvideo15_vae import (
            AutoencoderKLHunyuanVideo15,
            HYV15VAEConfig,
        )

        ref_mod = import_ref_module("src.vae.hunyuanvideo15.model")
        torch.manual_seed(0)
        ref = ref_mod.AutoencoderKLHunyuanVideo15(
            latent_channels=4, block_out_channels=(8, 8, 16),
            layers_per_block=1, spatial_compression_ratio=4,
            temporal_compression_ratio=4,
        ).double().eval()
        cfg = HYV15VAEConfig(latent_channels=4, block_out_channels=(8, 8, 16),
                             layers_per_block=1, spatial_compression_ratio=4,
                             temporal_compression_ratio=4)
        model = AutoencoderKLHunyuanVideo15(cfg, rngs=nnx.Rngs(0))
        _load(model, "hunyuanvideo15_vae", ref)
        return ref, model

    def test_encode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(0)
        video = rng.uniform(-1, 1, size=(1, 3, 5, 16, 16)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(
                torch.from_numpy(video).double()).latent_dist.mode().float().numpy()
        # ours returns MODEL-space latents (x scaling_factor) per the engine
        # contract; the reference leaves scaling to the pipeline
        z = np.asarray(model.encode(jnp.asarray(video))) / model.cfg.scaling_factor
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=3e-4, rtol=2e-3)

    def test_decode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
        with torch.no_grad():
            out = ref.decode(torch.from_numpy(z).double())
            x_ref = (out.sample if hasattr(out, "sample") else out[0]).float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z) * model.cfg.scaling_factor))
        assert x.shape == x_ref.shape
        np.testing.assert_allclose(x, x_ref, atol=3e-4, rtol=2e-3)


class TestHunyuanVideoVAEParity:
    @pytest.fixture(scope="class")
    def pair(self):
        from apex_studio_tpu.models.vaes.hunyuanvideo_vae import (
            AutoencoderKLHunyuanVideo,
            HunyuanVideoVAEConfig,
        )

        ref_mod = import_ref_module("src.vae.hunyuanvideo.model")
        torch.manual_seed(0)
        ref = ref_mod.AutoencoderKLHunyuanVideo(
            latent_channels=4,
            block_out_channels=(8, 8, 16, 16),
            layers_per_block=1, norm_num_groups=4,
        ).double().eval()
        cfg = HunyuanVideoVAEConfig(latent_channels=4,
                                    block_out_channels=(8, 8, 16, 16),
                                    layers_per_block=1, norm_num_groups=4)
        model = AutoencoderKLHunyuanVideo(cfg, rngs=nnx.Rngs(0))
        _load(model, "hunyuanvideo_vae", ref)
        return ref, model

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

    def test_decode(self, pair):
        ref, model = pair
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 2, 2, 2)).astype(np.float32)
        with torch.no_grad():
            out = ref.decode(torch.from_numpy(z).double())
            x_ref = (out.sample if hasattr(out, "sample") else out[0]).float().numpy()
        x = np.asarray(model.decode(jnp.asarray(z) * model.cfg.scaling_factor))
        assert x.shape == x_ref.shape
        # ours clips decode output to [-1,1] (the pixel conversion clips
        # anyway); compare in clipped space
        np.testing.assert_allclose(x, np.clip(x_ref, -1.0, 1.0),
                                   atol=3e-4, rtol=2e-3)


class TestQwenImageVAEParity:
    """Qwen-Image ships the Wan VAE architecture; the manifests alias it onto
    our AutoencoderKLWan — validate that substitution against the reference's
    own AutoencoderKLQwenImage."""

    def test_encode_decode(self):
        from apex_studio_tpu.models.vaes.wan_vae import AutoencoderKLWan, WanVAEConfig

        ref_mod = import_ref_module("src.vae.qwenimage.model")
        torch.manual_seed(0)
        ref = ref_mod.AutoencoderKLQwenImage(
            base_dim=8, z_dim=4, dim_mult=[1, 2], num_res_blocks=1,
            attn_scales=[], temperal_downsample=[True],
        ).double().eval()
        cfg = WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2),
                           num_res_blocks=1, attn_scales=(),
                           temperal_downsample=(True,))
        model = AutoencoderKLWan(cfg, rngs=nnx.Rngs(0))
        _load(model, "wan_vae", ref)

        rng = np.random.default_rng(0)
        video = rng.uniform(-1, 1, size=(1, 3, 5, 16, 16)).astype(np.float32)
        with torch.no_grad():
            z_ref = ref.encode(
                torch.from_numpy(video).double()).latent_dist.mode().float().numpy()
        z = np.asarray(model.encode(jnp.asarray(video)))
        np.testing.assert_allclose(z, z_ref, atol=3e-4, rtol=2e-3)
