"""Full-model numeric parity for the LTX-Video DiT vs the REFERENCE
transformer (`/root/reference/apps/api/src/transformer/ltx/base/model.py`)
run as a torch oracle on CPU (diffusers shim, f64 — see test_parity_wan_dit).

Both sides receive the same explicit video_coords [B, 3, S], exercising the
exponential-spacing rope, qk rms-norm, single_scale_shift adaptive norm and
the scale_shift_table output head."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY_REF = dict(
    num_attention_heads=2,
    attention_head_dim=16,
    in_channels=8,
    out_channels=8,
    num_layers=2,
    cross_attention_dim=32,
    caption_channels=24,
    qk_norm="rms_norm",
    activation_fn="gelu-approximate",  # published ltx-video config.json
    adaptive_norm="single_scale_shift",
    standardization_norm="rms_norm",   # published ltx-video config
    positional_embedding_type="rope",
    positional_embedding_theta=10000.0,
    positional_embedding_max_pos=[20, 2048, 2048],
    timestep_scale_multiplier=1000,
    norm_eps=1e-6,
    norm_elementwise_affine=False,  # published config
    attention_bias=True,
)


class TestLTXParity:
    def test_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.ltx import (
            LTXVideoConfig,
            LTXVideoTransformer3D,
        )

        ref_mod = import_ref_module("src.transformer.ltx.base.model")
        torch.manual_seed(0)
        ref = ref_mod.LTXVideoTransformer3DModel(**TINY_REF).double().eval()

        cfg = LTXVideoConfig(
            in_channels=8, out_channels=8, num_layers=2,
            num_attention_heads=2, attention_head_dim=16,
            caption_channels=24, cross_attention_dim=32,
            norm_eps=1e-6, max_pos=(20, 2048, 2048), timestep_scale=1000.0,
        )
        model = LTXVideoTransformer3D(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("ltx", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, s, lc = 1, 24, 6
        x = rng.normal(size=(b, s, 8)).astype(np.float32)
        txt = rng.normal(size=(b, lc, 24)).astype(np.float32)
        sigma = np.full((b, 1), 0.7, np.float32)
        mask = np.ones((b, lc), np.int64)
        # (frame, y, x) coords like the engine builds them
        coords = np.stack([
            np.repeat(np.arange(2), 12).astype(np.float32),
            np.tile(np.repeat(np.arange(3) * 32, 4), 2).astype(np.float32),
            np.tile(np.arange(4) * 32, 6).astype(np.float32),
        ])[None]

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                torch.from_numpy(txt).double(),
                torch.from_numpy(sigma).double(),
                torch.from_numpy(mask).bool(),
                # coords stay f32: the reference rope computes its tables in f32 by
                # design (model.py:837 'We need full precision' = fp32); f64
                # coords would promote the angle math and diverge from the
                # production tables both sides actually use
                video_coords=torch.from_numpy(coords),
            ).sample.float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(sigma),
                  encoder_attention_mask=jnp.asarray(mask),
                  video_coords=jnp.asarray(coords)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
