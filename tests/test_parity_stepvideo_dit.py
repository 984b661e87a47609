"""Full-model numeric parity for the StepVideo DiT vs the REFERENCE
transformer (`/root/reference/apps/api/src/transformer/stepvideo/base/
model.py`) run as a torch oracle on CPU (diffusers shim, f64 — see
test_parity_wan_dit)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    num_attention_heads=1,
    attention_head_dim=128,  # the reference hardcodes rope_ch_split=[64,32,32]
    in_channels=4,
    out_channels=4,
    num_layers=2,
    patch_size=1,
    norm_eps=1e-6,
    caption_channels=[24, 20],
    model_type="t2v",
)


class TestStepVideoParity:
    def test_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.stepvideo import (
            StepVideoConfig,
            StepVideoModel,
        )

        ref_mod = import_ref_module("src.transformer.stepvideo.base.model")
        torch.manual_seed(0)
        ref = ref_mod.StepVideoModel(**TINY).double().eval()
        cfg = StepVideoConfig(
            num_attention_heads=1, attention_head_dim=128, in_channels=4,
            out_channels=4, num_layers=2, patch_size=1,
            caption_channels=(24, 20),
        )
        model = StepVideoModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("stepvideo", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, f, hh, ww, lt, lc = 1, 2, 4, 4, 6, 3
        x = rng.normal(size=(b, 4, f, hh, ww)).astype(np.float32)
        txt = rng.normal(size=(b, lt, 24)).astype(np.float32)
        clip = rng.normal(size=(b, lc, 20)).astype(np.float32)
        t = np.array([0.5], np.float32)  # ref adaln rescales x1000 internally

        with torch.no_grad():
            # reference consumes (B, F, C, H, W)
            out_ref = ref(
                torch.from_numpy(x).double().permute(0, 2, 1, 3, 4),
                encoder_hidden_states=torch.from_numpy(txt).double(),
                encoder_hidden_states_2=torch.from_numpy(clip).double(),
                timestep=torch.from_numpy(t).double(),
                encoder_attention_mask=torch.ones(b, lt, dtype=torch.long),
            ).sample.float().numpy()
        if out_ref.ndim == 5 and out_ref.shape[1] == f:
            out_ref = out_ref.transpose(0, 2, 1, 3, 4)

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(txt),
                  clip_text=jnp.asarray(clip)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
