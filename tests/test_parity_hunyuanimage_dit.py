"""Full-model numeric parity for the HunyuanImage 2.1 DiT and the
HunyuanImage-3 MoE DiT vs the REFERENCE transformers
(`/root/reference/apps/api/src/transformer/hunyuanimage{,3}/base/model.py`)
run as torch oracles on CPU (diffusers shim, f64 — see test_parity_wan_dit)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

HIMG_TINY = dict(
    in_channels=8,
    out_channels=8,
    num_attention_heads=2,
    attention_head_dim=16,
    num_layers=2,
    num_single_layers=2,
    num_refiner_layers=1,
    mlp_ratio=4.0,
    patch_size=(1, 1),
    guidance_embeds=False,
    text_embed_dim=24,
    text_embed_2_dim=20,
    rope_theta=256.0,
    rope_axes_dim=(8, 8),
)


class TestHunyuanImageParity:
    def test_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.hunyuanimage import (
            HunyuanImageConfig,
            HunyuanImageTransformer2DModel,
        )

        ref_mod = import_ref_module("src.transformer.hunyuanimage.base.model")
        torch.manual_seed(0)
        ref = ref_mod.HunyuanImageTransformer2DModel(**HIMG_TINY).double().eval()
        cfg = HunyuanImageConfig(**HIMG_TINY)
        model = HunyuanImageTransformer2DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("hunyuanimage", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, hh, ww, lt, l2 = 1, 4, 4, 6, 5
        x = rng.normal(size=(b, 8, hh, ww)).astype(np.float32)
        text = rng.normal(size=(b, lt, 24)).astype(np.float32)
        text2 = rng.normal(size=(b, l2, 20)).astype(np.float32)
        t = np.array([500.0], np.float32)
        ones_t = np.ones((b, lt), np.int64)
        ones_2 = np.ones((b, l2), np.int64)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                torch.from_numpy(t).double(),
                torch.from_numpy(text).double(),
                torch.from_numpy(ones_t),
                encoder_hidden_states_2=torch.from_numpy(text2).double(),
                encoder_attention_mask_2=torch.from_numpy(ones_2),
            ).sample.float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
                  text_mask=jnp.asarray(ones_t),
                  text_2=jnp.asarray(text2), text_2_mask=jnp.asarray(ones_2)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
