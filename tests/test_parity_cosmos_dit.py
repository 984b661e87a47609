"""Full-model numeric parity for the Cosmos-2 DiT vs the REFERENCE
transformer (`/root/reference/apps/api/src/transformer/cosmos/base/model.py`)
run as a torch oracle on CPU (diffusers shim, f64 — see test_parity_wan_dit)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    in_channels=4,
    out_channels=4,
    num_attention_heads=2,
    attention_head_dim=16,
    num_layers=2,
    mlp_ratio=4.0,
    text_embed_dim=20,
    adaln_lora_dim=24,
    max_size=(8, 16, 16),
    patch_size=(1, 2, 2),
    rope_scale=(2.0, 1.0, 1.0),
    concat_padding_mask=True,
    extra_pos_embed_type=None,
)


class TestCosmosParity:
    def test_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.cosmos import (
            CosmosConfig,
            CosmosTransformer3DModel,
        )

        ref_mod = import_ref_module("src.transformer.cosmos.base.model")
        # cosmos resizes the padding mask via torchvision (absent); nearest
        # resize to the same size is identity, stub exactly that
        import types as _t
        tfm = _t.SimpleNamespace(
            functional=_t.SimpleNamespace(
                resize=lambda x, size, interpolation=None: x),
            InterpolationMode=_t.SimpleNamespace(NEAREST=None))
        ref_mod.transforms = tfm
        torch.manual_seed(0)
        ref = ref_mod.CosmosTransformer3DModel(**TINY).double().eval()
        cfg = CosmosConfig(**TINY)
        model = CosmosTransformer3DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("cosmos", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, tt, hh, ww, lt = 1, 2, 8, 8, 6
        x = rng.normal(size=(b, 4, tt, hh, ww)).astype(np.float32)
        txt = rng.normal(size=(b, lt, 20)).astype(np.float32)
        t = np.array([0.6], np.float32)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                torch.from_numpy(t).double(),
                torch.from_numpy(txt).double(),
                padding_mask=torch.zeros(1, 1, hh, ww, dtype=torch.float64),
            ).sample.float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(txt)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
