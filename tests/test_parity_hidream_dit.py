"""Full-model numeric parity for the HiDream-I1 MoE DiT vs the REFERENCE
transformer (`/root/reference/apps/api/src/transformer/hidream/base/model.py`)
run as a torch oracle on CPU (diffusers shim, f64 — see test_parity_wan_dit).

Covers: per-block llama caption projections + shared T5 tail, MoE routing
(top-2 of 4 experts), double + single stream blocks, 2-axis rope."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

N_LAYERS, N_SINGLE = 1, 2
TINY_REF = dict(
    patch_size=2,
    in_channels=4,
    out_channels=4,
    num_layers=N_LAYERS,
    num_single_layers=N_SINGLE,
    attention_head_dim=16,
    num_attention_heads=2,
    caption_channels=[24, 24],   # [t5_dim, llama_dim]
    text_emb_dim=20,
    num_routed_experts=4,
    num_activated_experts=2,
    axes_dims_rope=(8, 4, 4),
    max_resolution=(16, 16),
    llama_layers=[0, 1, 2],
)


@pytest.fixture(scope="module")
def ref_mod():
    return import_ref_module("src.transformer.hidream.base.model")


def _build_pair(ref_mod):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.transformers.hidream import (
        HiDreamConfig,
        HiDreamImageTransformer2DModel,
    )

    torch.manual_seed(0)
    ref = ref_mod.HiDreamImageTransformer2DModel(**TINY_REF).double().eval()

    cfg = HiDreamConfig(
        patch_size=2, in_channels=4, out_channels=4,
        num_layers=N_LAYERS, num_single_layers=N_SINGLE,
        attention_head_dim=16, num_attention_heads=2,
        text_emb_dim=20, caption_dim=24,
        num_routed_experts=4, num_activated_experts=2,
        axes_dims_rope=(8, 4, 4), llama_layers=(0, 1, 2),
    )
    model = HiDreamImageTransformer2DModel(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0)
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("hidream", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:8]}"
    assert not missing, f"params not covered by checkpoint: {missing[:8]}"
    return ref, model


class TestHiDreamParity:
    def test_forward_matches_reference(self, ref_mod):
        ref, model = _build_pair(ref_mod)
        rng = np.random.default_rng(0)
        b, hh, ww, lt, ll = 1, 8, 8, 6, 5
        x = rng.normal(size=(b, 4, hh, ww)).astype(np.float32)
        t5 = rng.normal(size=(b, lt, 24)).astype(np.float32)
        llama = rng.normal(size=(3, b, ll, 24)).astype(np.float32)
        pooled = rng.normal(size=(b, 20)).astype(np.float32)
        t = np.array([500.0], np.float32)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                timesteps=torch.from_numpy(t).double(),
                encoder_hidden_states_t5=torch.from_numpy(t5).double(),
                encoder_hidden_states_llama3=torch.from_numpy(llama).double(),
                pooled_embeds=torch.from_numpy(pooled).double(),
            ).sample
        if isinstance(out_ref, list):
            out_ref = out_ref[0][None]
        out_ref = out_ref.float().numpy()

        llama_ctx = [jnp.asarray(llama[k]) for k in (0, 1, 2)]
        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(t5), llama_ctx,
                  jnp.asarray(pooled))
        )
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=3e-4, rtol=2e-3)
