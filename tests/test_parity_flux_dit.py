"""Full-model numeric parity for the Flux DiT (the benchmark's primary model)
vs the REFERENCE transformer (`/root/reference/apps/api/src/transformer/flux/
base/model.py`) run as a torch oracle on CPU via the diffusers shim.

Covers the guidance-distilled (Flux Dev) and guidance-free variants: double +
single stream blocks, joint rope over [txt|img] ids, AdaLN-zero/-single, and
the final AdaLN-continuous projection, with weights through the real "flux"
converter. Oracle in float64 (InplaceRMSNorm fp32 aliasing — see
test_parity_wan_dit.py; flux swaps its qk norms for InplaceRMSNorm too).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    patch_size=1,
    in_channels=16,
    out_channels=16,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=64,
    num_attention_heads=4,
    joint_attention_dim=128,
    pooled_projection_dim=64,
    axes_dims_rope=(16, 24, 24),
)


@pytest.fixture(scope="module")
def ref_mod():
    return import_ref_module("src.transformer.flux.base.model")


def _build_pair(ref_mod, *, guidance_embeds):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.transformers.flux import (
        FluxConfig,
        FluxTransformer2DModel,
    )

    torch.manual_seed(0)
    ref = ref_mod.FluxTransformer2DModel(
        **TINY, guidance_embeds=guidance_embeds
    ).double().eval()

    kw = {k: v for k, v in TINY.items() if k != "patch_size"}
    cfg = FluxConfig(**kw, guidance_embeds=guidance_embeds)
    model = FluxTransformer2DModel(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0)
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("flux", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:8]}"
    assert not missing, f"params not covered by checkpoint: {missing[:8]}"
    return ref, model


def _img_ids(h, w):
    ids = np.zeros((h, w, 3), np.float64)
    ids[..., 1] = np.arange(h)[:, None]
    ids[..., 2] = np.arange(w)[None, :]
    return ids.reshape(-1, 3)


class TestFluxParity:
    @pytest.mark.parametrize("guidance_embeds", [True, False])
    def test_forward_matches_reference(self, ref_mod, guidance_embeds):
        ref, model = _build_pair(ref_mod, guidance_embeds=guidance_embeds)
        rng = np.random.default_rng(0)
        b, h, w, lt = 1, 4, 4, 7
        x = rng.normal(size=(b, h * w, TINY["in_channels"])).astype(np.float32)
        txt = rng.normal(size=(b, lt, TINY["joint_attention_dim"])).astype(np.float32)
        pooled = rng.normal(size=(b, TINY["pooled_projection_dim"])).astype(np.float32)
        sigma = np.array([0.7], np.float32)
        g = np.array([3.5], np.float32) if guidance_embeds else None

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                encoder_hidden_states=torch.from_numpy(txt).double(),
                pooled_projections=torch.from_numpy(pooled).double(),
                timestep=torch.from_numpy(sigma).double(),
                img_ids=torch.from_numpy(_img_ids(h, w)),
                txt_ids=torch.zeros(lt, 3, dtype=torch.float64),
                guidance=(torch.from_numpy(g).double() if g is not None else None),
            ).sample.float().numpy()

        out = np.asarray(
            model(
                jnp.asarray(x), jnp.asarray(txt), jnp.asarray(pooled),
                jnp.asarray(sigma),
                guidance=(jnp.asarray(g) if g is not None else None),
                grid_hw=(h, w),
            )
        )
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
