"""Full-model numeric parity for the Flux2 DiT vs the REFERENCE transformer
(`/root/reference/apps/api/src/transformer/flux2/base/model.py`) run as a
torch oracle on CPU (diffusers shim, f64 — see test_parity_wan_dit).

ids follow the reference pipeline's 4-axis convention (engine/flux2/shared.py:
266-365): text tokens (0,0,0,l), latent tokens (0,h,w,0)."""

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
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=24,
    timestep_guidance_channels=32,
    mlp_ratio=3.0,
    axes_dims_rope=(4, 4, 4, 4),
    rope_theta=2000,
    guidance_embeds=True,
)


@pytest.fixture(scope="module")
def ref_mod():
    return import_ref_module("src.transformer.flux2.base.model")


def _build_pair(ref_mod):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.transformers.flux2 import (
        Flux2Config,
        Flux2Transformer2DModel,
    )

    torch.manual_seed(0)
    ref = ref_mod.Flux2Transformer2DModel(**TINY).double().eval()

    kw = {k: v for k, v in TINY.items() if k != "patch_size"}
    cfg = Flux2Config(**kw, patch_size=1)
    model = Flux2Transformer2DModel(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0)
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("flux2", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:8]}"
    assert not missing, f"params not covered by checkpoint: {missing[:8]}"
    return ref, model


class TestFlux2Parity:
    def test_forward_matches_reference(self, ref_mod):
        ref, model = _build_pair(ref_mod)
        rng = np.random.default_rng(0)
        b, h, w, lt = 1, 4, 4, 7
        x = rng.normal(size=(b, h * w, TINY["in_channels"])).astype(np.float32)
        txt = rng.normal(size=(b, lt, TINY["joint_attention_dim"])).astype(np.float32)
        sigma = np.array([0.7], np.float32)
        g = np.array([4.0], np.float32)

        txt_ids = np.zeros((lt, 4), np.float64)
        txt_ids[:, 3] = np.arange(lt)
        hh, ww = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        img_ids = np.stack(
            [np.zeros(h * w), hh.reshape(-1), ww.reshape(-1), np.zeros(h * w)],
            axis=-1)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                encoder_hidden_states=torch.from_numpy(txt).double(),
                timestep=torch.from_numpy(sigma).double(),
                img_ids=torch.from_numpy(img_ids),
                txt_ids=torch.from_numpy(txt_ids),
                guidance=torch.from_numpy(g).double(),
            ).sample.float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(sigma),
                  guidance=jnp.asarray(g), grid_hw=(h, w))
        )
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
