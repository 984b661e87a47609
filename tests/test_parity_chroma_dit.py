"""Full-model numeric parity for the Chroma DiT (flux-derived, pruned
modulation via the distilled approximator MLP) vs the REFERENCE transformer
(`/root/reference/apps/api/src/transformer/chroma/base/model.py`) run as a
torch oracle on CPU (diffusers shim, f64 — see test_parity_wan_dit)."""

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
    axes_dims_rope=(4, 6, 6),
    approximator_num_channels=16,
    approximator_hidden_dim=32,
    approximator_layers=2,
)


@pytest.fixture(scope="module")
def ref_mod():
    return import_ref_module("src.transformer.chroma.base.model")


def _build_pair(ref_mod):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.transformers.chroma import (
        ChromaConfig,
        ChromaTransformer2DModel,
    )

    torch.manual_seed(0)
    ref = ref_mod.ChromaTransformer2DModel(**TINY).double().eval()

    kw = {k: v for k, v in TINY.items() if k != "patch_size"}
    cfg = ChromaConfig(**kw, patch_size=1)
    model = ChromaTransformer2DModel(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0)
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("chroma", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:8]}"
    assert not missing, f"params not covered by checkpoint: {missing[:8]}"
    return ref, model


def _img_ids(h, w):
    ids = np.zeros((h, w, 3), np.float64)
    ids[..., 1] = np.arange(h)[:, None]
    ids[..., 2] = np.arange(w)[None, :]
    return ids.reshape(-1, 3)


class TestChromaParity:
    def test_forward_matches_reference(self, ref_mod):
        ref, model = _build_pair(ref_mod)
        rng = np.random.default_rng(0)
        b, h, w, lt = 1, 4, 4, 7
        x = rng.normal(size=(b, h * w, TINY["in_channels"])).astype(np.float32)
        txt = rng.normal(size=(b, lt, TINY["joint_attention_dim"])).astype(np.float32)
        sigma = np.array([0.7], np.float32)
        mask = np.ones((b, lt), np.int64)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                encoder_hidden_states=torch.from_numpy(txt).double(),
                timestep=torch.from_numpy(sigma).double(),
                img_ids=torch.from_numpy(_img_ids(h, w)),
                txt_ids=torch.zeros(lt, 3, dtype=torch.float64),
                attention_mask=torch.cat([torch.from_numpy(mask), torch.ones(1, h * w, dtype=torch.long)], dim=1).double(),
            ).sample.float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(sigma),
                  attention_mask=jnp.asarray(mask), grid_hw=(h, w))
        )
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
