"""Full-model numeric parity for the Ovis and FIBO DiTs vs the REFERENCE
transformers (`/root/reference/apps/api/src/transformer/{ovis,fibo}/base/
model.py`) run as torch oracles on CPU (diffusers shim, f64 — see
test_parity_wan_dit)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module


def _img_ids(h, w):
    ids = np.zeros((h, w, 3), np.float64)
    ids[..., 1] = np.arange(h)[:, None]
    ids[..., 2] = np.arange(w)[None, :]
    return ids.reshape(-1, 3)


def _diag_txt_ids(lt):
    ids = np.zeros((lt, 3), np.float64)
    ids[:, 1] = np.arange(lt)
    ids[:, 2] = np.arange(lt)
    return ids


OVIS_TINY = dict(
    patch_size=1,
    in_channels=16,
    out_channels=16,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=24,
    axes_dims_rope=(4, 6, 6),
)


class TestOvisParity:
    def test_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.ovis import (
            OvisConfig,
            OvisImageTransformer2DModel,
        )

        ref_mod = import_ref_module("src.transformer.ovis.base.model")
        torch.manual_seed(0)
        ref = ref_mod.OvisImageTransformer2DModel(**OVIS_TINY).double().eval()
        cfg = OvisConfig(**OVIS_TINY)
        model = OvisImageTransformer2DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("ovis", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, h, w, lt = 1, 4, 4, 7
        x = rng.normal(size=(b, h * w, 16)).astype(np.float32)
        txt = rng.normal(size=(b, lt, 24)).astype(np.float32)
        sigma = np.array([0.6], np.float32)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                encoder_hidden_states=torch.from_numpy(txt).double(),
                timestep=torch.from_numpy(sigma).double(),
                img_ids=torch.from_numpy(_img_ids(h, w)),
                # the ovis pipeline uses DIAGONAL text ids (engine/ovis/
                # t2i.py:126: axes 1 and 2 both arange)
                txt_ids=torch.from_numpy(_diag_txt_ids(lt)),
            ).sample.float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(sigma),
                  grid_hw=(h, w)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)


FIBO_TINY = dict(
    patch_size=1,
    in_channels=16,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=32,
    guidance_embeds=False,
    axes_dims_rope=[4, 6, 6],
    text_encoder_dim=20,
)


class TestFiboParity:
    def test_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.fibo import (
            FiboConfig,
            BriaFiboTransformer2DModel,
        )

        ref_mod = import_ref_module("src.transformer.fibo.base.model")
        torch.manual_seed(0)
        ref = ref_mod.BriaFiboTransformer2DModel(**FIBO_TINY).double().eval()
        kw = dict(FIBO_TINY)
        kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        cfg = FiboConfig(**kw)
        model = BriaFiboTransformer2DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("fibo", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, h, w, lt = 1, 4, 4, 6
        n_blocks = FIBO_TINY["num_layers"] + FIBO_TINY["num_single_layers"]
        x = rng.normal(size=(b, h * w, 16)).astype(np.float32)
        txt = rng.normal(size=(b, lt, 32)).astype(np.float32)
        layers = rng.normal(size=(n_blocks, b, lt, 20)).astype(np.float32)
        sigma = np.array([0.4], np.float32)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                encoder_hidden_states=torch.from_numpy(txt).double(),
                text_encoder_layers=[torch.from_numpy(l).double() for l in layers],
                timestep=torch.from_numpy(sigma).double(),
                img_ids=torch.from_numpy(_img_ids(h, w)),
                txt_ids=torch.zeros(lt, 3, dtype=torch.float64),
            ).sample.float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(txt),
                  [jnp.asarray(l) for l in layers], jnp.asarray(sigma),
                  grid_hw=(h, w)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
