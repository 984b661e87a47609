"""Full-model numeric parity for the QwenImage DiT (benchmark config #3) vs
the REFERENCE transformer (`/root/reference/apps/api/src/transformer/qwenimage/
base/model.py`) run as a torch oracle on CPU (diffusers shim, f64 oracle —
see test_parity_wan_dit.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    patch_size=2,
    in_channels=16,
    out_channels=16,
    num_layers=2,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=24,
    guidance_embeds=False,
    axes_dims_rope=(4, 6, 6),
)


@pytest.fixture(scope="module")
def ref_mod():
    return import_ref_module("src.transformer.qwenimage.base.model")


def _build_pair(ref_mod):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.transformers.qwenimage import (
        QwenImageConfig,
        QwenImageTransformer2DModel,
    )

    torch.manual_seed(0)
    ref = ref_mod.QwenImageTransformer2DModel(**TINY).double().eval()

    kw = {k: v for k, v in TINY.items() if k not in ("patch_size", "guidance_embeds")}
    cfg = QwenImageConfig(**kw)
    model = QwenImageTransformer2DModel(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0)
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("qwenimage", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:8]}"
    assert not missing, f"params not covered by checkpoint: {missing[:8]}"
    return ref, model


class TestQwenImageParity:
    def test_forward_matches_reference(self, ref_mod):
        ref, model = _build_pair(ref_mod)
        rng = np.random.default_rng(0)
        b, ht, wt, lt = 1, 4, 4, 7
        x = rng.normal(size=(b, ht * wt, TINY["in_channels"])).astype(np.float32)
        txt = rng.normal(size=(b, lt, TINY["joint_attention_dim"])).astype(np.float32)
        sigma = np.array([0.6], np.float32)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                encoder_hidden_states=torch.from_numpy(txt).double(),
                encoder_hidden_states_mask=torch.ones(b, lt, dtype=torch.long),
                timestep=torch.from_numpy(sigma).double(),
                img_shapes=[[(1, ht, wt)]],
                txt_seq_lens=[lt],
            ).sample.float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(txt), jnp.asarray(sigma),
                  grid_hw=(ht, wt))
        )
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
