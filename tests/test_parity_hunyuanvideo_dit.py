"""Full-model numeric parity for the HunyuanVideo DiT vs the REFERENCE
transformer (`/root/reference/apps/api/src/transformer/hunyuanvideo/base/
model.py`) run as a torch oracle on CPU (diffusers shim, f64 oracle — see
test_parity_wan_dit.py)."""

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
    attention_head_dim=12,
    num_layers=2,
    num_single_layers=2,
    num_refiner_layers=1,
    mlp_ratio=4.0,
    patch_size=2,
    patch_size_t=1,
    guidance_embeds=True,
    text_embed_dim=32,
    pooled_projection_dim=16,
    rope_theta=256.0,
    rope_axes_dim=(4, 4, 4),
)


@pytest.fixture(scope="module")
def ref_mod():
    return import_ref_module("src.transformer.hunyuanvideo.base.model")


def _build_pair(ref_mod):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.transformers.hunyuanvideo import (
        HunyuanVideoConfig,
        HunyuanVideoTransformer3DModel,
    )

    torch.manual_seed(0)
    ref = ref_mod.HunyuanVideoTransformer3DModel(**TINY).double().eval()

    cfg = HunyuanVideoConfig(**TINY)
    model = HunyuanVideoTransformer3DModel(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0)
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("hunyuanvideo", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:8]}"
    assert not missing, f"params not covered by checkpoint: {missing[:8]}"
    return ref, model


class TestHunyuanVideoParity:
    def test_t2v_forward_matches_reference(self, ref_mod):
        ref, model = _build_pair(ref_mod)
        rng = np.random.default_rng(0)
        b, tt, hh, ww, lt = 1, 2, 8, 8, 7
        x = rng.normal(size=(b, TINY["in_channels"], tt, hh, ww)).astype(np.float32)
        text = rng.normal(size=(b, lt, TINY["text_embed_dim"])).astype(np.float32)
        pooled = rng.normal(size=(b, TINY["pooled_projection_dim"])).astype(np.float32)
        t = np.array([500.0], np.float32)
        g = np.array([6000.0], np.float32)  # guidance_scale x 1000, per pipeline
        mask = np.ones((b, lt), np.int64)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                torch.from_numpy(t).double(),
                torch.from_numpy(text).double(),
                torch.from_numpy(mask),
                torch.from_numpy(pooled).double(),
                guidance=torch.from_numpy(g).double(),
            ).sample.float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
                  text_mask=jnp.asarray(mask), pooled=jnp.asarray(pooled),
                  guidance=jnp.asarray(g))
        )
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
