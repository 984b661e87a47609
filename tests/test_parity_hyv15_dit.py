"""Full-model numeric parity for the HunyuanVideo 1.5 DiT vs the REFERENCE
transformer (`/root/reference/apps/api/src/transformer/hunyuanvideo15/base/
model.py`) executed as a torch oracle on CPU (diffusers shim: tests/ref_oracle).

The reference's own defaults (in 65 / out 32, 16 heads x 128, 54 layers,
patch 1) confirm the bench geometry; here a tiny config exercises the same
code path: token refiner + byT5 glyph projection + SigLIP image projection +
cond-type embeddings + dual-stream blocks + AdaLN-continuous output.
Oracle runs in float64 (InplaceRMSNorm fp32 aliasing — see
test_parity_wan_dit.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    in_channels=12,
    out_channels=8,
    num_attention_heads=2,
    attention_head_dim=32,
    num_layers=2,
    num_refiner_layers=1,
    mlp_ratio=4.0,
    patch_size=1,
    patch_size_t=1,
    text_embed_dim=64,
    text_embed_2_dim=32,
    image_embed_dim=48,
    rope_theta=256.0,
    rope_axes_dim=(8, 12, 12),
)


@pytest.fixture(scope="module")
def ref_mod():
    return import_ref_module("src.transformer.hunyuanvideo15.base.model")


def _build_pair(ref_mod):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.transformers.hunyuanvideo15 import (
        HYV15Config,
        HunyuanVideo15Transformer3DModel,
    )

    torch.manual_seed(0)
    ref = ref_mod.HunyuanVideo15Transformer3DModel(**TINY).double().eval()

    cfg = HYV15Config(**TINY)
    model = HunyuanVideo15Transformer3DModel(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0)
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("hunyuanvideo15", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:8]}"
    assert not missing, f"params not covered by checkpoint: {missing[:8]}"
    return ref, model


class TestHYV15Parity:
    def test_i2v_forward_matches_reference(self, ref_mod):
        ref, model = _build_pair(ref_mod)
        rng = np.random.default_rng(0)
        b, tt, hh, ww = 1, 2, 4, 4
        lt, lb, li = 7, 5, 3
        x = rng.normal(size=(b, TINY["in_channels"], tt, hh, ww)).astype(np.float32)
        text = rng.normal(size=(b, lt, TINY["text_embed_dim"])).astype(np.float32)
        text2 = rng.normal(size=(b, lb, TINY["text_embed_2_dim"])).astype(np.float32)
        img = rng.normal(size=(b, li, TINY["image_embed_dim"])).astype(np.float32)
        t = np.array([500.0], np.float32)
        ones_t = np.ones((b, lt), np.int64)
        ones_b = np.ones((b, lb), np.int64)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                torch.from_numpy(t).double(),
                torch.from_numpy(text).double(),
                torch.from_numpy(ones_t),
                encoder_hidden_states_2=torch.from_numpy(text2).double(),
                encoder_attention_mask_2=torch.from_numpy(ones_b),
                image_embeds=torch.from_numpy(img).double(),
            ).sample.float().numpy()

        out = np.asarray(
            model(
                jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
                text_mask=jnp.asarray(ones_t),
                text_2=jnp.asarray(text2), text_2_mask=jnp.asarray(ones_b),
                image_embeds=jnp.asarray(img),
            )
        )
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)

    def test_t2v_zero_image_matches_reference(self, ref_mod):
        """t2v runs with zeroed image embeds; the reference zeroes that stream
        (is_t2v branch) — ours must produce the same conditioning."""
        ref, model = _build_pair(ref_mod)
        rng = np.random.default_rng(1)
        b, tt, hh, ww = 1, 1, 4, 4
        lt, lb, li = 5, 4, 2
        x = rng.normal(size=(b, TINY["in_channels"], tt, hh, ww)).astype(np.float32)
        text = rng.normal(size=(b, lt, TINY["text_embed_dim"])).astype(np.float32)
        text2 = rng.normal(size=(b, lb, TINY["text_embed_2_dim"])).astype(np.float32)
        img = np.zeros((b, li, TINY["image_embed_dim"]), np.float32)
        t = np.array([100.0], np.float32)
        ones_t = np.ones((b, lt), np.int64)
        ones_b = np.ones((b, lb), np.int64)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                torch.from_numpy(t).double(),
                torch.from_numpy(text).double(),
                torch.from_numpy(ones_t),
                encoder_hidden_states_2=torch.from_numpy(text2).double(),
                encoder_attention_mask_2=torch.from_numpy(ones_b),
                image_embeds=torch.from_numpy(img).double(),
            ).sample.float().numpy()

        out = np.asarray(
            model(
                jnp.asarray(x), jnp.asarray(t), jnp.asarray(text),
                text_mask=jnp.asarray(ones_t),
                text_2=jnp.asarray(text2), text_2_mask=jnp.asarray(ones_b),
                image_embeds=jnp.asarray(img), image_stream_zeroed=True,
            )
        )
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
