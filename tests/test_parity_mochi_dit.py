"""Full-model numeric parity for the Mochi-1 DiT vs the REFERENCE transformer
(`/root/reference/apps/api/src/transformer/mochi/base/model.py`) run as a
torch oracle on CPU (diffusers shim, f64 — see test_parity_wan_dit).

Caveat: diffusers' MochiAttentionPool and MochiCombinedTimestepCaptionEmbedding
are shimmed (tests/ref_oracle.py) since the reference consumes them from the
absent diffusers wheel; the asymmetric-stream attention processor and blocks
are the reference's own vendored code."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    patch_size=2,
    num_attention_heads=2,
    attention_head_dim=16,
    num_layers=2,
    pooled_projection_dim=24,
    in_channels=4,
    out_channels=4,
    qk_norm="rms_norm",
    text_embed_dim=32,
    time_embed_dim=32,
    activation_fn="swiglu",
    max_sequence_length=32,
)


class TestMochiParity:
    def test_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.mochi import (
            MochiConfig,
            MochiTransformer3DModel,
        )

        ref_mod = import_ref_module("src.transformer.mochi.base.model")
        torch.manual_seed(0)
        ref = ref_mod.MochiTransformer3DModel(**TINY).double().eval()
        kw = {k: v for k, v in TINY.items()
              if k not in ("qk_norm", "activation_fn", "max_sequence_length")}
        cfg = MochiConfig(**kw)
        model = MochiTransformer3DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("mochi", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, tt, hh, ww, lt = 1, 2, 8, 8, 6
        x = rng.normal(size=(b, 4, tt, hh, ww)).astype(np.float32)
        txt = rng.normal(size=(b, lt, TINY["text_embed_dim"])).astype(np.float32)
        t = np.array([500.0], np.float32)
        mask = np.ones((b, lt), np.int64)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                torch.from_numpy(txt).double(),
                torch.from_numpy(t).double(),
                torch.from_numpy(mask).bool(),
            ).sample.float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(txt),
                  encoder_attention_mask=jnp.asarray(mask)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
