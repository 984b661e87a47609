"""Full-model numeric parity for the Kandinsky-5 DiT vs the REFERENCE
transformer (`/root/reference/apps/api/src/transformer/kandinsky5/base/
model.py`) run as a torch oracle on CPU (diffusers shim, f64 — see
test_parity_wan_dit)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    in_visual_dim=4,
    out_visual_dim=4,
    in_text_dim=24,
    in_text_dim2=20,
    time_dim=32,
    patch_size=(1, 2, 2),
    model_dim=32,
    ff_dim=64,
    num_text_blocks=1,
    num_visual_blocks=2,
    axes_dims=(8, 4, 4),
    visual_cond=False,
)


class TestKandinsky5Parity:
    def test_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.kandinsky5 import (
            Kandinsky5Config,
            Kandinsky5Transformer3DModel,
        )

        ref_mod = import_ref_module("src.transformer.kandinsky5.base.model")
        torch.manual_seed(0)
        ref = ref_mod.Kandinsky5Transformer3DModel(**TINY).double().eval()
        cfg = Kandinsky5Config(**TINY)
        model = Kandinsky5Transformer3DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("kandinsky5", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, tt, hh, ww, lt = 1, 2, 8, 8, 6
        x = rng.normal(size=(b, 4, tt, hh, ww)).astype(np.float32)
        txt = rng.normal(size=(b, lt, 24)).astype(np.float32)
        pooled = rng.normal(size=(b, 20)).astype(np.float32)
        t = np.array([500.0], np.float32)

        with torch.no_grad():
            # reference consumes [B, T, H, W, C] visuals
            out_ref = ref(
                torch.from_numpy(x).double().permute(0, 2, 3, 4, 1),
                torch.from_numpy(txt).double(),
                torch.from_numpy(t).double(),
                torch.from_numpy(pooled).double(),
                visual_rope_pos=(torch.arange(tt), torch.arange(hh // 2),
                                 torch.arange(ww // 2)),
                text_rope_pos=torch.arange(lt),
            ).sample.permute(0, 4, 1, 2, 3).float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(txt),
                  jnp.asarray(pooled)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
