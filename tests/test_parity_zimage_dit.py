"""Full-model numeric parity for the Z-Image DiT (the flagship graft-entry
model) vs the REFERENCE transformer (`/root/reference/apps/api/src/transformer/
zimage/base/model.py`) run as a torch oracle on CPU.

Exercises: sandwich-norm blocks with tanh-gated modulation, noise refiner +
context refiner + unified stream, learned pad tokens, 3-axis rope
(theta=256), FinalLayer AdaLN, through the real "zimage" converter. Token
count is chosen as an exact 32-multiple so the repo's static bucket equals the
reference's dynamic packing. Oracle in float64 (torch RMSNorm is out-of-place,
but InplaceRMSNorm conventions elsewhere make f64 the uniform choice).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    in_channels=8,
    dim=32,
    n_layers=2,
    n_refiner_layers=1,
    n_heads=2,
    n_kv_heads=2,
    norm_eps=1e-5,
    qk_norm=True,
    cap_feat_dim=24,
    rope_theta=256.0,
    t_scale=1000.0,
)
AXES = [4, 6, 6]


@pytest.fixture(scope="module")
def ref_mod():
    return import_ref_module("src.transformer.zimage.base.model")


def _build_pair(ref_mod):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.transformers.zimage import (
        ZImageConfig,
        ZImageTransformer2DModel,
    )

    torch.manual_seed(0)
    ref = ref_mod.ZImageTransformer2DModel(
        **TINY, all_patch_size=(2,), all_f_patch_size=(1,),
        axes_dims=AXES, axes_lens=[64, 32, 32],
    ).double().eval()

    cfg = ZImageConfig(**TINY, patch_size=2, f_patch_size=1,
                       axes_dims=tuple(AXES), axes_lens=(64, 32, 32))
    model = ZImageTransformer2DModel(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0)
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("zimage", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:8]}"
    assert not missing, f"params not covered by checkpoint: {missing[:8]}"
    return ref, model


class TestZImageParity:
    def test_forward_matches_reference(self, ref_mod):
        ref, model = _build_pair(ref_mod)
        rng = np.random.default_rng(0)
        # 16x8 latents, patch 2 -> 8*4 = 32 image tokens (exact bucket);
        # 32 caption tokens, all real.
        c, f, h, w, lc = TINY["in_channels"], 1, 16, 8, 32
        x = rng.normal(size=(c, f, h, w)).astype(np.float32)
        cap = rng.normal(size=(lc, TINY["cap_feat_dim"])).astype(np.float32)
        t = np.array([0.7], np.float32)

        with torch.no_grad():
            out_ref = ref(
                [torch.from_numpy(x).double()],
                torch.from_numpy(t).double(),
                [torch.from_numpy(cap).double()],
            ).sample[0].float().numpy()

        out = np.asarray(
            model(
                jnp.asarray(x)[None], jnp.asarray(t), jnp.asarray(cap)[None],
                cap_mask=jnp.ones((1, lc), bool),
            )
        )[0]
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)

    def test_timestep_sensitivity_matches(self, ref_mod):
        ref, model = _build_pair(ref_mod)
        rng = np.random.default_rng(1)
        c, f, h, w, lc = TINY["in_channels"], 1, 8, 16, 32
        x = rng.normal(size=(c, f, h, w)).astype(np.float32)
        cap = rng.normal(size=(lc, TINY["cap_feat_dim"])).astype(np.float32)
        for tv in (0.05, 0.95):
            t = np.array([tv], np.float32)
            with torch.no_grad():
                out_ref = ref(
                    [torch.from_numpy(x).double()],
                    torch.from_numpy(t).double(),
                    [torch.from_numpy(cap).double()],
                ).sample[0].float().numpy()
            out = np.asarray(
                model(jnp.asarray(x)[None], jnp.asarray(t), jnp.asarray(cap)[None],
                      cap_mask=jnp.ones((1, lc), bool))
            )[0]
            np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
