"""Full-model numeric parity for the LTX-2 audio+video dual-tower DiT vs the
REFERENCE transformer (`/root/reference/apps/api/src/transformer/ltx2/base/
model.py`) run as a torch oracle on CPU (diffusers shim, f64 — see
test_parity_wan_dit)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    in_channels=8,
    out_channels=8,
    patch_size=1,
    patch_size_t=1,
    num_attention_heads=2,
    attention_head_dim=16,
    cross_attention_dim=32,   # == inner dim, as in the published config
    vae_scale_factors=(8, 32, 32),
    pos_embed_max_pos=20,
    base_height=2048,
    base_width=2048,
    audio_in_channels=6,
    audio_out_channels=6,
    audio_patch_size=1,
    audio_patch_size_t=1,
    audio_num_attention_heads=2,
    audio_attention_head_dim=8,
    audio_cross_attention_dim=16,  # == audio inner dim
    audio_scale_factor=4,
    audio_pos_embed_max_pos=20,
    num_layers=2,
    caption_channels=28,
)


class TestLTX2Parity:
    def test_av_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.ltx2 import (
            LTX2Config,
            LTX2VideoTransformer3D,
        )

        ref_mod = import_ref_module("src.transformer.ltx2.base.model")
        torch.manual_seed(0)
        ref = ref_mod.LTX2VideoTransformer3DModel(**TINY).double().eval()

        kw = {k: v for k, v in TINY.items()
              if k not in ("patch_size", "patch_size_t", "audio_patch_size",
                           "audio_patch_size_t")}
        cfg = LTX2Config(**kw)
        model = LTX2VideoTransformer3D(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("ltx2", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, tt, hh, ww, sa, lt = 1, 2, 3, 4, 5, 6
        s = tt * hh * ww
        x = rng.normal(size=(b, s, TINY["in_channels"])).astype(np.float32)
        xa = rng.normal(size=(b, sa, TINY["audio_in_channels"])).astype(np.float32)
        ctx = rng.normal(size=(b, lt, TINY["caption_channels"])).astype(np.float32)
        ctx_a = rng.normal(size=(b, lt, TINY["caption_channels"])).astype(np.float32)
        sigma = np.full((b, 1), 0.7, np.float32)
        mask = np.ones((b, lt), np.int64)

        with torch.no_grad():
            out = ref(
                torch.from_numpy(x).double(),
                torch.from_numpy(xa).double(),
                torch.from_numpy(ctx).double(),
                torch.from_numpy(ctx_a).double(),
                torch.from_numpy(sigma * 1000.0).double(),  # scheduler 0..1000 domain
                encoder_attention_mask=torch.from_numpy(mask).bool(),
                num_frames=tt, height=hh, width=ww,
                audio_num_frames=sa, fps=25.0,
                return_dict=False,
            )
            v_ref, a_ref = out[0].float().numpy(), out[1].float().numpy()

        v, a = model(
            jnp.asarray(x), jnp.asarray(xa), jnp.asarray(sigma),
            jnp.asarray(ctx), (tt, hh, ww), fps=25.0,
            ctx_audio=jnp.asarray(ctx_a), ctx_mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(v), v_ref, atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(a), a_ref, atol=2e-4, rtol=2e-3)
