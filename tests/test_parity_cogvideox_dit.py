"""Full-model numeric parity for the CogVideoX DiT vs the REFERENCE
transformer (`/root/reference/apps/api/src/transformer/cogvideo/base/model.py`)
run as a torch oracle on CPU (diffusers shim, f64 — see test_parity_wan_dit).

The rotary table is built exactly as the reference pipeline does for the
aligned case (grid == sample size, so get_3d_rotary_pos_embed's linspace crop
degenerates to integer positions): per-axis get_1d_rotary_pos_embed with the
1:2:2-quarter head split, repeat-interleaved real layout."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import get_1d_rotary_pos_embed, import_ref_module

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=16,
    in_channels=4,
    out_channels=4,
    time_embed_dim=24,
    text_embed_dim=20,
    num_layers=2,
    patch_size=2,
    sample_height=8,
    sample_width=8,
    sample_frames=17,           # (17-1)/4+1 = 5 latent frames capacity
    temporal_compression_ratio=4,
    use_rotary_positional_embeddings=True,
    use_learned_positional_embeddings=False,
)


def _rope_3d(embed_dim, t, h, w):
    dim_t = embed_dim // 4
    dim_h = embed_dim * 3 // 8
    dim_w = embed_dim * 3 // 8
    ct, st_ = get_1d_rotary_pos_embed(dim_t, torch.arange(t).float(),
                                      use_real=True)
    ch, sh = get_1d_rotary_pos_embed(dim_h, torch.arange(h).float(),
                                     use_real=True)
    cw, sw = get_1d_rotary_pos_embed(dim_w, torch.arange(w).float(),
                                     use_real=True)

    def grid(ft, fh, fw):
        ft = ft[:, None, None, :].expand(t, h, w, -1)
        fh = fh[None, :, None, :].expand(t, h, w, -1)
        fw = fw[None, None, :, :].expand(t, h, w, -1)
        return torch.cat([ft, fh, fw], dim=-1).reshape(t * h * w, -1)

    return grid(ct, ch, cw).float(), grid(st_, sh, sw).float()


@pytest.fixture(scope="module")
def ref_mod():
    return import_ref_module("src.transformer.cogvideo.base.model")


class TestCogVideoXParity:
    def test_forward_matches_reference(self, ref_mod):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.cogvideox import (
            CogVideoXConfig,
            CogVideoXTransformer3DModel,
        )

        torch.manual_seed(0)
        ref = ref_mod.CogVideoXTransformer3DModel(**TINY).double().eval()
        kw = {k: v for k, v in TINY.items()
              if k not in ("sample_frames", "use_learned_positional_embeddings")}
        cfg = CogVideoXConfig(**kw)
        model = CogVideoXTransformer3DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("cogvideo", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, tt, hh, ww, lt = 1, 2, 8, 8, 6
        x = rng.normal(size=(b, 4, tt, hh, ww)).astype(np.float32)
        txt = rng.normal(size=(b, lt, TINY["text_embed_dim"])).astype(np.float32)
        t = np.array([500.0], np.float32)

        p = TINY["patch_size"]
        rope = _rope_3d(TINY["attention_head_dim"], tt, hh // p, ww // p)

        with torch.no_grad():
            # reference expects [B, T, C, H, W]
            out_ref = ref(
                torch.from_numpy(x).double().permute(0, 2, 1, 3, 4),
                torch.from_numpy(txt).double(),
                torch.from_numpy(t).double(),
                image_rotary_emb=rope,
            ).sample.permute(0, 2, 1, 3, 4).float().numpy()

        out = np.asarray(
            model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(txt)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
