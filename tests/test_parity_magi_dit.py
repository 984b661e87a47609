"""Full-model numeric parity for the MAGI-1 chunked-AR DiT vs the REFERENCE
transformer (`/root/reference/apps/api/src/transformer/magi/base/model.py`)
run as a torch oracle on CPU (single denoising range).

Oracle adaptations (production parity, not shortcuts):
- the reference's rope/FusedLayerNorm allocate torch.empty params (checkpoint-
  filled in production) — randomize them before converting;
- production applies rope via flash-attn's partial rotary (the non-flash
  fallback mis-broadcasts); patch in a faithful flash-style rotation;
- the non-flash cross-attn path passes cu_seqlens_kv where sdpa_varlen takes
  cu_seqlens_k — adapt kwargs;
- rope band construction hardcodes torch.cuda.current_device().

This test found two real checkpoint bugs: rope spatial coordinates must be
CENTERED and endpoint-rescaled to the 16x16 reference grid, and the cross
to_kv projection is per-head [k|v]-interleaved."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    num_layers=2,
    ffn_dim=64,
    num_attention_heads=2,
    attention_head_dim=16,
    in_channels=4,
    out_channels=4,
    patch_size=2,
    t_patch_size=1,
    cond_hidden_ratio=0.25,
    xattn_cond_hidden_ratio=1.0,
    num_query_groups=2,
    caption_channels=24,
    caption_max_length=8,
    x_rescale_factor=1.0,
    half_channel_vae=False,
    eps=1e-6,
)


def _flash_style_partial_rope(x, cos, sin):
    ro = cos.shape[-1] * 2
    xr, rest = x[..., :ro], x[..., ro:]
    x1, x2 = xr[..., : ro // 2], xr[..., ro // 2:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s, rest], dim=-1)


class _RegAdapter:
    def __init__(self, reg):
        self._reg = reg

    def is_available(self, k):
        return self._reg.is_available(k)

    def call(self, *a, **kw):
        if "cu_seqlens_kv" in kw:
            kw["cu_seqlens_k"] = kw.pop("cu_seqlens_kv")
        if "max_seqlen_kv" in kw:
            kw["max_seqlen_k"] = kw.pop("max_seqlen_kv")
        return self._reg.call(*a, **kw)


class TestMagiParity:
    def test_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.magi import (
            MagiConfig,
            MagiTransformer3DModel,
        )

        attn_mod = import_ref_module("src.transformer.magi.base.attention")
        torch.cuda.current_device = lambda: "cpu"
        attn_mod.HAS_FLASH_ATTN = True
        attn_mod.apply_rotary_emb = _flash_style_partial_rope
        if not isinstance(attn_mod.attention_register, _RegAdapter):
            attn_mod.attention_register = _RegAdapter(attn_mod.attention_register)
        ref_mod = import_ref_module("src.transformer.magi.base.model")

        torch.manual_seed(0)
        ref = ref_mod.MagiTransformer3DModel(**TINY).float().eval()
        g = torch.Generator().manual_seed(0)
        with torch.no_grad():
            for p in ref.parameters():
                p.copy_(torch.randn(p.shape, generator=g, dtype=p.dtype) * 0.05)

        cfg = MagiConfig(**TINY)
        model = MagiTransformer3DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        missing, unexpected = apply_state_dict(
            model, convert_keys("magi", sd), strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        b, tt, hh, ww, ly = 1, 2, 8, 8, 8
        x = rng.normal(size=(b, 4, tt, hh, ww)).astype(np.float32)
        y = rng.normal(size=(b, 1, ly, 24)).astype(np.float32)
        t = np.array([[0.5]], np.float32)
        chunk_tokens = tt * (hh // 2) * (ww // 2)

        with torch.no_grad():
            out_r = ref(
                torch.from_numpy(x),
                torch.from_numpy(t),
                torch.from_numpy(y.reshape(b, 1, ly, 24)),
                caption_dropout_mask=torch.zeros(b, dtype=torch.bool),
                encoder_hidden_states_mask=torch.ones(b, 1, ly),
                kv_range=torch.tensor([[0, chunk_tokens]], dtype=torch.int32),
                range_num=1, denoising_range_num=1, slice_point=0,
                transformer_dtype=torch.float32,
            )
        o_r = (out_r if torch.is_tensor(out_r) else out_r[0]).numpy()

        out_j = np.asarray(
            model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(y),
                  y_mask=jnp.ones((b, 1, ly), bool), block_causal=False))
        assert out_j.shape == o_r.shape
        np.testing.assert_allclose(out_j, o_r, atol=5e-4, rtol=5e-3)
