"""Full-model numeric parity for the Wan DiT vs the REFERENCE transformer
(`/root/reference/apps/api/src/transformer/wan/base/model.py`) executed as a
torch oracle on CPU.

The reference model runs with its own attention (src/attention sdpa backend),
RoPE, and efficiency ops; only the absent `diffusers` symbols come from the
faithful shim in tests/ref_oracle.py. Weights flow through the repo's real
"wan" converter (loaders/converters.py) + apply_state_dict, so this catches
any layout transpose, RoPE axis split, sinusoid convention, qk-norm scope, or
modulation-order divergence in the flagship family end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    patch_size=(1, 2, 2),
    num_attention_heads=2,
    attention_head_dim=12,   # t/h/w rope split 4/4/4
    in_channels=4,
    out_channels=4,
    text_dim=16,
    freq_dim=32,
    ffn_dim=48,
    num_layers=2,
    cross_attn_norm=True,
    eps=1e-6,
    rope_max_seq_len=16,
)


@pytest.fixture(scope="module")
def ref_wan():
    return import_ref_module("src.transformer.wan.base.model")


def _build_pair(ref_wan, *, image_dim=None, added_kv_proj_dim=None):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.models.transformers.wan import (
        WanConfig,
        WanTransformer3DModel,
    )

    torch.manual_seed(0)
    # float64: the reference's InplaceRMSNorm does `y = x.float(); y.pow_(2)`,
    # and for fp32 inputs `.float()` is a no-op ALIAS — the squaring mutates x
    # itself, corrupting q/k. In production (bf16) `.float()` copies, so the
    # correct semantics only reproduce at a dtype != fp32; f64 keeps the oracle
    # exact (efficiency/mod.py:27-33).
    ref = ref_wan.WanTransformer3DModel(
        **TINY, image_dim=image_dim, added_kv_proj_dim=added_kv_proj_dim
    ).double().eval()

    cfg = WanConfig(
        patch_size=TINY["patch_size"],
        num_attention_heads=TINY["num_attention_heads"],
        attention_head_dim=TINY["attention_head_dim"],
        in_channels=TINY["in_channels"],
        out_channels=TINY["out_channels"],
        text_dim=TINY["text_dim"],
        freq_dim=TINY["freq_dim"],
        ffn_dim=TINY["ffn_dim"],
        num_layers=TINY["num_layers"],
        cross_attn_norm=TINY["cross_attn_norm"],
        eps=TINY["eps"],
        rope_max_seq_len=TINY["rope_max_seq_len"],
        image_dim=image_dim,
        added_kv_proj_dim=added_kv_proj_dim,
    )
    model = WanTransformer3DModel(
        cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0)
    )

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_keys("wan", sd)
    missing, unexpected = apply_state_dict(model, converted, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:8]}"
    assert not missing, f"params not covered by checkpoint: {missing[:8]}"
    return ref, model


class TestWanT2VParity:
    def test_full_forward_matches_reference(self, ref_wan):
        ref, model = _build_pair(ref_wan)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 4, 2, 8, 8)).astype(np.float32)
        ctx = rng.normal(size=(1, 7, TINY["text_dim"])).astype(np.float32)
        t = np.array([500.0], np.float32)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(), torch.from_numpy(t).double(),
                torch.from_numpy(ctx).double(),
            ).sample.float().numpy()

        out = np.asarray(model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)

    def test_timestep_sensitivity_matches(self, ref_wan):
        """The temb path (sinusoid + MLP + 6-way modulation) must match at
        more than one point of the schedule."""
        ref, model = _build_pair(ref_wan)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 4, 1, 4, 4)).astype(np.float32)
        ctx = rng.normal(size=(1, 3, TINY["text_dim"])).astype(np.float32)
        for tv in (0.0, 999.0):
            t = np.array([tv], np.float32)
            with torch.no_grad():
                out_ref = ref(
                    torch.from_numpy(x).double(), torch.from_numpy(t).double(),
                    torch.from_numpy(ctx).double(),
                ).sample.float().numpy()
            out = np.asarray(model(jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)))
            np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)


class TestWanI2VParity:
    def test_image_conditioned_forward_matches_reference(self, ref_wan):
        """i2v: CLIP features through WanImageEmbedding + added-kv cross-attn.
        The reference hardcodes a 512-token text context for the image/text
        split (attention.py:327), so the oracle runs with L_text=512."""
        ref, model = _build_pair(ref_wan, image_dim=20, added_kv_proj_dim=24)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 4, 2, 4, 4)).astype(np.float32)
        ctx = rng.normal(size=(1, 512, TINY["text_dim"])).astype(np.float32)
        img = rng.normal(size=(1, 5, 20)).astype(np.float32)
        t = np.array([250.0], np.float32)

        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(x).double(),
                torch.from_numpy(t).double(),
                torch.from_numpy(ctx).double(),
                encoder_hidden_states_image=torch.from_numpy(img).double(),
            ).sample.float().numpy()

        out = np.asarray(
            model(
                jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
                context_image=jnp.asarray(img),
            )
        )
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)
