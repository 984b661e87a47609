"""Full-model numeric parity for the HunyuanImage-3.0 causal-MM MoE backbone
vs the REFERENCE transformer
(`/root/reference/apps/api/src/transformer/hunyuanimage3/base/model.py`
``HunyuanImage3ForCausalMM``) run as a torch oracle on CPU (f64).

The oracle runs the real gen-image first_step forward: input ids with
<timestep>/<img> placeholder slots + trailing tokens, scatter of the UNet
patch embedding and timestep embedding into those slots, the engine's
causal+image-bidirectional 4-D mask (engine t2i.py:292), the reference's own
``build_batch_2d_rope`` centered 2-D rope, MoE routing via the default
``topkgating`` dispatch, and the UNetUp ragged final layer."""

import contextlib
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
# transformers must load before ref_oracle's dependency stubs (its import
# probes optional packages; the timm stub has no __spec__)
pytest.importorskip("transformers")

import jax.numpy as jnp
from flax import nnx

from tests.ref_oracle import import_ref_module

TINY = dict(
    vocab_size=97,
    hidden_size=64,
    intermediate_size=96,
    moe_intermediate_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    attention_head_dim=16,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    use_qk_norm=True,
    norm_type="rms",
    num_experts=4,
    use_mixed_mlp_moe=True,
    num_shared_expert=2,
    moe_topk=2,
    moe_layer_num_skipped=1,  # layer 0 = plain MLP, layer 1 = MoE
    norm_topk_prob=True,
    img_proj_type="unet",
    patch_size=2,
    patch_embed_hidden_dim=32,
)

L_TEXT, TRAIL = 5, 2  # prefix text tokens; trailing tokens after the image
LAT_C, LAT_H, LAT_W = 6, 8, 8  # -> 4x4 = 16 image tokens at patch 2


def _build_ref(ref_mod, cfg_mod):
    cfg = cfg_mod.HunyuanImage3Config(
        rope_scaling={"type": "custom"},
        vae={"latent_channels": LAT_C},
        **TINY,
    )
    cfg._attn_implementation = "sdpa"
    torch.manual_seed(0)
    # quiet the MoE's CUDA-only instrumentation on CPU
    ref_mod.nvtx = types.SimpleNamespace(
        range=lambda *a, **k: contextlib.nullcontext())
    torch.cuda.set_device = lambda *a, **k: None
    return ref_mod.HunyuanImage3ForCausalMM(cfg).double().eval()


class TestHunyuanImage3Parity:
    def test_gen_image_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.hunyuanimage3 import (
            HunyuanImage3Config,
            HunyuanImage3ForCausalMM,
        )

        cfg_mod = import_ref_module("src.transformer.hunyuanimage3.base.config")
        ref_mod = import_ref_module("src.transformer.hunyuanimage3.base.model")
        ref = _build_ref(ref_mod, cfg_mod)

        cfg = HunyuanImage3Config(
            img_in_channels=LAT_C, img_out_channels=LAT_C,
            **{k: v for k, v in TINY.items() if k != "img_proj_type"})
        model = HunyuanImage3ForCausalMM(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("hunyuanimage3", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        gh, gw = LAT_H // TINY["patch_size"], LAT_W // TINY["patch_size"]
        n_img = gh * gw
        img_begin = L_TEXT + 1
        S = L_TEXT + 1 + n_img + TRAIL

        ids = rng.integers(0, TINY["vocab_size"], size=(1, S))
        lat = rng.normal(size=(1, LAT_C, LAT_H, LAT_W)).astype(np.float32)
        t = np.array([537.0], np.float32)

        image_mask = torch.zeros(1, S, dtype=torch.long)
        image_mask[:, img_begin:img_begin + n_img] = 1
        am = torch.ones(S, S, dtype=torch.bool).tril()[None]
        am[:, img_begin:img_begin + n_img, img_begin:img_begin + n_img] = True
        cos, sin = ref_mod.build_batch_2d_rope(
            seq_len=S,
            n_elem=TINY["attention_head_dim"],
            image_infos=[[(slice(img_begin, img_begin + n_img), (gh, gw))]],
            base=TINY["rope_theta"],
        )

        with torch.no_grad():
            out = ref(
                input_ids=torch.from_numpy(ids),
                attention_mask=am.unsqueeze(1),
                position_ids=torch.arange(S)[None],
                past_key_values=None,
                use_cache=False,
                custom_pos_emb=(cos.double(), sin.double()),
                mode="gen_image",
                first_step=True,
                images=torch.from_numpy(lat).double(),
                image_mask=image_mask,
                timestep=torch.from_numpy(t).double(),
                gen_timestep_scatter_index=torch.tensor([[img_begin - 1]]),
            )
        pred_ref = out["diffusion_prediction"].float().numpy()

        pred = np.asarray(model(
            jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ids),
            img_begin=img_begin))
        assert pred.shape == pred_ref.shape == (1, LAT_C, LAT_H, LAT_W)
        np.testing.assert_allclose(pred, pred_ref, atol=3e-4, rtol=3e-3)

    def test_prefix_only_layout_matches_scattered(self):
        """The engine's text-prefix convenience layout must equal the
        scattered layout with placeholders appended at the same positions."""
        from apex_studio_tpu.models.transformers.hunyuanimage3 import (
            HunyuanImage3Config,
            HunyuanImage3ForCausalMM,
        )

        cfg = HunyuanImage3Config(
            img_in_channels=LAT_C, img_out_channels=LAT_C,
            **{k: v for k, v in TINY.items() if k != "img_proj_type"})
        model = HunyuanImage3ForCausalMM(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        rng = np.random.default_rng(1)
        lat = jnp.asarray(rng.normal(size=(1, LAT_C, LAT_H, LAT_W)), jnp.float32)
        t = jnp.asarray([250.0], jnp.float32)
        text = jnp.asarray(rng.integers(0, TINY["vocab_size"], size=(1, L_TEXT)))
        gh, gw = LAT_H // TINY["patch_size"], LAT_W // TINY["patch_size"]
        full = jnp.concatenate(
            [text, jnp.zeros((1, 1 + gh * gw), text.dtype)], axis=1)
        a = np.asarray(model(lat, t, text))
        b = np.asarray(model(lat, t, full, img_begin=L_TEXT + 1))
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
