"""Converter completeness: synthetic diffusers-layout checkpoints must map
onto every model parameter (strict apply both directions)."""

import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.loaders.converters import convert_keys
from apex_studio_tpu.loaders.state_mapping import apply_state_dict


def diffusers_cog_transformer_sd(n_layers=1, dim=32, txt=32, temb=32, cin=4, p=2, head=16):
    sd = {}
    sd["patch_embed.proj.weight"] = np.zeros((dim, cin, p, p), np.float32)
    sd["patch_embed.proj.bias"] = np.zeros((dim,), np.float32)
    sd["patch_embed.text_proj.weight"] = np.zeros((dim, txt), np.float32)
    sd["patch_embed.text_proj.bias"] = np.zeros((dim,), np.float32)
    sd["time_embedding.linear_1.weight"] = np.zeros((temb, dim), np.float32)
    sd["time_embedding.linear_1.bias"] = np.zeros((temb,), np.float32)
    sd["time_embedding.linear_2.weight"] = np.zeros((temb, temb), np.float32)
    sd["time_embedding.linear_2.bias"] = np.zeros((temb,), np.float32)
    for i in range(n_layers):
        b = f"transformer_blocks.{i}"
        for nz in ("norm1", "norm2"):
            sd[f"{b}.{nz}.linear.weight"] = np.zeros((6 * dim, temb), np.float32)
            sd[f"{b}.{nz}.linear.bias"] = np.zeros((6 * dim,), np.float32)
            sd[f"{b}.{nz}.norm.weight"] = np.ones((dim,), np.float32)
            sd[f"{b}.{nz}.norm.bias"] = np.zeros((dim,), np.float32)
        for proj in ("to_q", "to_k", "to_v"):
            sd[f"{b}.attn1.{proj}.weight"] = np.zeros((dim, dim), np.float32)
            sd[f"{b}.attn1.{proj}.bias"] = np.zeros((dim,), np.float32)
        sd[f"{b}.attn1.norm_q.weight"] = np.ones((head,), np.float32)
        sd[f"{b}.attn1.norm_q.bias"] = np.zeros((head,), np.float32)
        sd[f"{b}.attn1.norm_k.weight"] = np.ones((head,), np.float32)
        sd[f"{b}.attn1.norm_k.bias"] = np.zeros((head,), np.float32)
        sd[f"{b}.attn1.to_out.0.weight"] = np.zeros((dim, dim), np.float32)
        sd[f"{b}.attn1.to_out.0.bias"] = np.zeros((dim,), np.float32)
        sd[f"{b}.ff.net.0.proj.weight"] = np.zeros((4 * dim, dim), np.float32)
        sd[f"{b}.ff.net.0.proj.bias"] = np.zeros((4 * dim,), np.float32)
        sd[f"{b}.ff.net.2.weight"] = np.zeros((dim, 4 * dim), np.float32)
        sd[f"{b}.ff.net.2.bias"] = np.zeros((dim,), np.float32)
    sd["norm_final.weight"] = np.ones((dim,), np.float32)
    sd["norm_final.bias"] = np.zeros((dim,), np.float32)
    sd["norm_out.linear.weight"] = np.zeros((2 * dim, temb), np.float32)
    sd["norm_out.linear.bias"] = np.zeros((2 * dim,), np.float32)
    sd["proj_out.weight"] = np.zeros((p * p * cin, dim), np.float32)
    sd["proj_out.bias"] = np.zeros((p * p * cin,), np.float32)
    return sd


class TestCogVideoXConverter:
    def test_transformer_roundtrip_strict(self):
        from apex_studio_tpu.models.transformers.cogvideox import (
            CogVideoXConfig,
            CogVideoXTransformer3DModel,
        )

        cfg = CogVideoXConfig(
            num_attention_heads=2, attention_head_dim=16, in_channels=4,
            out_channels=4, num_layers=1, text_embed_dim=32, time_embed_dim=32,
        )
        m = CogVideoXTransformer3DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        sd = convert_keys("cogvideo", diffusers_cog_transformer_sd())
        missing, unexpected = apply_state_dict(m, sd, strict=True)
        assert not missing and not unexpected

    # The synthetic VAE key-roundtrip test was superseded by the full
    # reference-as-oracle strict roundtrip (weights AND numerics) in
    # tests/test_parity_cogvideox_vae.py.

class TestMochiConverter:
    def test_transformer_key_shapes(self):
        """Spot-check the rename table (full-model roundtrip is covered by
        the family pattern above; mochi adds asymmetric streams)."""
        sd = {
            "patch_embed.proj.weight": np.zeros((32, 4, 2, 2)),
            "pos_frequencies": np.zeros((3, 2, 8)),
            "time_embed.timestep_embedder.linear_1.weight": np.zeros((32, 32)),
            "time_embed.pooler.to_kv.weight": np.zeros((64, 32)),
            "time_embed.caption_proj.weight": np.zeros((16, 32)),
            "transformer_blocks.0.norm1.linear.weight": np.zeros((128, 32)),
            "transformer_blocks.0.norm1_context.linear.weight": np.zeros((64, 32)),
            "transformer_blocks.0.attn1.to_q.weight": np.zeros((32, 32)),
            "transformer_blocks.0.attn1.norm_q.weight": np.zeros((16,)),
            "transformer_blocks.0.attn1.add_q_proj.weight": np.zeros((32, 16)),
            "transformer_blocks.0.attn1.to_out.0.weight": np.zeros((32, 32)),
            "transformer_blocks.0.attn1.to_add_out.weight": np.zeros((16, 32)),
            "transformer_blocks.0.ff.net.0.proj.weight": np.zeros((256, 32)),
            "transformer_blocks.0.ff_context.net.2.weight": np.zeros((16, 64)),
            "norm_out.linear.weight": np.zeros((32, 32)),
            "proj_out.weight": np.zeros((16, 32)),
        }
        out = convert_keys("mochi", sd)
        expect = {
            "patch_proj.kernel",
            "rope.pos_frequencies",
            "time_embed.in_layer.kernel",
            "pooler.to_kv.kernel",
            "caption_proj.kernel",
            "blocks.0.mod_x.kernel",
            "blocks.0.mod_y.kernel",
            "blocks.0.attn.to_q.kernel",
            "blocks.0.attn.norm_q",
            "blocks.0.attn.add_q_proj.kernel",
            "blocks.0.attn.to_out.kernel",
            "blocks.0.attn.to_add_out.kernel",
            "blocks.0.ff_x.proj_in.kernel",
            "blocks.0.ff_y.proj_out.kernel",
            "norm_out_linear.kernel",
            "proj_out.kernel",
        }
        assert expect == set(out)

    def test_vae_decoder_keys(self):
        """Reference layout (mochi/model.py): plain Conv3d conv_in, wrapped
        causal convs, Linear projections, norm_layer-wrapped group norms.
        (Full strict roundtrip + numerics: tests/test_parity_mochi_vae.py.)"""
        sd = {
            "decoder.conv_in.weight": np.zeros((24, 4, 1, 1, 1)),
            "decoder.conv_in.bias": np.zeros((24,)),
            "decoder.block_in.resnets.0.norm1.norm_layer.weight": np.zeros((24,)),
            "decoder.up_blocks.0.resnets.0.conv1.conv.weight": np.zeros((24, 24, 3, 3, 3)),
            "decoder.up_blocks.0.proj.weight": np.zeros((128, 24)),
            "decoder.proj_out.weight": np.zeros((3, 8)),
            "encoder.down_blocks.0.conv_in.conv.weight": np.zeros((8, 3, 1, 2, 2)),
            "encoder.block_in.attentions.0.to_out.0.weight": np.zeros((8, 8)),
        }
        out = convert_keys("mochi_vae", sd)
        assert "decoder.conv_in.kernel" in out
        assert "decoder.block_in.resnets.0.norm1.weight" in out
        assert "decoder.up_blocks.0.resnets.0.conv1.kernel" in out
        assert "decoder.up_blocks.0.proj.kernel" in out
        assert "decoder.proj_out.kernel" in out
        assert "encoder.down_blocks.0.conv_in.kernel" in out
        assert "encoder.block_in.attentions.0.to_out.kernel" in out


class TestVAEFamilyRouting:
    def test_load_vae_prefers_family_vae_converter(self, tmp_path):
        """wan.base VAE specs must route through the wan_vae converter, not
        the wan DiT converter (regression: _load_vae family naming)."""
        import yaml

        from tests.test_engine_wan import WAN_TINY
        from tests.test_engine_zimage import make_tokenizer

        doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
        path = tmp_path / "wan.yml"
        path.write_text(yaml.safe_dump(doc))
        from unittest.mock import patch

        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="t2v")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        seen = {}
        orig = type(eng)._instantiate_family

        def spy(self, registry, spec, converter_family):
            seen["family"] = converter_family
            return orig(self, registry, spec, converter_family)

        with patch.object(type(eng), "_instantiate_family", spy):
            eng.load_component_by_type("vae")
        assert seen["family"] == "wan_vae"
