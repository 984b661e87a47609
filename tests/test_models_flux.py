import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.text_encoders.clip import CLIPTextConfig, CLIPTextEncoder
from apex_studio_tpu.models.text_encoders.t5 import (
    T5Config,
    T5Encoder,
    relative_position_buckets,
)
from apex_studio_tpu.models.transformers.flux import FluxConfig, FluxTransformer2DModel


@pytest.fixture(scope="module")
def tiny_flux():
    cfg = FluxConfig(
        in_channels=16,
        out_channels=16,
        num_layers=1,
        num_single_layers=2,
        attention_head_dim=32,
        num_attention_heads=2,
        joint_attention_dim=48,
        pooled_projection_dim=24,
        guidance_embeds=True,
        axes_dims_rope=(8, 12, 12),
    )
    return FluxTransformer2DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)


class TestFluxTransformer:
    def _inputs(self, cfg, b=1, h_tok=4, w_tok=4, n_txt=8, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        x = jax.random.normal(ks[0], (b, h_tok * w_tok, cfg.in_channels))
        txt = jax.random.normal(ks[1], (b, n_txt, cfg.joint_attention_dim))
        pooled = jax.random.normal(ks[2], (b, cfg.pooled_projection_dim))
        t = jnp.full((b,), 0.5)
        g = jnp.full((b,), 3.5)
        return x, txt, pooled, t, g

    def test_forward_shape(self, tiny_flux):
        x, txt, pooled, t, g = self._inputs(tiny_flux.cfg)
        out = tiny_flux(x, txt, pooled, t, g, grid_hw=(4, 4))
        assert out.shape == (1, 16, tiny_flux.cfg.out_channels)

    def test_guidance_changes_output(self, tiny_flux):
        x, txt, pooled, t, g = self._inputs(tiny_flux.cfg)
        a = tiny_flux(x, txt, pooled, t, jnp.full((1,), 1.0), grid_hw=(4, 4))
        b = tiny_flux(x, txt, pooled, t, jnp.full((1,), 8.0), grid_hw=(4, 4))
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5

    def test_text_changes_output(self, tiny_flux):
        x, txt, pooled, t, g = self._inputs(tiny_flux.cfg)
        a = tiny_flux(x, txt, pooled, t, g, grid_hw=(4, 4))
        b = tiny_flux(x, txt * 2 + 1, pooled, t, g, grid_hw=(4, 4))
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5

    def test_pack_unpack_roundtrip(self, tiny_flux):
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8, 8))
        packed = tiny_flux.pack_latents(z)
        assert packed.shape == (2, 16, 64)
        back = tiny_flux.unpack_latents(packed, 8, 8)
        np.testing.assert_allclose(np.asarray(back), np.asarray(z), atol=1e-6)

    def test_rope_positions_differ_for_image_tokens(self, tiny_flux):
        cos, sin = tiny_flux.rope_tables(4, 2, 2)
        # txt tokens share position 0 → identical tables; img tokens differ.
        c = np.asarray(cos)[0, :, 0]
        assert np.allclose(c[0], c[3])  # txt tokens
        assert not np.allclose(c[4], c[5])  # img tokens


class TestT5Encoder:
    @pytest.fixture(scope="class")
    def tiny_t5(self):
        cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2, num_heads=4)
        return T5Encoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)

    def test_forward_shape(self, tiny_t5):
        ids = jnp.arange(10)[None, :] % 64
        out = tiny_t5(ids)
        assert out.shape == (1, 10, 32)

    def test_not_causal(self, tiny_t5):
        """Encoder is bidirectional: changing a later token changes earlier outputs."""
        a = np.asarray(tiny_t5(jnp.array([[1, 2, 3, 4]])))
        b = np.asarray(tiny_t5(jnp.array([[1, 2, 3, 63]])))
        assert np.abs(a[0, 0] - b[0, 0]).max() > 1e-6

    def test_padding_mask(self, tiny_t5):
        ids = jnp.array([[1, 2, 3, 0, 0]])
        mask = jnp.array([[1, 1, 1, 0, 0]])
        out_m = np.asarray(tiny_t5(ids, attention_mask=mask))
        out_s = np.asarray(tiny_t5(jnp.array([[1, 2, 3]])))
        np.testing.assert_allclose(out_m[0, :3], out_s[0], atol=1e-5)

    def test_umt5_per_layer_bias(self):
        cfg = T5Config(vocab_size=16, d_model=16, d_kv=4, d_ff=32, num_layers=2,
                       num_heads=4, per_layer_relative_bias=True)
        model = T5Encoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        assert all(b.attention.relative_attention_bias is not None for b in model.blocks)

    def test_bucket_function_symmetric_range(self):
        b = relative_position_buckets(8, 8, num_buckets=32, max_distance=16)
        assert b.shape == (8, 8)
        assert b.min() >= 0 and b.max() < 32
        assert b[0, 0] == b[5, 5]  # same relative distance → same bucket


class TestCLIPEncoder:
    @pytest.fixture(scope="class")
    def tiny_clip(self):
        cfg = CLIPTextConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        )
        return CLIPTextEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)

    def test_shapes(self, tiny_clip):
        ids = jnp.array([[5, 9, 63, 0, 0]])  # 63 = highest id = "EOS"
        seq, pooled = tiny_clip(ids)
        assert seq.shape == (1, 5, 32)
        assert pooled.shape == (1, 32)

    def test_pooled_is_eos_position(self, tiny_clip):
        ids = jnp.array([[5, 9, 63, 0, 0]])
        seq, pooled = tiny_clip(ids)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(seq)[:, 2], atol=1e-6)

    def test_causal(self, tiny_clip):
        a, _ = tiny_clip(jnp.array([[1, 2, 3, 4]]))
        b, _ = tiny_clip(jnp.array([[1, 2, 3, 9]]))
        np.testing.assert_allclose(np.asarray(a)[0, :3], np.asarray(b)[0, :3], atol=1e-5)


class TestFluxConverter:
    def test_key_renames(self):
        from apex_studio_tpu.loaders.converters import convert_keys

        sd = {
            "time_text_embed.timestep_embedder.linear_1.weight": np.zeros((8, 4), np.float32),
            "transformer_blocks.0.norm1.linear.weight": np.zeros((8, 4), np.float32),
            "transformer_blocks.0.attn.to_out.0.weight": np.zeros((4, 4), np.float32),
            "transformer_blocks.0.ff.net.0.proj.weight": np.zeros((8, 4), np.float32),
            "transformer_blocks.0.ff_context.net.2.weight": np.zeros((4, 8), np.float32),
            "single_transformer_blocks.3.norm.linear.weight": np.zeros((12, 4), np.float32),
            "single_transformer_blocks.3.attn.to_q.weight": np.zeros((4, 4), np.float32),
            "norm_out.linear.weight": np.zeros((8, 4), np.float32),
            "proj_out.weight": np.zeros((4, 4), np.float32),
        }
        out = convert_keys("flux", sd)
        assert "time_text_embed.timestep_linear_1.kernel" in out
        assert "transformer_blocks.0.norm1_linear.kernel" in out
        assert "transformer_blocks.0.attn.to_out.kernel" in out
        assert "transformer_blocks.0.ff.fc1.kernel" in out
        assert "transformer_blocks.0.ff_context.fc2.kernel" in out
        assert "single_transformer_blocks.3.norm_linear.kernel" in out
        assert "single_transformer_blocks.3.to_q.kernel" in out
        assert "norm_out_linear.kernel" in out
        assert "proj_out.kernel" in out

    def test_t5_and_clip_renames(self):
        from apex_studio_tpu.loaders.converters import convert_keys

        t5 = convert_keys(
            "t5",
            {
                "shared.weight": np.zeros((8, 4), np.float32),
                "encoder.block.0.layer.0.SelfAttention.q.weight": np.zeros((4, 4), np.float32),
                "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight": np.zeros((32, 4), np.float32),
                "encoder.block.1.layer.1.DenseReluDense.wi_0.weight": np.zeros((8, 4), np.float32),
                "encoder.final_layer_norm.weight": np.zeros((4,), np.float32),
            },
        )
        assert "shared" in t5
        assert "blocks.0.attention.q.kernel" in t5
        assert "blocks.0.attention.relative_attention_bias" in t5
        assert "blocks.1.ff.wi_0.kernel" in t5

        clip = convert_keys(
            "clip",
            {
                "text_model.embeddings.token_embedding.weight": np.zeros((8, 4), np.float32),
                "text_model.encoder.layers.0.self_attn.q_proj.weight": np.zeros((4, 4), np.float32),
                "text_model.encoder.layers.0.self_attn.q_proj.bias": np.zeros((4,), np.float32),
                "text_model.final_layer_norm.weight": np.zeros((4,), np.float32),
                "text_model.embeddings.position_ids": np.zeros((1, 4), np.float32),
            },
        )
        assert "token_embedding" in clip
        assert "layers.0.self_attn.q_proj.kernel" in clip
        assert "layers.0.self_attn.q_proj.bias" in clip
        assert not any("position_ids" in k for k in clip)


class TestFluxBFLConverter:
    def test_bfl_layout_roundtrip(self):
        """A full BFL single-file layout must load into the tiny flux model."""
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.flux import FluxConfig, FluxTransformer2DModel

        cfg = FluxConfig(
            in_channels=16, out_channels=16, num_layers=1, num_single_layers=1,
            attention_head_dim=8, num_attention_heads=2, joint_attention_dim=24,
            pooled_projection_dim=12, guidance_embeds=True, axes_dims_rope=(2, 3, 3),
        )
        model = FluxTransformer2DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        d = cfg.dim
        rng = np.random.default_rng(0)

        def w(o, i):
            return rng.normal(size=(o, i)).astype(np.float32)

        def b(o):
            return rng.normal(size=(o,)).astype(np.float32)

        sd = {}
        pre = "model.diffusion_model."
        sd[pre + "img_in.weight"] = w(d, 16); sd[pre + "img_in.bias"] = b(d)
        sd[pre + "txt_in.weight"] = w(d, 24); sd[pre + "txt_in.bias"] = b(d)
        for name, din in (("time_in", 256), ("vector_in", 12), ("guidance_in", 256)):
            sd[pre + f"{name}.in_layer.weight"] = w(d, din)
            sd[pre + f"{name}.in_layer.bias"] = b(d)
            sd[pre + f"{name}.out_layer.weight"] = w(d, d)
            sd[pre + f"{name}.out_layer.bias"] = b(d)
        for s in ("img", "txt"):
            sd[pre + f"double_blocks.0.{s}_mod.lin.weight"] = w(6 * d, d)
            sd[pre + f"double_blocks.0.{s}_mod.lin.bias"] = b(6 * d)
            sd[pre + f"double_blocks.0.{s}_attn.qkv.weight"] = w(3 * d, d)
            sd[pre + f"double_blocks.0.{s}_attn.qkv.bias"] = b(3 * d)
            sd[pre + f"double_blocks.0.{s}_attn.norm.query_norm.scale"] = b(8)
            sd[pre + f"double_blocks.0.{s}_attn.norm.key_norm.scale"] = b(8)
            sd[pre + f"double_blocks.0.{s}_attn.proj.weight"] = w(d, d)
            sd[pre + f"double_blocks.0.{s}_attn.proj.bias"] = b(d)
            sd[pre + f"double_blocks.0.{s}_mlp.0.weight"] = w(4 * d, d)
            sd[pre + f"double_blocks.0.{s}_mlp.0.bias"] = b(4 * d)
            sd[pre + f"double_blocks.0.{s}_mlp.2.weight"] = w(d, 4 * d)
            sd[pre + f"double_blocks.0.{s}_mlp.2.bias"] = b(d)
        sd[pre + "single_blocks.0.linear1.weight"] = w(7 * d, d)
        sd[pre + "single_blocks.0.linear1.bias"] = b(7 * d)
        sd[pre + "single_blocks.0.linear2.weight"] = w(d, 5 * d)
        sd[pre + "single_blocks.0.linear2.bias"] = b(d)
        sd[pre + "single_blocks.0.modulation.lin.weight"] = w(3 * d, d)
        sd[pre + "single_blocks.0.modulation.lin.bias"] = b(3 * d)
        sd[pre + "single_blocks.0.norm.query_norm.scale"] = b(8)
        sd[pre + "single_blocks.0.norm.key_norm.scale"] = b(8)
        sd[pre + "final_layer.linear.weight"] = w(16, d)
        sd[pre + "final_layer.linear.bias"] = b(16)
        sd[pre + "final_layer.adaLN_modulation.1.weight"] = w(2 * d, d)
        sd[pre + "final_layer.adaLN_modulation.1.bias"] = b(2 * d)

        mapped = convert_keys("flux", sd)
        missing, unexpected = apply_state_dict(model, mapped, strict=True)
        assert not missing and not unexpected

        # qkv split landed in the right projections
        qkv = sd[pre + "double_blocks.0.img_attn.qkv.weight"]
        np.testing.assert_allclose(
            np.asarray(model.transformer_blocks[0].attn.to_k.kernel.value),
            qkv[d : 2 * d].T,
        )
        # final adaLN swapped to scale-first
        ada = sd[pre + "final_layer.adaLN_modulation.1.weight"]
        np.testing.assert_allclose(
            np.asarray(model.norm_out_linear.kernel.value)[:, :d], ada[d:].T
        )
