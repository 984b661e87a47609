import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.transformers.wan import WanConfig, WanTransformer3DModel
from apex_studio_tpu.models.vaes.wan_vae import AutoencoderKLWan, WanVAEConfig


@pytest.fixture(scope="module")
def tiny_wan():
    cfg = WanConfig(
        num_attention_heads=2,
        attention_head_dim=24,  # rope split (8, 8, 8)
        in_channels=4,
        out_channels=4,
        text_dim=32,
        freq_dim=32,
        ffn_dim=96,
        num_layers=2,
    )
    return WanTransformer3DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_wan_vae():
    cfg = WanVAEConfig(
        base_dim=8,
        z_dim=4,
        dim_mult=(1, 2),
        num_res_blocks=1,
        temperal_downsample=(True,),
        latents_mean=tuple([0.1] * 4),
        latents_std=tuple([2.0] * 4),
    )
    return AutoencoderKLWan(cfg)


class TestWanTransformer:
    def _inputs(self, cfg, b=1, t=3, h=8, w=8, lc=16, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 2)
        x = jax.random.normal(ks[0], (b, cfg.in_channels, t, h, w))
        ctx = jax.random.normal(ks[1], (b, lc, cfg.text_dim))
        tt = jnp.full((b,), 500.0)
        return x, tt, ctx

    def test_forward_shape(self, tiny_wan):
        x, t, ctx = self._inputs(tiny_wan.cfg)
        out = tiny_wan(x, t, ctx)
        assert out.shape == x.shape

    def test_rope_split_dims(self, tiny_wan):
        assert sum(tiny_wan.cfg.rope_axes_dims) == tiny_wan.cfg.attention_head_dim

    def test_text_conditioning(self, tiny_wan):
        x, t, ctx = self._inputs(tiny_wan.cfg)
        a = tiny_wan(x, t, ctx)
        b = tiny_wan(x, t, ctx * 2 + 1)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5

    def test_timestep_conditioning(self, tiny_wan):
        x, t, ctx = self._inputs(tiny_wan.cfg)
        a = tiny_wan(x, jnp.full((1,), 10.0), ctx)
        b = tiny_wan(x, jnp.full((1,), 990.0), ctx)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5

    def test_patchify_roundtrip(self, tiny_wan):
        """Input features are conv-ordered [C, pt, ph, pw]; the output side is
        checkpoint-ordered [pt, ph, pw, C] (reference model.py:1870, validated
        against the torch oracle in test_parity_wan_dit.py) — so the roundtrip
        holds after regrouping the token features."""
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 8, 8))
        tokens = tiny_wan.patchify(x)
        n_tok = 2 * 4 * 4
        assert tokens.shape == (1, n_tok, 4 * 1 * 2 * 2)
        # [C, pt, ph, pw] → [pt, ph, pw, C]
        out_order = tokens.reshape(1, n_tok, 4, 1, 2, 2).transpose(0, 1, 3, 4, 5, 2)
        back = tiny_wan.unpatchify(out_order.reshape(1, n_tok, -1), 2, 8, 8)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)

    def test_i2v_image_conditioning(self):
        cfg = WanConfig(
            num_attention_heads=2, attention_head_dim=24, in_channels=4,
            out_channels=4, text_dim=32, freq_dim=32, ffn_dim=96, num_layers=1,
            image_dim=16, added_kv_proj_dim=48,
        )
        m = WanTransformer3DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        x, t, ctx = (
            jax.random.normal(jax.random.PRNGKey(0), (1, 4, 1, 8, 8)),
            jnp.full((1,), 500.0),
            jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32)),
        )
        img_feats = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16))
        a = m(x, t, ctx)
        b = m(x, t, ctx, context_image=img_feats)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


class TestWanVAE:
    def test_encode_shapes(self, tiny_wan_vae):
        # 5 frames, one temporal downsample → 3 latent frames; spatial /2.
        video = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 5, 16, 16))
        z = tiny_wan_vae.encode(video)
        assert z.shape == (1, 4, 3, 8, 8)

    def test_decode_shapes(self, tiny_wan_vae):
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 8, 8))
        video = tiny_wan_vae.decode(z)
        assert video.shape == (1, 3, 5, 16, 16)

    def test_single_frame_image_mode(self, tiny_wan_vae):
        img = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 1, 16, 16))
        z = tiny_wan_vae.encode(img)
        assert z.shape == (1, 4, 1, 8, 8)
        out = tiny_wan_vae.decode(z)
        assert out.shape == (1, 3, 1, 16, 16)

    def test_latent_normalization_applied(self, tiny_wan_vae):
        video = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 1, 16, 16))
        z = np.asarray(tiny_wan_vae.encode(video))
        # raw = z*std + mean must round-trip through decode's denormalization:
        # check encode applied (raw - 0.1)/2.0 by recomputing without norm.
        cfg_nonorm = WanVAEConfig(
            base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
            temperal_downsample=(True,),
        )
        import copy

        from flax import nnx

        vae2 = AutoencoderKLWan(cfg_nonorm)
        nnx.update(vae2, nnx.state(tiny_wan_vae))
        raw = np.asarray(vae2.encode(video))
        np.testing.assert_allclose(z, (raw - 0.1) / 2.0, atol=1e-5)

    def test_causality_in_time(self, tiny_wan_vae):
        """Editing a later frame must not change earlier latent frames."""
        v1 = jnp.zeros((1, 3, 5, 16, 16))
        v2 = v1.at[:, :, 4].set(1.0)
        z1 = np.asarray(tiny_wan_vae.encode(v1))
        z2 = np.asarray(tiny_wan_vae.encode(v2))
        np.testing.assert_allclose(z1[:, :, 0], z2[:, :, 0], atol=1e-5)
        assert np.abs(z1[:, :, 2] - z2[:, :, 2]).max() > 1e-6

    def test_finite(self, tiny_wan_vae):
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 8, 8))
        assert np.isfinite(np.asarray(tiny_wan_vae.decode(z))).all()


class TestWanConverter:
    def test_dit_key_renames(self):
        from apex_studio_tpu.loaders.converters import convert_keys

        sd = {
            "patch_embedding.weight": np.zeros((8, 4, 1, 2, 2), np.float32),
            "condition_embedder.time_embedder.linear_1.weight": np.zeros((8, 4), np.float32),
            "condition_embedder.time_proj.weight": np.zeros((48, 8), np.float32),
            "condition_embedder.text_embedder.linear_2.weight": np.zeros((8, 8), np.float32),
            "blocks.0.attn1.to_out.0.weight": np.zeros((8, 8), np.float32),
            "blocks.0.norm2.weight": np.zeros((8,), np.float32),
            "blocks.0.ffn.net.0.proj.weight": np.zeros((16, 8), np.float32),
            "blocks.0.scale_shift_table": np.zeros((1, 6, 8), np.float32),
            "scale_shift_table": np.zeros((1, 2, 8), np.float32),
        }
        out = convert_keys("wan", sd)
        assert "patch_embedding.kernel" in out
        assert "time_embedder_linear_1.kernel" in out
        assert "time_proj.kernel" in out
        assert "text_embedder_linear_2.kernel" in out
        assert "blocks.0.attn1.to_out.kernel" in out
        assert "blocks.0.norm2_weight" in out
        assert "blocks.0.ffn.fc1.kernel" in out
        assert "blocks.0.scale_shift_table" in out

    def test_vae_key_renames(self):
        from apex_studio_tpu.loaders.converters import convert_keys

        sd = {
            "encoder.conv_in.weight": np.zeros((8, 3, 3, 3, 3), np.float32),
            "encoder.down_blocks.0.norm1.gamma": np.zeros((8, 1, 1, 1), np.float32),
            "encoder.down_blocks.2.resample.1.weight": np.zeros((8, 8, 3, 3), np.float32),
            "decoder.up_blocks.0.upsamplers.0.time_conv.weight": np.zeros((16, 8, 3, 1, 1), np.float32),
            "decoder.mid_block.attentions.0.to_qkv.weight": np.zeros((24, 8, 1, 1), np.float32),
        }
        out = convert_keys("wan_vae", sd)
        assert "encoder.conv_in.kernel" in out
        assert "encoder.down_blocks.0.norm1.gamma" in out
        assert "encoder.down_blocks.2.resample_conv.kernel" in out
        assert "decoder.up_blocks.0.upsamplers.0.time_conv.kernel" in out
        assert "decoder.mid_block.attentions.0.to_qkv_kernel" in out

    def test_load_patch_embedding_into_linear(self, tiny_wan):
        """Conv3d [O,C,pt,ph,pw] flattens into the Linear patch embed."""
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict

        d = tiny_wan.cfg.dim
        conv_w = np.random.default_rng(0).normal(size=(d, 4, 1, 2, 2)).astype(np.float32)
        missing, _ = apply_state_dict(
            tiny_wan, {"patch_embedding.kernel": conv_w}, strict=False
        )
        got = np.asarray(tiny_wan.patch_embedding.kernel.value)
        np.testing.assert_allclose(got, conv_w.reshape(d, -1).T, atol=1e-6)


class TestWan22VAE:
    """Wan 2.2 (TI2V-5B) VAE variant: patchified input, residual avg/dup
    shortcuts (reference vae/wan/model.py AvgDown3D:40, DupUp3D:92,
    patchify:1024, is_residual blocks :539/:732)."""

    def _tiny22(self):
        # dim_mult (1, 1): every avg/dup shortcut satisfies the reference's
        # channel-divisibility assert (AvgDown3D:54) at tiny scale
        cfg = WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 1),
                           num_res_blocks=1, temperal_downsample=(True,),
                           patch_size=2, is_residual=True)
        return AutoencoderKLWan(cfg, rngs=nnx.Rngs(0)), cfg

    def test_patchify_roundtrip_and_torch_parity(self):
        import torch

        from apex_studio_tpu.models.vaes.wan_vae import patchify, unpatchify

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 4, 8, 6)).astype(np.float32)
        p = patchify(jnp.asarray(x), 2)
        # reference view/permute semantics
        t = torch.from_numpy(x)
        b, c, f, h, w = t.shape
        ref = (t.view(b, c, f, h // 2, 2, w // 2, 2)
                .permute(0, 1, 4, 6, 2, 3, 5)
                .reshape(b, c * 4, f, h // 2, w // 2))
        np.testing.assert_allclose(np.asarray(p), ref.numpy(), atol=0)
        back = unpatchify(p, 2)
        np.testing.assert_allclose(np.asarray(back), x, atol=0)

    def test_avg_down_dup_up_torch_parity(self):
        import torch

        from apex_studio_tpu.models.vaes.wan_vae import avg_down_3d, dup_up_3d

        rng = np.random.default_rng(1)
        # NDHWC input, channel count divides the grouped factor product
        x = rng.normal(size=(1, 5, 4, 4, 8)).astype(np.float32)
        out_ch, ft, fs = 16, 2, 2
        got = avg_down_3d(jnp.asarray(x), out_ch, ft, fs)

        t = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NCTHW
        pad_t = (ft - t.shape[2] % ft) % ft
        t = torch.nn.functional.pad(t, (0, 0, 0, 0, pad_t, 0))
        B, C, T, H, W = t.shape
        r = (t.view(B, C, T // ft, ft, H // fs, fs, W // fs, fs)
              .permute(0, 1, 3, 5, 7, 2, 4, 6).contiguous()
              .view(B, C * ft * fs * fs, T // ft, H // fs, W // fs))
        group = C * ft * fs * fs // out_ch
        r = r.view(B, out_ch, group, T // ft, H // fs, W // fs).mean(2)
        np.testing.assert_allclose(
            np.asarray(got), r.numpy().transpose(0, 2, 3, 4, 1), atol=1e-6)

        # dup-up: channel-major duplication + trim of the ft-1 lead frames
        y = rng.normal(size=(1, 3, 2, 2, 8)).astype(np.float32)
        out_ch2 = 4
        got2 = dup_up_3d(jnp.asarray(y), out_ch2, ft, fs, first_chunk=True)
        t2 = torch.from_numpy(y.transpose(0, 4, 1, 2, 3))
        reps = out_ch2 * ft * fs * fs // t2.shape[1]
        u = t2.repeat_interleave(reps, dim=1)
        B, _, T, H, W = u.shape
        u = (u.view(B, out_ch2, ft, fs, fs, T, H, W)
              .permute(0, 1, 5, 2, 6, 3, 7, 4).contiguous()
              .view(B, out_ch2, T * ft, H * fs, W * fs))
        u = u[:, :, ft - 1:]
        np.testing.assert_allclose(
            np.asarray(got2), u.numpy().transpose(0, 2, 3, 4, 1), atol=1e-6)

    def test_encode_decode_shapes_16x_4x(self):
        vae, cfg = self._tiny22()
        assert cfg.spatial_scale == 4 and cfg.temporal_scale == 2
        video = jnp.asarray(
            np.random.default_rng(2).normal(size=(1, 3, 5, 16, 16)), jnp.float32)
        z = vae.encode(video)
        assert z.shape == (1, 4, 3, 4, 4), z.shape
        out = vae.decode(z)
        assert out.shape == (1, 3, 5, 16, 16), out.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_converter_names_cover_residual_blocks(self):
        """Diffusers-layout 2.2 keys (resnets/downsampler/upsampler/
        resample.1/time_conv) map onto our module paths with nothing
        unexpected."""
        import dataclasses as dc

        from apex_studio_tpu.loaders.converters import converter_registry
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict

        vae, cfg = self._tiny22()
        conv = converter_registry.get("wan_vae")

        # build a synthetic torch-layout state dict from our own param tree
        from flax import nnx as _nnx

        flat = _nnx.to_flat_state(_nnx.state(vae))
        sd = {}
        for kp, leaf in flat:
            path = ".".join(str(p) for p in kp)
            v = np.asarray(leaf.value, np.float32)
            tk = (path
                  .replace(".resample_conv.", ".resample.1.")
                  .replace(".to_qkv_kernel", ".to_qkv.weight")
                  .replace(".to_qkv_bias", ".to_qkv.bias")
                  .replace(".proj_kernel", ".proj.weight")
                  .replace(".proj_bias", ".proj.bias"))
            if tk.endswith((".to_qkv.weight", ".proj.weight")) and v.ndim == 2:
                v = v.T  # torch Conv2d-1x1 layout [out, in]
            if tk.endswith(".kernel"):
                tk = tk[:-7] + ".weight"
                if v.ndim == 5:
                    v = v.transpose(4, 3, 0, 1, 2)  # DHWIO → OIDHW
                elif v.ndim == 4:
                    v = v.transpose(3, 2, 0, 1)
                elif v.ndim == 2:
                    v = v.T
            sd[tk] = v
        mapped = conv.convert(sd)
        vae2, _ = self._tiny22()
        missing, unexpected = apply_state_dict(vae2, mapped, strict=False)
        assert not unexpected, unexpected[:5]
        assert not missing, missing[:5]
