"""MAGI-1 family on tiny random weights: transformer (per-chunk timesteps,
block-causal mask), ViT VAE round shape, chunk scheduler, and the sliding-
window engine (reference: src/engine/magi/, src/scheduler/magi.py,
src/transformer/magi/, src/vae/magi/)."""

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_zimage import make_tokenizer

MAGI_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "magi-tiny-test", "name": "Magi Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "magi",
        "model_type": ["t2v", "i2v", "v2v"],
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "MagiScheduler",
                "config": {"num_inference_steps": 4, "shift": 3.0},
            },
            {
                "type": "vae",
                "base": "magi.base",
                "config": {
                    "video_size": 32, "video_length": 8, "patch_size": 8,
                    "patch_length": 4, "z_chans": 4, "embed_dim": 16,
                    "depth": 1, "num_heads": 2,
                },
            },
            {
                "type": "text_encoder",
                "base": "UMT5EncoderModel",
                "config": {
                    "vocab_size": 64, "d_model": 16, "d_kv": 8, "d_ff": 32,
                    "num_layers": 1, "num_heads": 2,
                    "per_layer_relative_bias": True,
                },
            },
            {
                "type": "transformer",
                "base": "magi.base",
                "config": {
                    "num_layers": 1, "num_attention_heads": 2,
                    "attention_head_dim": 16, "ffn_dim": 32,
                    "num_query_groups": 2, "in_channels": 4, "out_channels": 4,
                    "patch_size": 2, "t_patch_size": 1, "caption_channels": 16,
                    "caption_max_length": 8, "cond_hidden_ratio": 0.25,
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 4}},
    },
}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "magi-tiny.yml"
    path.write_text(yaml.safe_dump(MAGI_TINY))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path, model_type="t2v")
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestMagiScheduler:
    def test_sd3_schedule_monotone_noise_to_clean(self):
        from apex_studio_tpu.schedulers.magi import MagiScheduler

        s = MagiScheduler(num_inference_steps=8, shift=3.0)
        t = s.timesteps
        assert len(t) == 9
        assert t[0] == 0.0 and abs(t[-1] - 1.0) < 1e-9
        assert np.all(np.diff(t) > 0)
        # sd3 shift compresses early (noisy) timesteps
        assert t[4] < 0.5

    def test_shortcut_12(self):
        from apex_studio_tpu.schedulers.magi import MagiScheduler

        s = MagiScheduler(num_inference_steps=12)
        assert len(s.timesteps) == 13

    def test_chunkwise_step(self):
        from apex_studio_tpu.schedulers.magi import MagiScheduler

        s = MagiScheduler(num_inference_steps=4)
        s.set_scheduler_params(chunk_width=2, denoise_step_per_stage=2)
        x = jnp.zeros((1, 1, 4, 1, 1))  # 2 chunks of width 2
        v = jnp.ones_like(x)
        y = s.step(x, v, t_start=0, t_end=2, i=0)
        y = np.asarray(y)[0, 0, :, 0, 0]
        # newest chunk (t index smaller) gets a different dt than older chunk
        t = s.timesteps
        dt_old = t[3] - t[2]   # chunk at stage idx 1*2+0 → 2
        dt_new = t[1] - t[0]
        np.testing.assert_allclose(y[:2], dt_old, atol=1e-7)
        np.testing.assert_allclose(y[2:], dt_new, atol=1e-7)


class TestMagiModel:
    def _model(self):
        from apex_studio_tpu.models.transformers.magi import (
            MagiConfig, MagiTransformer3DModel)

        cfg = MagiConfig.from_dict(MAGI_TINY["spec"]["components"][3]["config"])
        return MagiTransformer3DModel(cfg, dtype=jnp.float32,
                                      param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def test_per_chunk_timesteps_change_output_locally(self):
        m = self._model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 8)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(1, 2, 6, 16)), jnp.float32)
        base = m(x, jnp.asarray([[0.2, 0.8]]), y)
        # changing ONLY the second chunk's timestep must not change chunk 0
        # (block-causal: chunk 0 never sees chunk 1)
        moved = m(x, jnp.asarray([[0.2, 0.3]]), y)
        np.testing.assert_allclose(np.asarray(base)[:, :, :2],
                                   np.asarray(moved)[:, :, :2], atol=1e-5)
        assert np.abs(np.asarray(base)[:, :, 2:] -
                      np.asarray(moved)[:, :, 2:]).max() > 1e-4

    def test_block_causality_on_inputs(self):
        m = self._model()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 8)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(1, 2, 6, 16)), jnp.float32)
        t = jnp.asarray([[0.4, 0.6]])
        base = m(x, t, y)
        # perturbing chunk 1 latents must leave chunk 0 output untouched
        x2 = x.at[:, :, 2:].add(1.0)
        out = m(x2, t, y)
        np.testing.assert_allclose(np.asarray(base)[:, :, :2],
                                   np.asarray(out)[:, :, :2], atol=1e-5)

    def test_caption_dropout_changes_output(self):
        m = self._model()
        rng = np.random.default_rng(2)
        # the two learned adaLN tokens ([-2]=kept, [-1]=dropped) initialize to
        # zero; give them distinct values as a trained checkpoint would have
        m.null_caption_embedding.value = jnp.asarray(
            rng.normal(size=m.null_caption_embedding.value.shape), jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(1, 1, 6, 16)), jnp.float32)
        t = jnp.asarray([[0.5]])
        a = m(x, t, y, caption_dropout=False)
        b = m(x, t, y, caption_dropout=True)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


class TestMagiVAE:
    def test_encode_decode_shapes(self):
        from apex_studio_tpu.models.vaes.magi_vae import (
            AutoencoderKLMagi, MagiVAEConfig)

        cfg = MagiVAEConfig.from_dict(MAGI_TINY["spec"]["components"][1]["config"])
        vae = AutoencoderKLMagi(cfg, rngs=nnx.Rngs(0))
        video = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 8, 32, 32)),
                            jnp.float32)
        z = vae.encode(video)
        assert z.shape == (1, 4, 2, 4, 4)
        out = vae.decode(z)
        assert out.shape == (1, 3, 8, 32, 32)

    def test_pos_embed_resize_path(self):
        from apex_studio_tpu.models.vaes.magi_vae import (
            AutoencoderKLMagi, MagiVAEConfig)

        cfg = MagiVAEConfig.from_dict(MAGI_TINY["spec"]["components"][1]["config"])
        vae = AutoencoderKLMagi(cfg, rngs=nnx.Rngs(0))
        video = jnp.ones((1, 3, 4, 48, 32), jnp.float32)  # off-grid size
        z = vae.encode(video)
        assert z.shape == (1, 4, 1, 6, 4)


class TestMagiEngine:
    def test_t2v_produces_frames(self, engine):
        frames = engine.run(
            prompt="a river at dawn", height=32, width=32, num_frames=16,
            num_inference_steps=4, seed=0, chunk_width=2, window_size=2,
        )
        assert len(frames) == 16
        assert frames[0].shape == (32, 32, 3) and frames[0].dtype == np.uint8

    def test_t2v_latents_deterministic(self, engine):
        common = dict(prompt="x", height=32, width=32, num_frames=16,
                      num_inference_steps=4, seed=9, chunk_width=2,
                      window_size=2, return_latents=True)
        a = np.asarray(engine.run(**common))
        b = np.asarray(engine.run(**common))
        np.testing.assert_array_equal(a, b)
        assert np.isfinite(a).all()

    def test_cfg1_runs(self, engine):
        lat = engine.run(prompt="y", height=32, width=32, num_frames=8,
                         num_inference_steps=2, seed=1, chunk_width=2,
                         window_size=1, cfg_number=1, return_latents=True)
        assert np.isfinite(np.asarray(lat)).all()

    def test_v2v_prefix_kept(self, tmp_path_factory):
        path = tmp_path_factory.mktemp("m") / "magi-v2v.yml"
        path.write_text(yaml.safe_dump(MAGI_TINY))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="v2v")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        rng = np.random.default_rng(4)
        vid = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
               for _ in range(8)]  # 2 latent frames = 1 chunk @ width 2
        lat = eng.run(video=vid, prompt="continue", height=32, width=32,
                      num_frames=16, num_inference_steps=2, seed=2,
                      chunk_width=2, window_size=2, return_latents=True)
        lat = np.asarray(lat)
        assert lat.shape[2] == 4  # 2 chunks
        assert np.isfinite(lat).all()


class TestMagiConverter:
    def test_dit_strict_load(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.transformers.magi import (
            MagiConfig, MagiTransformer3DModel)

        cfg = MagiConfig.from_dict(MAGI_TINY["spec"]["components"][3]["config"])
        m = MagiTransformer3DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                                   rngs=nnx.Rngs(0))
        rng = np.random.default_rng(7)

        def r(*shape):
            return rng.normal(size=shape).astype(np.float32) * 0.02

        d, kv, cd = cfg.dim, cfg.kv_dim, cfg.cond_dim
        hd = cfg.attention_head_dim
        xd = int(d * cfg.xattn_cond_hidden_ratio)
        pd = cfg.in_channels * cfg.t_patch_size * cfg.patch_size ** 2
        sd = {
            "patch_embedding.weight": r(d, cfg.in_channels, cfg.t_patch_size,
                                        cfg.patch_size, cfg.patch_size),
            "timestep_embedding.mlp.0.weight": r(cd, cfg.frequency_embedding_size),
            "timestep_embedding.mlp.0.bias": r(cd),
            "timestep_embedding.mlp.2.weight": r(cd, cd),
            "timestep_embedding.mlp.2.bias": r(cd),
            "caption_embedding.y_proj_xattn.0.weight": r(xd, cfg.caption_channels),
            "caption_embedding.y_proj_xattn.0.bias": r(xd),
            "caption_embedding.y_proj_adaln.0.weight": r(cd, cfg.caption_channels),
            "caption_embedding.y_proj_adaln.0.bias": r(cd),
            "caption_embedding.null_caption_embedding": r(cfg.caption_max_length,
                                                          cfg.caption_channels),
            "rope.bands": r(hd // 8),
            "norm_out.weight": np.zeros((d,), np.float32),  # zero-centered
            "norm_out.bias": r(d),
            "proj_out.linear.weight": r(cfg.patch_size ** 2 * cfg.t_patch_size
                                        * cfg.out_channels, d),
        }
        for i in range(cfg.num_layers):
            b = f"blocks.{i}"
            sd.update({
                f"{b}.adaln.proj.0.weight": r(2 * d, cd),
                f"{b}.adaln.proj.0.bias": r(2 * d),
                f"{b}.norm1.weight": r(d), f"{b}.norm1.bias": r(d),
                f"{b}.attn1.to_q.weight": r(d, d),
                f"{b}.attn1.to_k.weight": r(kv, d),
                f"{b}.attn1.to_v.weight": r(kv, d),
                f"{b}.attn1.norm_q.weight": np.zeros((hd,), np.float32),
                f"{b}.attn1.norm_q.bias": r(hd),
                f"{b}.attn1.norm_k.weight": np.zeros((hd,), np.float32),
                f"{b}.attn1.norm_k.bias": r(hd),
                f"{b}.attn2.to_q.weight": r(d, d),
                f"{b}.attn2.to_kv.weight": r(2 * kv, xd),
                f"{b}.attn2.cross_q_norm.weight": np.zeros((hd,), np.float32),
                f"{b}.attn2.cross_q_norm.bias": r(hd),
                f"{b}.attn2.cross_k_norm.weight": np.zeros((hd,), np.float32),
                f"{b}.attn2.cross_k_norm.bias": r(hd),
                f"{b}.proj.weight": r(d, 2 * d),
                f"{b}.norm2.weight": np.zeros((d,), np.float32),
                f"{b}.norm2.bias": r(d),
                f"{b}.ffn.norm.weight": r(d), f"{b}.ffn.norm.bias": r(d),
                f"{b}.ffn.proj1.weight": r(cfg.ffn_dim, d),
                f"{b}.ffn.proj2.weight": r(d, cfg.ffn_dim),
                f"{b}.norm3.weight": np.zeros((d,), np.float32),
                f"{b}.norm3.bias": r(d),
            })
        mapped = convert_keys("magi", sd)
        apply_state_dict(m, mapped, strict=True)
        # zero-centered gammas land as 1.0
        np.testing.assert_allclose(
            np.asarray(m.blocks[0].norm2.norm.weight.value), 1.0)
        out = m(jnp.ones((1, cfg.in_channels, 2, 4, 4), jnp.float32),
                jnp.asarray([[0.5]]),
                jnp.zeros((1, 1, 4, cfg.caption_channels), jnp.float32))
        assert np.isfinite(np.asarray(out)).all()

    def test_vae_strict_load(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.vaes.magi_vae import (
            AutoencoderKLMagi, MagiVAEConfig)

        cfg = MagiVAEConfig.from_dict(MAGI_TINY["spec"]["components"][1]["config"])
        vae = AutoencoderKLMagi(cfg, rngs=nnx.Rngs(0))
        rng = np.random.default_rng(8)

        def r(*shape):
            return rng.normal(size=shape).astype(np.float32) * 0.02

        d = cfg.embed_dim
        vol = cfg.patch_length * cfg.patch_size ** 2
        n = (cfg.video_length // cfg.patch_length) * \
            (cfg.video_size // cfg.patch_size) ** 2 + 1
        sd = {
            "encoder.patch_embed.proj.weight": r(d, 3, cfg.patch_length,
                                                 cfg.patch_size, cfg.patch_size),
            "encoder.patch_embed.proj.bias": r(d),
            "encoder.cls_token": r(1, 1, d),
            "encoder.pos_embed": r(1, n, d),
            "encoder.norm.weight": r(d), "encoder.norm.bias": r(d),
            "encoder.last_layer.weight": r(2 * cfg.z_chans, d),
            "encoder.last_layer.bias": r(2 * cfg.z_chans),
            "decoder.proj_in.weight": r(d, cfg.z_chans),
            "decoder.proj_in.bias": r(d),
            "decoder.cls_token": r(1, 1, d),
            "decoder.pos_embed": r(1, n, d),
            "decoder.norm.weight": r(d), "decoder.norm.bias": r(d),
            "decoder.final_proj.weight": r(4 * vol, d),
            "decoder.final_proj.bias": r(4 * vol),
            "decoder.final_norm.weight": r(4 * vol),
            "decoder.final_norm.bias": r(4 * vol),
            "decoder.last_layer.weight": r(3, 4, 3, 3, 3),
            "decoder.last_layer.bias": r(3),
        }
        for side in ("encoder", "decoder"):
            for i in range(cfg.depth):
                b = f"{side}.blocks.{i}"
                sd.update({
                    f"{b}.norm1.weight": r(d), f"{b}.norm1.bias": r(d),
                    f"{b}.attn.qkv.weight": r(3 * d, d),
                    f"{b}.attn.proj.weight": r(d, d),
                    f"{b}.attn.proj.bias": r(d),
                    f"{b}.norm2.weight": r(d), f"{b}.norm2.bias": r(d),
                    f"{b}.mlp.fc1.weight": r(4 * d, d), f"{b}.mlp.fc1.bias": r(4 * d),
                    f"{b}.mlp.fc2.weight": r(d, 4 * d), f"{b}.mlp.fc2.bias": r(d),
                })
        mapped = convert_keys("magi_vae", sd)
        apply_state_dict(vae, mapped, strict=True)
        z = vae.encode(jnp.ones((1, 3, 8, 32, 32), jnp.float32))
        assert np.isfinite(np.asarray(vae.decode(z))).all()
