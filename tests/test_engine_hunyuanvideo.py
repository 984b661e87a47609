"""HunyuanVideo (original) engine end-to-end on tiny random-weight models."""

import numpy as np
import pytest
import yaml

from tests.test_engine_zimage import make_tokenizer

HYV_ORIG_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "hunyuanvideo-tiny-test", "name": "HYV Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "hunyuanvideo",
        "model_type": "t2v",
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "FlowMatchDiscreteScheduler",
                "config": {"num_train_timesteps": 1000, "shift": 7.0},
            },
            {
                "type": "vae",
                "base": "AutoencoderKLHunyuanVideo",
                "config": {
                    "latent_channels": 4,
                    "block_out_channels": [8, 16, 16],
                    "layers_per_block": 1,
                    "norm_num_groups": 4,
                    "spatial_compression_ratio": 4,
                    "temporal_compression_ratio": 2,
                    "scaling_factor": 1.0,
                },
            },
            {
                "type": "text_encoder",
                "name": "text_encoder",
                "base": "LlamaModel",
                "config": {
                    "vocab_size": 64,
                    "hidden_size": 32,
                    "intermediate_size": 64,
                    "num_hidden_layers": 3,
                    "num_attention_heads": 4,
                    "num_key_value_heads": 2,
                    "head_dim": 8,
                    "skip_last_layers": 2,
                },
            },
            {
                "type": "text_encoder",
                "name": "text_encoder_2",
                "base": "CLIPTextModel",
                "config": {
                    "vocab_size": 64,
                    "hidden_size": 24,
                    "intermediate_size": 48,
                    "num_hidden_layers": 1,
                    "num_attention_heads": 2,
                    "max_position_embeddings": 512,
                },
            },
            {
                "type": "transformer",
                "base": "hunyuanvideo.base",
                "config": {
                    "in_channels": 4,
                    "out_channels": 4,
                    "num_attention_heads": 2,
                    "attention_head_dim": 24,
                    "num_layers": 1,
                    "num_single_layers": 1,
                    "num_refiner_layers": 1,
                    "mlp_ratio": 2.0,
                    "patch_size": 2,
                    "patch_size_t": 1,
                    "text_embed_dim": 32,
                    "pooled_projection_dim": 24,
                    "rope_axes_dim": [8, 8, 8],
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 6.0}},
    },
}


def _i2v_manifest(condition_type):
    import copy

    m = copy.deepcopy(HYV_ORIG_TINY)
    m["metadata"]["id"] = f"hunyuanvideo-i2v-tiny-{condition_type}"
    m["spec"]["model_type"] = "i2v"
    tf = next(c for c in m["spec"]["components"] if c["type"] == "transformer")
    tf["config"]["image_condition_type"] = condition_type
    if condition_type == "latent_concat":
        tf["config"]["in_channels"] = 9  # noise(4) + image(4) + mask(1)
    return m


def _make_engine(tmp_path_factory, manifest, name):
    path = tmp_path_factory.mktemp("manifests") / f"{name}.yml"
    path.write_text(yaml.safe_dump(manifest))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    return _make_engine(tmp_path_factory, HYV_ORIG_TINY, "hyv-orig-tiny")


class TestHunyuanVideoEndToEnd:
    def test_t2v_produces_frames(self, engine):
        frames = engine.run(
            prompt="a red fox",
            height=16,
            width=16,
            num_frames=3,
            num_inference_steps=2,
            guidance_scale=6.0,
            seed=3,
        )
        assert len(frames) == 3
        assert frames[0].shape == (16, 16, 3) and frames[0].dtype == np.uint8

    def test_true_cfg_changes_output(self, engine):
        common = dict(prompt="a red fox", height=16, width=16, num_frames=3,
                      num_inference_steps=2, seed=3, return_latents=True)
        base = engine.run(true_guidance_scale=1.0, **common)
        cfg = engine.run(true_guidance_scale=3.0, negative_prompt="blurry", **common)
        assert not np.allclose(np.asarray(base), np.asarray(cfg))

    def test_seed_determinism(self, engine):
        a = engine.run(prompt="x", height=16, width=16, num_frames=3,
                       num_inference_steps=2, seed=11, return_latents=True)
        b = engine.run(prompt="x", height=16, width=16, num_frames=3,
                       num_inference_steps=2, seed=11, return_latents=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("ctype", ["token_replace", "latent_concat"])
def test_i2v_conditioning(tmp_path_factory, ctype):
    eng = _make_engine(tmp_path_factory, _i2v_manifest(ctype), f"hyv-i2v-{ctype}")
    image = np.full((16, 16, 3), 128, np.uint8)
    lat = eng.run(
        image=image, prompt="a fox", height=16, width=16, num_frames=3,
        num_inference_steps=2, seed=5, return_latents=True,
    )
    lat = np.asarray(lat)
    assert lat.shape == (1, 4, 2, 4, 4)
    assert np.isfinite(lat).all()
    if ctype == "token_replace":
        # First latent frame stays pinned to the (constant-image) latent.
        lat2 = eng.run(
            image=image, prompt="a fox", height=16, width=16, num_frames=3,
            num_inference_steps=2, seed=99, return_latents=True,
        )
        np.testing.assert_allclose(lat[:, :, 0], np.asarray(lat2)[:, :, 0], atol=1e-5)


def test_vae_roundtrip_shapes():
    import jax.numpy as jnp
    from flax import nnx

    from apex_studio_tpu.models.vaes.hunyuanvideo_vae import (
        AutoencoderKLHunyuanVideo,
        HunyuanVideoVAEConfig,
    )

    cfg = HunyuanVideoVAEConfig(
        latent_channels=4, block_out_channels=(8, 16, 16), layers_per_block=1,
        norm_num_groups=4, spatial_compression_ratio=4, temporal_compression_ratio=2,
        scaling_factor=1.0,
    )
    vae = AutoencoderKLHunyuanVideo(cfg, rngs=nnx.Rngs(0))
    video = jnp.zeros((1, 3, 5, 16, 16), jnp.float32)
    z = vae.encode(video)
    assert z.shape == (1, 4, 3, 4, 4)
    out = vae.decode(z)
    assert out.shape == (1, 3, 5, 16, 16)


def test_llama_encoder_hidden_state_offset():
    import jax.numpy as jnp
    from flax import nnx

    from apex_studio_tpu.models.text_encoders.llama import LlamaConfig, LlamaTextEncoder

    cfg = LlamaConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                      num_hidden_layers=3, num_attention_heads=2,
                      num_key_value_heads=1, head_dim=8, skip_last_layers=2)
    m = LlamaTextEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    ids = jnp.arange(8, dtype=jnp.int32)[None]
    out = m(ids, attention_mask=jnp.ones((1, 8), jnp.int32))
    assert out.shape == (1, 8, 16)
    # skip=2 over 3 layers ≡ running exactly 1 layer.
    cfg0 = LlamaConfig(**{**cfg.__dict__, "num_hidden_layers": 1, "skip_last_layers": 0})
    m0 = LlamaTextEncoder(cfg0, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    # Copy the first layer + embeddings from the deep model.
    m0.embed_tokens = m.embed_tokens
    m0.layers[0] = m.layers[0]
    out0 = m0(ids, attention_mask=jnp.ones((1, 8), jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out0), atol=1e-6)


class TestHunyuanVideoFramepack:
    def _engine(self, tmp_path, sampling_type, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        doc = yaml.safe_load(yaml.safe_dump(HYV_ORIG_TINY))
        doc["metadata"]["id"] = f"hv-framepack-tiny-{sampling_type}"
        doc["spec"]["model_type"] = "framepack"
        for c in doc["spec"]["components"]:
            if c["type"] == "scheduler":
                c["base"] = "FlowMatchEulerDiscreteScheduler"
                c["config"] = {"num_train_timesteps": 1000,
                               "use_dynamic_shifting": True}
            if c["type"] == "transformer":
                c["base"] = "hunyuanvideo.framepack"
        path = tmp_path / "fp.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine.registry import UniversalEngine
        from tests.test_engine_zimage import make_tokenizer

        eng = UniversalEngine(str(path))
        for spec in eng.component_specs.values():
            if spec.get("type") == "text_encoder":
                spec["tokenizer"] = make_tokenizer()
        return eng

    def test_inverted_anti_drifting_sections(self, tmp_path, monkeypatch):
        eng = self._engine(tmp_path, "inv", monkeypatch)
        img = np.full((32, 32, 3), 128, np.uint8)
        frames = eng.run(image=img, prompt="long video", height=32, width=32,
                         num_frames=33, latent_window_size=3,
                         num_inference_steps=2, guidance_scale=6.0, seed=0)
        assert len(frames) >= 9
        assert frames[0].shape == (32, 32, 3)

    def test_vanilla_sampling(self, tmp_path, monkeypatch):
        eng = self._engine(tmp_path, "van", monkeypatch)
        img = np.full((32, 32, 3), 60, np.uint8)
        lat = eng.run(image=img, prompt="fwd", height=32, width=32,
                      num_frames=17, latent_window_size=2,
                      sampling_type="vanilla", num_inference_steps=2,
                      guidance_scale=6.0, seed=1, return_latents=True)
        assert np.isfinite(np.asarray(lat)).all()
