import numpy as np
import pytest
import yaml

from tests.test_engine_zimage import make_tokenizer

HYV_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "hyv15-tiny-test", "name": "HYV15 Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "hunyuanvideo15",
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
                "base": "hunyuanvideo15",
                "config": {
                    "latent_channels": 4,
                    "block_out_channels": [8, 16, 32],
                    "layers_per_block": 1,
                    "spatial_compression_ratio": 4,
                    "temporal_compression_ratio": 2,
                    "scaling_factor": 1.0,
                },
            },
            {
                "type": "text_encoder",
                "name": "text_encoder",
                "base": "Qwen2_5_VLForConditionalGeneration",
                "config": {
                    "vocab_size": 64,
                    "hidden_size": 32,
                    "intermediate_size": 64,
                    "num_hidden_layers": 3,
                    "num_attention_heads": 4,
                    "num_key_value_heads": 2,
                },
            },
            {
                "type": "text_encoder",
                "name": "text_encoder_2",
                "base": "T5EncoderModel",
                "config": {
                    "vocab_size": 64,
                    "d_model": 16,
                    "d_kv": 4,
                    "d_ff": 32,
                    "num_layers": 1,
                    "num_heads": 4,
                },
            },
            {
                "type": "transformer",
                "base": "hunyuanvideo15.base",
                "config": {
                    "in_channels": 9,
                    "out_channels": 4,
                    "num_attention_heads": 2,
                    "attention_head_dim": 24,
                    "num_layers": 1,
                    "num_refiner_layers": 1,
                    "mlp_ratio": 2.0,
                    "text_embed_dim": 32,
                    "text_embed_2_dim": 16,
                    "image_embed_dim": 16,
                    "rope_axes_dim": [8, 8, 8],
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 1.0}},
    },
}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "hyv15-tiny.yml"
    path.write_text(yaml.safe_dump(HYV_TINY))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


class TestHYV15EndToEnd:
    def test_t2v_produces_frames(self, engine):
        frames = engine.run(
            prompt="hello world",
            height=16,
            width=16,
            num_frames=3,
            num_inference_steps=2,
            guidance_scale=1.0,
            seed=3,
        )
        assert len(frames) == 3
        assert frames[0].shape == (16, 16, 3) and frames[0].dtype == np.uint8

    def test_cfg_path(self, engine):
        lat = engine.run(
            prompt="hello",
            negative_prompt="bad",
            height=16,
            width=16,
            num_frames=3,
            num_inference_steps=2,
            guidance_scale=5.0,
            seed=1,
            return_latents=True,
        )
        assert np.isfinite(np.asarray(lat)).all()

    def test_glyph_prompt_runs(self, engine):
        lat = engine.run(
            prompt='a sign saying "hello"',
            height=16,
            width=16,
            num_frames=1,
            num_inference_steps=1,
            guidance_scale=1.0,
            seed=1,
            return_latents=True,
        )
        assert np.isfinite(np.asarray(lat)).all()

    def test_seed_determinism(self, engine):
        kw = dict(prompt="x", height=16, width=16, num_frames=3,
                  num_inference_steps=2, guidance_scale=1.0, seed=5, return_latents=True)
        a = engine.run(**kw)
        b = engine.run(**kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

@pytest.fixture(scope="module")
def i2v_engine(tmp_path_factory):
    import copy

    doc = copy.deepcopy(HYV_TINY)
    doc["metadata"]["id"] = "hyv15-i2v-tiny-test"
    doc["spec"]["model_type"] = "i2v"
    for c in doc["spec"]["components"]:
        if c["type"] == "transformer":
            # i2v input: 4 noise + 4 cond + 1 mask
            c["config"]["in_channels"] = 9
    doc["spec"]["components"].append({
        "type": "helper",
        "name": "image_encoder",
        "base": "SiglipVisionModel",
        "config": {
            "hidden_size": 16,
            "intermediate_size": 32,
            "num_hidden_layers": 1,
            "num_attention_heads": 2,
            "image_size": 28,
            "patch_size": 14,
        },
    })
    # vision stream feeds the DiT image_embedder
    for c in doc["spec"]["components"]:
        if c["type"] == "transformer":
            c["config"]["image_embed_dim"] = 16
    path = tmp_path_factory.mktemp("manifests") / "hyv15-i2v-tiny.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


class TestHYV15I2V:
    def test_i2v_produces_frames(self, i2v_engine):
        rng = np.random.default_rng(0)
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        frames = i2v_engine.run(
            prompt="animate this", image=img, height=16, width=16,
            num_frames=3, num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 3
        assert frames[0].shape == (16, 16, 3)

    def test_i2v_requires_image(self, i2v_engine):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            i2v_engine.run(prompt="x", height=16, width=16, num_frames=3,
                           num_inference_steps=1)

    def test_image_changes_output(self, i2v_engine):
        rng = np.random.default_rng(1)
        img_a = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        img_b = np.zeros((16, 16, 3), np.uint8)
        kw = dict(prompt="x", height=16, width=16, num_frames=3,
                  num_inference_steps=1, guidance_scale=1.0, seed=3,
                  return_latents=True)
        a = np.asarray(i2v_engine.run(image=img_a, **kw))
        b = np.asarray(i2v_engine.run(image=img_b, **kw))
        assert not np.allclose(a, b)


class TestBigRunMemoryStaging:
    """720p-class memory staging at tiny sizes: the full VAE leaves HBM for
    the denoise, previews ride the light TAE decoder, decode reloads lazily
    (engine/hunyuanvideo15.py run(); reference analog: group offloading +
    use_light_vae, src/memory_management/group_offloading.py +
    engine/hunyuanvideo15/shared)."""

    def _make_engine(self, tmp_path, light_vae: bool):
        import copy

        doc = copy.deepcopy(HYV_TINY)
        if light_vae:
            for c in doc["spec"]["components"]:
                if c["type"] == "vae":
                    c["config"]["light_vae_config"] = {
                        "latent_channels": 4,
                        "channels": [8, 8, 8, 8],
                        "decoder_time_upscale": [False, True],
                        "decoder_space_upscale": [True, True, False],
                    }
        path = tmp_path / f"hyv15-bigrun-{light_vae}.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path)
        for spec in eng.component_specs.values():
            if spec.get("type") == "text_encoder":
                spec["tokenizer"] = make_tokenizer()
        return eng

    def test_vae_released_and_previews_ride_tae(self, tmp_path, monkeypatch):
        # Latent grid is 4x4=16 at 16px/scale-4; threshold 8 forces the
        # big-run staging path.
        monkeypatch.setenv("APEX_VAE_TILE_THRESHOLD", "8")
        eng = self._make_engine(tmp_path, light_vae=True)
        previews = []
        vae_during_denoise = []

        def on_preview(frames, i):
            previews.append((i, len(frames)))
            vae_during_denoise.append(eng.vae)

        frames = eng.run(
            prompt="x", height=16, width=16, num_frames=3,
            num_inference_steps=10, guidance_scale=1.0, seed=0,
            render_on_step=True, render_on_step_callback=on_preview,
            render_on_step_interval=3,
        )
        assert len(frames) == 3 and frames[0].shape == (16, 16, 3)
        assert previews, "previews should have been rendered via the TAE"
        assert all(v is None for v in vae_during_denoise), (
            "full VAE must stay out of HBM while previews render")

    def test_no_light_vae_disables_previews_not_the_run(self, tmp_path, monkeypatch):
        monkeypatch.setenv("APEX_VAE_TILE_THRESHOLD", "8")
        eng = self._make_engine(tmp_path, light_vae=False)
        previews = []
        frames = eng.run(
            prompt="x", height=16, width=16, num_frames=3,
            num_inference_steps=10, guidance_scale=1.0, seed=0,
            render_on_step=True,
            render_on_step_callback=lambda f, i: previews.append(i),
        )
        assert len(frames) == 3
        assert not previews, "without a light VAE, big-run previews are skipped"

    def test_few_step_run_never_previews(self, tmp_path, monkeypatch):
        monkeypatch.setenv("APEX_VAE_TILE_THRESHOLD", "8")
        eng = self._make_engine(tmp_path, light_vae=True)
        previews = []
        frames = eng.run(
            prompt="x", height=16, width=16, num_frames=3,
            num_inference_steps=2, guidance_scale=1.0, seed=0,
            render_on_step=True,
            render_on_step_callback=lambda f, i: previews.append(i),
        )
        assert len(frames) == 3 and not previews
