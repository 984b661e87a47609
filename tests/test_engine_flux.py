import numpy as np
import pytest
import yaml

from tests.test_engine_zimage import make_tokenizer

FLUX_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "flux-tiny-test", "name": "Flux Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "flux",
        "model_type": "t2i",
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "FlowMatchEulerDiscreteScheduler",
                "config": {"num_train_timesteps": 1000, "use_dynamic_shifting": True},
            },
            {
                "type": "vae",
                "base": "auto",
                "config": {
                    "latent_channels": 4,
                    "block_out_channels": [8, 16],
                    "layers_per_block": 1,
                    "norm_num_groups": 4,
                    "scaling_factor": 0.5,
                    "shift_factor": 0.1,
                },
            },
            {
                "type": "text_encoder",
                "name": "text_encoder",
                "base": "CLIPTextModel",
                "config": {
                    "vocab_size": 64,
                    "hidden_size": 24,
                    "intermediate_size": 48,
                    "num_hidden_layers": 1,
                    "num_attention_heads": 2,
                    "max_position_embeddings": 77,
                },
            },
            {
                "type": "text_encoder",
                "name": "text_encoder_2",
                "base": "T5EncoderModel",
                "config": {
                    "vocab_size": 64,
                    "d_model": 48,
                    "d_kv": 8,
                    "d_ff": 64,
                    "num_layers": 1,
                    "num_heads": 4,
                },
            },
            {
                "type": "transformer",
                "base": "flux.base",
                "config": {
                    "in_channels": 16,
                    "out_channels": 16,
                    "num_layers": 1,
                    "num_single_layers": 1,
                    "attention_head_dim": 32,
                    "num_attention_heads": 2,
                    "joint_attention_dim": 48,
                    "pooled_projection_dim": 24,
                    "guidance_embeds": True,
                    "axes_dims_rope": [8, 12, 12],
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 3.5}},
    },
}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "flux-tiny.yml"
    path.write_text(yaml.safe_dump(FLUX_TINY))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


class TestFluxEndToEnd:
    def test_pipeline_produces_image(self, engine):
        frames = engine.run(
            prompt="hello world",
            height=64,
            width=64,
            num_inference_steps=2,
            seed=11,
        )
        assert len(frames) == 1
        assert frames[0].shape == (64, 64, 3) and frames[0].dtype == np.uint8

    def test_seed_determinism(self, engine):
        kw = dict(prompt="hello", height=32, width=32, num_inference_steps=2, seed=9)
        a = engine.run(return_latents=True, **kw)
        b = engine.run(return_latents=True, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_true_cfg_path(self, engine):
        lat = engine.run(
            prompt="hello world",
            negative_prompt="bad",
            true_cfg_scale=2.0,
            height=32,
            width=32,
            num_inference_steps=2,
            seed=4,
            return_latents=True,
        )
        assert np.isfinite(np.asarray(lat)).all()

    def test_resolution_snaps_to_packing_grid(self, engine):
        frames = engine.run(prompt="a", height=70, width=67, num_inference_steps=1, seed=1)
        # vae scale 2 * packing 2 = 4 → 70→68, 67→64
        assert frames[0].shape == (68, 64, 3)


class TestFluxKontext:
    @pytest.fixture()
    def kontext_engine(self, tmp_path):
        import yaml

        doc = yaml.safe_load(yaml.safe_dump(FLUX_TINY))
        doc["spec"]["model_type"] = "kontext"
        path = tmp_path / "flux-kontext-tiny.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="kontext")
        for spec in eng.component_specs.values():
            if spec.get("type") == "text_encoder":
                from tests.test_engine_zimage import make_tokenizer

                spec["tokenizer"] = make_tokenizer()
        return eng

    def test_kontext_edit_runs(self, kontext_engine):
        ref_img = np.zeros((64, 64, 3), np.uint8)
        ref_img[16:48, 16:48] = [180, 60, 200]
        frames = kontext_engine.run(
            image=ref_img, prompt="make it blue", height=64, width=64,
            num_inference_steps=2, seed=4,
        )
        assert frames[0].shape == (64, 64, 3)

    def test_conditioning_changes_output(self, kontext_engine):
        img_a = np.zeros((64, 64, 3), np.uint8)
        img_b = np.full((64, 64, 3), 255, np.uint8)
        kw = dict(prompt="edit", height=64, width=64, num_inference_steps=1,
                  seed=9, return_latents=True)
        a = kontext_engine.run(image=img_a, **kw)
        b = kontext_engine.run(image=img_b, **kw)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5

    def test_requires_image(self, kontext_engine):
        with pytest.raises(ValueError, match="image"):
            kontext_engine.run(prompt="x", height=64, width=64, num_inference_steps=1)


class TestFluxFill:
    @pytest.fixture()
    def fill_engine(self, tmp_path):
        doc = yaml.safe_load(yaml.safe_dump(FLUX_TINY))
        doc["spec"]["model_type"] = "fill"
        # fill input channels: 16 noise + 16 masked img + 4 (2*2 vae scale)
        # mask bits packed 2x2 = 16 → in_channels 48 for the tiny 2x-vae config
        tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
        tf["config"]["in_channels"] = 48
        path = tmp_path / "flux-fill-tiny.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="fill")
        for spec in eng.component_specs.values():
            if spec.get("type") == "text_encoder":
                spec["tokenizer"] = make_tokenizer()
        return eng

    def test_fill_runs(self, fill_engine):
        img = np.full((64, 64, 3), 128, np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 255
        frames = fill_engine.run(
            image=img, mask_image=mask, prompt="fill it", height=64, width=64,
            num_inference_steps=2, seed=3,
        )
        assert frames[0].shape == (64, 64, 3)

    def test_fill_requires_mask(self, fill_engine):
        with pytest.raises(ValueError, match="mask"):
            fill_engine.run(image=np.zeros((64, 64, 3), np.uint8), prompt="x")


class TestFluxControl:
    def test_control_produces_image(self, tmp_path):
        import yaml

        from tests.test_engine_flux import FLUX_TINY  # self-import safe at runtime

        doc = yaml.safe_load(yaml.safe_dump(FLUX_TINY))
        doc["spec"]["model_type"] = "control"
        tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
        tf["config"]["in_channels"] = 2 * tf["config"]["in_channels"]
        path = tmp_path / "flux-tiny-control.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine
        from tests.test_engine_zimage import make_tokenizer

        eng = UniversalEngine(path, model_type="control")
        for spec in eng.component_specs.values():
            if spec.get("type") == "text_encoder":
                spec["tokenizer"] = make_tokenizer()
        img = np.zeros((32, 32, 3), np.uint8)
        img[10:20, 10:20] = 255
        frames = eng.run(
            control_image=img, prompt="a house", height=32, width=32,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 1
        assert frames[0].shape == (32, 32, 3)


class TestFluxDreamOmni2:
    def test_multi_reference_generation(self, tmp_path, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        doc = yaml.safe_load(yaml.safe_dump(FLUX_TINY))
        doc["metadata"]["id"] = "flux-do2-tiny"
        doc["spec"]["model_type"] = "dreamomni2"
        path = tmp_path / "do2.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine.registry import UniversalEngine
        from tests.test_engine_zimage import make_tokenizer

        eng = UniversalEngine(str(path))
        for name in ("text_encoder", "text_encoder_2"):
            spec = eng.component_specs.get(name)
            if spec is not None:
                spec["tokenizer"] = make_tokenizer()
        refs = [np.full((32, 32, 3), 60, np.uint8),
                np.full((48, 32, 3), 180, np.uint8)]
        lat = eng.run(prompt="merge", image_list=refs, height=32, width=32,
                      num_inference_steps=2, guidance_scale=1.0, seed=0,
                      resize_to_preferred_resolution=False,
                      return_latents=True)
        assert np.isfinite(np.asarray(lat)).all()
