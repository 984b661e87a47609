import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from apex_studio_tpu.models.transformers.qwenimage import (
    QwenImageConfig,
    QwenImageTransformer2DModel,
)
from tests.test_engine_zimage import make_tokenizer

QWEN_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "qwenimage-tiny-test", "name": "QwenImage Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "qwenimage",
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
                "base": "wan.base",
                "config": {
                    "base_dim": 8,
                    "z_dim": 4,
                    "dim_mult": [1, 2],
                    "num_res_blocks": 1,
                    "temperal_downsample": [False],
                    "latents_mean": [0.0, 0.0, 0.0, 0.0],
                    "latents_std": [1.0, 1.0, 1.0, 1.0],
                },
            },
            {
                "type": "text_encoder",
                "base": "Qwen2_5_VLForConditionalGeneration",
                "config": {
                    "vocab_size": 64,
                    "hidden_size": 48,
                    "intermediate_size": 96,
                    "num_hidden_layers": 2,
                    "num_attention_heads": 4,
                    "num_key_value_heads": 2,
                },
            },
            {
                "type": "transformer",
                "base": "qwenimage.base",
                "config": {
                    "in_channels": 16,
                    "out_channels": 4,
                    "num_layers": 2,
                    "attention_head_dim": 24,
                    "num_attention_heads": 2,
                    "joint_attention_dim": 48,
                    "axes_dims_rope": [8, 8, 8],
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "true_cfg_scale": 1.0}},
    },
}


class TestQwenImageModel:
    @pytest.fixture(scope="class")
    def tiny(self):
        cfg = QwenImageConfig(
            in_channels=16, out_channels=4, num_layers=1, attention_head_dim=24,
            num_attention_heads=2, joint_attention_dim=48, axes_dims_rope=(8, 8, 8),
        )
        return QwenImageTransformer2DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)

    def test_forward_shape(self, tiny):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, tiny.cfg.in_channels))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 48))
        out = tiny(x, txt, jnp.full((1,), 0.5), grid_hw=(4, 4))
        assert out.shape == (1, 16, tiny.cfg.patch_size**2 * tiny.cfg.out_channels)

    def test_text_conditioning(self, tiny):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16))
        t1 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 48))
        t2 = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 48))
        a = tiny(x, t1, jnp.full((1,), 0.5), grid_hw=(4, 4))
        b = tiny(x, t2, jnp.full((1,), 0.5), grid_hw=(4, 4))
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5

    def test_rope_centering(self, tiny):
        icos, isin, tcos, tsin = tiny.rope_tables(4, 4, 8)
        assert icos.shape[1] == 16 and tcos.shape[1] == 8

    def test_converter(self):
        from apex_studio_tpu.loaders.converters import convert_keys

        sd = {
            "time_text_embed.timestep_embedder.linear_1.weight": np.zeros((8, 4), np.float32),
            "transformer_blocks.0.img_mod.1.weight": np.zeros((24, 4), np.float32),
            "transformer_blocks.0.attn.to_q.weight": np.zeros((4, 4), np.float32),
            "transformer_blocks.0.attn.to_out.0.weight": np.zeros((4, 4), np.float32),
            "transformer_blocks.0.img_mlp.net.0.proj.weight": np.zeros((8, 4), np.float32),
            "norm_out.linear.weight": np.zeros((8, 4), np.float32),
        }
        out = convert_keys("qwenimage", sd)
        assert "timestep_linear_1.kernel" in out
        assert "transformer_blocks.0.img_mod.kernel" in out
        assert "transformer_blocks.0.to_q.kernel" in out
        assert "transformer_blocks.0.to_out.kernel" in out
        assert "transformer_blocks.0.img_mlp.fc1.kernel" in out
        assert "norm_out_linear.kernel" in out


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "qwenimage-tiny.yml"
    path.write_text(yaml.safe_dump(QWEN_TINY))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


class TestQwenImageEndToEnd:
    def test_pipeline_produces_image(self, engine):
        frames = engine.run(
            prompt="hello world", height=32, width=32,
            num_inference_steps=2, true_cfg_scale=1.0, seed=7,
        )
        assert len(frames) == 1
        assert frames[0].shape == (32, 32, 3) and frames[0].dtype == np.uint8

    def test_true_cfg(self, engine):
        lat = engine.run(
            prompt="hello", negative_prompt="bad", height=32, width=32,
            num_inference_steps=2, true_cfg_scale=3.0, seed=1, return_latents=True,
        )
        assert np.isfinite(np.asarray(lat)).all()

    def test_seed_determinism(self, engine):
        kw = dict(prompt="x", height=32, width=32, num_inference_steps=2,
                  true_cfg_scale=1.0, seed=5, return_latents=True)
        a = engine.run(**kw)
        b = engine.run(**kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestQwenImageEdit:
    def make_engine(self, tmp_path, model_type="edit"):
        doc = yaml.safe_load(yaml.safe_dump(QWEN_TINY))
        doc["spec"]["model_type"] = model_type
        path = tmp_path / f"qwen-tiny-{model_type}.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type=model_type)
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        return eng

    def sample_image(self, h=32, w=32):
        img = np.zeros((h, w, 3), np.uint8)
        img[4:20, 10:28] = [30, 180, 90]
        return img

    def test_edit_produces_image(self, tmp_path):
        eng = self.make_engine(tmp_path)
        frames = eng.run(
            image=self.sample_image(), prompt="make it red", height=32, width=32,
            num_inference_steps=2, true_cfg_scale=1.0, seed=5,
        )
        assert len(frames) == 1
        assert frames[0].shape == (32, 32, 3) and frames[0].dtype == np.uint8

    def test_edit_plus_multi_image(self, tmp_path):
        eng = self.make_engine(tmp_path, model_type="edit_plus")
        lat = eng.run(
            image=[self.sample_image(), self.sample_image()[::-1].copy()],
            prompt="blend", height=32, width=32,
            num_inference_steps=2, true_cfg_scale=1.0, seed=5, return_latents=True,
        )
        # packed tokens for the 32x32 target only (condition tokens sliced off);
        # tiny VAE downsamples 2x → 16x16 latent → 8x8 packed grid = 64 tokens
        assert np.asarray(lat).shape[1] == 64
        assert np.isfinite(np.asarray(lat)).all()

    def test_condition_changes_output(self, tmp_path):
        eng = self.make_engine(tmp_path)
        kw = dict(prompt="x", height=32, width=32, num_inference_steps=2,
                  true_cfg_scale=1.0, seed=7, return_latents=True)
        a = eng.run(image=self.sample_image(), **kw)
        b = eng.run(image=255 - self.sample_image(), **kw)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_requires_image(self, tmp_path):
        eng = self.make_engine(tmp_path)
        with pytest.raises(ValueError, match="image"):
            eng.run(prompt="x", height=32, width=32, num_inference_steps=1)

    def test_rope_multi_segment_tables(self):
        cfg = QwenImageConfig(
            in_channels=16, out_channels=4, num_layers=1, attention_head_dim=24,
            num_attention_heads=2, joint_attention_dim=48, axes_dims_rope=(8, 8, 8),
        )
        m = QwenImageTransformer2DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        icos, _, tcos, _ = m.rope_tables(2, 2, 4, extra_segments=((2, 2),))
        assert icos.shape[1] == 8  # two 2x2 segments
        assert tcos.shape[1] == 4


class TestQwenImageControlNet:
    def test_controlnet_branch_steers_output(self, tmp_path, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        doc = yaml.safe_load(yaml.safe_dump(QWEN_TINY))
        doc["metadata"]["id"] = "qwenimage-cn-tiny"
        doc["spec"]["model_type"] = "controlnet"
        tf_cfg = next(c for c in doc["spec"]["components"]
                      if c["type"] == "transformer")["config"]
        doc["spec"]["components"].append({
            "type": "transformer",
            "name": "controlnet",
            "base": "qwenimage.controlnet",
            "config": {**tf_cfg, "num_layers": 1},
        })
        path = tmp_path / "qcn.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine.registry import UniversalEngine

        eng = UniversalEngine(str(path))
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        ctrl = np.zeros((32, 32, 3), np.uint8)
        ctrl[8:24, 8:24] = 255
        common = dict(prompt="edge", height=32, width=32,
                      num_inference_steps=2, true_cfg_scale=1.0, seed=0,
                      return_latents=True)
        a = np.asarray(eng.run(control_image=ctrl,
                               controlnet_conditioning_scale=1.0, **common))
        b = np.asarray(eng.run(control_image=ctrl,
                               controlnet_conditioning_scale=0.0, **common))
        assert np.isfinite(a).all() and np.isfinite(b).all()
        assert np.abs(a - b).max() > 1e-6

    def test_control_guidance_window(self, tmp_path, monkeypatch):
        # scale 0 everywhere inside the loop when window excludes all steps:
        # result equals plain-scale-zero run
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        doc = yaml.safe_load(yaml.safe_dump(QWEN_TINY))
        doc["metadata"]["id"] = "qwenimage-cn-tiny2"
        doc["spec"]["model_type"] = "controlnet"
        tf_cfg = next(c for c in doc["spec"]["components"]
                      if c["type"] == "transformer")["config"]
        doc["spec"]["components"].append({
            "type": "transformer", "name": "controlnet",
            "base": "qwenimage.controlnet",
            "config": {**tf_cfg, "num_layers": 1},
        })
        path = tmp_path / "qcn2.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine.registry import UniversalEngine

        eng = UniversalEngine(str(path))
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        ctrl = np.full((32, 32, 3), 128, np.uint8)
        common = dict(prompt="w", height=32, width=32, num_inference_steps=2,
                      true_cfg_scale=1.0, seed=3, return_latents=True)
        off = np.asarray(eng.run(control_image=ctrl,
                                 controlnet_conditioning_scale=1.0,
                                 control_guidance_start=0.9,
                                 control_guidance_end=0.95, **common))
        zero = np.asarray(eng.run(control_image=ctrl,
                                  controlnet_conditioning_scale=0.0, **common))
        np.testing.assert_allclose(off, zero, atol=1e-5)
