"""StepVideo family: DiT + causal VAE + t2v/i2v engines on tiny weights
(reference: src/transformer/stepvideo/base/, src/vae/stepvideo/model.py,
src/engine/stepvideo/)."""

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_zimage import make_tokenizer

SV_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "stepvideo-tiny-test", "name": "StepVideo Tiny",
                 "version": "1.0.0"},
    "spec": {
        "engine": "stepvideo",
        "model_type": "t2v",
        "engine_type": "jax",
        "components": [
            {"type": "scheduler", "base": "FlowMatchEulerDiscreteScheduler",
             "config": {"num_train_timesteps": 1000, "shift": 13.0}},
            {"type": "vae", "base": "stepvideo",
             "config": {"z_channels": 4, "encoder_ch": 8,
                        "encoder_ch_mult": [1, 2, 2], "encoder_num_res_blocks": 1,
                        "encoder_down_sampling_layer": [1],
                        "decoder_ch": 8, "decoder_ch_mult": [1, 1, 2],
                        "decoder_num_res_blocks": 1,
                        "decoder_temporal_up_layers": [2],
                        "decoder_temporal_downsample": 2, "num_groups": 4}},
            {"type": "text_encoder", "base": "T5EncoderModel",
             "config": {"vocab_size": 64, "d_model": 24, "d_kv": 6,
                        "d_ff": 48, "num_layers": 1, "num_heads": 2,
                        "per_layer_relative_bias": True}},
            {"type": "transformer", "base": "stepvideo.base",
             "config": {"num_attention_heads": 2, "attention_head_dim": 32,
                        "in_channels": 4, "out_channels": 4, "num_layers": 2,
                        "caption_channels": [24], "rope_ch_split": [16, 8, 8]}},
        ],
        "defaults": {"run": {"num_inference_steps": 2}},
    },
}


class TestStepVideoModel:
    def _model(self):
        from apex_studio_tpu.models.transformers.stepvideo import (
            StepVideoConfig, StepVideoModel)

        cfg = StepVideoConfig.from_dict(
            SV_TINY["spec"]["components"][3]["config"])
        return StepVideoModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                              rngs=nnx.Rngs(0))

    def test_forward_shapes_and_mask(self):
        m = self._model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        text = jnp.asarray(rng.normal(size=(1, 6, 24)), jnp.float32)
        mask = jnp.asarray([[1, 1, 1, 0, 0, 0]], jnp.int32)
        t = jnp.asarray([0.5], jnp.float32)
        out = m(x, t, text, text_mask=mask)
        assert out.shape == x.shape
        # masked caption tokens must not influence the output
        text2 = text.at[:, 3:].set(99.0)
        out2 = m(x, t, text2, text_mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)

    def test_i2v_condition_concat(self):
        from apex_studio_tpu.models.transformers.stepvideo import (
            StepVideoConfig, StepVideoModel)

        cfg = StepVideoConfig.from_dict(
            {**SV_TINY["spec"]["components"][3]["config"], "model_type": "i2v"})
        m = StepVideoModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                           rngs=nnx.Rngs(1))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        cond = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
        text = jnp.asarray(rng.normal(size=(1, 6, 24)), jnp.float32)
        t = jnp.asarray([0.5], jnp.float32)
        out = m(x, t, text, condition=cond)
        assert out.shape == x.shape


class TestStepVideoVAE:
    def _vae(self):
        from apex_studio_tpu.models.vaes.stepvideo_vae import (
            StepVideoVAE, StepVideoVAEConfig)

        cfg = StepVideoVAEConfig.from_dict(
            SV_TINY["spec"]["components"][1]["config"])
        return StepVideoVAE(cfg, rngs=nnx.Rngs(0)), cfg

    def test_roundtrip_shapes(self):
        vae, cfg = self._vae()
        assert cfg.spatial_scale == 4 and cfg.temporal_scale == 2
        x = jnp.zeros((1, 3, 5, 16, 16), jnp.float32)
        z = vae.encode(x)
        assert z.shape == (1, 4, 3, 4, 4)
        out = vae.decode(z)
        assert out.shape[1] == 3 and out.shape[3:] == (16, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_decode_finite_and_deterministic(self):
        vae, _ = self._vae()
        z = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 3, 4, 4)),
                        jnp.float32)
        a = np.asarray(vae.decode(z))
        b = np.asarray(vae.decode(z))
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)


class TestStepVideoEngines:
    def test_t2v(self, tmp_path, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        path = tmp_path / "sv.yml"
        path.write_text(yaml.safe_dump(SV_TINY))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(str(path))
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        frames = eng.run(prompt="a step", height=16, width=16, num_frames=5,
                         num_inference_steps=2, guidance_scale=1.0, seed=0)
        assert len(frames) >= 4
        assert frames[0].shape == (16, 16, 3)

    def test_i2v(self, tmp_path, monkeypatch):
        import os
        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        doc = yaml.safe_load(yaml.safe_dump(SV_TINY))
        doc["metadata"]["id"] = "stepvideo-i2v-tiny"
        doc["spec"]["model_type"] = "i2v"
        for c in doc["spec"]["components"]:
            if c["type"] == "transformer":
                c["config"] = dict(c["config"])
                c["config"]["model_type"] = "i2v"
        path = tmp_path / "svi2v.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(str(path))
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        img = np.full((16, 16, 3), 100, np.uint8)
        lat = eng.run(image=img, prompt="go", height=16, width=16, num_frames=5,
                      num_inference_steps=2, guidance_scale=1.0, seed=1,
                      return_latents=True)
        assert np.isfinite(np.asarray(lat)).all()
