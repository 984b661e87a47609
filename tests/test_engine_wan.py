import numpy as np
import pytest
import yaml

from tests.test_engine_zimage import make_tokenizer

WAN_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "wan-tiny-test", "name": "Wan Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "wan",
        "model_type": ["t2v", "t2i"],
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "FlowUniPCMultistepScheduler",
                "config": {"num_train_timesteps": 1000, "shift": 3.0},
            },
            {
                "type": "vae",
                "base": "wan.base",
                "config": {
                    "base_dim": 8,
                    "z_dim": 4,
                    "dim_mult": [1, 2],
                    "num_res_blocks": 1,
                    "temperal_downsample": [True],
                    "latents_mean": [0.0, 0.0, 0.0, 0.0],
                    "latents_std": [1.0, 1.0, 1.0, 1.0],
                },
            },
            {
                "type": "text_encoder",
                "base": "UMT5EncoderModel",
                "config": {
                    "vocab_size": 64,
                    "d_model": 32,
                    "d_kv": 8,
                    "d_ff": 48,
                    "num_layers": 1,
                    "num_heads": 4,
                    "per_layer_relative_bias": True,
                },
            },
            {
                "type": "transformer",
                "base": "wan.base",
                "config": {
                    "num_attention_heads": 2,
                    "attention_head_dim": 24,
                    "in_channels": 4,
                    "out_channels": 4,
                    "text_dim": 32,
                    "freq_dim": 32,
                    "ffn_dim": 64,
                    "num_layers": 1,
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 4, "guidance_scale": 5.0}},
    },
}


def make_engine(tmp_path, model_type, extra_transformer=False):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    if extra_transformer:
        t2 = dict(yaml.safe_load(yaml.safe_dump(doc["spec"]["components"][3])))
        t2["name"] = "transformer_2"
        doc["spec"]["components"].append(t2)
    path = tmp_path / f"wan-tiny-{model_type}.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path, model_type=model_type)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestWanEndToEnd:
    def test_t2v_produces_frames(self, tmp_path):
        eng = make_engine(tmp_path, "t2v")
        frames = eng.run(
            prompt="hello world",
            height=32,
            width=32,
            num_frames=5,
            num_inference_steps=2,
            guidance_scale=1.0,
            seed=3,
        )
        assert len(frames) == 5
        assert frames[0].shape == (32, 32, 3) and frames[0].dtype == np.uint8

    def test_t2i_single_frame(self, tmp_path):
        eng = make_engine(tmp_path, "t2i")
        frames = eng.run(
            prompt="hello",
            height=32,
            width=32,
            num_inference_steps=2,
            guidance_scale=1.0,
            seed=1,
        )
        assert len(frames) == 1

    def test_cfg_on(self, tmp_path):
        eng = make_engine(tmp_path, "t2v")
        lat = eng.run(
            prompt="hello",
            negative_prompt="bad",
            height=32,
            width=32,
            num_frames=5,
            num_inference_steps=2,
            guidance_scale=5.0,
            seed=1,
            return_latents=True,
        )
        assert np.isfinite(np.asarray(lat)).all()

    def test_dual_noise_expert_switch(self, tmp_path):
        eng = make_engine(tmp_path, "t2v", extra_transformer=True)
        lat = eng.run(
            prompt="hello",
            height=32,
            width=32,
            num_frames=5,
            num_inference_steps=4,
            guidance_scale=1.0,
            boundary_ratio=0.875,
            seed=1,
            return_latents=True,
        )
        assert eng.transformer_2 is not None  # low-noise expert was engaged
        assert np.isfinite(np.asarray(lat)).all()

    def test_frame_count_snapping(self, tmp_path):
        eng = make_engine(tmp_path, "t2v")
        # 6 frames → snapped to 4k+1 = 5
        frames = eng.run(
            prompt="a", height=32, width=32, num_frames=6,
            num_inference_steps=1, guidance_scale=1.0, seed=1,
        )
        assert len(frames) == 5

    def test_seed_determinism(self, tmp_path):
        eng = make_engine(tmp_path, "t2v")
        kw = dict(prompt="x", height=32, width=32, num_frames=5,
                  num_inference_steps=2, guidance_scale=1.0, seed=77, return_latents=True)
        a = eng.run(**kw)
        b = eng.run(**kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
