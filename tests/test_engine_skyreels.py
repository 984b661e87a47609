"""SkyReels V2 family tests: fps conditioning, per-frame timesteps, and the
diffusion-forcing engine."""

import numpy as np
import pytest
import yaml
import jax.numpy as jnp

from tests.test_engine_zimage import make_tokenizer

SKYREELS_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "skyreels-tiny-test", "name": "SkyReels Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "skyreels",
        "model_type": "df",
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "FlowUniPCMultistepScheduler",
                "config": {"num_train_timesteps": 1000, "shift": 8.0},
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
                },
            },
            {
                "type": "text_encoder",
                "base": "UMT5EncoderModel",
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
                "base": "skyreels.base",
                "config": {
                    "patch_size": [1, 2, 2],
                    "num_attention_heads": 2,
                    "attention_head_dim": 24,
                    "in_channels": 4,
                    "out_channels": 4,
                    "text_dim": 16,
                    "freq_dim": 32,
                    "ffn_dim": 96,
                    "num_layers": 1,
                    "inject_sample_info": True,
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 1.0}},
    },
}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "skyreels-tiny.yml"
    path.write_text(yaml.safe_dump(SKYREELS_TINY))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


class TestTimestepMatrix:
    def test_staggered_schedule(self):
        from apex_studio_tpu.engine.skyreels import generate_timestep_matrix

        tmpl = np.linspace(999, 1, 6)
        sm, si, um, vi = generate_timestep_matrix(8, tmpl, 8, ar_step=2)
        # frame f starts updating ar_step rows after frame f-1
        first_update = [int(np.argmax(um[:, f])) for f in range(8)]
        assert first_update == sorted(first_update)
        assert first_update[1] - first_update[0] >= 2
        # every frame eventually reaches the terminal index
        assert np.all(si[-1] >= len(tmpl))

    def test_prefix_frames_never_update(self):
        from apex_studio_tpu.engine.skyreels import generate_timestep_matrix

        tmpl = np.linspace(999, 1, 4)
        sm, si, um, vi = generate_timestep_matrix(6, tmpl, 6, ar_step=2,
                                                  num_pre_ready=2)
        assert not um[:, :2].any()
        np.testing.assert_allclose(sm[:, :2], 0.0)

    def test_ar_step_lower_bound(self):
        from apex_studio_tpu.engine.skyreels import generate_timestep_matrix

        with pytest.raises(ValueError):
            generate_timestep_matrix(16, np.linspace(999, 1, 10), 4, ar_step=1)


class TestSkyReelsEngines:
    def test_df_end_to_end(self, engine):
        frames = engine.run(
            prompt="a long video", height=16, width=16, num_frames=5,
            base_num_frames=5, num_inference_steps=2, ar_step=2,
            guidance_scale=1.0, seed=7, fps=24,
        )
        assert len(frames) == 5
        assert frames[0].shape == (16, 16, 3)

    def test_df_image_prefix_is_preserved(self, engine):
        rng = np.random.default_rng(0)
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        lats = engine.run(
            prompt="x", image=img, height=16, width=16, num_frames=5,
            num_inference_steps=2, ar_step=2, guidance_scale=1.0, seed=3,
            return_latents=True,
        )
        lats = np.asarray(lats)
        # the prefix frame equals the encoded image latent (never updated)
        import cv2
        import jax
        from flax import nnx

        resized = cv2.resize(img, (16, 16), interpolation=cv2.INTER_LANCZOS4)
        first = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
        z0 = np.asarray(engine.vae.encode(first[None, :, None]))
        np.testing.assert_allclose(lats[:, :, :1], np.asarray(z0, np.float32), rtol=0, atol=2e-2)

    def test_fps_index_changes_output(self, engine):
        kw = dict(prompt="x", height=16, width=16, num_frames=3,
                  num_inference_steps=2, ar_step=2, guidance_scale=1.0,
                  seed=3, return_latents=True)
        a = np.asarray(engine.run(fps=16, **kw))
        b = np.asarray(engine.run(fps=24, **kw))
        assert not np.allclose(a, b)
