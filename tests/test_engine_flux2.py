"""Flux 2 engine end-to-end on tiny random-weight models."""

import numpy as np
import pytest
import yaml

from tests.test_engine_zimage import make_tokenizer

FLUX2_TINY = {
    "api_version": "apex/v1",
    "kind": "Model",
    "metadata": {"id": "flux2-tiny-test", "name": "Flux2 Tiny", "version": "1.0.0"},
    "spec": {
        "engine": "flux2",
        "model_type": "ti2i",
        "engine_type": "jax",
        "components": [
            {
                "type": "scheduler",
                "base": "FlowMatchEulerDiscreteScheduler",
                "config": {"use_dynamic_shifting": True, "time_shift_type": "exponential"},
            },
            {
                "type": "vae",
                "base": "AutoencoderKLFlux2",
                "config": {
                    "latent_channels": 4,
                    "block_out_channels": [8, 16],
                    "layers_per_block": 1,
                    "norm_num_groups": 4,
                    "scaling_factor": 1.0,
                    "shift_factor": None,
                    "use_quant_conv": True,
                    "use_post_quant_conv": True,
                    "packed_batch_norm": True,
                },
            },
            {
                "type": "text_encoder",
                "base": "Mistral3ForConditionalGeneration",
                "config": {
                    "vocab_size": 64,
                    "hidden_size": 16,
                    "intermediate_size": 32,
                    "num_hidden_layers": 3,
                    "num_attention_heads": 2,
                    "num_key_value_heads": 1,
                    "head_dim": 8,
                    "stack_layers": [1, 2, 3],
                },
            },
            {
                "type": "transformer",
                "base": "flux2.base",
                "config": {
                    "in_channels": 16,
                    "num_layers": 1,
                    "num_single_layers": 1,
                    "attention_head_dim": 16,
                    "num_attention_heads": 2,
                    "joint_attention_dim": 48,
                    "mlp_ratio": 2.0,
                    "axes_dims_rope": [4, 4, 4, 4],
                },
            },
        ],
        "defaults": {"run": {"num_inference_steps": 2, "guidance_scale": 4.0}},
    },
}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "flux2-tiny.yml"
    path.write_text(yaml.safe_dump(FLUX2_TINY))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


class TestFlux2EndToEnd:
    def test_t2i_produces_image(self, engine):
        frames = engine.run(
            prompt="a blue bird", height=16, width=16,
            num_inference_steps=2, guidance_scale=4.0, seed=7,
        )
        assert len(frames) == 1
        assert frames[0].shape == (16, 16, 3) and frames[0].dtype == np.uint8

    def test_seed_determinism(self, engine):
        a = engine.run(prompt="x", height=16, width=16, num_inference_steps=2,
                       seed=3, return_latents=True)
        b = engine.run(prompt="x", height=16, width=16, num_inference_steps=2,
                       seed=3, return_latents=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_edit_reference_image_changes_output(self, engine):
        common = dict(prompt="make it red", height=16, width=16,
                      num_inference_steps=2, seed=5, return_latents=True)
        base = engine.run(**common)
        ref = np.full((16, 16, 3), 200, np.uint8)
        edited = engine.run(images=[ref], **common)
        assert np.asarray(base).shape == np.asarray(edited).shape
        assert not np.allclose(np.asarray(base), np.asarray(edited))

    def test_guidance_embed_changes_output(self, engine):
        common = dict(prompt="a cat", height=16, width=16,
                      num_inference_steps=2, seed=5, return_latents=True)
        a = engine.run(guidance_scale=1.0, **common)
        b = engine.run(guidance_scale=8.0, **common)
        assert not np.allclose(np.asarray(a), np.asarray(b))


def test_mistral_stack_layers():
    import jax.numpy as jnp
    from flax import nnx

    from apex_studio_tpu.models.text_encoders.llama import LlamaConfig, LlamaTextEncoder

    cfg = LlamaConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                      num_hidden_layers=3, num_attention_heads=2,
                      num_key_value_heads=1, head_dim=8, stack_layers=(1, 2, 3))
    m = LlamaTextEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    out = m(jnp.arange(6, dtype=jnp.int32)[None], attention_mask=jnp.ones((1, 6), jnp.int32))
    assert out.shape == (1, 6, 48)  # 3 layers x hidden 16, concatenated
