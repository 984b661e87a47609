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


class TestFlux2Control:
    def _control_manifest(self):
        import copy

        m = copy.deepcopy(FLUX2_TINY)
        m["metadata"]["id"] = "flux2-control-tiny-test"
        m["spec"]["model_type"] = "control"
        tf = next(c for c in m["spec"]["components"]
                  if c["type"] == "transformer")
        tf["base"] = "flux2.control"
        # control ctx = 2·(4·z) + 4 packed mask channels = 36 with z=4
        tf["config"] = {**tf["config"], "control_layers": [0],
                        "control_in_dim": 36}
        return m

    def test_control_inpaint_produces_image(self, tmp_path):
        path = tmp_path / "flux2-control.yml"
        path.write_text(yaml.safe_dump(self._control_manifest()))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="control")
        for spec in eng.component_specs.values():
            if spec.get("type") == "text_encoder":
                spec["tokenizer"] = make_tokenizer()
        ctrl = np.zeros((16, 16, 3), np.uint8)
        ctrl[4:12, 4:12] = 255
        inpaint = np.full((16, 16, 3), 90, np.uint8)
        mask = np.zeros((16, 16), np.uint8)
        mask[:, 8:] = 255
        frames = eng.run(prompt="controlled", control_image=ctrl,
                         inpaint_image=inpaint, mask_image=mask,
                         control_context_scale=1.0, height=16, width=16,
                         num_inference_steps=2, guidance_scale=4.0, seed=3)
        assert frames[0].shape == (16, 16, 3)

    def test_zero_init_chain_matches_base_when_scaled_out(self, tmp_path):
        """With zero-init before/after projections, hints are exactly zero →
        the control model's output must equal the base forward."""
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.flux2 import (
            Flux2Config, Flux2ControlConfig, Flux2ControlTransformer2DModel,
            Flux2Transformer2DModel)

        kw = dict(in_channels=16, num_layers=1, num_single_layers=1,
                  attention_head_dim=16, num_attention_heads=2,
                  joint_attention_dim=48, mlp_ratio=2.0,
                  axes_dims_rope=(4, 4, 4, 4))
        ctrl = Flux2ControlTransformer2DModel(
            Flux2ControlConfig(control_layers=(0,), control_in_dim=36, **kw),
            dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 16, 16)), jnp.float32)
        seq = jnp.asarray(rng.normal(size=(1, 4, 48)), jnp.float32)
        cc = jnp.asarray(rng.normal(size=(1, 16, 36)), jnp.float32)
        t = jnp.asarray([0.5], jnp.float32)
        g = jnp.asarray([4.0], jnp.float32)
        with_ctrl = ctrl(x, seq, t, guidance=g, grid_hw=(4, 4),
                         control_context=cc, control_context_scale=1.0)
        without = ctrl(x, seq, t, guidance=g, grid_hw=(4, 4))
        np.testing.assert_allclose(np.asarray(with_ctrl), np.asarray(without),
                                   atol=1e-5)
