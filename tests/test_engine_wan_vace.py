"""Wan VACE (all-in-one video editing) on tiny random weights
(reference: src/engine/wan/vace.py, src/transformer/wan/vace/model.py)."""

import copy

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer


def _vace_manifest():
    m = copy.deepcopy(WAN_TINY)
    m["metadata"]["id"] = "wan-vace-tiny-test"
    m["spec"]["model_type"] = "vace"
    tf = next(c for c in m["spec"]["components"] if c["type"] == "transformer")
    tf["base"] = "wan.vace"
    tf["config"]["vace_layers"] = [0]
    tf["config"]["vace_in_channels"] = 4 + 4 + 4  # z + z + 2×2 mask (tiny VAE scale 2)
    return m


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "wan-vace-tiny.yml"
    path.write_text(yaml.safe_dump(_vace_manifest()))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestVaceModel:
    def test_control_changes_output_and_no_control_matches_base(self):
        from apex_studio_tpu.models.transformers.wan import (
            WanConfig, WanVACETransformer3DModel)

        cfg = WanConfig(num_attention_heads=2, attention_head_dim=24,
                        in_channels=4, out_channels=4, text_dim=32, freq_dim=32,
                        ffn_dim=64, num_layers=2, vace_layers=(0,),
                        vace_in_channels=24)
        m = WanVACETransformer3DModel(cfg, dtype=jnp.float32,
                                      param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 3, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 32)), jnp.float32)
        t = jnp.asarray([500.0], jnp.float32)
        ctl = jnp.asarray(rng.normal(size=(1, 24, 3, 8, 8)), jnp.float32)
        out_c = m(x, t, ctx, control=ctl)
        out_0 = m(x, t, ctx)
        assert np.abs(np.asarray(out_c - out_0)).max() > 1e-4
        # zero conditioning scale disables the hints exactly
        out_s0 = m(x, t, ctx, control=ctl,
                   control_scale=jnp.zeros((1,), jnp.float32))
        np.testing.assert_allclose(np.asarray(out_s0), np.asarray(out_0),
                                   atol=1e-5)

    def test_shorter_control_is_padded(self):
        from apex_studio_tpu.models.transformers.wan import (
            WanConfig, WanVACETransformer3DModel)

        cfg = WanConfig(num_attention_heads=2, attention_head_dim=24,
                        in_channels=4, out_channels=4, text_dim=32, freq_dim=32,
                        ffn_dim=64, num_layers=1, vace_layers=(0,),
                        vace_in_channels=24)
        m = WanVACETransformer3DModel(cfg, dtype=jnp.float32,
                                      param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 8)), jnp.float32)
        ctl = jnp.asarray(rng.normal(size=(1, 24, 2, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 32)), jnp.float32)
        out = m(x, jnp.asarray([100.0]), ctx, control=ctl)
        assert out.shape == (1, 4, 4, 8, 8)


class TestVaceEngine:
    def test_v2v_control_video(self, engine):
        rng = np.random.default_rng(2)
        vid = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
               for _ in range(9)]
        frames = engine.run(
            prompt="restyle this", video=vid, height=32, width=32,
            num_frames=9, num_inference_steps=2, guidance_scale=1.0, seed=0,
        )
        assert len(frames) == 9
        assert frames[0].shape == (32, 32, 3)

    def test_masked_inpaint_with_reference(self, engine):
        rng = np.random.default_rng(3)
        vid = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
               for _ in range(5)]
        msk = [np.where(np.arange(32)[:, None, None] < 16, 255, 0
                        ).astype(np.uint8).repeat(32, 1).repeat(3, 2)
               for _ in range(5)]
        ref = np.full((32, 32, 3), 200, np.uint8)
        lat = engine.run(
            prompt="fill the region", video=vid, mask=msk,
            reference_images=[ref], height=32, width=32, num_frames=5,
            num_inference_steps=2, guidance_scale=2.0, seed=1,
            return_latents=True,
        )
        lat = np.asarray(lat)
        # 3 latent frames for the video (tiny VAE t-scale 2) + 1 reference
        assert lat.shape[2] == 4
        assert np.isfinite(lat).all()

    def test_t2v_without_control_inputs(self, engine):
        lat = engine.run(prompt="pure t2v", height=32, width=32, num_frames=5,
                         num_inference_steps=2, guidance_scale=1.0, seed=5,
                         return_latents=True)
        assert np.asarray(lat).shape[2] == 3  # (5-1)/2+1 latent frames


class TestFunVace:
    def _engine(self, tmp_path):
        import yaml

        doc = _vace_manifest()
        doc["metadata"]["id"] = "wan-fun-vace-tiny"
        doc["spec"]["model_type"] = "fun_vace"
        path = tmp_path / "wan-fun-vace.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine
        from tests.test_engine_zimage import make_tokenizer

        eng = UniversalEngine(path)
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        return eng

    def test_start_end_keyframes(self, tmp_path):
        import numpy as np

        eng = self._engine(tmp_path)
        rng = np.random.default_rng(0)
        start = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        end = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        frames = eng.run(prompt="morph", start_image=start, end_image=end,
                         height=32, width=32, num_frames=5,
                         num_inference_steps=2, guidance_scale=1.0, seed=3)
        assert len(frames) == 5

    def test_control_video(self, tmp_path):
        import numpy as np

        eng = self._engine(tmp_path)
        rng = np.random.default_rng(1)
        ctl = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
               for _ in range(5)]
        frames = eng.run(prompt="follow", control_video=ctl, height=32,
                         width=32, num_frames=5, num_inference_steps=1,
                         guidance_scale=1.0, seed=2)
        assert len(frames) == 5
