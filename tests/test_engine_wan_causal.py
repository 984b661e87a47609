"""Wan causal (autoregressive block-wise) engine on tiny random weights."""

import copy

import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer


def _causal_manifest():
    m = copy.deepcopy(WAN_TINY)
    m["metadata"]["id"] = "wan-causal-tiny-test"
    m["spec"]["model_type"] = "causal"
    tf = next(c for c in m["spec"]["components"] if c["type"] == "transformer")
    tf["base"] = "wan.causal"
    return m


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "wan-causal-tiny.yml"
    path.write_text(yaml.safe_dump(_causal_manifest()))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    for spec in eng.component_specs.values():
        if spec.get("type") == "text_encoder":
            spec["tokenizer"] = make_tokenizer()
    return eng


class TestWanCausal:
    def test_t2v_blockwise_generation(self, engine):
        frames = engine.run(
            prompt="a drifting cloud",
            height=32, width=32,
            num_frames=25,  # → 7 latent frames → 2 blocks of 3 (+1 dropped)
            num_inference_steps=2,
            num_frame_per_block=3,
            seed=11,
        )
        assert len(frames) >= 21
        assert frames[0].shape == (32, 32, 3) and frames[0].dtype == np.uint8

    def test_seed_determinism(self, engine):
        common = dict(prompt="x", height=32, width=32, num_frames=13,
                      num_inference_steps=2, num_frame_per_block=3,
                      seed=3, return_latents=True)
        a = engine.run(**common)
        b = engine.run(**common)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_i2v_prefill_keeps_first_frame(self, engine):
        image = np.full((32, 32, 3), 90, np.uint8)
        lat = engine.run(
            prompt="hold still", image=image, height=32, width=32,
            num_frames=13, num_inference_steps=2, num_frame_per_block=3,
            seed=5, return_latents=True,
        )
        lat = np.asarray(lat)
        # 1 conditioning latent frame + 3 generated blocks of 3
        assert lat.shape[2] >= 4
        assert np.isfinite(lat).all()
        # First latent frame is the committed conditioning latent — identical
        # across seeds.
        lat2 = np.asarray(engine.run(
            prompt="hold still", image=image, height=32, width=32,
            num_frames=13, num_inference_steps=2, num_frame_per_block=3,
            seed=77, return_latents=True,
        ))
        np.testing.assert_allclose(lat[:, :, 0], lat2[:, :, 0], atol=1e-5)

    def test_local_attention_window_runs(self, engine):
        lat = engine.run(
            prompt="windowed", height=32, width=32, num_frames=13,
            num_inference_steps=2, num_frame_per_block=3, local_attn_size=3,
            sink_size=1, seed=2, return_latents=True,
        )
        assert np.isfinite(np.asarray(lat)).all()


def test_cache_causality():
    """Tokens in a later block must not change earlier committed cache; the
    committed cache must change later blocks (i.e. information flows forward)."""
    import jax.numpy as jnp
    from flax import nnx

    from apex_studio_tpu.models.transformers.wan import WanCausalTransformer3DModel, WanConfig

    cfg = WanConfig(num_layers=1, num_attention_heads=2, attention_head_dim=16,
                    in_channels=4, out_channels=4, text_dim=16, freq_dim=32,
                    ffn_dim=64, patch_size=(1, 2, 2))
    m = WanCausalTransformer3DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                                    rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.normal(size=(1, 8, 16)), jnp.float32)
    blk = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
    t = jnp.zeros((1, 2), jnp.float32)
    s_max = 4 * 16  # 4 latent frames x 16 tokens/frame
    kc, vc = m.init_cache(1, s_max)
    rope0 = m.causal_rope_tables(0, 2, 4, 4)

    out0, (kc1, vc1) = m.forward_causal(blk, t, ctx, kc, vc, jnp.int32(0), *rope0)
    # Second block at frames 2..3, attending to the committed first block.
    blk2 = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
    rope1 = m.causal_rope_tables(2, 2, 4, 4)
    out_with_cache, _ = m.forward_causal(blk2, t, ctx, kc1, vc1, jnp.int32(32), *rope1)
    out_empty_cache, _ = m.forward_causal(blk2, t, ctx, kc, vc, jnp.int32(32), *rope1)
    # Note: with an empty (zero) cache the masked positions still admit the
    # zero keys — outputs must differ once real context is present.
    assert not np.allclose(np.asarray(out_with_cache), np.asarray(out_empty_cache))
    # Committed cache entries for block 0 are unchanged by block-1 writes.
    _, (kc2, _) = m.forward_causal(blk2, t, ctx, kc1, vc1, jnp.int32(32), *rope1)
    np.testing.assert_allclose(np.asarray(kc1[:, :, :32]), np.asarray(kc2[:, :, :32]))
