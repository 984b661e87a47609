"""Parallel layer tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from apex_studio_tpu.parallel.mesh import create_mesh, get_mesh, set_mesh
from apex_studio_tpu.parallel.ring_attention import ring_attention_sharded
from apex_studio_tpu.parallel.sharding import ShardingRules, constrain, partition_specs_for, shard_pytree


class TestMesh:
    def test_default_all_tp(self, devices8):
        mesh = create_mesh()
        assert mesh.shape == {"dp": 1, "sp": 1, "tp": 8}

    def test_dp_tp_split(self, devices8):
        mesh = create_mesh(dp=2)
        assert mesh.shape == {"dp": 2, "sp": 1, "tp": 4}

    def test_invalid_split_raises(self, devices8):
        with pytest.raises(ValueError):
            create_mesh(dp=3)

    def test_global_mesh_registry(self, devices8):
        mesh = create_mesh(dp=2)
        set_mesh(mesh)
        assert get_mesh() is mesh
        set_mesh(None)
        assert get_mesh() is None


class TestShardingRules:
    def test_pattern_matching(self):
        rules = ShardingRules(
            [
                (r"attention\.to_[qkv]\.kernel", P(None, "tp")),
                (r"to_out\.kernel", P("tp", None)),
            ]
        )
        assert rules.spec_for("blocks.0.attention.to_q.kernel") == P(None, "tp")
        assert rules.spec_for("blocks.3.attention.to_out.kernel") == P("tp", None)
        assert rules.spec_for("t_embedder.in_layer.kernel") == P()

    def test_shard_pytree_places_leaves(self, devices8):
        mesh = create_mesh()
        rules = ShardingRules([(r"w", P(None, "tp"))])
        tree = {"w": jnp.zeros((4, 16)), "b": jnp.zeros((4,))}
        out = shard_pytree(tree, mesh, rules)
        assert out["w"].sharding.spec == P(None, "tp")

    def test_specs_mirror_tree(self):
        rules = ShardingRules([(r"w", P("tp"))])
        specs = partition_specs_for({"w": jnp.zeros((8,)), "x": jnp.zeros((2,))}, rules)
        assert specs["w"] == P("tp") and specs["x"] == P()

    def test_constrain_identity_off_mesh(self):
        set_mesh(None)
        x = jnp.ones((4, 4))
        np.testing.assert_array_equal(np.asarray(constrain(x, P("tp"))), np.asarray(x))


class TestRingAttention:
    def test_matches_full_attention(self, devices8):
        from apex_studio_tpu.ops.attention import naive_attention

        mesh = create_mesh(dp=1, sp=8, tp=1)
        b, s, h, d = 2, 64, 4, 16  # 8 tokens per device
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)

        ref = naive_attention(q, k, v)
        out = ring_attention_sharded(q, k, v, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_output_stays_sequence_sharded(self, devices8):
        mesh = create_mesh(dp=1, sp=8, tp=1)
        q = jnp.ones((1, 32, 2, 8))
        out = ring_attention_sharded(q, q, q, mesh)
        assert out.sharding.spec[1] == "sp"

    def test_bf16_inputs(self, devices8):
        from apex_studio_tpu.ops.attention import naive_attention

        mesh = create_mesh(dp=1, sp=8, tp=1)
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(ks[0], (1, 32, 2, 8), jnp.bfloat16)
        k = jax.random.normal(ks[1], (1, 32, 2, 8), jnp.bfloat16)
        v = jax.random.normal(ks[2], (1, 32, 2, 8), jnp.bfloat16)
        ref = naive_attention(q, k, v)
        out = ring_attention_sharded(q, k, v, mesh)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )


class TestTPShardedForward:
    def test_zimage_tp_forward_matches_single_device(self, devices8):
        """The TP-sharded DiT must compute the same function."""
        from flax import nnx

        from apex_studio_tpu.models.transformers.zimage import (
            ZImageConfig,
            ZImageTransformer2DModel,
        )

        # dim chosen so every TP-split dim divides 4 (SwiGLU hidden = 48/3*8 = 128).
        cfg = ZImageConfig(
            dim=48, n_layers=1, n_refiner_layers=1, n_heads=4, n_kv_heads=4,
            in_channels=4, cap_feat_dim=32, axes_dims=(4, 4, 4), axes_lens=(64, 32, 32),
        )
        model = ZImageTransformer2DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        graphdef, state = nnx.split(model)

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 1, 8, 8))
        t = jnp.full((1,), 0.3)
        cap = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32))
        mask = jnp.ones((1, 32), bool)

        ref = model(x, t, cap, mask)

        mesh = create_mesh(dp=1, sp=1, tp=4, devices=jax.devices()[:4])
        rules = ZImageTransformer2DModel.sharding_rules(cfg)
        flat = nnx.to_flat_state(state)
        sharded_flat = [
            (kp, jax.device_put(
                leaf.value,
                NamedSharding(mesh, rules.spec_for(".".join(str(p) for p in kp))),
            ))
            for kp, leaf in flat
        ]
        sharded_state = nnx.from_flat_state(sharded_flat)

        @jax.jit
        def fwd(state, x, t, cap, mask):
            return nnx.merge(graphdef, state)(x, t, cap, mask)

        with jax.sharding.set_mesh(mesh):
            out = fwd(sharded_state, x, t, cap, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def _tp_shard_state(model_cls, cfg, model, mesh):
    from flax import nnx

    rules = model_cls.sharding_rules(cfg)
    graphdef, state = nnx.split(model)
    flat = nnx.to_flat_state(state)
    sharded = [
        (kp, jax.device_put(
            leaf.value,
            NamedSharding(mesh, rules.spec_for(".".join(str(p) for p in kp))),
        ))
        for kp, leaf in flat
    ]
    return graphdef, nnx.from_flat_state(sharded)


class TestTPFluxAndWan:
    def test_flux_tp_matches_single_device(self, devices8):
        from flax import nnx

        from apex_studio_tpu.models.transformers.flux import FluxConfig, FluxTransformer2DModel

        cfg = FluxConfig(
            in_channels=16, out_channels=16, num_layers=1, num_single_layers=1,
            attention_head_dim=16, num_attention_heads=4, joint_attention_dim=32,
            pooled_projection_dim=16, guidance_embeds=False, axes_dims_rope=(4, 6, 6),
        )
        model = FluxTransformer2DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
        pooled = jax.random.normal(jax.random.PRNGKey(2), (1, 16))
        t = jnp.full((1,), 0.5)
        ref = model(x, txt, pooled, t, grid_hw=(4, 4))

        mesh = create_mesh(dp=1, sp=1, tp=4, devices=jax.devices()[:4])
        graphdef, state = _tp_shard_state(FluxTransformer2DModel, cfg, model, mesh)

        @jax.jit
        def fwd(state, x, txt, pooled, t):
            return nnx.merge(graphdef, state)(x, txt, pooled, t, grid_hw=(4, 4))

        with jax.sharding.set_mesh(mesh):
            out = fwd(state, x, txt, pooled, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_wan_tp_matches_single_device(self, devices8):
        from flax import nnx

        from apex_studio_tpu.models.transformers.wan import WanConfig, WanTransformer3DModel

        cfg = WanConfig(
            num_attention_heads=4, attention_head_dim=24, in_channels=4,
            out_channels=4, text_dim=32, freq_dim=32, ffn_dim=64, num_layers=1,
        )
        model = WanTransformer3DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 1, 8, 8))
        t = jnp.full((1,), 500.0)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
        ref = model(x, t, ctx)

        mesh = create_mesh(dp=1, sp=1, tp=4, devices=jax.devices()[:4])
        graphdef, state = _tp_shard_state(WanTransformer3DModel, cfg, model, mesh)

        @jax.jit
        def fwd(state, x, t, ctx):
            return nnx.merge(graphdef, state)(x, t, ctx)

        with jax.sharding.set_mesh(mesh):
            out = fwd(state, x, t, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_hyv15_tp_matches_single_device(self, devices8):
        """HYV15 — the v5e-8 headline model — must be TP-exact (VERDICT r1 #8)."""
        from flax import nnx

        from apex_studio_tpu.models.transformers.hunyuanvideo15 import (
            HYV15Config,
            HunyuanVideo15Transformer3DModel,
        )

        cfg = HYV15Config(
            in_channels=9, out_channels=4, num_attention_heads=4,
            attention_head_dim=12, num_layers=1, num_refiner_layers=1,
            mlp_ratio=2.0, text_embed_dim=32, text_embed_2_dim=16,
            image_embed_dim=16, rope_axes_dim=(4, 4, 4),
        )
        model = HunyuanVideo15Transformer3DModel(cfg, dtype=jnp.float32,
                                                 param_dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 2, 4, 4))
        t = jnp.full((1,), 500.0)
        text = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
        mask = jnp.ones((1, 8), jnp.int32)
        ref = model(x, t, text, mask)

        mesh = create_mesh(dp=1, sp=1, tp=4, devices=jax.devices()[:4])
        graphdef, state = _tp_shard_state(HunyuanVideo15Transformer3DModel, cfg, model, mesh)

        @jax.jit
        def fwd(state, x, t, text, mask):
            return nnx.merge(graphdef, state)(x, t, text, mask)

        with jax.sharding.set_mesh(mesh):
            out = fwd(state, x, t, text, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_attention_dispatch_routes_ring_when_sp_mesh_active():
    """ops.attention auto-routes through ring attention when the process mesh
    has sp > 1 — the wan long-video engines consume the sp axis through this
    path (SURVEY §5 long-context)."""
    import numpy as np

    from apex_studio_tpu.ops.attention import attention, naive_attention
    from apex_studio_tpu.parallel.mesh import create_mesh, get_mesh, set_mesh

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 16, 2, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 16, 2, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 16, 2, 8)), jnp.float32)
    ref = naive_attention(q, k, v)

    prev = get_mesh()
    set_mesh(create_mesh(dp=1, sp=8, tp=1))
    try:
        out = attention(q, k, v)
    finally:
        set_mesh(prev)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
