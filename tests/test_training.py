import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from apex_studio_tpu.models.transformers.zimage import ZImageConfig, ZImageTransformer2DModel
from apex_studio_tpu.training.lora import (
    apply_lora_to_state,
    init_lora,
    make_train_step,
    save_lora_safetensors,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = ZImageConfig(
        dim=32, n_layers=1, n_refiner_layers=1, n_heads=2, n_kv_heads=2,
        in_channels=4, cap_feat_dim=16, axes_dims=(4, 6, 6), axes_lens=(64, 32, 32),
    )
    model = ZImageTransformer2DModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    return model


def make_batch(cfg, b=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return {
        "x0": jax.random.normal(ks[0], (b, cfg.in_channels, 1, 8, 8)),
        "noise": jax.random.normal(ks[1], (b, cfg.in_channels, 1, 8, 8)),
        "sigma": jax.random.uniform(ks[2], (b,), minval=0.05, maxval=0.95),
        "cap": jax.random.normal(ks[3], (b, 32, cfg.cap_feat_dim)),
        "t": None,  # filled in forward
    }


def forward(model, batch):
    t = batch["sigma"]  # flow time as conditioning
    mask = jnp.ones(batch["cap"].shape[:2], bool)
    return model(batch["xt"], t, batch["cap"], mask)[:, :, :]


class TestLoraInit:
    def test_targets_matched(self, tiny):
        lora = init_lora(tiny, rank=2)
        assert len(lora) > 0
        assert any("attention.to_q.kernel" in p for p in lora)
        a, b = next(iter(lora.values()))
        assert a.shape[0] == 2 and b.shape[1] == 2

    def test_zero_b_means_identity(self, tiny):
        graphdef, state = nnx.split(tiny)
        lora = init_lora(tiny, rank=2)
        merged = apply_lora_to_state(state, lora)
        for (kp1, l1), (kp2, l2) in zip(
            nnx.to_flat_state(state), nnx.to_flat_state(merged)
        ):
            v1 = l1.value if hasattr(l1, "value") else l1
            v2 = l2.value if hasattr(l2, "value") else l2
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-7)

    def test_bad_pattern_raises(self, tiny):
        with pytest.raises(ValueError):
            init_lora(tiny, targets=r"nonexistent_param_xyz")


class TestTrainStep:
    def test_loss_decreases(self, tiny):
        graphdef, state = nnx.split(tiny)
        lora = init_lora(tiny, rank=4)
        opt = optax.adam(1e-2)
        opt_state = opt.init(lora)
        step = make_train_step(graphdef, state, forward, opt)

        batch = {k: v for k, v in make_batch(tiny.cfg).items() if v is not None}
        losses = []
        for i in range(8):
            lora, opt_state, loss = step(lora, opt_state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

    def test_base_state_untouched(self, tiny):
        graphdef, state = nnx.split(tiny)
        before = np.asarray(tiny.layers[0].attention.to_q.kernel.value).copy()
        lora = init_lora(tiny, rank=2)
        opt = optax.adam(1e-2)
        step = make_train_step(graphdef, state, forward, opt)
        batch = {k: v for k, v in make_batch(tiny.cfg).items() if v is not None}
        step(lora, opt.init(lora), batch)
        np.testing.assert_array_equal(
            np.asarray(tiny.layers[0].attention.to_q.kernel.value), before
        )


class TestRoundtrip:
    def test_saved_lora_loads_via_manager(self, tiny, tmp_path):
        """Train-format output must merge back through the inference LoRA path."""
        from apex_studio_tpu.lora.manager import LoraManager

        lora = init_lora(tiny, rank=2, seed=3)
        # give B some signal so the merge changes weights
        lora = {p: (a, jnp.ones_like(b) * 0.01) for p, (a, b) in lora.items()}
        path = tmp_path / "trained_lora.safetensors"
        save_lora_safetensors(lora, path)

        before = np.asarray(tiny.layers[0].attention.to_q.kernel.value).copy()
        mgr = LoraManager(lora_root=tmp_path)
        applied = mgr.load_into(tiny, {"path": "trained_lora.safetensors", "scale": 1.0})
        assert applied == len(lora)
        after = np.asarray(tiny.layers[0].attention.to_q.kernel.value)
        assert np.abs(after - before).max() > 1e-6
