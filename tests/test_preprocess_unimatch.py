"""GMFlow/UniMatch optical flow: numeric parity vs the reference torch
model (src/preprocess/unimatch/unimatch/unimatch.py) and the flow pipeline."""

import logging
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")

REF = "/root/reference/apps/api"


def _ref_unimatch(num_scales, reg_refine=False):
    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")
        lg.logger = logging.getLogger("ref")
        sys.modules["loguru"] = lg
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.preprocess.unimatch.unimatch.unimatch import UniMatch

    torch.manual_seed(0)
    return UniMatch(num_scales=num_scales, feature_channels=128,
                    upsample_factor=8 if num_scales == 1 else 4,
                    num_head=1, ffn_dim_expansion=4,
                    num_transformer_layers=6, reg_refine=reg_refine,
                    task="flow").eval()


def _load_jax(oracle, cfg):
    from apex_studio_tpu.preprocess.unimatch import GMFlow, convert_gmflow_keys

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    model = GMFlow(cfg, rngs=nnx.Rngs(0))
    tree = convert_gmflow_keys(sd)
    graphdef, state = nnx.split(model)
    missing = []
    for path, leaf in state.flat_state():
        nm = ".".join(str(p) for p in path)
        if nm in tree:
            leaf.value = jnp.asarray(tree[nm])
        else:
            missing.append(nm)
    assert not missing, missing[:5]
    return nnx.merge(graphdef, state)


@pytest.mark.slow
class TestGMFlowParity:
    def test_scale1_matches_reference(self):
        from apex_studio_tpu.preprocess.unimatch import GMFlowConfig

        oracle = _ref_unimatch(1)
        model = _load_jax(oracle, GMFlowConfig())
        rng = np.random.default_rng(0)
        i0 = rng.uniform(0, 255, size=(1, 3, 64, 64)).astype(np.float32)
        i1 = rng.uniform(0, 255, size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(i0), torch.from_numpy(i1),
                         attn_type="swin", attn_splits_list=[2],
                         corr_radius_list=[-1], prop_radius_list=[-1],
                         task="flow")["flow_preds"][-1].numpy()
        out = np.asarray(model(jnp.asarray(i0.transpose(0, 2, 3, 1)),
                               jnp.asarray(i1.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                                   atol=5e-3, rtol=1e-3)

    def test_scale2_matches_reference(self):
        from apex_studio_tpu.preprocess.unimatch import GMFLOW_CONFIGS

        oracle = _ref_unimatch(2)
        model = _load_jax(oracle, GMFLOW_CONFIGS["gmflow-scale2"])
        rng = np.random.default_rng(1)
        i0 = rng.uniform(0, 255, size=(1, 3, 64, 64)).astype(np.float32)
        i1 = rng.uniform(0, 255, size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(i0), torch.from_numpy(i1),
                         attn_type="swin", attn_splits_list=[2, 8],
                         corr_radius_list=[-1, 4],
                         prop_radius_list=[-1, 1],
                         task="flow")["flow_preds"][-1].numpy()
        out = np.asarray(model(jnp.asarray(i0.transpose(0, 2, 3, 1)),
                               jnp.asarray(i1.transpose(0, 2, 3, 1))))
        # two chained softmax-matching scales amplify f32 noise; 0.1px on a
        # ±26px flow field (<0.4% of range) is numerical, not structural
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                                   atol=1e-1, rtol=1e-3)

    def test_scale2_regrefine_matches_reference(self):
        """scale2-regrefine6 tier: RAFT update block refinement
        (reference reg_refine.py via unimatch.py:345-455)."""
        from apex_studio_tpu.preprocess.unimatch import GMFLOW_CONFIGS
        import dataclasses

        oracle = _ref_unimatch(2, reg_refine=True)
        cfg = dataclasses.replace(GMFLOW_CONFIGS["gmflow-scale2-regrefine6"],
                                  num_reg_refine=2)
        model = _load_jax(oracle, cfg)
        rng = np.random.default_rng(2)
        i0 = rng.uniform(0, 255, size=(1, 3, 64, 64)).astype(np.float32)
        i1 = rng.uniform(0, 255, size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(i0), torch.from_numpy(i1),
                         attn_type="swin", attn_splits_list=[2, 8],
                         corr_radius_list=[-1, 4],
                         prop_radius_list=[-1, 1],
                         num_reg_refine=2,
                         task="flow")["flow_preds"][-1].numpy()
        out = np.asarray(model(jnp.asarray(i0.transpose(0, 2, 3, 1)),
                               jnp.asarray(i1.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                                   atol=1e-1, rtol=1e-3)


class TestFlowPipeline:
    def test_flow_to_image_and_preprocessor(self):
        from apex_studio_tpu.preprocess.unimatch import (
            GMFlow, GMFlowConfig, OpticalFlowPreprocessor, flow_to_image)

        flow = np.zeros((16, 16, 2), np.float32)
        flow[:, :8, 0] = 5.0
        flow[:, 8:, 1] = -5.0
        img = flow_to_image(flow)
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8
        # distinct motion directions get distinct colors
        assert not np.array_equal(img[0, 0], img[0, 12])

        pre = OpticalFlowPreprocessor(model=GMFlow(GMFlowConfig(),
                                                   rngs=nnx.Rngs(0)))
        frames = [np.full((40, 40, 3), v, np.uint8) for v in (50, 100, 150)]
        out = pre(frames, detect_resolution=32)
        assert len(out) == 3
        assert out[0].shape == (40, 40, 3)
