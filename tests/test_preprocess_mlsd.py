"""MLSD line detector: numeric parity vs the reference torch model
(src/preprocess/mlsd/models/mbv2_mlsd_large.py) and the line-decode +
drawing pipeline."""

import logging
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")

REF = "/root/reference/apps/api"


@pytest.fixture(scope="module")
def ref_model():
    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")
        lg.logger = logging.getLogger("ref")
        sys.modules["loguru"] = lg
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.preprocess.mlsd.models.mbv2_mlsd_large import MobileV2_MLSD_Large

    torch.manual_seed(0)
    return MobileV2_MLSD_Large().eval()


@pytest.mark.slow
class TestMLSDParity:
    def test_tpmap_matches_reference(self, ref_model):
        from apex_studio_tpu.preprocess.mlsd import (
            MLSDModel, convert_mlsd_keys)

        sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
        model = MLSDModel(rngs=nnx.Rngs(0))
        tree = convert_mlsd_keys(sd)
        graphdef, state = nnx.split(model)
        missing = []
        for path, leaf in state.flat_state():
            nm = ".".join(str(p) for p in path)
            if nm in tree:
                leaf.value = jnp.asarray(tree[nm])
            else:
                missing.append(nm)
        assert not missing, missing[:5]
        model = nnx.merge(graphdef, state)

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, size=(1, 4, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = ref_model(torch.from_numpy(x)).numpy()  # [1, 9, 32, 32]
        out = np.asarray(model(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, atol=2e-4)


class TestMLSDDecode:
    def test_decode_extracts_planted_line(self):
        from apex_studio_tpu.preprocess.mlsd import decode_lines

        tpmap = np.zeros((32, 32, 9), np.float32)
        tpmap[..., 0] = -10.0  # sigmoid ≈ 0
        tpmap[16, 16, 0] = 10.0  # strong center
        tpmap[16, 16, 1:5] = [-12.0, 0.0, 12.0, 0.0]  # long horizontal line
        lines = decode_lines(tpmap, score_thr=0.1, dist_thr=20.0)
        assert lines.shape == (1, 4)
        x0, y0, x1, y1 = lines[0]
        assert y0 == y1 == 32.0  # 2× map coords
        assert x1 - x0 == 48.0
        # short/weak segments rejected
        tpmap[16, 16, 1:5] = [-1.0, 0.0, 1.0, 0.0]
        assert decode_lines(tpmap, 0.1, 20.0).shape == (0, 4)

    def test_preprocessor_draws_lines(self):
        from apex_studio_tpu.preprocess.mlsd import MLSDModel, MLSDPreprocessor

        pre = MLSDPreprocessor(model=MLSDModel(rngs=nnx.Rngs(0)))
        frame = np.full((64, 48, 3), 128, np.uint8)
        out = pre([frame], detect_resolution=64)[0]
        assert out.shape == (64, 48, 3)
        assert out.dtype == np.uint8
