"""MangaLine (res_skip) numeric parity vs the reference torch model
(src/preprocess/manga_line/model_torch.py)."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")

REF = "/root/reference/apps/api"


@pytest.mark.slow
class TestMangaLineParity:
    def test_matches_reference(self):
        import logging
        import types

        if "loguru" not in sys.modules:
            lg = types.ModuleType("loguru")
            lg.logger = logging.getLogger("ref")
            sys.modules["loguru"] = lg
        if REF not in sys.path:
            sys.path.insert(0, REF)
        from src.preprocess.manga_line.model_torch import res_skip

        from apex_studio_tpu.preprocess.manga_line import (
            MangaLineModel, convert_manga_line_keys)

        torch.manual_seed(0)
        oracle = res_skip().eval()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        model = MangaLineModel(rngs=nnx.Rngs(0))
        tree = convert_manga_line_keys(sd)
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
        x = rng.uniform(0, 255, size=(1, 1, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x)).numpy()
        out = np.asarray(model(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                                   atol=3e-3, rtol=1e-4)


class TestMangaLinePreprocessor:
    def test_output_shape_and_inversion(self):
        from apex_studio_tpu.preprocess.manga_line import (
            MangaLineModel, MangaLinePreprocessor)

        pre = MangaLinePreprocessor(model=MangaLineModel(rngs=nnx.Rngs(0)))
        frame = np.full((80, 60, 3), 200, np.uint8)
        out = pre([frame], detect_resolution=256)[0]
        assert out.shape == (80, 60, 3)
        assert out.dtype == np.uint8
