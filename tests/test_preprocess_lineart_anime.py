"""LineartAnime UNet generator: numeric parity vs the reference torch model
(src/preprocess/lineart_anime/__init__.py UnetGenerator)."""

import functools
import logging
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")

REF = "/root/reference/apps/api"


@pytest.mark.slow
class TestLineartAnimeParity:
    def test_matches_reference(self):
        import torch.nn as nn

        if "loguru" not in sys.modules:
            lg = types.ModuleType("loguru")
            lg.logger = logging.getLogger("ref")
            sys.modules["loguru"] = lg
        if REF not in sys.path:
            sys.path.insert(0, REF)
        from src.preprocess.lineart_anime import UnetGenerator

        from apex_studio_tpu.preprocess.lineart_anime import (
            LineartAnimeGenerator, convert_lineart_anime_keys)

        torch.manual_seed(0)
        norm = functools.partial(nn.InstanceNorm2d, affine=False,
                                 track_running_stats=False)
        oracle = UnetGenerator(3, 1, 8, 64, norm_layer=norm,
                               use_dropout=False).eval()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        model = LineartAnimeGenerator(rngs=nnx.Rngs(0))
        tree = convert_lineart_anime_keys(sd)
        graphdef, state = nnx.split(model)
        missing = []
        for path, leaf in state.flat_state():
            nm = ".".join(str(p) for p in path)
            if nm in tree:
                leaf.value = jnp.asarray(tree[nm])
            else:
                missing.append(nm)
        assert not missing, missing[:5]
        assert len(tree) == sum(1 for _ in state.flat_state())
        model = nnx.merge(graphdef, state)

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, size=(1, 3, 256, 256)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x)).numpy()
        out = np.asarray(model(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                                   atol=2e-4)


class TestLineartAnimePreprocessor:
    def test_output_shape_and_inversion(self):
        from apex_studio_tpu.preprocess.lineart_anime import (
            LineartAnimeGenerator, LineartAnimePreprocessor)

        pre = LineartAnimePreprocessor(
            model=LineartAnimeGenerator(rngs=nnx.Rngs(0)))
        frame = np.full((70, 50, 3), 150, np.uint8)
        out = pre([frame], detect_resolution=256)[0]
        assert out.shape == (70, 50, 3)
        assert out.dtype == np.uint8
