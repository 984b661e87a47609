"""Second batch of model-free preprocessors (reference: src/preprocess/
binary, color, shuffle, recolor, lineart_standard, pyracanny)."""

import numpy as np
import pytest


@pytest.fixture()
def frame():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
    img[20:40, 30:60] = 250  # a bright block for edges
    return img


@pytest.mark.parametrize("name", [
    "binary", "color", "shuffle", "recolor", "lineart_standard", "pyracanny",
])
def test_runs_and_preserves_shape(name, frame):
    from apex_studio_tpu.preprocess.base import preprocessor_registry

    proc = preprocessor_registry.get(name)()
    out = proc.process_frame(frame)
    assert out.shape == frame.shape
    assert out.dtype == np.uint8


def test_binary_is_binary(frame):
    from apex_studio_tpu.preprocess.base import preprocessor_registry

    out = preprocessor_registry.get("binary")().process_frame(frame)
    assert set(np.unique(out)).issubset({0, 255})


def test_color_blocks(frame):
    from apex_studio_tpu.preprocess.base import preprocessor_registry

    out = preprocessor_registry.get("color")().process_frame(frame)
    # 64x block palette → very few unique colors
    assert len(np.unique(out.reshape(-1, 3), axis=0)) <= 8


def test_shuffle_seeded_deterministic(frame):
    from apex_studio_tpu.preprocess.base import preprocessor_registry

    p = preprocessor_registry.get("shuffle")()
    a = p.process_frame(frame, seed=3)
    b = p.process_frame(frame, seed=3)
    c = p.process_frame(frame, seed=4)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_recolor_modes_differ(frame):
    from apex_studio_tpu.preprocess.base import preprocessor_registry

    p = preprocessor_registry.get("recolor")()
    lum = p.process_frame(frame, mode="luminance")
    inten = p.process_frame(frame, mode="intensity")
    assert not np.array_equal(lum, inten)


class TestHED:
    def test_random_weights_edge_map(self):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.preprocess.hed import ControlNetHED, HEDPreprocessor

        rng = np.random.default_rng(1)
        frame = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        proc = HEDPreprocessor(model=ControlNetHED(rngs=nnx.Rngs(0)))
        out = proc.process_frame(frame)
        assert out.shape == frame.shape
        assert out.dtype == np.uint8

    def test_scribble_binary(self):
        from flax import nnx

        from apex_studio_tpu.preprocess.hed import ControlNetHED, HEDPreprocessor

        rng = np.random.default_rng(2)
        frame = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        proc = HEDPreprocessor(model=ControlNetHED(rngs=nnx.Rngs(0)))
        out = proc.process_frame(frame, scribble=True)
        assert set(np.unique(out)).issubset({0, 255})

    def test_key_conversion_roundtrip(self):
        from apex_studio_tpu.preprocess.hed import convert_hed_keys

        sd = {"norm": np.zeros((1, 3, 1, 1), np.float32),
              "block1.convs.0.weight": np.zeros((64, 3, 3, 3), np.float32),
              "block1.convs.0.bias": np.zeros((64,), np.float32),
              "block1.projection.weight": np.zeros((1, 64, 1, 1), np.float32)}
        out = convert_hed_keys(sd)
        assert out["norm"].shape == (1, 1, 1, 3)
        assert out["block1.convs.0.kernel"].shape == (3, 3, 3, 64)
        assert out["block1.projection.kernel"].shape == (1, 1, 64, 1)
