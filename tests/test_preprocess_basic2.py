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


class TestLineartModel:
    def test_parity_with_torch(self):
        """Random-weight parity: the JAX generator must match the reference
        torch Generator bit-for-bit (same ported weights)."""
        import torch
        import torch.nn as tnn
        from flax import nnx
        import jax.numpy as jnp

        norm = tnn.InstanceNorm2d

        class ResidualBlock(tnn.Module):
            def __init__(self, ch):
                super().__init__()
                self.conv_block = tnn.Sequential(
                    tnn.ReflectionPad2d(1), tnn.Conv2d(ch, ch, 3), norm(ch),
                    tnn.ReLU(inplace=True), tnn.ReflectionPad2d(1),
                    tnn.Conv2d(ch, ch, 3), norm(ch))

            def forward(self, x):
                return x + self.conv_block(x)

        class Generator(tnn.Module):
            def __init__(self, n_blocks=3):
                super().__init__()
                self.model0 = tnn.Sequential(
                    tnn.ReflectionPad2d(3), tnn.Conv2d(3, 64, 7), norm(64),
                    tnn.ReLU(inplace=True))
                self.model1 = tnn.Sequential(
                    tnn.Conv2d(64, 128, 3, stride=2, padding=1), norm(128),
                    tnn.ReLU(inplace=True),
                    tnn.Conv2d(128, 256, 3, stride=2, padding=1), norm(256),
                    tnn.ReLU(inplace=True))
                self.model2 = tnn.Sequential(*[ResidualBlock(256)
                                               for _ in range(n_blocks)])
                self.model3 = tnn.Sequential(
                    tnn.ConvTranspose2d(256, 128, 3, stride=2, padding=1,
                                        output_padding=1), norm(128),
                    tnn.ReLU(inplace=True),
                    tnn.ConvTranspose2d(128, 64, 3, stride=2, padding=1,
                                        output_padding=1), norm(64),
                    tnn.ReLU(inplace=True))
                self.model4 = tnn.Sequential(
                    tnn.ReflectionPad2d(3), tnn.Conv2d(64, 1, 7), tnn.Sigmoid())

            def forward(self, x):
                return self.model4(self.model3(self.model2(self.model1(
                    self.model0(x)))))

        from apex_studio_tpu.preprocess.lineart_model import (
            LineartGenerator, convert_lineart_keys)

        torch.manual_seed(0)
        tm = Generator().eval()
        jm = LineartGenerator(rngs=nnx.Rngs(0))
        tree = convert_lineart_keys(
            {k: v.numpy() for k, v in tm.state_dict().items()})
        graphdef, state = nnx.split(jm)
        loaded = 0
        for path, leaf in state.flat_state():
            nm = ".".join(str(p) for p in path)
            if nm in tree:
                assert tree[nm].shape == leaf.value.shape, nm
                leaf.value = jnp.asarray(tree[nm])
                loaded += 1
        assert loaded >= 14, loaded
        jm = nnx.merge(graphdef, state)

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, size=(1, 3, 32, 48)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(img))[0, 0].numpy()
        ours = np.asarray(jm(jnp.asarray(img.transpose(0, 2, 3, 1))))[0, :, :, 0]
        assert np.abs(ours - ref).max() < 1e-4

    def test_process_frame(self):
        from flax import nnx

        from apex_studio_tpu.preprocess.lineart_model import (
            LineartGenerator, LineartModelPreprocessor)

        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, size=(30, 46, 3), dtype=np.uint8)
        proc = LineartModelPreprocessor(
            model=LineartGenerator(rngs=nnx.Rngs(0)),
            coarse_model=LineartGenerator(rngs=nnx.Rngs(1)))
        out = proc.process_frame(frame)
        coarse = proc.process_frame(frame, coarse=True)
        assert out.shape == frame.shape
        assert not np.array_equal(out, coarse)


class TestPiDiNet:
    def test_parity_with_torch_blocks(self):
        """Folded pixel-difference kernels match the reference PDC ops."""
        import torch
        import torch.nn.functional as F

        from apex_studio_tpu.preprocess.pidinet import convert_pidinet_keys

        rng = np.random.default_rng(0)
        x = torch.from_numpy(rng.standard_normal((1, 3, 8, 8)).astype(np.float32))
        w = torch.from_numpy(rng.standard_normal((6, 3, 3, 3)).astype(np.float32))
        # cd: y = conv(W) − conv(sum W)
        ref = F.conv2d(x, w, padding=1) - F.conv2d(
            x, w.sum(dim=[2, 3], keepdim=True))
        folded = np.asarray(w).copy()
        folded[:, :, 1, 1] -= np.asarray(w).sum(axis=(2, 3))
        ours = F.conv2d(x, torch.from_numpy(folded), padding=1)
        assert torch.allclose(ref, ours, atol=1e-5)

    def test_network_runs_and_key_conversion(self):
        from flax import nnx
        import jax.numpy as jnp

        from apex_studio_tpu.preprocess.pidinet import (
            PiDiNet, PiDiNetPreprocessor, convert_pidinet_keys)

        m = PiDiNet(inplane=8, dil=8, rngs=nnx.Rngs(0))
        out = m(jnp.ones((1, 16, 24, 3)))
        assert out.shape == (1, 16, 24, 1)
        rng = np.random.default_rng(1)
        frame = rng.integers(0, 255, size=(20, 28, 3), dtype=np.uint8)
        proc = PiDiNetPreprocessor(model=m)
        res = proc.process_frame(frame)
        assert res.shape == frame.shape
        scrib = proc.process_frame(frame, scribble=True)
        assert set(np.unique(scrib)).issubset({0, 255})

    def test_key_conversion_structure(self):
        from apex_studio_tpu.preprocess.pidinet import convert_pidinet_keys

        sd = {
            "module.init_block.weight": np.zeros((60, 3, 3, 3), np.float32),
            "module.block1_1.conv1.weight": np.zeros((60, 1, 3, 3), np.float32),
            "module.block1_2.conv1.weight": np.zeros((60, 1, 3, 3), np.float32),
            "module.block2_1.shortcut.weight": np.zeros((120, 60, 1, 1), np.float32),
            "module.dilations.0.conv2_3.weight": np.zeros((24, 24, 3, 3), np.float32),
            "module.classifier.weight": np.zeros((1, 4, 1, 1), np.float32),
        }
        out = convert_pidinet_keys(sd)
        assert out["init_block.kernel"].shape == (3, 3, 3, 60)
        # block1_2 is 'rd' (carv4 layer 2) → folded to 5x5 depthwise
        assert out["blocks1.1.conv1.kernel"].shape == (5, 5, 1, 60)
        assert out["blocks2.0.shortcut.kernel"].shape == (1, 1, 60, 120)
        assert out["dilations.0.branches.2.kernel"].shape == (3, 3, 24, 24)
