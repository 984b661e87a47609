"""Third-batch model-free preprocessors + TEED (reference:
src/preprocess/scribble, src/preprocess/tile, src/preprocess/teed)."""

import numpy as np
import pytest

from apex_studio_tpu.preprocess.base import preprocessor_registry


def _img(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    img[20:60, 30:80] = 255  # bright block → no scribble strokes inside
    img[40:50, 90:110] = 0   # dark block → strokes
    return img


class TestScribble:
    def test_min_channel_threshold(self):
        out = preprocessor_registry.get("scribble")().process_frame(_img())
        assert out.shape == (96, 128, 3)
        assert out.dtype == np.uint8
        # dark block → black strokes (inverted map), bright block → white
        assert out[45, 100, 0] == 0
        assert out[40, 50, 0] == 255

    def test_xdog_binary(self):
        out = preprocessor_registry.get("scribble_xdog")().process_frame(_img(), thr_a=32)
        assert set(np.unique(out)).issubset({0, 255})

    def test_xdog_threshold_monotone(self):
        a = preprocessor_registry.get("scribble_xdog")().process_frame(_img(), thr_a=8)
        b = preprocessor_registry.get("scribble_xdog")().process_frame(_img(), thr_a=128)
        assert (a == 255).sum() >= (b == 255).sum()


class TestTile:
    def test_tile_shape_is_64_aligned(self):
        out = preprocessor_registry.get("tile")().process_frame(_img(100, 130))
        assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0

    def test_tile_blurs(self):
        img = _img()
        out = preprocessor_registry.get("tile")().process_frame(_img(128, 128))
        src = _img(128, 128)
        assert np.var(np.diff(out.astype(np.float32), axis=0)) < \
            np.var(np.diff(src.astype(np.float32), axis=0))

    def test_tile_gf_smooths_but_keeps_shape(self):
        img = _img(64, 96)
        out = preprocessor_registry.get("tile_gf")().process_frame(img)
        assert out.shape == img.shape
        assert np.var(np.diff(out.astype(np.float32), axis=0)) < \
            np.var(np.diff(img.astype(np.float32), axis=0))

    def test_tile_simple(self):
        img = _img(64, 96)
        out = preprocessor_registry.get("tile_simple")().process_frame(img, scale_factor=2.0)
        assert out.shape == img.shape
        assert not np.array_equal(out, img)


class TestGuidedFilter:
    def test_edge_preserving(self):
        """Guided filter should smooth flat noise much more than it erodes a
        strong step edge."""
        from apex_studio_tpu.preprocess.basic3 import fast_guided_filter

        rng = np.random.default_rng(0)
        img = np.zeros((64, 64, 3), np.float32)
        img[:, 32:] = 1.0
        noisy = np.clip(img + rng.normal(0, 0.05, img.shape), 0, 1)
        out = fast_guided_filter(noisy.astype(np.float32), radius=5,
                                 eps=0.05, scale=2)
        # noise suppressed in flat regions
        assert out[:, :20].std() < noisy[:, :20].std()
        # edge magnitude retained
        assert (out[:, 40] - out[:, 20]).mean() > 0.8


class TestTEED:
    def test_smish_matches_torch(self):
        import torch
        import torch.nn.functional as F

        from apex_studio_tpu.preprocess.teed import smish

        x = np.linspace(-6, 6, 101, dtype=np.float32)
        t = torch.from_numpy(x)
        want = (t * torch.tanh(torch.log(1 + torch.sigmoid(t)))).numpy()
        got = np.asarray(smish(x))
        np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("k,p", [(2, 0), (4, 1)])
    def test_deconv_matches_torch(self, k, p):
        import jax.numpy as jnp
        import torch
        from flax import nnx

        from apex_studio_tpu.preprocess.teed import _Deconv

        cin, cout = 3, 5
        tdc = torch.nn.ConvTranspose2d(cin, cout, k, stride=2, padding=p)
        d = _Deconv(cin, cout, k, p, rngs=nnx.Rngs(0))
        d.w.value = jnp.asarray(
            tdc.weight.detach().numpy().transpose(2, 3, 0, 1))
        d.bias.value = jnp.asarray(tdc.bias.detach().numpy())
        x = np.random.default_rng(1).standard_normal((1, 7, 9, cin)).astype(np.float32)
        want = tdc(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        got = np.asarray(d(jnp.asarray(x))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_dwconv_matches_torch(self):
        import jax.numpy as jnp
        import torch
        from flax import nnx

        from apex_studio_tpu.preprocess.teed import _DWConv

        tdc = torch.nn.Conv2d(3, 24, 3, padding=1, groups=3)
        d = _DWConv(3, 8, rngs=nnx.Rngs(0))
        d.kernel.value = jnp.asarray(
            tdc.weight.detach().numpy().transpose(2, 3, 1, 0))
        d.bias.value = jnp.asarray(tdc.bias.detach().numpy())
        x = np.random.default_rng(2).standard_normal((1, 8, 8, 3)).astype(np.float32)
        want = tdc(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        got = np.asarray(d(jnp.asarray(x))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_model_output_shapes(self):
        import jax.numpy as jnp

        from apex_studio_tpu.preprocess.teed import TED

        m = TED()
        x = jnp.zeros((1, 64, 96, 3), jnp.float32)
        o1, o2, o3, fused = m(x)
        for o in (o1, o2, o3, fused):
            assert o.shape == (1, 64, 96, 1)

    def test_process_frame_random_weights(self):
        out = preprocessor_registry.get("teed")().process_frame(_img(60, 70))
        assert out.shape == (60, 70, 3)
        assert out.dtype == np.uint8
        # safe_step quantizes to multiples of 1/2 → at most 4 gray levels
        assert len(np.unique(out)) <= 4

    def test_key_converter_covers_model(self):
        """Every converted torch key must land on a real param with matching
        shape (torch layout synthesized from the known architecture)."""
        from flax import nnx

        from apex_studio_tpu.preprocess.teed import TED, convert_teed_keys

        m = TED()
        _, state = nnx.split(m)
        shapes = {".".join(str(p) for p in path): leaf.value.shape
                  for path, leaf in state.flat_state()}
        # synthesize a torch-shaped state dict for the full TED
        torch_sd = {}
        def conv(name, cout, cin, k):
            torch_sd[f"{name}.weight"] = np.zeros((cout, cin, k, k), np.float32)
            torch_sd[f"{name}.bias"] = np.zeros((cout,), np.float32)
        def deconv(name, cin, cout, k):
            torch_sd[f"{name}.weight"] = np.zeros((cin, cout, k, k), np.float32)
            torch_sd[f"{name}.bias"] = np.zeros((cout,), np.float32)
        conv("block_1.conv1", 16, 3, 3); conv("block_1.conv2", 16, 16, 3)
        conv("block_2.conv1", 32, 16, 3); conv("block_2.conv2", 32, 32, 3)
        conv("dblock_3.denselayer1.conv1", 48, 32, 3)
        conv("dblock_3.denselayer1.conv2", 48, 48, 3)
        conv("side_1.conv", 32, 16, 1); conv("pre_dense_3.conv", 48, 32, 1)
        conv("up_block_1.features.0", 1, 16, 1)
        deconv("up_block_1.features.2", 1, 1, 2)
        conv("up_block_2.features.0", 1, 32, 1)
        deconv("up_block_2.features.2", 1, 1, 2)
        conv("up_block_3.features.0", 16, 48, 1)
        deconv("up_block_3.features.2", 16, 16, 4)
        conv("up_block_3.features.3", 1, 16, 1)
        deconv("up_block_3.features.5", 1, 1, 4)
        # depthwise weights have in/groups == 1 in torch layout
        torch_sd["block_cat.DWconv1.weight"] = np.zeros((24, 1, 3, 3), np.float32)
        torch_sd["block_cat.DWconv1.bias"] = np.zeros((24,), np.float32)
        torch_sd["block_cat.DWconv2.weight"] = np.zeros((24, 1, 3, 3), np.float32)
        torch_sd["block_cat.DWconv2.bias"] = np.zeros((24,), np.float32)
        tree = convert_teed_keys(torch_sd)
        missing = [k for k in tree
                   if k not in shapes or shapes[k] != tree[k].shape]
        assert not missing, missing
        covered = set(tree)
        params = set(shapes)
        assert params == covered, params ^ covered


class TestRegistryAndManifests:
    def test_all_new_registered(self):
        for name in ("scribble", "scribble_xdog", "tile", "tile_gf",
                     "tile_simple", "teed"):
            assert preprocessor_registry.get(name) is not None
