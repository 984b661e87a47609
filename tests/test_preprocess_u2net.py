"""U2Net / rembg background removal (reference: src/preprocess/rembg)."""

import numpy as np
import pytest

from apex_studio_tpu.preprocess.base import preprocessor_registry


def _img(h=48, w=64):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    img[10:35, 20:50] = [200, 30, 30]  # a "subject" blob
    return img


class TestConvBnRelu:
    def test_matches_torch_eval_bn(self):
        import jax.numpy as jnp
        import torch
        from flax import nnx

        from apex_studio_tpu.preprocess.u2net import _ConvBnRelu

        tconv = torch.nn.Conv2d(3, 8, 3, padding=2, dilation=2)
        tbn = torch.nn.BatchNorm2d(8).eval()
        with torch.no_grad():
            tbn.running_mean.uniform_(-1, 1)
            tbn.running_var.uniform_(0.5, 2.0)
            tbn.weight.uniform_(0.5, 1.5)
            tbn.bias.uniform_(-0.5, 0.5)
        m = _ConvBnRelu(3, 8, dilation=2, rngs=nnx.Rngs(0))
        m.kernel.value = jnp.asarray(
            tconv.weight.detach().numpy().transpose(2, 3, 1, 0))
        m.bias.value = jnp.asarray(tconv.bias.detach().numpy())
        m.bn_scale.value = jnp.asarray(tbn.weight.detach().numpy())
        m.bn_bias.value = jnp.asarray(tbn.bias.detach().numpy())
        m.bn_mean.value = jnp.asarray(tbn.running_mean.numpy())
        m.bn_var.value = jnp.asarray(tbn.running_var.numpy())
        x = np.random.default_rng(1).standard_normal((1, 10, 12, 3)).astype(np.float32)
        with torch.no_grad():
            want = torch.relu(tbn(tconv(
                torch.from_numpy(x.transpose(0, 3, 1, 2))))).numpy()
        got = np.asarray(m(x)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestU2NetModel:
    def test_light_forward_shapes(self):
        import jax.numpy as jnp

        from apex_studio_tpu.preprocess.u2net import U2Net

        m = U2Net(light=True)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        d0 = m(x)
        assert d0.shape == (1, 64, 64, 1)
        assert float(d0.min()) >= 0.0 and float(d0.max()) <= 1.0

    def test_odd_input_sizes(self):
        """ceil-mode pooling must round-trip odd spatial dims."""
        import jax.numpy as jnp

        from apex_studio_tpu.preprocess.u2net import U2Net

        m = U2Net(light=True)
        d0 = m(jnp.zeros((1, 70, 52, 3), jnp.float32))
        assert d0.shape == (1, 70, 52, 1)

    def test_converter_stage_mapping(self):
        """Torch stage1 (RSU7) keys must land on convin/enc/bottom/dec with
        the documented ordering."""
        from apex_studio_tpu.preprocess.u2net import (
            U2Net,
            _finalize_u2net_tree,
            convert_u2net_keys,
        )

        sd = {}
        def add(layer, cin, cout):
            sd[f"stage1.{layer}.conv_s1.weight"] = np.zeros(
                (cout, cin, 3, 3), np.float32)
            sd[f"stage1.{layer}.conv_s1.bias"] = np.zeros((cout,), np.float32)
            for a, shp in (("weight", cout), ("bias", cout),
                           ("running_mean", cout), ("running_var", cout)):
                sd[f"stage1.{layer}.bn_s1.{a}"] = np.zeros((shp,), np.float32)
        # u2netp stage1 = RSU7(3,16,64)
        add("rebnconvin", 3, 64)
        add("rebnconv1", 64, 16)
        for i in range(2, 7):
            add(f"rebnconv{i}", 16, 16)
        add("rebnconv7", 16, 16)              # bottom, dilation 2
        add("rebnconv6d", 32, 16)
        for i in range(5, 1, -1):
            add(f"rebnconv{i}d", 32, 16)
        add("rebnconv1d", 32, 64)
        m = U2Net(light=True)
        tree = _finalize_u2net_tree(convert_u2net_keys(sd), m)
        got = sorted(k for k in tree if k.endswith(".kernel"))
        assert "stage1.convin.kernel" in got
        assert "stage1.bottom.kernel" in got
        assert "stage1.enc.0.kernel" in got and "stage1.enc.5.kernel" in got
        assert "stage1.dec.0.kernel" in got and "stage1.dec.5.kernel" in got
        # torch rebnconv1d (2*mid→cout) must be the LAST decoder conv
        assert tree["stage1.dec.5.kernel"].shape == (3, 3, 32, 64)
        assert tree["stage1.dec.0.kernel"].shape == (3, 3, 32, 16)

    def test_full_variant_converter_coverage(self):
        """Full u2net has 6 distinct side channels — the converter must map
        side and outconv keys."""
        from apex_studio_tpu.preprocess.u2net import convert_u2net_keys

        sd = {
            "side1.weight": np.zeros((1, 64, 3, 3), np.float32),
            "side1.bias": np.zeros((1,), np.float32),
            "outconv.weight": np.zeros((1, 6, 1, 1), np.float32),
            "outconv.bias": np.zeros((1,), np.float32),
        }
        tree = convert_u2net_keys(sd)
        assert tree["side1.kernel"].shape == (3, 3, 64, 1)
        assert tree["outconv_kernel"].shape == (1, 1, 6, 1)


class TestRembgPreprocessor:
    def _proc(self):
        from apex_studio_tpu.preprocess.u2net import RembgPreprocessor, U2Net

        return RembgPreprocessor(model=U2Net(light=True),
                                 model_name="u2netp")

    def test_rgba_output(self):
        out = self._proc().process_frame(_img(), model_name="u2netp")
        assert out.shape == (48, 64, 4)
        assert out.dtype == np.uint8

    def test_only_mask(self):
        out = self._proc().process_frame(_img(), model_name="u2netp",
                                         only_mask=True)
        assert out.shape == (48, 64, 3)

    def test_bgcolor_composites_opaque(self):
        out = self._proc().process_frame(_img(), model_name="u2netp",
                                         bgcolor=(0, 255, 0))
        assert out.shape == (48, 64, 4)
        assert (out[:, :, 3] == 255).all()

    def test_post_process_binarizes(self):
        out = self._proc().process_frame(_img(), model_name="u2netp",
                                         post_process_mask=True)
        assert set(np.unique(out[:, :, 3])).issubset({0, 255})

    def test_registered(self):
        assert preprocessor_registry.get("rembg") is not None
        assert preprocessor_registry.get("background_removal") is not None
