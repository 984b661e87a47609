"""Anime segmentation parity: ISNetDIS vs the reference torch model
(src/preprocess/anime_face_segment/isnet.py) and the face-parsing UNet vs an
inline torchvision-exact MobileNetV2 oracle."""

import logging
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")
import torch.nn as nn

REF = "/root/reference/apps/api"


def _stubs():
    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")
        lg.logger = logging.getLogger("ref")
        sys.modules["loguru"] = lg
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    if REF not in sys.path:
        sys.path.insert(0, REF)


class _TConvBNReLU(nn.Sequential):
    def __init__(self, cin, cout, k=3, stride=1, groups=1):
        super().__init__(
            nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                      bias=False),
            nn.BatchNorm2d(cout), nn.ReLU6(inplace=True))


class _TIR(nn.Module):
    """torchvision InvertedResidual with torchvision key layout."""

    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = int(round(cin * expand))
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand != 1:
            layers.append(_TConvBNReLU(cin, hidden, 1))
        layers += [_TConvBNReLU(hidden, hidden, 3, stride, groups=hidden),
                   nn.Conv2d(hidden, cout, 1, bias=False),
                   nn.BatchNorm2d(cout)]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


def _mob_blocks():
    table = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2)]
    blocks = [_TConvBNReLU(3, 32, 3, 2)]
    cin = 32
    for t, c, n, s in table:
        for i in range(n):
            blocks.append(_TIR(cin, c, s if i == 0 else 1, t))
            cin = c
    return blocks


class _TAnimeUNet(nn.Module):
    """network.py:10 with reference key layout (en_blockN.M...)."""

    def __init__(self):
        super().__init__()
        mb = _mob_blocks()
        self.en_block0 = nn.Sequential(mb[0], mb[1])
        self.en_block1 = nn.Sequential(mb[2], mb[3])
        self.en_block2 = nn.Sequential(mb[4], mb[5], mb[6])
        self.en_block3 = nn.Sequential(*mb[7:14])
        self.en_block4 = nn.Sequential(*mb[14:17])

        def dec(cin, cout):
            return nn.Sequential(
                nn.UpsamplingNearest2d(scale_factor=2),
                nn.Conv2d(cin, cout, 3, padding=1),
                nn.InstanceNorm2d(cout), nn.LeakyReLU(0.1), nn.Dropout(0.2))

        self.de_block4 = dec(160, 96)
        self.de_block3 = dec(192, 32)
        self.de_block2 = dec(64, 24)
        self.de_block1 = dec(48, 16)
        self.de_block0 = nn.Sequential(
            nn.UpsamplingNearest2d(scale_factor=2),
            nn.Conv2d(32, 7, 3, padding=1), nn.Softmax2d())

    def forward(self, x):
        e0 = self.en_block0(x)
        e1 = self.en_block1(e0)
        e2 = self.en_block2(e1)
        e3 = self.en_block3(e2)
        e4 = self.en_block4(e3)
        d4 = self.de_block4(e4)
        d3 = self.de_block3(torch.cat((d4, e3), 1))
        d2 = self.de_block2(torch.cat((d3, e2), 1))
        d1 = self.de_block1(torch.cat((d2, e1), 1))
        return self.de_block0(torch.cat((d1, e0), 1))


def _load(model, tree):
    graphdef, state = nnx.split(model)
    missing = []
    for path, leaf in state.flat_state():
        nm = ".".join(str(p) for p in path)
        if nm in tree:
            leaf.value = jnp.asarray(tree[nm])
        else:
            missing.append(nm)
    return nnx.merge(graphdef, state), missing


@pytest.mark.slow
class TestAnimeFaceUNetParity:
    def test_matches_torch_oracle(self):
        from apex_studio_tpu.preprocess.anime_seg import (
            AnimeFaceUNet, convert_anime_face_keys)

        torch.manual_seed(0)
        oracle = _TAnimeUNet().eval()
        with torch.no_grad():
            for m in oracle.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.3, 0.3)
                    m.running_var.uniform_(0.5, 1.5)
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        model, missing = _load(AnimeFaceUNet(rngs=nnx.Rngs(0)),
                               convert_anime_face_keys(sd))
        assert not missing, missing[:5]
        x = np.random.default_rng(0).uniform(
            0, 1, size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x)).numpy()
        out = np.asarray(model(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, atol=2e-4)


@pytest.mark.slow
class TestISNetParity:
    def test_d1_matches_reference(self):
        _stubs()
        from src.preprocess.anime_face_segment.isnet import ISNetDIS as RefISNet

        from apex_studio_tpu.preprocess.anime_seg import (
            ISNetDIS, _finalize_isnet_tree, convert_isnet_keys)

        torch.manual_seed(1)
        oracle = RefISNet().eval()
        with torch.no_grad():
            for m in oracle.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.3, 0.3)
                    m.running_var.uniform_(0.5, 1.5)
        sd = {f"net.{k}": v.numpy() for k, v in oracle.state_dict().items()}
        model = ISNetDIS(rngs=nnx.Rngs(0))
        tree = _finalize_isnet_tree(convert_isnet_keys(sd), model)
        model, missing = _load(model, tree)
        assert not missing, missing[:6]
        x = np.random.default_rng(1).uniform(
            0, 1, size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x))[0][0].numpy()
        out = np.asarray(model(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, atol=3e-3)


class TestPreprocessor:
    def test_palette_output(self):
        from apex_studio_tpu.preprocess.anime_seg import (
            PALETTE, AnimeFaceSegmentPreprocessor, AnimeFaceUNet)

        pre = AnimeFaceSegmentPreprocessor(
            model=AnimeFaceUNet(rngs=nnx.Rngs(0)))
        frame = np.full((48, 40, 3), 120, np.uint8)
        out = pre([frame], detect_resolution=64, remove_background=False)[0]
        assert out.shape == (48, 40, 3)
        flat = out.reshape(-1, 3)
        pal = {tuple(c) for c in PALETTE}
        assert all(tuple(px) in pal for px in flat[:64])
