"""U2Net numeric parity: the JAX U2NETP vs an inline torch implementation
of the official u2net architecture (the reference delegates rembg to the
onnx export of this exact net — src/preprocess/rembg/__init__.py:22), with
weights flowing through convert_u2net_keys."""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F


class TREBNCONV(nn.Module):
    def __init__(self, cin, cout, dirate=1):
        super().__init__()
        self.conv_s1 = nn.Conv2d(cin, cout, 3, padding=dirate, dilation=dirate)
        self.bn_s1 = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn_s1(self.conv_s1(x)))


def _up_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear")


class TRSU(nn.Module):
    """Generic RSU-L with official layer naming (rebnconvin, rebnconv1..L,
    bottom at dirate 2, rebnconv{L-1}d..1d)."""

    def __init__(self, depth, cin, mid, cout):
        super().__init__()
        self.depth = depth
        self.rebnconvin = TREBNCONV(cin, cout)
        setattr(self, "rebnconv1", TREBNCONV(cout, mid))
        for i in range(2, depth):
            setattr(self, f"rebnconv{i}", TREBNCONV(mid, mid))
        setattr(self, f"rebnconv{depth}", TREBNCONV(mid, mid, dirate=2))
        for i in range(depth - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", TREBNCONV(mid * 2, mid))
        self.rebnconv1d = TREBNCONV(mid * 2, cout)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        feats = [self.rebnconv1(hxin)]
        h = feats[0]
        for i in range(2, self.depth):
            h = getattr(self, f"rebnconv{i}")(self.pool(h))
            feats.append(h)
        hb = getattr(self, f"rebnconv{self.depth}")(h)
        h = hb
        for i in range(self.depth - 1, 0, -1):
            layer = getattr(self, f"rebnconv{i}d")
            h = layer(torch.cat((h, feats[i - 1]), 1))
            if i > 1:
                h = _up_like(h, feats[i - 2])
        return h + hxin


class TRSU4F(nn.Module):
    def __init__(self, cin, mid, cout):
        super().__init__()
        self.rebnconvin = TREBNCONV(cin, cout)
        self.rebnconv1 = TREBNCONV(cout, mid)
        self.rebnconv2 = TREBNCONV(mid, mid, dirate=2)
        self.rebnconv3 = TREBNCONV(mid, mid, dirate=4)
        self.rebnconv4 = TREBNCONV(mid, mid, dirate=8)
        self.rebnconv3d = TREBNCONV(mid * 2, mid, dirate=4)
        self.rebnconv2d = TREBNCONV(mid * 2, mid, dirate=2)
        self.rebnconv1d = TREBNCONV(mid * 2, cout)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        h1 = self.rebnconv1(hxin)
        h2 = self.rebnconv2(h1)
        h3 = self.rebnconv3(h2)
        h4 = self.rebnconv4(h3)
        d3 = self.rebnconv3d(torch.cat((h4, h3), 1))
        d2 = self.rebnconv2d(torch.cat((d3, h2), 1))
        d1 = self.rebnconv1d(torch.cat((d2, h1), 1))
        return d1 + hxin


class TU2NETP(nn.Module):
    def __init__(self):
        super().__init__()
        self.stage1 = TRSU(7, 3, 16, 64)
        self.stage2 = TRSU(6, 64, 16, 64)
        self.stage3 = TRSU(5, 64, 16, 64)
        self.stage4 = TRSU(4, 64, 16, 64)
        self.stage5 = TRSU4F(64, 16, 64)
        self.stage6 = TRSU4F(64, 16, 64)
        self.stage5d = TRSU4F(128, 16, 64)
        self.stage4d = TRSU(4, 128, 16, 64)
        self.stage3d = TRSU(5, 128, 16, 64)
        self.stage2d = TRSU(6, 128, 16, 64)
        self.stage1d = TRSU(7, 128, 16, 64)
        for i in range(1, 7):
            setattr(self, f"side{i}", nn.Conv2d(64, 1, 3, padding=1))
        self.outconv = nn.Conv2d(6, 1, 1)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        h1 = self.stage1(x)
        h2 = self.stage2(self.pool(h1))
        h3 = self.stage3(self.pool(h2))
        h4 = self.stage4(self.pool(h3))
        h5 = self.stage5(self.pool(h4))
        h6 = self.stage6(self.pool(h5))
        d5 = self.stage5d(torch.cat((_up_like(h6, h5), h5), 1))
        d4 = self.stage4d(torch.cat((_up_like(d5, h4), h4), 1))
        d3 = self.stage3d(torch.cat((_up_like(d4, h3), h3), 1))
        d2 = self.stage2d(torch.cat((_up_like(d3, h2), h2), 1))
        d1 = self.stage1d(torch.cat((_up_like(d2, h1), h1), 1))
        s1 = self.side1(d1)
        s2 = _up_like(self.side2(d2), d1)
        s3 = _up_like(self.side3(d3), d1)
        s4 = _up_like(self.side4(d4), d1)
        s5 = _up_like(self.side5(d5), d1)
        s6 = _up_like(self.side6(h6), d1)
        return torch.sigmoid(self.outconv(torch.cat((s1, s2, s3, s4, s5, s6), 1)))


@pytest.mark.slow
class TestU2NetParity:
    def test_u2netp_matches_torch(self):
        from apex_studio_tpu.preprocess.u2net import (
            U2Net, _finalize_u2net_tree, convert_u2net_keys)

        torch.manual_seed(0)
        oracle = TU2NETP().eval()
        # randomize BN running stats so eval-mode BN is actually exercised
        with torch.no_grad():
            for m in oracle.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 1.5)
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

        model = U2Net(light=True, rngs=nnx.Rngs(0))
        tree = _finalize_u2net_tree(convert_u2net_keys(sd), model)
        graphdef, state = nnx.split(model)
        missing = []
        for path, leaf in state.flat_state():
            nm = ".".join(str(p) for p in path)
            if nm in tree:
                leaf.value = jnp.asarray(tree[nm])
            else:
                missing.append(nm)
        assert not missing, missing[:6]
        model = nnx.merge(graphdef, state)

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x)).numpy()
        out = np.asarray(model(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, atol=2e-3)
