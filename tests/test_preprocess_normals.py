"""NormalBAE (NNET) + DSINE surface normals vs the REFERENCE torch models
run as oracles.

The reference architectures hardcode EfficientNet-B5 channel widths
(normalbae/nets/submodules/decoder.py:16-27 — 2048/176/64/40/24; dsine
INPUT_CHANNELS_DICT[5]), so the oracle runs at REAL widths with depth 1 per
stage: timm is stubbed with a torch encoder that reproduces the timm module
trace and state-dict layout (tf-SAME padding, inference BN), the reference
decoders run on top unchanged, and the same random state dict flows through
the repo's real converters into the JAX twins. Any transpose / padding /
norm-semantics divergence fails the tolerance.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.preprocess.efficientnet import EffNetConfig

REF = "/root/reference/apps/api"

# B5 widths, one block per stage — matches the reference decoders' hardcoded
# channel taps while keeping the oracle small.
CFG = EffNetConfig(width_mult=1.6, depth_mult=0.05)


class Conv2dSame(nn.Conv2d):
    """TF 'SAME' padding (timm Conv2dSame) — pads more on bottom/right."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        ph = max((-(-ih // sh) - 1) * sh + kh - ih, 0)
        pw = max((-(-iw // sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class _SE(nn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(ch, rd, 1)
        self.conv_expand = nn.Conv2d(rd, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.conv_expand(F.silu(self.conv_reduce(s))))


class _DSBlock(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride, se_in):
        super().__init__()
        self.conv_dw = Conv2dSame(in_ch, in_ch, k, stride, groups=in_ch,
                                  bias=False)
        self.bn1 = nn.BatchNorm2d(in_ch, eps=1e-3)
        self.se = _SE(in_ch, max(1, int(se_in * 0.25)))
        self.conv_pw = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_dw(x)))
        y = self.bn2(self.conv_pw(self.se(y)))
        return x + y if self.skip else y


class _MBBlock(nn.Module):
    def __init__(self, in_ch, out_ch, exp, k, stride):
        super().__init__()
        mid = in_ch * exp
        self.conv_pw = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = Conv2dSame(mid, mid, k, stride, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
        self.se = _SE(mid, max(1, int(in_ch * 0.25)))
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_pw(x)))
        y = F.silu(self.bn2(self.conv_dw(y)))
        y = self.bn3(self.conv_pwl(self.se(y)))
        return x + y if self.skip else y


class TimmStyleEffNet(nn.Module):
    """timm module trace + state-dict layout for tf_efficientnet."""

    def __init__(self, cfg: EffNetConfig):
        super().__init__()
        self.conv_stem = Conv2dSame(3, cfg.stem_ch, 3, 2, bias=False)
        self.bn1 = nn.BatchNorm2d(cfg.stem_ch, eps=1e-3)
        stages = []
        in_ch = cfg.stem_ch
        for exp, k, s, out_ch, reps in cfg.stages:
            blocks = []
            for bi in range(reps):
                stride = s if bi == 0 else 1
                if exp == 1:
                    blocks.append(_DSBlock(in_ch, out_ch, k, stride, in_ch))
                else:
                    blocks.append(_MBBlock(in_ch, out_ch, exp, k, stride))
                in_ch = out_ch
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)
        self.conv_head = nn.Conv2d(in_ch, cfg.head_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cfg.head_ch, eps=1e-3)
        self.global_pool = nn.Identity()
        self.classifier = nn.Identity()

    def forward(self, x):  # pragma: no cover - traced via _modules by the ref
        raise NotImplementedError


@pytest.fixture(scope="module", autouse=True)
def _stub_timm():
    # ref_oracle.install_ref_parents() may have installed a minimal timm stub
    # (magi only needs to_2tuple) earlier in the session — patch create_model
    # onto whatever module exists rather than assuming we create it.
    created = "timm" not in sys.modules
    if created:
        sys.modules["timm"] = types.ModuleType("timm")
    timm = sys.modules["timm"]
    prev_create = getattr(timm, "create_model", None)
    timm.create_model = lambda name, pretrained=False, num_classes=0: (
        TimmStyleEffNet(CFG))
    if "torchvision" not in sys.modules:
        # the reference packages' __init__ imports torchvision for the wrapper
        # classes; only the inner nets are under test
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.Normalize = lambda mean, std: (lambda x: x)
        tr.Compose = lambda fns: (lambda x: x)
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, _):
                return lambda *a, **k: None

        lg.logger = _L()
        sys.modules["loguru"] = lg
    if REF not in sys.path:
        sys.path.insert(0, REF)
    yield
    if created:
        del sys.modules["timm"]
    elif prev_create is None:
        del timm.create_model
    else:
        timm.create_model = prev_create


def _randomize(model: nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) * 0.5 + 0.5
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    model.load_state_dict(sd)


def _apply(jax_model, flat):
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict

    apply_state_dict(jax_model, flat, strict=False)


def test_encoder_parity():
    from src.preprocess.normalbae.nets.submodules.encoder import Encoder

    enc = Encoder().eval()
    _randomize(enc, 0)

    from apex_studio_tpu.preprocess.efficientnet import (
        EfficientNetFeatures,
        convert_timm_efficientnet,
    )

    ours = EfficientNetFeatures(CFG, nnx.Rngs(0))
    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    flat = convert_timm_efficientnet(sd, prefix="original_model.")
    _apply(ours, flat)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_feats = enc(torch.from_numpy(x))
    got = ours(jnp.asarray(x.transpose(0, 2, 3, 1)))
    # trace indices used by the decoders
    for idx in (3, 4, 5, 7, 10):
        r = ref_feats[idx].numpy().transpose(0, 2, 3, 1)
        g = np.asarray(got[idx])
        assert r.shape == g.shape, (idx, r.shape, g.shape)
        np.testing.assert_allclose(g, r, atol=2e-4, err_msg=f"feature {idx}")


def test_nnet_parity():
    from src.preprocess.normalbae.nets.NNET import NNET as RefNNET

    args = types.SimpleNamespace(architecture="BN", sampling_ratio=0.4,
                                 importance_ratio=0.7)
    ref = RefNNET(args).eval()
    _randomize(ref, 1)

    from apex_studio_tpu.preprocess.normalbae import NNET, convert_nnet_keys

    ours = NNET(CFG, nnx.Rngs(0))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    _apply(ours, convert_nnet_keys(sd))

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs, _, _ = ref.decoder(
            ref.encoder(torch.from_numpy(x)), mode="test")
    r = outs[-1].numpy().transpose(0, 2, 3, 1)
    g = np.asarray(ours(jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert r.shape == g.shape
    np.testing.assert_allclose(g[..., :3], r[..., :3], atol=2e-3)


def test_dsine_parity():
    from src.preprocess.dsine.models.dsine_arch import DSINE as RefDSINE

    ref = RefDSINE().eval()
    ref.num_iter = 2
    _randomize(ref, 2)

    from apex_studio_tpu.preprocess.dsine import (
        DSINE,
        convert_dsine_keys,
        get_intrins_from_fov,
    )

    ours = DSINE(CFG, nnx.Rngs(0), num_iter=2)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    _apply(ours, convert_dsine_keys(sd))

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    intr = get_intrins_from_fov(60.0, 64, 64)
    intr_t = torch.from_numpy(intr.copy()).unsqueeze(0)
    with torch.no_grad():
        preds = ref(torch.from_numpy(x), intr_t)  # mutates intrins in-place
    r = preds[-1].numpy().transpose(0, 2, 3, 1)

    intr_j = intr.copy()
    intr_j[0, 2] += 0.5
    intr_j[1, 2] += 0.5
    g = np.asarray(ours(jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(intr_j)[None]))
    assert r.shape == g.shape
    np.testing.assert_allclose(g, r, atol=1e-3)


def test_preprocessors_end_to_end():
    """Tiny-config models through the full process_frame path."""
    from apex_studio_tpu.preprocess.dsine import DSINE, DsinePreprocessor
    from apex_studio_tpu.preprocess.normalbae import NNET, NormalBaePreprocessor

    tiny = EffNetConfig.tiny()
    p = NormalBaePreprocessor(model=NNET(tiny, nnx.Rngs(0)))
    frame = np.random.default_rng(0).integers(0, 255, (70, 90, 3)).astype(np.uint8)
    out = p.process_frame(frame, detect_resolution=64)
    assert out.shape == (70, 90, 3) and out.dtype == np.uint8

    d = DsinePreprocessor(model=DSINE(tiny, nnx.Rngs(0), num_iter=1))
    out = d.process_frame(frame, detect_resolution=64, iterations=1)
    assert out.shape == (70, 90, 3) and out.dtype == np.uint8


def test_registry():
    from apex_studio_tpu.preprocess import preprocessor_registry

    for name in ("normalbae", "dsine"):
        assert name in preprocessor_registry
