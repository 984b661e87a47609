"""NLF (Neural Localizer Fields) torch-oracle parity.

Runs the reference's vendored NLF modules
(/root/reference/apps/api/src/preprocess/dwpose_nlf/nlf) with random weights
as numeric oracles for apex_studio_tpu.preprocess.nlf:

- EfficientNetV2 backbone (vendored torchvision copy, backbones/efficientnet.py)
- GPS localizer field + LocalizerHead 2.5D decode (models/field.py,
  models/nlf_model.py)
- absolute reconstruction least-squares (ptu3d.py:9)
- homography crop warp (multiperson/warping.py:72)
- box -> camera rotation/scale (multiperson_model.py:889)
- plausibility filtering + pose NMS (multiperson/plausibility_check.py)

The vendored backbone imports torchvision/florch, which aren't in this image;
the fixture stubs exactly the pieces the eval path exercises (Conv2dNorm
Activation/SqueezeExcitation/StochasticDepth as faithful re-creations,
BatchRenorm2d == BatchNorm2d at eval time).
"""

from __future__ import annotations

import sys
import types
from functools import partial

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.preprocess import nlf as jnlf

NLF_DIR = "/root/reference/apps/api/src/preprocess/dwpose_nlf/nlf"


def _ensure_module(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        parent, _, child = name.rpartition(".")
        if parent:
            setattr(_ensure_module(parent), child, mod)
    return mod


class _Conv2dNormActivation(nn.Sequential):
    """torchvision.ops.misc.Conv2dNormActivation (eval-faithful)."""

    def __init__(self, in_ch, out_ch, kernel_size=3, stride=1, padding=None,
                 groups=1, norm_layer=nn.BatchNorm2d, activation_layer=nn.ReLU,
                 dilation=1, inplace=True, bias=None):
        if padding is None:
            padding = (kernel_size - 1) // 2 * dilation
        if bias is None:
            bias = norm_layer is None
        layers = [nn.Conv2d(in_ch, out_ch, kernel_size, stride, padding,
                            dilation=dilation, groups=groups, bias=bias)]
        if norm_layer is not None:
            layers.append(norm_layer(out_ch))
        if activation_layer is not None:
            layers.append(activation_layer())
        super().__init__(*layers)
        self.out_channels = out_ch


class _SqueezeExcitation(nn.Module):
    """torchvision.ops.misc.SqueezeExcitation."""

    def __init__(self, input_channels, squeeze_channels, activation=nn.ReLU,
                 scale_activation=nn.Sigmoid):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(input_channels, squeeze_channels, 1)
        self.fc2 = nn.Conv2d(squeeze_channels, input_channels, 1)
        self.activation = activation()
        self.scale_activation = scale_activation()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.activation(self.fc1(s))
        return x * self.scale_activation(self.fc2(s))


class _StochasticDepth(nn.Module):
    def __init__(self, p, mode):
        super().__init__()
        self.p, self.mode = p, mode

    def forward(self, x):  # eval: identity
        return x


@pytest.fixture(scope="module")
def nlf_oracle():
    """Install florch/torchvision stubs + the nlf dir on sys.path; yield the
    vendored modules."""
    saved = {}

    def _stub(name, **attrs):
        if name in sys.modules:
            saved[name] = sys.modules[name]
        mod = _ensure_module(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        return mod

    import enum

    class _Weights:
        def __init__(self, url=None, transforms=None, meta=None):
            self.url, self.transforms, self.meta = url, transforms, meta

        def __eq__(self, other):
            return self is other

        def __hash__(self):
            return id(self)

    class _WeightsEnum(enum.Enum):
        @classmethod
        def verify(cls, obj):
            return obj

        def __getattr__(self, name):
            if name.startswith("_"):
                raise AttributeError(name)
            return getattr(self.value, name)

    def _make_divisible(v, divisor, min_value=None):
        if min_value is None:
            min_value = divisor
        new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
        if new_v < 0.9 * v:
            new_v += divisor
        return new_v

    _stub("torchvision")
    _stub("torchvision.models")
    _stub("torchvision.models._api", Weights=_Weights, WeightsEnum=_WeightsEnum)
    _stub("torchvision.models._meta", _IMAGENET_CATEGORIES=[])
    _stub("torchvision.models._utils", _make_divisible=_make_divisible,
          _ovewrite_named_param=lambda kw, name, val: kw.__setitem__(name, val),
          handle_legacy_interface=lambda **kw: (lambda f: f),
          _ModelURLs=dict)
    _stub("torchvision.ops", StochasticDepth=_StochasticDepth)
    _stub("torchvision.ops.misc", Conv2dNormActivation=_Conv2dNormActivation,
          SqueezeExcitation=_SqueezeExcitation)
    _stub("torchvision.transforms")
    _stub("torchvision.transforms._presets",
          ImageClassification=type("ImageClassification", (), {}),
          InterpolationMode=types.SimpleNamespace(BILINEAR="bilinear",
                                                  BICUBIC="bicubic"))
    _stub("torchvision.utils", _log_api_usage_once=lambda obj: None)

    class _BatchRenorm2d(nn.BatchNorm2d):
        """Eval-time BatchRenorm == BatchNorm with running statistics."""

    florch_layers = _stub("florch.layers", BatchRenorm2d=_BatchRenorm2d,
                          TransitionBatchNorm2d=_BatchRenorm2d)
    _stub("florch", layers=florch_layers)
    _stub("florch.layers.lora", apply_lora=lambda *a, **k: None)

    if NLF_DIR not in sys.path:
        sys.path.insert(0, NLF_DIR)
    import importlib

    mods = types.SimpleNamespace(
        effnet=importlib.import_module("pt.backbones.efficientnet"),
        field=importlib.import_module("pt.models.field"),
        nlf_model=importlib.import_module("pt.models.nlf_model"),
        ptu=importlib.import_module("pt.ptu"),
        ptu3d=importlib.import_module("pt.ptu3d"),
        warping=importlib.import_module("pt.multiperson.warping"),
        plausib=importlib.import_module("pt.multiperson.plausibility_check"),
        BatchRenorm2d=_BatchRenorm2d,
    )
    yield mods
    for name, mod in saved.items():
        sys.modules[name] = mod


def _randomize(model: nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)
        for name, b in model.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)
            elif name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.05)


TINY = jnlf.NLFConfig.tiny()


def _ref_tiny_backbone(mods):
    e = mods.effnet
    cfgd = {"centered_stride": True}
    cnfs = []
    for fused, exp, k, s, out_ch, reps in TINY.stages:
        cls = e.FusedMBConvConfig if fused else e.MBConvConfig
        in_ch = TINY.stem_ch if not cnfs else cnfs[-1].out_channels
        kwargs = {}
        if s == 2 and TINY.stages.index((fused, exp, k, s, out_ch, reps)) == 5:
            kwargs["bottomright_stride"] = True
        cnfs.append(cls(exp, k, s, in_ch, out_ch, reps, **kwargs))
    norm = partial(mods.BatchRenorm2d, eps=1e-3)
    model = e.EfficientNet(cnfs, dropout=0.0, norm_layer=norm,
                           last_channel=TINY.backbone_channels, config=cfgd)
    return model.eval()


def test_effnetv2_backbone_parity(nlf_oracle):
    ref = _ref_tiny_backbone(nlf_oracle)
    _randomize(ref, 0)

    sd = {f"crop_model.backbone.1.{k}": v.numpy()
          for k, v in ref.features.state_dict().items()}
    # satisfy the non-backbone keys the converter reads
    mine = jnlf.NLFCropModel(TINY, nnx.Rngs(0))
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict

    flat = {k: v for k, v in jnlf.convert_nlf_checkpoint(
        _with_head_keys(sd, mine), TINY).items()}
    apply_state_dict(mine, flat, strict=False)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, TINY.proc_side, TINY.proc_side, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = ref.features(
            torch.from_numpy(x).permute(0, 3, 1, 2) * 2 - 1).numpy()
    got = np.asarray(mine.backbone(jnp.asarray(x)))
    got = np.transpose(got, (0, 3, 1, 2))
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _with_head_keys(sd, mine):
    """Pad a backbone-only reference state dict with this model's own head
    params so convert_nlf_checkpoint can run whole."""
    out = dict(sd)
    zero = {
        "heatmap_head.layer.0.weight": np.zeros(
            (mine.cfg.backbone_link_dim, mine.cfg.backbone_channels, 1, 1),
            np.float32),
        "heatmap_head.layer.1.weight": np.ones(
            (mine.cfg.backbone_link_dim,), np.float32),
        "heatmap_head.layer.1.bias": np.zeros(
            (mine.cfg.backbone_link_dim,), np.float32),
        "heatmap_head.layer.1.running_mean": np.zeros(
            (mine.cfg.backbone_link_dim,), np.float32),
        "heatmap_head.layer.1.running_var": np.ones(
            (mine.cfg.backbone_link_dim,), np.float32),
        "heatmap_head.weight_field.gps_net.learnable_fourier.linear.weight":
            np.zeros((mine.cfg.gps_pos_enc_dim // 2, 3), np.float32),
        "heatmap_head.weight_field.gps_net.mlp.0.weight": np.zeros(
            (mine.cfg.gps_hidden_dim, mine.cfg.gps_pos_enc_dim), np.float32),
        "heatmap_head.weight_field.gps_net.mlp.0.bias": np.zeros(
            (mine.cfg.gps_hidden_dim,), np.float32),
        "heatmap_head.weight_field.gps_net.mlp.2.weight": np.zeros(
            (mine.cfg.field_posenc_dim, mine.cfg.gps_hidden_dim), np.float32),
        "heatmap_head.weight_field.gps_net.mlp.2.bias": np.zeros(
            (mine.cfg.field_posenc_dim,), np.float32),
        "heatmap_head.weight_field.pred_mlp.0.weight": np.zeros(
            (mine.cfg.field_hidden_size, mine.cfg.field_posenc_dim),
            np.float32),
        "heatmap_head.weight_field.pred_mlp.0.bias": np.zeros(
            (mine.cfg.field_hidden_size,), np.float32),
        "heatmap_head.weight_field.pred_mlp.2.weight": np.zeros(
            ((mine.cfg.backbone_link_dim + 1) * (mine.cfg.depth + 2),
             mine.cfg.field_hidden_size), np.float32),
        "heatmap_head.weight_field.pred_mlp.2.bias": np.zeros(
            ((mine.cfg.backbone_link_dim + 1) * (mine.cfg.depth + 2),),
            np.float32),
        "heatmap_head.weight_field.r_sqrt_eigva": np.ones(
            (mine.cfg.field_posenc_dim,), np.float32),
        "cano_all_smpl": np.zeros((mine.cfg.n_points, 3), np.float32),
    }
    for k, v in zero.items():
        out.setdefault(k, v)
    return out


def _tiny_ref_head(mods):
    """Reference GPSField + LocalizerHead at the tiny config."""
    f = mods.field
    gps = f.GPSNet(pos_enc_dim=TINY.gps_pos_enc_dim,
                   hidden_dim=TINY.gps_hidden_dim,
                   output_dim=TINY.field_posenc_dim, norm_mode="dynamic",
                   eps=1e-6)
    out_dim = (TINY.backbone_link_dim + 1) * (TINY.depth + 2)
    field = f.GPSField(gps, layer_dims=[TINY.field_hidden_size, out_dim],
                       config={"field_posenc_dim": TINY.field_posenc_dim})
    cfgd = dict(uncert_bias=TINY.uncert_bias, uncert_bias2=TINY.uncert_bias2,
                depth=TINY.depth, stride_test=TINY.stride,
                centered_stride=TINY.centered_stride,
                box_size_m=TINY.box_size_m, proc_side=TINY.proc_side,
                backbone_link_dim=TINY.backbone_link_dim,
                fix_uncert_factor=False, mix_3d_inside_fov=0.5,
                weak_perspective=False)
    norm = partial(mods.BatchRenorm2d, eps=1e-3)
    head = mods.nlf_model.LocalizerHead(
        cfgd, field, norm, in_channels=TINY.backbone_channels)
    return head.eval()


def _copy_head_to_jax(head, mine: jnlf.NLFCropModel):
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict

    sd = {f"heatmap_head.{k}": v.numpy() for k, v in head.state_dict().items()}
    flat = jnlf.convert_nlf_checkpoint(_with_backbone_keys(sd, mine), TINY)
    apply_state_dict(mine, flat, strict=False)


def _with_backbone_keys(sd, mine):
    ref = _ref_like_backbone_zeros(mine)
    out = dict(ref)
    out.update(sd)
    out.setdefault("cano_all_smpl", np.zeros((mine.cfg.n_points, 3),
                                             np.float32))
    return out


def _ref_like_backbone_zeros(mine):
    """Minimal zero backbone keys in the reference layout (just enough for
    convert_nlf_checkpoint)."""
    cfg = mine.cfg
    out = {}

    def _bn(pfx, ch):
        out[f"{pfx}.weight"] = np.ones((ch,), np.float32)
        out[f"{pfx}.bias"] = np.zeros((ch,), np.float32)
        out[f"{pfx}.running_mean"] = np.zeros((ch,), np.float32)
        out[f"{pfx}.running_var"] = np.ones((ch,), np.float32)

    f = "crop_model.backbone.1"
    out[f"{f}.0.0.weight"] = np.zeros((cfg.stem_ch, 3, 3, 3), np.float32)
    _bn(f"{f}.0.1", cfg.stem_ch)
    in_ch = cfg.stem_ch
    for si, (fused, e, k, _s, out_ch, reps) in enumerate(cfg.stages):
        for bi in range(reps):
            src = f"{f}.{si + 1}.{bi}.block"
            mid = jnlf._make_divisible(in_ch * e, 8)
            if fused:
                if mid != in_ch:
                    out[f"{src}.0.0.weight"] = np.zeros((mid, in_ch, k, k),
                                                        np.float32)
                    _bn(f"{src}.0.1", mid)
                    out[f"{src}.1.0.weight"] = np.zeros((out_ch, mid, 1, 1),
                                                        np.float32)
                    _bn(f"{src}.1.1", out_ch)
                else:
                    out[f"{src}.0.0.weight"] = np.zeros((out_ch, in_ch, k, k),
                                                        np.float32)
                    _bn(f"{src}.0.1", out_ch)
            else:
                out[f"{src}.0.0.weight"] = np.zeros((mid, in_ch, 1, 1),
                                                    np.float32)
                _bn(f"{src}.0.1", mid)
                out[f"{src}.1.0.weight"] = np.zeros((mid, 1, k, k), np.float32)
                _bn(f"{src}.1.1", mid)
                sq = max(1, in_ch // 4)
                out[f"{src}.2.fc1.weight"] = np.zeros((sq, mid, 1, 1),
                                                      np.float32)
                out[f"{src}.2.fc1.bias"] = np.zeros((sq,), np.float32)
                out[f"{src}.2.fc2.weight"] = np.zeros((mid, sq, 1, 1),
                                                      np.float32)
                out[f"{src}.2.fc2.bias"] = np.zeros((mid,), np.float32)
                out[f"{src}.3.0.weight"] = np.zeros((out_ch, mid, 1, 1),
                                                    np.float32)
                _bn(f"{src}.3.1", out_ch)
            in_ch = out_ch
    ns = len(cfg.stages)
    out[f"{f}.{ns + 1}.0.weight"] = np.zeros(
        (cfg.backbone_channels, in_ch, 1, 1), np.float32)
    _bn(f"{f}.{ns + 1}.1", cfg.backbone_channels)
    return out


def test_field_and_decode_parity(nlf_oracle):
    head = _tiny_ref_head(nlf_oracle)
    _randomize(head, 1)
    with torch.no_grad():
        head.weight_field.r_sqrt_eigva.copy_(
            torch.rand(TINY.field_posenc_dim) + 0.5)

    mine = jnlf.NLFCropModel(TINY, nnx.Rngs(0))
    _copy_head_to_jax(head, mine)

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(TINY.n_points, 3)).astype(np.float32)
    feats = rng.normal(size=(2, TINY.backbone_channels, 12, 12)).astype(
        np.float32) * 0.5

    with torch.no_grad():
        c2d, c3d, unc = head.predict_same_canonicals(
            torch.from_numpy(feats), torch.from_numpy(pts))

    w, b = mine.field_weights(jnp.asarray(pts))
    link = jax.nn.silu(mine.link_bn(mine.link_conv(
        jnp.transpose(jnp.asarray(feats), (0, 2, 3, 1)))))
    g2d, g3d, gunc = mine.decode(link, w, b)

    np.testing.assert_allclose(np.asarray(g2d), c2d.numpy(), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(g3d), c3d.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gunc), unc.numpy(), rtol=1e-4,
                               atol=1e-5)

    # absolute reconstruction on the decoded outputs
    k = jnlf.intrinsics_from_fov(TINY.proc_side, TINY.proc_side)
    with torch.no_grad():
        want_abs, want_unc = head.reconstruct_absolute(
            c2d, c3d, unc, torch.from_numpy(k[None]).repeat(2, 1, 1))
    got_abs = jnlf.reconstruct_absolute(
        g2d, g3d, gunc, jnp.asarray(np.tile(k[None], (2, 1, 1))), TINY)
    np.testing.assert_allclose(np.asarray(got_abs), want_abs.numpy(),
                               rtol=1e-3, atol=0.5)  # mm scale
    np.testing.assert_allclose(np.asarray(gunc) * 3, want_unc.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_crop_transforms_parity(nlf_oracle):
    ptu3d = nlf_oracle.ptu3d
    rng = np.random.default_rng(2)
    h, w = 240, 320
    k = jnlf.intrinsics_from_fov(h, w)
    boxes = np.stack([
        np.array([40, 30, 100, 180, 0.9], np.float32),
        np.array([180, 60, 90, 150, 0.8], np.float32),
        np.array([5, 5, 60, 200, 0.7], np.float32),
    ])
    r, new_k, scales = jnlf.crop_transforms(boxes, k, 384)

    # reference math: lookat at box center, scale from reprojected midpoints
    x, y, bw, bh = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    pts = np.stack([
        np.stack([x + bw / 2, y + bh / 2], 1),
        np.stack([x + bw / 2, y], 1),
        np.stack([x + bw, y + bh / 2], 1),
        np.stack([x + bw / 2, y + bh], 1),
        np.stack([x, y + bh / 2], 1)], axis=1)
    homog = torch.from_numpy(
        np.concatenate([pts, np.ones_like(pts[..., :1])], -1).astype(
            np.float32))
    cam = torch.einsum("bpc,Cc->bpC", homog,
                       torch.from_numpy(np.linalg.inv(k).astype(np.float32)))
    up = torch.tensor([0.0, -1.0, 0.0]).expand(3, 3)
    want_r = ptu3d.lookat_matrix(forward_vector=cam[:, 0], up_vector=up)
    np.testing.assert_allclose(r, want_r.numpy(), rtol=1e-5, atol=1e-6)

    side = torch.einsum("bpc,bCc->bpC", cam[:, 1:5],
                        torch.from_numpy(k).float() @ want_r)
    side = ptu3d.project(side)
    vert = torch.linalg.norm(side[:, 0] - side[:, 2], dim=-1)
    horiz = torch.linalg.norm(side[:, 1] - side[:, 3], dim=-1)
    want_scale = 384 / torch.maximum(vert, horiz)
    np.testing.assert_allclose(scales, want_scale.numpy(), rtol=1e-5)
    np.testing.assert_allclose(new_k[:, 0, 0], k[0, 0] * scales, rtol=1e-6)
    assert np.all(new_k[:, :2, 2] == 192.0)


def test_warp_parity(nlf_oracle):
    warping = nlf_oracle.warping
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (120, 160, 3)).astype(np.float32)
    k = jnlf.intrinsics_from_fov(120, 160)
    boxes = np.array([[30, 20, 60, 90, 1.0]], np.float32)
    r, new_k, _ = jnlf.crop_transforms(boxes, k, 64)
    invproj = np.linalg.inv(new_k[0] @ r[0])

    got = np.asarray(jnlf.warp_crop(jnp.asarray(img), k, invproj, 64))
    with torch.no_grad():
        want = warping.warp_single_image(
            torch.from_numpy(img).permute(2, 0, 1),
            torch.from_numpy(k),
            torch.from_numpy(invproj.astype(np.float32)),
            torch.zeros(5), (64, 64)).permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_plausibility_parity(nlf_oracle):
    plausib = nlf_oracle.plausib
    rng = np.random.default_rng(4)
    n, p = 7, 40
    base = rng.normal(size=(1, p, 3)).astype(np.float32) * 400
    poses = base + rng.normal(size=(n, p, 3)).astype(np.float32) * np.array(
        [30, 30, 30, 500, 500, 500, 30][:n], np.float32)[:, None, None]
    scores = rng.uniform(0.2, 1.0, n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.3

    want = plausib.pose_non_max_suppression(
        torch.from_numpy(poses), torch.from_numpy(scores),
        torch.from_numpy(valid)).numpy()
    got = jnlf.pose_nms(poses, scores, valid)
    np.testing.assert_array_equal(np.sort(got), np.sort(want))

    unc = rng.uniform(0, 0.5, (n, p)).astype(np.float32)
    np.testing.assert_array_equal(
        jnlf.is_uncertainty_low(unc),
        plausib.is_uncertainty_low(torch.from_numpy(unc)).numpy())

    pose2d = rng.uniform(0, 200, (n, p, 2)).astype(np.float32)
    box = np.concatenate(
        [rng.uniform(0, 100, (n, 2)), rng.uniform(40, 150, (n, 2))],
        axis=1).astype(np.float32)
    np.testing.assert_array_equal(
        jnlf.is_pose_consistent_with_box(pose2d, box),
        plausib.is_pose_consistent_with_box(
            torch.from_numpy(pose2d), torch.from_numpy(box)).numpy())


def test_estimator_smoke():
    """Tiny random-weight estimator end-to-end: boxes -> per-person joints."""
    model = jnlf.NLFCropModel(TINY, nnx.Rngs(0))
    # plausible canonical cloud + mild field weights
    rng = np.random.default_rng(5)
    model.canonical.value = jnp.asarray(
        rng.normal(size=(TINY.n_points, 3)).astype(np.float32))
    est = jnlf.NLFEstimator(model)
    img = rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
    boxes = np.array([[60, 40, 120, 180, 0.9]], np.float32)
    out = est.estimate(img, boxes)
    assert isinstance(out, list)
    for j in out:
        assert j.shape == (TINY.n_joints, 3)
    assert est.estimate(img, np.zeros((0, 5), np.float32)) == []


# ------------------------------------------------------------------- renderer


@pytest.fixture(scope="module")
def ref_render():
    """Import the reference's render_helpers without executing the
    dwpose_nlf package __init__ (which pulls the whole DWPose/ONNX stack)."""
    import importlib

    ref_root = "/root/reference/apps/api"
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    for name, sub in (("src", "src"),
                      ("src.preprocess", "src/preprocess"),
                      ("src.preprocess.dwpose_nlf", "src/preprocess/dwpose_nlf")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [f"{ref_root}/{sub}"]
            sys.modules[name] = pkg
    return importlib.import_module("src.preprocess.dwpose_nlf.render_helpers")


def _random_people(rng, n_people):
    people = []
    for _ in range(n_people):
        j = rng.normal(size=(24, 3)).astype(np.float32) * 150
        j[:, 2] += rng.uniform(2500, 4000)
        # sprinkle missing joints (rendered limbs require both nonzero ends)
        j[rng.integers(0, 24, 3)] = 0
        people.append(j)
    return people


def test_renderer_parity(ref_render):
    from apex_studio_tpu.preprocess import nlf_render as rend

    rh = ref_render
    rng = np.random.default_rng(7)
    h, w = 96, 128
    k = jnlf.intrinsics_from_fov(h, w)
    frames_people = [_random_people(rng, 2), _random_people(rng, 1), []]

    # specs via the reference helper (torch tensors per person)
    ref_specs = [rh.get_single_pose_cylinder_specs(
        (i, [torch.from_numpy(p) for p in people], None, None, None, None,
         rend.COLORS, [list(l) for l in rend.LIMB_SEQ], rend.DRAW_SEQ))
        for i, people in enumerate(frames_people)]
    got_specs = [rend.pose_cylinder_specs(people) for people in frames_people]
    assert [len(s) for s in got_specs] == [len(s) for s in ref_specs]
    for fs_got, fs_ref in zip(got_specs, ref_specs):
        for (ga, gb, gc), (ra, rb, rc) in zip(fs_got, fs_ref):
            np.testing.assert_allclose(ga, ra)
            np.testing.assert_allclose(gb, rb)
            np.testing.assert_allclose(gc, rc)

    want = rh.render_whole(ref_specs, H=h, W=w, fx=k[0, 0], fy=k[1, 1],
                           cx=k[0, 2], cy=k[1, 2])
    got = rend.render_capsule_frames(got_specs, h, w, k[0, 0], k[1, 1],
                                     k[0, 2], k[1, 2])
    assert len(got) == len(want)
    for g, wnt in zip(got, want):
        assert g.shape == wnt.shape == (h, w, 4)
        # same math modulo float32 association order (x*rsqrt vs x/sqrt in
        # the ray setup): a handful of boundary pixels move by a few counts
        diff = np.abs(g.astype(np.int16) - wnt.astype(np.int16))
        assert diff.max() <= 5, f"max diff {diff.max()}"
        assert np.mean(diff > 0) < 0.02
