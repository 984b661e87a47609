"""EfficientNet-B5 feature backbone (inference) for the surface-normal
preprocessors.

The reference's normalbae and dsine both build their encoder with
``timm.create_model("tf_efficientnet_b5.ap_in1k")`` and trace the module list
to collect intermediate features (normalbae/nets/submodules/encoder.py:14,
dsine/models/submodules/standalone_encoder.py:27-42):

    features = [x, conv_stem, bn1, blocks0..blocks6, conv_head, bn2, ...]

so features[3..9] are the seven MBConv stage outputs and features[10] the
2048-channel conv_head output. This module reproduces that trace with an nnx
implementation:

- tf_ variants use TensorFlow "SAME" (asymmetric) padding — flax's
  ``padding="SAME"`` computes the identical pad split;
- BatchNorm runs in inference mode with the checkpoint's running statistics
  (tf_ default eps 1e-3);
- stage widths/depths follow the standard compound scaling (width 1.6,
  depth 2.2): channels [24, 40, 64, 128, 176, 304, 512], repeats
  [3, 5, 5, 7, 7, 9, 3], stem 48, head 2048;
- squeeze-excitation reduces to ``in_chs // 4`` of each block's *input*
  channels (timm's se_ratio=0.25 convention for efficientnet).

Weights convert from the timm state-dict layout via
``convert_timm_efficientnet``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

# (expand_ratio, kernel, stride, base_channels, base_repeats) — EfficientNet-B0
_B0_STAGES = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]


def _round_filters(ch: float, mult: float, divisor: int = 8) -> int:
    ch *= mult
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return int(new)


def _round_repeats(r: int, mult: float) -> int:
    return int(np.ceil(mult * r))


@dataclasses.dataclass(frozen=True)
class EffNetConfig:
    width_mult: float = 1.6   # B5
    depth_mult: float = 2.2   # B5
    stem_ch: int = 48
    head_ch: int = 2048
    bn_eps: float = 1e-3
    se_ratio: float = 0.25

    @property
    def stages(self) -> List[Tuple[int, int, int, int, int]]:
        """(expand, kernel, stride, out_ch, repeats) per stage after scaling."""
        out = []
        for exp, k, s, c, r in _B0_STAGES:
            out.append((exp, k, s, _round_filters(c, self.width_mult),
                        _round_repeats(r, self.depth_mult)))
        return out

    @classmethod
    def b5(cls) -> "EffNetConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "EffNetConfig":
        """Small config for tests (same topology, 7 stages x 1 block)."""
        return cls(width_mult=0.125, depth_mult=0.05, stem_ch=8, head_ch=32)


class BNInf(nnx.Module):
    """Inference-mode BatchNorm: fixed running statistics from the checkpoint."""

    def __init__(self, ch: int, eps: float, rngs: nnx.Rngs):
        del rngs
        self.scale = nnx.Param(jnp.ones((ch,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((ch,), jnp.float32))
        self.mean = nnx.Param(jnp.zeros((ch,), jnp.float32))
        self.var = nnx.Param(jnp.ones((ch,), jnp.float32))
        self.eps = eps

    def __call__(self, x: jax.Array) -> jax.Array:
        inv = jax.lax.rsqrt(self.var.value + self.eps) * self.scale.value
        return x * inv + (self.bias.value - self.mean.value * inv)


def _conv(in_ch, out_ch, k, stride, rngs, groups=1, bias=False):
    return nnx.Conv(in_ch, out_ch, kernel_size=(k, k), strides=(stride, stride),
                    padding="SAME", feature_group_count=groups, use_bias=bias,
                    rngs=rngs)


class SqueezeExcite(nnx.Module):
    def __init__(self, ch: int, rd_ch: int, rngs: nnx.Rngs):
        self.conv_reduce = nnx.Conv(ch, rd_ch, (1, 1), use_bias=True, rngs=rngs)
        self.conv_expand = nnx.Conv(rd_ch, ch, (1, 1), use_bias=True, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = jax.nn.silu(self.conv_reduce(s))
        return x * jax.nn.sigmoid(self.conv_expand(s))


class DSConvBlock(nnx.Module):
    """Stage-0 depthwise-separable block (timm DepthwiseSeparableConv):
    conv_dw → bn1 → silu → SE → conv_pw → bn2 (+residual)."""

    def __init__(self, in_ch, out_ch, k, stride, cfg: EffNetConfig, rngs):
        self.conv_dw = _conv(in_ch, in_ch, k, stride, rngs, groups=in_ch)
        self.bn1 = BNInf(in_ch, cfg.bn_eps, rngs)
        self.se = SqueezeExcite(in_ch, max(1, int(in_ch * cfg.se_ratio)), rngs)
        self.conv_pw = _conv(in_ch, out_ch, 1, 1, rngs)
        self.bn2 = BNInf(out_ch, cfg.bn_eps, rngs)
        self.has_skip = stride == 1 and in_ch == out_ch

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.silu(self.bn1(self.conv_dw(x)))
        y = self.se(y)
        y = self.bn2(self.conv_pw(y))
        return x + y if self.has_skip else y


class MBConvBlock(nnx.Module):
    """InvertedResidual: conv_pw (expand) → bn1 → silu → conv_dw → bn2 → silu
    → SE → conv_pwl (project) → bn3 (+residual)."""

    def __init__(self, in_ch, out_ch, exp, k, stride, cfg: EffNetConfig, rngs):
        mid = in_ch * exp
        self.conv_pw = _conv(in_ch, mid, 1, 1, rngs)
        self.bn1 = BNInf(mid, cfg.bn_eps, rngs)
        self.conv_dw = _conv(mid, mid, k, stride, rngs, groups=mid)
        self.bn2 = BNInf(mid, cfg.bn_eps, rngs)
        self.se = SqueezeExcite(mid, max(1, int(in_ch * cfg.se_ratio)), rngs)
        self.conv_pwl = _conv(mid, out_ch, 1, 1, rngs)
        self.bn3 = BNInf(out_ch, cfg.bn_eps, rngs)
        self.has_skip = stride == 1 and in_ch == out_ch

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.silu(self.bn1(self.conv_pw(x)))
        y = jax.nn.silu(self.bn2(self.conv_dw(y)))
        y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return x + y if self.has_skip else y


class EfficientNetFeatures(nnx.Module):
    """Backbone producing the timm module-trace feature list.

    Returned list (NHWC): index 0 = input, 1 = conv_stem, 2 = bn1(+act),
    3..9 = stage outputs, 10 = conv_head, 11 = bn2(+act) — the indices the
    normalbae (3,4,5,7,10) and dsine (5,7,10) decoders tap.
    """

    def __init__(self, cfg: EffNetConfig = None, rngs: nnx.Rngs = None):
        cfg = cfg or EffNetConfig.b5()
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.conv_stem = _conv(3, cfg.stem_ch, 3, 2, rngs)
        self.bn1 = BNInf(cfg.stem_ch, cfg.bn_eps, rngs)
        stages = []
        in_ch = cfg.stem_ch
        for exp, k, s, out_ch, reps in cfg.stages:
            blocks = []
            for bi in range(reps):
                stride = s if bi == 0 else 1
                if exp == 1:
                    blocks.append(DSConvBlock(in_ch, out_ch, k, stride, cfg, rngs))
                else:
                    blocks.append(MBConvBlock(in_ch, out_ch, exp, k, stride,
                                              cfg, rngs))
                in_ch = out_ch
            stages.append(nnx.List(blocks))
        self.blocks = nnx.List(stages)
        self.conv_head = _conv(in_ch, cfg.head_ch, 1, 1, rngs)
        self.bn2 = BNInf(cfg.head_ch, cfg.bn_eps, rngs)

    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = [x]
        x = self.conv_stem(x)
        feats.append(x)
        x = jax.nn.silu(self.bn1(x))
        feats.append(x)
        for stage in self.blocks:
            for block in stage:
                x = block(x)
            feats.append(x)
        x = self.conv_head(x)
        feats.append(x)
        x = jax.nn.silu(self.bn2(x))
        feats.append(x)
        return feats

    def feature_channels(self) -> Dict[int, int]:
        chs = {0: 3, 1: self.cfg.stem_ch, 2: self.cfg.stem_ch}
        for i, (_, _, _, c, _) in enumerate(self.cfg.stages):
            chs[3 + i] = c
        chs[10] = self.cfg.head_ch
        chs[11] = self.cfg.head_ch
        return chs


def _cw(v: np.ndarray) -> np.ndarray:
    """Identity: converters emit torch conv layout [out,in,kh,kw]; the
    loader's ``_infer_transform`` transposes ``.kernel`` paths to flax HWIO
    (state_mapping.py:53) — this also covers depthwise [ch,1,kh,kw]."""
    return v


_dw = _cw


def _bn(out: Dict[str, np.ndarray], dst: str, sd: Dict[str, np.ndarray],
        src: str) -> None:
    out[f"{dst}.scale"] = sd[f"{src}.weight"]
    out[f"{dst}.bias"] = sd[f"{src}.bias"]
    out[f"{dst}.mean"] = sd[f"{src}.running_mean"]
    out[f"{dst}.var"] = sd[f"{src}.running_var"]


def convert_timm_efficientnet(sd: Dict[str, np.ndarray],
                              prefix: str = "") -> Dict[str, np.ndarray]:
    """timm tf_efficientnet state dict (optionally under ``prefix``) → flat
    {path: array} for :class:`EfficientNetFeatures`."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    out: Dict[str, np.ndarray] = {}
    out["conv_stem.kernel"] = _cw(sd["conv_stem.weight"])
    _bn(out, "bn1", sd, "bn1")
    si = 0
    while f"blocks.{si}.0.bn1.weight" in sd:
        bi = 0
        while f"blocks.{si}.{bi}.bn1.weight" in sd:
            src = f"blocks.{si}.{bi}"
            dst = f"blocks.{si}.{bi}"
            if f"{src}.conv_pwl.weight" in sd:  # MBConv
                out[f"{dst}.conv_pw.kernel"] = _cw(sd[f"{src}.conv_pw.weight"])
                _bn(out, f"{dst}.bn1", sd, f"{src}.bn1")
                out[f"{dst}.conv_dw.kernel"] = _dw(sd[f"{src}.conv_dw.weight"])
                _bn(out, f"{dst}.bn2", sd, f"{src}.bn2")
                out[f"{dst}.conv_pwl.kernel"] = _cw(sd[f"{src}.conv_pwl.weight"])
                _bn(out, f"{dst}.bn3", sd, f"{src}.bn3")
            else:  # depthwise-separable (stage 0)
                out[f"{dst}.conv_dw.kernel"] = _dw(sd[f"{src}.conv_dw.weight"])
                _bn(out, f"{dst}.bn1", sd, f"{src}.bn1")
                out[f"{dst}.conv_pw.kernel"] = _cw(sd[f"{src}.conv_pw.weight"])
                _bn(out, f"{dst}.bn2", sd, f"{src}.bn2")
            out[f"{dst}.se.conv_reduce.kernel"] = _cw(
                sd[f"{src}.se.conv_reduce.weight"])
            out[f"{dst}.se.conv_reduce.bias"] = sd[f"{src}.se.conv_reduce.bias"]
            out[f"{dst}.se.conv_expand.kernel"] = _cw(
                sd[f"{src}.se.conv_expand.weight"])
            out[f"{dst}.se.conv_expand.bias"] = sd[f"{src}.se.conv_expand.bias"]
            bi += 1
        si += 1
    out["conv_head.kernel"] = _cw(sd["conv_head.weight"])
    _bn(out, "bn2", sd, "bn2")
    return out
