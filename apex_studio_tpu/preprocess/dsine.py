"""DSINE surface-normal estimation — first-party JAX implementation.

Counterpart of the reference's ``src/preprocess/dsine/``
(models/dsine_arch.py:72 ``DSINE``): EfficientNet-B5 encoder, ray-conditioned
decoder, and the iterative neighborhood rotation refinement (NRN) with a
ConvGRU hidden state. Checkpoint ``dsine.pt``.

Ported semantics (file:line refer to the reference):
- decoder (dsine_arch.py:20-70): conv2 1x1 on cat(features[10], uv_32);
  UpSampleGN (weight-standardized conv + GroupNorm(8), submodules/__init__.py
  :93-160, align_corners=False) against cat(features[7], uv_16) and
  cat(features[5], uv_8); normal/feature/hidden prediction heads;
- RayReLU (submodules:41): clamps the view-direction component of the normal;
- convex upsampling (submodules:188 convex_upsampling): 3x3 neighborhood,
  softmax mask, replicate pad — upsamples the 1/8-res normal by 8;
- refine (dsine_arch.py:148-264): per-pixel ps*ps neighborhood rotation —
  an axis/angle head defines a rotation taking each neighbor normal into the
  center pixel's tangent frame (axis built from the camera ray geometry),
  probabilities gate the rotated normals, ray-ReLU re-projects, then convex
  upsample; repeated num_iter times with a ConvGRU state update;
- wrapper (__init__.py:85-147): pad-to-64 constant, imagenet norm, fov-based
  intrinsics (utils/utils.py:71 get_intrins_from_fov, cx/cy shifted +0.5 in
  forward), output = ((n+1)/2)*255 of the final iteration.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.base import BasePreprocessor, preprocessor_registry
from apex_studio_tpu.preprocess.efficientnet import (
    EffNetConfig,
    EfficientNetFeatures,
    _cw,
    convert_timm_efficientnet,
)
from apex_studio_tpu.preprocess.normalbae import IMAGENET_MEAN, IMAGENET_STD, _pad64


def _resize_half_pixel(x: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear, torch align_corners=False semantics (half-pixel centers)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "linear")


def _normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize: x / max(||x||, eps)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """axis*angle (..., 3) → rotation matrices (..., 3, 3) via quaternions
    (utils/rotation.py, the PyTorch3D formulation incl. the small-angle
    series)."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over = jnp.where(
        small, 0.5 - (angles * angles) / 48,
        jnp.sin(half) / jnp.where(small, 1.0, angles))
    quat = jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over], axis=-1)
    r, i, j, k = jnp.moveaxis(quat, -1, 0)
    two_s = 2.0 / jnp.sum(quat * quat, axis=-1)
    o = jnp.stack([
        1 - two_s * (j * j + k * k), two_s * (i * j - k * r), two_s * (i * k + j * r),
        two_s * (i * j + k * r), 1 - two_s * (i * i + k * k), two_s * (j * k - i * r),
        two_s * (i * k - j * r), two_s * (j * k + i * r), 1 - two_s * (i * i + j * j),
    ], axis=-1)
    return o.reshape(axis_angle.shape[:-1] + (3, 3))


def get_unfold(x: jax.Array, ps: int, pad: int) -> jax.Array:
    """NHWC → (B, H, W, ps*ps, C) neighborhoods with replicate pad
    (submodules get_unfold)."""
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    h, w = x.shape[1], x.shape[2]
    patches = [xp[:, dy:dy + h, dx:dx + w, :]
               for dy in range(ps) for dx in range(ps)]
    return jnp.stack(patches, axis=3)


def convex_upsample(out: jax.Array, up_mask: jax.Array, k: int) -> jax.Array:
    """(B,H,W,C) low-res + (B,H,W,9*k*k) mask → (B,kH,kW,C)
    (submodules convex_upsampling: replicate pad, 3x3 unfold, softmax over
    the 9 neighbors)."""
    b, h, w, c = out.shape
    mask = up_mask.reshape(b, h, w, 9, k, k)
    mask = jax.nn.softmax(mask, axis=3)
    nb = get_unfold(out, ps=3, pad=1)  # (B, H, W, 9, C)
    up = jnp.einsum("bhwnkl,bhwnc->bhwklc", mask, nb)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (B, H, k, W, l, C)
    return up.reshape(b, h * k, w * k, c)


class ConvGRU(nnx.Module):
    def __init__(self, hidden: int, inp: int, ks: int, rngs: nnx.Rngs):
        mk = lambda: nnx.Conv(hidden + inp, hidden, (ks, ks), padding="SAME",
                              use_bias=True, rngs=rngs)
        self.convz, self.convr, self.convq = mk(), mk(), mk()

    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(self.convz(hx))
        r = jax.nn.sigmoid(self.convr(hx))
        q = jnp.tanh(self.convq(jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


def ray_relu(pred_norm: jax.Array, ray: jax.Array, eps: float = 1e-2) -> jax.Array:
    """Clamp the along-ray component to >= eps (submodules RayReLU)."""
    cos = jnp.sum(_normalize(pred_norm) * _normalize(ray), axis=-1,
                  keepdims=True)
    diff = ray * (jax.nn.relu(cos - eps) + eps) - ray * cos
    return _normalize(pred_norm + diff)


class ConvWS(nnx.Module):
    """Weight-standardized conv (submodules Conv2d_WS): per-filter mean
    subtraction and std division (torch .std = Bessel-corrected)."""

    def __init__(self, in_ch: int, out: int, rngs: nnx.Rngs):
        self.conv = nnx.Conv(in_ch, out, (3, 3), padding="SAME",
                             use_bias=True, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.conv.kernel.value  # HWIO
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        wc = w - mean
        n = w.shape[0] * w.shape[1] * w.shape[2]
        std = jnp.sqrt(jnp.sum(wc * wc, axis=(0, 1, 2), keepdims=True)
                       / max(n - 1, 1)) + 1e-5
        wn = wc / std
        y = jax.lax.conv_general_dilated(
            x, wn, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.conv.bias.value


class GroupNorm8(nnx.Module):
    def __init__(self, ch: int, rngs: nnx.Rngs):
        del rngs
        self.scale = nnx.Param(jnp.ones((ch,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((ch,), jnp.float32))
        self.groups = min(8, ch)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        g = self.groups
        xg = x.reshape(b, h, w, g, c // g)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
        return xg.reshape(b, h, w, c) * self.scale.value + self.bias.value


class UpSampleGN(nnx.Module):
    """ConvWS→GN→LeakyReLU twice after half-pixel bilinear upsample + concat
    (align_corners=False per the dsine decoder)."""

    def __init__(self, skip_input: int, out: int, rngs: nnx.Rngs):
        self.conv_a = ConvWS(skip_input, out, rngs)
        self.gn_a = GroupNorm8(out, rngs)
        self.conv_b = ConvWS(out, out, rngs)
        self.gn_b = GroupNorm8(out, rngs)

    def __call__(self, x: jax.Array, skip: jax.Array) -> jax.Array:
        x = _resize_half_pixel(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([x, skip], axis=-1)
        x = jax.nn.leaky_relu(self.gn_a(self.conv_a(x)), 0.01)
        return jax.nn.leaky_relu(self.gn_b(self.conv_b(x)), 0.01)


class PredHead(nnx.Module):
    """conv3x3 → ReLU → conv1x1 → ReLU → conv1x1 (get_prediction_head)."""

    def __init__(self, in_ch: int, hidden: int, out: int, rngs: nnx.Rngs):
        self.c0 = nnx.Conv(in_ch, hidden, (3, 3), padding="SAME",
                           use_bias=True, rngs=rngs)
        self.c1 = nnx.Conv(hidden, hidden, (1, 1), use_bias=True, rngs=rngs)
        self.c2 = nnx.Conv(hidden, out, (1, 1), use_bias=True, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.c2(jax.nn.relu(self.c1(jax.nn.relu(self.c0(x)))))


class DSINE(nnx.Module):
    PS = 5
    DOWN = 8

    def __init__(self, cfg: Optional[EffNetConfig] = None,
                 rngs: Optional[nnx.Rngs] = None, num_iter: int = 5):
        cfg = cfg or EffNetConfig.b5()
        rngs = rngs or nnx.Rngs(0)
        self.num_iter = num_iter
        self.encoder = EfficientNetFeatures(cfg, rngs)
        ch = self.encoder.feature_channels()
        nf = cfg.head_ch
        fdim, hdim = 64, 64
        self.conv2 = nnx.Conv(nf + 2, nf, (1, 1), use_bias=True, rngs=rngs)
        self.up1 = UpSampleGN(nf + ch[7] + 2, nf // 2, rngs)
        self.up2 = UpSampleGN(nf // 2 + ch[5] + 2, nf // 4, rngs)
        i_dim = nf // 4
        self.normal_head = PredHead(i_dim + 2, 128, 3, rngs)
        self.feature_head = PredHead(i_dim + 2, 128, fdim, rngs)
        self.hidden_head = PredHead(i_dim + 2, 128, hdim, rngs)
        self.gru = ConvGRU(hdim, fdim + 2, self.PS, rngs)
        ps2 = self.PS * self.PS
        self.prob_head = PredHead(hdim + 2, 64, ps2, rngs)
        self.xy_head = PredHead(hdim + 2, 64, ps2 * 2, rngs)
        self.angle_head = PredHead(hdim + 2, 64, ps2, rngs)
        self.up_prob_head = PredHead(hdim + 2, 64, 9 * self.DOWN * self.DOWN,
                                     rngs)

    # -- camera geometry ---------------------------------------------------

    @staticmethod
    def _pixel_coords(h: int, w: int) -> jax.Array:
        """(H, W, 2) pixel centers (x+0.5, y+0.5)."""
        xs = jnp.arange(w, dtype=jnp.float32) + 0.5
        ys = jnp.arange(h, dtype=jnp.float32) + 0.5
        gx, gy = jnp.meshgrid(xs, ys)
        return jnp.stack([gx, gy], axis=-1)

    @staticmethod
    def _scaled_intrins(intrins, H, W, orig_H, orig_W):
        fu = intrins[:, 0, 0] * (W / orig_W)
        cu = intrins[:, 0, 2] * (W / orig_W)
        fv = intrins[:, 1, 1] * (H / orig_H)
        cv = intrins[:, 1, 2] * (H / orig_H)
        return fu, cu, fv, cv

    def get_uv(self, intrins, H, W, orig_H, orig_W) -> jax.Array:
        fu, cu, fv, cv = self._scaled_intrins(intrins, H, W, orig_H, orig_W)
        pc = self._pixel_coords(H, W)[None]
        u = (pc[..., 0] - cu[:, None, None]) / fu[:, None, None]
        v = (pc[..., 1] - cv[:, None, None]) / fv[:, None, None]
        return jnp.stack([u, v], axis=-1)  # (B, H, W, 2)

    def get_ray(self, intrins, H, W, orig_H, orig_W) -> jax.Array:
        uv = self.get_uv(intrins, H, W, orig_H, orig_W)
        ones = jnp.ones_like(uv[..., :1])
        return _normalize(jnp.concatenate([uv, ones], axis=-1))

    # -- refinement --------------------------------------------------------

    def refine(self, h, feat_map, pred_norm, intrins, orig_H, orig_W,
               uv_8, ray_8):
        ps, ps2 = self.PS, self.PS * self.PS
        pad = (ps - 1) // 2
        B, H, W, _ = pred_norm.shape
        fu, cu, fv, cv = self._scaled_intrins(intrins, H, W, orig_H, orig_W)
        fu = fu[:, None, None, None]
        cu = cu[:, None, None, None]
        fv = fv[:, None, None, None]
        cv = cv[:, None, None, None]

        h_new = self.gru(h, feat_map)
        hx = jnp.concatenate([h_new, uv_8], axis=-1)

        nghbr_prob = jax.nn.sigmoid(self.prob_head(hx))          # (B,H,W,ps2)
        nghbr_normals = get_unfold(pred_norm, ps, pad)           # (B,H,W,ps2,3)

        xys = self.xy_head(hx)                                   # (B,H,W,2*ps2)
        xy = jnp.stack([xys[..., :ps2], xys[..., ps2:]], axis=-1)  # (B,H,W,ps2,2)
        xy = _normalize(xy)
        angle = jax.nn.sigmoid(self.angle_head(hx))[..., None] * jnp.pi

        pix = get_unfold(
            jnp.concatenate(
                [self._pixel_coords(H, W)[None],
                 jnp.ones((1, H, W, 1), jnp.float32)], axis=-1),
            ps, pad)                                             # (1,H,W,ps2,3)

        du_over_fu = xy[..., 0] / fu
        dv_over_fv = xy[..., 1] / fv
        term_u = (pix[..., 0] + xy[..., 0] - cu) / fu
        term_v = (pix[..., 1] + xy[..., 1] - cv) / fv
        nx, ny, nz = (nghbr_normals[..., 0], nghbr_normals[..., 1],
                      nghbr_normals[..., 2])
        num = -(du_over_fu * nx + dv_over_fv * ny)
        den = term_u * nx + term_v * ny + nz
        den = jnp.where(jnp.abs(den) < 1e-8,
                        1e-8 * jnp.where(den >= 0, 1.0, -1.0), den)
        dz = num / den
        axes = jnp.stack([du_over_fu + dz * term_u,
                          dv_over_fv + dz * term_v, dz], axis=-1)
        axes = _normalize(axes)
        invalid = jnp.any(~jnp.isfinite(axes), axis=-1, keepdims=True)
        axes = jnp.where(invalid, 0.0, axes)

        R = axis_angle_to_matrix(axes * angle)                   # (B,H,W,ps2,3,3)
        rot = jnp.einsum("bhwpij,bhwpj->bhwpi", R, nghbr_normals)
        rot = _normalize(rot)
        rot = ray_relu(rot, ray_8[:, :, :, None, :])
        new_norm = _normalize(jnp.sum(nghbr_prob[..., None] * rot, axis=3))

        up_mask = self.up_prob_head(hx)
        up_norm = _normalize(convex_upsample(new_norm, up_mask, self.DOWN))
        return h_new, new_norm, up_norm

    def __call__(self, img: jax.Array, intrins: jax.Array) -> jax.Array:
        """img NHWC (normalized), intrins (B, 3, 3) — cx/cy already shifted
        by +0.5 (dsine_arch.py:270). Returns (B, H, W, 3) unit normals."""
        feats = self.encoder(img)
        B, orig_H, orig_W, _ = img.shape
        uv_32 = self.get_uv(intrins, orig_H // 32, orig_W // 32, orig_H, orig_W)
        uv_16 = self.get_uv(intrins, orig_H // 16, orig_W // 16, orig_H, orig_W)
        uv_8 = self.get_uv(intrins, orig_H // 8, orig_W // 8, orig_H, orig_W)
        ray_8 = self.get_ray(intrins, orig_H // 8, orig_W // 8, orig_H, orig_W)

        x_d0 = self.conv2(jnp.concatenate([feats[10], uv_32], axis=-1))
        x_d1 = self.up1(x_d0, jnp.concatenate([feats[7], uv_16], axis=-1))
        x_feat = self.up2(x_d1, jnp.concatenate([feats[5], uv_8], axis=-1))
        x_feat = jnp.concatenate([x_feat, uv_8], axis=-1)

        pred_norm = _normalize(self.normal_head(x_feat))
        pred_norm = ray_relu(pred_norm, ray_8)
        feat_map = jnp.concatenate([self.feature_head(x_feat), uv_8], axis=-1)
        h = self.hidden_head(x_feat)

        up_norm = _normalize(convex_upsample(
            pred_norm, self.up_prob_head(jnp.concatenate([h, uv_8], axis=-1)),
            self.DOWN))
        for _ in range(self.num_iter):
            h, pred_norm, up_norm = self.refine(
                h, feat_map, pred_norm, intrins, orig_H, orig_W, uv_8, ray_8)
        return up_norm


def convert_dsine_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """dsine.pt state dict → flat paths for :class:`DSINE`."""
    for pre in ("model.", "module."):
        if any(k.startswith(pre) for k in sd):
            sd = {(k[len(pre):] if k.startswith(pre) else k): v
                  for k, v in sd.items()}
    out = convert_timm_efficientnet(
        {k: v for k, v in sd.items()
         if k.startswith("encoder.original_model.")},
        prefix="encoder.original_model.")
    out = {f"encoder.{k}": v for k, v in out.items()}

    def conv(dst, src, ws=False):
        tgt = f"{dst}.conv" if ws else dst
        out[f"{tgt}.kernel"] = _cw(sd[f"{src}.weight"])
        if f"{src}.bias" in sd:
            out[f"{tgt}.bias"] = sd[f"{src}.bias"]

    def gn(dst, src):
        out[f"{dst}.scale"] = sd[f"{src}.weight"]
        out[f"{dst}.bias"] = sd[f"{src}.bias"]

    conv("conv2", "decoder.conv2")
    for i, name in enumerate(["up1", "up2"], start=1):
        conv(f"{name}.conv_a", f"decoder.up{i}._net.0", ws=True)
        gn(f"{name}.gn_a", f"decoder.up{i}._net.1")
        conv(f"{name}.conv_b", f"decoder.up{i}._net.3", ws=True)
        gn(f"{name}.gn_b", f"decoder.up{i}._net.4")
    for head in ("normal_head", "feature_head", "hidden_head"):
        for li, ci in zip((0, 2, 4), ("c0", "c1", "c2")):
            conv(f"{head}.{ci}", f"decoder.{head}.{li}")
    for head in ("prob_head", "xy_head", "angle_head", "up_prob_head"):
        for li, ci in zip((0, 2, 4), ("c0", "c1", "c2")):
            conv(f"{head}.{ci}", f"{head}.{li}")
    for g in ("convz", "convr", "convq"):
        conv(f"gru.{g}", f"gru.{g}")
    return out


def get_intrins_from_fov(fov: float, H: int, W: int) -> np.ndarray:
    """(3,3) intrinsics from a field-of-view (utils/utils.py:71)."""
    f = (max(H, W) / 2.0) / np.tan(np.deg2rad(fov / 2.0))
    return np.array([[f, 0, W / 2.0 - 0.5],
                     [0, f, H / 2.0 - 0.5],
                     [0, 0, 1]], np.float32)


@preprocessor_registry.register("dsine", aliases=("DsineDetector",))
class DsinePreprocessor(BasePreprocessor):
    """Surface normals via DSINE (first-party JAX). Weights: ``dsine.pt``."""

    name = "dsine"
    params_schema = {"detect_resolution": 512, "fov": 60.0, "iterations": 5}

    def __init__(self, model: Optional[DSINE] = None):
        self._model = model
        self._jit = None

    def setup(self) -> None:
        if self._model is not None:
            return
        import torch

        from apex_studio_tpu.preprocess.weights import resolve_preprocessor_file

        path = resolve_preprocessor_file("dsine.pt",
                                         hf_repo="bdsqlsz/qinglong_controlnet-lllite")
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt)
        sd = {k: v.float().numpy() for k, v in sd.items()}
        model = DSINE()
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict

        apply_state_dict(model, convert_dsine_keys(sd), strict=False)
        self._model = model

    def _fn(self, num_iter: int):
        if self._jit is None or self._model.num_iter != num_iter:
            self._model.num_iter = num_iter
            graphdef, state = nnx.split(self._model)

            @jax.jit
            def run(state, x, intrins):
                return nnx.merge(graphdef, state)(x, intrins)

            self._jit = functools.partial(run, state)
        return self._jit

    def process_frame(self, frame: np.ndarray, **params) -> np.ndarray:
        import cv2

        h, w = frame.shape[:2]
        res = int(params.get("detect_resolution", 512))
        fov = float(params.get("fov", 60.0))
        iters = int(params.get("iterations", 5))
        scale = res / min(h, w) if res else 1.0
        th, tw = int(round(h * scale)), int(round(w * scale))
        img = cv2.resize(frame, (tw, th), interpolation=cv2.INTER_CUBIC)
        ph, pw = _pad64(th, tw)
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="constant")
        x = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        intrins = get_intrins_from_fov(fov, th, tw)
        intrins[0, 2] += 0.5
        intrins[1, 2] += 0.5
        normal = np.asarray(self._fn(iters)(jnp.asarray(x)[None],
                                            jnp.asarray(intrins)[None]))[0]
        vis = ((normal[:th, :tw] + 1.0) * 0.5).clip(0, 1)
        return cv2.resize((vis * 255.0).astype(np.uint8), (w, h),
                          interpolation=cv2.INTER_CUBIC)
