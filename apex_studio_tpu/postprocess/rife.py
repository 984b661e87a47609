"""RIFE — learned video frame interpolation in JAX.

Counterpart of the reference's RIFE postprocessor
(``src/postprocess/rife/rife.py:60``), which downloads the Practical-RIFE
"train_log" bundle and runs its torch IFNet. Here the IFNet v4-family
architecture (coarse-to-fine IFBlocks predicting bidirectional flow + fusion
mask at scales 8/4/2/1) is re-implemented in NNX/NHWC and the published
``flownet.pkl`` checkpoints load through ``convert_rife_keys``. The whole
two-frame forward is one jitted call; arbitrary sub-frame timesteps are
supported (target-fps retiming, not just 2x).

Conv activations are PReLU with per-channel slopes; checkpoints from variants
that used LeakyReLU(0.2) simply leave the initialized 0.2 slopes in place
(PReLU with a fixed 0.2 slope is LeakyReLU(0.2)).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.postprocess.base import BasePostprocessor, postprocessor_registry
from apex_studio_tpu.utils.progress import safe_emit_progress

logger = logging.getLogger("apex.postprocess.rife")


@dataclasses.dataclass
class RIFEConfig:
    widths: Tuple[int, ...] = (192, 128, 96, 64)
    scales: Tuple[int, ...] = (8, 4, 2, 1)
    res_blocks: int = 8

    @classmethod
    def tiny(cls) -> "RIFEConfig":
        return cls(widths=(16, 12), scales=(2, 1), res_blocks=2)


class PReLU(nnx.Module):
    def __init__(self, channels: int, init: float = 0.2):
        self.weight = nnx.Param(jnp.full((channels,), init, jnp.float32))

    def __call__(self, x):
        a = self.weight.value
        return jnp.where(x >= 0, x, a * x)


class ConvPReLU(nnx.Module):
    def __init__(self, cin: int, cout: int, kernel: int = 3, stride: int = 1,
                 padding: int = 1, *, rngs: nnx.Rngs):
        from apex_studio_tpu.preprocess.depth_anything import Conv

        self.conv = Conv(cin, cout, kernel, stride, padding, rngs=rngs)
        self.act = PReLU(cout)

    def __call__(self, x):
        return self.act(self.conv(x))


class ResConv(nnx.Module):
    """conv(x)·beta + x through a PReLU — the IFBlock residual unit."""

    def __init__(self, c: int, *, rngs: nnx.Rngs):
        from apex_studio_tpu.preprocess.depth_anything import Conv

        self.conv = Conv(c, c, 3, rngs=rngs)
        self.beta = nnx.Param(jnp.ones((c,), jnp.float32))
        self.act = PReLU(c)

    def __call__(self, x):
        return self.act(self.conv(x) * self.beta.value + x)


class Deconv2x(nnx.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) as a dilated conv. The kernel is
    stored pre-flipped in HWIO (converter handles the torch layout)."""

    def __init__(self, cin: int, cout: int, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        # named .w (not .kernel) so the state-mapper keeps the pre-flipped layout
        self.w = nnx.Param(init(rngs.params(), (4, 4, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x):
        # zero-insert by 2 then pad k-1-p = 2 each side and convolve with the
        # (pre-flipped) kernel — exactly torch's ConvTranspose2d(4, 2, 1)
        y = jax.lax.conv_general_dilated(
            x, self.w.value, window_strides=(1, 1),
            padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + self.bias.value


def pixel_shuffle2(x: jnp.ndarray) -> jnp.ndarray:
    """torch PixelShuffle(2) on NHWC: channel c_out*4 + i*2 + j → (2h+i, 2w+j)."""
    b, h, w, c = x.shape
    co = c // 4
    y = x.reshape(b, h, w, co, 2, 2)
    y = y.transpose(0, 1, 4, 2, 5, 3)
    return y.reshape(b, h * 2, w * 2, co)


def resize_half_pixel(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """bilinear align_corners=False (torch F.interpolate default)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp: sample ``img`` at (x + flow_x, y + flow_y), bilinear,
    border-clamped (torch grid_sample align_corners=True semantics up to the
    padding mode)."""
    b, h, w, c = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    px = xs[None] + flow[..., 0]
    py = ys[None] + flow[..., 1]
    px = jnp.clip(px, 0.0, w - 1.0)
    py = jnp.clip(py, 0.0, h - 1.0)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]

    def gather(yy, xx):
        bi = jnp.arange(b)[:, None, None]
        return img[bi, yy, xx]

    top = gather(y0, x0) * (1 - fx) + gather(y0, x1) * fx
    bot = gather(y1, x0) * (1 - fx) + gather(y1, x1) * fx
    return top * (1 - fy) + bot * fy


class IFBlock(nnx.Module):
    def __init__(self, cin: int, c: int, res_blocks: int, *, rngs: nnx.Rngs):
        self.conv0 = nnx.List([
            ConvPReLU(cin, c // 2, 3, 2, 1, rngs=rngs),
            ConvPReLU(c // 2, c, 3, 2, 1, rngs=rngs),
        ])
        self.convblock = nnx.List([ResConv(c, rngs=rngs) for _ in range(res_blocks)])
        self.lastconv = Deconv2x(c, 4 * 6, rngs=rngs)

    def __call__(self, x, flow, scale: int):
        h, w = x.shape[1], x.shape[2]
        sx = resize_half_pixel(x, h // scale, w // scale)
        if flow is not None:
            sf = resize_half_pixel(flow, h // scale, w // scale) / scale
            sx = jnp.concatenate([sx, sf], axis=-1)
        feat = self.conv0[1](self.conv0[0](sx))
        for rc in self.convblock:
            feat = rc(feat)
        tmp = pixel_shuffle2(self.lastconv(feat))
        tmp = resize_half_pixel(tmp, h, w)
        return tmp[..., :4] * scale, tmp[..., 4:5]


class IFNet(nnx.Module):
    """x = concat(img0, img1) NHWC in [0,1], timestep scalar → merged frame."""

    config_class = RIFEConfig

    def __init__(self, cfg: RIFEConfig = RIFEConfig(), *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        blocks = []
        for i, c in enumerate(cfg.widths):
            cin = 7 if i == 0 else 8 + 4  # warped pair + t + mask, + flow
            blocks.append(IFBlock(cin, c, cfg.res_blocks, rngs=rngs))
        self.blocks = nnx.List(blocks)

    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray, timestep) -> jnp.ndarray:
        t = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32),
                             (img0.shape[0], img0.shape[1], img0.shape[2], 1))
        flow = None
        mask = None
        warped0, warped1 = img0, img1
        for blk, scale in zip(self.blocks, self.cfg.scales):
            if flow is None:
                flow, mask = blk(jnp.concatenate([img0, img1, t], axis=-1), None, scale)
            else:
                d_flow, d_mask = blk(
                    jnp.concatenate([warped0, warped1, t, mask], axis=-1), flow, scale)
                flow = flow + d_flow
                mask = mask + d_mask
            warped0 = flow_warp(img0, flow[..., :2])
            warped1 = flow_warp(img1, flow[..., 2:4])
        m = jax.nn.sigmoid(mask)
        return jnp.clip(warped0 * m + warped1 * (1 - m), 0.0, 1.0)


def convert_rife_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Practical-RIFE ``flownet.pkl`` keys → model paths. Handles the
    ``module.`` DataParallel prefix, PReLU slopes when present, and the
    ConvTranspose pre-flip for Deconv2x."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k.startswith("module."):
            k = k[len("module."):]
        if not k.startswith("block"):
            continue  # contextnet/unet are training-time only
        parts = k.split(".")
        bi = parts[0][5:]  # block0 / block1 / …
        if bi == "_tea":
            continue
        path = f"blocks.{bi}"
        if parts[1] == "conv0":
            i, sub, leaf = int(parts[2]), parts[3], parts[4]
            if sub == "0":
                tgt = "kernel" if leaf == "weight" else "bias"
                out[f"{path}.conv0.{i}.conv.{tgt}"] = v
            else:  # PReLU slope
                out[f"{path}.conv0.{i}.act.weight"] = v.reshape(-1)
        elif parts[1] == "convblock":
            i = int(parts[2])
            rest = parts[3:]
            if rest[0].isdigit():  # Sequential(conv, PReLU) variant
                tgt = ("conv." + ("kernel" if rest[-1] == "weight" else "bias")
                       if rest[0] == "0" else "act.weight")
                v2 = v.reshape(-1) if tgt == "act.weight" else v
                out[f"{path}.convblock.{i}.{tgt}"] = v2
            elif rest[0] == "conv":
                sub = rest[1] if len(rest) == 3 else None
                leaf = rest[-1]
                if sub in (None, "0"):
                    tgt = "kernel" if leaf == "weight" else "bias"
                    out[f"{path}.convblock.{i}.conv.{tgt}"] = v
                else:
                    out[f"{path}.convblock.{i}.act.weight"] = v.reshape(-1)
            elif rest[0] == "beta":
                out[f"{path}.convblock.{i}.beta"] = v.reshape(-1)
            elif rest[0] in ("relu", "prelu"):
                out[f"{path}.convblock.{i}.act.weight"] = v.reshape(-1)
        elif parts[1] == "lastconv":
            leaf = parts[-1]
            if leaf == "weight" and v.ndim == 4:
                # ConvTranspose (in,out,kh,kw) → pre-flipped HWIO
                out[f"{path}.lastconv.w"] = \
                    v[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
            elif leaf == "bias":
                out[f"{path}.lastconv.bias"] = v
    return out


@postprocessor_registry.register("rife_v4")
class RIFEPostprocessor(BasePostprocessor):
    """Learned frame interpolation. Params: ``multiplier`` (int ≥ 2) or
    ``target_fps`` + ``source_fps``. Weights: ``rife_v4.{pkl,pth,safetensors}``
    in the preprocessor models dir."""

    name = "rife_v4"

    def __init__(self, model: Optional[IFNet] = None):
        self._model = model
        self._jit = None

    def setup(self) -> None:
        if self._model is not None:
            return
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

        sd = load_preprocessor_weights("rife_v4", hf_repo="imaginairy/rife-interpolation",
                                       hf_filename="rife-flownet-4.13.2.safetensors")
        model = IFNet(RIFEConfig())
        apply_state_dict(model, convert_rife_keys(sd), strict=False)
        self._model = model

    def _fn(self):
        if self._jit is None:
            graphdef, state = nnx.split(self._model)

            @jax.jit
            def run(state, img0, img1, t):
                return nnx.merge(graphdef, state)(img0, img1, t)

            self._jit = functools.partial(run, state)
        return self._jit

    def _pair(self, a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
        h, w = a.shape[:2]
        # pad to a multiple of 32 (scale-8 blocks downsample by 4 internally)
        ph = -h % 32
        pw = -w % 32
        i0 = np.pad(a, ((0, ph), (0, pw), (0, 0)), mode="edge")
        i1 = np.pad(b, ((0, ph), (0, pw), (0, 0)), mode="edge")
        x0 = jnp.asarray(i0, jnp.float32)[None] / 255.0
        x1 = jnp.asarray(i1, jnp.float32)[None] / 255.0
        out = self._fn()(x0, x1, jnp.float32(t))
        img = np.asarray(out[0, :h, :w]) * 255.0
        return np.clip(img + 0.5, 0, 255).astype(np.uint8)

    def __call__(self, frames: Sequence[np.ndarray], progress_callback=None,
                 multiplier: int = 2, **_: Any) -> List[np.ndarray]:
        frames = list(frames)
        if len(frames) < 2 or multiplier < 2:
            return frames
        self.setup()
        out: List[np.ndarray] = []
        n_pairs = len(frames) - 1
        for i in range(n_pairs):
            out.append(frames[i])
            for j in range(1, multiplier):
                out.append(self._pair(frames[i], frames[i + 1], j / multiplier))
            safe_emit_progress(progress_callback, (i + 1) / n_pairs,
                               f"interpolated pair {i + 1}/{n_pairs}")
        out.append(frames[-1])
        return out
