"""Depth Anything V2 — monocular depth estimation in JAX.

Model-backed depth preprocessor, counterpart of the reference's
``src/preprocess/depth_anything_v2/`` (DINOv2 ViT encoder + DPT decoder,
``dpt.py:209`` forward, ``dinov2.py:342`` get_intermediate_layers). The
architecture is re-implemented in NNX with NHWC layouts (channels-minor keeps
the conv channel axis on the MXU lanes); the published torch checkpoints
(depth_anything_v2_{vits,vitb,vitl}.pth / HF safetensors) load through
``convert_dav2_keys`` + the standard state-mapping transforms.

The whole forward (encoder + DPT head) is one jitted function; frames of a
video batch reuse the compiled executable.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, LayerNorm, Linear
from apex_studio_tpu.preprocess.base import BasePreprocessor, preprocessor_registry

logger = logging.getLogger("apex.preprocess.depth")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass
class DAv2Config:
    encoder: str = "vits"
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    features: int = 64
    out_channels: Tuple[int, int, int, int] = (48, 96, 192, 384)
    intermediate_idx: Tuple[int, int, int, int] = (2, 5, 8, 11)
    patch_size: int = 14
    mlp_ratio: float = 4.0
    pos_grid: int = 37  # 518/14 — the pretraining grid for pos_embed

    @classmethod
    def from_name(cls, name: str) -> "DAv2Config":
        presets = {
            "vits": dict(embed_dim=384, depth=12, num_heads=6, features=64,
                         out_channels=(48, 96, 192, 384), intermediate_idx=(2, 5, 8, 11)),
            "vitb": dict(embed_dim=768, depth=12, num_heads=12, features=128,
                         out_channels=(96, 192, 384, 768), intermediate_idx=(2, 5, 8, 11)),
            "vitl": dict(embed_dim=1024, depth=24, num_heads=16, features=256,
                         out_channels=(256, 512, 1024, 1024), intermediate_idx=(4, 11, 17, 23)),
        }
        if name not in presets:
            raise ValueError(f"unknown DAv2 encoder {name!r} (have {sorted(presets)})")
        return cls(encoder=name, **presets[name])

    @classmethod
    def tiny(cls) -> "DAv2Config":
        """Test-sized config: full topology, toy dims."""
        return cls(encoder="tiny", embed_dim=32, depth=4, num_heads=2, features=16,
                   out_channels=(8, 12, 16, 24), intermediate_idx=(0, 1, 2, 3),
                   patch_size=14, pos_grid=4)


class Conv(nnx.Module):
    """NHWC conv, kernel HWIO, optional bias."""

    def __init__(self, cin: int, cout: int, kernel: int = 3, stride: int = 1,
                 padding: int = 1, use_bias: bool = True, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (kernel, kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32)) if use_bias else None
        self.stride = stride
        self.padding = padding

    def __call__(self, x):
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if self.bias is None else y + self.bias.value


class BlockUpsample(nnx.Module):
    """ConvTranspose2d with kernel_size == stride: each input pixel expands to
    an s×s block — expressed as an einsum + reshape, which XLA maps onto the
    MXU directly (no transposed-conv lowering)."""

    def __init__(self, cin: int, cout: int, scale: int, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.w = nnx.Param(init(rngs.params(), (scale, scale, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.scale = scale

    def __call__(self, x):
        b, h, w, _ = x.shape
        s = self.scale
        y = jnp.einsum("bhwc,ijco->bhiwjo", x, self.w.value)
        return y.reshape(b, h * s, w * s, -1) + self.bias.value


def resize_bilinear_ac(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True on NHWC (torch F.interpolate
    semantics used throughout DPT)."""
    B, H, W, C = x.shape
    if (H, W) == (h, w):
        return x
    ys = jnp.linspace(0.0, H - 1.0, h) if h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, W - 1.0, w) if w > 1 else jnp.zeros((1,))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    r0 = x[:, y0]
    r1 = x[:, y1]
    top = r0[:, :, x0] * (1 - fx) + r0[:, :, x1] * fx
    bot = r1[:, :, x0] * (1 - fx) + r1[:, :, x1] * fx
    return top * (1 - fy) + bot * fy


class _VitAttention(nnx.Module):
    def __init__(self, dim: int, heads: int, *, rngs: nnx.Rngs):
        kw = dict(dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
        self.qkv = Linear(dim, dim * 3, **kw)
        self.proj = Linear(dim, dim, **kw)
        self.heads = heads

    def __call__(self, x):
        b, n, d = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        from apex_studio_tpu.ops.attention import naive_attention

        out = naive_attention(q, k, v).astype(x.dtype)
        return self.proj(out.reshape(b, n, d))


class _LayerScale(nnx.Module):
    def __init__(self, dim: int):
        self.gamma = nnx.Param(jnp.ones((dim,), jnp.float32))

    def __call__(self, x):
        return x * self.gamma.value


class _VitBlock(nnx.Module):
    def __init__(self, cfg: DAv2Config, *, rngs: nnx.Rngs):
        d = cfg.embed_dim
        self.norm1 = LayerNorm(d)
        self.attn = _VitAttention(d, cfg.num_heads, rngs=rngs)
        self.ls1 = _LayerScale(d)
        self.norm2 = LayerNorm(d)
        self.mlp = GELUMLP(d, int(d * cfg.mlp_ratio), approximate=False,
                           dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
        self.ls2 = _LayerScale(d)

    def __call__(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class DINOv2(nnx.Module):
    """ViT encoder exposing intermediate layers (dinov2.py:342 behavior:
    final-norm applied to each collected layer, cls token returned)."""

    def __init__(self, cfg: DAv2Config, *, rngs: nnx.Rngs):
        d = cfg.embed_dim
        self.cfg = cfg
        self.patch_embed = Conv(3, d, kernel=cfg.patch_size, stride=cfg.patch_size,
                                padding=0, rngs=rngs)
        self.cls_token = nnx.Param(jnp.zeros((1, 1, d), jnp.float32))
        self.pos_embed = nnx.Param(
            jnp.zeros((1, 1 + cfg.pos_grid * cfg.pos_grid, d), jnp.float32))
        self.blocks = nnx.List([_VitBlock(cfg, rngs=rngs) for _ in range(cfg.depth)])
        self.norm = LayerNorm(d)

    def _interp_pos(self, gh: int, gw: int) -> jnp.ndarray:
        pe = self.pos_embed.value
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
        g = self.cfg.pos_grid
        if (gh, gw) == (g, g):
            return pe
        grid = patch_pe.reshape(1, g, g, -1)
        grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), "bicubic",
                                antialias=False)
        return jnp.concatenate([cls_pe, grid.reshape(1, gh * gw, -1)], axis=1)

    def intermediate_layers(self, x: jnp.ndarray, idx: Sequence[int]):
        """x: NHWC float, H/W multiples of patch_size → [(patch_tokens, cls)]."""
        b, H, W, _ = x.shape
        p = self.cfg.patch_size
        gh, gw = H // p, W // p
        tok = self.patch_embed(x).reshape(b, gh * gw, -1)
        cls = jnp.broadcast_to(self.cls_token.value, (b, 1, tok.shape[-1]))
        tok = jnp.concatenate([cls, tok], axis=1) + self._interp_pos(gh, gw)
        want = set(int(i) for i in idx)
        outs: Dict[int, jnp.ndarray] = {}
        for i, blk in enumerate(self.blocks):
            tok = blk(tok)
            if i in want:
                outs[i] = tok
        return [
            (self.norm(outs[i])[:, 1:], self.norm(outs[i])[:, 0]) for i in idx
        ]


class _ResidualConvUnit(nnx.Module):
    def __init__(self, features: int, *, rngs: nnx.Rngs):
        self.conv1 = Conv(features, features, rngs=rngs)
        self.conv2 = Conv(features, features, rngs=rngs)

    def __call__(self, x):
        y = self.conv1(jax.nn.relu(x))
        y = self.conv2(jax.nn.relu(y))
        return x + y


class _FeatureFusion(nnx.Module):
    def __init__(self, features: int, *, rngs: nnx.Rngs):
        self.resConfUnit1 = _ResidualConvUnit(features, rngs=rngs)
        self.resConfUnit2 = _ResidualConvUnit(features, rngs=rngs)
        self.out_conv = Conv(features, features, kernel=1, padding=0, rngs=rngs)

    def __call__(self, x0, x1=None, size: Optional[Tuple[int, int]] = None):
        out = x0 if x1 is None else x0 + self.resConfUnit1(x1)
        out = self.resConfUnit2(out)
        h, w = size if size is not None else (out.shape[1] * 2, out.shape[2] * 2)
        out = resize_bilinear_ac(out, h, w)
        return self.out_conv(out)


class DPTHead(nnx.Module):
    def __init__(self, cfg: DAv2Config, *, rngs: nnx.Rngs):
        d, f = cfg.embed_dim, cfg.features
        oc = cfg.out_channels
        self.projects = nnx.List([Conv(d, c, kernel=1, padding=0, rngs=rngs) for c in oc])
        self.resize0 = BlockUpsample(oc[0], oc[0], 4, rngs=rngs)
        self.resize1 = BlockUpsample(oc[1], oc[1], 2, rngs=rngs)
        self.resize3 = Conv(oc[3], oc[3], kernel=3, stride=2, padding=1, rngs=rngs)
        self.layer_rn = nnx.List([Conv(c, f, use_bias=False, rngs=rngs) for c in oc])
        self.refinenet1 = _FeatureFusion(f, rngs=rngs)
        self.refinenet2 = _FeatureFusion(f, rngs=rngs)
        self.refinenet3 = _FeatureFusion(f, rngs=rngs)
        self.refinenet4 = _FeatureFusion(f, rngs=rngs)
        self.output_conv1 = Conv(f, f // 2, rngs=rngs)
        self.output_conv2_0 = Conv(f // 2, 32, rngs=rngs)
        self.output_conv2_2 = Conv(32, 1, kernel=1, padding=0, rngs=rngs)
        self.patch_size = cfg.patch_size

    def __call__(self, features, gh: int, gw: int):
        maps = []
        for i, (tok, _cls) in enumerate(features):
            b, n, d = tok.shape
            x = tok.reshape(b, gh, gw, d)
            x = self.projects[i](x)
            if i == 0:
                x = self.resize0(x)
            elif i == 1:
                x = self.resize1(x)
            elif i == 3:
                x = self.resize3(x)
            maps.append(self.layer_rn[i](x))
        l1, l2, l3, l4 = maps
        p4 = self.refinenet4(l4, size=l3.shape[1:3])
        p3 = self.refinenet3(p4, l3, size=l2.shape[1:3])
        p2 = self.refinenet2(p3, l2, size=l1.shape[1:3])
        p1 = self.refinenet1(p2, l1)
        out = self.output_conv1(p1)
        out = resize_bilinear_ac(out, gh * self.patch_size, gw * self.patch_size)
        out = jax.nn.relu(self.output_conv2_0(out))
        out = jax.nn.relu(self.output_conv2_2(out))
        return out[..., 0]  # (B, H, W) relative inverse depth


class DepthAnythingV2(nnx.Module):
    """Full model: NHWC normalized image → relative depth (B, H, W)."""

    config_class = DAv2Config

    def __init__(self, cfg: DAv2Config, *, dtype=jnp.float32, param_dtype=jnp.float32,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.pretrained = DINOv2(cfg, rngs=rngs)
        self.depth_head = DPTHead(cfg, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.cfg.patch_size
        gh, gw = x.shape[1] // p, x.shape[2] // p
        feats = self.pretrained.intermediate_layers(x, self.cfg.intermediate_idx)
        return self.depth_head(feats, gh, gw)


def convert_dav2_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Published torch checkpoint keys → model attribute paths (values keep
    torch layout; loaders/state_mapping.py infers the transposes)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k.startswith("pretrained."):
            r = k[len("pretrained."):]
            if r == "mask_token":
                continue
            r = r.replace("patch_embed.proj.weight", "patch_embed.kernel")
            r = r.replace("patch_embed.proj.bias", "patch_embed.bias")
            r = r.replace(".attn.qkv.weight", ".attn.qkv.kernel")
            r = r.replace(".attn.proj.weight", ".attn.proj.kernel")
            r = r.replace(".mlp.fc1.weight", ".mlp.fc1.kernel")
            r = r.replace(".mlp.fc2.weight", ".mlp.fc2.kernel")
            out[f"pretrained.{r}"] = v
            continue
        if k.startswith("depth_head."):
            r = k[len("depth_head."):]
            if r.startswith("resize_layers."):
                i = int(r.split(".")[1])
                leaf = r.split(".")[-1]
                if i in (0, 1):
                    # ConvTranspose (in,out,kh,kw) → pre-transposed HWIO-like
                    if leaf == "weight":
                        out[f"depth_head.resize{i}.w"] = v.transpose(2, 3, 0, 1)
                    else:
                        out[f"depth_head.resize{i}.bias"] = v
                elif i == 3:
                    tgt = "kernel" if leaf == "weight" else "bias"
                    out[f"depth_head.resize3.{tgt}"] = v
                continue
            r = r.replace("scratch.", "")
            for n in range(1, 5):
                r = r.replace(f"layer{n}_rn.weight", f"layer_rn.{n - 1}.kernel")
            r = r.replace(".weight", ".kernel") if ".conv" in r or "out_conv" in r or "projects" in r or "output_conv" in r else r
            r = r.replace("output_conv2.0.", "output_conv2_0.")
            r = r.replace("output_conv2.2.", "output_conv2_2.")
            out[f"depth_head.{r}"] = v
            continue
        logger.debug("DAv2 converter: skipping %s", k)
    return out


# -------- preprocessor ----------------------------------------------------------------


def _prepare(frame: np.ndarray, resolution: int, patch: int = 14):
    """uint8 HWC RGB → normalized NHWC f32, min side ≥ resolution, dims
    multiples of the patch size (the reference's lower_bound Resize)."""
    h, w = frame.shape[:2]
    scale = resolution / min(h, w) if resolution else 1.0
    th = max(patch, int(round(h * scale / patch)) * patch)
    tw = max(patch, int(round(w * scale / patch)) * patch)
    img = frame.astype(np.float32) / 255.0
    x = jax.image.resize(jnp.asarray(img), (th, tw, 3), "bicubic", antialias=True)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x[None], (h, w)


@preprocessor_registry.register("depth_anything_v2")
class DepthAnythingV2Preprocessor(BasePreprocessor):
    """Relative depth map (grayscale uint8). Params: ``encoder`` (vits/vitb/
    vitl), ``detect_resolution`` (0 = native). Weights resolve from the
    components dir (``depth_anything_v2_<encoder>.{safetensors,pth}``)."""

    name = "depth_anything_v2"
    params_schema = {"encoder": "vits", "detect_resolution": 518}

    def __init__(self, model: Optional[DepthAnythingV2] = None):
        self._model = model
        self._jit = None

    def setup(self) -> None:
        if self._model is not None:
            return
        from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

        cfg = DAv2Config.from_name(self._pending_encoder)
        model = DepthAnythingV2(cfg)
        hf = {"vits": "depth-anything/Depth-Anything-V2-Small",
              "vitb": "depth-anything/Depth-Anything-V2-Base",
              "vitl": "depth-anything/Depth-Anything-V2-Large"}
        sd = load_preprocessor_weights(
            f"depth_anything_v2_{cfg.encoder}",
            hf_repo=hf.get(cfg.encoder),
            hf_filename=f"depth_anything_v2_{cfg.encoder}.pth",
        )
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict

        apply_state_dict(model, convert_dav2_keys(sd), strict=False)
        self._model = model

    _pending_encoder = "vits"

    def _fn(self):
        if self._jit is None:
            model = self._model
            graphdef, state = nnx.split(model)

            @jax.jit
            def run(state, x):
                return nnx.merge(graphdef, state)(x)

            self._jit = functools.partial(run, state)
        return self._jit

    def __call__(self, frames, progress_callback=None, **params):
        self._pending_encoder = params.pop("encoder", "vits")
        return super().__call__(frames, progress_callback=progress_callback, **params)

    def process_frame(self, frame: np.ndarray, **params) -> np.ndarray:
        res = int(params.get("detect_resolution", 518) or min(frame.shape[:2]))
        x, (h, w) = _prepare(frame, res, self._model.cfg.patch_size)
        depth = self._fn()(x)
        depth = resize_bilinear_ac(depth[..., None], h, w)[0, ..., 0]
        d = np.asarray(depth)
        lo, hi = float(d.min()), float(d.max())
        norm = (d - lo) / (hi - lo) if hi > lo else np.zeros_like(d)
        g = (norm * 255.0).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)


# editor alias used by reference manifests ("depth")
preprocessor_registry.register("depth")(DepthAnythingV2Preprocessor)
