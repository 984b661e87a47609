"""Anime face segmentation + anime character matting in JAX.

Counterpart of the reference's ``src/preprocess/anime_face_segment``:
- AnimeFaceUNet (network.py:10): a MobileNetV2-encoder U-Net with
  instance-norm nearest-upsample decoder blocks producing 7 classes
  (background, hair, eye, mouth, face, skin, clothes) rendered through the
  fixed palette (util.py:17),
- ISNetDIS (isnet.py:499, github.com/xuebinqin/DIS) used by
  AnimeSegmentation (anime_segmentation.py:13) for character matting: a
  U2Net-style RSU pyramid with a stride-2 stem; inference takes side
  output d1 through a sigmoid and composites the character over white
  (anime_segmentation.py:64).

RSU blocks come from preprocess/u2net.py; MobileNetV2 primitives from
preprocess/mlsd.py with torch-symmetric padding (tf_pad=False — torchvision
MobileNetV2, unlike the MLSD trunk's TFLite variant)."""

from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.preprocess.base import (
    BasePreprocessor,
    Frame,
    preprocessor_registry,
)
from apex_studio_tpu.preprocess.mlsd import _ConvBNReLU6, _InvertedResidual
from apex_studio_tpu.preprocess.u2net import _RSU, _RSU4F, _pool, _up_to

logger = logging.getLogger(__name__)

# BGR→RGB-as-stored palette (util.py:17, webui-controlnet ordering)
PALETTE = np.array([
    (255, 255, 0),    # background
    (0, 0, 255),      # hair
    (255, 0, 0),      # eye
    (255, 255, 255),  # mouth
    (0, 255, 0),      # face
    (0, 255, 255),    # skin
    (255, 0, 255),    # clothes
], np.uint8)

# torchvision mobilenet_v2 inverted residual table (expand, cout, n, stride)
_MBV2 = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
         (6, 96, 3, 1), (6, 160, 3, 2)]


class _DecoderBlock(nnx.Module):
    """network.py:52 — nearest ×2 upsample, 3×3 conv, non-affine instance
    norm + LeakyReLU(0.1) (dropout is eval-identity)."""

    def __init__(self, cin: int, cout: int, final: bool = False, *,
                 rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (3, 3, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.final = final

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + self.bias.value
        if self.final:
            return jax.nn.softmax(y, axis=-1)
        mean = y.mean(axis=(1, 2), keepdims=True)
        var = y.var(axis=(1, 2), keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.where(y >= 0, y, 0.1 * y)


class AnimeFaceUNet(nnx.Module):
    """network.py:10 — MobileNetV2 features 0..16 encoder + IN decoder."""

    def __init__(self, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        feats: List[nnx.Module] = [
            _ConvBNReLU6(3, 32, 3, 2, tf_pad=False, rngs=rngs)]
        cin = 32
        for expand, cout, n, s in _MBV2:
            for i in range(n):
                feats.append(_InvertedResidual(
                    cin, cout, s if i == 0 else 1, expand, tf_pad=False,
                    rngs=rngs))
                cin = cout
        self.features = nnx.List(feats)
        self.de_block4 = _DecoderBlock(160, 96, rngs=rngs)
        self.de_block3 = _DecoderBlock(192, 32, rngs=rngs)
        self.de_block2 = _DecoderBlock(64, 24, rngs=rngs)
        self.de_block1 = _DecoderBlock(48, 16, rngs=rngs)
        self.de_block0 = _DecoderBlock(32, 7, final=True, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        taps = {1: None, 3: None, 6: None, 13: None, 16: None}
        h = x
        for i, f in enumerate(self.features):
            h = f(h)
            if i in taps:
                taps[i] = h
        e0, e1, e2, e3, e4 = taps[1], taps[3], taps[6], taps[13], taps[16]
        d4 = self.de_block4(e4)
        d3 = self.de_block3(jnp.concatenate([d4, e3], -1))
        d2 = self.de_block2(jnp.concatenate([d3, e2], -1))
        d1 = self.de_block1(jnp.concatenate([d2, e1], -1))
        return self.de_block0(jnp.concatenate([d1, e0], -1))


def convert_anime_face_keys(sd: dict) -> dict:
    """UNet.pth (en_blockN nested mob_blocks) → flat features list."""
    out = {}

    def put_cbr(t, j, depthwise=False):
        w = np.asarray(sd[f"{t}.0.weight"], np.float32)
        out[f"{j}.kernel"] = w.transpose(2, 3, 1, 0)
        out[f"{j}.bn_scale"] = np.asarray(sd[f"{t}.1.weight"], np.float32)
        out[f"{j}.bn_bias"] = np.asarray(sd[f"{t}.1.bias"], np.float32)
        out[f"{j}.bn_mean"] = np.asarray(sd[f"{t}.1.running_mean"], np.float32)
        out[f"{j}.bn_var"] = np.asarray(sd[f"{t}.1.running_var"], np.float32)

    def put_pw(t_conv, t_bn, j):
        out[f"{j}.kernel"] = np.asarray(
            sd[f"{t_conv}.weight"], np.float32).transpose(2, 3, 1, 0)
        out[f"{j}.bn_scale"] = np.asarray(sd[f"{t_bn}.weight"], np.float32)
        out[f"{j}.bn_bias"] = np.asarray(sd[f"{t_bn}.bias"], np.float32)
        out[f"{j}.bn_mean"] = np.asarray(sd[f"{t_bn}.running_mean"], np.float32)
        out[f"{j}.bn_var"] = np.asarray(sd[f"{t_bn}.running_var"], np.float32)

    # en_block slices → global feature indices (network.py:22-48)
    spans = {0: (0, 2), 1: (2, 4), 2: (4, 7), 3: (7, 14), 4: (14, 17)}
    for blk, (start, end) in spans.items():
        for gi in range(start, end):
            local = gi - start
            t = f"en_block{blk}.{local}"
            if gi == 0:
                put_cbr(t, "features.0")
                continue
            expand = 1 if gi == 1 else 6
            j = f"features.{gi}"
            if expand == 1:
                put_cbr(f"{t}.conv.0", f"{j}.dw", depthwise=True)
                put_pw(f"{t}.conv.1", f"{t}.conv.2", f"{j}.pw")
            else:
                put_cbr(f"{t}.conv.0", f"{j}.expand")
                put_cbr(f"{t}.conv.1", f"{j}.dw", depthwise=True)
                put_pw(f"{t}.conv.2", f"{t}.conv.3", f"{j}.pw")
    for blk, conv_i in ((4, 1), (3, 1), (2, 1), (1, 1), (0, 1)):
        t = f"de_block{blk}.{conv_i}"
        j = f"de_block{blk}"
        out[f"{j}.kernel"] = np.asarray(
            sd[f"{t}.weight"], np.float32).transpose(2, 3, 1, 0)
        out[f"{j}.bias"] = np.asarray(sd[f"{t}.bias"], np.float32)
    return out


class ISNetDIS(nnx.Module):
    """isnet.py:499 — stride-2 stem + U2Net-style RSU encoder/decoder; only
    side output d1 (sigmoid) is consumed at inference."""

    def __init__(self, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        init = nnx.initializers.lecun_normal()
        self.conv_in_kernel = nnx.Param(
            init(rngs.params(), (3, 3, 3, 64), jnp.float32))
        self.conv_in_bias = nnx.Param(jnp.zeros((64,), jnp.float32))
        self.stage1 = _RSU(7, 64, 32, 64, rngs=rngs)
        self.stage2 = _RSU(6, 64, 32, 128, rngs=rngs)
        self.stage3 = _RSU(5, 128, 64, 256, rngs=rngs)
        self.stage4 = _RSU(4, 256, 128, 512, rngs=rngs)
        self.stage5 = _RSU4F(512, 256, 512, rngs=rngs)
        self.stage6 = _RSU4F(512, 256, 512, rngs=rngs)
        self.stage5d = _RSU4F(1024, 256, 512, rngs=rngs)
        self.stage4d = _RSU(4, 1024, 128, 256, rngs=rngs)
        self.stage3d = _RSU(5, 512, 64, 128, rngs=rngs)
        self.stage2d = _RSU(6, 256, 32, 64, rngs=rngs)
        self.stage1d = _RSU(7, 128, 16, 64, rngs=rngs)
        self.side1_kernel = nnx.Param(
            init(rngs.params(), (3, 3, 64, 1), jnp.float32))
        self.side1_bias = nnx.Param(jnp.zeros((1,), jnp.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC ±[0,1] image → [B, H, W, 1] matte logits (side 1)."""
        hxin = jax.lax.conv_general_dilated(
            x, self.conv_in_kernel.value, window_strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + self.conv_in_bias.value
        h1 = self.stage1(hxin)
        h2 = self.stage2(_pool(h1))
        h3 = self.stage3(_pool(h2))
        h4 = self.stage4(_pool(h3))
        h5 = self.stage5(_pool(h4))
        h6 = self.stage6(_pool(h5))
        d5 = self.stage5d(jnp.concatenate([_up_to(h6, h5), h5], -1))
        d4 = self.stage4d(jnp.concatenate([_up_to(d5, h4), h4], -1))
        d3 = self.stage3d(jnp.concatenate([_up_to(d4, h3), h3], -1))
        d2 = self.stage2d(jnp.concatenate([_up_to(d3, h2), h2], -1))
        d1 = self.stage1d(jnp.concatenate([_up_to(d2, h1), h1], -1))
        s1 = jax.lax.conv_general_dilated(
            d1, self.side1_kernel.value, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + self.side1_bias.value
        return _up_to(s1, x)


def convert_isnet_keys(sd: dict) -> dict:
    """isnetis.ckpt (``net.``-prefixed ISNetDIS) → flat jax paths, reusing
    the u2net stage converter for the RSU interiors."""
    from apex_studio_tpu.preprocess.u2net import convert_u2net_keys

    sd = {k[len("net."):] if k.startswith("net.") else k: v
          for k, v in sd.items()}
    stage_sd = {k: v for k, v in sd.items()
                if k.startswith(("stage",))}
    out = dict(convert_u2net_keys(stage_sd))
    out["conv_in_kernel"] = np.asarray(
        sd["conv_in.weight"], np.float32).transpose(2, 3, 1, 0)
    out["conv_in_bias"] = np.asarray(sd["conv_in.bias"], np.float32)
    out["side1_kernel"] = np.asarray(
        sd["side1.weight"], np.float32).transpose(2, 3, 1, 0)
    out["side1_bias"] = np.asarray(sd["side1.bias"], np.float32)
    return out


def _finalize_isnet_tree(tree: dict, model: ISNetDIS) -> dict:
    from apex_studio_tpu.preprocess.u2net import _finalize_u2net_tree

    return _finalize_u2net_tree(tree, model)


@preprocessor_registry.register("anime_face_segment",
                                aliases=("AnimeFaceSegmentor",))
class AnimeFaceSegmentPreprocessor(BasePreprocessor):
    """7-class anime face parsing map with optional ISNet character matting
    (reference anime_face_segment/__init__.py:52)."""

    name = "anime_face_segment"
    params_schema = {"detect_resolution": 512, "remove_background": True}
    weights_id = "anime_face_segment"

    def __init__(self, model: Optional[AnimeFaceUNet] = None,
                 seg_model: Optional[ISNetDIS] = None):
        self.model = model
        self.seg_model = seg_model
        self._fwd = None
        self._seg_fwd = None

    def _ensure_models(self, need_seg: bool):
        from apex_studio_tpu.preprocess.weights import load_preprocessor_weights

        if self.model is None:
            self.model = AnimeFaceUNet(rngs=nnx.Rngs(0))
            try:
                sd = load_preprocessor_weights(
                    "anime_face_segment", hf_repo="bdsqlsz/qinglong_controlnet-lllite",
                    hf_filename="Annotators/UNet.pth")
            except Exception:
                sd = None
                logger.warning("anime_face_segment weights unavailable; random init")
            if sd:
                self._load(self.model, convert_anime_face_keys(sd))
        if need_seg and self.seg_model is None:
            self.seg_model = ISNetDIS(rngs=nnx.Rngs(0))
            try:
                sd = load_preprocessor_weights(
                    "isnet_anime", hf_repo="skytnt/anime-seg",
                    hf_filename="isnetis.ckpt")
            except Exception:
                sd = None
                logger.warning("isnet anime-seg weights unavailable; random init")
            if sd:
                tree = _finalize_isnet_tree(convert_isnet_keys(sd),
                                            self.seg_model)
                self._load(self.seg_model, tree)

    @staticmethod
    def _load(model, tree):
        graphdef, state = nnx.split(model)
        for path, leaf in state.flat_state():
            nm = ".".join(str(p) for p in path)
            if nm in tree:
                leaf.value = jnp.asarray(tree[nm])
        nnx.update(model, state)

    def process_frame(self, frame: Frame, detect_resolution: int = 512,
                      remove_background: bool = True, **_) -> Frame:
        import cv2

        self._ensure_models(remove_background)
        h, w = frame.shape[:2]
        size = int(detect_resolution)
        img = cv2.resize(frame, (size, size), interpolation=cv2.INTER_CUBIC)
        if remove_background:
            if self._seg_fwd is None:
                gd, _ = nnx.split(self.seg_model)

                @jax.jit
                def seg_fwd(state, x):
                    return jax.nn.sigmoid(nnx.merge(gd, state)(x))

                self._seg_fwd = seg_fwd
            _, sstate = nnx.split(self.seg_model)
            mask = np.asarray(self._seg_fwd(
                sstate, jnp.asarray(img.astype(np.float32) / 255.0)[None]))[0]
            img = (mask * img + 255.0 * (1 - mask)).astype(np.uint8)
        if self._fwd is None:
            gd, _ = nnx.split(self.model)

            @jax.jit
            def fwd(state, x):
                return nnx.merge(gd, state)(x)

            self._fwd = fwd
        _, state = nnx.split(self.model)
        seg = np.asarray(self._fwd(
            state, jnp.asarray(img.astype(np.float32) / 255.0)[None]))[0]
        labels = seg.argmax(-1)
        colored = PALETTE[labels]
        return cv2.resize(colored, (w, h), interpolation=cv2.INTER_NEAREST)
