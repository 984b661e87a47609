"""Anime lineart extraction (pix2pix UNet generator) in JAX.

Counterpart of the reference's ``src/preprocess/lineart_anime`` — an 8-down
UnetGenerator (``netG.pth``, __init__.py:25): 4×4 stride-2 convs down,
non-affine instance norms, LeakyReLU(0.2) descending / ReLU ascending, 4×4
stride-2 transposed convs up with channel-concat skips, tanh head. The
wrapper feeds ±1 RGB rounded up to a 256 multiple and inverts the output
(__init__.py:236 ``255 - detected_map``)."""

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

logger = logging.getLogger(__name__)


def _instance_norm(x, eps=1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _Down(nnx.Module):
    """4×4 stride-2 conv (biased — instance-norm branch of the reference)."""

    def __init__(self, cin, cout, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (4, 4, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + self.bias.value


class _Up(nnx.Module):
    """ConvTranspose2d(k4, s2, p1): torch weight [I, O, 4, 4] kept as the
    ``w`` param; jax pad (k-1-p)=2 with transpose_kernel=True."""

    def __init__(self, cin, cout, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.w = nnx.Param(init(rngs.params(), (cin, cout, 4, 4), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x):
        wj = jnp.transpose(self.w.value, (2, 3, 1, 0))  # [kh, kw, O, I]
        y = jax.lax.conv_transpose(
            x, wj, strides=(2, 2), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
        return y + self.bias.value


class LineartAnimeGenerator(nnx.Module):
    """UnetGenerator(3, 1, num_downs=8, ngf=64). NHWC ±1 → NHWC 1ch ±1."""

    # (cin, cout) per descent level, outermost first
    _DOWN = [(3, 64), (64, 128), (128, 256), (256, 512),
             (512, 512), (512, 512), (512, 512), (512, 512)]

    def __init__(self, *, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.downs = nnx.List([_Down(a, b, rngs=rngs) for a, b in self._DOWN])
        ups = []
        for i, (a, b) in enumerate(reversed(self._DOWN)):
            cin = b if i == 0 else 2 * b  # innermost has no skip concat
            ups.append(_Up(cin, a if i < 7 else 1, rngs=rngs))
        self.ups = nnx.List(ups)

    def __call__(self, x):
        feats: List[jnp.ndarray] = []
        h = x
        for i, down in enumerate(self.downs):
            if i > 0:
                h = jnp.where(h >= 0, h, 0.2 * h)  # LeakyReLU before conv
            h = down(h)
            if i > 0 and i < len(self.downs) - 1:
                h = _instance_norm(h)
            feats.append(h)
        # ascend: innermost block has no skip; others concat [skip, up(h)]
        h = feats[-1]
        for i, up in enumerate(self.ups):
            h = up(jax.nn.relu(h))
            if i < len(self.ups) - 1:
                h = _instance_norm(h)
                h = jnp.concatenate([feats[len(self.ups) - 2 - i], h], axis=-1)
        return jnp.tanh(h)


def convert_lineart_anime_keys(sd: dict) -> dict:
    """netG.pth nested UnetSkipConnectionBlock keys → flat down/up lists.

    Key prefixes by depth: L0 = "model.", deeper = +"model.1." (outermost
    submodule slot) then +"model.3." per mid level. Within a level:
    outermost [0 down, 3 up]; mid [1 down, 5 up]; innermost [1 down, 3 up].
    """
    out = {}
    prefixes = ["model."]
    for depth in range(1, 8):
        prefixes.append(prefixes[-1] + ("model.1." if depth == 1 else "model.3."))

    def put(src, dst, transpose_conv):
        w = np.asarray(sd[f"{src}.weight"], np.float32)
        if transpose_conv:
            out[f"{dst}.w"] = w  # [I, O, 4, 4] kept as-is
        else:
            out[f"{dst}.kernel"] = w.transpose(2, 3, 1, 0)
        out[f"{dst}.bias"] = np.asarray(sd[f"{src}.bias"], np.float32)

    for depth, pref in enumerate(prefixes):
        if depth == 0:
            down_i, up_i = 0, 3
        elif depth == 7:
            down_i, up_i = 1, 3
        else:
            down_i, up_i = 1, 5
        put(f"{pref}model.{down_i}", f"downs.{depth}", False)
        put(f"{pref}model.{up_i}", f"ups.{7 - depth}", True)
    return out


@preprocessor_registry.register("lineart_anime", aliases=("LineartAnimeDetector",))
class LineartAnimePreprocessor(BasePreprocessor):
    name = "lineart_anime"
    params_schema = {"detect_resolution": 512}
    weights_id = "lineart_anime"

    def __init__(self, model: Optional[LineartAnimeGenerator] = None):
        self.model = model
        self._fwd = None

    def _ensure_model(self) -> LineartAnimeGenerator:
        if self.model is None:
            self.model = LineartAnimeGenerator(rngs=nnx.Rngs(0))
            from apex_studio_tpu.preprocess.weights import (
                load_preprocessor_weights)

            try:
                sd = load_preprocessor_weights(
                    "lineart_anime", hf_repo="lllyasviel/Annotators",
                    hf_filename="netG.pth")
            except Exception:
                sd = None
                logger.warning("lineart_anime weights unavailable; random init")
            if sd:
                sd = {k.replace("module.", ""): v for k, v in sd.items()}
                tree = convert_lineart_anime_keys(sd)
                graphdef, state = nnx.split(self.model)
                for path, leaf in state.flat_state():
                    nm = ".".join(str(p) for p in path)
                    if nm in tree:
                        leaf.value = jnp.asarray(tree[nm])
                self.model = nnx.merge(graphdef, state)
        return self.model

    def process_frame(self, frame: Frame, detect_resolution: int = 512,
                      **_) -> Frame:
        import cv2

        model = self._ensure_model()
        h, w = frame.shape[:2]
        size = 256 * int(np.ceil(detect_resolution / 256.0))
        img = cv2.resize(frame, (size, size), interpolation=cv2.INTER_CUBIC)
        x = jnp.asarray(img.astype(np.float32) / 127.5 - 1.0)[None]
        if self._fwd is None:
            graphdef, _ = nnx.split(model)

            @jax.jit
            def fwd(state, inp):
                return nnx.merge(graphdef, state)(inp)

            self._fwd = fwd
        _, state = nnx.split(model)
        line = np.asarray(self._fwd(state, x))[0, :, :, 0] * 127.5 + 127.5
        line = np.clip(line, 0, 255).astype(np.uint8)
        out = 255 - cv2.resize(line, (w, h), interpolation=cv2.INTER_AREA)
        return np.stack([out] * 3, axis=-1)
