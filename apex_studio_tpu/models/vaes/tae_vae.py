"""TAEHV-family tiny video autoencoders (preview / flashvsr decoders) in NNX.

Behavioral counterpart of the reference's ``src/vae/tae/model.py`` (TAEHV:
full encoder+decoder used as the HunyuanVideo-1.5 "light VAE",
``vae/hunyuanvideo15/model.py:821``) and ``src/vae/tiny_wan/model.py``
(AutoencoderKLTinyWan: decoder-only, identity-deepened, used by the FlashVSR
tiny upscaler and Wan previews).

Semantics reproduced:
- per-frame 3x3 convs; MemBlock mixes each frame with the previous frame's
  features (zero at t=0) — in the reference's "parallel" mode the past is the
  input shifted by one frame (``tae/model.py:88-98``), which is exactly a
  pad-and-shift here (no sequential loop; XLA sees one program).
- TPool(s): merge s consecutive frames via a 1x1 conv over s·C channels
  (T → T/s); encode pads the clip at the END to a multiple of 4 by repeating
  the last frame (``tae/model.py:303-308``).
- TGrow(s): 1x1 conv to s·C channels, split into s consecutive output frames
  (T → s·T).
- decoder output trims the first ``2^(#temporal upscales) - 1`` frames
  (``frames_to_trim``) so T latent frames → 4T-3 = 4(T-1)+1 video frames.
- tiny_wan "identity deepening": one extra 3x3 conv + act after every
  sequential-level activation (``tiny_wan/model.py:256``); checkpoint
  indices follow the deepened layout.
- patch_size>1 (wan 2.2 variant): pixel_unshuffle inputs / pixel_shuffle
  outputs.

Output range: the package-wide VAE contract is video in [-1, 1]; TAEHV
natively produces [0,1] (wan/cvx) or [-1,1] (hy15) — ``out_range`` selects
the mapping (tiny_wan wrapper's ``.mul_(2).sub_(1)``, tiny_wan/model.py:340).

Layer indices mirror the reference nn.Sequential exactly so the ``tae_vae``
converter is regex-only.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry


@dataclasses.dataclass
class TAEConfig:
    latent_channels: int = 16
    channels: Tuple[int, ...] = (256, 128, 64, 64)
    patch_size: int = 1
    act: str = "relu"  # "relu" | "leaky_relu" (hy15 uses LeakyReLU(0.2))
    decoder_time_upscale: Tuple[bool, ...] = (True, True)
    decoder_space_upscale: Tuple[bool, ...] = (True, True, True)
    deepen: int = 0  # tiny_wan: 1 identity conv after each sequential act
    decoder_only: bool = False
    out_range: str = "unit"  # "unit": clamp(0,1)→[-1,1]; "sym": clamp(-1,1)
    scaling_factor: float = 1.0
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None

    @classmethod
    def from_dict(cls, cfg: dict) -> "TAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "z_dim" in cfg:  # AutoencoderKLTinyWan naming
            kw["latent_channels"] = cfg["z_dim"]
        for key in ("channels", "decoder_time_upscale", "decoder_space_upscale",
                    "latents_mean", "latents_std"):
            if kw.get(key) is not None:
                kw[key] = tuple(kw[key])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        return self.patch_size * int(np.prod([2 if u else 1
                                              for u in self.decoder_space_upscale]))

    @property
    def temporal_scale(self) -> int:
        return int(np.prod([2 if u else 1 for u in self.decoder_time_upscale]))


def _act(cfg: TAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.act == "leaky_relu":
        return jax.nn.leaky_relu(x, 0.2)
    return jax.nn.relu(x)


class TConv(nnx.Module):
    """Per-frame 2D conv on [B,T,H,W,C]."""

    def __init__(self, cin: int, cout: int, k: int = 3, stride: int = 1,
                 bias: bool = True, *, dtype, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (k, k, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32)) if bias else None
        self.stride = stride
        self.pad = k // 2
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        y = jax.lax.conv_general_dilated(
            x.reshape(b * t, h, w, c).astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y.reshape(b, t, *y.shape[1:])


class TClamp(nnx.Module):
    def __call__(self, x):
        return jnp.tanh(x / 3.0) * 3.0


class TActLayer(nnx.Module):
    def __init__(self, cfg: TAEConfig):
        self._cfg = cfg

    def __call__(self, x):
        return _act(self._cfg, x)


class TUpsample(nnx.Module):
    def __init__(self, factor: int):
        self.factor = factor

    def __call__(self, x):
        if self.factor == 1:
            return x
        return jnp.repeat(jnp.repeat(x, self.factor, axis=2), self.factor, axis=3)


class TMem(nnx.Module):
    """MemBlock: conv stack over concat(x, previous-frame features)."""

    def __init__(self, cin: int, cout: int, cfg: TAEConfig, *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        self.conv_0 = TConv(cin * 2, cout, **kw)
        self.conv_2 = TConv(cout, cout, **kw)
        self.conv_4 = TConv(cout, cout, **kw)
        self.skip = TConv(cin, cout, k=1, bias=False, **kw) if cin != cout else None
        self._cfg = cfg

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        past = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
        h = jnp.concatenate([x, past], axis=-1)
        h = self.conv_0(h)
        h = self.conv_2(_act(self._cfg, h))
        h = self.conv_4(_act(self._cfg, h))
        s = self.skip(x) if self.skip is not None else x
        return _act(self._cfg, h + s)


class TPool(nnx.Module):
    def __init__(self, n_f: int, stride: int, *, dtype, rngs: nnx.Rngs):
        self.conv = TConv(n_f * stride, n_f, k=1, bias=False, dtype=dtype, rngs=rngs)
        self.stride = stride

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.stride == 1:
            return self.conv(x)
        b, t, h, w, c = x.shape
        x = x.reshape(b, t // self.stride, self.stride, h, w, c)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(b, t // self.stride, h, w,
                                                  self.stride * c)
        return self.conv(x)


class TGrow(nnx.Module):
    def __init__(self, n_f: int, stride: int, *, dtype, rngs: nnx.Rngs):
        self.conv = TConv(n_f, n_f * stride, k=1, bias=False, dtype=dtype, rngs=rngs)
        self.stride = stride

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = self.conv(x)
        if self.stride == 1:
            return y
        b, t, h, w, C = y.shape
        c = C // self.stride
        y = y.reshape(b, t, h, w, self.stride, c)
        y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, t * self.stride, h, w, c)
        return y


def _build_decoder(cfg: TAEConfig, dtype, rngs: nnx.Rngs) -> list:
    n_f = cfg.channels
    a = lambda: TActLayer(cfg)
    kw = dict(dtype=dtype, rngs=rngs)
    layers = [
        TClamp(),
        TConv(cfg.latent_channels, n_f[0], **kw),
        a(),
        TMem(n_f[0], n_f[0], cfg, **kw),
        TMem(n_f[0], n_f[0], cfg, **kw),
        TMem(n_f[0], n_f[0], cfg, **kw),
        TUpsample(2 if cfg.decoder_space_upscale[0] else 1),
        TGrow(n_f[0], 1, **kw),
        TConv(n_f[0], n_f[1], bias=False, **kw),
        TMem(n_f[1], n_f[1], cfg, **kw),
        TMem(n_f[1], n_f[1], cfg, **kw),
        TMem(n_f[1], n_f[1], cfg, **kw),
        TUpsample(2 if cfg.decoder_space_upscale[1] else 1),
        TGrow(n_f[1], 2 if cfg.decoder_time_upscale[0] else 1, **kw),
        TConv(n_f[1], n_f[2], bias=False, **kw),
        TMem(n_f[2], n_f[2], cfg, **kw),
        TMem(n_f[2], n_f[2], cfg, **kw),
        TMem(n_f[2], n_f[2], cfg, **kw),
        TUpsample(2 if cfg.decoder_space_upscale[2] else 1),
        TGrow(n_f[2], 2 if cfg.decoder_time_upscale[1] else 1, **kw),
        TConv(n_f[2], n_f[3], bias=False, **kw),
        a(),
        TConv(n_f[3], 3 * cfg.patch_size ** 2, **kw),
    ]
    if cfg.deepen:
        # tiny_wan/model.py:256 _apply_identity_deepen: after every
        # sequential-level activation, insert deepen×(3x3 conv + act). The
        # conv's channel count is the preceding layer's output width.
        out = []
        prev_c = None
        for layer in layers:
            out.append(layer)
            if isinstance(layer, TConv):
                prev_c = layer.kernel.value.shape[-1]
            elif isinstance(layer, TMem):
                prev_c = layer.conv_4.kernel.value.shape[-1]
            if isinstance(layer, TActLayer) and prev_c is not None:
                for _ in range(cfg.deepen):
                    out.append(TConv(prev_c, prev_c, bias=False, **kw))
                    out.append(a())
        layers = out
    return layers


def _build_encoder(cfg: TAEConfig, dtype, rngs: nnx.Rngs) -> list:
    kw = dict(dtype=dtype, rngs=rngs)
    a = lambda: TActLayer(cfg)
    f = 64
    return [
        TConv(3 * cfg.patch_size ** 2, f, **kw),
        a(),
        TPool(f, 2, **kw),
        TConv(f, f, stride=2, bias=False, **kw),
        TMem(f, f, cfg, **kw),
        TMem(f, f, cfg, **kw),
        TMem(f, f, cfg, **kw),
        TPool(f, 2, **kw),
        TConv(f, f, stride=2, bias=False, **kw),
        TMem(f, f, cfg, **kw),
        TMem(f, f, cfg, **kw),
        TMem(f, f, cfg, **kw),
        TPool(f, 1, **kw),
        TConv(f, f, stride=2, bias=False, **kw),
        TMem(f, f, cfg, **kw),
        TMem(f, f, cfg, **kw),
        TMem(f, f, cfg, **kw),
        TConv(f, cfg.latent_channels, **kw),
    ]


def _pixel_unshuffle(x: jnp.ndarray, p: int) -> jnp.ndarray:
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // p, p, w // p, p, c)
    # torch pixel_unshuffle channel order: (c, ph, pw)
    x = x.transpose(0, 1, 2, 4, 6, 3, 5).reshape(b, t, h // p, w // p, c * p * p)
    return x


def _pixel_shuffle(x: jnp.ndarray, p: int) -> jnp.ndarray:
    b, t, h, w, C = x.shape
    c = C // (p * p)
    x = x.reshape(b, t, h, w, c, p, p)
    x = x.transpose(0, 1, 2, 5, 3, 6, 4).reshape(b, t, h * p, w * p, c)
    return x


@vae_registry.register(
    "tae", aliases=("taehv", "TAEHV", "hunyuanvideo15.light"))
class TAEVAE(nnx.Module):
    """TAEHV tiny video autoencoder. Public API NCTHW, video in [-1,1]."""

    config_class = TAEConfig

    def __init__(self, cfg: Optional[TAEConfig] = None, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg = cfg or TAEConfig()
        self.decoder = nnx.List(_build_decoder(cfg, dtype, rngs))
        self.encoder = (None if cfg.decoder_only
                        else nnx.List(_build_encoder(cfg, dtype, rngs)))

    @property
    def frames_to_trim(self) -> int:
        return 2 ** sum(self.cfg.decoder_time_upscale) - 1

    def encode(self, video: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        """[B,3,T,H,W] in [-1,1] → latents [B,C,ceil(T/4),H/8,W/8]."""
        if self.encoder is None:
            raise NotImplementedError("decoder-only TAE (tiny_wan) cannot encode")
        x = jnp.transpose(video.astype(jnp.float32), (0, 2, 3, 4, 1))
        if self.cfg.out_range == "unit":
            x = (x + 1.0) / 2.0
        if self.cfg.patch_size > 1:
            x = _pixel_unshuffle(x, self.cfg.patch_size)
        t = x.shape[1]
        if t % 4:
            pad = jnp.repeat(x[:, -1:], 4 - t % 4, axis=1)
            x = jnp.concatenate([x, pad], axis=1)
        for layer in self.encoder:
            x = layer(x)
        z = jnp.transpose(x, (0, 4, 1, 2, 3))
        return z * self.cfg.scaling_factor

    def _denormalize(self, z: jnp.ndarray) -> jnp.ndarray:
        z = z.astype(jnp.float32) / self.cfg.scaling_factor
        if self.cfg.latents_mean is not None and self.cfg.latents_std is not None:
            mean = jnp.asarray(self.cfg.latents_mean, jnp.float32)[None, :, None, None, None]
            std = jnp.asarray(self.cfg.latents_std, jnp.float32)[None, :, None, None, None]
            z = z * std + mean
        return z

    def decode(self, z: jnp.ndarray, cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Latents [B,C,T,h,w] → video [B,3,4T-3,H,W] in [-1,1].

        ``cond`` ([B,3,4T,H,W], FlashVSR's upscaled LQ video) is prepended on
        the CHANNEL axis after a PixelShuffle3d(4,8,8) — the TCDecoder input
        (tiny_wan/model.py:286-300, z_dim 784 = 16 latent + 3·4·8·8 cond)."""
        x = jnp.transpose(self._denormalize(z), (0, 2, 3, 4, 1))
        if cond is not None:
            c = jnp.transpose(cond.astype(jnp.float32), (0, 2, 3, 4, 1))
            b, fc, hh, ww, cc = c.shape
            if fc % 4:
                head = jnp.repeat(c[:, :1], 4 - fc % 4, axis=1)
                c = jnp.concatenate([head, c], axis=1)
                fc = c.shape[1]
            # PixelShuffle3d(4,8,8), torch channel order (c, ff, hh, ww)
            c = c.reshape(b, fc // 4, 4, hh // 8, 8, ww // 8, 8, cc)
            c = c.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(
                b, fc // 4, hh // 8, ww // 8, cc * 4 * 64)
            x = jnp.concatenate([c, x], axis=-1)
        for layer in self.decoder:
            x = layer(x)
        if self.cfg.out_range == "unit":
            x = jnp.clip(x, 0.0, 1.0) * 2.0 - 1.0
        else:
            x = jnp.clip(x, -1.0, 1.0)
        if self.cfg.patch_size > 1:
            x = _pixel_shuffle(x, self.cfg.patch_size)
        x = x[:, self.frames_to_trim:]
        return jnp.transpose(x, (0, 4, 1, 2, 3))


@vae_registry.register("tiny_wan", aliases=("AutoencoderKLTinyWan", "taew2_1"))
class TinyWanVAE(TAEVAE):
    """Decoder-only identity-deepened TAEHV for Wan latents
    (src/vae/tiny_wan/model.py:310 AutoencoderKLTinyWan)."""

    config_class = TAEConfig

    def __init__(self, cfg: Optional[TAEConfig] = None, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        cfg = cfg or TAEConfig()
        cfg = dataclasses.replace(cfg, deepen=max(cfg.deepen, 1), decoder_only=True,
                                  out_range="unit")
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
