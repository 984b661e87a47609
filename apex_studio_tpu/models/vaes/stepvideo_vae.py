"""StepVideo causal video VAE in JAX/NNX.

Behavioral counterpart of the reference's ``src/vae/stepvideo/model.py``
(AutoencoderKL wrapper at :1131 + VideoEncoder :714 / VideoDecoder :948):
- causal convs with ZERO temporal head padding of ``dilation·(kt−1) +
  max(1−stride_t, 0)`` frames (CausalConv, model.py:283);
- resnet blocks whose temporal context enters as TWO ZERO FRAMES prepended
  AFTER the norm+silu (base_group_norm_with_zero_pad, model.py:545 — the
  conv then pads spatially only);
- GroupNorm statistics over the WHOLE clip (v1; ``base_group_norm`` flattens
  [B,C,T,H,W]) or per frame (v2 "spatial" mode);
- mid attention is single-head CAUSAL attention over the flattened
  (t·h·w) token sequence (AttnBlock, model.py:632 is_causal=True);
- encoder: 4 levels (ch_mult 4/8/16/16 on ch 32), spatial down at every
  non-final level, temporal too at levels 1-2 → 8× spatial / 4× temporal
  (v2 adds a pixel-(un)shuffle patchify pair for 16×/8×);
- decoder upsampling: nearest ×2 (+Res3DBlockUpsample for the temporal
  levels), output trims the first ``temporal_downsample − 1`` frames;
- frames processed in chunks of ``frame_len`` 17 → ``latent_len`` 5 (v1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry


@dataclasses.dataclass
class StepVideoVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    z_channels: int = 16
    encoder_ch: int = 32
    encoder_ch_mult: Tuple[int, ...] = (4, 8, 16, 16)
    encoder_num_res_blocks: int = 2
    encoder_down_sampling_layer: Tuple[int, ...] = (1, 2)
    decoder_ch: int = 128
    decoder_ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    decoder_num_res_blocks: int = 2
    decoder_temporal_up_layers: Tuple[int, ...] = (2, 3)
    decoder_temporal_downsample: int = 4
    scaling_factor: float = 1.0
    version: int = 1
    frame_len: int = 17
    num_groups: int = 32

    @classmethod
    def from_dict(cls, cfg: dict) -> "StepVideoVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        for key in ("encoder_ch_mult", "encoder_down_sampling_layer",
                    "decoder_ch_mult", "decoder_temporal_up_layers"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        base = 2 ** (len(self.encoder_ch_mult) - 1)
        return base * (2 if self.version == 2 else 1)

    @property
    def temporal_scale(self) -> int:
        return self.decoder_temporal_downsample * (2 if self.version == 2 else 1)


class SVConv(nnx.Module):
    """CausalConv: zero head pad of dil·(kt−1)+max(1−st,0) frames, symmetric
    spatial padding. Layout NDHWC."""

    def __init__(self, cin, cout, k=3, stride=(1, 1, 1), *, dtype, rngs):
        if isinstance(k, int):
            k = (k,) * 3
        if isinstance(stride, int):
            stride = (stride, 1, 1)
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (*k, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.k = k
        self.stride = tuple(stride)
        self.t_pad = (k[0] - 1) + max(1 - stride[0], 0)
        self.dtype = dtype

    def __call__(self, x, pad_time: bool = True):
        tp = self.t_pad if pad_time else 0
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), self.kernel.value.astype(self.dtype),
            window_strides=self.stride,
            padding=((tp, 0), (self.k[1] // 2, self.k[1] // 2),
                     (self.k[2] // 2, self.k[2] // 2)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + self.bias.value.astype(y.dtype)


class SVGroupNorm(nnx.Module):
    """GroupNorm over the whole clip (v1) or per frame (v2)."""

    def __init__(self, groups, dim, spatial: bool, *, rngs):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))
        self.groups = groups
        self.spatial = spatial

    def __call__(self, x):  # [B,T,H,W,C]
        orig = x.dtype
        b, t, h, w, c = x.shape
        g = self.groups
        if self.spatial:
            x32 = x.astype(jnp.float32).reshape(b, t, h * w, g, c // g)
            axes = (2, 4)
        else:
            x32 = x.astype(jnp.float32).reshape(b, t * h * w, g, c // g)
            axes = (1, 3)
        mean = x32.mean(axis=axes, keepdims=True)
        var = x32.var(axis=axes, keepdims=True)
        x32 = (x32 - mean) / jnp.sqrt(var + 1e-5)
        x32 = x32.reshape(x.shape) * self.weight.value + self.bias.value
        return x32.astype(orig)


def _zero_pad_norm(x, norm: SVGroupNorm, act=True, pad: int = 2):
    """norm(+silu) then prepend ``pad`` zero FRAMES (model.py:545)."""
    y = norm(x)
    if act:
        y = jax.nn.silu(y)
    z = jnp.zeros((y.shape[0], pad, *y.shape[2:]), y.dtype)
    return jnp.concatenate([z, y], axis=1)


class SVResnet(nnx.Module):
    def __init__(self, cin, cout, groups, spatial, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        self.norm1 = SVGroupNorm(groups, cin, spatial, rngs=rngs)
        self.conv1 = SVConv(cin, cout, **kw)
        self.norm2 = SVGroupNorm(groups, cout, spatial, rngs=rngs)
        self.conv2 = SVConv(cout, cout, **kw)
        self.nin_shortcut = (SVConv(cin, cout, k=1, **kw) if cin != cout else None)

    def __call__(self, x):
        h = _zero_pad_norm(x, self.norm1)
        h = self.conv1(h, pad_time=False)  # zero frames ARE the temporal pad
        s = self.nin_shortcut(x) if self.nin_shortcut is not None else x
        h = _zero_pad_norm(h, self.norm2)
        return self.conv2(h, pad_time=False) + s


class SVAttn(nnx.Module):
    """Single-head CAUSAL attention over flattened (t·h·w) tokens."""

    def __init__(self, dim, groups, spatial, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        self.norm = SVGroupNorm(groups, dim, spatial, rngs=rngs)
        self.q = SVConv(dim, dim, k=1, **kw)
        self.k = SVConv(dim, dim, k=1, **kw)
        self.v = SVConv(dim, dim, k=1, **kw)
        self.proj_out = SVConv(dim, dim, k=1, **kw)

    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = self.norm(x)
        q = self.q(y).reshape(b, t * h * w, c)
        k = self.k(y).reshape(b, t * h * w, c)
        v = self.v(y).reshape(b, t * h * w, c)
        s = t * h * w
        scores = (q @ k.swapaxes(1, 2)).astype(jnp.float32) / np.sqrt(c)
        causal = np.triu(np.full((s, s), -np.inf, np.float32), 1)
        attn = jax.nn.softmax(scores + causal[None], axis=-1).astype(v.dtype)
        out = (attn @ v).reshape(b, t, h, w, c)
        return self.proj_out(out) + x


class SVUpResBlock(nnx.Module):
    """Res3DBlockUpsample (model.py:853): conv→norm ×2, silu(h + shortcut),
    + outer residual."""

    def __init__(self, dim, groups, spatial, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        self.conv1 = SVConv(dim, dim, **kw)
        self.norm1 = SVGroupNorm(groups, dim, spatial, rngs=rngs)
        self.conv2 = SVConv(dim, dim, **kw)
        self.norm2 = SVGroupNorm(groups, dim, spatial, rngs=rngs)

    def __call__(self, x):
        residual = x
        h = jax.nn.silu(self.norm1(self.conv1(x)))
        h = self.norm2(self.conv2(h))
        h = jax.nn.silu(h + x)
        return h + residual


class SVEncoder(nnx.Module):
    def __init__(self, cfg: StepVideoVAEConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        g, sp = cfg.num_groups, cfg.version == 2
        ch = cfg.encoder_ch
        mult = cfg.encoder_ch_mult
        self.conv_in = SVConv(cfg.in_channels, ch, **kw)
        in_mult = (1,) + tuple(mult)
        levels = []
        for i in range(len(mult)):
            cin, cout = ch * in_mult[i], ch * mult[i]
            blocks = [SVResnet(cin if j == 0 else cout, cout, g, sp, **kw)
                      for j in range(cfg.encoder_num_res_blocks)]
            down = None
            if i != len(mult) - 1:
                if i in cfg.encoder_down_sampling_layer:
                    down = SVConv(cout, cout, stride=(2, 2, 2), **kw)
                else:  # spatial-only: 2D conv stride 2, asym pad right/bottom
                    down = SVConv(cout, cout, k=(1, 3, 3), stride=(1, 2, 2), **kw)
            parts = [nnx.List(blocks)] + ([down] if down is not None else [])
            levels.append(nnx.List(parts))
        self.down = nnx.List(levels)
        bi = ch * mult[-1]
        self.mid_block_1 = SVResnet(bi, bi, g, sp, **kw)
        self.mid_attn_1 = SVAttn(bi, g, sp, **kw)
        self.mid_block_2 = SVResnet(bi, bi, g, sp, **kw)
        self.norm_out = SVGroupNorm(g, bi, sp, rngs=rngs)
        self.conv_out = SVConv(bi, 2 * cfg.z_channels, **kw)
        self._n_down = len(cfg.encoder_down_sampling_layer)

    def __call__(self, x):
        h = self.conv_in(x)
        for level in self.down:
            for blk in level[0]:
                h = blk(h)
            if len(level) > 1:
                down = level[1]
                if down.stride[0] == 2:
                    h = down(h)
                else:
                    # asymmetric right/bottom pad like the 2D reference conv
                    h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
                    y = jax.lax.conv_general_dilated(
                        h.astype(down.dtype), down.kernel.value.astype(down.dtype),
                        window_strides=down.stride, padding=((0, 0),) * 3,
                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                    h = y + down.bias.value.astype(y.dtype)
        h = self.mid_block_2(self.mid_attn_1(self.mid_block_1(h)))
        h = _zero_pad_norm(h, self.norm_out)
        return self.conv_out(h, pad_time=False)


class SVDecoder(nnx.Module):
    def __init__(self, cfg: StepVideoVAEConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        g, sp = cfg.num_groups, cfg.version == 2
        ch = cfg.decoder_ch
        mult = cfg.decoder_ch_mult
        n = len(mult)
        block_in = ch * mult[-1]
        self.conv_in = SVConv(cfg.z_channels, block_in, **kw)
        self.mid_block_1 = SVResnet(block_in, block_in, g, sp, **kw)
        self.mid_attn_1 = SVAttn(block_in, g, sp, **kw)
        self.mid_block_2 = SVResnet(block_in, block_in, g, sp, **kw)
        ups = [None] * n
        for i in reversed(range(n)):
            cout = ch * mult[i]
            blocks = [SVResnet(block_in if j == 0 else cout, cout, g, sp, **kw)
                      for j in range(cfg.decoder_num_res_blocks + 1)]
            block_in = cout
            parts = [nnx.List(blocks)]
            if i != 0:
                if i in cfg.decoder_temporal_up_layers:
                    parts.append(SVUpResBlock(block_in, g, sp, **kw))
                else:
                    parts.append(SVConv(block_in, block_in, k=(1, 3, 3), **kw))
            ups[i] = nnx.List(parts)
        self.up = nnx.List(ups)
        self._t_up = set(cfg.decoder_temporal_up_layers)
        self.norm_out = SVGroupNorm(g, block_in, sp, rngs=rngs)
        self.conv_out = SVConv(block_in, cfg.out_channels, **kw)
        self.cfg = cfg

    def __call__(self, z):
        h = self.conv_in(z)
        h = self.mid_block_2(self.mid_attn_1(self.mid_block_1(h)))
        for i in reversed(range(len(self.up))):
            level = self.up[i]
            for blk in level[0]:
                h = blk(h)
            if len(level) > 1:
                if i in self._t_up:  # nearest 2x on (t,h,w) + res upsample conv
                    h = jnp.repeat(jnp.repeat(jnp.repeat(h, 2, 1), 2, 2), 2, 3)
                    h = level[1](h)
                else:  # spatial-only nearest 2x + per-frame conv
                    h = jnp.repeat(jnp.repeat(h, 2, 2), 2, 3)
                    h = level[1](h, pad_time=True)
        h = _zero_pad_norm(h, self.norm_out)
        h = self.conv_out(h, pad_time=False)
        return h[:, self.cfg.decoder_temporal_downsample - 1:]


@vae_registry.register(
    "stepvideo", aliases=("stepvideo.base", "StepVideoAutoencoderKL"))
class StepVideoVAE(nnx.Module):
    """Public API NCTHW like every VAE in this package."""

    config_class = StepVideoVAEConfig

    def __init__(self, cfg: Optional[StepVideoVAEConfig] = None, *,
                 dtype=jnp.float32, param_dtype=jnp.float32, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg = cfg or StepVideoVAEConfig()
        kw = dict(dtype=dtype, rngs=rngs)
        self.encoder = SVEncoder(cfg, **kw)
        self.decoder = SVDecoder(cfg, **kw)

    def encode(self, video: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        """[B,3,T,H,W] in [-1,1] (T ≡ 1 mod temporal_scale within each
        17-frame chunk; the engine chunks) → scaled latents [B,z,T',h,w]."""
        x = jnp.transpose(video.astype(jnp.float32), (0, 2, 3, 4, 1))
        moments = self.encoder(x)
        mean = moments[..., :self.cfg.z_channels]
        z = jnp.transpose(mean, (0, 4, 1, 2, 3))
        return z * self.cfg.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        zz = jnp.transpose(z.astype(jnp.float32) / self.cfg.scaling_factor,
                           (0, 2, 3, 4, 1))
        x = self.decoder(zz)
        return jnp.transpose(x, (0, 4, 1, 2, 3))
