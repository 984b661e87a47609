"""LTX-2 video VAE in JAX/NNX.

Counterpart of the reference's ``src/vae/ltx2/model.py:1009``
(AutoencoderKLLTX2Video). Same primitive semantics as our LTX-1 VAE
(causal convs, pixel-norm resnets, space↔depth samplers with group-mean /
repeat residuals — ltx_vae.py), with the LTX-2 topology:

- encoder (model.py:683): 4×4 spatial patchify → conv_in → four down blocks
  (resnets + {spatial, temporal, spatiotemporal, spatiotemporal} residual
  downsamplers with channel growth 256→512→1024→2048) → mid → conv_out to
  latent+1 channels, last channel expanded as the shared (uniform) logvar
- decoder (model.py:836): conv_in z→1024 → mid → three symmetric causal up
  blocks (residual ×2 upsample with upscale_factor 2 halving channels,
  then resnets) → conv_out → 4×4 unpatchify; overall 8× temporal / 32×
  spatial expansion (the DiT's vae_scale_factors)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.models.vaes.ltx_vae import (
    CausalConv3d,
    ChannelNorm,
    DepthToSpaceUpsample,
    ResnetBlock3D,
    SpaceToDepthDownsample,
    _patchify,
    _unpatchify,
)

_STRIDES = {
    "spatial": (1, 2, 2),
    "temporal": (2, 1, 1),
    "spatiotemporal": (2, 2, 2),
}


@dataclass
class LTX2VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    block_out_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    decoder_block_out_channels: Tuple[int, ...] = (256, 512, 1024)
    layers_per_block: Tuple[int, ...] = (4, 6, 6, 2, 2)
    decoder_layers_per_block: Tuple[int, ...] = (5, 5, 5, 5)
    spatio_temporal_scaling: Tuple[bool, ...] = (True, True, True, True)
    decoder_spatio_temporal_scaling: Tuple[bool, ...] = (True, True, True)
    decoder_inject_noise: Tuple[bool, ...] = (False, False, False, False)
    downsample_type: Tuple[str, ...] = ("spatial", "temporal",
                                        "spatiotemporal", "spatiotemporal")
    upsample_residual: Tuple[bool, ...] = (True, True, True)
    upsample_factor: Tuple[int, ...] = (2, 2, 2)
    patch_size: int = 4
    patch_size_t: int = 1
    scaling_factor: float = 1.0
    encoder_causal: bool = True
    decoder_causal: bool = True
    encoder_spatial_padding_mode: str = "zeros"
    decoder_spatial_padding_mode: str = "reflect"
    latents_mean: Optional[List[float]] = None
    latents_std: Optional[List[float]] = None

    @property
    def spatial_compression_ratio(self) -> int:
        spatial = sum(1 for t in self.downsample_type
                      if t in ("spatial", "spatiotemporal"))
        return self.patch_size * 2 ** spatial

    @property
    def temporal_compression_ratio(self) -> int:
        temporal = sum(1 for t in self.downsample_type
                       if t in ("temporal", "spatiotemporal"))
        return self.patch_size_t * 2 ** temporal

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LTX2VAEConfig":
        import dataclasses

        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) and k != "latents_mean"
                  and k != "latents_std" else v)
              for k, v in d.items() if k in known}
        return cls(**kw)


class LTX2Encoder(nnx.Module):
    def __init__(self, cfg: LTX2VAEConfig, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg
        sp = cfg.encoder_spatial_padding_mode
        # the encoder STARTS at latent width: conv_in outputs latent_channels,
        # and the first down block widens from there (model.py:742-749)
        ch = cfg.latent_channels
        self.conv_in = CausalConv3d(cfg.in_channels * cfg.patch_size ** 2, ch,
                                    spatial_padding_mode=sp, dtype=dtype, rngs=rngs)
        blocks = []
        for i, out in enumerate(cfg.block_out_channels):
            resnets = nnx.List([
                ResnetBlock3D(ch, ch, norm="pixel_norm", spatial_padding_mode=sp,
                              dtype=dtype, rngs=rngs)
                for _ in range(cfg.layers_per_block[i])
            ])
            down = None
            if cfg.spatio_temporal_scaling[i]:
                down = SpaceToDepthDownsample(
                    ch, out, _STRIDES[cfg.downsample_type[i]],
                    spatial_padding_mode=sp, dtype=dtype, rngs=rngs)
                ch = out
            blocks.append(nnx.List([resnets, down]))
        self.down_blocks = nnx.List(blocks)
        self.mid_resnets = nnx.List([
            ResnetBlock3D(ch, ch, norm="pixel_norm", spatial_padding_mode=sp,
                          dtype=dtype, rngs=rngs)
            for _ in range(cfg.layers_per_block[-1])
        ])
        self.norm_out = ChannelNorm("pixel_norm", ch, rngs=rngs)
        self.conv_out = CausalConv3d(ch, cfg.latent_channels + 1,
                                     spatial_padding_mode=sp, dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        causal = self.cfg.encoder_causal
        x = _patchify(x, self.cfg.patch_size)
        x = self.conv_in(x, causal=causal)
        for resnets, down in self.down_blocks:
            for rb in resnets:
                x = rb(x, causal=causal)
            if down is not None:
                x = down(x, causal=causal)
        for rb in self.mid_resnets:
            x = rb(x, causal=causal)
        x = nnx.silu(self.norm_out(x))
        x = self.conv_out(x, causal=causal)
        # uniform logvar: last channel repeated for every latent channel
        # (model.py:828)
        last = jnp.repeat(x[:, -1:], x.shape[1] - 2, axis=1)
        return jnp.concatenate([x, last], axis=1)


class LTX2Decoder(nnx.Module):
    def __init__(self, cfg: LTX2VAEConfig, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg
        sp = cfg.decoder_spatial_padding_mode
        chans = tuple(reversed(cfg.decoder_block_out_channels))  # deepest first
        # the reference reverses the per-block lists wholesale: mid uses the
        # LAST entries, up block i the (len-2-i)-th (model.py:888-928)
        layers_rev = tuple(reversed(cfg.decoder_layers_per_block))
        inject_rev = tuple(reversed(cfg.decoder_inject_noise))
        residual = tuple(reversed(cfg.upsample_residual))
        factor = tuple(reversed(cfg.upsample_factor))
        scaling = tuple(reversed(cfg.decoder_spatio_temporal_scaling))
        ch = chans[0]
        self.conv_in = CausalConv3d(cfg.latent_channels, ch,
                                    spatial_padding_mode=sp, dtype=dtype, rngs=rngs)
        self.mid_resnets = nnx.List([
            ResnetBlock3D(ch, ch, norm="pixel_norm",
                          inject_noise=inject_rev[0],
                          spatial_padding_mode=sp, dtype=dtype, rngs=rngs)
            for _ in range(layers_rev[0])
        ])
        blocks = []
        for i in range(len(chans)):
            out = chans[i] // factor[i]
            up = None
            if scaling[i]:
                up = DepthToSpaceUpsample(
                    ch, (2, 2, 2), residual=residual[i],
                    out_channels_reduction_factor=factor[i],
                    spatial_padding_mode=sp, dtype=dtype, rngs=rngs)
                ch = out  # depth-to-space leaves ch // upscale_factor
            resnets = nnx.List([
                ResnetBlock3D(ch, ch, norm="pixel_norm",
                              inject_noise=inject_rev[min(i + 1, len(inject_rev) - 1)],
                              spatial_padding_mode=sp, dtype=dtype, rngs=rngs)
                for _ in range(layers_rev[i + 1])
            ])
            blocks.append(nnx.List([up, resnets]))
        self.up_blocks = nnx.List(blocks)
        self.norm_out = ChannelNorm("pixel_norm", ch, rngs=rngs)
        self.conv_out = CausalConv3d(ch, cfg.out_channels * cfg.patch_size ** 2,
                                     spatial_padding_mode=sp, dtype=dtype, rngs=rngs)

    def __call__(self, z: jnp.ndarray, noise_key=None) -> jnp.ndarray:
        causal = self.cfg.decoder_causal
        x = self.conv_in(z, causal=causal)
        for i, rb in enumerate(self.mid_resnets):
            nk = None if noise_key is None else jax.random.fold_in(noise_key, i)
            x = rb(x, causal=causal, noise_key=nk)
        for j, (up, resnets) in enumerate(self.up_blocks):
            if up is not None:
                x = up(x, causal=causal)
            for i, rb in enumerate(resnets):
                nk = (None if noise_key is None
                      else jax.random.fold_in(noise_key, 100 * (j + 1) + i))
                x = rb(x, causal=causal, noise_key=nk)
        x = nnx.silu(self.norm_out(x))
        x = self.conv_out(x, causal=causal)
        return _unpatchify(x, self.cfg.patch_size)


@vae_registry.register("ltx2.base", aliases=("ltx2", "ltx2_vae", "AutoencoderKLLTX2Video"))
class AutoencoderKLLTX2(nnx.Module):
    config_class = LTX2VAEConfig

    def __init__(self, cfg: LTX2VAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.encoder = LTX2Encoder(cfg, dtype=dtype, rngs=rngs)
        self.decoder = LTX2Decoder(cfg, dtype=dtype, rngs=rngs)

    @property
    def spatial_compression_ratio(self) -> int:
        return self.cfg.spatial_compression_ratio

    @property
    def temporal_compression_ratio(self) -> int:
        return self.cfg.temporal_compression_ratio

    def _mean_std(self):
        if self.cfg.latents_mean is None:
            return None, None
        m = jnp.asarray(self.cfg.latents_mean, jnp.float32).reshape(1, -1, 1, 1, 1)
        s = jnp.asarray(self.cfg.latents_std, jnp.float32).reshape(1, -1, 1, 1, 1)
        return m, s

    def encode(self, video: jnp.ndarray, sample: bool = False, noise=None) -> jnp.ndarray:
        moments = self.encoder(video)
        mean, logvar = jnp.split(moments, 2, axis=1)
        z = mean
        if sample and noise is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0)) * noise
        m, s = self._mean_std()
        if m is not None:
            z = (z - m) / s
        return z

    def decode(self, z: jnp.ndarray, noise_key=None) -> jnp.ndarray:
        m, s = self._mean_std()
        if m is not None:
            z = z * s + m
        return self.decoder(z, noise_key=noise_key)
