"""Mochi-1 video VAE (decoder) in JAX/NNX.

Behavioral counterpart of the reference's ``src/vae/mochi/`` (diffusers
AutoencoderKLMochi, 1,275 LoC): 12 latent channels, 8× spatial and 6×
temporal expansion on decode (per-stage temporal expansions 1·2·3, spatial
2·2·2), realized as depth-to-space/time pixel-shuffle convs:

- conv_in: 12 → deepest width, causal in time
- per stage: N GroupNorm+silu causal-conv resnets, then an expansion conv
  C_in → C_out·t_exp·s_exp² whose output unshuffles into (t·t_exp,
  h·s_exp, w·s_exp) — first output frame keeps causal alignment by cropping
  the (t_exp−1) leading phantom frames
- out: GroupNorm → silu → conv to RGB
- latents are denormalized per channel (latents_mean/std) before decoding

Mochi's engines only decode (t2v); ``encode`` raises until a v2v-style
engine needs it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import nnx

from apex_studio_tpu.models.registry import vae_registry
from apex_studio_tpu.models.vaes.cogvideox_vae import CogResnetBlock3D, GroupNormCh
from apex_studio_tpu.models.vaes.wan_vae import CausalConv3d


@dataclasses.dataclass
class MochiVAEConfig:
    latent_channels: int = 12
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 768)
    layers_per_block: Tuple[int, ...] = (3, 3, 4, 6)
    temporal_expansions: Tuple[int, ...] = (1, 2, 3)
    spatial_expansions: Tuple[int, ...] = (2, 2, 2)
    norm_num_groups: int = 32
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None

    @classmethod
    def from_dict(cls, cfg: dict) -> "MochiVAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        for key in ("block_out_channels", "layers_per_block", "temporal_expansions",
                    "spatial_expansions", "latents_mean", "latents_std"):
            if key in kw and kw[key] is not None:
                kw[key] = tuple(kw[key])
        return cls(**kw)

    @property
    def spatial_scale(self) -> int:
        s = 1
        for e in self.spatial_expansions:
            s *= e
        return s

    @property
    def temporal_scale(self) -> int:
        t = 1
        for e in self.temporal_expansions:
            t *= e
        return t


class MochiUpBlock3D(nnx.Module):
    """Resnets then a depth-to-space/time expansion conv."""

    def __init__(self, cin: int, cout: int, num_layers: int, t_exp: int, s_exp: int,
                 groups: int, *, dtype, rngs: nnx.Rngs):
        self.resnets = nnx.List(
            [CogResnetBlock3D(cin, cin, groups, dtype=dtype, rngs=rngs) for _ in range(num_layers)]
        )
        self.proj = CausalConv3d(
            cin, cout * t_exp * s_exp * s_exp, kernel=1, padding=0, dtype=dtype, rngs=rngs
        )
        self.t_exp, self.s_exp, self.cout = t_exp, s_exp, cout

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for r in self.resnets:
            x = r(x)
        x = self.proj(x)  # [B, T, H, W, cout·te·se²]
        b, t, h, w, _ = x.shape
        te, se, c = self.t_exp, self.s_exp, self.cout
        x = x.reshape(b, t, h, w, te, se, se, c)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, t * te, h * se, w * se, c)
        if te > 1:
            # causal alignment: drop the phantom frames ahead of frame 0
            x = x[:, te - 1:]
        return x


@vae_registry.register("mochi.base", aliases=("mochi", "AutoencoderKLMochi"))
class AutoencoderKLMochi(nnx.Module):
    config_class = MochiVAEConfig

    def __init__(self, cfg: MochiVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        g = cfg.norm_num_groups
        chans = tuple(reversed(cfg.block_out_channels))  # deepest first
        layers = tuple(reversed(cfg.layers_per_block))
        t_exps = tuple(reversed(cfg.temporal_expansions))
        s_exps = tuple(reversed(cfg.spatial_expansions))
        self.conv_in = CausalConv3d(cfg.latent_channels, chans[0], dtype=dtype, rngs=rngs)
        self.mid_resnets = nnx.List(
            [CogResnetBlock3D(chans[0], chans[0], g, dtype=dtype, rngs=rngs)
             for _ in range(layers[0])]
        )
        ups = []
        for i in range(len(chans) - 1):
            ups.append(
                MochiUpBlock3D(
                    chans[i], chans[i + 1], layers[i + 1], t_exps[i], s_exps[i], g,
                    dtype=dtype, rngs=rngs,
                )
            )
        self.up_blocks = nnx.List(ups)
        self.norm_out = GroupNormCh(g, chans[-1], rngs=rngs)
        self.conv_out = CausalConv3d(chans[-1], cfg.out_channels, dtype=dtype, rngs=rngs)

    def _mean_std(self):
        if self.cfg.latents_mean is None:
            return None, None
        mean = jnp.asarray(self.cfg.latents_mean, jnp.float32).reshape(1, -1, 1, 1, 1)
        std = jnp.asarray(self.cfg.latents_std, jnp.float32).reshape(1, -1, 1, 1, 1)
        return mean, std

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """model-space latents [B,12,T',h,w] → [B,3,T,H,W] in [-1,1]."""
        m, s = self._mean_std()
        if m is not None:
            z = z * s + m
        x = jnp.transpose(z, (0, 2, 3, 4, 1))
        x = self.conv_in(x)
        for r in self.mid_resnets:
            x = r(x)
        for blk in self.up_blocks:
            x = blk(x)
        out = self.conv_out(nnx.silu(self.norm_out(x)))
        return jnp.transpose(out, (0, 4, 1, 2, 3))

    def encode(self, video: jnp.ndarray, **_: object) -> jnp.ndarray:
        raise NotImplementedError(
            "Mochi ships decode-only here (its engines are t2v); the encoder "
            "lands with a Mochi v2v engine."
        )
