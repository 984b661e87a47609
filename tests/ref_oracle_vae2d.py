"""Faithful stand-ins for diffusers' 2D VAE Encoder/Decoder (the SD/Flux
AutoencoderKL building blocks) so the reference's `src/vae/auto/model.py`
imports and runs as an oracle. Semantics follow diffusers
models/autoencoders/vae.py + unets/unet_2d_blocks.py exactly for the
configuration every Apex manifest uses (DownEncoderBlock2D/UpDecoderBlock2D,
silu, group norm, mid block with one attention)."""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.ref_oracle import Attention


class ResnetBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels=None, groups=32, eps=1e-6):
        super().__init__()
        out_channels = out_channels or in_channels
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps, affine=True)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps, affine=True)
        self.dropout = nn.Dropout(0.0)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.nonlinearity = nn.SiLU()
        self.conv_shortcut = (nn.Conv2d(in_channels, out_channels, 1)
                              if in_channels != out_channels else None)

    def forward(self, x, temb=None):
        h = self.conv1(self.nonlinearity(self.norm1(x)))
        h = self.conv2(self.dropout(self.nonlinearity(self.norm2(h))))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Downsample2D(nn.Module):
    def __init__(self, channels, out_channels=None):
        super().__init__()
        self.conv = nn.Conv2d(channels, out_channels or channels, 3,
                              stride=2, padding=0)

    def forward(self, x):
        x = F.pad(x, (0, 1, 0, 1), mode="constant", value=0)
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, channels, out_channels=None):
        super().__init__()
        self.conv = nn.Conv2d(channels, out_channels or channels, 3, padding=1)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2.0, mode="nearest")
        return self.conv(x)


class DownEncoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers, groups,
                 add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_channels if i == 0 else out_channels,
                           out_channels, groups) for i in range(num_layers)])
        self.downsamplers = (nn.ModuleList([Downsample2D(out_channels)])
                             if add_downsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            for d in self.downsamplers:
                x = d(x)
        return x


class UpDecoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers, groups,
                 add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_channels if i == 0 else out_channels,
                           out_channels, groups) for i in range(num_layers)])
        self.upsamplers = (nn.ModuleList([Upsample2D(out_channels)])
                           if add_upsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            for u in self.upsamplers:
                x = u(x)
        return x


class UNetMidBlock2D(nn.Module):
    def __init__(self, in_channels, groups, add_attention=True):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock2D(in_channels, groups=groups),
                                      ResnetBlock2D(in_channels, groups=groups)])
        self.attentions = nn.ModuleList([
            Attention(in_channels, heads=1, dim_head=in_channels, bias=True,
                      norm_num_groups=groups, residual_connection=True,
                      eps=1e-6, out_bias=True)
            if add_attention else None
        ])

    def forward(self, x):
        x = self.resnets[0](x)
        if self.attentions[0] is not None:
            b, c, h, w = x.shape
            x = self.attentions[0](x)
        return self.resnets[1](x)


class Encoder(nn.Module):
    def __init__(self, in_channels=3, out_channels=4,
                 down_block_types=("DownEncoderBlock2D",),
                 block_out_channels=(64,), layers_per_block=2, act_fn="silu",
                 norm_num_groups=32, double_z=True,
                 mid_block_add_attention=True):
        super().__init__()
        assert all(t == "DownEncoderBlock2D" for t in down_block_types)
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        ch = block_out_channels[0]
        for i, out_ch in enumerate(block_out_channels):
            last = i == len(block_out_channels) - 1
            self.down_blocks.append(DownEncoderBlock2D(
                ch, out_ch, layers_per_block, norm_num_groups,
                add_downsample=not last))
            ch = out_ch
        self.mid_block = UNetMidBlock2D(ch, norm_num_groups,
                                        mid_block_add_attention)
        self.conv_norm_out = nn.GroupNorm(norm_num_groups, ch, eps=1e-6)
        self.conv_act = nn.SiLU()
        conv_out_ch = 2 * out_channels if double_z else out_channels
        self.conv_out = nn.Conv2d(ch, conv_out_ch, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(self.conv_act(self.conv_norm_out(x)))


class Decoder(nn.Module):
    def __init__(self, in_channels=4, out_channels=3,
                 up_block_types=("UpDecoderBlock2D",),
                 block_out_channels=(64,), layers_per_block=2,
                 norm_num_groups=32, act_fn="silu",
                 mid_block_add_attention=True):
        super().__init__()
        assert all(t == "UpDecoderBlock2D" for t in up_block_types)
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[-1], 3,
                                 padding=1)
        self.mid_block = UNetMidBlock2D(block_out_channels[-1],
                                        norm_num_groups,
                                        mid_block_add_attention)
        self.up_blocks = nn.ModuleList()
        rev = list(reversed(block_out_channels))
        ch = rev[0]
        for i, out_ch in enumerate(rev):
            last = i == len(rev) - 1
            self.up_blocks.append(UpDecoderBlock2D(
                ch, out_ch, layers_per_block + 1, norm_num_groups,
                add_upsample=not last))
            ch = out_ch
        self.conv_norm_out = nn.GroupNorm(norm_num_groups, ch, eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(ch, out_channels, 3, padding=1)

    def forward(self, z):
        z = self.conv_in(z)
        z = self.mid_block(z)
        for blk in self.up_blocks:
            z = blk(z)
        return self.conv_out(self.conv_act(self.conv_norm_out(z)))


def install() -> None:
    import sys

    mod = sys.modules.get("diffusers.models.autoencoders.autoencoder_kl")
    if mod is None:
        import types

        mod = types.ModuleType("diffusers.models.autoencoders.autoencoder_kl")
        sys.modules["diffusers.models.autoencoders.autoencoder_kl"] = mod
    from tests.ref_oracle import (
        AutoencoderKLOutput,
        AutoencoderMixin,
        DecoderOutput,
        DiagonalGaussianDistribution,
    )

    mod.AutoencoderMixin = AutoencoderMixin
    mod.Decoder = Decoder
    mod.DecoderOutput = DecoderOutput
    mod.DiagonalGaussianDistribution = DiagonalGaussianDistribution
    mod.Encoder = Encoder
    mod.AutoencoderKLOutput = AutoencoderKLOutput
