"""SeedVR2 causal video VAE: torch-oracle numeric parity + shape/causality.

The oracle below implements the reference's exact semantics
(src/vae/seedvr/model.py + modules/causal_inflation_lib.py) with plain torch:
first-frame-replication causal convs, per-frame GroupNorm, MAGViT pixel-shuffle
upsampling with remove_head, asymmetric downsample padding, per-frame
single-head mid attention. Weights flow through the real converter
(``seedvr_vae``) so a wrong transpose/padding/rearrange in either the model or
the converter fails the 1e-4 comparison.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from apex_studio_tpu.models.vaes.seedvr_vae import SeedVRVAE, SeedVRVAEConfig

TINY = dict(
    in_channels=3, out_channels=3, latent_channels=4,
    block_out_channels=(8, 8, 16), layers_per_block=1, norm_num_groups=4,
    scaling_factor=0.9152, temporal_scale_num=1,
    use_quant_conv=False, use_post_quant_conv=False,
    spatial_downsample_factor=4, temporal_downsample_factor=2,
)


# --------------------------------------------------------------------------
# Torch oracle (reference semantics)
# --------------------------------------------------------------------------

def _extend_head(x, times):
    if times == 0:
        return x
    return torch.cat([x[:, :, :1].repeat(1, 1, times, 1, 1), x], dim=2)


class OConv(nn.Conv3d):
    """Causal conv: head extension by first-frame replication; spatial padding
    symmetric (resnets) or right/bottom-only (downsamplers)."""

    def __init__(self, cin, cout, k=3, stride=1, pad_t=1, sp=1, asym=False):
        super().__init__(cin, cout, k, stride=stride, padding=0)
        self.pad_t, self.sp, self.asym = pad_t, sp, asym

    def forward(self, x):
        x = _extend_head(x, 2 * self.pad_t)
        if self.asym:
            x = F.pad(x, (0, 1, 0, 1))
        elif self.sp:
            x = F.pad(x, (self.sp,) * 4)
        return self._conv_forward(x, self.weight, self.bias)


def _norm_pf(gn, x):
    b, c, t, h, w = x.shape
    y = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    y = gn(y)
    return y.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)


class OResnet(nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = OConv(cin, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = OConv(cout, cout)
        if cin != cout:
            self.conv_shortcut = OConv(cin, cout, k=1, pad_t=0, sp=0)
        else:
            self.conv_shortcut = None

    def forward(self, x):
        h = self.conv1(F.silu(_norm_pf(self.norm1, x)))
        h = self.conv2(F.silu(_norm_pf(self.norm2, h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class OAttn(nn.Module):
    def __init__(self, dim, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x):
        b, c, t, h, w = x.shape
        y = _norm_pf(self.group_norm, x)
        y = y.permute(0, 2, 3, 4, 1).reshape(b * t, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = (q @ k.transpose(1, 2)).float() * c ** -0.5
        y = (attn.softmax(-1).to(v.dtype) @ v)
        y = self.to_out[0](y)
        y = y.reshape(b, t, h, w, c).permute(0, 4, 1, 2, 3)
        return x + y


class ODown(nn.Module):
    def __init__(self, dim, temporal):
        super().__init__()
        rt = 2 if temporal else 1
        self.conv = OConv(dim, dim, k=(3 if temporal else 1, 3, 3),
                          stride=(rt, 2, 2), pad_t=1 if temporal else 0,
                          sp=0, asym=True)

    def forward(self, x):
        return self.conv(x)


class OUp(nn.Module):
    def __init__(self, dim, temporal):
        super().__init__()
        self.rt = 2 if temporal else 1
        self.temporal = temporal
        self.upscale_conv = nn.Conv3d(dim, dim * 4 * self.rt, 1)
        self.conv = OConv(dim, dim)

    def forward(self, x):
        y = self.upscale_conv(x)
        b, C, f, h, w = y.shape
        c = C // (4 * self.rt)
        y = y.view(b, 2, 2, self.rt, c, f, h, w)
        y = y.permute(0, 4, 5, 3, 6, 1, 7, 2).reshape(b, c, f * self.rt, 2 * h, 2 * w)
        if self.temporal:
            y = torch.cat([y[:, :, :1], y[:, :, 2:]], dim=2)
        return self.conv(y)


class OMid(nn.Module):
    def __init__(self, dim, groups):
        super().__init__()
        self.resnets = nn.ModuleList([OResnet(dim, dim, groups),
                                      OResnet(dim, dim, groups)])
        self.attentions = nn.ModuleList([OAttn(dim, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class ODownBlock(nn.Module):
    def __init__(self, cin, cout, layers, groups, down, temporal):
        super().__init__()
        self.resnets = nn.ModuleList(
            [OResnet(cin if j == 0 else cout, cout, groups) for j in range(layers)])
        self.downsamplers = nn.ModuleList([ODown(cout, temporal)]) if down else None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        return self.downsamplers[0](x) if self.downsamplers else x


class OUpBlock(nn.Module):
    def __init__(self, cin, cout, layers, groups, up, temporal):
        super().__init__()
        self.resnets = nn.ModuleList(
            [OResnet(cin if j == 0 else cout, cout, groups) for j in range(layers)])
        self.upsamplers = nn.ModuleList([OUp(cout, temporal)]) if up else None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        return self.upsamplers[0](x) if self.upsamplers else x


class OEncoder(nn.Module):
    def __init__(self, c):
        super().__init__()
        ch, g, n = c["block_out_channels"], c["norm_num_groups"], len(c["block_out_channels"])
        self.conv_in = OConv(c["in_channels"], ch[0])
        blocks, cin = [], ch[0]
        for i in range(n):
            blocks.append(ODownBlock(cin, ch[i], c["layers_per_block"], g,
                                     down=i < n - 1,
                                     temporal=i >= n - c["temporal_scale_num"] - 1))
            cin = ch[i]
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = OMid(ch[-1], g)
        self.conv_norm_out = nn.GroupNorm(g, ch[-1], eps=1e-6)
        self.conv_out = OConv(ch[-1], 2 * c["latent_channels"])

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(_norm_pf(self.conv_norm_out, x)))


class ODecoder(nn.Module):
    def __init__(self, c):
        super().__init__()
        ch = list(reversed(c["block_out_channels"]))
        g, n = c["norm_num_groups"], len(ch)
        self.conv_in = OConv(c["latent_channels"], ch[0])
        self.mid_block = OMid(ch[0], g)
        blocks, cin = [], ch[0]
        for i in range(n):
            blocks.append(OUpBlock(cin, ch[i], c["layers_per_block"] + 1, g,
                                   up=i < n - 1,
                                   temporal=i < c["temporal_scale_num"]))
            cin = ch[i]
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(g, ch[-1], eps=1e-6)
        self.conv_out = OConv(ch[-1], c["out_channels"])

    def forward(self, x):
        x = self.conv_in(x)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(F.silu(_norm_pf(self.conv_norm_out, x)))


class OVAE(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.encoder = OEncoder(c)
        self.decoder = ODecoder(c)

    def encode(self, x):
        mean, _ = self.encoder(x).chunk(2, dim=1)
        return mean * TINY["scaling_factor"]

    def decode(self, z):
        return self.decoder(z / TINY["scaling_factor"])


# --------------------------------------------------------------------------
# Tests
# --------------------------------------------------------------------------

def _jax_from_oracle(oracle):
    from apex_studio_tpu.loaders.converters import convert_keys
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict

    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    mapped = convert_keys("seedvr_vae", sd)
    model = SeedVRVAE(SeedVRVAEConfig.from_dict(TINY), dtype=jnp.float32,
                      param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    missing, unexpected = apply_state_dict(model, mapped, strict=True)
    assert not missing and not unexpected
    return model


class TestSeedVRVAEParity:
    def setup_method(self, _):
        torch.manual_seed(0)
        self.oracle = OVAE(TINY).eval()
        self.model = _jax_from_oracle(self.oracle)

    def test_encode_matches_oracle(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
        with torch.no_grad():
            ref = self.oracle.encode(torch.from_numpy(x)).numpy()
        out = np.asarray(self.model.encode(jnp.asarray(x)))
        assert out.shape == ref.shape == (1, 4, 3, 4, 4)
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_decode_matches_oracle(self):
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 4, 3, 4, 4)).astype(np.float32)
        with torch.no_grad():
            ref = self.oracle.decode(torch.from_numpy(z)).numpy()
        out = np.asarray(self.model.decode(jnp.asarray(z)))
        assert out.shape == ref.shape == (1, 3, 5, 16, 16)
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


class TestSeedVRVAEBehavior:
    def test_encoder_is_temporally_causal(self):
        model = SeedVRVAE(SeedVRVAEConfig.from_dict(TINY), dtype=jnp.float32,
                          param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 3, 5, 8, 8)).astype(np.float32)
        y = np.array(x)
        y[:, :, 3:] += 10.0  # perturb only the future
        za = np.asarray(model.encode(jnp.asarray(x)))
        zb = np.asarray(model.encode(jnp.asarray(y)))
        # First latent frame covers input frames 0-1 only (temporal stride 2,
        # head extension): it must not see frames 3+.
        np.testing.assert_allclose(za[:, :, 0], zb[:, :, 0], atol=1e-5)
        assert np.abs(za[:, :, -1] - zb[:, :, -1]).max() > 1e-3

    def test_single_frame_roundtrip_shapes(self):
        model = SeedVRVAE(SeedVRVAEConfig.from_dict(TINY), dtype=jnp.float32,
                          param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        x = jnp.zeros((1, 3, 1, 8, 8), jnp.float32)
        z = model.encode(x)
        assert z.shape == (1, 4, 1, 2, 2)
        out = model.decode(z)
        assert out.shape == (1, 3, 1, 8, 8)

    def test_manifest_registry_resolution(self):
        from apex_studio_tpu.models.registry import _load_builtin_families, vae_registry

        _load_builtin_families()
        cls = vae_registry.get("seedvr")
        assert cls is SeedVRVAE
        assert vae_registry.get("seedvr.base") is SeedVRVAE
