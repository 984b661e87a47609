"""Depth Anything V2 (JAX) — tiny-config topology, converter completeness, and
the /preprocessor surface (reference: src/preprocess/depth_anything_v2/)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from apex_studio_tpu.loaders.state_mapping import apply_state_dict
from apex_studio_tpu.preprocess.base import preprocessor_registry
from apex_studio_tpu.preprocess.depth_anything import (
    DAv2Config,
    DepthAnythingV2,
    DepthAnythingV2Preprocessor,
    convert_dav2_keys,
    resize_bilinear_ac,
)

RNG = np.random.default_rng(3)


def _torch_layout_sd(cfg: DAv2Config):
    """Random state dict with the published checkpoint's exact key names and
    torch layouts, for the tiny config."""
    d = cfg.embed_dim
    hid = int(d * cfg.mlp_ratio)
    oc = cfg.out_channels
    f = cfg.features
    p = cfg.patch_size
    n = cfg.pos_grid * cfg.pos_grid

    def r(*shape):
        return RNG.normal(size=shape).astype(np.float32) * 0.02

    sd = {
        "pretrained.cls_token": r(1, 1, d),
        "pretrained.mask_token": r(1, d),  # converter must drop this
        "pretrained.pos_embed": r(1, 1 + n, d),
        "pretrained.patch_embed.proj.weight": r(d, 3, p, p),
        "pretrained.patch_embed.proj.bias": r(d),
        "pretrained.norm.weight": r(d),
        "pretrained.norm.bias": r(d),
    }
    for i in range(cfg.depth):
        b = f"pretrained.blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": r(d), f"{b}.norm1.bias": r(d),
            f"{b}.attn.qkv.weight": r(3 * d, d), f"{b}.attn.qkv.bias": r(3 * d),
            f"{b}.attn.proj.weight": r(d, d), f"{b}.attn.proj.bias": r(d),
            f"{b}.ls1.gamma": r(d),
            f"{b}.norm2.weight": r(d), f"{b}.norm2.bias": r(d),
            f"{b}.mlp.fc1.weight": r(hid, d), f"{b}.mlp.fc1.bias": r(hid),
            f"{b}.mlp.fc2.weight": r(d, hid), f"{b}.mlp.fc2.bias": r(d),
            f"{b}.ls2.gamma": r(d),
        })
    for i, c in enumerate(oc):
        sd[f"depth_head.projects.{i}.weight"] = r(c, d, 1, 1)
        sd[f"depth_head.projects.{i}.bias"] = r(c)
        sd[f"depth_head.scratch.layer{i + 1}_rn.weight"] = r(f, c, 3, 3)
    sd["depth_head.resize_layers.0.weight"] = r(oc[0], oc[0], 4, 4)
    sd["depth_head.resize_layers.0.bias"] = r(oc[0])
    sd["depth_head.resize_layers.1.weight"] = r(oc[1], oc[1], 2, 2)
    sd["depth_head.resize_layers.1.bias"] = r(oc[1])
    sd["depth_head.resize_layers.3.weight"] = r(oc[3], oc[3], 3, 3)
    sd["depth_head.resize_layers.3.bias"] = r(oc[3])
    for i in range(1, 5):
        rn = f"depth_head.scratch.refinenet{i}"
        for u in (1, 2):
            for c in (1, 2):
                sd[f"{rn}.resConfUnit{u}.conv{c}.weight"] = r(f, f, 3, 3)
                sd[f"{rn}.resConfUnit{u}.conv{c}.bias"] = r(f)
        sd[f"{rn}.out_conv.weight"] = r(f, f, 1, 1)
        sd[f"{rn}.out_conv.bias"] = r(f)
    sd["depth_head.scratch.output_conv1.weight"] = r(f // 2, f, 3, 3)
    sd["depth_head.scratch.output_conv1.bias"] = r(f // 2)
    sd["depth_head.scratch.output_conv2.0.weight"] = r(32, f // 2, 3, 3)
    sd["depth_head.scratch.output_conv2.0.bias"] = r(32)
    sd["depth_head.scratch.output_conv2.2.weight"] = r(1, 32, 1, 1)
    sd["depth_head.scratch.output_conv2.2.bias"] = r(1)
    return sd


@pytest.fixture(scope="module")
def tiny_model():
    return DepthAnythingV2(DAv2Config.tiny(), rngs=nnx.Rngs(0))


def test_forward_shape(tiny_model):
    x = jnp.asarray(RNG.normal(size=(1, 56, 56, 3)), jnp.float32)
    depth = tiny_model(x)
    assert depth.shape == (1, 56, 56)
    assert np.all(np.asarray(depth) >= 0)  # final relu


def test_pos_embed_interpolation(tiny_model):
    # 6x4 grid ≠ the 4x4 pretraining grid → bicubic interpolation path
    x = jnp.asarray(RNG.normal(size=(1, 84, 56, 3)), jnp.float32)
    assert tiny_model(x).shape == (1, 84, 56)


def test_converter_strict_load():
    cfg = DAv2Config.tiny()
    model = DepthAnythingV2(cfg, rngs=nnx.Rngs(1))
    sd = _torch_layout_sd(cfg)
    mapped = convert_dav2_keys(sd)
    assert not any("mask_token" in k for k in mapped)
    # strict: every checkpoint key lands on a model leaf, none missing
    apply_state_dict(model, mapped, strict=True)
    x = jnp.asarray(RNG.normal(size=(1, 56, 56, 3)), jnp.float32)
    out = model(x)
    assert np.isfinite(np.asarray(out)).all()
    # loaded weights actually flow: qkv kernel equals transposed torch weight
    got = np.asarray(model.pretrained.blocks[0].attn.qkv.kernel.value)
    np.testing.assert_allclose(got, sd["pretrained.blocks.0.attn.qkv.weight"].T)


def test_resize_bilinear_align_corners_matches_torch_semantics():
    # corners map exactly onto corners (align_corners=True invariant)
    x = jnp.asarray(RNG.normal(size=(1, 5, 7, 2)), jnp.float32)
    y = resize_bilinear_ac(x, 9, 13)
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), np.asarray(x[0, 0, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[0, -1, -1]), np.asarray(x[0, -1, -1]), atol=1e-6)
    # linear ramp is reproduced exactly
    ramp = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8, 1)
    up = resize_bilinear_ac(ramp, 1, 15)
    np.testing.assert_allclose(np.asarray(up[0, 0, :, 0]),
                               np.linspace(0, 7, 15), atol=1e-6)


def test_preprocessor_end_to_end(tiny_model):
    proc = DepthAnythingV2Preprocessor(model=tiny_model)
    frame = RNG.integers(0, 256, size=(60, 80, 3), dtype=np.uint8)
    out = proc(frame, detect_resolution=56)
    assert len(out) == 1
    assert out[0].shape == (60, 80, 3)
    assert out[0].dtype == np.uint8


def test_registry_names():
    assert preprocessor_registry.get("depth_anything_v2") is DepthAnythingV2Preprocessor
    assert preprocessor_registry.get("depth") is DepthAnythingV2Preprocessor
