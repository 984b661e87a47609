"""RIFE IFNet (JAX) — op-level parity vs torch-cpu, converter mapping, and the
postprocessor surface (reference: src/postprocess/rife/rife.py:60)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from apex_studio_tpu.loaders.state_mapping import apply_state_dict
from apex_studio_tpu.postprocess.base import postprocessor_registry
from apex_studio_tpu.postprocess.rife import (
    Deconv2x,
    IFNet,
    RIFEConfig,
    RIFEPostprocessor,
    convert_rife_keys,
    flow_warp,
    pixel_shuffle2,
)

RNG = np.random.default_rng(5)


def test_deconv2x_matches_torch_convtranspose():
    import torch

    cin, cout = 3, 5
    w_t = RNG.normal(size=(cin, cout, 4, 4)).astype(np.float32)
    b_t = RNG.normal(size=(cout,)).astype(np.float32)
    x = RNG.normal(size=(2, cin, 6, 7)).astype(np.float32)

    tconv = torch.nn.ConvTranspose2d(cin, cout, 4, 2, 1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w_t))
        tconv.bias.copy_(torch.from_numpy(b_t))
        ref = tconv(torch.from_numpy(x)).numpy()

    mod = Deconv2x(cin, cout, rngs=nnx.Rngs(0))
    mod.w.value = jnp.asarray(w_t[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())
    mod.bias.value = jnp.asarray(b_t)
    got = np.asarray(mod(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_pixel_shuffle_matches_torch():
    import torch

    x = RNG.normal(size=(1, 12, 3, 4)).astype(np.float32)  # NCHW, c=12 → 3
    ref = torch.nn.PixelShuffle(2)(torch.from_numpy(x)).numpy()
    got = np.asarray(pixel_shuffle2(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_flow_warp_identity_and_shift():
    img = jnp.asarray(RNG.normal(size=(1, 8, 8, 3)), jnp.float32)
    zero = jnp.zeros((1, 8, 8, 2), jnp.float32)
    np.testing.assert_allclose(np.asarray(flow_warp(img, zero)), np.asarray(img),
                               atol=1e-6)
    # flow of +1 in x samples the pixel to the right
    shift = zero.at[..., 0].set(1.0)
    out = np.asarray(flow_warp(img, shift))
    np.testing.assert_allclose(out[0, :, :-1], np.asarray(img)[0, :, 1:], atol=1e-6)


def _torch_layout_sd(cfg: RIFEConfig):
    sd = {}

    def r(*shape):
        return RNG.normal(size=shape).astype(np.float32) * 0.1

    for b, c in enumerate(cfg.widths):
        cin = 7 if b == 0 else 12
        p = f"module.block{b}"
        sd[f"{p}.conv0.0.0.weight"] = r(c // 2, cin, 3, 3)
        sd[f"{p}.conv0.0.0.bias"] = r(c // 2)
        sd[f"{p}.conv0.0.1.weight"] = r(c // 2)  # PReLU
        sd[f"{p}.conv0.1.0.weight"] = r(c, c // 2, 3, 3)
        sd[f"{p}.conv0.1.0.bias"] = r(c)
        sd[f"{p}.conv0.1.1.weight"] = r(c)
        for i in range(cfg.res_blocks):
            sd[f"{p}.convblock.{i}.conv.weight"] = r(c, c, 3, 3)
            sd[f"{p}.convblock.{i}.conv.bias"] = r(c)
            sd[f"{p}.convblock.{i}.beta"] = r(1, c, 1, 1)
            sd[f"{p}.convblock.{i}.relu.weight"] = r(c)
        sd[f"{p}.lastconv.weight"] = r(c, 24, 4, 4)  # ConvTranspose (in,out,k,k)
        sd[f"{p}.lastconv.bias"] = r(24)
    sd["module.contextnet.conv1.weight"] = r(1)  # must be ignored
    return sd


def test_converter_strict_load_and_forward():
    cfg = RIFEConfig.tiny()
    model = IFNet(cfg, rngs=nnx.Rngs(1))
    mapped = convert_rife_keys(_torch_layout_sd(cfg))
    assert not any("contextnet" in k for k in mapped)
    apply_state_dict(model, mapped, strict=True)
    img0 = jnp.asarray(RNG.uniform(size=(1, 32, 32, 3)), jnp.float32)
    img1 = jnp.asarray(RNG.uniform(size=(1, 32, 32, 3)), jnp.float32)
    out = model(img0, img1, 0.5)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_postprocessor_multiplier():
    model = IFNet(RIFEConfig.tiny(), rngs=nnx.Rngs(0))
    proc = RIFEPostprocessor(model=model)
    frames = [RNG.integers(0, 256, size=(40, 52, 3), dtype=np.uint8) for _ in range(3)]
    out = proc(frames, multiplier=3)
    assert len(out) == 7  # 3 originals + 2 inserted per gap
    assert all(f.shape == (40, 52, 3) and f.dtype == np.uint8 for f in out)
    # originals pass through untouched
    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[3], frames[1])


def test_blend_zero_weights_midpoint():
    """With an identically-zero flow/mask net the merge is the 50/50 blend —
    the structural invariant of the flow+mask fusion."""
    cfg = RIFEConfig.tiny()
    model = IFNet(cfg, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(model)
    # zero every param
    flat = nnx.to_flat_state(state)
    zeroed = [(path, jnp.zeros_like(leaf)) for path, leaf in flat]
    model = nnx.merge(graphdef, nnx.from_flat_state(zeroed))
    a = jnp.zeros((1, 32, 32, 3), jnp.float32)
    b = jnp.ones((1, 32, 32, 3), jnp.float32)
    out = np.asarray(model(a, b, 0.5))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_registry():
    assert postprocessor_registry.get("rife_v4") is RIFEPostprocessor
