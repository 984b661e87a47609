"""Metric3D parity vs the reference's own torch modules.

The reference's vendored mono stack is torch-only at runtime
(ViT_DINO_reg.py / RAFTDepthNormalDPTDecoder5.py import no mmcv), so both
files load standalone and serve as the oracle: same weights through
``convert_metric3d_keys`` → same input → outputs must match.
"""

import importlib.util
import math
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

_VIT = ("/root/reference/apps/api/src/preprocess/metric3d/mono/model/"
        "backbones/ViT_DINO_reg.py")
_DEC = ("/root/reference/apps/api/src/preprocess/metric3d/mono/model/"
        "decode_heads/RAFTDepthNormalDPTDecoder5.py")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mods():
    return _load("ref_vit_dino_reg", _VIT), _load("ref_raft_decoder", _DEC)


def _tiny_cfg_ours():
    from apex_studio_tpu.preprocess.metric3d import Metric3DConfig

    # num_anchors pinned to 256: the reference hardcodes
    # num_depth_regressor_anchor = 256 (decoder5.py:1104)
    cfg = Metric3DConfig.tiny()
    cfg.num_anchors = 256
    cfg.crop_size = (56, 56)
    return cfg


def _ref_decoder_cfg(cfg):
    return SimpleNamespace(
        model=SimpleNamespace(decode_head=SimpleNamespace(
            in_channels=[cfg.embed_dim] * 4,
            feature_channels=list(cfg.feature_channels),
            decoder_channels=list(cfg.decoder_channels),
            use_cls_token=True,
            up_scale=7,
            num_register_tokens=cfg.num_register_tokens,
            hidden_channels=[cfg.hidden_dim] * 4,
            n_gru_layers=cfg.n_gru_layers,
            n_downsample=cfg.n_downsample,
            iters=cfg.iters,
            slow_fast_gru=cfg.slow_fast_gru,
        )),
        data_basic=SimpleNamespace(
            depth_normalize=(cfg.min_depth, cfg.max_depth)),
    )


def test_metric3d_full_parity(ref_mods):
    vit_mod, dec_mod = ref_mods
    from functools import partial

    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.preprocess.metric3d import (
        Metric3DModel,
        convert_metric3d_keys,
    )

    cfg = _tiny_cfg_ours()
    torch.manual_seed(0)
    ref_enc = vit_mod.DinoVisionTransformer(
        img_size=56, patch_size=14, embed_dim=cfg.embed_dim, depth=cfg.depth,
        num_heads=cfg.num_heads, mlp_ratio=4,
        block_fn=partial(vit_mod.Block, attn_class=vit_mod.MemEffAttention),
        num_register_tokens=cfg.num_register_tokens,
    ).eval()
    ref_dec = dec_mod.RAFTDepthNormalDPT5(_ref_decoder_cfg(cfg)).eval()
    # randomize params (defaults include zeros/ones init for norms)
    with torch.no_grad():
        for p in list(ref_enc.parameters()) + list(ref_dec.parameters()):
            p.copy_(torch.randn_like(p) * 0.05)

    sd = {}
    for k, v in ref_enc.state_dict().items():
        sd["encoder." + k] = v.numpy()
    for k, v in ref_dec.state_dict().items():
        sd["decoder." + k] = v.numpy()

    ours = Metric3DModel(cfg, rngs=nnx.Rngs(0))
    missing, unexpected = apply_state_dict(
        ours, convert_metric3d_keys(sd), strict=False)
    real_missing = [m for m in missing if "depth_expectation" not in m]
    assert not unexpected, unexpected[:8]
    assert not real_missing, real_missing[:8]

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)

    with torch.no_grad():
        feats = ref_enc(torch.from_numpy(x))
        out = ref_dec(feats)
    ref_depth = out["prediction"].numpy()          # (1, 1, 56, 56)
    ref_conf = out["confidence"].numpy()
    ref_normal = out["prediction_normal"].numpy()  # (1, 4, 56, 56)

    depth, conf, normal = ours(jnp.asarray(x.transpose(0, 2, 3, 1)))
    got_depth = np.asarray(depth).transpose(0, 3, 1, 2)
    got_conf = np.asarray(conf).transpose(0, 3, 1, 2)
    got_normal = np.asarray(normal).transpose(0, 3, 1, 2)

    assert got_depth.shape == ref_depth.shape
    np.testing.assert_allclose(got_depth, ref_depth, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(got_conf, ref_conf, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(got_normal, ref_normal, atol=2e-3, rtol=1e-3)


def test_metric3d_preprocessor_end_to_end():
    from flax import nnx as _nnx

    from apex_studio_tpu.preprocess.base import preprocessor_registry
    from apex_studio_tpu.preprocess.metric3d import (
        Metric3DConfig,
        Metric3DModel,
        Metric3DPreprocessor,
    )

    cfg = Metric3DConfig.tiny()
    model = Metric3DModel(cfg, rngs=_nnx.Rngs(0))
    proc = Metric3DPreprocessor(model=model)
    proc.setup()
    frame = (np.random.default_rng(0).integers(0, 255, size=(80, 100, 3))
             .astype(np.uint8))
    depth_map = proc.process_frame(frame)
    assert depth_map.shape == (80, 100, 3)
    assert depth_map.dtype == np.uint8
    normal_map = proc.process_frame(frame, output_type="normal")
    assert normal_map.shape == (80, 100, 3)
    assert preprocessor_registry.get("metric3d") is Metric3DPreprocessor
    assert preprocessor_registry.get("Metric3DDetector") is Metric3DPreprocessor


def test_metric3d_giant2_style_parity(ref_mods):
    """giant2 path: SwiGLU FFN + pre-norm multi-output feature taps."""
    vit_mod, dec_mod = ref_mods
    from functools import partial

    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.preprocess.metric3d import (
        Metric3DConfig,
        Metric3DModel,
        convert_metric3d_keys,
    )

    cfg = Metric3DConfig.tiny()
    cfg.num_anchors = 256
    cfg.crop_size = (56, 56)
    cfg.depth = 4          # divisible by 4 → one tap per block
    cfg.ffn = "swiglu"
    cfg.multi_output = True
    torch.manual_seed(1)
    ref_enc = vit_mod.DinoVisionTransformer(
        img_size=56, patch_size=14, embed_dim=cfg.embed_dim, depth=cfg.depth,
        num_heads=cfg.num_heads, mlp_ratio=4,
        block_fn=partial(vit_mod.Block, attn_class=vit_mod.MemEffAttention),
        num_register_tokens=cfg.num_register_tokens,
        ffn_layer="swiglu", multi_output=True,
    ).eval()
    ref_dec = dec_mod.RAFTDepthNormalDPT5(_ref_decoder_cfg(cfg)).eval()
    with torch.no_grad():
        for p in list(ref_enc.parameters()) + list(ref_dec.parameters()):
            p.copy_(torch.randn_like(p) * 0.05)

    sd = {("encoder." + k): v.numpy() for k, v in ref_enc.state_dict().items()}
    sd.update({("decoder." + k): v.numpy()
               for k, v in ref_dec.state_dict().items()})
    ours = Metric3DModel(cfg, rngs=nnx.Rngs(0))
    missing, unexpected = apply_state_dict(
        ours, convert_metric3d_keys(sd), strict=False)
    real_missing = [m for m in missing if "depth_expectation" not in m
                    and ".norm." not in m]  # final norm unused in multi_output
    assert not unexpected, unexpected[:8]
    assert not real_missing, real_missing[:8]

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        feats = ref_enc(torch.from_numpy(x))
        out = ref_dec(feats)
    depth, conf, normal = ours(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(depth).transpose(0, 3, 1, 2), out["prediction"].numpy(),
        atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(normal).transpose(0, 3, 1, 2),
        out["prediction_normal"].numpy(), atol=2e-3, rtol=1e-3)
