"""LeReS parity vs the reference's own vendored torch modules
(leres/Resnext_torch.py + network_auxi.py are torch-only: they load
standalone as a synthetic package and serve as the oracle)."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import nnx

_DIR = "/root/reference/apps/api/src/preprocess/leres/leres"


@pytest.fixture(scope="module")
def ref_net():
    pkg = types.ModuleType("ref_leres")
    pkg.__path__ = [_DIR]
    sys.modules["ref_leres"] = pkg
    for name in ("Resnet", "Resnext_torch", "network_auxi"):
        spec = importlib.util.spec_from_file_location(
            f"ref_leres.{name}", f"{_DIR}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_leres.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return sys.modules["ref_leres.network_auxi"], sys.modules["ref_leres.Resnext_torch"]


def test_leres_full_parity(ref_net):
    net_mod, rx_mod = ref_net
    from apex_studio_tpu.loaders.state_mapping import apply_state_dict
    from apex_studio_tpu.preprocess.leres import LeReSModel, convert_leres_keys

    torch.manual_seed(0)
    ref_enc = rx_mod.resnext101_32x8d(pretrained=False).eval()
    ref_dec = net_mod.Decoder().eval()
    with torch.no_grad():
        for p in list(ref_enc.parameters()) + list(ref_dec.parameters()):
            p.copy_(torch.randn_like(p) * 0.02)
        # realistic running stats so the BN fold is actually exercised
        for m in list(ref_enc.modules()) + list(ref_dec.modules()):
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    sd = {("encoder." + k): v.numpy() for k, v in ref_enc.state_dict().items()}
    sd.update({("decoder." + k): v.numpy()
               for k, v in ref_dec.state_dict().items()})

    ours = LeReSModel(rngs=nnx.Rngs(0))
    missing, unexpected = apply_state_dict(
        ours, convert_leres_keys(sd), strict=False)
    assert not unexpected, unexpected[:8]
    assert not missing, missing[:8]

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        feats = ref_enc(torch.from_numpy(x))
        ref_out = ref_dec(feats).numpy()
    got = np.asarray(ours(jnp.asarray(x.transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)


def test_leres_preprocessor_end_to_end():
    from apex_studio_tpu.preprocess.base import preprocessor_registry
    from apex_studio_tpu.preprocess.leres import LeReSModel, LeReSPreprocessor

    proc = LeReSPreprocessor(model=LeReSModel(rngs=nnx.Rngs(0)))
    proc.setup()
    frame = (np.random.default_rng(0).integers(0, 255, size=(72, 96, 3))
             .astype(np.uint8))
    out = proc.process_frame(frame, detect_resolution=64)
    assert out.shape == (72, 96, 3)
    assert out.dtype == np.uint8
    assert preprocessor_registry.get("leres") is LeReSPreprocessor
    assert preprocessor_registry.get("LeresDetector") is LeReSPreprocessor
