"""Wav2Vec2 JAX encoder vs HF torch reference on tiny random weights."""

import numpy as np
import pytest


def _configs():
    from apex_studio_tpu.models.audio.wav2vec2 import Wav2Vec2Config

    jcfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(8,) * 7)
    return jcfg


def _torch_model(stable=False):
    import torch
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    cfg = HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[8] * 7,
        num_feat_extract_layers=7,
        feat_extract_norm="layer" if stable else "group",
        do_stable_layer_norm=stable,
        conv_bias=stable,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, activation_dropout=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    return HFModel(cfg).eval()


def _port(torch_model, stable=False):
    """Load the torch state dict into the JAX model via the converter."""
    import dataclasses

    import jax.numpy as jnp
    from flax import nnx

    from apex_studio_tpu.loaders.converters import converter_registry
    from apex_studio_tpu.models.audio.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(8,) * 7,
        feat_extract_norm="layer" if stable else "group",
        do_stable_layer_norm=stable)
    model = Wav2Vec2Model(cfg, rngs=nnx.Rngs(0))
    conv = converter_registry.get("wav2vec2")
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    renamed = {}
    for k, v in sd.items():
        nk = conv.convert_key(k)
        if nk is not None:
            renamed[nk] = v

    graphdef, state = nnx.split(model)
    flat = state.flat_state()
    loaded, missed = 0, []
    for path, leaf in flat:
        name = ".".join(str(p) for p in path)
        if name in renamed:
            v = np.asarray(renamed[name])
            if name.endswith("conv.kernel") and v.ndim == 3:
                v = v.transpose(2, 1, 0)  # OIK → KIO
            elif name.endswith(".kernel") and v.ndim == 2:
                v = v.T
            assert v.shape == leaf.value.shape, (name, v.shape, leaf.value.shape)
            leaf.value = jnp.asarray(v)
            loaded += 1
        else:
            missed.append(name)
    assert loaded > 30, f"only loaded {loaded}; missing {missed[:5]}"
    return nnx.merge(graphdef, state)


@pytest.mark.parametrize("stable", [False, True])
def test_hidden_states_match_torch(stable):
    import torch

    tm = _torch_model(stable)
    jm = _port(tm, stable)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((1, 2000)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav), output_hidden_states=True)
    ref_states = [h.numpy() for h in ref.hidden_states]

    import jax.numpy as jnp

    ours = [np.asarray(h) for h in jm(jnp.asarray(wav))]
    assert len(ours) == len(ref_states)
    for i, (a, b) in enumerate(zip(ours, ref_states)):
        assert a.shape == b.shape, (i, a.shape, b.shape)
        err = np.abs(a - b).max()
        assert err < 2e-4, f"layer {i} max err {err}"


def test_linear_interpolation_matches_torch():
    import torch
    import torch.nn.functional as F

    from apex_studio_tpu.models.audio.wav2vec2 import interpolate_linear

    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 17, 5)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x).transpose(1, 2), size=40,
                        align_corners=True, mode="linear").transpose(1, 2).numpy()
    ours = np.asarray(interpolate_linear(jnp.asarray(x), 40))
    assert np.allclose(ours, ref, atol=1e-5)
