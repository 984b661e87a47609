"""Numeric parity for the STEP-LLM (Step1) text encoder vs the REFERENCE
module (`/root/reference/apps/api/src/helpers/stepvideo/text_encoder.py`
``Step1Model``) run as a torch oracle on CPU (f64).

The reference class only needs torch + transformers numerically; its module
pulls the engine's loader/cache mixins and GGUF machinery at import time, so
those are stubbed (inert) before loading the file — the oracle's math
(fused-wqkv GQA, NoPE causal SDPA, SwiGLU, RMSNorm, no final norm) runs
unmodified."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax.numpy as jnp
from flax import nnx

REF_FILE = ("/root/reference/apps/api/src/helpers/stepvideo/text_encoder.py")

TINY = dict(
    padded_vocab_size=211,
    hidden_size=64,
    num_attention_heads=4,
    num_attention_groups=2,
    ffn_hidden_size=96,  # rounds up to 256 (reference multiple_of=256)
    num_layers=2,
    layernorm_epsilon=1e-5,
)


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _load_ref_module():
    import importlib.util

    def _inert(name):
        # distinct classes: the reference helper multiply-inherits all three
        return type(name, (), {
            "__init__": lambda self, *a, **k: None,
            "_download": lambda self, *a, **k: a[0] if a else None,
        })

    # parent packages: create only if missing, always with a real __path__ so
    # ref_oracle's genuine `src.transformer`/`src.vae` imports keep working
    REF = "/root/reference/apps/api"
    for name in ("src", "src.helpers", "src.mixins", "src.utils",
                 "src.quantize"):
        if name not in sys.modules:
            m = _stub(name)
            m.__path__ = [REF + "/" + name.replace(".", "/")]
    # leaf stubs: inert stand-ins for the engine plumbing the module imports
    for name, attrs in {
        "src.helpers.helpers": {"helpers": lambda *a, **k: (lambda cls: cls)},
        "src.mixins.loader_mixin": {"LoaderMixin": _inert("LoaderMixin")},
        "src.mixins.offload_mixin": {"OffloadMixin": _inert("OffloadMixin")},
        "src.mixins.cache_mixin": {"CacheMixin": _inert("CacheMixin")},
        "src.utils.defaults": {"DEFAULT_COMPONENTS_PATH": "/tmp"},
        "src.quantize.ggml_layer": {"patch_model": lambda *a, **k: None},
        "src.quantize.load": {"load_gguf": lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("gguf not available in oracle"))},
    }.items():
        if name not in sys.modules:
            _stub(name, **attrs)
    spec = importlib.util.spec_from_file_location("ref_step_text", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestStepLLMParity:
    def test_forward_matches_reference(self):
        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.text_encoders.step_llm import (
            StepLLMConfig,
            StepLLMTextEncoder,
        )

        ref_mod = _load_ref_module()
        from transformers.modeling_utils import PretrainedConfig

        cfg_ref = PretrainedConfig(
            use_flash_attn=True, seq_length=64, attention_dropout=0.0,
            hidden_dropout=0.0, params_dtype=torch.float64,
            fp32_residual_connection=False, embedding_weights_in_fp32=False,
            **TINY)
        torch.manual_seed(0)
        ref = ref_mod.Step1Model(cfg_ref).double().eval()

        cfg = StepLLMConfig(**TINY)
        model = StepLLMTextEncoder(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        converted = convert_keys("step_llm", sd)
        missing, unexpected = apply_state_dict(model, converted, strict=False)
        assert not unexpected, f"unknown keys: {unexpected[:8]}"
        assert not missing, f"uncovered params: {missing[:8]}"

        rng = np.random.default_rng(0)
        ids = rng.integers(0, TINY["padded_vocab_size"], size=(2, 17))
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(ids)).transpose(0, 1).float().numpy()

        out = np.asarray(model(jnp.asarray(ids)))
        assert out.shape == out_ref.shape == (2, 17, TINY["hidden_size"])
        np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=2e-3)

    def test_right_padding_does_not_change_valid_prefix(self):
        from apex_studio_tpu.models.text_encoders.step_llm import (
            StepLLMConfig,
            StepLLMTextEncoder,
        )

        cfg = StepLLMConfig(**TINY)
        model = StepLLMTextEncoder(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
        rng = np.random.default_rng(1)
        ids = rng.integers(0, TINY["padded_vocab_size"], size=(1, 9))
        padded = np.concatenate([ids, np.zeros((1, 6), ids.dtype)], axis=1)
        a = np.asarray(model(jnp.asarray(ids)))
        b = np.asarray(model(jnp.asarray(padded)))[:, :9]
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
