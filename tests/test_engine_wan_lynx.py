"""Wan Lynx (face-ID personalization) model + engine on tiny weights
(reference: src/engine/wan/lynx.py, src/transformer/wan/lynx/model.py,
src/helpers/wan/lynx.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer

_TF_CFG = {
    "in_channels": 4, "out_channels": 4,
    "num_attention_heads": 2, "attention_head_dim": 12,
    "text_dim": 32, "freq_dim": 32, "ffn_dim": 48, "num_layers": 2,
    "ip_cross_attention_dim": 16, "ip_registers": 2,
}
_RESAMPLER_CFG = {"dim": 16, "depth": 1, "dim_head": 8, "heads": 2,
                  "num_queries": 3, "embedding_dim": 8, "output_dim": 16,
                  "ff_mult": 2}


def _engine(tmp_path, model_type="lynx"):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    doc["metadata"]["id"] = f"wan-{model_type}-tiny"
    doc["spec"]["model_type"] = model_type
    comps = doc["spec"]["components"]
    comps[:] = [c for c in comps if c["type"] != "transformer"]
    comps.append({"type": "transformer", "base": "wan.lynx",
                  "config": dict(_TF_CFG)})
    comps.append({"type": "helper", "name": "resampler",
                  "base": "LynxResampler", "config": dict(_RESAMPLER_CFG)})
    path = tmp_path / f"wan-{model_type}.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestLynxModel:
    def _model(self, **over):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.wan_lynx import (
            WanLynxConfig,
            WanLynxTransformer3DModel,
        )

        cfg = WanLynxConfig(**{**_TF_CFG, **over})
        return WanLynxTransformer3DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def test_ip_tokens_condition(self):
        import jax.numpy as jnp

        m = self._model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((1, 5, 32)), jnp.float32)
        ip = jnp.asarray(rng.standard_normal((1, 3, 16)), jnp.float32)
        t = jnp.full((1,), 500.0)
        base = m(x, t, ctx)
        with_ip = m(x, t, ctx, ip_tokens=ip)
        half = m(x, t, ctx, ip_tokens=ip, ip_scale=0.5)
        assert not np.allclose(np.asarray(base), np.asarray(with_ip))
        assert not np.allclose(np.asarray(with_ip), np.asarray(half))

    def test_registers_optional(self):
        import jax.numpy as jnp

        m = self._model(ip_registers=0)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((1, 5, 32)), jnp.float32)
        ip = jnp.asarray(rng.standard_normal((1, 3, 16)), jnp.float32)
        out = m(x, jnp.full((1,), 500.0), ctx, ip_tokens=ip)
        assert out.shape == (1, 4, 3, 8, 8)

    def test_resampler_shapes(self):
        from flax import nnx

        from apex_studio_tpu.models.transformers.wan_lynx import LynxResampler

        import jax.numpy as jnp

        r = LynxResampler(LynxResampler.Config(**_RESAMPLER_CFG),
                          rngs=nnx.Rngs(0))
        out = r(jnp.ones((2, 4, 8)))
        assert out.shape == (2, 3, 16)


class TestLynxEngine:
    def test_face_embed_generation(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(0)
        face = rng.standard_normal(8).astype(np.float32)
        frames = eng.run(
            prompt="a portrait video", face_embeds=face, height=32, width=32,
            num_frames=5, num_inference_steps=2, guidance_scale=1.0, seed=3,
            ip_scale=1.0,
        )
        assert len(frames) == 5
        assert frames[0].shape == (32, 32, 3)

    def test_identity_changes_output(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(1)
        kw = dict(prompt="x", height=32, width=32, num_frames=3,
                  num_inference_steps=1, guidance_scale=1.0, seed=1,
                  return_latents=True)
        a = np.asarray(eng.run(face_embeds=rng.standard_normal(8), **kw))
        b = np.asarray(eng.run(face_embeds=rng.standard_normal(8), **kw))
        no_face = np.asarray(eng.run(**kw))
        assert not np.allclose(a, b)
        assert not np.allclose(a, no_face)
