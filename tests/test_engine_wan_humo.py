"""Wan HuMo model + engine on tiny weights (reference:
src/engine/wan/humo.py, src/transformer/wan/humo/model.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer

_TF_CFG = {
    "in_dim": 10,  # 4 noise + 2 mask + 4 cond (tiny z=4, t_scale=2)
    "dim": 24, "ffn_dim": 48, "freq_dim": 32, "text_dim": 32,
    "out_dim": 4, "num_heads": 2, "num_layers": 2,
    "audio_token_num": 4, "audio_kv_dim": 16,
    "audio_window": 6, "audio_blocks": 2, "audio_channels": 16,
    "audio_intermediate_dim": 12,
}


def _engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    doc["metadata"]["id"] = "wan-humo-tiny"
    doc["spec"]["model_type"] = "humo"
    comps = doc["spec"]["components"]
    comps[:] = [c for c in comps if c["type"] != "transformer"]
    comps.append({"type": "transformer", "base": "wan.humo",
                  "config": dict(_TF_CFG)})
    comps.append({"type": "helper", "name": "audio_encoder",
                  "base": "Wav2Vec2Model",
                  "config": {"hidden_size": 16, "num_hidden_layers": 2,
                             "num_attention_heads": 2, "intermediate_size": 32,
                             "conv_dim": [4] * 7}})
    path = tmp_path / "wan-humo.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestHuMoModel:
    def _model(self):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.wan_humo import (
            HumoWanTransformerModel,
            WanHuMoConfig,
        )

        cfg = WanHuMoConfig(**_TF_CFG)
        return HumoWanTransformerModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def _inputs(self, t_lat=3):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        j = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
        x = j(1, 4, t_lat, 8, 8)
        ctx = j(1, 5, 32)
        audio = j(1, t_lat, 6, 2, 16)
        y = j(1, 6, t_lat, 8, 8)
        return x, ctx, audio, y

    def test_forward_shape(self):
        import jax.numpy as jnp

        m = self._model()
        x, ctx, audio, y = self._inputs()
        out = m(x, jnp.full((1,), 500.0), ctx, audio, y)
        assert out.shape == (1, 4, 3, 8, 8)

    def test_audio_per_frame_routing(self):
        """Changing one frame's audio window must change (at least) that
        frame's output."""
        import jax.numpy as jnp

        m = self._model()
        x, ctx, audio, y = self._inputs()
        t = jnp.full((1,), 500.0)
        base = np.asarray(m(x, t, ctx, audio, y))
        changed = audio.at[:, 1].set(audio[:, 1] * 3.0 + 1.0)
        out = np.asarray(m(x, t, ctx, changed, y))
        assert not np.allclose(base, out)

    def test_audio_longer_than_video_truncates(self):
        import jax.numpy as jnp

        m = self._model()
        x, ctx, audio, y = self._inputs()
        rng = np.random.default_rng(1)
        longer = jnp.concatenate(
            [audio, jnp.asarray(rng.standard_normal((1, 2, 6, 2, 16)),
                                jnp.float32)], axis=1)
        out = m(x, jnp.full((1,), 500.0), ctx, longer, y)
        assert out.shape == (1, 4, 3, 8, 8)


class TestHuMoEngine:
    def test_windows_shape(self, tmp_path):
        eng = _engine(tmp_path)
        emb = np.random.default_rng(0).standard_normal((9, 2, 16)).astype(np.float32)
        wind = eng.audio_windows(emb, 9, t_scale=2, shift=2)
        assert wind.shape == (5, 6, 2, 16)  # rows = t_scale + 2·shift

    def test_ta_generation(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(0)
        wav = rng.standard_normal(12000).astype(np.float32) * 0.1
        frames = eng.run(
            prompt="someone sings", audio=wav, height=32, width=32,
            num_frames=9, num_inference_steps=2, guidance_scale_a=2.0,
            guidance_scale_t=1.0, fps=12, seed=3,
        )
        assert len(frames) == 9
        assert frames[0].shape == (32, 32, 3)

    def test_tia_generation_with_cfg(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        wav = rng.standard_normal(8000).astype(np.float32) * 0.1
        lat = eng.run(
            prompt="a person", negative_prompt="blurry", audio=wav, image=img,
            height=32, width=32, num_frames=9, num_inference_steps=2,
            guidance_scale_a=2.0, guidance_scale_t=3.0, fps=10, seed=4,
            return_latents=True,
        )
        # one trailing reference slot dropped from the 5 latent frames
        assert np.asarray(lat).shape == (1, 4, 4, 16, 16)
