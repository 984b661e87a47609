"""Wan MultiTalk model + engine on tiny weights (reference:
src/engine/wan/multitalk.py, src/transformer/wan/multitalk/model.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer

_TF_CFG = {
    "in_channels": 10,  # 4 noise + 2 mask + 4 cond
    "out_channels": 4,
    "num_attention_heads": 2, "attention_head_dim": 12,
    "text_dim": 32, "freq_dim": 32, "ffn_dim": 48, "num_layers": 2,
    "image_dim": 16, "added_kv_proj_dim": 24,
    "audio_window": 5, "vae_scale": 2, "audio_blocks": 2,
    "audio_channels": 16, "intermediate_dim": 24, "audio_output_dim": 20,
    "context_tokens": 4,
}


def _engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    doc["metadata"]["id"] = "wan-multitalk-tiny"
    doc["spec"]["model_type"] = "multitalk"
    comps = doc["spec"]["components"]
    comps[:] = [c for c in comps if c["type"] != "transformer"]
    comps.append({"type": "transformer", "base": "wan.multitalk",
                  "config": dict(_TF_CFG)})
    comps.append({"type": "helper", "name": "image_encoder",
                  "base": "CLIPVisionModel",
                  "config": {"hidden_size": 16, "intermediate_size": 32,
                             "num_hidden_layers": 2, "num_attention_heads": 2,
                             "image_size": 28, "patch_size": 14}})
    comps.append({"type": "helper", "name": "audio_encoder",
                  "base": "Wav2Vec2Model",
                  "config": {"hidden_size": 16, "num_hidden_layers": 2,
                             "num_attention_heads": 2, "intermediate_size": 32,
                             "conv_dim": [4] * 7}})
    path = tmp_path / "wan-multitalk.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestMultiTalkModel:
    def _model(self):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.wan_multitalk import (
            WanMultiTalkConfig,
            WanMultiTalkTransformer3DModel,
        )

        cfg = WanMultiTalkConfig(**_TF_CFG)
        return WanMultiTalkTransformer3DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def _inputs(self, humans=2, t_lat=3):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        j = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
        x = j(1, 10, t_lat, 8, 8)
        text = j(1, 5, 32)
        img = j(1, 3, 16)
        # pixel frames behind t_lat latent frames at vae_scale 2
        f_pix = 1 + (t_lat - 1) * 2
        audio = j(humans, f_pix, 5, 2, 16)
        n_ref = (8 // 2) * (8 // 2)
        masks = np.zeros((3, n_ref), np.float32)
        masks[0, :n_ref // 2] = 1
        masks[1, n_ref // 2:] = 1
        return x, text, img, audio, jnp.asarray(masks)

    def test_forward_shape_single(self):
        import jax.numpy as jnp

        m = self._model()
        x, text, img, audio, masks = self._inputs(humans=1)
        out = m(x, jnp.full((1,), 500.0), text, img, audio, masks)
        assert out.shape == (1, 4, 3, 8, 8)

    def test_two_speakers_and_routing(self):
        import jax.numpy as jnp

        m = self._model()
        x, text, img, audio, masks = self._inputs(humans=2)
        t = jnp.full((1,), 500.0)
        base = m(x, t, text, img, audio, masks)
        assert base.shape == (1, 4, 3, 8, 8)
        # swapping the two speakers' audio must change the output
        swapped = m(x, t, text, img, audio[::-1], masks)
        assert not np.allclose(np.asarray(base), np.asarray(swapped))

    def test_audio_silence_differs(self):
        import jax.numpy as jnp

        m = self._model()
        x, text, img, audio, masks = self._inputs(humans=1)
        t = jnp.full((1,), 500.0)
        a = m(x, t, text, img, audio, masks)
        b = m(x, t, text, img, audio * 0.0, masks)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestMultiTalkEngine:
    def test_single_speaker_generation(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        wav = rng.standard_normal(16000).astype(np.float32) * 0.1
        frames = eng.run(
            prompt="a person talks", image=img, audio=wav,
            height=32, width=32, num_frames=9, motion_frames=3,
            num_inference_steps=2, guidance_scale=1.0,
            audio_guidance_scale=2.0, fps=12, seed=3,
            color_correction_strength=0.5,
        )
        assert len(frames) >= 9
        assert frames[0].shape == (32, 32, 3)

    def test_two_speaker_generation(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        wav1 = rng.standard_normal(8000).astype(np.float32) * 0.1
        wav2 = rng.standard_normal(8000).astype(np.float32) * 0.1
        frames = eng.run(
            prompt="two people talk", negative_prompt="static", image=img,
            person_1_audio=wav1, person_2_audio=wav2,
            height=32, width=32, num_frames=5, motion_frames=3,
            num_inference_steps=1, guidance_scale=2.0,
            audio_guidance_scale=2.0, fps=10, seed=4,
        )
        assert len(frames) >= 5
