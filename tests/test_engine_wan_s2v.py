"""Wan S2V speech-to-video model + engine on tiny weights (reference:
src/engine/wan/s2v.py, src/transformer/wan/s2v/model.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer


def _engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    doc["metadata"]["id"] = "wan-s2v-tiny"
    doc["spec"]["model_type"] = "s2v"
    comps = doc["spec"]["components"]
    # the causal audio encoder downsamples time by 4 — use a 4x-temporal VAE
    vae = next(c for c in comps if c["type"] == "vae")
    vae["config"]["dim_mult"] = [1, 2, 2]
    vae["config"]["temperal_downsample"] = [True, True]
    comps[:] = [c for c in comps if c["type"] != "transformer"]
    comps.append({
        "type": "transformer", "base": "wan.s2v",
        "config": {
            "in_channels": 4, "out_channels": 4,
            "num_attention_heads": 2, "attention_head_dim": 12,
            "text_dim": 32, "freq_dim": 32, "ffn_dim": 48,
            "num_layers": 2, "audio_inject_layers": [0],
            "audio_dim": 16, "num_wav2vec_layers": 3,
            "pose_dim": 4, "num_audio_token": 2,
        }})
    comps.append({
        "type": "helper", "name": "audio_encoder", "base": "Wav2Vec2Model",
        "config": {"hidden_size": 16, "num_hidden_layers": 2,
                   "num_attention_heads": 2, "intermediate_size": 32,
                   "conv_dim": [4] * 7}})
    path = tmp_path / "wan-s2v.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    eng.motion_frames = 9  # tiny rolling buffer (t_scale 2 → 6 motion lat? 9+3)/2-... )
    return eng


class TestS2VModel:
    def _model(self, **over):
        import jax.numpy as jnp
        from flax import nnx

        from apex_studio_tpu.models.transformers.wan_s2v import (
            WanS2VConfig,
            WanS2VTransformer3DModel,
        )

        cfg = WanS2VConfig(
            in_channels=4, out_channels=4, num_attention_heads=2,
            attention_head_dim=12, text_dim=24, freq_dim=32, ffn_dim=48,
            num_layers=2, audio_inject_layers=(0,), audio_dim=16,
            num_wav2vec_layers=3, pose_dim=4, num_audio_token=2, **over)
        return WanS2VTransformer3DModel(
            cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))

    def _inputs(self, t_lat=3, t_mot=2):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        j = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
        x = j(1, 4, t_lat, 8, 8)
        text = j(1, 5, 24)
        motion = j(1, 4, t_mot, 8, 8)
        # audio covers motion latents + video latents after the causal stack:
        # T_a such that ceil(ceil((mf0 + T_a)/2)/2) = t_mot + t_lat
        mf0 = 9
        want = t_mot + t_lat
        t_a = 4 * want - mf0
        audio = j(1, 3, 16, t_a)
        image = j(1, 4, 1, 8, 8)
        pose = j(1, 4, t_lat, 8, 8)
        return x, text, motion, audio, image, pose, (mf0, t_mot)

    def test_forward_shape(self):
        import jax.numpy as jnp

        m = self._model()
        x, text, motion, audio, image, pose, mf = self._inputs()
        out = m(x, jnp.full((1,), 500.0), text, motion, audio, image,
                pose_latents=pose, motion_frames=mf)
        assert out.shape == (1, 4, 3, 8, 8)

    def test_audio_changes_output(self):
        import jax.numpy as jnp

        m = self._model()
        x, text, motion, audio, image, pose, mf = self._inputs()
        t = jnp.full((1,), 500.0)
        a = m(x, t, text, motion, audio, image, motion_frames=mf)
        b = m(x, t, text, motion, audio * 0.0, image, motion_frames=mf)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_motion_and_image_condition(self):
        import jax.numpy as jnp

        m = self._model()
        x, text, motion, audio, image, pose, mf = self._inputs()
        t = jnp.full((1,), 500.0)
        base = m(x, t, text, motion, audio, image, motion_frames=mf)
        moved = m(x, t, text, motion * 2.0, audio, image, motion_frames=mf)
        other_img = m(x, t, text, motion, audio, image * 2.0, motion_frames=mf)
        dropped = m(x, t, text, motion, audio, image, motion_frames=mf,
                    drop_motion_frames=True)
        assert not np.allclose(np.asarray(base), np.asarray(moved))
        assert not np.allclose(np.asarray(base), np.asarray(other_img))
        assert not np.allclose(np.asarray(base), np.asarray(dropped))

    def test_framepack_motioner(self):
        import jax.numpy as jnp

        m = self._model(enable_framepack=True)
        x, text, motion, audio, image, pose, mf = self._inputs(t_mot=4)
        out = m(x, jnp.full((1,), 500.0), text, motion, audio, image,
                motion_frames=mf)
        assert out.shape == (1, 4, 3, 8, 8)


class TestS2VEngine:
    def test_chunked_generation(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        # ~1.2 s of 16 kHz audio
        wav = rng.standard_normal(16000 + 4000).astype(np.float32) * 0.1
        frames = eng.run(
            prompt="someone speaking", audio=wav, image=img,
            height=32, width=32, num_frames_per_chunk=8,
            num_inference_steps=2, guidance_scale=1.0, seed=5, fps=16,
            num_chunks=2,
        )
        assert len(frames) > 8  # first chunk loses 3 frames (drop_first_motion)
        assert frames[0].shape == (32, 32, 3)


class TestShardingRules:
    @pytest.mark.parametrize("mod,cls,cfgmod", [
        ("wan_s2v", "WanS2VTransformer3DModel", "WanS2VConfig"),
        ("wan_multitalk", "WanMultiTalkTransformer3DModel", "WanMultiTalkConfig"),
        ("wan_animate", "WanAnimateTransformer3DModel", "WanAnimateConfig"),
        ("wan_humo", "HumoWanTransformerModel", "WanHuMoConfig"),
        ("wan_lynx", "WanLynxTransformer3DModel", "WanLynxConfig"),
        ("wan_scail", "SCAILModel", "WanScailConfig"),
    ])
    def test_rules_match_parameters(self, mod, cls, cfgmod):
        """Every TP rule must actually hit at least one parameter path and
        shardings must divide the tiny dims (shape sanity only)."""
        import importlib

        from flax import nnx
        import jax.numpy as jnp

        m = importlib.import_module(f"apex_studio_tpu.models.transformers.{mod}")
        cfg_cls = getattr(m, cfgmod)
        model_cls = getattr(m, cls)
        tiny = {
            "wan_s2v": dict(in_channels=4, out_channels=4,
                            num_attention_heads=2, attention_head_dim=12,
                            text_dim=16, freq_dim=16, ffn_dim=24, num_layers=1,
                            audio_dim=8, num_wav2vec_layers=2,
                            audio_inject_layers=(0,), pose_dim=4,
                            num_audio_token=2),
            "wan_multitalk": dict(in_channels=10, out_channels=4,
                                  num_attention_heads=2, attention_head_dim=12,
                                  text_dim=16, freq_dim=16, ffn_dim=24,
                                  num_layers=1, image_dim=8,
                                  added_kv_proj_dim=24, audio_blocks=2,
                                  audio_channels=8, intermediate_dim=8,
                                  audio_output_dim=8, context_tokens=2),
            "wan_animate": dict(in_channels=10, out_channels=4,
                                num_attention_heads=2, attention_head_dim=12,
                                text_dim=16, freq_dim=16, ffn_dim=24,
                                num_layers=1, image_dim=8,
                                motion_encoder_size=8, motion_style_dim=8,
                                motion_dim=2, motion_encoder_dim=8,
                                face_encoder_hidden_dim=4,
                                face_encoder_num_heads=2,
                                inject_face_latents_blocks=1),
            "wan_humo": dict(in_dim=10, dim=24, ffn_dim=24, freq_dim=16,
                             text_dim=16, out_dim=4, num_heads=2, num_layers=1,
                             audio_token_num=2, audio_kv_dim=8,
                             audio_window=4, audio_blocks=2, audio_channels=8,
                             audio_intermediate_dim=8),
            "wan_lynx": dict(in_channels=4, out_channels=4,
                             num_attention_heads=2, attention_head_dim=12,
                             text_dim=16, freq_dim=16, ffn_dim=24, num_layers=1,
                             ip_cross_attention_dim=8, ip_registers=1),
            "wan_scail": dict(in_dim=6, dim=24, ffn_dim=24, freq_dim=16,
                              text_dim=16, text_len=8, out_dim=4, num_heads=2,
                              num_layers=1, image_dim=8),
        }[mod]
        cfg = cfg_cls(**tiny)
        model = model_cls(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                          rngs=nnx.Rngs(0))
        rules = model_cls.sharding_rules(cfg)
        _, state = nnx.split(model)
        hits = 0
        for path, leaf in state.flat_state():
            name = ".".join(str(p) for p in path)
            spec = rules.spec_for(name)
            if spec is not None and any(a is not None for a in spec):
                hits += 1
        assert hits > 0, f"no parameter matched TP rules for {mod}"
