import numpy as np
import pytest

from apex_studio_tpu.postprocess.base import postprocessor_registry, run_postprocessor
from apex_studio_tpu.preprocess.base import preprocessor_registry, run_preprocessor


def sample_frame(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    frame = np.zeros((h, w, 3), np.uint8)
    frame[16:48, 16:48] = [200, 50, 50]  # a square with clear edges
    frame += rng.integers(0, 20, (h, w, 3), dtype=np.uint8)
    return frame


class TestPreprocessors:
    def test_registry_has_basics(self):
        for name in ("canny", "blur", "grayscale", "invert", "lineart",
                     "scribble", "pixel", "threshold", "tile"):
            assert name in preprocessor_registry

    @pytest.mark.parametrize(
        "name", ["canny", "blur", "grayscale", "invert", "lineart", "scribble",
                 "pixel", "threshold", "tile"]
    )
    def test_every_basic_preprocessor_runs(self, name):
        out = run_preprocessor(name, sample_frame())
        assert len(out) == 1
        assert out[0].shape == (64, 64, 3) and out[0].dtype == np.uint8

    def test_canny_finds_edges(self):
        out = run_preprocessor("canny", sample_frame())[0]
        assert out.max() == 255  # edges present
        assert (out > 0).mean() < 0.5  # but sparse

    def test_video_maps_over_frames(self):
        frames = [sample_frame(seed=i) for i in range(4)]
        seen = []
        out = run_preprocessor(
            "grayscale", frames, progress_callback=lambda p, m, md: seen.append(p)
        )
        assert len(out) == 4
        assert seen[-1] == 1.0

    def test_invert_roundtrip(self):
        f = sample_frame()
        out = run_preprocessor("invert", run_preprocessor("invert", f))[0]
        np.testing.assert_array_equal(out, f)


class TestFrameInterpolation:
    def _moving_square(self, n=3, shift=6):
        frames = []
        for i in range(n):
            f = np.zeros((64, 64, 3), np.uint8)
            x = 10 + i * shift
            f[20:40, x : x + 20] = 255
            frames.append(f)
        return frames

    def test_doubles_frame_count(self):
        frames = self._moving_square(3)
        out = run_postprocessor("frame_interpolation", frames, {"multiplier": 2})
        assert len(out) == 5  # n + (n-1)*(m-1)

    def test_midframe_tracks_motion(self):
        frames = self._moving_square(2, shift=10)
        out = run_postprocessor("frame_interpolation", frames, {"multiplier": 2})
        mid = out[1]
        # centroid of the bright region should be between the endpoints
        xs = np.where(mid.mean(-1) > 100)[1]
        c0 = np.where(frames[0].mean(-1) > 100)[1].mean()
        c1 = np.where(frames[1].mean(-1) > 100)[1].mean()
        assert c0 < xs.mean() < c1

    def test_blend_fallback(self):
        frames = self._moving_square(2)
        out = run_postprocessor("blend", frames, {"multiplier": 4})
        assert len(out) == 5

    def test_rife_alias(self):
        assert "rife" in postprocessor_registry

    def test_single_frame_passthrough(self):
        frames = self._moving_square(1)
        out = run_postprocessor("frame_interpolation", frames, {"multiplier": 2})
        assert len(out) == 1


class TestPromptExtension:
    def test_generate_with_tiny_lm(self):
        import jax.numpy as jnp

        from apex_studio_tpu.models.text_encoders.qwen3 import Qwen3Config, Qwen3TextEncoder
        from apex_studio_tpu.prompt_extension import PromptExtender
        from tests.test_engine_zimage import make_tokenizer

        cfg = Qwen3Config(vocab_size=64, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=1, num_attention_heads=4,
                          num_key_value_heads=2, head_dim=8)
        model = Qwen3TextEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        ext = PromptExtender(model, make_tokenizer())
        out = ext.generate("a cat", max_new_tokens=4, temperature=0.0)
        assert isinstance(out, str) and len(out) > 0

    def test_greedy_deterministic(self):
        import jax.numpy as jnp

        from apex_studio_tpu.models.text_encoders.qwen3 import Qwen3Config, Qwen3TextEncoder
        from apex_studio_tpu.prompt_extension import PromptExtender
        from tests.test_engine_zimage import make_tokenizer

        cfg = Qwen3Config(vocab_size=64, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=1, num_attention_heads=4,
                          num_key_value_heads=2, head_dim=8)
        model = Qwen3TextEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        ext = PromptExtender(model, make_tokenizer())
        a = ext.generate("hello world", max_new_tokens=3, temperature=0.0)
        b = ext.generate("hello world", max_new_tokens=3, temperature=0.0)
        assert a == b


class TestKVCachedDecode:
    """prefill + decode_step must reproduce the full-forward logits exactly
    (the O(1)-per-token path prompt extension now uses)."""

    def _model(self):
        import jax.numpy as jnp

        from apex_studio_tpu.models.text_encoders.qwen3 import (
            Qwen3Config,
            Qwen3TextEncoder,
        )

        cfg = Qwen3Config(vocab_size=64, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, head_dim=8)
        return Qwen3TextEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)

    def test_prefill_matches_full_forward(self):
        import jax.numpy as jnp

        m = self._model()
        ids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
        mask = jnp.ones_like(ids)
        full = np.asarray(m(ids, attention_mask=mask, normalize_last=True))
        pre, caches = m.prefill(ids, mask, cache_len=16)
        np.testing.assert_allclose(np.asarray(pre), full, atol=1e-5)
        assert len(caches) == 2
        assert caches[0][0].shape == (1, 16, 2, 8)

    def test_decode_step_matches_recompute(self):
        import jax.numpy as jnp

        m = self._model()
        prefix = np.arange(1, 9)
        nxt = [11, 7, 30]
        # reference: full forward over prefix+generated each time
        seq = list(prefix)
        ref_logits = []
        for tok in nxt:
            seq.append(tok)
            ids = jnp.asarray(np.asarray(seq)[None], jnp.int32)
            h = m(ids, attention_mask=jnp.ones_like(ids), normalize_last=True)
            ref_logits.append(np.asarray(h[0, -1]))
        # cached path
        ids = jnp.asarray(prefix[None], jnp.int32)
        _, caches = m.prefill(ids, jnp.ones_like(ids), cache_len=16)
        pos = len(prefix)
        got = []
        for tok in nxt:
            h, caches = m.decode_step(jnp.asarray([[tok]], jnp.int32),
                                      jnp.int32(pos), caches)
            got.append(np.asarray(h[0, 0]))
            pos += 1
        for g, r in zip(got, ref_logits):
            np.testing.assert_allclose(g, r, atol=1e-5)

    def test_generate_cached_equals_fallback(self):
        """End-to-end: the KV-cached generate must output the same greedy
        tokens as the padded-recompute fallback."""
        from apex_studio_tpu.prompt_extension import PromptExtender
        from tests.test_engine_zimage import make_tokenizer

        m = self._model()
        ext = PromptExtender(m, make_tokenizer())
        cached = ext.generate("a red fox", max_new_tokens=5, temperature=0.0)
        fallback = ext.generate("a red fox", max_new_tokens=5, temperature=0.0,
                                use_cache=False)
        assert cached == fallback
