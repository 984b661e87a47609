"""Wan Apex-Framepack long-video engine on tiny random weights
(reference: src/engine/wan/apex_framepack.py, src/transformer/wan/
apex_framepack/)."""

import copy

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer


def _fp_manifest():
    m = copy.deepcopy(WAN_TINY)
    m["metadata"]["id"] = "wan-framepack-tiny-test"
    m["spec"]["model_type"] = "apex_framepack"
    tf = next(c for c in m["spec"]["components"] if c["type"] == "transformer")
    tf["base"] = "wan.apex_framepack"
    tf["config"]["num_indices"] = 3
    tf["config"]["framepack_compressors"] = [[1, [1, 2, 2]], [2, [2, 4, 4]],
                                             [4, [4, 8, 8]]]
    tf["config"]["context_buckets"] = [["F_1", 1, 1], ["F_2", 2, 2],
                                       ["F_4", 16, 4]]
    return m


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("manifests") / "wan-fp-tiny.yml"
    path.write_text(yaml.safe_dump(_fp_manifest()))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestFramepackSchedule:
    def test_covers_all_frames_back_to_front(self):
        from apex_studio_tpu.models.transformers.wan_framepack import (
            FramepackSchedule)

        s = FramepackSchedule(3, (("F_1", 1, 1), ("F_2", 2, 2), ("F_4", 16, 4)))
        den = np.zeros(12, bool)
        order = []
        while not den.all():
            _, _, target = s.get_inference_inputs(12, den)
            order.append(target.tolist())
            den[target] = True
        # anchor first, then windows ending at the back
        assert order[0] == [0, 1]
        assert order[1][-1] == 11
        assert sorted(sum(order, [])) == list(range(12))
        assert len(order) <= s.num_sections(12)

    def test_future_bucket_split(self):
        from apex_studio_tpu.models.transformers.wan_framepack import (
            FramepackSchedule)

        s = FramepackSchedule(3, (("F_1", 1, 1), ("F_2", 2, 2), ("F_4", 16, 4)))
        future = np.arange(5, 12)
        chunks = s.split_future(future)
        # nearest frame full-res, next two at factor 2, rest factor 4
        assert chunks[0][1] == 1 and chunks[0][0].tolist() == [5]
        assert chunks[1][1] == 2 and chunks[1][0].tolist() == [6, 7]
        assert chunks[2][1] == 4 and chunks[2][0].tolist() == [8, 9, 10, 11]


class TestFramepackEngine:
    def test_long_video_sections(self, engine):
        lat = engine.run(
            prompt="a long take", height=32, width=32, num_frames=17,
            num_inference_steps=2, guidance_scale=1.0, seed=0,
            return_latents=True,
        )
        lat = np.asarray(lat)
        assert lat.shape[2] == 9  # (17-1)/2+1 latent frames
        assert np.isfinite(lat).all()

    def test_frames_and_determinism(self, engine):
        common = dict(prompt="loop", height=32, width=32, num_frames=9,
                      num_inference_steps=2, guidance_scale=2.0, seed=3,
                      return_latents=True)
        a = np.asarray(engine.run(**common))
        b = np.asarray(engine.run(**common))
        np.testing.assert_array_equal(a, b)
        frames = engine.run(prompt="loop", height=32, width=32, num_frames=9,
                            num_inference_steps=2, guidance_scale=1.0, seed=3)
        assert len(frames) == 9 and frames[0].shape == (32, 32, 3)
