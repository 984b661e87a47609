import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer


def make_engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    doc["spec"]["engine"] = "lucy"
    doc["spec"]["model_type"] = "edit"
    tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
    tf["config"]["in_channels"] = 8  # 4 noise + 4 source-latent channels
    path = tmp_path / "lucy-tiny.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path, model_type="edit")
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


def sample_video(n=5, h=32, w=32):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n)]


class TestLucyEdit:
    def test_edit_produces_frames(self, tmp_path):
        eng = make_engine(tmp_path)
        frames = eng.run(
            video=sample_video(), prompt="turn the sky purple", height=32, width=32,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 5
        assert frames[0].shape == (32, 32, 3) and frames[0].dtype == np.uint8

    def test_source_video_changes_output(self, tmp_path):
        eng = make_engine(tmp_path)
        kw = dict(prompt="x", height=32, width=32, num_inference_steps=2,
                  guidance_scale=1.0, seed=7, return_latents=True)
        a = eng.run(video=sample_video(), **kw)
        b = eng.run(video=[255 - f for f in sample_video()], **kw)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_requires_video(self, tmp_path):
        eng = make_engine(tmp_path)
        with pytest.raises(ValueError, match="video"):
            eng.run(prompt="x", height=32, width=32, num_inference_steps=1,
                    guidance_scale=1.0)

    def test_frame_snapping(self, tmp_path):
        eng = make_engine(tmp_path)
        frames = eng.run(
            video=sample_video(6), prompt="a", height=32, width=32,
            num_inference_steps=1, guidance_scale=1.0, seed=1,
        )
        assert len(frames) == 5  # 6 → snapped to 4k+1 = 5 (t_scale 2 → 2k+1... tiny VAE)
