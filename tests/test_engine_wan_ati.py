"""Wan ATI trajectory-to-video engine on tiny weights (reference:
src/engine/wan/ati.py, src/helpers/wan/ati.py)."""

import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer


def _engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    doc["metadata"]["id"] = "wan-ati-tiny"
    doc["spec"]["model_type"] = "ati"
    tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
    tf["config"]["in_channels"] = 10  # 4 noise + 2 mask + 4 cond latents
    tf["config"]["image_dim"] = 16
    tf["config"]["added_kv_proj_dim"] = 48
    doc["spec"]["components"].append(
        {"type": "helper", "name": "image_encoder", "base": "CLIPVisionModel",
         "config": {"hidden_size": 16, "intermediate_size": 32,
                    "num_hidden_layers": 2, "num_attention_heads": 2,
                    "image_size": 28, "patch_size": 14}})
    path = tmp_path / "wan-ati.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path)
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


class TestTrajectoryOps:
    def test_process_tracks_resamples_121(self):
        from apex_studio_tpu.models.trajectory import process_tracks

        raw = np.random.default_rng(0).uniform(0, 256, size=(121, 5, 3))
        out = process_tracks(raw, (64, 48))
        assert out.shape == (81, 5, 4)
        # trange column spans [-1, 1]
        assert out[0, 0, 0] == pytest.approx(-1.0)
        assert out[-1, 0, 0] == pytest.approx(1.0)

    def test_patch_motion_shapes_and_mask(self):
        from apex_studio_tpu.models.trajectory import patch_motion

        T, H, W, N = 5, 8, 8, 3
        rng = np.random.default_rng(1)
        vid = rng.standard_normal((2 + 4, T, H, W)).astype(np.float32)
        rows = 1 + 2 * (T - 1)
        tracks = np.concatenate(
            [np.linspace(-1, 1, rows)[:, None, None] * np.ones((rows, N, 1)),
             rng.uniform(-0.9, 0.9, size=(rows, N, 2)),
             np.ones((rows, N, 1))], axis=-1).astype(np.float32)
        out = np.asarray(patch_motion(tracks, vid, vae_divide=(2, 4),
                                      frames_per_latent=2))
        assert out.shape == vid.shape
        # mask channels are identical copies; first frame mask is all-ones
        assert np.allclose(out[0], out[1])
        assert np.allclose(out[0, 0], 1.0)
        # first-frame features pass through untouched
        assert np.allclose(out[2:, 0], vid[2:, 0])

    def test_invisible_tracks_leave_latent_unchanged(self):
        from apex_studio_tpu.models.trajectory import patch_motion

        T, H, W, N = 3, 6, 6, 2
        rng = np.random.default_rng(2)
        vid = rng.standard_normal((2 + 4, T, H, W)).astype(np.float32)
        rows = 1 + 2 * (T - 1)
        tracks = np.zeros((rows, N, 4), np.float32)  # visible = 0
        out = np.asarray(patch_motion(tracks, vid, vae_divide=(2, 4),
                                      frames_per_latent=2))
        assert np.allclose(out[2:], vid[2:], atol=1e-5)
        # splat weight is zero everywhere after the first frame
        assert np.allclose(out[0, 1:], 0.0, atol=1e-6)


class TestATIEngine:
    def test_trajectory_generation(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        # raw pixel tracks: one row per pixel frame, N=4 points, (x, y, vis)
        num_frames = 9
        traj = np.stack([
            np.stack([np.linspace(4, 28, num_frames),
                      np.full(num_frames, 8.0 + 4 * i),
                      np.ones(num_frames)], axis=-1)
            for i in range(4)], axis=1) * 8.0  # quant_multi pre-scaling
        frames = eng.run(
            image=img, prompt="a sliding block", trajectory=traj,
            height=32, width=32, num_frames=num_frames,
            num_inference_steps=2, guidance_scale=1.0, seed=7,
        )
        assert len(frames) == num_frames
        assert all(f.shape == (32, 32, 3) for f in frames)

    def test_trajectory_changes_output(self, tmp_path):
        eng = _engine(tmp_path)
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        kw = dict(image=img, prompt="x", height=32, width=32, num_frames=5,
                  num_inference_steps=1, guidance_scale=1.0, seed=1,
                  return_latents=True)
        base = np.asarray(eng.run(**kw))
        traj = np.full((5, 2, 3), 8.0 * 16.0, np.float32)  # visible points
        moved = np.asarray(eng.run(trajectory=traj, **kw))
        assert not np.allclose(base, moved)
