"""pose2d / face2d / animalpose (wan-animate conditioning family).

Reference: src/preprocess/pose2d/__init__.py:45 (process, modes pose|face),
src/preprocess/face2d/__init__.py, src/preprocess/dwpose/__init__.py:358
(AnimalPoseDetector). The DWPose runner is faked so no checkpoints are needed;
the geometry/rendering paths are exercised for real.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from apex_studio_tpu.preprocess.pose2d import (
    AnimalPosePreprocessor,
    Face2DPreprocessor,
    Pose2DPreprocessor,
    draw_aapose,
    get_face_bbox,
    resize_by_area,
    wholebody_to_aa,
)


class FakeRunner:
    """Deterministic 133-kpt pose spread across the frame."""

    def __init__(self, h=480, w=832):
        rng = np.random.default_rng(0)
        self.pts = rng.uniform([w * 0.25, h * 0.25], [w * 0.75, h * 0.75],
                               size=(133, 2)).astype(np.float32)
        self.score = np.full(133, 0.9, np.float32)

    def detect_people(self, bgr, conf=0.3):
        h, w = bgr.shape[:2]
        return np.array([[w * 0.2, h * 0.2, w * 0.8, h * 0.8]], np.float32)

    def pose_one(self, bgr, box):
        return self.pts.copy(), self.score.copy()


def test_resize_by_area_divisor_and_area():
    img = np.zeros((720, 1280, 3), np.uint8)
    out = resize_by_area(img, 832 * 480, divisor=16)
    h, w = out.shape[:2]
    assert h % 16 == 0 and w % 16 == 0
    # area within one divisor-step of the target
    assert abs(h * w - 832 * 480) / (832 * 480) < 0.15
    # aspect preserved approximately
    assert abs((w / h) - (1280 / 720)) < 0.2


def test_wholebody_to_aa_neck_is_shoulder_midpoint():
    pts = np.zeros((133, 2), np.float32)
    score = np.ones(133, np.float32)
    pts[5] = [10.0, 20.0]   # left shoulder
    pts[6] = [30.0, 40.0]   # right shoulder
    body, lh, rh = wholebody_to_aa(pts, score)
    assert body.shape == (20, 3)
    np.testing.assert_allclose(body[1, :2], [(10 + 30) / 2, (20 + 40) / 2])
    assert lh.shape == (21, 3) and rh.shape == (21, 3)


def test_draw_aapose_renders_and_head_toggle():
    rng = np.random.default_rng(1)
    body = np.concatenate([rng.uniform(20, 200, (20, 2)),
                           np.ones((20, 1))], axis=1).astype(np.float32)
    hand = np.concatenate([rng.uniform(20, 200, (21, 2)),
                           np.ones((21, 1))], axis=1).astype(np.float32)
    canvas = np.zeros((256, 256, 3), np.uint8)
    out = draw_aapose(canvas, body, hand, hand)
    assert out.sum() > 0
    no_head = draw_aapose(np.zeros((256, 256, 3), np.uint8), body, hand, hand,
                          draw_head=False)
    assert no_head.sum() < out.sum()


def test_get_face_bbox_asymmetric_vertical():
    face = np.array([[100, 100], [140, 100], [100, 140], [140, 140]], np.float32)
    x1, x2, y1, y2 = get_face_bbox(face, scale=1.3, image_shape=(480, 832))
    assert x1 < 100 and x2 > 140
    # upward expansion is 3x the downward one
    assert (100 - y1) > (y2 -140)


def test_pose2d_end_to_end():
    p = Pose2DPreprocessor(runner=FakeRunner())
    frame = np.full((720, 1280, 3), 128, np.uint8)
    out = p.process_frame(frame)
    assert out.ndim == 3 and out.shape[2] == 3
    assert out.shape[0] % 16 == 0 and out.shape[1] % 16 == 0
    assert out.sum() > 0  # skeleton drawn


def test_face2d_returns_512():
    p = Face2DPreprocessor(runner=FakeRunner())
    frame = np.full((720, 1280, 3), 128, np.uint8)
    out = p.process_frame(frame)
    assert out.shape == (512, 512, 3)


def test_animalpose_draws_on_detection(monkeypatch):
    p = AnimalPosePreprocessor(runner=FakeRunner())
    monkeypatch.setattr(
        p, "_detect_animals",
        lambda bgr, conf=0.3: np.array([[10, 10, 200, 200]], np.float32))
    out = p.process_frame(np.full((240, 320, 3), 90, np.uint8))
    assert out.shape == (240, 320, 3)
    assert out.sum() > 0


def test_registry_and_manifests():
    from apex_studio_tpu.preprocess import preprocessor_registry
    from apex_studio_tpu.preprocess.manifests import load_preprocessor_manifests

    for name in ("pose2d", "face2d", "animalpose"):
        assert name in preprocessor_registry
    mans = load_preprocessor_manifests()
    for name in ("pose2d", "face2d", "animalpose"):
        assert name in mans, name


def test_reference_preprocessor_id_coverage():
    """Every preprocessor id the reference ships a manifest for
    (apps/api/manifest/preprocessor/*.yml, 45 stems) resolves here — as a
    first-party implementation, an HF delegation, or an honestly
    dependency-gated entry with its own manifest."""
    import yaml
    import pathlib

    from apex_studio_tpu.preprocess import preprocessor_registry
    from apex_studio_tpu.preprocess.manifests import load_preprocessor_manifests

    ref_ids = [
        "animalpose", "anime_face_segment", "binary", "canny", "color",
        "densepose", "depth_anything", "depth_anything_v2", "diffusion_edge",
        "dsine", "dwpose", "dwpose_nlf", "face2d", "hed", "leres", "lineart",
        "lineart_anime", "lineart_standard", "manga_line", "mediapipe_face",
        "mesh_graphormer", "metric3d", "midas", "mlsd", "normalbae",
        "oneformer", "open_pose", "pidi", "pose2d", "ptlflow", "pyracanny",
        "recolor", "rembg", "scribble", "scribble_anime", "scribble_xdog",
        "shuffle", "teed", "tile", "tile_gf", "tile_simple", "uniformer",
        "unimatch", "zoe", "zoe_depth_anything",
    ]
    assert len(ref_ids) == 45
    missing = [i for i in ref_ids if i not in preprocessor_registry]
    assert not missing, missing
    mans = load_preprocessor_manifests()
    no_manifest = [i for i in ref_ids if i not in mans]
    assert not no_manifest, no_manifest


def test_dwpose_nlf_with_tiny_estimator():
    """dwpose_nlf with an NLF model wired: capsule body render + 2D
    hands/face overlay (no checkpoint needed — tiny random crop model)."""
    from flax import nnx

    from apex_studio_tpu.preprocess import nlf as jnlf
    from apex_studio_tpu.preprocess.pose2d import DWPoseNLFPreprocessor

    p = DWPoseNLFPreprocessor(runner=FakeRunner())
    model = jnlf.NLFCropModel(jnlf.NLFConfig.tiny(), nnx.Rngs(0))
    rng = np.random.default_rng(0)
    model.canonical.value = jnp.asarray(
        rng.normal(size=(model.cfg.n_points, 3)).astype(np.float32))
    p._nlf = jnlf.NLFEstimator(model)
    out = p.process_frame(np.full((240, 320, 3), 100, np.uint8))
    assert out.shape == (240, 320, 3)
    assert out.sum() > 0  # at least the 2D overlay rendered


def test_dwpose_nlf_fallback_without_checkpoint(monkeypatch):
    from apex_studio_tpu.preprocess.pose2d import DWPoseNLFPreprocessor

    monkeypatch.delenv("APEX_NLF_PATH", raising=False)
    p = DWPoseNLFPreprocessor(runner=FakeRunner())
    monkeypatch.setattr(
        "apex_studio_tpu.preprocess.weights.find_local", lambda stem: None)
    p.setup()
    assert p._nlf is None and p._nlf_missing
    out = p.process_frame(np.full((240, 320, 3), 100, np.uint8))
    assert out.shape == (240, 320, 3) and out.sum() > 0
