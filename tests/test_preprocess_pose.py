"""OpenPose body (JAX) — topology, converter mapping, PAF decoding, rendering
(reference: src/preprocess/open_pose/, pose role of dwpose)."""

import numpy as np
import pytest
from flax import nnx
import jax.numpy as jnp

from apex_studio_tpu.loaders.state_mapping import apply_state_dict
from apex_studio_tpu.preprocess.base import preprocessor_registry
from apex_studio_tpu.preprocess.openpose import (
    _TRUNK,
    LIMB_SEQ,
    N_HEAT,
    N_PAF,
    OpenPoseBody,
    OpenPoseConfig,
    OpenPosePreprocessor,
    assemble_people,
    convert_openpose_keys,
    find_peaks,
    render_pose,
)

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def tiny():
    return OpenPoseBody(OpenPoseConfig.tiny(), rngs=nnx.Rngs(0))


def test_forward_shapes(tiny):
    x = jnp.asarray(RNG.normal(size=(1, 64, 48, 3)), jnp.float32)
    paf, heat = tiny(x)
    # stride 8 (three maxpools)
    assert paf.shape == (1, 8, 6, N_PAF)
    assert heat.shape == (1, 8, 6, N_HEAT)


def test_converter_full_key_map():
    """Every published-checkpoint layer name maps onto a model path, and a
    full-size model loads it strictly."""
    cfg = OpenPoseConfig(stages=6, trunk_width=1.0)
    model = OpenPoseBody(cfg, rngs=nnx.Rngs(0))

    sd = {}

    def add(prefix, layer, cout, cin, k):
        sd[f"{prefix}.{layer}.weight"] = np.zeros((cout, cin, k, k), np.float32)
        sd[f"{prefix}.{layer}.bias"] = np.zeros((cout,), np.float32)

    for name, cin, cout, k in [s for s in _TRUNK if s[0] != "pool"]:
        add("model0", name, cout, cin, k)
    for L, ch in (("L1", N_PAF), ("L2", N_HEAT)):
        widths = [(128, 128, 3), (128, 128, 3), (128, 128, 3), (512, 128, 1), (ch, 512, 1)]
        for i, (cout, cin, k) in enumerate(widths):
            add(f"model1_{1 if L == 'L1' else 2}", f"conv5_{i + 1}_CPM_{L}", cout, cin, k)
        for stage in range(2, 7):
            widths = [(128, 185, 7)] + [(128, 128, 7)] * 4 + [(128, 128, 1), (ch, 128, 1)]
            for i, (cout, cin, k) in enumerate(widths):
                add(f"model{stage}_{1 if L == 'L1' else 2}",
                    f"Mconv{i + 1}_stage{stage}_{L}", cout, cin, k)
    mapped = convert_openpose_keys(sd)
    assert len(mapped) == len(sd)
    apply_state_dict(model, mapped, strict=True)


def test_peak_finding_and_assembly():
    h, w = 64, 64
    heat = np.zeros((h, w, N_HEAT), np.float32)
    paf = np.zeros((h, w, N_PAF), np.float32)
    # person: neck (part 1) at (20, 20), right shoulder (part 2) at (40, 20)
    yy, xx = np.mgrid[0:h, 0:w]
    heat[..., 1] = np.exp(-((xx - 20) ** 2 + (yy - 20) ** 2) / 8.0)
    heat[..., 2] = np.exp(-((xx - 40) ** 2 + (yy - 20) ** 2) / 8.0)
    # PAF for limb (1,2) is channels (12,13): unit x-vector along the segment
    band = (np.abs(yy - 20) <= 2) & (xx >= 18) & (xx <= 42)
    paf[..., 12][band] = 1.0
    peaks = find_peaks(heat, thresh=0.3)
    assert len(peaks[1]) == 1 and len(peaks[2]) == 1
    assert peaks[1][0][:2] == (20, 20)
    people = assemble_people(peaks, paf)
    # only 2 parts → filtered as noise unless a third part joins; relax via
    # adding left shoulder (part 5) linked by limb (1,5) channels (20,21)
    heat[..., 5] = np.exp(-((xx - 8) ** 2 + (yy - 20) ** 2) / 8.0)
    band2 = (np.abs(yy - 20) <= 2) & (xx >= 6) & (xx <= 22)
    paf[..., 20][band2] = -1.0  # neck→left-shoulder points in -x
    peaks = find_peaks(heat, thresh=0.3)
    people = assemble_people(peaks, paf)
    assert len(people) == 1
    assert people[0][1] == (20, 20)
    assert people[0][2] == (40, 20)
    assert people[0][5] == (8, 20)


def test_render_pose():
    people = [{1: (20, 20), 2: (40, 20), 5: (8, 20)}]
    img = render_pose(people, 64, 64)
    assert img.shape == (64, 64, 3)
    assert img.sum() > 0  # something was drawn


def test_preprocessor_end_to_end(tiny):
    proc = OpenPosePreprocessor(model=tiny)
    frame = RNG.integers(0, 256, size=(72, 56, 3), dtype=np.uint8)
    out = proc(frame, detect_resolution=48)
    assert out[0].shape == (72, 56, 3)
    assert out[0].dtype == np.uint8


def test_registry():
    assert preprocessor_registry.get("openpose") is OpenPosePreprocessor
    assert preprocessor_registry.get("pose") is OpenPosePreprocessor


class TestDWPose:
    def test_yolox_decode_and_nms(self):
        from apex_studio_tpu.preprocess.dwpose import _nms, _yolox_decode

        n = (80 * 80 + 40 * 40 + 20 * 20)
        pred = np.zeros((n, 85), np.float32)
        # one confident person at grid (10, 10) of stride 8
        idx = 10 * 80 + 10
        pred[idx, :2] = 0.5       # offset
        pred[idx, 2:4] = np.log(5.0)  # wh = 40 px
        pred[idx, 4] = 5.0        # obj logit-ish (already prob in export? value)
        pred[idx, 5] = 1.0
        dets = _yolox_decode(pred)
        best = dets[dets[:, 4].argmax()]
        assert abs(best[0] - (10.5 * 8 - 20)) < 1e-3
        assert abs(best[2] - (10.5 * 8 + 20)) < 1e-3
        assert int(best[5]) == 0
        # NMS keeps one of two near-identical boxes
        two = np.array([[0, 0, 10, 10, 0.9, 0], [1, 1, 11, 11, 0.8, 0],
                        [50, 50, 60, 60, 0.7, 0]], np.float32)
        keep = _nms(two)
        assert 0 in keep and 2 in keep and 1 not in keep

    def test_draw_wholebody_renders(self):
        from apex_studio_tpu.preprocess.dwpose import draw_wholebody

        pts = np.zeros((133, 2), np.float32)
        score = np.ones(133, np.float32)
        # simple upright body
        pts[0] = (32, 10)   # nose
        pts[5], pts[6] = (24, 20), (40, 20)  # shoulders
        pts[11], pts[12] = (26, 40), (38, 40)  # hips
        pts[91:112] = np.linspace((5, 50), (15, 60), 21)
        pts[112:133] = np.linspace((50, 50), (60, 60), 21)
        pts[23:91] = np.linspace((28, 8), (36, 16), 68)
        img = draw_wholebody([(pts, score)], 64, 64)
        assert img.shape == (64, 64, 3)
        assert img.sum() > 0

    def test_registry_has_dwpose(self):
        from apex_studio_tpu.preprocess.base import preprocessor_registry

        assert "dwpose" in preprocessor_registry
