"""DensePose preprocessor + the pure-torch torchvision-op shim.

The published model is a TorchScript export whose graph calls
``torchvision::nms`` (reference src/preprocess/densepose/__init__.py:1); the
shim registers pure-torch ops under those names so the export runs without
the torchvision wheel. Tests: (1) nms semantics, (2) roi_align vs a
hand-computable case, (3) a scripted stand-in model with the real output
contract executes through the preprocessor end-to-end — proving TorchScript
resolves the shim ops.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from apex_studio_tpu.preprocess.torch_shim import install_torchvision_ops


def setup_module(_m):
    assert install_torchvision_ops()


def test_nms_semantics():
    dets = torch.tensor([
        [0.0, 0.0, 10.0, 10.0],
        [1.0, 1.0, 11.0, 11.0],   # IoU ~0.68 with box 0 → suppressed
        [20.0, 20.0, 30.0, 30.0],
    ])
    scores = torch.tensor([0.9, 0.8, 0.7])
    keep = torch.ops.torchvision.nms(dets, scores, 0.5)
    assert keep.tolist() == [0, 2]
    # low threshold keeps only the best per cluster; high keeps everything
    keep_all = torch.ops.torchvision.nms(dets, scores, 0.95)
    assert keep_all.tolist() == [0, 1, 2]
    empty = torch.ops.torchvision.nms(dets[:0], scores[:0], 0.5)
    assert empty.numel() == 0 and empty.dtype == torch.int64


def test_roi_align_constant_map():
    # constant feature map → every aligned average is that constant
    feat = torch.full((1, 2, 16, 16), 3.0)
    rois = torch.tensor([[0.0, 2.0, 2.0, 10.0, 10.0]])
    out = torch.ops.torchvision.roi_align(feat, rois, 1.0, 4, 4, 2, True)
    assert out.shape == (1, 2, 4, 4)
    assert torch.allclose(out, torch.full_like(out, 3.0), atol=1e-5)


def test_roi_align_linear_ramp():
    # f(x, y) = x: bilinear sampling of a linear ramp is exact, so each output
    # bin equals the x-coordinate of its sampling centroid.
    w = 16
    ramp = torch.arange(w, dtype=torch.float32).expand(w, w)[None, None]
    rois = torch.tensor([[0.0, 4.0, 4.0, 12.0, 12.0]])
    out = torch.ops.torchvision.roi_align(ramp, rois, 1.0, 2, 2, 2, True)
    # aligned=True: x1 = 4-0.5 = 3.5, bin_w = 4; centroids at 5.5, 9.5
    expect = torch.tensor([[5.5, 9.5], [5.5, 9.5]])
    assert torch.allclose(out[0, 0], expect, atol=1e-4), out[0, 0]


class _TinyDensePose(torch.nn.Module):
    """Stand-in with the export's output contract (pred_boxes, coarse_segm,
    fine_segm, u, v) that exercises the shim ops from inside TorchScript."""

    def forward(self, img: torch.Tensor):
        h = img.shape[1]
        w = img.shape[2]
        cx0 = float(w) * 0.25
        cy0 = float(h) * 0.25
        boxes = torch.tensor([
            [cx0, cy0, cx0 + float(w) * 0.5, cy0 + float(h) * 0.5],
            [cx0 + 1.0, cy0 + 1.0, cx0 + float(w) * 0.5, cy0 + float(h) * 0.5],
        ])
        scores = torch.tensor([0.9, 0.5])
        keep = torch.ops.torchvision.nms(boxes, scores, 0.5)
        boxes = boxes[keep]
        feat = img.unsqueeze(0).to(torch.float32) / 255.0
        rois = torch.cat([torch.zeros((boxes.shape[0], 1)), boxes], dim=1)
        pooled = torch.ops.torchvision.roi_align(feat, rois, 1.0, 28, 28, 2, True)
        n = boxes.shape[0]
        coarse = torch.ones((n, 2, 28, 28))  # fg everywhere
        coarse[:, 0] = 0.0
        fine = pooled[:, :1].repeat(1, 25, 1, 1)
        fine[:, 3] += 10.0  # label 3 wins everywhere
        u = torch.linspace(0, 1, 28).expand(n, 25, 28, 28)
        v = torch.linspace(0, 1, 28).reshape(-1, 1).expand(n, 25, 28, 28)
        return boxes, coarse, fine, u, v


def test_densepose_preprocessor_end_to_end(tmp_path):
    from apex_studio_tpu.preprocess.base import preprocessor_registry

    scripted = torch.jit.script(_TinyDensePose())
    path = tmp_path / "densepose_tiny.torchscript"
    torch.jit.save(scripted, str(path))

    cls = preprocessor_registry.get("densepose")
    proc = cls(model_path=str(path))
    proc.setup()
    frame = (np.random.default_rng(0).integers(0, 255, size=(96, 128, 3))
             .astype(np.uint8))
    out = proc.process_frame(frame, detect_resolution=64)
    assert out.shape == (96, 128, 3)
    assert out.dtype == np.uint8
    # viridis background fill (68, 1, 84) outside detections, part color inside
    colors = np.unique(out.reshape(-1, 3), axis=0)
    assert len(colors) >= 2
    assert (out == np.array([68, 1, 84])).all(axis=-1).any()


def test_densepose_registry_id():
    from apex_studio_tpu.preprocess.base import preprocessor_registry

    assert preprocessor_registry.get("densepose") is not None
    assert preprocessor_registry.get("DenseposeDetector") is not None
