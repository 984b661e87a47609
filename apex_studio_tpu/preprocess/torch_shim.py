"""Pure-torch registrations for the ``torchvision::*`` builtins TorchScript
exports call into.

The reference runs DensePose as a TorchScript export whose graph invokes the
``torchvision::nms`` builtin, so it imports torchvision solely to populate the
op registry (reference ``src/preprocess/densepose/__init__.py:1`` — "Fix issue
Unknown builtin op: torchvision::nms"). This environment has no torchvision
wheel; the graphs only need the two detection ops, which are a few dozen lines
of plain torch. Registering them through ``torch.library`` puts real dispatcher
ops behind the same names, which is all the TorchScript runtime resolves
against — published exports then load and execute unmodified.

Semantics match the torchvision references:
- ``nms(dets, scores, iou_threshold)``: greedy descending-score suppression on
  [N, 4] xyxy boxes → kept indices (int64), torchvision.ops.nms contract.
- ``roi_align(input, rois, spatial_scale, h, w, sampling_ratio, aligned)``:
  Mask R-CNN bilinear ROI pooling, including the ``aligned=True`` half-pixel
  shift (torchvision.ops.roi_align contract).
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_INSTALLED = False


def _nms_impl(dets, scores, iou_threshold: float):
    import torch

    if dets.numel() == 0:
        return torch.empty((0,), dtype=torch.int64, device=dets.device)
    x1, y1, x2, y2 = dets.unbind(dim=1)
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.maximum(x1[i], x1[rest])
        yy1 = torch.maximum(y1[i], y1[rest])
        xx2 = torch.minimum(x2[i], x2[rest])
        yy2 = torch.minimum(y2[i], y2[rest])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[rest] - inter)
        order = rest[iou <= iou_threshold]
    return torch.stack(keep).to(torch.int64)


def _roi_align_impl(inp, rois, spatial_scale: float, pooled_h: int,
                    pooled_w: int, sampling_ratio: int, aligned: bool):
    """Bilinear ROI align on [N, C, H, W] with rois [K, 5] (batch_idx, xyxy)."""
    import torch

    n, c, h, w = inp.shape
    k = rois.shape[0]
    out = inp.new_zeros((k, c, pooled_h, pooled_w))
    if k == 0:
        return out
    offset = 0.5 if aligned else 0.0
    for r in range(k):
        b = int(rois[r, 0].item())
        x1 = rois[r, 1] * spatial_scale - offset
        y1 = rois[r, 2] * spatial_scale - offset
        x2 = rois[r, 3] * spatial_scale - offset
        y2 = rois[r, 4] * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:  # legacy clamp: rois of zero size get unit extent
            roi_w = roi_w.clamp(min=1.0)
            roi_h = roi_h.clamp(min=1.0)
        bin_w = roi_w / pooled_w
        bin_h = roi_h / pooled_h
        sr_h = sampling_ratio if sampling_ratio > 0 else max(
            int(torch.ceil(roi_h / pooled_h).item()), 1)
        sr_w = sampling_ratio if sampling_ratio > 0 else max(
            int(torch.ceil(roi_w / pooled_w).item()), 1)
        # sample grid: for each output bin, sr_h x sr_w bilinear taps
        iy = torch.arange(pooled_h, device=inp.device, dtype=inp.dtype)
        ix = torch.arange(pooled_w, device=inp.device, dtype=inp.dtype)
        sy = torch.arange(sr_h, device=inp.device, dtype=inp.dtype)
        sx = torch.arange(sr_w, device=inp.device, dtype=inp.dtype)
        ys = (y1 + (iy[:, None] + (sy[None, :] + 0.5) / sr_h) * bin_h).reshape(-1)
        xs = (x1 + (ix[:, None] + (sx[None, :] + 0.5) / sr_w) * bin_w).reshape(-1)
        # bilinear gather at (ys, xs) over the full feature map
        ys = ys.clamp(min=0, max=h - 1)
        xs = xs.clamp(min=0, max=w - 1)
        y0 = ys.floor().long().clamp(max=h - 1)
        x0 = xs.floor().long().clamp(max=w - 1)
        y1i = (y0 + 1).clamp(max=h - 1)
        x1i = (x0 + 1).clamp(max=w - 1)
        ly = (ys - y0.to(inp.dtype)).reshape(1, -1, 1)
        lx = (xs - x0.to(inp.dtype)).reshape(1, 1, -1)
        feat = inp[b]  # [C, H, W]
        f00 = feat[:, y0][:, :, x0]
        f01 = feat[:, y0][:, :, x1i]
        f10 = feat[:, y1i][:, :, x0]
        f11 = feat[:, y1i][:, :, x1i]
        val = (f00 * (1 - ly) * (1 - lx) + f01 * (1 - ly) * lx
               + f10 * ly * (1 - lx) + f11 * ly * lx)
        # val: [C, ph*sr_h, pw*sr_w] → average each sr_h x sr_w bin
        val = val.reshape(c, pooled_h, sr_h, pooled_w, sr_w)
        out[r] = val.mean(dim=(2, 4))
    return out


def install_torchvision_ops() -> bool:
    """Register ``torchvision::nms``/``roi_align`` if torchvision is absent.

    Returns True when the ops are available (either torchvision's own or the
    shim's). Idempotent; call before ``torch.jit.load`` of any export that
    references them.
    """
    global _INSTALLED
    try:
        import torchvision  # noqa: F401

        return True
    except ImportError:
        pass
    if _INSTALLED:
        return True
    import torch

    try:
        torch.library.define(
            "torchvision::nms",
            "(Tensor dets, Tensor scores, float iou_threshold) -> Tensor",
        )
        torch.library.impl("torchvision::nms", "CompositeExplicitAutograd")(
            _nms_impl
        )
        torch.library.define(
            "torchvision::roi_align",
            "(Tensor input, Tensor rois, float spatial_scale, int pooled_height,"
            " int pooled_width, int sampling_ratio, bool aligned) -> Tensor",
        )
        torch.library.impl("torchvision::roi_align", "CompositeExplicitAutograd")(
            _roi_align_impl
        )
    except Exception as e:  # already registered by another caller, or old torch
        if "already" not in str(e):
            logger.warning("torchvision op shim registration failed: %s", e)
            return False
    _INSTALLED = True
    return True
