import numpy as np
import pytest
import requests

from apex_studio_tpu.mask.segment import (
    mask_from_box,
    mask_from_points,
    mask_to_contours,
    track_mask,
)


def scene(h=96, w=96, cx=48, cy=48, r=18):
    """Bright disk on a dark noisy background."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 30, (h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[:h, :w]
    disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    img[disk] = [220, 60, 60]
    return img, disk


class TestMaskCreate:
    def test_touch_point_segments_object(self):
        img, disk = scene()
        mask = mask_from_points(img, [{"x": 48, "y": 48}])
        inter = np.logical_and(mask > 0, disk).sum()
        union = np.logical_or(mask > 0, disk).sum()
        assert inter / union > 0.6, f"IoU {inter / union:.2f}"

    def test_box_segments_object(self):
        img, disk = scene()
        mask = mask_from_box(img, {"x1": 25, "y1": 25, "x2": 72, "y2": 72})
        inter = np.logical_and(mask > 0, disk).sum()
        union = np.logical_or(mask > 0, disk).sum()
        assert inter / union > 0.6

    def test_negative_points_exclude(self):
        img, _ = scene()
        # second object
        img[10:25, 10:25] = [60, 220, 60]
        mask = mask_from_points(
            img,
            [{"x": 48, "y": 48}, {"x": 17, "y": 17}],
            point_labels=[1, 0],
        )
        assert mask[17, 17] == 0
        assert mask[48, 48] == 1

    def test_lasso(self):
        img, disk = scene()
        pts = [
            {"x": 48 + 24 * np.cos(a), "y": 48 + 24 * np.sin(a)}
            for a in np.linspace(0, 2 * np.pi, 12, endpoint=False)
        ]
        mask = mask_from_points(img, pts, tool="lasso")
        assert mask[48, 48] == 1

    def test_contour_format(self):
        img, _ = scene()
        mask = mask_from_points(img, [{"x": 48, "y": 48}])
        contours = mask_to_contours(mask)
        assert len(contours) >= 1
        assert all(len(c) % 2 == 0 and len(c) >= 6 for c in contours)


class TestMaskTracking:
    def _video(self, n=5, shift=4):
        frames, centers = [], []
        for i in range(n):
            img, _ = scene(cx=30 + i * shift)
            frames.append(img)
            centers.append(30 + i * shift)
        return frames, centers

    def test_forward_tracking_follows_motion(self):
        frames, centers = self._video()
        m0 = mask_from_points(frames[0], [{"x": centers[0], "y": 48}])
        masks = track_mask(frames, m0, start_frame=0, direction="forward")
        assert set(masks) == set(range(5))
        last = masks[4]
        assert last[48, centers[4]] == 1  # mask followed the disk
        assert last[48, centers[0] - 12] == 0  # and left the start position

    def test_backward_tracking(self):
        frames, centers = self._video()
        m_last = mask_from_points(frames[-1], [{"x": centers[-1], "y": 48}])
        masks = track_mask(frames, m_last, start_frame=4, direction="backward")
        assert masks[0][48, centers[0]] == 1


class TestMaskRoutes:
    def test_create_route(self, server, tmp_path):
        from PIL import Image

        img, _ = scene()
        p = tmp_path / "scene.png"
        Image.fromarray(img).save(p)
        r = requests.post(
            server + "/mask/create",
            json={"input_path": str(p), "points": [{"x": 48, "y": 48}], "tool": "touch"},
        )
        assert r.ok, r.text
        out = r.json()
        assert out["status"] == "success"
        assert len(out["contours"]) >= 1

    def test_create_requires_prompt(self, server, tmp_path):
        from PIL import Image

        img, _ = scene()
        p = tmp_path / "scene2.png"
        Image.fromarray(img).save(p)
        r = requests.post(server + "/mask/create", json={"input_path": str(p)})
        assert r.status_code == 400

    def test_track_route(self, server, tmp_path):
        from apex_studio_tpu.utils.media import save_video
        from tests.test_server import _wait_job

        frames = []
        for i in range(4):
            img, _ = scene(cx=30 + i * 5)
            frames.append(img)
        p = tmp_path / "clip.mp4"
        save_video(frames, p, fps=8)

        r = requests.post(
            server + "/mask/track",
            json={
                "input_path": str(p),
                "frame_number": 0,
                "points": [{"x": 30, "y": 48}],
                "direction": "forward",
            },
        )
        assert r.ok, r.text
        job_id = r.json()["job_id"]
        st = _wait_job(server, job_id)
        assert st["status"] == "complete"
        res = requests.get(server + f"/mask/track/result/{job_id}").json()
        assert len(res["result"]["contours_by_frame"]) == 4


class TestShapeTracking:
    """/mask/track/shapes — NDJSON per-frame oriented-rect streaming
    (reference api/mask.py:888)."""

    def _clip(self, tmp_path, n=4, shift=5):
        from apex_studio_tpu.utils.media import save_video

        frames = [scene(cx=30 + i * shift)[0] for i in range(n)]
        p = tmp_path / "shapes_clip.mp4"
        save_video(frames, p, fps=8)
        return p

    def test_bounds_from_contours(self):
        from apex_studio_tpu.mask.segment import (
            mask_to_contours,
            shape_bounds_from_contours,
        )

        img, disk = scene()
        contours = mask_to_contours(disk.astype("uint8"))
        b = shape_bounds_from_contours(contours, "rectangle")
        assert b["shapeType"] == "rectangle"
        # disk of radius 18 centred at (48,48): top-left pivot near (30,30)
        assert abs(b["x"] - 30) < 4 and abs(b["y"] - 30) < 4
        assert abs(b["width"] - 36) < 5 and abs(b["height"] - 36) < 5
        e = shape_bounds_from_contours(contours, "ellipse")
        assert e["shapeType"] == "ellipse"
        assert abs(e["x"] - 48) < 3 and abs(e["y"] - 48) < 3
        s = shape_bounds_from_contours(contours, "star")
        assert s["width"] == s["height"]
        pg = shape_bounds_from_contours(contours, "polygon")
        assert abs(pg["width"] / pg["height"] - 1.1543665517482078) < 1e-6
        assert shape_bounds_from_contours([], "rectangle") is None

    def test_stream_route(self, server, tmp_path):
        import json

        p = self._clip(tmp_path)
        r = requests.post(
            server + "/mask/track/shapes",
            json={
                "input_path": str(p),
                "frame_start": 0,
                "frame_end": 3,
                "points": [{"x": 30, "y": 48}],
                "tool": "touch",
                "shape_type": "rectangle",
                "id": "shapes-test-1",
            },
            stream=True,
        )
        assert r.ok, r.text
        assert "ndjson" in r.headers["Content-Type"]
        lines = [json.loads(l) for l in r.iter_lines() if l]
        frames_seen = [l["frame_number"] for l in lines if "frame_number" in l]
        assert frames_seen == [0, 1, 2, 3]
        for l in lines:
            assert "shapeBounds" in l
            if l["shapeBounds"] is not None:
                assert l["shapeBounds"]["shapeType"] == "rectangle"
                assert l["shapeBounds"]["width"] > 0

    def test_stream_respects_frame_bounds(self, server, tmp_path):
        import json

        p = self._clip(tmp_path, n=5)
        r = requests.post(
            server + "/mask/track/shapes",
            json={
                "input_path": str(p),
                "frame_start": 3,
                "frame_end": 1,
                "direction": "backward",
                "points": [{"x": 45, "y": 48}],
                "id": "shapes-test-2",
            },
        )
        assert r.ok, r.text
        lines = [json.loads(l) for l in r.text.splitlines() if l]
        frames_seen = [l["frame_number"] for l in lines if "frame_number" in l]
        assert frames_seen == [3, 2, 1]

    def test_validation(self, server, tmp_path):
        from PIL import Image

        img, _ = scene()
        still = tmp_path / "still.png"
        Image.fromarray(img).save(still)
        # image input rejected
        r = requests.post(server + "/mask/track/shapes", json={
            "input_path": str(still), "frame_start": 0, "frame_end": 3,
            "points": [{"x": 1, "y": 1}],
        })
        assert r.status_code == 400
        clip = self._clip(tmp_path)
        # missing bounds
        r = requests.post(server + "/mask/track/shapes", json={
            "input_path": str(clip), "points": [{"x": 1, "y": 1}],
        })
        assert r.status_code == 400
        # direction contradicts bounds
        r = requests.post(server + "/mask/track/shapes", json={
            "input_path": str(clip), "frame_start": 0, "frame_end": 3,
            "direction": "backward", "points": [{"x": 1, "y": 1}],
        })
        assert r.status_code == 400
        # no seed inputs -> 409 (no persistent SAM2 state server-side)
        r = requests.post(server + "/mask/track/shapes", json={
            "input_path": str(clip), "frame_start": 0, "frame_end": 3,
        })
        assert r.status_code == 409
