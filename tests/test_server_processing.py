"""Processing-router integration tests (reuses the server fixture)."""

import time

import numpy as np
import pytest
import requests

from tests.test_server import _wait_job


@pytest.fixture(scope="module")
def sample_image(tmp_path_factory):
    from PIL import Image

    p = tmp_path_factory.mktemp("media") / "input.png"
    arr = np.zeros((64, 64, 3), np.uint8)
    arr[20:44, 20:44] = 255
    Image.fromarray(arr).save(p)
    return p


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory):
    from apex_studio_tpu.utils.media import save_video

    p = tmp_path_factory.mktemp("media") / "input.mp4"
    frames = []
    for i in range(4):
        f = np.zeros((64, 64, 3), np.uint8)
        f[20:40, 10 + i * 5 : 30 + i * 5] = 255
        frames.append(f)
    save_video(frames, p, fps=8)
    return p


class TestPreprocessorRoutes:
    def test_list(self, server):
        out = requests.get(server + "/preprocessor/list").json()
        names = {p["name"] for p in out}
        assert "canny" in names

    def test_run_on_image(self, server, sample_image):
        r = requests.post(
            server + "/preprocessor/run",
            json={"preprocessor_name": "canny", "input_path": str(sample_image)},
        )
        assert r.ok, r.text
        st = _wait_job(server, r.json()["job_id"])
        assert st["status"] == "complete"
        assert st["result_path"].endswith("canny.png")

    def test_missing_params_rejected(self, server):
        r = requests.post(server + "/preprocessor/run", json={"input_path": "/x.png"})
        assert r.status_code == 400


class TestPostprocessorRoutes:
    def test_frame_interpolate(self, server, sample_video):
        r = requests.post(
            server + "/postprocessor/frame-interpolate",
            json={"input_path": str(sample_video), "multiplier": 2, "fps": 8},
        )
        assert r.ok, r.text
        st = _wait_job(server, r.json()["job_id"])
        assert st["status"] == "complete"
        assert st["result_path"].endswith("interpolated.mp4")


class TestComponentRoutes:
    def test_delete_refuses_escape(self, server):
        r = requests.delete(
            server + "/components/delete", json={"path": "../../etc/passwd"}
        )
        assert r.status_code == 400

    def test_delete_missing_404(self, server):
        r = requests.delete(server + "/components/delete", json={"path": "nope/x.bin"})
        assert r.status_code == 404


def test_step_trace_endpoint(server, monkeypatch):
    """APEX_STEP_TRACE wiring: stage records appear and can be cleared
    (reference step_mem, src/utils/step_mem.py:274)."""
    import requests

    from apex_studio_tpu.utils import profiling

    monkeypatch.setenv("APEX_STEP_TRACE", "1")
    with profiling.step_trace("unit-test-stage"):
        pass
    body = requests.get(server + "/system/step-trace").json()
    assert body["enabled"] is True
    assert any(r["name"] == "unit-test-stage" for r in body["records"])
    body = requests.get(server + "/system/step-trace?clear=1").json()
    assert requests.get(server + "/system/step-trace").json()["records"] == []
