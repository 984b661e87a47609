"""Server integration tests: real aiohttp server on a thread, sync clients."""

import asyncio
import json
import threading
import time

import numpy as np
import pytest
import requests
import yaml



def _wait_job(base, job_id, timeout=180):
    deadline = time.time() + timeout
    while time.time() < deadline:
        st = requests.get(f"{base}/engine/status/{job_id}", timeout=5).json()
        if st["status"] in ("complete", "error", "canceled"):
            return st
        time.sleep(0.3)
    raise TimeoutError(f"job {job_id} did not finish")


class TestHTTPSurface:
    def test_health_ready(self, server):
        assert requests.get(server + "/health").json()["status"] == "ok"
        assert requests.get(server + "/ready").json()["ready"] is True

    def test_manifest_list(self, server):
        out = requests.get(server + "/manifest/list").json()
        assert len(out) == 1
        assert out[0]["id"] == "zimage-tiny-test"
        assert out[0]["engine"] == "zimage"
        assert out[0]["compute_compatible"] is True

    def test_manifest_get(self, server):
        out = requests.get(server + "/manifest/zimage-tiny-test").json()
        assert out["metadata"]["name"] == "ZImage Tiny"

    def test_manifest_404(self, server):
        r = requests.get(server + "/manifest/nope")
        assert r.status_code == 404

    def test_manifest_types(self, server):
        out = requests.get(server + "/manifest/types").json()
        assert any(t["model_type"] == "t2i" for t in out)

    def test_system_memory(self, server):
        out = requests.get(server + "/system/memory").json()
        assert "ram" in out and out["ram"]["total"] > 0

    def test_config_roundtrip(self, server):
        requests.post(server + "/config/hf-token", json={"value": "tok123"})
        out = requests.get(server + "/config/hf-token").json()
        assert out["value"] == "tok123"

    def test_engine_run_requires_manifest(self, server):
        r = requests.post(server + "/engine/run", json={"inputs": {}})
        assert r.status_code == 400

    def test_engine_run_unknown_manifest(self, server):
        r = requests.post(server + "/engine/run", json={"manifest_id": "missing", "inputs": {}})
        assert r.status_code == 404


class TestEngineJobFlow:
    def test_full_job_with_ws_progress(self, server):
        payload = {
            "manifest_id": "zimage-tiny-test",
            "inputs": {
                "prompt": "hello world",
                "height": 32,
                "width": 32,
                "num_inference_steps": 2,
                "seed": 3,
            },
        }
        r = requests.post(server + "/engine/run", json=payload)
        assert r.ok, r.text
        job_id = r.json()["job_id"]
        assert r.json()["status"] == "queued"

        # WS stream (sync client).
        from websockets.sync.client import connect

        updates = []
        ws_url = server.replace("http://", "ws://") + f"/ws/job/{job_id}"
        with connect(ws_url, open_timeout=30) as ws:
            deadline = time.time() + 180
            while time.time() < deadline:
                msg = json.loads(ws.recv(timeout=120))
                updates.append(msg)
                if msg.get("status") in ("complete", "error", "canceled"):
                    break

        assert updates, "no WS updates received"
        final = updates[-1]
        assert final["status"] == "complete", final
        assert final["progress"] == 1.0
        assert final["metadata"]["preview_url"].startswith("/files/engine_results/")

        st = _wait_job(server, job_id)
        assert st["status"] == "complete"

        # Result file served over the static mount.
        res = requests.get(server + f"/engine/result/{job_id}").json()
        assert res["result_path"].endswith("output.png")
        img = requests.get(server + final["metadata"]["preview_url"])
        assert img.ok and img.headers["Content-Type"] == "image/png"

    def test_ws_late_subscriber_gets_cached_final(self, server):
        payload = {
            "manifest_id": "zimage-tiny-test",
            "inputs": {"prompt": "hello", "height": 32, "width": 32,
                       "num_inference_steps": 1, "seed": 1},
        }
        job_id = requests.post(server + "/engine/run", json=payload).json()["job_id"]
        _wait_job(server, job_id)

        from websockets.sync.client import connect

        ws_url = server.replace("http://", "ws://") + f"/ws/job/{job_id}"
        with connect(ws_url, open_timeout=30) as ws:
            msg = json.loads(ws.recv(timeout=30))
        assert msg["status"] == "complete"

    def test_job_catalog(self, server):
        out = requests.get(server + "/ray/jobs").json()
        assert "jobs" in out and len(out["jobs"]) >= 1
        # The session server is shared across modules (mask/processing jobs may
        # precede these) — assert our engine jobs are catalogued, not ordering.
        cats = {j["category"] for j in out["jobs"].values()}
        assert "engine" in cats

    def test_cancel_queued_job(self, server):
        # Submit a job then cancel immediately; depending on timing it either
        # cancels while queued/running or completes first — both are terminal.
        payload = {
            "manifest_id": "zimage-tiny-test",
            "inputs": {"prompt": "hello", "height": 32, "width": 32,
                       "num_inference_steps": 8, "seed": 1},
        }
        job_id = requests.post(server + "/engine/run", json=payload).json()["job_id"]
        requests.post(server + f"/engine/cancel/{job_id}")
        st = _wait_job(server, job_id)
        assert st["status"] in ("canceled", "complete")


class TestRunPersistence:
    def test_run_config_persisted_and_replayable(self, server):
        """Every run writes model_inputs.json; replay produces identical latents
        (the reference's captured-run golden-fixture pattern, SURVEY §4)."""
        import os
        from pathlib import Path

        payload = {
            "manifest_id": "zimage-tiny-test",
            "inputs": {"prompt": "golden", "height": 32, "width": 32,
                       "num_inference_steps": 2, "seed": 42,
                       "return_latents": True},
        }
        job_id = requests.post(server + "/engine/run", json=payload).json()["job_id"]
        st = _wait_job(server, job_id)
        assert st["status"] == "complete"

        from apex_studio_tpu.server.runner import engine_results_dir, replay_run

        run_dir = engine_results_dir() / job_id
        assert (run_dir / "model_inputs.json").exists()

        engine, result = replay_run(run_dir)
        # same seed + same config → identical latents
        import numpy as np

        first = np.load(run_dir / "latents.npy")
        np.testing.assert_allclose(np.asarray(result), first, atol=1e-6)
