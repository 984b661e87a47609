"""Server hardening: file-root confinement, ingest, LoRA CRUD on manifests,
Civitai/AIR resolution, OOM warm-pool purge, watchdog wiring."""

import asyncio

import pytest
import yaml
from aiohttp.test_utils import TestClient, TestServer

from apex_studio_tpu.manifest.resolver import ManifestResolver
from apex_studio_tpu.server.app import create_app


@pytest.fixture()
def manifest_dir(tmp_path):
    d = tmp_path / "manifests" / "image"
    d.mkdir(parents=True)
    doc = {
        "api_version": "apex/v1",
        "kind": "Model",
        "metadata": {"id": "crud-test", "name": "CRUD Test", "version": "1.0.0"},
        "spec": {"engine": "zimage", "model_type": "t2i", "engine_type": "jax",
                 "components": [], "loras": ["some/lora.safetensors"]},
    }
    (d / "crud.yml").write_text(yaml.safe_dump(doc))
    return tmp_path / "manifests"


@pytest.fixture()
def client(manifest_dir, event_loop=None):
    app = create_app(resolver=ManifestResolver(search_paths=[manifest_dir]))

    async def make():
        server = TestServer(app)
        c = TestClient(server)
        await c.start_server()
        return c

    loop = asyncio.new_event_loop()
    c = loop.run_until_complete(make())
    yield c, loop
    loop.run_until_complete(c.close())
    loop.close()


class TestFilesConfinement:
    def test_outside_roots_forbidden(self, client):
        c, loop = client
        resp = loop.run_until_complete(c.get("/files", params={"path": "/etc/passwd"}))
        assert resp.status == 403
        resp = loop.run_until_complete(
            c.get("/files/exists", params={"path": "/etc/passwd"})
        )
        data = loop.run_until_complete(resp.json())
        assert data["exists"] is False  # confined: existence is not revealed

    def test_results_root_served(self, client):
        from apex_studio_tpu.server.runner import engine_results_dir

        c, loop = client
        p = engine_results_dir() / "t-hardening" / "x.txt"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("ok")
        resp = loop.run_until_complete(c.get("/files", params={"path": str(p)}))
        assert resp.status == 200

    def test_ingest_copies_into_managed_root(self, client, tmp_path):
        c, loop = client
        src = tmp_path / "outside.bin"
        src.write_bytes(b"abc")
        resp = loop.run_until_complete(c.post("/files/ingest", json={"path": str(src)}))
        assert resp.status == 200
        managed = loop.run_until_complete(resp.json())["path"]
        resp = loop.run_until_complete(c.get("/files", params={"path": managed}))
        assert resp.status == 200


class TestManifestLoraCrud:
    def test_add_scale_name_delete(self, client, manifest_dir):
        c, loop = client

        resp = loop.run_until_complete(c.post("/manifest/lora", json={
            "manifest_id": "crud-test", "source": "hf:org/repo/l.safetensors",
            "scale": 0.8, "name": "mylora",
        }))
        assert resp.status == 200
        loras = loop.run_until_complete(resp.json())["loras"]
        assert len(loras) == 2

        resp = loop.run_until_complete(c.post("/manifest/lora/scale", json={
            "manifest_id": "crud-test", "lora_index": 0, "scale": 2.5,
        }))
        assert resp.status == 200
        assert loop.run_until_complete(resp.json())["scale"] == 1.0  # clamped

        resp = loop.run_until_complete(c.post("/manifest/lora/name", json={
            "manifest_id": "crud-test", "lora_index": 0, "name": "renamed",
        }))
        assert resp.status == 200

        doc = yaml.safe_load((manifest_dir / "image" / "crud.yml").read_text())
        loras = doc["spec"]["loras"]
        assert loras[0]["name"] == "renamed" and loras[0]["scale"] == 1.0

        resp = loop.run_until_complete(
            c.delete("/manifest/lora", json={"manifest_id": "crud-test", "lora_index": 1})
        )
        assert resp.status == 200
        doc = yaml.safe_load((manifest_dir / "image" / "crud.yml").read_text())
        assert len(doc["spec"]["loras"]) == 1

    def test_bad_index_rejected(self, client):
        c, loop = client
        resp = loop.run_until_complete(c.post("/manifest/lora/scale", json={
            "manifest_id": "crud-test", "lora_index": 99, "scale": 0.5,
        }))
        assert resp.status == 400


def test_civitai_air_and_url_resolution(monkeypatch):
    from apex_studio_tpu.downloads.api import resolve_civitai_url

    assert resolve_civitai_url("urn:air:sdxl:lora:civitai:328553@368189") == \
        "https://civitai.com/api/download/models/368189"
    assert "download/models/42" in resolve_civitai_url(
        "https://civitai.com/models/7?modelVersionId=42"
    )
    monkeypatch.setenv("APEX_CIVITAI_TOKEN", "sekret")
    assert "token=sekret" in resolve_civitai_url("urn:air:sd1:lora:civitai:1@2")
    with pytest.raises(ValueError):
        resolve_civitai_url("https://civitai.com/models/7")


def test_oom_error_purges_warm_pool():
    import time

    from apex_studio_tpu.server.jobs import JobExecutor, JobStore
    from apex_studio_tpu.server.warm_pool import warm_pool

    warm_pool.acquire("k1", lambda: object())
    warm_pool.release("k1", object())
    store = JobStore()
    ex = JobExecutor(store)
    job = store.register("oom-job", "engine")

    def boom(_j):
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

    ex.submit(job, boom)
    for _ in range(100):
        if job.status == "error":
            break
        time.sleep(0.05)
    assert job.status == "error"
    assert job.meta.get("warm_pool_purged") is True
    ex.shutdown()


def test_parent_watchdog_exits_when_parent_dies(tmp_path, monkeypatch):
    """Spawn a child that watches a short-lived 'parent'; it must self-exit."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import os, subprocess, sys, threading, time
        parent = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(0.5)"])
        # Reap the fake parent on exit so os.kill(pid, 0) fails once it dies
        # (in production the real parent is reaped by init, not by us).
        threading.Thread(target=parent.wait, daemon=True).start()
        monkeypatch.setenv("APEX_PARENT_PID", str(parent.pid))
        sys.path.insert(0, %r)
        from apex_studio_tpu.server.app import _start_parent_watchdog
        _start_parent_watchdog()
        time.sleep(10)
        print("WATCHDOG-DID-NOT-FIRE")
        """ % "/root/repo"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60
    )
    assert "WATCHDOG-DID-NOT-FIRE" not in proc.stdout
