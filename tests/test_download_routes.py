"""Download-panel API surface: /download/resolve (+/batch), /download/delete,
/download/status/{id}, /download/cancel/{id} — wire-compatible with the
reference's api/download.py:316,375,420,358,364."""

import requests

from apex_studio_tpu.utils.defaults import get_components_path, get_lora_path


class TestDownloadResolve:
    def test_resolve_unknown_source(self, server):
        r = requests.post(server + "/download/resolve", json={
            "item_type": "component", "source": "org/repo/model.safetensors",
        })
        assert r.ok, r.text
        out = r.json()
        assert out["bucket"] == "component"
        assert out["downloaded"] is False
        assert out["exists"] is False
        assert out["running"] is False
        assert out["job_id"]

    def test_resolve_detects_downloaded_component(self, server):
        comp = get_components_path() / "org" / "repo"
        comp.mkdir(parents=True, exist_ok=True)
        (comp / "weights.safetensors").write_bytes(b"x" * 8)
        r = requests.post(server + "/download/resolve", json={
            "item_type": "component",
            "source": "org/repo/weights.safetensors",
        })
        assert r.ok, r.text
        out = r.json()
        assert out["downloaded"] is True
        assert out["save_dir"] == str(get_components_path())

    def test_resolve_invalid_item_type(self, server):
        r = requests.post(server + "/download/resolve", json={
            "item_type": "weights", "source": "x",
        })
        assert r.status_code == 400

    def test_resolve_batch(self, server):
        comp = get_components_path() / "batch"
        comp.mkdir(parents=True, exist_ok=True)
        (comp / "a.bin").write_bytes(b"a")
        r = requests.post(server + "/download/resolve/batch", json={
            "item_type": "component",
            "sources": ["batch/a.bin", "batch/missing.bin"],
        })
        assert r.ok, r.text
        results = r.json()["results"]
        assert len(results) == 2
        assert results[0]["downloaded"] is True
        assert results[1]["downloaded"] is False
        assert results[0]["source"] == "batch/a.bin"

    def test_resolve_reuses_job_id_from_post_download(self, server):
        # POST /download with the unified item_type/source shape records the
        # request key; /download/resolve must return the same job_id.
        comp = get_components_path() / "org2"
        comp.mkdir(parents=True, exist_ok=True)
        (comp / "cached.bin").write_bytes(b"c")  # job no-ops: already present
        body = {"item_type": "component", "source": "org2/cached.bin"}
        r = requests.post(server + "/download", json=body)
        assert r.ok, r.text
        job_id = r.json()["job_id"]
        r2 = requests.post(server + "/download/resolve", json=body)
        assert r2.ok, r2.text
        out = r2.json()
        assert out["job_id"] == job_id
        assert out["exists"] is True

    def test_status_route(self, server):
        r = requests.get(server + "/download/status/not-a-job")
        assert r.ok
        assert r.json()["status"] == "not_found"

    def test_cancel_route_404_for_unknown(self, server):
        r = requests.post(server + "/download/cancel/nope")
        assert r.status_code == 404


class TestDownloadDelete:
    def test_delete_file_and_prune_parents(self, server):
        target = get_components_path() / "del" / "nested" / "file.bin"
        target.parent.mkdir(parents=True, exist_ok=True)
        target.write_bytes(b"zz")
        r = requests.delete(server + "/download/delete", json={
            "item_type": "component", "path": "del/nested/file.bin",
            "source": "del/nested/file.bin",
        })
        assert r.ok, r.text
        assert r.json()["status"] == "deleted"
        assert not target.exists()
        # empty parents pruned up to (not including) the components root
        assert not target.parent.exists()
        assert get_components_path().exists()

    def test_delete_directory(self, server):
        d = get_lora_path() / "somepack"
        d.mkdir(parents=True, exist_ok=True)
        (d / "w.safetensors").write_bytes(b"y")
        r = requests.delete(server + "/download/delete", json={
            "item_type": "lora", "path": "somepack",
        })
        assert r.ok, r.text
        assert not d.exists()

    def test_delete_refuses_escape(self, server, tmp_path):
        outside = tmp_path / "victim.txt"
        outside.write_text("keep me")
        r = requests.delete(server + "/download/delete", json={
            "item_type": "component", "path": str(outside),
        })
        assert r.status_code == 400
        assert outside.exists()

    def test_delete_refuses_root(self, server):
        r = requests.delete(server + "/download/delete", json={
            "item_type": "component", "path": ".",
        })
        assert r.status_code == 400

    def test_delete_404_missing(self, server):
        r = requests.delete(server + "/download/delete", json={
            "item_type": "component", "path": "no/such/thing.bin",
        })
        assert r.status_code == 404
