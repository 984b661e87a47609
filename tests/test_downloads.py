"""Download subsystem tests — the native C++ downloader runs against a local
aiohttp file server (zero-egress environment; loopback only)."""

import asyncio
import json
import struct
import threading

import numpy as np
import pytest

from apex_studio_tpu.downloads import native
from apex_studio_tpu.downloads.api import download_file, hf_url, validate_file


@pytest.fixture(scope="module")
def file_server(tmp_path_factory):
    """Serve a directory over HTTP with Range support (aiohttp static does)."""
    root = tmp_path_factory.mktemp("served")
    payload = np.random.default_rng(0).bytes(3 * 1024 * 1024 + 12345)
    (root / "blob.bin").write_bytes(payload)
    (root / "page.html").write_text("<!doctype html><html>not a model</html>")

    from aiohttp import web

    loop = asyncio.new_event_loop()
    started = threading.Event()
    bound = {}

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            app = web.Application()
            app.router.add_static("/files", root, show_index=False)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)  # ephemeral port
            await site.start()
            bound["port"] = site._server.sockets[0].getsockname()[1]
            started.set()
            while True:
                await asyncio.sleep(3600)

        try:
            loop.run_until_complete(main())
        except Exception:
            pass

    threading.Thread(target=run, daemon=True).start()
    assert started.wait(20)
    return f"http://127.0.0.1:{bound['port']}/files", payload


class TestNativeDownloader:
    def test_builds(self):
        assert native.native_available(), "native downloader failed to build/load"

    def test_probe_size(self, file_server):
        base, payload = file_server
        size = native.probe(base + "/blob.bin")
        assert size == len(payload)

    def test_multi_connection_download_bitexact(self, file_server, tmp_path):
        base, payload = file_server
        dest = tmp_path / "out.bin"
        seen = []
        native.download(base + "/blob.bin", dest, connections=4,
                        progress_cb=lambda done, total: seen.append((done, total)))
        assert dest.read_bytes() == payload
        assert seen[-1][0] == len(payload)
        assert seen[-1][1] == len(payload)

    def test_single_connection(self, file_server, tmp_path):
        base, payload = file_server
        dest = tmp_path / "single.bin"
        native.download(base + "/blob.bin", dest, connections=1)
        assert dest.read_bytes() == payload

    def test_404_fails_cleanly(self, file_server, tmp_path):
        base, _ = file_server
        with pytest.raises(RuntimeError):
            native.download(base + "/missing.bin", tmp_path / "x.bin", connections=2)
        assert not (tmp_path / "x.bin").exists()


class TestDownloadAPI:
    def test_hf_url_construction(self):
        assert hf_url("org/repo/sub/f.safetensors") == (
            "https://huggingface.co/org/repo/resolve/main/sub/f.safetensors"
        )
        with pytest.raises(ValueError):
            hf_url("just-a-name")

    def test_download_file_via_api(self, file_server, tmp_path):
        base, payload = file_server
        dest = download_file(base + "/blob.bin", tmp_path / "api.bin")
        assert dest.read_bytes() == payload

    def test_html_detection(self, file_server, tmp_path):
        base, _ = file_server
        with pytest.raises(ValueError, match="HTML"):
            download_file(base + "/page.html", tmp_path / "weights.safetensors")

    def test_safetensors_magic_validation(self, tmp_path):
        good = tmp_path / "ok.safetensors"
        header = json.dumps({"a": {"dtype": "F32", "shape": [1], "data_offsets": [0, 4]}}).encode()
        good.write_bytes(struct.pack("<Q", len(header)) + header + b"\x00" * 4)
        validate_file(good)  # must not raise

        bad = tmp_path / "bad.safetensors"
        bad.write_bytes(b"\xff" * 64)
        with pytest.raises(ValueError):
            validate_file(bad)

    def test_fallback_path(self, file_server, tmp_path, monkeypatch):
        monkeypatch.setenv("APEX_DISABLE_NATIVE_DOWNLOAD", "1")
        base, payload = file_server
        dest = download_file(base + "/blob.bin", tmp_path / "fb.bin")
        assert dest.read_bytes() == payload


class TestSourceResolution:
    """URL normalization for every supported source scheme (reference
    download_mixin.py GCS :525, S3 :699, Azure :809, GDrive :1583)."""

    def test_gcs(self):
        from apex_studio_tpu.downloads.api import resolve_source_url

        url = resolve_source_url("gs://my-bucket/models/a b/weights.safetensors")
        assert url == ("https://storage.googleapis.com/storage/v1/b/my-bucket/o/"
                       "models%2Fa%20b%2Fweights.safetensors?alt=media")

    def test_s3_default_and_region(self, monkeypatch):
        from apex_studio_tpu.downloads.api import resolve_source_url

        monkeypatch.delenv("APEX_S3_REGION", raising=False)
        monkeypatch.delenv("AWS_REGION", raising=False)
        assert resolve_source_url("s3://bkt/k/f.bin") == \
            "https://bkt.s3.amazonaws.com/k/f.bin"
        monkeypatch.setenv("APEX_S3_REGION", "eu-west-1")
        assert resolve_source_url("s3://bkt/k/f.bin") == \
            "https://bkt.s3.eu-west-1.amazonaws.com/k/f.bin"

    def test_azure_with_sas(self, monkeypatch):
        from apex_studio_tpu.downloads.api import resolve_source_url

        monkeypatch.setenv("APEX_AZURE_SAS", "?sv=2024&sig=x")
        assert resolve_source_url("az://acct/container/blob.safetensors") == \
            "https://acct.blob.core.windows.net/container/blob.safetensors?sv=2024&sig=x"

    def test_gdrive_forms(self):
        from apex_studio_tpu.downloads.api import resolve_source_url

        want = "https://drive.google.com/uc?export=download&id=ABC_12-3&confirm=t"
        assert resolve_source_url(
            "https://drive.google.com/file/d/ABC_12-3/view?usp=sharing") == want
        assert resolve_source_url(
            "https://drive.google.com/open?id=ABC_12-3") == want

    def test_civitai_urn(self):
        from apex_studio_tpu.downloads.api import resolve_source_url

        url = resolve_source_url("urn:air:sdxl:lora:civitai:1234@5678")
        assert url.startswith("https://civitai.com/api/download/models/5678")

    def test_hf_and_passthrough(self):
        from apex_studio_tpu.downloads.api import resolve_source_url

        assert resolve_source_url("org/repo/sub/file.safetensors") == \
            "https://huggingface.co/org/repo/resolve/main/sub/file.safetensors"
        assert resolve_source_url("https://example.com/x.bin") == \
            "https://example.com/x.bin"
