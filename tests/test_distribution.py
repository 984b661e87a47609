"""Bundle / update machinery (reference src/__main__.py:506 bundle,
:1536 _apply_code_update, :1644 update selection)."""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture()
def fake_root(tmp_path):
    root = tmp_path / "src"
    (root / "apex_studio_tpu").mkdir(parents=True)
    (root / "apex_studio_tpu" / "__init__.py").write_text("x = 1\n")
    (root / "apex_studio_tpu" / "mod.py").write_text("def f():\n    return 2\n")
    (root / "manifests" / "image").mkdir(parents=True)
    (root / "manifests" / "image" / "m.yml").write_text("kind: Model\n")
    (root / "bench.py").write_text("print('{}')\n")
    (root / "apex_studio_tpu" / "__pycache__").mkdir()
    (root / "apex_studio_tpu" / "__pycache__" / "junk.pyc").write_text("x")
    return root


class TestBundle:
    def test_build_and_apply_roundtrip(self, fake_root, tmp_path):
        from apex_studio_tpu.distribution import apply_update, build_bundle

        artifact = build_bundle(fake_root, tmp_path / "dist", "1.2.3")
        assert artifact.exists()
        assert "1.2.3" in artifact.name and "tpu" in artifact.name

        target = tmp_path / "install"
        manifest = apply_update(artifact, target)
        assert manifest["version"] == "1.2.3"
        assert (target / "apex_studio_tpu" / "mod.py").read_text() \
            == (fake_root / "apex_studio_tpu" / "mod.py").read_text()
        assert (target / "manifests" / "image" / "m.yml").exists()
        assert not (target / "apex_studio_tpu" / "__pycache__").exists()
        installed = json.loads(
            (target / "bundle_manifest.json").read_text())
        assert installed["version"] == "1.2.3"

    def test_nightly_version_suffix(self, fake_root, tmp_path):
        from apex_studio_tpu.distribution import build_bundle

        artifact = build_bundle(fake_root, tmp_path / "d", "1.0.0",
                                nightly=True)
        assert "-nightly." in artifact.name

    def test_corrupted_archive_sha_rejected(self, fake_root, tmp_path):
        from apex_studio_tpu.distribution import apply_update, build_bundle

        artifact = build_bundle(fake_root, tmp_path / "dist", "2.0.0",
                                tar_zst=False)
        # retar with a modified file but original manifest
        import tarfile

        work = tmp_path / "work"
        with tarfile.open(artifact) as tar:
            tar.extractall(work)
        root = next(work.iterdir())
        (root / "apex_studio_tpu" / "mod.py").write_text("tampered\n")
        bad = tmp_path / "bad.tar.gz"
        with tarfile.open(bad, "w:gz") as tar:
            tar.add(root, arcname=root.name)
        with pytest.raises(ValueError, match="sha mismatch"):
            apply_update(bad, tmp_path / "install2")


class TestUpdateSelection:
    def test_pick_newest_compatible(self):
        from apex_studio_tpu.distribution import (
            _host_arch, _host_platform, parse_asset_name, pick_update)

        plat, arch = _host_platform(), _host_arch()
        names = [
            f"apex-engine-1.0.0-{plat}-{arch}-tpu-cp312.tar.zst",
            f"apex-engine-1.2.0-{plat}-{arch}-tpu-cp312.tar.zst",
            f"apex-engine-1.3.0-{plat}-{arch}-cuda-cp312.tar.zst",  # wrong gpu
            f"apex-engine-2.0.0-nightly.20250101-{plat}-{arch}-tpu-cp312.tar.zst",
            f"apex-engine-1.1.0-win32-arm64-tpu-cp312.tar.zst",
        ]
        assets = [a for a in (parse_asset_name(n, "http://x") for n in names)
                  if a is not None]
        best = pick_update(assets, "1.0.0")
        assert best is not None and best.version == "1.2.0"
        assert pick_update(assets, "1.2.0") is None

    def test_parse_rejects_foreign_names(self):
        from apex_studio_tpu.distribution import parse_asset_name

        assert parse_asset_name("random-file.tar.zst") is None
        assert parse_asset_name("apex-engine-1.0.0-linux-x86_64-tpu-cp312.tar.zst") is not None
