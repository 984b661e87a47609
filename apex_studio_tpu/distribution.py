"""Bundle / publish / self-update for the apex-engine distribution.

Counterpart of the reference's ``src/__main__.py`` CLI tail
(bundle: __main__.py:506, publish: __main__.py:677, check-updates:
__main__.py:1567 + the update asset machinery): the reference freezes a
PyInstaller build per (platform, arch, gpu) and ships ``.tar.zst`` code
assets through a HuggingFace releases repo; the updater lists the remote
tree, picks the newest compatible semver asset, downloads it and swaps the
install directory.

The TPU build is a source distribution (jax wheels come from the
environment), so ``bundle`` packs the package + manifests + a
``bundle_manifest.json`` (version, platform/arch, gpu tag ``tpu``, python
tag, per-file sha256) into ``apex-engine-<ver>-<plat>-<arch>-tpu.tar.zst``.
``publish`` uploads the artifact to a HF repo; ``check-updates`` /
``apply_update`` mirror the reference's semver-gated swap with the same
path-traversal guard (__main__.py:1418 _is_within_dir).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import platform as _platform
import re
import shutil
import sys
import tarfile
import tempfile
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)

_BUNDLE_DIRS = ("apex_studio_tpu", "manifests")
_BUNDLE_FILES = ("bench.py", "README.md")
_EXCLUDE = re.compile(r"(__pycache__|\.pyc$|\.egg-info)")


def _host_platform() -> str:
    return {"darwin": "darwin", "linux": "linux",
            "win32": "win32"}.get(sys.platform, sys.platform)


def _host_arch() -> str:
    m = _platform.machine().lower()
    return {"amd64": "x86_64", "x86_64": "x86_64", "arm64": "arm64",
            "aarch64": "arm64"}.get(m, m)


def _python_tag() -> str:
    return f"cp{sys.version_info.major}{sys.version_info.minor}"


def _nightly_suffix() -> str:
    return time.strftime("-nightly.%Y%m%d%H%M%S")


def _semver_triplet(v: str) -> Optional[Tuple[int, int, int]]:
    m = re.match(r"^v?(\d+)\.(\d+)\.(\d+)", v or "")
    return (int(m.group(1)), int(m.group(2)), int(m.group(3))) if m else None


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _iter_bundle_files(root: Path):
    for d in _BUNDLE_DIRS:
        base = root / d
        if not base.exists():
            continue
        for p in sorted(base.rglob("*")):
            if p.is_file() and not _EXCLUDE.search(str(p)):
                yield p
    for f in _BUNDLE_FILES:
        p = root / f
        if p.exists():
            yield p


def build_bundle(
    root: Path,
    output: Path,
    version: str,
    nightly: bool = False,
    tar_zst: bool = True,
    tar_zst_level: int = 12,
    gpu: str = "tpu",
) -> Path:
    """Pack the source tree into a versioned artifact + bundle manifest."""
    root = Path(root)
    output = Path(output)
    output.mkdir(parents=True, exist_ok=True)
    if nightly:
        version = f"{version}{_nightly_suffix()}"
    name = (f"apex-engine-{version}-{_host_platform()}-{_host_arch()}"
            f"-{gpu}-{_python_tag()}")
    stage = Path(tempfile.mkdtemp()) / name
    files: List[Dict[str, Any]] = []
    for src in _iter_bundle_files(root):
        rel = src.relative_to(root)
        dst = stage / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)
        files.append({"path": str(rel), "sha256": _sha256(src),
                      "size": src.stat().st_size})
    manifest = {
        "name": "apex-engine",
        "version": version,
        "platform": _host_platform(),
        "arch": _host_arch(),
        "gpu": gpu,
        "python": _python_tag(),
        "created": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "files": files,
    }
    (stage / "bundle_manifest.json").write_text(json.dumps(manifest, indent=2))

    if tar_zst:
        try:
            import zstandard

            artifact = output / f"{name}.tar.zst"
            cctx = zstandard.ZstdCompressor(level=tar_zst_level)
            with open(artifact, "wb") as fo, cctx.stream_writer(fo) as zw:
                with tarfile.open(mode="w|", fileobj=zw) as tar:
                    tar.add(stage, arcname=name)
            shutil.rmtree(stage.parent, ignore_errors=True)
            return artifact
        except ImportError:
            logger.warning("zstandard unavailable; writing .tar.gz")
    artifact = output / f"{name}.tar.gz"
    with tarfile.open(artifact, "w:gz") as tar:
        tar.add(stage, arcname=name)
    shutil.rmtree(stage.parent, ignore_errors=True)
    return artifact


@dataclass
class UpdateAsset:
    name: str
    version: str
    platform: str
    arch: str
    gpu: str
    url: str


_ASSET_RE = re.compile(
    r"^apex-engine-(?P<version>[^-]+(?:-nightly\.\d+)?)-"
    r"(?P<platform>darwin|linux|win32)-(?P<arch>x86_64|arm64)-"
    r"(?P<gpu>[a-z0-9]+)-cp\d+\.tar\.(?:zst|gz)$")


def parse_asset_name(name: str, base_url: str = "") -> Optional[UpdateAsset]:
    m = _ASSET_RE.match(name)
    if not m:
        return None
    return UpdateAsset(name=name, url=f"{base_url}/{name}" if base_url else "",
                       **{k: m.group(k) for k in
                          ("version", "platform", "arch", "gpu")})


def list_remote_assets(repo: str, *, revision: str = "main",
                       timeout: float = 15.0) -> List[UpdateAsset]:
    """List release assets in a HF repo tree (__main__.py:1151)."""
    import requests

    url = f"https://huggingface.co/api/models/{repo}/tree/{revision}"
    base = f"https://huggingface.co/{repo}/resolve/{revision}"
    r = requests.get(url, timeout=timeout)
    r.raise_for_status()
    out = []
    for entry in r.json():
        asset = parse_asset_name(Path(entry.get("path", "")).name, base)
        if asset is not None:
            out.append(asset)
    return out


def pick_update(assets: List[UpdateAsset], current_version: str,
                gpu: str = "tpu") -> Optional[UpdateAsset]:
    """Newest compatible (platform/arch/gpu) asset strictly newer than
    ``current_version``; nightlies excluded (__main__.py:1644)."""
    cur = _semver_triplet(current_version) or (0, 0, 0)
    best: Optional[UpdateAsset] = None
    for a in assets:
        if a.platform != _host_platform() or a.arch != _host_arch():
            continue
        if a.gpu != gpu or "-nightly." in a.version:
            continue
        v = _semver_triplet(a.version)
        if v is None or v <= cur:
            continue
        if best is None or v > _semver_triplet(best.version):
            best = a
    return best


def _is_within_dir(path: Path, root: Path) -> bool:
    try:
        path.resolve().relative_to(root.resolve())
        return True
    except ValueError:
        return False


def apply_update(archive: Path, target_dir: Path) -> Dict[str, Any]:
    """Extract a bundle archive over ``target_dir`` after validating every
    member stays inside it (__main__.py:1536 _apply_code_update)."""
    archive = Path(archive)
    target_dir = Path(target_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    tmp = Path(tempfile.mkdtemp())
    if archive.suffix == ".zst" or archive.name.endswith(".tar.zst"):
        import zstandard

        dctx = zstandard.ZstdDecompressor()
        with open(archive, "rb") as fi, dctx.stream_reader(fi) as zr:
            with tarfile.open(mode="r|", fileobj=zr) as tar:
                for member in tar:
                    if not _is_within_dir(tmp / member.name, tmp):
                        raise ValueError(f"unsafe path in archive: {member.name}")
                    tar.extract(member, tmp)
    else:
        with tarfile.open(archive) as tar:
            for member in tar.getmembers():
                if not _is_within_dir(tmp / member.name, tmp):
                    raise ValueError(f"unsafe path in archive: {member.name}")
            try:
                tar.extractall(tmp, filter="data")
            except TypeError:  # pre-3.12 tarfile without filters
                tar.extractall(tmp)
    roots = [p for p in tmp.iterdir() if p.is_dir()]
    if len(roots) != 1:
        raise ValueError(f"expected one bundle root, got {len(roots)}")
    manifest_path = roots[0] / "bundle_manifest.json"
    manifest = json.loads(manifest_path.read_text())
    for entry in manifest["files"]:
        src = roots[0] / entry["path"]
        if _sha256(src) != entry["sha256"]:
            raise ValueError(f"sha mismatch for {entry['path']}")
        dst = target_dir / entry["path"]
        if not _is_within_dir(dst, target_dir):
            raise ValueError(f"unsafe target path: {entry['path']}")
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)
    shutil.copy2(manifest_path, target_dir / "bundle_manifest.json")
    shutil.rmtree(tmp, ignore_errors=True)
    return manifest


def installed_version(target_dir: Path) -> str:
    p = Path(target_dir) / "bundle_manifest.json"
    if p.exists():
        try:
            return json.loads(p.read_text()).get("version", "0.0.0")
        except Exception:
            pass
    from apex_studio_tpu import __version__

    return __version__


def publish(artifact: Path, repo: str, *, token: Optional[str] = None,
            revision: str = "main", timeout: float = 600.0) -> str:
    """Upload a bundle artifact to a HF repo (__main__.py:677). Returns the
    uploaded file URL."""
    try:
        from huggingface_hub import HfApi
    except ImportError as e:  # pragma: no cover - hub is an optional dep
        raise RuntimeError("huggingface_hub required for publish") from e

    api = HfApi(token=token or os.environ.get("HF_TOKEN"))
    artifact = Path(artifact)
    api.upload_file(path_or_fileobj=str(artifact),
                    path_in_repo=artifact.name, repo_id=repo,
                    revision=revision)
    return f"https://huggingface.co/{repo}/resolve/{revision}/{artifact.name}"
