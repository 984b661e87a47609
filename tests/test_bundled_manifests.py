"""Bundled manifest catalog health (the reference's manifest-consistency test
pattern, tests/components/test_video_manifest_transformer_bases.py)."""

from pathlib import Path

import pytest

from apex_studio_tpu.manifest.loader import load_manifest
from apex_studio_tpu.manifest.resolver import ManifestResolver

BUNDLED = Path(__file__).resolve().parent.parent / "manifests"

# preprocessor manifests have their own schema (display metadata, no engine)
ALL_MANIFESTS = sorted(p for p in BUNDLED.rglob("*.yml")
                       if p.parent.name != "preprocessor")


def test_preprocessor_manifests_match_registry():
    import yaml

    import apex_studio_tpu.preprocess  # noqa: F401 (registrations)
    from apex_studio_tpu.preprocess.base import preprocessor_registry

    for path in sorted((BUNDLED / "preprocessor").glob("*.yml")):
        doc = yaml.safe_load(path.read_text())
        assert doc["kind"] == "preprocessor"
        # aliases (open_pose, pidi, unimatch, ...) resolve via the registry's
        # alias table without a primary registration
        assert doc["name"] in preprocessor_registry, path.name
        assert doc["display_name"] and doc["category"] and doc["description"]


@pytest.mark.parametrize("path", ALL_MANIFESTS, ids=lambda p: p.stem)
def test_manifest_parses_and_normalizes(path):
    cfg = load_manifest(path)
    assert cfg["engine"]
    assert cfg["type"]
    assert cfg.get("engine_type") == "jax"
    comps = {c["type"] for c in cfg["components"]}
    assert {"scheduler", "transformer"} <= comps


@pytest.mark.parametrize("path", ALL_MANIFESTS, ids=lambda p: p.stem)
def test_manifest_engine_resolves(path):
    from apex_studio_tpu.engine.registry import resolve_engine_class

    cfg = load_manifest(path)
    mt = cfg["type"]
    if isinstance(mt, list):
        mt = mt[0]
    resolve_engine_class(cfg["engine"], mt)  # raises if unknown


@pytest.mark.parametrize("path", ALL_MANIFESTS, ids=lambda p: p.stem)
def test_manifest_bases_are_registered(path):
    from apex_studio_tpu.models.registry import (
        _load_builtin_families,
        text_encoder_registry,
        transformer_registry,
        vae_registry,
    )
    from apex_studio_tpu.schedulers.base import scheduler_registry

    _load_builtin_families()
    cfg = load_manifest(path)
    for comp in cfg["components"]:
        base = comp.get("base")
        if not base:
            continue
        t = comp["type"]
        if t == "scheduler":
            assert base.split(".")[-1] in scheduler_registry, base
        elif t == "transformer":
            assert base in transformer_registry, base
        elif t == "vae":
            assert base in vae_registry, base
        elif t == "text_encoder":
            assert base in text_encoder_registry, base


def test_reference_compatible_ids_present():
    resolver = ManifestResolver(search_paths=[BUNDLED])
    for ref_id in (
        "zimage-turbo",
        "flux-dev-text-to-image",
        "wan-2-1-14b-text-to-video",
        "wan-2-2-a14b-text-to-video",
        "wan-2-2-a14b-text-to-image",
    ):
        assert resolver.get(ref_id) is not None, ref_id


def test_catalog_categories():
    resolver = ManifestResolver(search_paths=[BUNDLED])
    cats = {i.category for i in resolver.list()}
    assert {"image", "video"} <= cats


def test_reference_model_catalog_ids_resolve():
    """Every model manifest id the reference ships (57 across image/video/
    upscalers) resolves through our resolver — as a manifest of the same id
    or a metadata.aliases entry — so reference project files port over."""
    import yaml

    ref_ids = set()
    ref_root = Path("/root/reference/apps/api/manifest")
    for cat in ("image", "video", "upscalers"):
        for p in sorted((ref_root / cat).glob("*.yml")):
            doc = yaml.safe_load(p.read_text())
            rid = (doc.get("metadata") or {}).get("id")
            if rid:
                ref_ids.add(rid)
    assert len(ref_ids) >= 55

    resolver = ManifestResolver(search_paths=[BUNDLED])
    missing = [i for i in sorted(ref_ids) if resolver.resolve(i) is None]
    assert not missing, missing
