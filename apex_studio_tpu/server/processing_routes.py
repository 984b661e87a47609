"""Preprocessor / postprocessor / download / components routers.

Wire-compatible with the reference routers (api/preprocessor.py:235,
api/postprocessor.py:36, api/download.py:189, api/components.py:34): jobs go
through the same store/executor and stream progress over /ws/job/{id}.
"""

from __future__ import annotations

import logging
import uuid
from pathlib import Path
from typing import Any, Dict

from aiohttp import web

from apex_studio_tpu.server.jobs import Job, JobCancelled, JobExecutor, JobStore
from apex_studio_tpu.server.ws import ws_manager
from apex_studio_tpu.utils.defaults import get_components_path, get_results_path
from apex_studio_tpu.utils.media import save_image, save_video

logger = logging.getLogger("apex.server.processing")


def _results_dir(kind: str, job_id: str) -> Path:
    d = get_results_path() / f"{kind}_results" / job_id
    d.mkdir(parents=True, exist_ok=True)
    return d


def _progress(job: Job):
    def cb(p, message, metadata=None):
        if job.cancel_event.is_set():
            raise JobCancelled(job.job_id)
        ws_manager.send_update(job.job_id, p, message, metadata or {})

    return cb


def _run_preprocessor_job(job: Job, body: Dict[str, Any]) -> Dict[str, Any]:
    from apex_studio_tpu.preprocess.base import load_frames, run_preprocessor

    name = body.get("preprocessor_name") or body.get("name")
    frames = load_frames(body["input_path"], max_frames=body.get("max_frames"))
    out = run_preprocessor(name, frames, body.get("params") or {}, _progress(job))
    out_dir = _results_dir("preprocessor", job.job_id)
    if len(out) == 1:
        path = save_image(out[0], out_dir / f"{name}.png")
        out_type = "image"
    else:
        path = save_video(out, out_dir / f"{name}.mp4", fps=float(body.get("fps", 16)))
        out_type = "video"
    job.result_path = str(path)
    ws_manager.send_update(
        job.job_id, 1.0, "Complete",
        {"status": "complete", "result_path": str(path), "type": out_type},
    )
    return {"result_path": str(path), "type": out_type}


def _run_interpolate_job(job: Job, body: Dict[str, Any]) -> Dict[str, Any]:
    from apex_studio_tpu.postprocess.base import run_postprocessor
    from apex_studio_tpu.preprocess.base import load_frames

    frames = load_frames(body["input_path"])
    multiplier = int(body.get("multiplier", 2))
    out = run_postprocessor(
        body.get("name", "frame_interpolation"),
        frames,
        {"multiplier": multiplier},
        _progress(job),
    )
    fps = float(body.get("fps", 16)) * multiplier
    out_dir = _results_dir("postprocessor", job.job_id)
    path = save_video(out, out_dir / "interpolated.mp4", fps=fps)
    job.result_path = str(path)
    ws_manager.send_update(
        job.job_id, 1.0, "Complete",
        {"status": "complete", "result_path": str(path), "type": "video", "fps": fps},
    )
    return {"result_path": str(path), "type": "video"}


def _run_download_job(job: Job, body: Dict[str, Any]) -> Dict[str, Any]:
    from apex_studio_tpu.downloads.api import download_component, download_file

    cb = _progress(job)

    def file_progress(done: int, total: int):
        p = done / total if total and total > 0 else None
        cb(p, f"downloaded {done >> 20} MiB")

    results = []
    paths = body.get("paths") or ([body["path"]] if body.get("path") else [])
    for i, repo_path in enumerate(paths):
        if repo_path.startswith(("http://", "https://")):
            dest = get_components_path() / repo_path.split("/")[-1].split("?")[0]
            path = download_file(repo_path, dest, progress_cb=file_progress)
        else:
            path = download_component(repo_path, progress_cb=file_progress)
        results.append(str(path))
    ws_manager.send_update(
        job.job_id, 1.0, "Complete", {"status": "complete", "paths": results}
    )
    return {"paths": results}


def add_processing_routes(app: web.Application, store: JobStore, executor: JobExecutor) -> None:
    def submit(category: str, runner, body: Dict[str, Any]) -> web.Response:
        job_id = body.get("job_id") or str(uuid.uuid4())
        try:
            job = store.register(job_id, category, category, {})
        except ValueError as e:
            return web.json_response({"detail": str(e)}, status=409)
        ws_manager.send_update(job_id, 0.0, "Queued", {"status": "queued"})
        executor.submit(job, lambda j: runner(j, body))
        return web.json_response({"job_id": job_id, "status": "queued"})

    async def preprocessor_run(req: web.Request) -> web.Response:
        body = await req.json()
        if not body.get("preprocessor_name") and not body.get("name"):
            return web.json_response({"detail": "preprocessor_name required"}, status=400)
        if not body.get("input_path"):
            return web.json_response({"detail": "input_path required"}, status=400)
        return submit("processor", _run_preprocessor_job, body)

    async def preprocessor_list(_req: web.Request) -> web.Response:
        from apex_studio_tpu.preprocess.base import preprocessor_registry
        from apex_studio_tpu.preprocess.manifests import load_preprocessor_manifests

        manifests = load_preprocessor_manifests()
        # The catalog is the union of manifest ids and registry names: the
        # reference's panel lists its YAML registry (api/preprocessor.py:251
        # "available = [p['id'] for p in list_preprocessors(...)]"), and
        # alias ids (open_pose, pidi, unimatch, ...) resolve through the
        # registry at run time without a primary registration.
        names = list(preprocessor_registry.names())
        names += [n for n in manifests if n not in names]
        out = []
        for name in names:
            try:
                cls = preprocessor_registry.get(name)
            except KeyError:
                continue  # manifest without implementation: hide
            entry = {"name": name, "params": getattr(cls, "params_schema", {})}
            m = manifests.get(name)
            if m:  # editor display metadata (reference manifest/preprocessor/*.yml)
                entry.update({
                    "display_name": m.get("display_name", name),
                    "category": m.get("category", ""),
                    "description": m.get("description", ""),
                    "parameters": m.get("parameters", []),
                })
                if m.get("availability"):
                    entry["availability"] = m["availability"]
            out.append(entry)
        return web.json_response(out)

    async def frame_interpolate(req: web.Request) -> web.Response:
        body = await req.json()
        if not body.get("input_path"):
            return web.json_response({"detail": "input_path required"}, status=400)
        return submit("processor", _run_interpolate_job, body)

    async def download(req: web.Request) -> web.Response:
        body = await req.json()
        if not (body.get("path") or body.get("paths")):
            return web.json_response({"detail": "path(s) required"}, status=400)
        return submit("download", _run_download_job, body)

    async def components_download(req: web.Request) -> web.Response:
        return await download(req)

    async def components_delete(req: web.Request) -> web.Response:
        body = await req.json()
        rel = body.get("path")
        if not rel:
            return web.json_response({"detail": "path required"}, status=400)
        target = (get_components_path() / rel).resolve()
        if not str(target).startswith(str(get_components_path().resolve())):
            return web.json_response({"detail": "path escapes components dir"}, status=400)
        if target.is_file():
            target.unlink()
        elif target.is_dir():
            import shutil

            shutil.rmtree(target)
        else:
            return web.json_response({"detail": "not found"}, status=404)
        return web.json_response({"deleted": rel})

    app.add_routes(
        [
            web.post("/preprocessor/run", preprocessor_run),
            web.get("/preprocessor/list", preprocessor_list),
            web.post("/postprocessor/frame-interpolate", frame_interpolate),
            web.post("/download", download),
            web.post("/components/download", components_download),
            web.delete("/components/delete", components_delete),
        ]
    )
