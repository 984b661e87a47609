"""Mask routers (/mask/create, /mask/track) — reference api/mask.py:418,584.

`create` is synchronous (sub-second); `track` runs as a job streaming
per-frame contours over /ws/job/{id}, with cancellation like the reference's
/mask/track/cancel/{id}.
"""

from __future__ import annotations

import logging
import uuid
from typing import Any, Dict

import numpy as np
from aiohttp import web

from apex_studio_tpu.server.jobs import Job, JobCancelled, JobExecutor, JobStore
from apex_studio_tpu.server.ws import ws_manager

logger = logging.getLogger("apex.server.mask")


def _load_frame(path: str, frame_number: int | None):
    from apex_studio_tpu.preprocess.base import load_frames

    is_video = not path.lower().endswith((".png", ".jpg", ".jpeg", ".webp", ".bmp"))
    if is_video:
        frames = load_frames(path, max_frames=(frame_number or 0) + 1)
        return frames[min(frame_number or 0, len(frames) - 1)], is_video
    return load_frames(path)[0], is_video


def _run_track_job(job: Job, body: Dict[str, Any]) -> Dict[str, Any]:
    from apex_studio_tpu.mask.segment import mask_from_points, mask_to_contours, track_mask
    from apex_studio_tpu.preprocess.base import load_frames

    frames = load_frames(body["input_path"], max_frames=body.get("max_frames"))
    start = int(body.get("frame_number", 0))
    image = frames[min(start, len(frames) - 1)]
    initial = mask_from_points(
        image,
        body.get("points") or [],
        body.get("point_labels"),
        body.get("box"),
        tool=body.get("tool", "touch"),
    )

    def progress(p, message, metadata=None):
        if job.cancel_event.is_set():
            raise JobCancelled(job.job_id)
        ws_manager.send_update(job.job_id, p, message, metadata or {})

    masks = track_mask(
        frames, initial, start_frame=start,
        direction=body.get("direction", "forward"),
        progress_callback=progress,
    )
    per_frame = {
        int(idx): mask_to_contours(m) for idx, m in sorted(masks.items())
    }
    ws_manager.send_update(
        job.job_id, 1.0, "Tracking complete",
        {"status": "complete", "frames": list(per_frame)},
    )
    job.result = {"contours_by_frame": per_frame}
    return job.result


def add_mask_routes(app: web.Application, store: JobStore, executor: JobExecutor) -> None:
    async def create(req: web.Request) -> web.Response:
        from apex_studio_tpu.mask.segment import mask_from_points, mask_to_contours

        body = await req.json()
        if not body.get("input_path"):
            return web.json_response({"detail": "input_path required"}, status=400)
        try:
            image, is_video = _load_frame(body["input_path"], body.get("frame_number"))
        except (FileNotFoundError, ValueError) as e:
            return web.json_response({"detail": str(e)}, status=404)
        if is_video and body.get("frame_number") is None:
            return web.json_response(
                {"detail": "frame_number is required for video inputs"}, status=400
            )
        if not body.get("points") and not body.get("box"):
            return web.json_response(
                {"status": "error", "message": "Provide points or box"}, status=400
            )
        mask = mask_from_points(
            image,
            body.get("points") or [],
            body.get("point_labels"),
            body.get("box"),
            tool=body.get("tool", "touch"),
        )
        return web.json_response(
            {
                "status": "success",
                "contours": mask_to_contours(mask),
                "input_path": body["input_path"],
                "frame_number": body.get("frame_number"),
                "tool": body.get("tool", "touch"),
                "message": "mask created",
            }
        )

    async def track(req: web.Request) -> web.Response:
        body = await req.json()
        if not body.get("input_path"):
            return web.json_response({"detail": "input_path required"}, status=400)
        job_id = body.get("job_id") or str(uuid.uuid4())
        try:
            job = store.register(job_id, "mask_track", "processor", {})
        except ValueError as e:
            return web.json_response({"detail": str(e)}, status=409)
        ws_manager.send_update(job_id, 0.0, "Queued", {"status": "queued"})
        executor.submit(job, lambda j: _run_track_job(j, body))
        return web.json_response({"job_id": job_id, "status": "queued"})

    async def track_cancel(req: web.Request) -> web.Response:
        ok = store.cancel(req.match_info["job_id"])
        return web.json_response({"job_id": req.match_info["job_id"], "canceled": ok})

    async def track_result(req: web.Request) -> web.Response:
        job = store.get(req.match_info["job_id"])
        if job is None:
            return web.json_response({"detail": "job not found"}, status=404)
        return web.json_response({"job_id": job.job_id, "status": job.status,
                                  "result": job.result, "error": job.error})

    app.add_routes(
        [
            web.post("/mask/create", create),
            web.post("/mask/track", track),
            web.post("/mask/track/cancel/{job_id}", track_cancel),
            web.get("/mask/track/result/{job_id}", track_result),
        ]
    )
