"""Trajectory conditioning for Wan ATI ("Any Trajectory Instruction").

TPU-native counterpart of the reference's ``src/engine/wan/ati.py``
(``patch_motion``, ``merge_final``, ``ind_sel``; upstream ByteDance ATI) and
``src/helpers/wan/ati.py`` (``process_tracks``, ``unzip_to_array``): sparse
point tracks are normalised, resampled from 24 fps capture to the model's
16 fps frame grid, then *painted* into the 20-channel i2v conditioning latent
— each later latent frame receives a soft splat of the first frame's features
at the tracked positions (gaussian kernel in normalised screen space, top-k
nearest tracks per pixel), and the validity mask channels carry the splat
weight.

Everything here runs once per request on latent-resolution tensors, so it is
plain jax.numpy/numpy on host rather than a jitted kernel.
"""

from __future__ import annotations

import io
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def unzip_to_array(data: bytes, key: str = "array") -> np.ndarray:
    """npz bytes → array (helpers/wan/ati.py:9)."""
    with np.load(io.BytesIO(data)) as z:
        return z[key]


def process_tracks(
    tracks_np: np.ndarray,
    frame_size: Tuple[int, int],
    quant_multi: int = 8,
) -> np.ndarray:
    """Raw captured tracks → (rows, N, 4) model tracks.

    Mirrors helpers/wan/ati.py:25 — rows are ``[trange, x, y, visible]`` with
    coordinates centred and scaled by the short edge (±short/2 → ±1·scale),
    visibility mapped to ±1, and 121 capture frames (24 fps) resampled to
    1 + 80 rows matching 21 latent frames × 4 pixel frames.
    """
    tracks = np.asarray(tracks_np, np.float32) / float(quant_multi)
    if tracks.ndim == 4 and tracks.shape[1] == 121:
        tracks = tracks.transpose(1, 0, 2, 3)
    xy, visible = tracks[..., :2], tracks[..., 2:3]
    short_edge = float(min(frame_size))
    xy = (xy - np.asarray(frame_size, np.float32) / 2.0) / short_edge * 2.0
    visible = visible * 2.0 - 1.0
    T = xy.shape[0]
    trange = np.linspace(-1.0, 1.0, T, dtype=np.float32).reshape(
        (-1,) + (1,) * (visible.ndim - 1)
    ) * np.ones_like(visible)
    out = np.concatenate([trange, xy, visible], axis=-1).reshape(T, -1, 4)
    if T == 121:  # 24 fps capture → 16 fps model grid (1 + 80 rows)
        head, tail = out[:1], out[1:]
        tail = np.repeat(tail, 2, axis=0)[1::3]
        out = np.concatenate([head, tail], axis=0)
    return out


def _bilinear_sample(feat: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (C, H, W) features at (N, 2) normalised [-1, 1] (x, y) points.

    torch grid_sample semantics with align_corners=False and zero padding
    (ati.py:156 point_feature sampling of the first-frame latent).
    """
    C, H, W = feat.shape
    ix = (xy[:, 0] + 1.0) * 0.5 * W - 0.5
    iy = (xy[:, 1] + 1.0) * 0.5 * H - 0.5
    x0, y0 = jnp.floor(ix), jnp.floor(iy)
    wx, wy = ix - x0, iy - y0
    out = jnp.zeros((xy.shape[0], C), feat.dtype)
    for dx, dy, w in ((0, 0, (1 - wx) * (1 - wy)), (1, 0, wx * (1 - wy)),
                      (0, 1, (1 - wx) * wy), (1, 1, wx * wy)):
        xi = (x0 + dx).astype(jnp.int32)
        yi = (y0 + dy).astype(jnp.int32)
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).astype(feat.dtype)
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        out = out + feat[:, yi, xi].T * (w * valid)[:, None]
    return out  # (N, C)


def patch_motion(
    tracks: jnp.ndarray,
    vid: jnp.ndarray,
    temperature: float = 220.0,
    vae_divide: Tuple[int, int] = (4, 16),
    topk: int = 2,
    frames_per_latent: int = 4,
) -> jnp.ndarray:
    """Paint sparse track motion into the i2v conditioning latent.

    ``tracks``: (rows, N, 4) from :func:`process_tracks`, rows = 1 +
    ``frames_per_latent``·(T−1) (4 for the real Wan VAE, ati.py:139);
    ``vid``: (mask + z, T, H, W) conditioning latent (mask channels first).
    Reference ati.py:96 ``patch_motion`` with ``training=False`` (inference
    never applies tail dropout). Returns the same shape as ``vid``.
    """
    n_mask, _ = vae_divide
    _, T, H, W = vid.shape
    N = tracks.shape[1]
    xy, visible = tracks[..., 1:3], tracks[..., 3:4]
    short = float(min(H, W))
    tracks_n = jnp.clip(xy / jnp.asarray([W / short, H / short]), -1.0, 1.0)
    visible = jnp.clip(visible, 0.0, 1.0)

    # pixel grid in short-edge-normalised (x, y) coordinates (ati.py:124)
    xx = jnp.linspace(-W / short, W / short, W)
    yy = jnp.linspace(-H / short, H / short, H)
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    grid = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)

    # average the pixel-frame rows that share each latent frame
    f = frames_per_latent
    tracks_pad = tracks_n[1:].reshape(T - 1, f, N, 2)
    visible_pad = visible[1:].reshape(T - 1, f, N, 1)
    visible_align = visible_pad.sum(1)  # (T-1, N, 1)
    tracks_align = (tracks_pad * visible_pad).sum(1) / (visible_align + 1e-5)

    dist = ((tracks_align[:, None, None] - grid[None, :, :, None]) ** 2).sum(-1)
    weight = jnp.exp(-dist * temperature) * jnp.clip(
        visible_align, 0.0, 1.0).reshape(T - 1, 1, 1, N)
    k = min(topk, N)
    vert_weight, vert_index = jax.lax.top_k(weight, k)  # (T-1, H, W, k)

    point_feature = _bilinear_sample(vid[n_mask:, 0], tracks_n[0])  # (N, C)
    sel = point_feature[vert_index]  # (T-1, H, W, k, C)
    out_feature = (sel * vert_weight[..., None]).sum(-2)  # (T-1, H, W, C)
    out_feature = out_feature.transpose(3, 0, 1, 2)  # (C, T-1, H, W)
    out_weight = vert_weight.sum(-1)  # (T-1, H, W)

    mix = out_feature + vid[n_mask:, 1:] * (1.0 - jnp.clip(out_weight, 0.0, 1.0))
    feature_full = jnp.concatenate([vid[n_mask:, :1], mix], axis=1)
    mask_full = jnp.concatenate(
        [jnp.ones_like(out_weight[:1]), out_weight], axis=0)  # (T, H, W)
    return jnp.concatenate(
        [jnp.broadcast_to(mask_full[None], (n_mask, T, H, W)), feature_full],
        axis=0)


def prepare_tracks(
    trajectory: Union[str, bytes, np.ndarray],
    width: int,
    height: int,
    quant_multi: int = 8,
) -> np.ndarray:
    """Accept an .npz path, npz bytes, raw (T, N, 3) pixel tracks, or
    already-processed (rows, N, 4) tracks; return (rows, N, 4)."""
    if isinstance(trajectory, (str, bytes)):
        data = trajectory if isinstance(trajectory, bytes) else open(
            trajectory, "rb").read()
        trajectory = unzip_to_array(data)
    arr = np.asarray(trajectory, np.float32)
    if arr.ndim >= 3 and arr.shape[-1] == 4:  # already processed
        return arr.reshape(arr.shape[0], -1, 4)
    return process_tracks(arr, (width, height), quant_multi=quant_multi)
