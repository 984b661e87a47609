"""Spatially tiled decode for the 3D-causal video VAEs.

A 720p×121-frame decode held entirely in HBM needs tens of GB of activations
(every upsampled stage materializes [T, H, W, C] at growing resolution) — the
reference answers this with tiled_decode on CUDA
(``src/engine/base_engine.py:2030`` + ``src/vae/wan/model.py``); this is the
TPU counterpart. Tiles are uniform-shaped (edge tiles are shifted inward, not
shrunk) so every tile reuses ONE compiled program; seams blend with linear
ramps in pixel space. Temporal extent stays whole — the causal time axis is
what gives these VAEs their streaming semantics, and slicing it would need
conv-state carry; spatial tiling alone divides activation memory by the tile
count.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np


def decode_tiled_3d(
    decode_fn: Callable[[jnp.ndarray], jnp.ndarray],
    z: jnp.ndarray,                 # [B, C, T, H, W] latents
    spatial_scale: int,
    tile: int = 24,
    overlap: int = None,
) -> jnp.ndarray:
    """→ [B, out_ch, T_pix, H·s, W·s]; ``decode_fn`` maps latent tiles to
    pixel tiles (already jitted by the caller; uniform tile shapes mean it
    compiles once). Default overlap = tile/4, the reference's 25%
    tile_overlap_factor (vae/hunyuanvideo15/model.py:1060). Tiles come back
    to the host as f16 (the accumulator is f32) — halves the device->host
    transfer, which dominates on a remote relay."""
    b, c, t, h, w = z.shape
    if h <= tile and w <= tile:
        return decode_fn(z)
    if overlap is None:
        overlap = max(2, tile // 4)
    s = spatial_scale
    stride = tile - overlap
    out = None
    weight = np.zeros((1, 1, 1, h * s, w * s), np.float32)

    def ramp(n: int, lead: bool, trail: bool) -> np.ndarray:
        wv = np.ones(n, np.float32)
        ov = overlap * s
        if lead:
            wv[:ov] = np.linspace(0.0, 1.0, ov, endpoint=False)
        if trail:
            wv[-ov:] = np.linspace(1.0, 0.0, ov, endpoint=False)
        return wv

    ys = list(range(0, max(h - overlap, 1), stride))
    xs = list(range(0, max(w - overlap, 1), stride))
    for y0 in ys:
        for x0 in xs:
            y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
            y0a, x0a = max(0, y1 - tile), max(0, x1 - tile)  # uniform shape
            patch = np.asarray(
                decode_fn(z[:, :, :, y0a:y1, x0a:x1]).astype(jnp.float16),
                np.float32)
            if out is None:
                t_pix, out_ch = patch.shape[2], patch.shape[1]
                out = np.zeros((b, out_ch, t_pix, h * s, w * s), np.float32)
            ph, pw = patch.shape[-2:]
            wy = ramp(ph, lead=y0a > 0, trail=y1 < h)
            wx = ramp(pw, lead=x0a > 0, trail=x1 < w)
            wmap = (wy[:, None] * wx[None, :])[None, None, None]
            out[:, :, :, y0a * s : y1 * s, x0a * s : x1 * s] += patch * wmap
            weight[:, :, :, y0a * s : y1 * s, x0a * s : x1 * s] += wmap
    return jnp.asarray(out / np.maximum(weight, 1e-6))
