"""SeedVR2 — NaDiT video-restoration transformers (7B "base" + 3B "base_v2").

Faithful JAX/NNX counterparts of the reference's two variants:

- ``seedvr.base`` (7B): ``src/transformer/seedvr/base/model.py:45`` +
  ``base/nablocks/mmsr_block.py:36`` — separate vid/txt weights in every
  layer, GELU-tanh MLP, pixel-frequency 3-D rope over ``head_dim // 2`` dims
  (``base/nablocks/mmsr_block.py:65`` NaRotaryEmbedding3d).
- ``seedvr.base_v2`` (3B): ``src/transformer/seedvr/base_v2/model.py:45`` +
  ``base_v2/nablocks/mmsr_block.py:30`` — the first ``mm_layers`` layers keep
  separate vid/txt weights, the rest share one set (``model.py:167``
  ``shared_weights = not (i < mm_layers)``), SwiGLU MLP, and "mmrope3d"
  (``base_v2/rope.py:88``): lang-frequency rope where text tokens take 1-D
  positions [0, Lt) repeated across the three axes and the video temporal
  axis is offset by Lt.

Shared structure (both variants):
- 720p-normalized swin windows (``base_v2/window.py:10``): the window SIZE is
  what a (45, 80) latent grid divided into ``window`` counts would give, and
  the window COUNT grows with resolution; odd layers use the half-window
  shifted variant with ragged edge windows. Every window attends to
  [own video tokens | full text]; per-window text outputs are averaged back
  into one text stream (``base_v2/na.py:120`` unconcat_coalesce).
- AdaSingle modulation (``base_v2/modulation.py:42``): the time embedding
  (``emb_dim == 6 * dim``) is sliced into (shift, scale, gate) per (attn,
  mlp), added to per-block learned vectors; ``x * (scaleA + scaleB) +
  (shiftA + shiftB)`` — note no ``1 +`` convention; the checkpoint's scaleB
  is initialized near 1.
- TimeEmbedding (``base_v2/embedding.py``): sinusoidal(256, sin-first) →
  Linear → SiLU → Linear → SiLU → Linear(emb_dim).
- RMS pre-norms without affine (config ``norm: rms``), affine RMS qk-norm.

TPU adaptation: the reference packs ragged native-resolution windows for
varlen flash-attn; here window membership is precomputed at trace time
(shapes are static under jit) as gather indices + key-padding masks, so every
layer is one batched attention call over [n_windows, max_window_len + Lt]
with static shapes. Scatter-back is a pure gather through the precomputed
inverse permutation.

Quirk note: the reference's 3B final ``vid_out_ada`` (``base_v2/model.py:187``
layers=["out"]) slices the 6·dim embedding with l=1, g=3 which yields 2·dim
chunks and crashes in torch as written; we use the well-defined (dim, 2, 3)
reshape and take slot 0, keeping the checkpoint's out_shift/out_scale vectors
meaningful. The 7B config's ``vid_out_norm`` is silently swallowed by
``**kwargs`` in the reference (``base/model.py`` has no final norm) — we
follow that behavior.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops.attention import attention


@dataclasses.dataclass
class SeedVRConfig:
    vid_in_channels: int = 33      # latent + cond latent (+ mask)
    vid_out_channels: int = 16
    vid_dim: int = 2560
    txt_in_dim: int = 5120
    txt_dim: int = 2560
    emb_dim: int = 15360           # AdaSingle contract: 6 * vid_dim
    heads: int = 20
    head_dim: int = 128
    expand_ratio: int = 4
    num_layers: int = 32
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    window: Tuple[int, int, int] = (4, 3, 3)   # 720p-normalized window counts
    # Variant knobs (reference manifest configs):
    mm_layers: Optional[int] = None  # None => separate vid/txt weights everywhere (7B)
    mlp_type: str = "normal"         # "normal" (7B) | "swiglu" (3B)
    qk_bias: bool = False
    qk_rope: bool = False            # 7B: pixel-freq 3-D rope on head_dim // 2
    rope_type: Optional[str] = None  # 3B: "mmrope3d"
    rope_dim: Optional[int] = None   # 3B: 128
    vid_out_norm: Optional[str] = None  # 3B: "rms"
    norm_eps: float = 1e-6

    @classmethod
    def from_dict(cls, cfg: dict) -> "SeedVRConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in cfg.items() if k in known}
        if isinstance(kw.get("txt_in_dim"), tuple):
            kw["txt_in_dim"] = kw["txt_in_dim"][0]
        return cls(**kw)

    def shared_at(self, layer: int) -> bool:
        if self.mm_layers is None:
            return False
        return not (layer < self.mm_layers)


# ---------------------------------------------------------------------------
# Window partitioning (reference base_v2/window.py semantics, trace-time)

def _window_starts(t: int, h: int, w: int, counts, shifted: bool):
    """Per-axis (start, stop) lists mirroring make_720Pwindows_bysize /
    make_shifted_720Pwindows_bysize: window size normalized to a 45x80 grid,
    shifted variant offset by half a window with ragged edge windows."""
    nt_c, nh_c, nw_c = counts
    scale = math.sqrt((45 * 80) / (h * w))
    rh, rw = round(h * scale), round(w * scale)
    wh, ww = math.ceil(rh / nh_c), math.ceil(rw / nw_c)
    wt = math.ceil(min(t, 30) / nt_c)

    def axis(n_len, win):
        if not shifted or win >= n_len:
            n = math.ceil(n_len / win)
            return [(i * win, min((i + 1) * win, n_len)) for i in range(n)
                    if min((i + 1) * win, n_len) > i * win]
        n = math.ceil((n_len - 0.5) / win) + 1
        out = []
        for i in range(n):
            lo = max(int((i - 0.5) * win), 0)
            hi = min(int((i + 0.5) * win), n_len)
            if hi > lo:
                out.append((lo, hi))
        return out

    return axis(t, wt), axis(h, wh), axis(w, ww)


def _build_windows(t: int, h: int, w: int, counts, shifted: bool):
    """→ (win_idx [n_win, L_max], valid [n_win, L_max], coords [n_win, L_max, 3],
    inv_idx [t*h*w]) — flat token ids per window, their validity, their
    window-local (t, h, w) coordinates, and the inverse permutation."""
    ts, hs, ws = _window_starts(t, h, w, counts, shifted)
    flat = np.arange(t * h * w).reshape(t, h, w)
    wins, coords = [], []
    # Reference iterates windows as for iw: for ih: for it (ordering is
    # internal only; outputs are scatter-equivalent).
    for (wlo, whi) in ws:
        for (hlo, hhi) in hs:
            for (tlo, thi) in ts:
                block = flat[tlo:thi, hlo:hhi, wlo:whi]
                wins.append(block.ravel())
                tt, hh2, ww2 = block.shape
                c = np.stack(np.meshgrid(np.arange(tt), np.arange(hh2),
                                         np.arange(ww2), indexing="ij"),
                             axis=-1).reshape(-1, 3)
                coords.append(c)
    n_win = len(wins)
    l_max = max(len(x) for x in wins)
    win_idx = np.zeros((n_win, l_max), np.int32)
    valid = np.zeros((n_win, l_max), bool)
    coord = np.zeros((n_win, l_max, 3), np.int32)
    for i, (ids, c) in enumerate(zip(wins, coords)):
        win_idx[i, : len(ids)] = ids
        valid[i, : len(ids)] = True
        coord[i, : len(ids)] = c
    # inverse permutation: token -> (win * l_max + slot)
    inv = np.zeros((t * h * w,), np.int64)
    inv[win_idx[valid]] = (np.arange(n_win)[:, None] * l_max
                           + np.arange(l_max)[None, :])[valid]
    return win_idx, valid, coord, inv


# ---------------------------------------------------------------------------
# Rotary embeddings (rotary_embedding_torch conventions: interleaved pairs,
# freqs duplicated per pair)

def _dup(x):
    return np.repeat(x, 2, axis=-1)


def _pixel_freqs(dim_axis: int, max_freq: float = 256.0):
    """freqs_for="pixel": linspace(1, max_freq/2, dim//2) * pi; positions are
    linspace(-1, 1, L) (reference base/nablocks rope via RotaryEmbedding)."""
    return np.linspace(1.0, max_freq / 2, dim_axis // 2) * math.pi


def _lang_freqs(dim_axis: int, theta: float = 10000.0):
    return 1.0 / (theta ** (np.arange(0, dim_axis, 2, dtype=np.float64) / dim_axis))


def _rope_tables_pixel(coord: np.ndarray, head_dim: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """7B rope: NaRotaryEmbedding3d(dim=head_dim//2) → per-axis dim
    (head_dim//2)//3, pixel freqs, positions linspace(-1,1,axis_len) of the
    WINDOW's own extent. coord [n_win, L, 3] window-local integer coords."""
    dim_axis = (head_dim // 2) // 3
    base = _pixel_freqs(dim_axis)
    parts = []
    for ax in range(3):
        # positions linspace(-1, 1, L) indexed by window-local coordinate;
        # windows are ragged, so normalize by each window's own extent
        ext = np.maximum(coord[..., ax].max(axis=1, keepdims=True), 1)
        pos = coord[..., ax] / ext * 2.0 - 1.0
        parts.append(pos[..., None] * base[None, None, :])
    f = np.concatenate(parts, axis=-1)  # [n_win, L, 3*dim//2]
    return _dup(np.cos(f)).astype(np.float32), _dup(np.sin(f)).astype(np.float32)


def _rope_tables_lang_vid(coord: np.ndarray, rope_dim: int, txt_len: int):
    """3B mmrope3d video tables: lang freqs, integer positions, temporal axis
    offset by the text length (base_v2/rope.py:141 vid_freqs[l : l + f])."""
    dim_axis = rope_dim // 3
    base = _lang_freqs(dim_axis)
    parts = []
    for ax in range(3):
        pos = coord[..., ax].astype(np.float64)
        if ax == 0:
            pos = pos + txt_len
        parts.append(pos[..., None] * base[None, None, :])
    f = np.concatenate(parts, axis=-1)
    return _dup(np.cos(f)).astype(np.float32), _dup(np.sin(f)).astype(np.float32)


def _rope_tables_lang_txt(txt_len: int, rope_dim: int):
    """Text tables: 1-D positions [0, Lt), the single-axis freqs repeated
    across all three thirds (base_v2/rope.py:146 txt_freqs.repeat(1, 3))."""
    dim_axis = rope_dim // 3
    base = _lang_freqs(dim_axis)
    pos = np.arange(txt_len, dtype=np.float64)
    f1 = pos[:, None] * base[None, :]
    f = np.concatenate([f1, f1, f1], axis=-1)
    return _dup(np.cos(f)).astype(np.float32), _dup(np.sin(f)).astype(np.float32)


def _apply_rot(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [..., hd]; cos/sin [..., R] (R even, duplicated pairs). Rotates the
    first R dims with interleaved-pair convention, passes the rest through."""
    r = cos.shape[-1]
    xr = x[..., :r].astype(jnp.float32)
    pairs = xr.reshape(*xr.shape[:-1], r // 2, 2)
    rot = jnp.stack([-pairs[..., 1], pairs[..., 0]], axis=-1).reshape(xr.shape)
    out = xr * cos + rot * sin
    return jnp.concatenate([out.astype(x.dtype), x[..., r:]], axis=-1)


# ---------------------------------------------------------------------------
# Modules

def _rms(x, eps):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)


class _MM(nnx.Module):
    """MMModule counterpart (base_v2/mm.py:37): shared_weights=True keeps one
    module under ``all``; otherwise separate ``vid``/``txt`` (txt omitted when
    vid_only)."""

    def __init__(self, make, *, shared: bool, vid_only: bool = False):
        if shared:
            self.all = make()
            self.vid = None
            self.txt = None
        else:
            self.all = None
            self.vid = make()
            self.txt = None if vid_only else make()

    def v(self):
        return self.all if self.all is not None else self.vid

    def t(self):
        return self.all if self.all is not None else self.txt


class _AdaSingle(nnx.Module):
    """AdaSingle (base_v2/modulation.py:42): per-block learned (shift, scale,
    gate) vectors per layer tag, combined with slices of the 6*dim time
    embedding. No Linear — the checkpoint stores bare vectors."""

    def __init__(self, dim: int, layers: Tuple[str, ...],
                 modes: Tuple[str, ...] = ("in", "out"), *, rngs):
        self.dim = dim
        self.layer_names = layers
        for l in layers:
            if "in" in modes:
                setattr(self, f"{l}_shift", nnx.Param(
                    jax.random.normal(rngs.params(), (dim,)) / dim**0.5))
                setattr(self, f"{l}_scale", nnx.Param(
                    jax.random.normal(rngs.params(), (dim,)) / dim**0.5 + 1.0))
            if "out" in modes:
                setattr(self, f"{l}_gate", nnx.Param(
                    jax.random.normal(rngs.params(), (dim,)) / dim**0.5))

    def _slice(self, emb, layer):
        # emb [B, 6*dim] → [B, dim, n_slots, 3]; slot order (attn, mlp)
        b = emb.shape[0]
        e = emb.reshape(b, self.dim, -1, 3)
        idx = min(self.layer_names.index(layer), e.shape[2] - 1)
        return e[:, :, idx, 0], e[:, :, idx, 1], e[:, :, idx, 2]

    def mod_in(self, x, emb, layer):
        shift_a, scale_a, _ = self._slice(emb, layer)
        shift_b = getattr(self, f"{layer}_shift").value
        scale_b = getattr(self, f"{layer}_scale").value
        nd = x.ndim - 2
        expand = (slice(None),) + (None,) * nd
        scale = (scale_a + scale_b[None])[expand]
        shift = (shift_a + shift_b[None])[expand]
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)

    def mod_out(self, x, emb, layer):
        _, _, gate_a = self._slice(emb, layer)
        gate_b = getattr(self, f"{layer}_gate").value
        nd = x.ndim - 2
        expand = (slice(None),) + (None,) * nd
        gate = (gate_a + gate_b[None])[expand]
        return x * gate.astype(x.dtype)


class _MLP(nnx.Module):
    def __init__(self, dim, expand_ratio, *, dtype, rngs):
        kw = dict(use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.proj_in = Linear(dim, dim * expand_ratio, **kw)
        self.proj_out = Linear(dim * expand_ratio, dim, **kw)

    def __call__(self, x):
        return self.proj_out(nnx.gelu(self.proj_in(x), approximate=True))


class _SwiGLUMLP(nnx.Module):
    def __init__(self, dim, expand_ratio, *, dtype, rngs, multiple_of=256):
        hidden = int(2 * dim * expand_ratio / 3)
        hidden = multiple_of * ((hidden + multiple_of - 1) // multiple_of)
        kw = dict(use_bias=False, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.proj_in_gate = Linear(dim, hidden, **kw)
        self.proj_in = Linear(dim, hidden, **kw)
        self.proj_out = Linear(hidden, dim, **kw)

    def __call__(self, x):
        return self.proj_out(nnx.silu(self.proj_in_gate(x)) * self.proj_in(x))


class _SwinAttention(nnx.Module):
    """NaSwinAttention counterpart: fused per-branch qkv, affine RMS qk-norm,
    per-window rope, [window video | full text] attention with text outputs
    averaged over windows."""

    def __init__(self, cfg: SeedVRConfig, shared: bool, *, dtype, rngs):
        inner = cfg.heads * cfg.head_dim
        lin = lambda din, dout, bias: (lambda: Linear(
            din, dout, use_bias=bias, dtype=dtype, param_dtype=dtype, rngs=rngs))
        self.proj_qkv = _MM(lin(cfg.vid_dim, 3 * inner, cfg.qk_bias), shared=shared)
        self.proj_out = _MM(lin(inner, cfg.vid_dim, True), shared=shared)
        mk_norm = lambda: RMSNorm(cfg.head_dim, eps=cfg.norm_eps)
        self.norm_q = _MM(mk_norm, shared=shared)
        self.norm_k = _MM(mk_norm, shared=shared)
        self.cfg = cfg

    def __call__(self, vid, txt, windows, rope_vid, rope_txt):
        """vid [B, N, d] flat grid tokens; txt [B, Lt, d];
        windows = (win_idx, valid, inv_idx) trace-time arrays."""
        cfg = self.cfg
        win_idx, valid, inv_idx = windows
        b = vid.shape[0]
        lt = txt.shape[1]
        heads, hd = cfg.heads, cfg.head_dim
        n_win, l_max = win_idx.shape

        vq = self.proj_qkv.v()(vid)
        tq = self.proj_qkv.t()(txt)

        # gather into windows: [B, n_win, L_max, 3*inner]
        vw = vq[:, win_idx.reshape(-1)].reshape(b, n_win, l_max, -1)

        def split_heads(x):
            return x.reshape(*x.shape[:-1], 3, heads, hd)

        vqkv = split_heads(vw)
        tqkv = split_heads(tq)
        v_q, v_k, v_v = vqkv[..., 0, :, :], vqkv[..., 1, :, :], vqkv[..., 2, :, :]
        t_q, t_k, t_v = tqkv[..., 0, :, :], tqkv[..., 1, :, :], tqkv[..., 2, :, :]

        v_q = (self.norm_q.v()(v_q)).astype(vid.dtype)
        v_k = (self.norm_k.v()(v_k)).astype(vid.dtype)
        t_q = (self.norm_q.t()(t_q)).astype(vid.dtype)
        t_k = (self.norm_k.t()(t_k)).astype(vid.dtype)

        if rope_vid is not None:
            cos_v, sin_v = rope_vid  # [n_win, L_max, R]
            v_q = _apply_rot(v_q, cos_v[None, :, :, None], sin_v[None, :, :, None])
            v_k = _apply_rot(v_k, cos_v[None, :, :, None], sin_v[None, :, :, None])
        if rope_txt is not None:
            cos_t, sin_t = rope_txt  # [Lt, R]
            t_q = _apply_rot(t_q, cos_t[None, :, None], sin_t[None, :, None])
            t_k = _apply_rot(t_k, cos_t[None, :, None], sin_t[None, :, None])

        # append full text to every window: [B*n_win, L_max+Lt, heads, hd]
        rep = lambda x: jnp.broadcast_to(
            x[:, None], (b, n_win, *x.shape[1:])).reshape(b * n_win, *x.shape[1:])
        cat = lambda wv, tv: jnp.concatenate(
            [wv.reshape(b * n_win, l_max, heads, hd), rep(tv)], axis=1)
        q = cat(v_q, t_q)
        k = cat(v_k, t_k)
        v = cat(v_v.astype(vid.dtype), t_v.astype(vid.dtype))
        mask = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(valid)[None], (b, n_win, l_max)
                              ).reshape(b * n_win, l_max),
             jnp.ones((b * n_win, lt), bool)], axis=1)

        out = attention(q, k, v, mask=mask)  # [B*n_win, L_max+Lt, heads, hd]
        out = out.reshape(b, n_win, l_max + lt, heads * hd)
        vid_out = out[:, :, :l_max]
        txt_out = out[:, :, l_max:].mean(axis=1)  # average over windows

        # scatter windows back to the flat grid (pure gather via inv perm)
        flat = vid_out.reshape(b, n_win * l_max, heads * hd)[:, inv_idx]
        return self.proj_out.v()(flat), self.proj_out.t()(txt_out)


class SeedVRBlock(nnx.Module):
    """NaMMSRTransformerBlock (both variants share the flow)."""

    def __init__(self, cfg: SeedVRConfig, layer: int, *, dtype, rngs):
        shared = cfg.shared_at(layer)
        last = layer == cfg.num_layers - 1
        # last-layer txt branch is dropped for mlp/ada only when the variant
        # uses vid_only (base_v2 is_last_layer; the 7B base keeps txt всюду)
        vid_only = last and cfg.mm_layers is not None
        self.attn = _SwinAttention(cfg, shared, dtype=dtype, rngs=rngs)
        mk_mlp = ((lambda: _SwiGLUMLP(cfg.vid_dim, cfg.expand_ratio,
                                      dtype=dtype, rngs=rngs))
                  if cfg.mlp_type == "swiglu"
                  else (lambda: _MLP(cfg.vid_dim, cfg.expand_ratio,
                                     dtype=dtype, rngs=rngs)))
        self.mlp = _MM(mk_mlp, shared=shared, vid_only=vid_only)
        mk_ada = lambda: _AdaSingle(cfg.vid_dim, ("attn", "mlp"), rngs=rngs)
        self.ada = _MM(mk_ada, shared=shared, vid_only=vid_only)
        self.vid_only = vid_only
        self.cfg = cfg

    def __call__(self, vid, txt, emb, windows, rope_vid, rope_txt):
        cfg = self.cfg
        eps = cfg.norm_eps
        # attn: norm → ada-in → attention → ada-out → residual
        nv = _rms(vid, eps).astype(vid.dtype)
        nt = _rms(txt, eps).astype(vid.dtype)
        nv = self.ada.v().mod_in(nv, emb, "attn")
        if not self.vid_only:
            nt = self.ada.t().mod_in(nt, emb, "attn")
        av, at = self.attn(nv, nt, windows, rope_vid, rope_txt)
        av = self.ada.v().mod_out(av, emb, "attn")
        if not self.vid_only:
            at = self.ada.t().mod_out(at, emb, "attn")
        vid = vid + av
        txt = txt + at

        # mlp: norm → ada-in → mlp → ada-out → residual
        nv = _rms(vid, eps).astype(vid.dtype)
        nv = self.ada.v().mod_in(nv, emb, "mlp")
        vid = vid + self.ada.v().mod_out(self.mlp.v()(nv), emb, "mlp")
        if not self.vid_only and self.mlp.t() is not None:
            nt = _rms(txt, eps).astype(vid.dtype)
            nt = self.ada.t().mod_in(nt, emb, "mlp")
            txt = txt + self.ada.t().mod_out(self.mlp.t()(nt), emb, "mlp")
        return vid, txt


class _PatchIn(nnx.Module):
    def __init__(self, cfg, *, dtype, rngs):
        pt, ph, pw = cfg.patch_size
        self.proj = Linear(cfg.vid_in_channels * pt * ph * pw, cfg.vid_dim,
                           use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)


class _PatchOut(nnx.Module):
    def __init__(self, cfg, *, dtype, rngs):
        pt, ph, pw = cfg.patch_size
        self.proj = Linear(cfg.vid_dim, cfg.vid_out_channels * pt * ph * pw,
                           use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)


class _TimeEmbedding(nnx.Module):
    """base_v2/embedding.py TimeEmbedding: 3 linears with SiLU between."""

    def __init__(self, hidden: int, out: int, *, dtype, rngs):
        kw = dict(use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.proj_in = Linear(256, hidden, **kw)
        self.proj_hid = Linear(hidden, hidden, **kw)
        self.proj_out = Linear(hidden, out, **kw)

    def __call__(self, t, dtype):
        # get_timestep_embedding(256, flip_sin_to_cos=False): [sin | cos]
        half = 128
        freqs = jnp.asarray(np.exp(
            -math.log(10000.0) * np.arange(half, dtype=np.float64) / half),
            jnp.float32)
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        sincos = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        x = self.proj_in(sincos.astype(dtype))
        x = self.proj_hid(nnx.silu(x))
        return self.proj_out(nnx.silu(x))


@transformer_registry.register(
    "seedvr.base",
    aliases=("seedvr", "seedvr2", "seedvr.base_v2", "SeedVR2Transformer3DModel"))
class SeedVR2Transformer3DModel(nnx.Module):
    config_class = SeedVRConfig

    def __init__(self, cfg: SeedVRConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        self.vid_in = _PatchIn(cfg, dtype=dtype, rngs=rngs)
        self.txt_in = (Linear(cfg.txt_in_dim, cfg.txt_dim, use_bias=True,
                              dtype=dtype, param_dtype=dtype, rngs=rngs)
                       if cfg.txt_in_dim != cfg.txt_dim else None)
        self.emb_in = _TimeEmbedding(max(cfg.vid_dim, cfg.txt_dim), cfg.emb_dim,
                                     dtype=dtype, rngs=rngs)
        self.blocks = nnx.List([
            SeedVRBlock(cfg, i, dtype=dtype, rngs=rngs)
            for i in range(cfg.num_layers)
        ])
        if cfg.vid_out_norm is not None:
            self.vid_out_norm = RMSNorm(cfg.vid_dim, eps=cfg.norm_eps)
            self.vid_out_ada = _AdaSingle(cfg.vid_dim, ("out",), modes=("in",),
                                          rngs=rngs)
        else:
            self.vid_out_norm = None
            self.vid_out_ada = None
        self.vid_out = _PatchOut(cfg, dtype=dtype, rngs=rngs)

    @staticmethod
    def sharding_rules(cfg: "SeedVRConfig"):
        """TP layout: fused qkv / MLP ups column-split, output projections
        row-split. _MM branches (all/vid/txt) shard identically; ada vectors,
        patch in/out, and time embedding replicate (default)."""
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"attn\.proj_qkv\.(all|vid|txt)\.kernel", P(None, "tp")),
                (r"attn\.proj_out\.(all|vid|txt)\.kernel", P("tp", None)),
                (r"mlp\.(all|vid|txt)\.(proj_in|proj_in_gate)\.kernel",
                 P(None, "tp")),
                (r"mlp\.(all|vid|txt)\.proj_out\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    # -- patching (reference patch_v1.py: inner order (t h w c), c LAST) ----

    def patchify(self, x):
        pt, ph, pw = self.cfg.patch_size
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        # b c T t H h W w -> b T H W (t h w c)
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
        return x.reshape(b, t // pt, h // ph, w // pw, pt * ph * pw * c)

    def unpatchify(self, grid, t, h, w):
        pt, ph, pw = self.cfg.patch_size
        c = self.cfg.vid_out_channels
        b = grid.shape[0]
        x = grid.reshape(b, t // pt, h // ph, w // pw, pt, ph, pw, c)
        # b T H W t h w c -> b c (T t) (H h) (W w)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, c, t, h, w)

    # -----------------------------------------------------------------------

    def _layer_tables(self, gt, gh, gw, lt):
        """Per-parity (regular, shifted) window index + rope tables, computed
        once per grid shape at trace time."""
        cfg = self.cfg
        out = []
        for shifted in (False, True):
            win_idx, valid, coord, inv = _build_windows(
                gt, gh, gw, cfg.window, shifted)
            rope_vid = rope_txt = None
            if cfg.qk_rope:
                cos, sin = _rope_tables_pixel(coord, cfg.head_dim)
                rope_vid = (jnp.asarray(cos), jnp.asarray(sin))
            elif cfg.rope_type == "mmrope3d":
                rd = cfg.rope_dim or cfg.head_dim
                cos, sin = _rope_tables_lang_vid(coord, rd, lt)
                rope_vid = (jnp.asarray(cos), jnp.asarray(sin))
                cos_t, sin_t = _rope_tables_lang_txt(lt, rd)
                rope_txt = (jnp.asarray(cos_t), jnp.asarray(sin_t))
            out.append(((jnp.asarray(win_idx), valid, jnp.asarray(inv)),
                        rope_vid, rope_txt))
        return out

    def __call__(self, x, t, context):
        """x (B, C_in, T, H, W) — latent + conditioning channels;
        t (B,) 0..1000; context (B, Lt, txt_in_dim)."""
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        grid = self.patchify(x.astype(self.dtype))
        vid = self.vid_in.proj(grid)
        gt, gh, gw = vid.shape[1:4]
        vid = vid.reshape(b, gt * gh * gw, cfg.vid_dim)
        txt = (self.txt_in(context.astype(self.dtype))
               if self.txt_in is not None else context.astype(self.dtype))
        emb = self.emb_in(t, self.dtype).astype(jnp.float32)

        tables = self._layer_tables(gt, gh, gw, txt.shape[1])
        for i, blk in enumerate(self.blocks):
            windows, rope_vid, rope_txt = tables[i % 2]
            vid, txt = blk(vid, txt, emb, windows, rope_vid, rope_txt)

        if self.vid_out_norm is not None:
            nv = self.vid_out_norm(vid.astype(jnp.float32)).astype(self.dtype)
            vid = self.vid_out_ada.mod_in(nv, emb, "out")
        out = self.vid_out.proj(vid)
        out = out.reshape(b, gt, gh, gw, -1)
        return self.unpatchify(out.astype(jnp.float32), tt, hh, ww)
