"""SeedVR2 — windowed NaDiT video-restoration transformer in JAX/NNX.

Counterpart of the reference's ``src/transformer/seedvr/base_v2/model.py:45``
(SeedVR2Transformer3DModel) + ``nablocks/mmsr_block.py`` +
``nablocks/attention/mmattn.py:159`` (NaSwinAttention): an MMDiT where video
tokens attend inside 3-D swin windows — every window additionally attends to
the FULL text sequence, whose per-window outputs are averaged back into one
text stream — with AdaSingle in/out modulation and alternating
regular/shifted windows per layer.

TPU adaptation: the reference packs native-resolution varlen sequences for
flash-attn; here the grid is padded to window multiples and windows become a
batch axis (static shapes, one attention kernel call per layer). The config
``window`` counts windows per (t, h, w) axis; shifted layers roll the grid by
half a window before partitioning.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops.attention import attention
from apex_studio_tpu.ops.rope import precompute_axial_freqs


@dataclasses.dataclass
class SeedVRConfig:
    vid_in_channels: int = 33      # latent + cond latent (+ mask)
    vid_out_channels: int = 16
    vid_dim: int = 2048
    txt_in_dim: int = 4096
    txt_dim: int = 2048
    emb_dim: int = 2048
    heads: int = 16
    head_dim: int = 128
    expand_ratio: int = 4
    num_layers: int = 20
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    window: Tuple[int, int, int] = (4, 3, 3)   # windows per axis
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6

    @classmethod
    def from_dict(cls, cfg: dict) -> "SeedVRConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in cfg.items() if k in known}
        if isinstance(kw.get("txt_in_dim"), tuple):
            kw["txt_in_dim"] = kw["txt_in_dim"][0]
        return cls(**kw)


class _AdaSingle(nnx.Module):
    """Per-branch in(shift,scale)/out(gate) modulation (normalization.py
    AdaSingle role): emb → silu → linear(3·dim) per layer."""

    def __init__(self, dim: int, emb_dim: int, layers: Tuple[str, ...],
                 *, dtype, rngs):
        kw = dict(use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)
        mods = {}
        for name in layers:
            mods[name] = Linear(emb_dim, 3 * dim, **kw)
        self.mods = nnx.Dict(mods)

    def params(self, layer: str, emb):
        out = self.mods[layer](nnx.silu(emb))[:, None]
        return jnp.split(out, 3, axis=-1)  # shift, scale, gate


class _MMLinear(nnx.Module):
    """Separate vid/txt weights (MMModule with shared_weights=False)."""

    def __init__(self, din, dout, *, use_bias=True, dtype, rngs):
        kw = dict(use_bias=use_bias, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.vid = Linear(din, dout, **kw)
        self.txt = Linear(din, dout, **kw)


class SeedVRBlock(nnx.Module):
    def __init__(self, cfg: SeedVRConfig, shifted: bool, last: bool,
                 *, dtype, rngs):
        d = cfg.vid_dim
        inner = cfg.heads * cfg.head_dim
        self.qkv = _MMLinear(d, 3 * inner, use_bias=False, dtype=dtype, rngs=rngs)
        self.proj = _MMLinear(inner, d, dtype=dtype, rngs=rngs)
        self.norm_q_vid = RMSNorm(cfg.head_dim, eps=cfg.norm_eps)
        self.norm_k_vid = RMSNorm(cfg.head_dim, eps=cfg.norm_eps)
        self.norm_q_txt = RMSNorm(cfg.head_dim, eps=cfg.norm_eps)
        self.norm_k_txt = RMSNorm(cfg.head_dim, eps=cfg.norm_eps)
        hid = cfg.expand_ratio * d
        kw = dict(use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.mlp_in_vid = Linear(d, hid, **kw)
        self.mlp_out_vid = Linear(hid, d, **kw)
        if not last:
            self.mlp_in_txt = Linear(d, hid, **kw)
            self.mlp_out_txt = Linear(hid, d, **kw)
        else:
            self.mlp_in_txt = None
        self.ada_vid = _AdaSingle(d, cfg.emb_dim, ("attn", "mlp"),
                                  dtype=dtype, rngs=rngs)
        self.ada_txt = _AdaSingle(d, cfg.emb_dim, ("attn", "mlp"),
                                  dtype=dtype, rngs=rngs)
        self.shifted = shifted
        self.last = last
        self.cfg = cfg

    def _window_attn(self, vid, txt, grid, rope):
        """vid (B, T, H, W, 3·inner); txt (B, Lt, 3·inner) → outputs."""
        cfg = self.cfg
        b, t, h, w, _ = vid.shape
        nt, nh, nw = [max(1, min(n, g)) for n, g in zip(cfg.window, (t, h, w))]
        wt, wh, ww = math.ceil(t / nt), math.ceil(h / nh), math.ceil(w / nw)
        pad = (nt * wt - t, nh * wh - h, nw * ww - w)
        if self.shifted:
            vid = jnp.roll(vid, (-(wt // 2), -(wh // 2), -(ww // 2)),
                           axis=(1, 2, 3))
        if any(pad):
            vid = jnp.pad(vid, ((0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]),
                                (0, 0)), mode="wrap")
        vid = vid.reshape(b, nt, wt, nh, wh, nw, ww, -1)
        vid = vid.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        n_win = nt * nh * nw
        win = vid.reshape(b * n_win, wt * wh * ww, -1)

        hd, heads = cfg.head_dim, cfg.heads
        qv, kv, vv = jnp.split(
            win.reshape(*win.shape[:2], 3, heads, hd), 3, axis=2)
        qt, kt, vt = jnp.split(
            txt.reshape(*txt.shape[:2], 3, heads, hd), 3, axis=2)
        qv, kv, vv = qv[:, :, 0], kv[:, :, 0], vv[:, :, 0]
        qt, kt, vt = qt[:, :, 0], kt[:, :, 0], vt[:, :, 0]
        qv = self.norm_q_vid(qv).astype(win.dtype)
        kv = self.norm_k_vid(kv).astype(win.dtype)
        qt = self.norm_q_txt(qt).astype(win.dtype)
        kt = self.norm_k_txt(kt).astype(win.dtype)
        cos, sin = rope  # (1, wt·wh·ww, 1, rot) window-local positions
        from apex_studio_tpu.ops.rope import apply_rope

        qv = apply_rope(qv, cos, sin)
        kv = apply_rope(kv, cos, sin)

        rep = lambda x: jnp.repeat(x, n_win, axis=0)
        q = jnp.concatenate([qv, rep(qt)], axis=1)
        k = jnp.concatenate([kv, rep(kt)], axis=1)
        v = jnp.concatenate([vv, rep(vt)], axis=1)
        out = attention(q, k, v)
        n_vid = wt * wh * ww
        vid_out = out[:, :n_vid].reshape(b * n_win, n_vid, -1)
        txt_out = out[:, n_vid:].reshape(b, n_win, txt.shape[1], -1).mean(1)

        vid_out = vid_out.reshape(b, nt, nh, nw, wt, wh, ww, -1)
        vid_out = vid_out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        vid_out = vid_out.reshape(b, nt * wt, nh * wh, nw * ww, -1)
        vid_out = vid_out[:, :t, :h, :w]
        if self.shifted:
            vid_out = jnp.roll(vid_out, (wt // 2, wh // 2, ww // 2),
                               axis=(1, 2, 3))
        return vid_out, txt_out

    def __call__(self, vid, txt, emb, grid, rope):
        b, t, h, w, d = vid.shape
        sh_v, sc_v, g_v = self.ada_vid.params("attn", emb)
        sh_t, sc_t, g_t = self.ada_txt.params("attn", emb)
        nv = _ln(vid) * (1 + sc_v[:, :, None, None]) + sh_v[:, :, None, None]
        ntx = _ln(txt) * (1 + sc_t) + sh_t
        vq = self.qkv.vid(nv.astype(vid.dtype))
        tq = self.qkv.txt(ntx.astype(vid.dtype))
        av, at = self._window_attn(vq, tq, grid, rope)
        vid = vid + self.proj.vid(av.astype(vid.dtype)) * g_v[:, :, None, None]
        txt = txt + self.proj.txt(at.astype(vid.dtype)) * g_t

        sh_v, sc_v, g_v = self.ada_vid.params("mlp", emb)
        nv = _ln(vid) * (1 + sc_v[:, :, None, None]) + sh_v[:, :, None, None]
        ff = self.mlp_out_vid(nnx.gelu(self.mlp_in_vid(nv.astype(vid.dtype)),
                                       approximate=True))
        vid = vid + ff * g_v[:, :, None, None]
        if self.mlp_in_txt is not None:
            sh_t, sc_t, g_t = self.ada_txt.params("mlp", emb)
            ntx = _ln(txt) * (1 + sc_t) + sh_t
            ff = self.mlp_out_txt(nnx.gelu(self.mlp_in_txt(
                ntx.astype(vid.dtype)), approximate=True))
            txt = txt + ff * g_t
        return vid, txt


def _ln(x, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


@transformer_registry.register(
    "seedvr.base", aliases=("seedvr", "seedvr2", "SeedVR2Transformer3DModel"))
class SeedVR2Transformer3DModel(nnx.Module):
    config_class = SeedVRConfig

    def __init__(self, cfg: SeedVRConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch_dim = cfg.vid_in_channels * int(np.prod(cfg.patch_size))
        self.vid_in = Linear(patch_dim, cfg.vid_dim, **kw)
        self.txt_in = Linear(cfg.txt_in_dim, cfg.txt_dim, **kw)
        self.emb_in_1 = Linear(256, cfg.emb_dim, **kw)
        self.emb_in_2 = Linear(cfg.emb_dim, cfg.emb_dim, **kw)
        self.blocks = nnx.List([
            SeedVRBlock(cfg, shifted=(i % 2 == 1),
                        last=(i == cfg.num_layers - 1), dtype=dtype, rngs=rngs)
            for i in range(cfg.num_layers)
        ])
        self.vid_out = Linear(
            cfg.vid_dim, cfg.vid_out_channels * int(np.prod(cfg.patch_size)), **kw)

    def patchify(self, x):
        pt, ph, pw = self.cfg.patch_size
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        return x.reshape(b, t // pt, h // ph, w // pw, c * pt * ph * pw)

    def unpatchify(self, grid, t, h, w):
        pt, ph, pw = self.cfg.patch_size
        c = self.cfg.vid_out_channels
        b = grid.shape[0]
        x = grid.reshape(b, t // pt, h // ph, w // pw, c, pt, ph, pw)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return x.reshape(b, c, t, h, w)

    def _window_rope(self, t, h, w):
        cfg = self.cfg
        nt, nh, nw = [max(1, min(n, g)) for n, g in zip(cfg.window, (t, h, w))]
        wt, wh, ww = math.ceil(t / nt), math.ceil(h / nh), math.ceil(w / nw)
        ids = np.stack(np.meshgrid(np.arange(wt), np.arange(wh), np.arange(ww),
                                   indexing="ij"), axis=-1).reshape(1, -1, 3)
        hd = cfg.head_dim
        axes = (hd - 2 * (hd // 3) , hd // 3, hd // 3)
        cos, sin = precompute_axial_freqs(jnp.asarray(ids, jnp.float32),
                                          axes, cfg.rope_theta)
        return cos[:, :, None, :], sin[:, :, None, :]

    def __call__(self, x, t, context):
        """x (B, C_in, T, H, W) — latent + conditioning channels;
        t (B,) 0..1000; context (B, Lt, txt_in_dim)."""
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        grid = self.patchify(x.astype(self.dtype))
        vid = self.vid_in(grid)
        txt = self.txt_in(context.astype(self.dtype))
        half = 128
        freqs = jnp.asarray(np.exp(
            -math.log(10000.0) * np.arange(half, dtype=np.float64) / half),
            jnp.float32)
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        sincos = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        emb = self.emb_in_2(nnx.silu(self.emb_in_1(sincos.astype(self.dtype))))

        gt, gh, gw = vid.shape[1:4]
        rope = self._window_rope(gt, gh, gw)
        for blk in self.blocks:
            vid, txt = blk(vid, txt, emb, (gt, gh, gw), rope)
        out = self.vid_out(_ln(vid).astype(self.dtype))
        return self.unpatchify(out.astype(jnp.float32), tt, hh, ww)
