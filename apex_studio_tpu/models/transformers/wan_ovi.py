"""Ovi joint audio+video wan DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/wan/ovi/model.py:111`` (OviModel): two original-layout wan
backbones (video: 3D latents; audio: 1D token stream, grid (T,1,1)) fused per
layer — each block runs modulation+self-attention on its own stream, then a
cross-attention whose output combines text attention with FUSION attention on
the other modality (shared q/o projections; k_fusion/v_fusion over the
pre-norm of the target stream; RoPE applied to q with own positions and to
k_target with the target's positions — ``wan_base.py:908-990``).

i2v ("first_frame_is_clean", engine/wan/ovi.py:520): per-token timestep with
t=0 on the clean first video frame (modulation e is per-token, wan_base
asserts e.shape[1]==x.shape[1]).

Reuses the original-wan-layout primitives from the FlashVSR module (FVLinear/
FVRMSNorm/FVLayerNorm/FVHead, rope tables) — both families share the wan 2.x
checkpoint naming (blocks.N.self_attn.{q,k,v,o}, text_embedding.{0,2}, …).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.flashvsr import (
    FVHead,
    FVLayerNorm,
    FVLinear,
    FVRMSNorm,
    _apply_rope,
    _rope_tables_3d,
)
from apex_studio_tpu.ops.attention import attention


@dataclasses.dataclass
class OviStreamConfig:
    dim: int = 3072
    in_dim: int = 48
    ffn_dim: int = 14336
    out_dim: int = 48
    text_dim: int = 4096
    freq_dim: int = 256
    eps: float = 1e-6
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_heads: int = 24
    num_layers: int = 30
    temporal_rope_scaling_factor: float = 1.0  # audio tower: 0.19676

    @classmethod
    def from_dict(cls, cfg: dict) -> "OviStreamConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in (cfg or {}).items() if k in known}
        if "patch_size" in kw:
            ps = kw["patch_size"]
            if isinstance(ps, (list, tuple)):
                ps = tuple(ps)
                kw["patch_size"] = ps if len(ps) == 3 else (ps[0], 1, 1)
            else:
                kw["patch_size"] = (1, ps, ps)
        return cls(**kw)

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


@dataclasses.dataclass
class OviConfig:
    video: Optional[dict] = None
    audio: Optional[dict] = None

    @classmethod
    def from_dict(cls, cfg: dict) -> "OviConfig":
        return cls(video=cfg.get("video"), audio=cfg.get("audio"))


class OviBlock(nnx.Module):
    """One stream's block with fusion projections on the cross attention."""

    def __init__(self, cfg: OviStreamConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        d = cfg.dim
        self.self_q = FVLinear(d, d, **kw)
        self.self_k = FVLinear(d, d, **kw)
        self.self_v = FVLinear(d, d, **kw)
        self.self_o = FVLinear(d, d, **kw)
        self.self_norm_q = FVRMSNorm(d, cfg.eps, rngs=rngs)
        self.self_norm_k = FVRMSNorm(d, cfg.eps, rngs=rngs)
        self.cross_q = FVLinear(d, d, **kw)
        self.cross_k = FVLinear(d, d, **kw)
        self.cross_v = FVLinear(d, d, **kw)
        self.cross_o = FVLinear(d, d, **kw)
        self.cross_norm_q = FVRMSNorm(d, cfg.eps, rngs=rngs)
        self.cross_norm_k = FVRMSNorm(d, cfg.eps, rngs=rngs)
        self.k_fusion = FVLinear(d, d, **kw)
        self.v_fusion = FVLinear(d, d, **kw)
        self.pre_attn_norm_fusion = FVLayerNorm(d, cfg.eps, affine=True, rngs=rngs)
        self.norm_k_fusion = FVRMSNorm(d, cfg.eps, rngs=rngs)
        self.norm1 = FVLayerNorm(d, cfg.eps, affine=False, rngs=rngs)
        self.norm2 = FVLayerNorm(d, cfg.eps, affine=False, rngs=rngs)
        self.norm3 = FVLayerNorm(d, cfg.eps, affine=True, rngs=rngs)
        self.ffn_0 = FVLinear(d, cfg.ffn_dim, **kw)
        self.ffn_2 = FVLinear(cfg.ffn_dim, d, **kw)
        self.modulation = nnx.Param(
            jax.random.normal(rngs.params(), (1, 6, cfg.dim), jnp.float32)
            / cfg.dim ** 0.5)
        self.cfg = cfg

    def _mods(self, e):
        """e: [B,6,D] or per-token [B,S,6,D] → six [B,(S or 1),D] arrays."""
        mod = self.modulation.value
        if e.ndim == 4:
            m = mod[:, None] + e.astype(jnp.float32)
            return [m[:, :, i] for i in range(6)]
        m = mod + e.astype(jnp.float32)
        return [m[:, i][:, None] for i in range(6)]

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.cfg.num_heads, self.cfg.head_dim)

    def self_part(self, x, e, cos, sin):
        sh, sc, g, _, _, _ = self._mods(e)
        h = self.norm1(x) * (1 + sc.astype(x.dtype)) + sh.astype(x.dtype)
        q = _apply_rope(self._heads(self.self_norm_q(self.self_q(h))), cos, sin)
        k = _apply_rope(self._heads(self.self_norm_k(self.self_k(h))), cos, sin)
        v = self._heads(self.self_v(h))
        b, s, _, _ = q.shape
        out = attention(q, k, v).reshape(b, s, -1)
        return x + self.self_o(out) * g.astype(x.dtype)

    def fusion_part(self, x, e, context, target, cos, sin, t_cos, t_sin,
                    skip_cross: bool = False):
        _, _, _, sh2, sc2, g2 = self._mods(e)
        h = self.norm3(x)
        q = self._heads(self.cross_norm_q(self.cross_q(h)))
        b, s, _, _ = q.shape
        if skip_cross:  # SLG: skip this block's cross attention entirely
            out = jnp.zeros((b, s, self.cfg.dim), x.dtype)
        else:
            k = self._heads(self.cross_norm_k(self.cross_k(context)))
            v = self._heads(self.cross_v(context))
            out = attention(q, k, v).reshape(b, s, -1)
            tn = self.pre_attn_norm_fusion(target)
            k_t = _apply_rope(self._heads(self.norm_k_fusion(self.k_fusion(tn))),
                              t_cos, t_sin)
            v_t = self._heads(self.v_fusion(tn))
            q_r = _apply_rope(q, cos, sin)
            out = out + attention(q_r, k_t, v_t).reshape(b, s, -1)
            out = self.cross_o(out)
        x = x + out
        h = self.norm2(x) * (1 + sc2.astype(x.dtype)) + sh2.astype(x.dtype)
        h = self.ffn_2(jax.nn.gelu(self.ffn_0(h), approximate=True))
        return x + h * g2.astype(x.dtype)


class OviStream(nnx.Module):
    """One original-layout wan backbone (embedders + blocks + head)."""

    def __init__(self, cfg: OviStreamConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        p = int(np.prod(cfg.patch_size))
        self.cfg = cfg
        self.patch_embedding = FVLinear(cfg.in_dim * p, cfg.dim, **kw)
        self.text_embedding_0 = FVLinear(cfg.text_dim, cfg.dim, **kw)
        self.text_embedding_2 = FVLinear(cfg.dim, cfg.dim, **kw)
        self.time_embedding_0 = FVLinear(cfg.freq_dim, cfg.dim, **kw)
        self.time_embedding_2 = FVLinear(cfg.dim, cfg.dim, **kw)
        self.time_projection_1 = FVLinear(cfg.dim, cfg.dim * 6, **kw)
        self.blocks = nnx.List([OviBlock(cfg, **kw) for _ in range(cfg.num_layers)])
        self.head = FVHead(
            type("C", (), {"dim": cfg.dim, "eps": cfg.eps, "out_dim": cfg.out_dim,
                           "patch_size": cfg.patch_size})(), dtype=dtype, rngs=rngs)

    def time_mod(self, t: jnp.ndarray):
        """t [B] (0..1000) → (t_emb [B,D], e [B,6,D])."""
        d = self.cfg.freq_dim
        half = d // 2
        freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
        ang = t.astype(jnp.float32)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
        te = self.time_embedding_2(jax.nn.silu(self.time_embedding_0(emb)))
        e = self.time_projection_1(jax.nn.silu(te)).reshape(-1, 6, self.cfg.dim)
        return te, e

    def embed_text(self, ctx):
        return self.text_embedding_2(
            jax.nn.gelu(self.text_embedding_0(ctx), approximate=True))

    def patchify(self, x):
        pt, ph, pw = self.cfg.patch_size
        b, c, f, hh, ww = x.shape
        x = x.reshape(b, c, f // pt, pt, hh // ph, ph, ww // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b, (f // pt) * (hh // ph) * (ww // pw), c * pt * ph * pw)
        return self.patch_embedding(x), (f // pt, hh // ph, ww // pw)

    def unpatchify(self, tokens, grid):
        f, h, w = grid
        pt, ph, pw = self.cfg.patch_size
        c = self.cfg.out_dim
        b = tokens.shape[0]
        x = tokens.reshape(b, f, h, w, pt, ph, pw, c)
        return x.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(
            b, c, f * pt, h * ph, w * pw)


@transformer_registry.register("wan.ovi", aliases=("ovi", "OviModel"))
class OviModel(nnx.Module):
    config_class = OviConfig

    def __init__(self, cfg: Optional[OviConfig] = None, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        cfg = cfg or OviConfig()
        self.cfg = cfg
        self.video_model = OviStream(OviStreamConfig.from_dict(cfg.video or {}),
                                     dtype=dtype, rngs=rngs)
        acfg = OviStreamConfig.from_dict(cfg.audio or {})
        self.audio_model = OviStream(acfg, dtype=dtype, rngs=rngs)

    @staticmethod
    def sharding_rules(cfg: "OviConfig"):
        """TP layout for BOTH streams (video + audio towers shard alike):
        attention/fusion projections column-split, outputs row-split, GELU
        FFN up/down split; embedders, heads, and modulation replicate."""
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(self_q|self_k|self_v|cross_q|cross_k|cross_v"
                 r"|k_fusion|v_fusion)\.kernel", P(None, "tp")),
                (r"(self_o|cross_o)\.kernel", P("tp", None)),
                (r"ffn_0\.kernel", P(None, "tp")),
                (r"ffn_2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    def rope_for(self, stream: OviStream, grid):
        cos, sin = _rope_tables_3d(stream.cfg.head_dim, *grid, 0)
        s = stream.cfg.temporal_rope_scaling_factor
        if s != 1.0:
            # audio tower scales temporal positions (manifest
            # temporal_rope_scaling_factor 0.19676): rebuild with scaled t
            d = stream.cfg.head_dim
            f, h, w = grid
            d_t = d - 2 * (d // 3)
            t_pos = np.arange(f, dtype=np.float64) * s
            freqs = 1.0 / 10000.0 ** (np.arange(0, d_t, 2, np.float64)[: d_t // 2]
                                      / d_t)
            ang_t = np.outer(t_pos, freqs)
            n_t = ang_t.shape[1]
            ang_t_full = np.broadcast_to(
                ang_t[:, None, None, :], (f, h, w, n_t)).reshape(f * h * w, n_t)
            cos = np.concatenate([np.cos(ang_t_full), cos[:, n_t:]], axis=1)
            sin = np.concatenate([np.sin(ang_t_full), sin[:, n_t:]], axis=1)
        return jnp.asarray(cos.astype(np.float32)), jnp.asarray(sin.astype(np.float32))

    def __call__(self, vid, audio, t, vid_context, audio_context,
                 first_frame_is_clean: bool = False,
                 slg_layer: Optional[int] = None):
        """vid: [B,C,T,H,W]; audio: [B,L,in_dim_a] (1D stream, patch (1,1,1)
        with grid (L,1,1)); t: [B] (0..1000). Returns (v_pred, a_pred)."""
        vm, am = self.video_model, self.audio_model
        v_tok, v_grid = vm.patchify(vid)
        a_tok, a_grid = am.patchify(audio[:, :, :, None, None].transpose(0, 2, 1, 3, 4))
        v_cos, v_sin = self.rope_for(vm, v_grid)
        a_cos, a_sin = self.rope_for(am, a_grid)

        v_te, v_e = vm.time_mod(t)
        a_te, a_e = am.time_mod(t)
        if first_frame_is_clean:
            # per-token e with t=0 modulation on the clean first video frame
            _, v_e0 = vm.time_mod(jnp.zeros_like(t))
            per_frame = v_grid[1] * v_grid[2]
            n = v_tok.shape[1]
            tok_e = jnp.broadcast_to(v_e[:, None], (v_e.shape[0], n, 6, v_e.shape[-1]))
            e0 = jnp.broadcast_to(v_e0[:, None], (v_e.shape[0], per_frame, 6,
                                                  v_e.shape[-1]))
            v_e = jnp.concatenate([e0, tok_e[:, per_frame:]], axis=1)

        v_ctx = vm.embed_text(vid_context)
        a_ctx = am.embed_text(audio_context)

        for li, (vb, ab) in enumerate(zip(vm.blocks, am.blocks)):
            skip = slg_layer is not None and li == slg_layer
            a_tok = ab.self_part(a_tok, a_e, a_cos, a_sin)
            v_tok = vb.self_part(v_tok, v_e, v_cos, v_sin)
            og_audio = a_tok
            a_tok = ab.fusion_part(a_tok, a_e, a_ctx, v_tok, a_cos, a_sin,
                                   v_cos, v_sin, skip_cross=skip)
            v_tok = vb.fusion_part(v_tok, v_e, v_ctx, og_audio, v_cos, v_sin,
                                   a_cos, a_sin, skip_cross=skip)

        v_out = vm.head(v_tok, v_te)
        a_out = am.head(a_tok, a_te)
        v_pred = vm.unpatchify(v_out, v_grid)
        a_pred = am.unpatchify(a_out, a_grid)  # [B, C_a, L, 1, 1]
        return v_pred, a_pred[:, :, :, 0, 0].transpose(0, 2, 1)
