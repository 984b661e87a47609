"""LTX-2 audio-video DiT in JAX/NNX.

Counterpart of the reference's ``src/transformer/ltx2/base/model.py:1542``
(LTX2VideoTransformer3DModel): a dual-stream transformer generating video and
audio latents jointly. Each block runs, per modality: modulated self-attention
(full-dim qk RMSNorm + interleaved RoPE), text cross-attention on the raw
residual, then audio↔video cross-attention (a2v: video queries audio; v2a:
audio queries video) with temporal-only RoPE aligning the two timelines and
per-layer+global modulation (model.py:900), and a gated GELU FF.

TPU notes: both streams stay batch-first token sequences; every op is a
matmul/elementwise chain XLA fuses; RoPE tables are computed in-graph from
coordinate tensors so one compiled program serves any fps at fixed shapes.
The reference's chunking profiles (model.py:_CHUNKING_PROFILES) exist to fit
CUDA VRAM; here sharding + remat cover that axis, so they are not ported.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.ltx import apply_ltx_rope
from apex_studio_tpu.ops.attention import attention


@dataclass
class LTX2Config:
    in_channels: int = 128
    out_channels: int = 128
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    cross_attention_dim: int = 4096
    vae_scale_factors: Tuple[int, int, int] = (8, 32, 32)
    pos_embed_max_pos: int = 20
    base_height: int = 2048
    base_width: int = 2048
    audio_in_channels: int = 128
    audio_out_channels: int = 128
    audio_num_attention_heads: int = 32
    audio_attention_head_dim: int = 64
    audio_cross_attention_dim: int = 2048
    audio_scale_factor: int = 4
    audio_pos_embed_max_pos: int = 20
    audio_sampling_rate: int = 16000
    audio_hop_length: int = 160
    num_layers: int = 48
    caption_channels: int = 3840
    rope_theta: float = 10000.0
    causal_offset: int = 1
    timestep_scale_multiplier: float = 1000.0
    cross_attn_timestep_scale_multiplier: float = 1000.0
    norm_eps: float = 1e-6
    qk_norm_eps: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def audio_inner_dim(self) -> int:
        return self.audio_num_attention_heads * self.audio_attention_head_dim

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LTX2Config":
        import dataclasses

        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        for key in ("vae_scale_factors",):
            if key in kw and isinstance(kw[key], list):
                kw[key] = tuple(kw[key])
        return cls(**kw)


def ltx2_rope(coords: jnp.ndarray, dim: int, theta: float,
              max_pos: Tuple[float, ...]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """coords [B, A, S] (A axes, already in data space) → (cos, sin) [B,S,dim].

    Generalizes LTX-1's 3-axis rope (model.py:1419 steps 3-6): per-axis
    fraction of ``max_pos``, exp-spaced freqs theta**linspace(0,1)·π/2 at
    (2·frac−1), freq-major interleave across axes, repeat×2, pad remainder
    with cos=1/sin=0.
    """
    axes = coords.shape[1]
    n = dim // (axes * 2)
    if isinstance(coords, np.ndarray):
        # Host path in float64: the reference computes its tables with
        # rope_double_precision=True (model.py:1662) — at theta^1·π/2 ≈ 1.5e4
        # rad, f32 angle rounding shifts the high-freq entries by ~1.5e-3.
        xp, cast = np, (lambda a: jnp.asarray(a, jnp.float32))
        frac = np.stack(
            [coords[:, i].astype(np.float64) / max_pos[i] for i in range(axes)],
            axis=-1)
        # the reference computes theta**linspace in f64 then ROUNDS the freqs
        # to f32 before the (f64) angle product (model.py:1488
        # `.to(dtype=torch.float32)`) — replicate bit-for-bit
        indices = (theta ** np.linspace(0.0, 1.0, n, dtype=np.float64)
                   * (math.pi / 2)).astype(np.float32).astype(np.float64)
    else:
        xp, cast = jnp, (lambda a: a)
        frac = jnp.stack(
            [coords[:, i].astype(jnp.float32) / max_pos[i] for i in range(axes)],
            axis=-1)  # [B, S, A]
        indices = theta ** jnp.linspace(0.0, 1.0, n, dtype=jnp.float32) * (math.pi / 2)
    freqs = indices[None, None, None, :] * (frac[..., None] * 2.0 - 1.0)  # [B,S,A,n]
    freqs = xp.swapaxes(freqs, -1, -2).reshape(*freqs.shape[:2], axes * n)
    cos = cast(xp.repeat(xp.cos(freqs), 2, axis=-1))
    sin = cast(xp.repeat(xp.sin(freqs), 2, axis=-1))
    pad = dim - cos.shape[-1]
    if pad:
        cos = jnp.concatenate([jnp.ones_like(cos[..., :pad]), cos], axis=-1)
        sin = jnp.concatenate([jnp.zeros_like(sin[..., :pad]), sin], axis=-1)
    return cos, sin


class LTX2Attention(nnx.Module):
    """q from ``query_dim``, k/v from ``kv_dim``, inner = heads·head_dim,
    output back to ``query_dim``; full-inner-dim qk RMSNorm; separate q/k RoPE
    (model.py:626 LTX2Attention)."""

    def __init__(self, query_dim: int, kv_dim: int, heads: int, head_dim: int,
                 *, qk_eps: float, dtype, rngs: nnx.Rngs):
        inner = heads * head_dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.to_q = Linear(query_dim, inner, **kw)
        self.to_k = Linear(kv_dim, inner, **kw)
        self.to_v = Linear(kv_dim, inner, **kw)
        self.to_out = Linear(inner, query_dim, **kw)
        self.norm_q = RMSNorm(inner, eps=qk_eps)
        self.norm_k = RMSNorm(inner, eps=qk_eps)
        self.heads = heads
        self.head_dim = head_dim

    def __call__(self, x, context=None, q_rope=None, k_rope=None, mask_bias=None):
        b, s, _ = x.shape
        kv_in = x if context is None else context
        q = self.norm_q(self.to_q(x)).astype(x.dtype)
        k = self.norm_k(self.to_k(kv_in)).astype(x.dtype)
        v = self.to_v(kv_in)
        if q_rope is not None:
            q = apply_ltx_rope(q, *q_rope)
        if k_rope is not None:
            k = apply_ltx_rope(k, *k_rope)
        q = q.reshape(b, s, self.heads, self.head_dim)
        k = k.reshape(b, -1, self.heads, self.head_dim)
        v = v.reshape(b, -1, self.heads, self.head_dim)
        out = attention(q, k, v, bias=mask_bias)
        return self.to_out(out.reshape(b, s, self.heads * self.head_dim))


class AdaLNSingle(nnx.Module):
    """PixArt adaLN-single with configurable mod-param count (model.py:476)."""

    def __init__(self, dim: int, n_params: int, *, dtype, rngs: nnx.Rngs):
        kw = dict(use_bias=True, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.emb_1 = Linear(256, dim, **kw)
        self.emb_2 = Linear(dim, dim, **kw)
        self.linear = Linear(dim, n_params * dim, **kw)
        self.n_params = n_params
        self.dim = dim

    def __call__(self, t_flat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """t_flat [N] → (mod [N, n_params·dim], embedded [N, dim])."""
        half = 128
        freqs = jnp.exp(
            -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
        args = t_flat.astype(jnp.float32)[:, None] * freqs[None]
        sincos = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        embedded = self.emb_2(nnx.silu(self.emb_1(sincos.astype(self.emb_1.dtype))))
        return self.linear(nnx.silu(embedded)), embedded


class LTX2Block(nnx.Module):
    def __init__(self, cfg: LTX2Config, *, dtype, rngs: nnx.Rngs):
        d, ad = cfg.inner_dim, cfg.audio_inner_dim
        eps, qk = cfg.norm_eps, cfg.qk_norm_eps
        kw = dict(dtype=dtype, rngs=rngs, qk_eps=qk)
        self.norm1 = RMSNorm(d, eps=eps, elementwise_affine=False)
        self.attn1 = LTX2Attention(d, d, cfg.num_attention_heads,
                                   cfg.attention_head_dim, **kw)
        self.audio_norm1 = RMSNorm(ad, eps=eps, elementwise_affine=False)
        self.audio_attn1 = LTX2Attention(ad, ad, cfg.audio_num_attention_heads,
                                         cfg.audio_attention_head_dim, **kw)
        self.norm2 = RMSNorm(d, eps=eps, elementwise_affine=False)
        self.attn2 = LTX2Attention(d, cfg.cross_attention_dim,
                                   cfg.num_attention_heads,
                                   cfg.attention_head_dim, **kw)
        self.audio_norm2 = RMSNorm(ad, eps=eps, elementwise_affine=False)
        self.audio_attn2 = LTX2Attention(ad, cfg.audio_cross_attention_dim,
                                         cfg.audio_num_attention_heads,
                                         cfg.audio_attention_head_dim, **kw)
        # a2v: video queries audio / v2a: audio queries video — both use the
        # audio head geometry (model.py:855)
        self.audio_to_video_norm = RMSNorm(d, eps=eps, elementwise_affine=False)
        self.audio_to_video_attn = LTX2Attention(
            d, ad, cfg.audio_num_attention_heads, cfg.audio_attention_head_dim, **kw)
        self.video_to_audio_norm = RMSNorm(ad, eps=eps, elementwise_affine=False)
        self.video_to_audio_attn = LTX2Attention(
            ad, d, cfg.audio_num_attention_heads, cfg.audio_attention_head_dim, **kw)
        self.norm3 = RMSNorm(d, eps=eps, elementwise_affine=False)
        self.ff = GELUMLP(d, 4 * d, use_bias=True, approximate=True,
                          dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.audio_norm3 = RMSNorm(ad, eps=eps, elementwise_affine=False)
        self.audio_ff = GELUMLP(ad, 4 * ad, use_bias=True, approximate=True,
                                dtype=dtype, param_dtype=dtype, rngs=rngs)
        rng = np.random.default_rng(0)
        self.scale_shift_table = nnx.Param(
            jnp.asarray(rng.normal(size=(6, d)) / d**0.5, jnp.float32))
        self.audio_scale_shift_table = nnx.Param(
            jnp.asarray(rng.normal(size=(6, ad)) / ad**0.5, jnp.float32))
        self.video_a2v_cross_attn_scale_shift_table = nnx.Param(
            jnp.asarray(rng.normal(size=(5, d)), jnp.float32))
        self.audio_a2v_cross_attn_scale_shift_table = nnx.Param(
            jnp.asarray(rng.normal(size=(5, ad)), jnp.float32))

    @staticmethod
    def _mods(temb, table, n):
        # temb [B, Tt, n, dim] + table [n, dim] → n × [B, Tt, dim]
        ada = table[None, None] + temb
        return [ada[:, :, i] for i in range(n)]

    def __call__(self, x, xa, ctx, ctx_audio, temb, temb_audio,
                 ca_ss, ca_ss_audio, ca_gate, ca_gate_audio,
                 v_rope, a_rope, ca_v_rope, ca_a_rope,
                 ctx_bias=None, ctx_audio_bias=None,
                 skip_self_attn=False, skip_audio_self_attn=False,
                 skip_av_cross=False):
        dt = x.dtype
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = [
            m.astype(dt) for m in self._mods(temb, self.scale_shift_table.value, 6)]
        if not skip_self_attn:  # STG perturbed pass skips video self-attn
            h = self.norm1(x).astype(dt) * (1 + sc_msa) + s_msa
            x = x + g_msa * self.attn1(h, q_rope=v_rope, k_rope=v_rope)

        as_msa, asc_msa, ag_msa, as_mlp, asc_mlp, ag_mlp = [
            m.astype(dt) for m in self._mods(
                temb_audio, self.audio_scale_shift_table.value, 6)]
        if not skip_audio_self_attn:
            ha = self.audio_norm1(xa).astype(dt) * (1 + asc_msa) + as_msa
            xa = xa + ag_msa * self.audio_attn1(ha, q_rope=a_rope, k_rope=a_rope)

        # text cross-attention (pre-norm, ungated — model.py:1018)
        x = x + self.attn2(self.norm2(x).astype(dt), context=ctx,
                           mask_bias=ctx_bias)
        xa = xa + self.audio_attn2(self.audio_norm2(xa).astype(dt),
                                   context=ctx_audio, mask_bias=ctx_audio_bias)

        # audio↔video cross-attention with global×per-layer modulation
        vt = self.video_a2v_cross_attn_scale_shift_table.value
        at = self.audio_a2v_cross_attn_scale_shift_table.value
        v_a2v_sc, v_a2v_sh, v_v2a_sc, v_v2a_sh = [
            m.astype(dt) for m in self._mods(ca_ss, vt[:4], 4)]
        (a2v_gate,) = [m.astype(dt) for m in self._mods(ca_gate, vt[4:], 1)]
        a_a2v_sc, a_a2v_sh, a_v2a_sc, a_v2a_sh = [
            m.astype(dt) for m in self._mods(ca_ss_audio, at[:4], 4)]
        (v2a_gate,) = [m.astype(dt) for m in self._mods(ca_gate_audio, at[4:], 1)]

        if not skip_av_cross:  # isolated-modality guidance pass
            nv = self.audio_to_video_norm(x).astype(dt)
            na = self.video_to_audio_norm(xa).astype(dt)
            x = x + a2v_gate * self.audio_to_video_attn(
                nv * (1 + v_a2v_sc) + v_a2v_sh,
                context=na * (1 + a_a2v_sc) + a_a2v_sh,
                q_rope=ca_v_rope, k_rope=ca_a_rope)
            xa = xa + v2a_gate * self.video_to_audio_attn(
                na * (1 + a_v2a_sc) + a_v2a_sh,
                context=nv * (1 + v_v2a_sc) + v_v2a_sh,
                q_rope=ca_a_rope, k_rope=ca_v_rope)

        h = self.norm3(x).astype(dt) * (1 + sc_mlp) + s_mlp
        x = x + g_mlp * self.ff(h)
        ha = self.audio_norm3(xa).astype(dt) * (1 + asc_mlp) + as_mlp
        xa = xa + ag_mlp * self.audio_ff(ha)
        return x, xa


@transformer_registry.register(
    "ltx2.base", aliases=("ltx2", "LTX2VideoTransformer3DModel"))
class LTX2VideoTransformer3D(nnx.Module):
    config_class = LTX2Config

    def __init__(self, cfg: LTX2Config, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d, ad = cfg.inner_dim, cfg.audio_inner_dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj_in = Linear(cfg.in_channels, d, **kw)
        self.audio_proj_in = Linear(cfg.audio_in_channels, ad, **kw)
        # PixArtAlphaTextProjection: linear_1 + silu + linear_2
        self.caption_projection_1 = Linear(cfg.caption_channels, d, **kw)
        self.caption_projection_2 = Linear(d, d, **kw)
        self.audio_caption_projection_1 = Linear(cfg.caption_channels, ad, **kw)
        self.audio_caption_projection_2 = Linear(ad, ad, **kw)
        akw = dict(dtype=dtype, rngs=rngs)
        self.time_embed = AdaLNSingle(d, 6, **akw)
        self.audio_time_embed = AdaLNSingle(ad, 6, **akw)
        self.av_cross_attn_video_scale_shift = AdaLNSingle(d, 4, **akw)
        self.av_cross_attn_audio_scale_shift = AdaLNSingle(ad, 4, **akw)
        self.av_cross_attn_video_a2v_gate = AdaLNSingle(d, 1, **akw)
        self.av_cross_attn_audio_v2a_gate = AdaLNSingle(ad, 1, **akw)
        rng = np.random.default_rng(0)
        self.scale_shift_table = nnx.Param(
            jnp.asarray(rng.normal(size=(2, d)) / d**0.5, jnp.float32))
        self.audio_scale_shift_table = nnx.Param(
            jnp.asarray(rng.normal(size=(2, ad)) / ad**0.5, jnp.float32))
        self.blocks = nnx.List(
            [LTX2Block(cfg, dtype=dtype, rngs=rngs) for _ in range(cfg.num_layers)])
        self.proj_out = Linear(d, cfg.out_channels, **kw)
        self.audio_proj_out = Linear(ad, cfg.audio_out_channels, **kw)

    @staticmethod
    def sharding_rules(cfg: "LTX2Config"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules([
            (r".*(to_q|to_k|to_v|fc1)\.kernel", P(None, "tp")),
            (r".*(to_out|fc2)\.kernel", P("tp", None)),
        ])

    # -- coordinates (model.py:1256 prepare_video_coords / :1347 audio) ------------

    def video_coords(self, t_lat: int, h_lat: int, w_lat: int, fps: float,
                     batch: int = 1) -> jnp.ndarray:
        """→ [B, 3, S] patch-midpoint coords in (seconds, pixels, pixels)."""
        sf = self.cfg.vae_scale_factors
        gf = np.arange(t_lat, dtype=np.float64)
        gh = np.arange(h_lat, dtype=np.float64)
        gw = np.arange(w_lat, dtype=np.float64)
        grid = np.stack(np.meshgrid(gf, gh, gw, indexing="ij"))  # [3, T, H, W]
        mids = []
        for i, s in enumerate(sf):
            start = grid[i] * s
            end = (grid[i] + 1) * s
            if i == 0:
                start = np.clip(start + self.cfg.causal_offset - s, 0, None)
                end = np.clip(end + self.cfg.causal_offset - s, 0, None)
                start, end = start / fps, end / fps
            mids.append((start + end) / 2.0)
        coords = np.stack(mids).reshape(3, -1)
        # stay in numpy f64: ltx2_rope's host path matches the reference's
        # double-precision rope tables
        return np.broadcast_to(coords[None], (batch, *coords.shape))

    def audio_coords(self, t_lat: int, batch: int = 1) -> jnp.ndarray:
        """→ [B, 1, S] latent-frame midpoint timestamps in seconds."""
        cfg = self.cfg
        s = cfg.audio_scale_factor
        gf = np.arange(t_lat, dtype=np.float64)
        start = np.clip(gf * s + cfg.causal_offset - s, 0, None)
        end = np.clip((gf + 1) * s + cfg.causal_offset - s, 0, None)
        secs = ((start + end) / 2.0) * cfg.audio_hop_length / cfg.audio_sampling_rate
        return np.broadcast_to(secs[None, None], (batch, 1, len(gf)))

    def _temb(self, mod_layer: AdaLNSingle, t: jnp.ndarray, batch: int):
        mod, emb = mod_layer(t.reshape(-1) * self.cfg.timestep_scale_multiplier)
        mod = mod.reshape(batch, -1, mod_layer.n_params, mod_layer.dim)
        emb = emb.reshape(batch, -1, mod_layer.dim)
        return mod, emb

    def __call__(
        self,
        x: jnp.ndarray,                # [B, S, in_channels] video tokens
        xa: jnp.ndarray,               # [B, Sa, audio_in_channels]
        t: jnp.ndarray,                # [B] or [B, S] in [0, 1]
        ctx: jnp.ndarray,              # [B, L, caption_channels]
        video_shape: Tuple[int, int, int],  # latent (T, H, W)
        fps: float = 25.0,
        t_audio: Optional[jnp.ndarray] = None,
        ctx_audio: Optional[jnp.ndarray] = None,  # per-stream text (connectors)
        ctx_mask: Optional[jnp.ndarray] = None,
        video_coords: Optional[jnp.ndarray] = None,  # [B,3,S] override
        skip_video_self_attn_blocks: Optional[Tuple[int, ...]] = None,
        skip_audio_self_attn_blocks: Optional[Tuple[int, ...]] = None,
        skip_av_cross_attn: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        b = x.shape[0]
        if t_audio is None:
            # per-token video timesteps don't map onto the audio stream; the
            # audio inherits the (scalar) denoise level of the generated part
            t_audio = t if t.ndim == 1 else t[:, 0]

        # Keyframe-append conditioning passes explicit per-token coords
        # (reference keyframe_engine.py:218 time-shifts appended tokens).
        vc = (video_coords if video_coords is not None
              else self.video_coords(*video_shape, fps=fps, batch=b))
        ac = self.audio_coords(xa.shape[1], batch=b)
        d, ad = cfg.inner_dim, cfg.audio_inner_dim
        v_rope = ltx2_rope(vc, d, cfg.rope_theta,
                           (cfg.pos_embed_max_pos, cfg.base_height, cfg.base_width))
        a_rope = ltx2_rope(ac, ad, cfg.rope_theta, (cfg.audio_pos_embed_max_pos,))
        ca_max = (max(cfg.pos_embed_max_pos, cfg.audio_pos_embed_max_pos),)
        ca_v_rope = ltx2_rope(vc[:, :1], cfg.audio_cross_attention_dim,
                              cfg.rope_theta, ca_max)
        ca_a_rope = ltx2_rope(ac, cfg.audio_cross_attention_dim,
                              cfg.rope_theta, ca_max)

        x = self.proj_in(x.astype(self.dtype))
        xa = self.audio_proj_in(xa.astype(self.dtype))
        ctx = ctx.astype(self.dtype)
        # With the ltx2.connectors helper, each stream gets its own connector
        # output (reference model.py:2070 _project_prompt_embeddings); without
        # it both caption projections read the same packed hidden states.
        ctx_a_src = ctx if ctx_audio is None else ctx_audio.astype(self.dtype)
        # PixArtAlphaTextProjection's default activation is gelu-tanh
        # (reference model.py:1683 leaves act_fn unset)
        ctx_v = self.caption_projection_2(
            nnx.gelu(self.caption_projection_1(ctx), approximate=True))
        ctx_a = self.audio_caption_projection_2(
            nnx.gelu(self.audio_caption_projection_1(ctx_a_src), approximate=True))
        ctx_bias = None
        if ctx_mask is not None:
            neg = jnp.asarray(-1e30, jnp.float32)
            ctx_bias = jnp.where(ctx_mask[:, None, None, :].astype(bool), 0.0, neg)

        temb, emb_t = self._temb(self.time_embed, t, b)
        temb_a, emb_ta = self._temb(self.audio_time_embed, t_audio, b)
        gs = cfg.cross_attn_timestep_scale_multiplier / cfg.timestep_scale_multiplier
        ca_ss, _ = self._temb(self.av_cross_attn_video_scale_shift, t, b)
        ca_ss_a, _ = self._temb(self.av_cross_attn_audio_scale_shift, t_audio, b)
        ca_g, _ = self._temb(self.av_cross_attn_video_a2v_gate, t * gs, b)
        ca_g_a, _ = self._temb(self.av_cross_attn_audio_v2a_gate, t_audio * gs, b)

        skip_v = set(skip_video_self_attn_blocks or ())
        skip_a = set(skip_audio_self_attn_blocks or ())
        for bi, blk in enumerate(self.blocks):
            x, xa = blk(x, xa, ctx_v, ctx_a, temb, temb_a, ca_ss, ca_ss_a,
                        ca_g, ca_g_a, v_rope, a_rope, ca_v_rope, ca_a_rope,
                        ctx_bias=ctx_bias, ctx_audio_bias=ctx_bias,
                        skip_self_attn=bi in skip_v,
                        skip_audio_self_attn=bi in skip_a,
                        skip_av_cross=skip_av_cross_attn)

        sst = self.scale_shift_table.value
        shift = (emb_t + sst[None, 0]).astype(x.dtype)
        scale = (emb_t + sst[None, 1]).astype(x.dtype)
        x = _ln_no_affine(x) * (1 + scale) + shift
        out_v = self.proj_out(x)
        asst = self.audio_scale_shift_table.value
        a_shift = (emb_ta + asst[None, 0]).astype(xa.dtype)
        a_scale = (emb_ta + asst[None, 1]).astype(xa.dtype)
        xa = _ln_no_affine(xa) * (1 + a_scale) + a_shift
        out_a = self.audio_proj_out(xa)
        return out_v.astype(jnp.float32), out_a.astype(jnp.float32)


def _ln_no_affine(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mu) / jnp.sqrt(var + eps)).astype(x.dtype)
