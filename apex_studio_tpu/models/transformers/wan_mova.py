"""MOVA (video + audio Wan towers with a conditional bridge) in JAX/NNX.

Counterparts of the reference's
- ``src/transformer/wan/mova/model.py`` (MOVAWanModel, model.py:605) — the
  video tower is the DiffSynth-layout Wan DiT: identical math to our
  WanTransformer3DModel, so it *is* that model here with a config/key
  translation (converter family ``wan_mova``).
- ``src/transformer/wan/mova_audio/model.py`` (MOVAWanAudioModel,
  model.py:175) — a 1-D Wan DiT over audio latents: Conv1d patch embed,
  time-only RoPE (``dac``: full head_dim; ``oobleck``: first third with a
  base/target-tps position rescale, remaining dims un-rotated,
  model.py:84-96), same DiTBlock stack and head.
- ``src/helpers/wan/mova.py`` (DualTowerConditionalBridge, mova.py:371) —
  bidirectional per-layer cross-attention between the towers' hidden
  states at a strategy-selected subset of layers, with optional
  llama-style cross-modal RoPE over audio-step-aligned positions and
  optional per-frame attention-pooled AdaLN on the v2a direction.

The reference threads the bridge through the towers with
``return_prepared`` + hand-rolled block loops (engine/wan/mova.py:225).
Here the engine jits ONE fused function that interleaves both block lists
and the bridge — XLA sees the whole joint step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import helper_registry, transformer_registry
from apex_studio_tpu.models.transformers.wan import (
    WanConfig,
    WanTransformer3DModel,
    WanTransformerBlock,
    layer_norm,
)
from apex_studio_tpu.models.layers import Linear
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.rope import apply_rope_half, rope_freqs_1d


# -- video tower -----------------------------------------------------------------------


@dataclasses.dataclass
class MovaWanVideoConfig(WanConfig):
    """DiffSynth-named config (mova/model.py:610) → WanConfig translation."""

    @classmethod
    def from_dict(cls, cfg: dict) -> "MovaWanVideoConfig":
        m = dict(cfg)
        if "num_heads" in m:
            m["num_attention_heads"] = m.pop("num_heads")
        if "dim" in m:
            heads = m.get("num_attention_heads", 40)
            m["attention_head_dim"] = m.pop("dim") // heads
        if "in_dim" in m:
            m["in_channels"] = m.pop("in_dim")
        if "out_dim" in m:
            m["out_channels"] = m.pop("out_dim")
        if m.pop("has_image_input", False):
            m.setdefault("image_dim", 1280)
        return super().from_dict(m)


@transformer_registry.register("wan.mova", aliases=("MOVAWanModel",))
class MovaWanModel(WanTransformer3DModel):
    """mova/model.py:605 — Wan DiT with DiffSynth config names."""

    config_class = MovaWanVideoConfig

    def unpatchify(self, tokens: jnp.ndarray, t: int, h: int,
                   w: int) -> jnp.ndarray:
        # DiffSynth head orders output features patch-major, channel LAST:
        # 'b (f h w) (x y z c) -> b c (f x) (h y) (w z)' (mova/model.py:862) —
        # unlike the diffusers Wan head (channel first) the base class mirrors.
        pt, ph, pw = self.cfg.patch_size
        c = self.cfg.out_channels
        b = tokens.shape[0]
        x = tokens.reshape(b, t // pt, h // ph, w // pw, pt, ph, pw, c)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, c, t, h, w)


# -- audio tower -----------------------------------------------------------------------


@dataclasses.dataclass
class MovaAudioConfig:
    dim: int = 1536
    in_dim: int = 128
    ffn_dim: int = 8960
    out_dim: int = 128
    text_dim: int = 4096
    freq_dim: int = 256
    eps: float = 1e-6
    patch_size: Tuple[int, ...] = (1,)
    num_heads: int = 12
    num_layers: int = 30
    vae_type: str = "dac"          # "dac" | "oobleck" rope variant
    audio_base_tps: float = 4.0
    audio_target_tps: float = 44100.0 / 2048.0

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @classmethod
    def from_dict(cls, d: dict) -> "MovaAudioConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        if "patch_size" in kw:
            p = kw["patch_size"]
            kw["patch_size"] = (p,) if isinstance(p, int) else tuple(p)
        return cls(**kw)

    def as_wan_config(self) -> WanConfig:
        return WanConfig(
            num_attention_heads=self.num_heads,
            attention_head_dim=self.head_dim,
            ffn_dim=self.ffn_dim,
            text_dim=self.text_dim,
            freq_dim=self.freq_dim,
            eps=self.eps,
            cross_attn_norm=True,
        )


@transformer_registry.register(
    "wan.mova_audio", aliases=("MOVAWanAudioModel", "mova_audio"))
class MovaWanAudioModel(nnx.Module):
    """mova_audio/model.py:175 — 1-D Wan DiT. [B, C, T] latents in/out."""

    config_class = MovaAudioConfig

    def __init__(self, cfg: MovaAudioConfig = None, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        cfg = cfg or MovaAudioConfig()
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        lkw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        p = cfg.patch_size[0]
        self.patch_embedding = Linear(cfg.in_dim * p, d, **lkw)
        self.time_embedder_linear_1 = Linear(cfg.freq_dim, d, **lkw)
        self.time_embedder_linear_2 = Linear(d, d, **lkw)
        self.time_proj = Linear(d, 6 * d, **lkw)
        self.text_embedder_linear_1 = Linear(cfg.text_dim, d, **lkw)
        self.text_embedder_linear_2 = Linear(d, d, **lkw)
        wcfg = cfg.as_wan_config()
        self.blocks = nnx.List([
            WanTransformerBlock(wcfg, dtype=dtype, param_dtype=param_dtype,
                                rngs=rngs)
            for _ in range(cfg.num_layers)])
        self.proj_out = Linear(d, cfg.out_dim * p, **lkw)
        self.scale_shift_table = nnx.Param(
            nnx.initializers.normal(1.0 / math.sqrt(d))(
                rngs.params(), (1, 2, d), jnp.float32))

    @staticmethod
    def sharding_rules(cfg: "MovaAudioConfig"):
        """The 1-D audio tower reuses WanTransformerBlock, so the wan TP
        layout applies verbatim; the conditional cross-attention adapters
        (q/k/v/o, per-frame pooling) replicate via the default."""
        from apex_studio_tpu.models.transformers.wan import WanTransformer3DModel

        return WanTransformer3DModel.sharding_rules(None)

    def rope_tables(self, n: int):
        """Time-only rope (mova_audio/model.py:84-96). Returns cos/sin
        [1, n, 1, head_dim//2] in the interleaved-pair convention."""
        cfg = self.cfg
        d = cfg.head_dim
        pos = np.arange(n, dtype=np.float64)
        if cfg.vae_type == "oobleck":
            # legacy: rope only on the first (d - 2·(d//3)) dims with the
            # base/target tps position rescale; the rest stay un-rotated
            d0 = d - 2 * (d // 3)
            s = cfg.audio_base_tps / cfg.audio_target_tps
            c0, s0 = rope_freqs_1d(pos * s, d0)
            ones = jnp.ones((n, (d - d0) // 2), jnp.float32)
            zeros = jnp.zeros((n, (d - d0) // 2), jnp.float32)
            cos = jnp.concatenate([c0, ones], -1)
            sin = jnp.concatenate([s0, zeros], -1)
        else:
            # "dac": full-dim 1-D rope (chunk-in-3 + concat == identity order)
            cos, sin = rope_freqs_1d(pos, d)
        return cos[None, :, None, :], sin[None, :, None, :]

    def _prepare_cond(self, x: jnp.ndarray, t: jnp.ndarray,
                      context: jnp.ndarray):
        cfg = self.cfg
        b, c, n = x.shape
        p = cfg.patch_size[0]
        t_freq = timestep_embedding(
            t.reshape(-1).astype(jnp.float32), cfg.freq_dim,
            flip_sin_to_cos=True)
        temb = self.time_embedder_linear_2(
            nnx.silu(self.time_embedder_linear_1(t_freq.astype(self.dtype))))
        temb6 = self.time_proj(nnx.silu(temb)).astype(
            jnp.float32).reshape(-1, 6, cfg.dim)
        ctx = self.text_embedder_linear_2(
            nnx.gelu(self.text_embedder_linear_1(context.astype(self.dtype)),
                     approximate=True))
        # Conv1d(patch, stride=patch) == fold patch into features + Linear;
        # feature order [C, p] matches torch w.reshape(O, I·P)
        n_tok = n // p
        tokens = x[:, :, :n_tok * p].reshape(b, c, n_tok, p)
        tokens = jnp.transpose(tokens, (0, 2, 1, 3)).reshape(b, n_tok, c * p)
        tokens = self.patch_embedding(tokens.astype(self.dtype))
        rope_cos, rope_sin = self.rope_tables(n_tok)
        return tokens, temb, temb6, ctx, rope_cos, rope_sin

    def _finalize(self, tokens: jnp.ndarray, temb: jnp.ndarray,
                  n: int) -> jnp.ndarray:
        cfg = self.cfg
        table = self.scale_shift_table.value + temb.astype(jnp.float32)[:, None, :]
        shift, scale = (table[:, 0:1].astype(tokens.dtype),
                        table[:, 1:2].astype(tokens.dtype))
        tokens = layer_norm(tokens, eps=cfg.eps) * (1 + scale) + shift
        out = self.proj_out(tokens)  # [B, n_tok, p·C]
        b, n_tok, _ = out.shape
        p = cfg.patch_size[0]
        out = out.reshape(b, n_tok * p, cfg.out_dim)
        return jnp.transpose(out, (0, 2, 1))

    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 context: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[-1]
        tokens, temb, temb6, ctx, rc, rs = self._prepare_cond(x, t, context)
        for blk in self.blocks:
            tokens = blk(tokens, ctx, temb6, rc, rs)
        return self._finalize(tokens, temb, n)


# -- dual-tower bridge -----------------------------------------------------------------


def interaction_layers(strategy: str, min_layers: int) -> List[int]:
    """mova.py:150 get_interaction_layers — strategy → layer index list."""
    if strategy == "shallow_focus":
        return list(range(0, min(10, min_layers // 3)))
    if strategy == "distributed":
        return list(range(0, min_layers, 3))
    if strategy == "progressive":
        shallow = list(range(0, min(8, min_layers)))
        return shallow + (list(range(8, min_layers, 3))
                          if min_layers > 8 else [])
    if strategy == "custom":
        return [i for i in (0, 2, 4, 6, 8, 12, 16, 20) if i < min_layers]
    if strategy == "full":
        return list(range(min_layers))
    raise ValueError(f"unknown interaction strategy {strategy}")


class RMSNormW(nnx.Module):
    def __init__(self, dim: int, eps: float = 1e-6):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.eps = eps

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x32 = x.astype(jnp.float32)
        n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + self.eps)
        return (n * self.weight.value).astype(x.dtype)


class PerFramePooling(nnx.Module):
    """mova.py:86 — single-probe MHA pooling over each frame's h·w tokens.
    Mirrors torch nn.MultiheadAttention params (in_proj / out_proj)."""

    def __init__(self, dim: int, num_heads: int, eps: float = 1e-6, *,
                 dtype, rngs: nnx.Rngs):
        init = nnx.initializers.normal(0.02)
        self.probe = nnx.Param(init(rngs.params(), (1, 1, dim), jnp.float32))
        self.in_proj_weight = nnx.Param(
            nnx.initializers.lecun_normal()(rngs.params(), (3 * dim, dim),
                                            jnp.float32))
        self.in_proj_bias = nnx.Param(jnp.zeros((3 * dim,), jnp.float32))
        self.out_proj = Linear(dim, dim, dtype=dtype, rngs=rngs)
        self.ln_weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.ln_bias = nnx.Param(jnp.zeros((dim,), jnp.float32))
        self.num_heads = num_heads
        self.eps = eps
        self.dim = dim

    def __call__(self, x: jnp.ndarray,
                 grid: Tuple[int, int, int]) -> jnp.ndarray:
        b, l, d = x.shape
        t, h, w = grid
        s = h * w
        hd = d // self.num_heads
        wq, wk, wv = jnp.split(self.in_proj_weight.value, 3, axis=0)
        bq, bk, bv = jnp.split(self.in_proj_bias.value, 3, axis=0)
        probe = self.probe.value.astype(x.dtype)
        q = (probe @ wq.T.astype(x.dtype) + bq.astype(x.dtype))  # [1,1,D]
        xg = x.reshape(b * t, s, d)
        k = xg @ wk.T.astype(x.dtype) + bk.astype(x.dtype)
        v = xg @ wv.T.astype(x.dtype) + bv.astype(x.dtype)
        q = jnp.broadcast_to(q, (b * t, 1, d)).reshape(b * t, 1,
                                                       self.num_heads, hd)
        k = k.reshape(b * t, s, self.num_heads, hd)
        v = v.reshape(b * t, s, self.num_heads, hd)
        o = jax.nn.dot_product_attention(q, k, v)
        o = self.out_proj(o.reshape(b * t, 1, d))[:, 0].reshape(b, t, d)
        return layer_norm(o, self.ln_weight.value, self.ln_bias.value,
                          self.eps)


class ConditionalCrossAttention(nnx.Module):
    """mova.py:221 — q/k/v/o with RMS-normed q,k and optional llama-style
    rotary over externally supplied cos/sin position tables."""

    def __init__(self, dim: int, kv_dim: int, num_heads: int,
                 eps: float = 1e-6, *, dtype, rngs: nnx.Rngs):
        lkw = dict(dtype=dtype, rngs=rngs)
        self.q = Linear(dim, dim, **lkw)
        self.k = Linear(kv_dim, dim, **lkw)
        self.v = Linear(kv_dim, dim, **lkw)
        self.o = Linear(dim, dim, **lkw)
        self.norm_q = RMSNormW(dim, eps)
        self.norm_k = RMSNormW(dim, eps)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads

    def __call__(self, x, y, x_freqs=None, y_freqs=None):
        b, lx, d = x.shape
        ly = y.shape[1]
        q = self.norm_q(self.q(x)).reshape(b, lx, self.num_heads, self.head_dim)
        k = self.norm_k(self.k(y)).reshape(b, ly, self.num_heads, self.head_dim)
        v = self.v(y).reshape(b, ly, self.num_heads, self.head_dim)
        if x_freqs is not None:
            cos, sin = x_freqs  # [L, head_dim] llama-duplicated tables
            q = apply_rope_half(q, cos[None, :, None, : self.head_dim // 2],
                                sin[None, :, None, : self.head_dim // 2])
        if y_freqs is not None:
            cos, sin = y_freqs
            k = apply_rope_half(k, cos[None, :, None, : self.head_dim // 2],
                                sin[None, :, None, : self.head_dim // 2])
        o = jax.nn.dot_product_attention(q, k, v)
        return self.o(o.reshape(b, lx, d))


class ConditionalCrossAttentionBlock(nnx.Module):
    """mova.py:331 — LayerNorm on the conditioning stream, optional
    per-frame-pooled AdaLN on the primary, then cross-attention."""

    def __init__(self, dim: int, kv_dim: int, num_heads: int,
                 eps: float = 1e-6, pooled_adaln: bool = False, *,
                 dtype, rngs: nnx.Rngs):
        self.y_norm_weight = nnx.Param(jnp.ones((kv_dim,), jnp.float32))
        self.y_norm_bias = nnx.Param(jnp.zeros((kv_dim,), jnp.float32))
        self.inner = ConditionalCrossAttention(dim, kv_dim, num_heads, eps,
                                               dtype=dtype, rngs=rngs)
        self.pooled_adaln = pooled_adaln
        if pooled_adaln:
            self.per_frame_pooling = PerFramePooling(kv_dim, num_heads, eps,
                                                     dtype=dtype, rngs=rngs)
            self.adaln_linear = Linear(kv_dim, dim * 2, dtype=dtype, rngs=rngs)
        self.eps = eps

    def __call__(self, x, y, x_freqs=None, y_freqs=None, video_grid=None):
        if self.pooled_adaln:
            pooled = self.per_frame_pooling(y, video_grid)  # [B, T, kv]
            if pooled.shape[1] != x.shape[1]:
                # linear interp along time to the audio sequence length
                # (mova.py:355 F.interpolate mode='linear')
                src = pooled.shape[1]
                dst = x.shape[1]
                # align_corners=False grid
                idx = (jnp.arange(dst, dtype=jnp.float32) + 0.5) * src / dst - 0.5
                idx = jnp.clip(idx, 0.0, src - 1.0)
                lo = jnp.floor(idx).astype(jnp.int32)
                hi = jnp.minimum(lo + 1, src - 1)
                frac = (idx - lo)[None, :, None]
                pooled = (pooled[:, lo] * (1 - frac.astype(pooled.dtype))
                          + pooled[:, hi] * frac.astype(pooled.dtype))
            temb = self.adaln_linear(nnx.silu(pooled))
            scale, shift = jnp.split(temb, 2, axis=2)
            x = layer_norm(x, eps=1e-5) * (1 + scale) + shift
        y = layer_norm(y, self.y_norm_weight.value, self.y_norm_bias.value,
                       self.eps)
        return self.inner(x, y, x_freqs=x_freqs, y_freqs=y_freqs)


@dataclasses.dataclass
class MovaBridgeConfig:
    visual_layers: int = 30
    audio_layers: int = 30
    visual_hidden_dim: int = 3072
    audio_hidden_dim: int = 1536
    audio_fps: float = 44100.0 / 2048.0
    head_dim: int = 128
    interaction_strategy: str = "shallow_focus"
    apply_cross_rope: bool = False
    apply_first_frame_bias_in_rope: bool = False
    trainable_condition_scale: bool = False
    pooled_adaln: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "MovaBridgeConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@helper_registry.register(
    "wan.mova", aliases=("DualTowerConditionalBridge", "dual_tower_bridge"))
class DualTowerBridge(nnx.Module):
    """mova.py:371 — per-layer bidirectional tower conditioning."""

    config_class = MovaBridgeConfig

    def __init__(self, cfg: MovaBridgeConfig = None, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        cfg = cfg or MovaBridgeConfig()
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        self.layers = interaction_layers(
            cfg.interaction_strategy,
            min(cfg.visual_layers, cfg.audio_layers))
        self.audio_to_video_conditioners = nnx.Dict({
            str(i): ConditionalCrossAttentionBlock(
                cfg.visual_hidden_dim, cfg.audio_hidden_dim,
                cfg.visual_hidden_dim // cfg.head_dim,
                pooled_adaln=False, dtype=dtype, rngs=rngs)
            for i in self.layers})
        self.video_to_audio_conditioners = nnx.Dict({
            str(i): ConditionalCrossAttentionBlock(
                cfg.audio_hidden_dim, cfg.visual_hidden_dim,
                cfg.audio_hidden_dim // cfg.head_dim,
                pooled_adaln=cfg.pooled_adaln, dtype=dtype, rngs=rngs)
            for i in self.layers})
        if cfg.trainable_condition_scale:
            self.condition_scale = nnx.Param(jnp.ones((1,), jnp.float32))
        else:
            self.condition_scale = None

    def build_aligned_freqs(self, video_fps: float,
                            grid: Tuple[int, int, int], audio_steps: int):
        """mova.py:435 — audio positions in audio steps; video positions
        mapped to audio-step units (hard-coded VAE temporal stride 4).
        Returns llama-style duplicated cos/sin [L, head_dim] tables."""
        cfg = self.cfg
        f_v, h, w = grid
        audio_pos = np.arange(audio_steps, dtype=np.float64)
        if cfg.apply_first_frame_bias_in_rope:
            eff = float(video_fps) / 4.0
            starts = np.zeros((f_v,), np.float64)
            if f_v > 1:
                starts[1:] = 1.0 / float(video_fps) + np.arange(
                    f_v - 1, dtype=np.float64) / eff
            video_frame_pos = starts * float(cfg.audio_fps)
        else:
            scale = float(cfg.audio_fps) / (float(video_fps) / 4.0)
            video_frame_pos = np.arange(f_v, dtype=np.float64) * scale
        video_pos = np.repeat(video_frame_pos, h * w)
        d = cfg.head_dim
        inv = 1.0 / (10000.0 ** (np.arange(0, d, 2, dtype=np.float64) / d))

        def tables(pos):
            ang = pos[:, None] * inv[None, :]
            cos = np.concatenate([np.cos(ang), np.cos(ang)], -1)
            sin = np.concatenate([np.sin(ang), np.sin(ang)], -1)
            return (jnp.asarray(cos, jnp.float32),
                    jnp.asarray(sin, jnp.float32))

        return tables(video_pos), tables(audio_pos)

    def _scale(self, override):
        if override is not None:
            return float(override)
        if self.condition_scale is not None:
            return self.condition_scale.value[0]
        return 1.0

    def __call__(self, layer_idx: int, visual_x, audio_x, *,
                 x_freqs=None, y_freqs=None, condition_scale=None,
                 a2v_condition_scale=None, v2a_condition_scale=None,
                 video_grid=None):
        """Bidirectional conditioning at ``layer_idx`` (static int)."""
        if layer_idx not in self.layers:
            return visual_x, audio_x
        key = str(layer_idx)
        a2v = self.audio_to_video_conditioners[key]
        v2a = self.video_to_audio_conditioners[key]
        sa = self._scale(a2v_condition_scale if a2v_condition_scale
                         is not None else condition_scale)
        sv = self._scale(v2a_condition_scale if v2a_condition_scale
                         is not None else condition_scale)
        vis = visual_x + a2v(visual_x, audio_x, x_freqs=x_freqs,
                             y_freqs=y_freqs,
                             video_grid=video_grid) * sa
        aud = audio_x + v2a(audio_x, visual_x, x_freqs=y_freqs,
                            y_freqs=x_freqs,
                            video_grid=video_grid) * sv
        return vis, aud
