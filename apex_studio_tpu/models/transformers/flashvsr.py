"""FlashVSR streaming video-SR DiT (wan 2.1 1.3B architecture) in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/wan/flashvsr/model.py:932`` (FlashVSRModel) and
``utils.py:196`` (Causal_LQ4x_Proj): a one-step (DMD-distilled) wan-style DiT
that denoises video latents in causal chunks — first 6 latent frames, then 2
per step — with a rolling self-attention KV cache of the last ``kv_len``
chunks and cross-attention KV computed once from a fixed prompt embedding.
Low-quality pixels enter through a causal conv stack (LQ_proj_in) whose
per-block linear outputs are ADDED to the token stream before block 0
(``model.py:1240`` — the published checkpoints use ``lq4x_proj_layer_num=1``).

TPU-native design decisions (vs the reference):
- The reference sparsifies self-attention with a top-k "draft" block mask over
  (2,8,8) windows plus a local sliding mask (``generate_draft_block_mask``,
  ``model.py:193``) — a GPU bandwidth optimization for block-sparse kernels.
  Here attention over [cached KV ‖ current chunk] is computed DENSE on the
  MXU: the KV length is already bounded by the rolling cache (≤ 6+f latent
  frames), so the dense score matrix is small, and dense attention is the
  exact (un-sparsified) version of what the top-k mask approximates.
- Chunk steps are jitted with donated caches; after the first (6-frame)
  chunk, every step has identical shapes → exactly two compilations.
- RoPE tables are computed host-side per chunk (the temporal offset
  ``f_start = 0 | 4+2·idx``, model.py:1222) and passed in as arrays so the
  step function never recompiles across chunks.
- The reference's chunked-norm/FFN "chunking profiles" (memory workarounds)
  are unnecessary under XLA fusion and are not reproduced.

Checkpoint layout is the original wan format
(``blocks.{i}.self_attn.{q,k,v,o,norm_q,norm_k}``, ``text_embedding.{0,2}``…)
plus the separate ``LQ_proj_in.ckpt`` merged via extra_model_path; key mapping
lives in the ``wan_flashvsr`` converter.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.registry import transformer_registry


@dataclasses.dataclass
class FlashVSRConfig:
    dim: int = 1536
    in_dim: int = 16
    ffn_dim: int = 8960
    out_dim: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    eps: float = 1e-6
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_heads: int = 12
    num_layers: int = 30
    lq4x_proj_in_dim: int = 3
    lq4x_proj_out_dim: int = 1536
    lq4x_proj_layer_num: int = 1
    lq_hidden_dim1: int = 2048
    lq_hidden_dim2: int = 3072
    kv_len: int = 3  # rolling cache: chunks of 2 latent frames kept as KV

    @classmethod
    def from_dict(cls, cfg: dict) -> "FlashVSRConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "patch_size" in kw:
            kw["patch_size"] = tuple(kw["patch_size"])
        return cls(**kw)

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


class FVLinear(nnx.Module):
    def __init__(self, cin, cout, bias=True, *, dtype, rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32)) if bias else None
        self.dtype = dtype

    def __call__(self, x):
        y = x.astype(self.dtype) @ self.kernel.value.astype(self.dtype)
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y


class FVRMSNorm(nnx.Module):
    """RMSNorm with affine weight (InplaceRMSNorm, f32 statistics)."""

    def __init__(self, dim, eps, *, rngs):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.eps = eps

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + self.eps)
        return (x32 * self.weight.value).astype(x.dtype)


class FVLayerNorm(nnx.Module):
    def __init__(self, dim, eps, affine, *, rngs):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32)) if affine else None
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32)) if affine else None
        self.eps = eps

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.eps)
        if self.weight is not None:
            y = y * self.weight.value + self.bias.value
        return y.astype(x.dtype)


def _rope_tables_3d(head_dim: int, f: int, h: int, w: int, f_start: int,
                    theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """Wan 3D rope: head_dim split 2:1:1 over (t, h, w) half-dims
    (precompute_freqs_cis_3d, model.py:422). Returns cos/sin [S, head_dim/2]."""
    d = head_dim
    d_t = d - 2 * (d // 3)
    d_sp = d // 3
    def freqs(dim):
        # reference clamp: arange(0, dim, 2)[: dim // 2] (model.py:430)
        return 1.0 / theta ** (np.arange(0, dim, 2, np.float64)[: dim // 2] / dim)
    t_pos = np.arange(f_start, f_start + f, dtype=np.float64)
    h_pos = np.arange(h, dtype=np.float64)
    w_pos = np.arange(w, dtype=np.float64)
    ang_t = np.outer(t_pos, freqs(d_t))            # [f, d_t/2]
    ang_h = np.outer(h_pos, freqs(d_sp))           # [h, d_sp/2]
    ang_w = np.outer(w_pos, freqs(d_sp))           # [w, d_sp/2]
    ang = np.concatenate(
        [
            np.broadcast_to(ang_t[:, None, None, :], (f, h, w, ang_t.shape[1])),
            np.broadcast_to(ang_h[None, :, None, :], (f, h, w, ang_h.shape[1])),
            np.broadcast_to(ang_w[None, None, :, :], (f, h, w, ang_w.shape[1])),
        ],
        axis=-1,
    ).reshape(f * h * w, d // 2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, H, Dh]; complex rope over adjacent pairs (rope_apply,
    model.py:436: view_as_complex over [..., Dh/2, 2])."""
    b, s, h, dh = x.shape
    xr = x.astype(jnp.float32).reshape(b, s, h, dh // 2, 2)
    re, im = xr[..., 0], xr[..., 1]
    c = cos[None, :, None, :]
    sn = sin[None, :, None, :]
    out_re = re * c - im * sn
    out_im = re * sn + im * c
    return jnp.stack([out_re, out_im], -1).reshape(b, s, h, dh).astype(x.dtype)


class FVSelfAttention(nnx.Module):
    def __init__(self, cfg: FlashVSRConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        d = cfg.dim
        self.q = FVLinear(d, d, **kw)
        self.k = FVLinear(d, d, **kw)
        self.v = FVLinear(d, d, **kw)
        self.o = FVLinear(d, d, **kw)
        self.norm_q = FVRMSNorm(d, cfg.eps, rngs=rngs)
        self.norm_k = FVRMSNorm(d, cfg.eps, rngs=rngs)
        self.cfg = cfg

    def __call__(self, x, rope_cos, rope_sin, cache_k=None, cache_v=None):
        """x: [B, L, D]; cache_{k,v}: [B, L_c, D] already rope'd/normed.
        Returns (out, new_cache_k, new_cache_v) where the new cache is the
        full [cache ‖ current] KV (caller trims to kv_len chunks)."""
        cfg = self.cfg
        b, l, d = x.shape
        q = self.norm_q(self.q(x)).reshape(b, l, cfg.num_heads, cfg.head_dim)
        k = self.norm_k(self.k(x)).reshape(b, l, cfg.num_heads, cfg.head_dim)
        v = self.v(x)
        q = _apply_rope(q, rope_cos, rope_sin).reshape(b, l, d)
        k = _apply_rope(k, rope_cos, rope_sin).reshape(b, l, d)
        if cache_k is not None:
            k_all = jnp.concatenate([cache_k, k], axis=1)
            v_all = jnp.concatenate([cache_v, v], axis=1)
        else:
            k_all, v_all = k, v
        from apex_studio_tpu.ops.attention import attention

        qh = q.reshape(b, l, cfg.num_heads, cfg.head_dim)
        kh = k_all.reshape(b, -1, cfg.num_heads, cfg.head_dim)
        vh = v_all.reshape(b, -1, cfg.num_heads, cfg.head_dim)
        out = attention(qh, kh, vh).reshape(b, l, d)
        return self.o(out), k_all, v_all


class FVCrossAttention(nnx.Module):
    def __init__(self, cfg: FlashVSRConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        d = cfg.dim
        self.q = FVLinear(d, d, **kw)
        self.k = FVLinear(d, d, **kw)
        self.v = FVLinear(d, d, **kw)
        self.o = FVLinear(d, d, **kw)
        self.norm_q = FVRMSNorm(d, cfg.eps, rngs=rngs)
        self.norm_k = FVRMSNorm(d, cfg.eps, rngs=rngs)
        self.cfg = cfg

    def kv_from_context(self, ctx):
        """init_cache (model.py:672): persistent text KV."""
        return self.norm_k(self.k(ctx)), self.v(ctx)

    def __call__(self, x, ctx_k, ctx_v):
        cfg = self.cfg
        b, l, d = x.shape
        from apex_studio_tpu.ops.attention import attention

        q = self.norm_q(self.q(x)).reshape(b, l, cfg.num_heads, cfg.head_dim)
        k = ctx_k.reshape(b, -1, cfg.num_heads, cfg.head_dim)
        v = ctx_v.reshape(b, -1, cfg.num_heads, cfg.head_dim)
        out = attention(q, k, v).reshape(b, l, d)
        return self.o(out)


class FVBlock(nnx.Module):
    def __init__(self, cfg: FlashVSRConfig, *, dtype, rngs):
        kw = dict(dtype=dtype, rngs=rngs)
        self.self_attn = FVSelfAttention(cfg, **kw)
        self.cross_attn = FVCrossAttention(cfg, **kw)
        self.norm1 = FVLayerNorm(cfg.dim, cfg.eps, affine=False, rngs=rngs)
        self.norm2 = FVLayerNorm(cfg.dim, cfg.eps, affine=False, rngs=rngs)
        self.norm3 = FVLayerNorm(cfg.dim, cfg.eps, affine=True, rngs=rngs)
        self.ffn_0 = FVLinear(cfg.dim, cfg.ffn_dim, **kw)
        self.ffn_2 = FVLinear(cfg.ffn_dim, cfg.dim, **kw)
        self.modulation = nnx.Param(
            jax.random.normal(rngs.params(), (1, 6, cfg.dim), jnp.float32)
            / cfg.dim ** 0.5)

    def __call__(self, x, t_mod, rope_cos, rope_sin, ctx_k, ctx_v,
                 cache_k=None, cache_v=None):
        mod = (self.modulation.value + t_mod.astype(jnp.float32))  # [B,6,D]
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [
            mod[:, i][:, None].astype(x.dtype) for i in range(6)]
        h = self.norm1(x) * (1 + sc_msa) + sh_msa
        attn, new_k, new_v = self.self_attn(h, rope_cos, rope_sin, cache_k, cache_v)
        x = x + attn * g_msa
        x = x + self.cross_attn(self.norm3(x), ctx_k, ctx_v)
        h = self.norm2(x) * (1 + sc_mlp) + sh_mlp
        h = self.ffn_2(jax.nn.gelu(self.ffn_0(h), approximate=True))
        x = x + h * g_mlp
        return x, new_k, new_v


class FVHead(nnx.Module):
    def __init__(self, cfg: FlashVSRConfig, *, dtype, rngs):
        self.norm = FVLayerNorm(cfg.dim, cfg.eps, affine=False, rngs=rngs)
        self.head = FVLinear(cfg.dim, cfg.out_dim * int(np.prod(cfg.patch_size)),
                             dtype=dtype, rngs=rngs)
        self.modulation = nnx.Param(
            jax.random.normal(rngs.params(), (1, 2, cfg.dim), jnp.float32)
            / cfg.dim ** 0.5)

    def __call__(self, x, t):
        mod = self.modulation.value + t.astype(jnp.float32)[:, None]  # [B,2,D]
        shift, scale = mod[:, 0][:, None], mod[:, 1][:, None]
        return self.head((self.norm(x) * (1 + scale) + shift).astype(x.dtype))


class FVCausalConv3d(nnx.Module):
    """CausalConv3d with REPLICATE padding on every padded edge — the
    reference's ``F.pad(x, (..., 2*pad_t, 0), mode="replicate")`` replicates
    spatially as well as at the temporal head (flashvsr utils.py:50-60).
    ``pad_head`` False = valid temporal conv (the stream-cache semantics of
    conv2, whose first window starts at the first real frame)."""

    def __init__(self, cin, cout, kernel, stride, pad_head=True, *, dtype, rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(init(rngs.params(), (*kernel, cin, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))
        self.stride = stride
        self.pad_head = pad_head
        self.k_t = kernel[0]
        self.dtype = dtype

    def __call__(self, x):  # x: [B,T,H,W,C]
        t_pad = (2, 0) if self.pad_head else (0, 0)
        x = jnp.pad(x, ((0, 0), t_pad, (1, 1), (1, 1), (0, 0)), mode="edge")
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), self.kernel.value.astype(self.dtype),
            window_strides=self.stride,
            padding=((0, 0), (0, 0), (0, 0)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + self.bias.value.astype(y.dtype)


class FVChannelRMS(nnx.Module):
    """RMS_norm(channel_first, images=False): gamma [C,1,1,1], normalize over
    C with dim**0.5 scale (utils.py:12)."""

    def __init__(self, dim, *, rngs):
        self.gamma = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.scale = float(dim) ** 0.5

    def __call__(self, x):  # [..., C]
        x32 = x.astype(jnp.float32)
        n = jnp.linalg.norm(x32, axis=-1, keepdims=True)
        return (x32 / jnp.maximum(n, 1e-12) * self.scale * self.gamma.value
                ).astype(x.dtype)


class FVLQProj(nnx.Module):
    """Causal_LQ4x_Proj (utils.py:196) computed full-sequence: the reference's
    chunked stream with conv caches is exactly (a) conv1 = causal strided conv
    with 2-frame replicate head pad, (b) conv2 = VALID strided conv (its
    stream starts caching from the first group's output, skipping the partial
    first window — utils.py:254-256)."""

    def __init__(self, cfg: FlashVSRConfig, *, dtype, rngs):
        c_in = cfg.lq4x_proj_in_dim * 16 * 16  # PixelShuffle3d(1,16,16)
        kw = dict(dtype=dtype, rngs=rngs)
        self.conv1 = FVCausalConv3d(c_in, cfg.lq_hidden_dim1, (4, 3, 3),
                                    (2, 1, 1), pad_head=True, **kw)
        self.norm1 = FVChannelRMS(cfg.lq_hidden_dim1, rngs=rngs)
        self.conv2 = FVCausalConv3d(cfg.lq_hidden_dim1, cfg.lq_hidden_dim2,
                                    (4, 3, 3), (2, 1, 1), pad_head=False, **kw)
        self.norm2 = FVChannelRMS(cfg.lq_hidden_dim2, rngs=rngs)
        self.linear_layers = nnx.List([
            FVLinear(cfg.lq_hidden_dim2, cfg.lq4x_proj_out_dim, **kw)
            for _ in range(cfg.lq4x_proj_layer_num)
        ])

    def __call__(self, video: jnp.ndarray) -> List[jnp.ndarray]:
        """video: [B,3,F,H,W] in [-1,1], F a multiple of 4 after the
        reference's head pad of 3 first-frame copies (applied here).
        Returns per-layer token features [B, (F/4)·(H/16)·(W/16), out_dim]
        aligned 1:1 with latent frames."""
        x = jnp.transpose(video.astype(jnp.float32), (0, 2, 3, 4, 1))
        head = jnp.repeat(x[:, :1], 3, axis=1)
        x = jnp.concatenate([head, x], axis=1)  # T = F+3, multiple of 4
        b, t, h, w, c = x.shape
        # PixelShuffle3d(1,16,16): space-to-channel, torch order (c, ph, pw).
        x = x.reshape(b, t, h // 16, 16, w // 16, 16, c)
        x = x.transpose(0, 1, 2, 4, 6, 3, 5).reshape(b, t, h // 16, w // 16,
                                                     c * 256)
        y = jax.nn.silu(self.norm1(self.conv1(x)))
        z = jax.nn.silu(self.norm2(self.conv2(y)))
        bb, tz, hz, wz, cz = z.shape
        tokens = z.reshape(bb, tz * hz * wz, cz)
        return [lin(tokens) for lin in self.linear_layers]


@transformer_registry.register(
    "wan.flashvsr", aliases=("flashvsr", "FlashVSRModel"))
class FlashVSRTransformer3DModel(nnx.Module):
    config_class = FlashVSRConfig

    def __init__(self, cfg: Optional[FlashVSRConfig] = None, *,
                 dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, rngs: nnx.Rngs):
        self.cfg = cfg = cfg or FlashVSRConfig()
        kw = dict(dtype=dtype, rngs=rngs)
        p = int(np.prod(cfg.patch_size))
        self.patch_embedding = FVLinear(cfg.in_dim * p, cfg.dim, **kw)
        self.text_embedding_0 = FVLinear(cfg.text_dim, cfg.dim, **kw)
        self.text_embedding_2 = FVLinear(cfg.dim, cfg.dim, **kw)
        self.time_embedding_0 = FVLinear(cfg.freq_dim, cfg.dim, **kw)
        self.time_embedding_2 = FVLinear(cfg.dim, cfg.dim, **kw)
        self.time_projection_1 = FVLinear(cfg.dim, cfg.dim * 6, **kw)
        self.blocks = nnx.List([FVBlock(cfg, **kw) for _ in range(cfg.num_layers)])
        self.head = FVHead(cfg, **kw)
        self.LQ_proj_in = FVLQProj(cfg, **kw)

    @staticmethod
    def sharding_rules(cfg: "FlashVSRConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(self_attn|cross_attn)\.[qkv]\.kernel", P(None, "tp")),
                (r"(self_attn|cross_attn)\.o\.kernel", P("tp", None)),
                (r"ffn_0\.kernel", P(None, "tp")),
                (r"ffn_2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    # -- host-side helpers ---------------------------------------------------------

    def time_embed(self, timestep: float, batch: int = 1):
        """t [B,dim] and t_mod [B,6,dim] for the fixed one-step timestep
        (engine precomputes these once, upscale.py:295-301)."""
        d = self.cfg.freq_dim
        half = d // 2
        freqs = np.power(10000.0, -np.arange(half, dtype=np.float64) / half)
        ang = timestep * freqs
        sin_emb = np.concatenate([np.cos(ang), np.sin(ang)]).astype(np.float32)
        emb = jnp.asarray(np.tile(sin_emb[None], (batch, 1)))
        t = self.time_embedding_2(jax.nn.silu(self.time_embedding_0(emb)))
        t_mod = self.time_projection_1(jax.nn.silu(t)).reshape(batch, 6, self.cfg.dim)
        return t, t_mod

    def context_kv(self, context: jnp.ndarray):
        """reinit_cross_kv (model.py:1134): per-block persistent text KV."""
        ctx = self.text_embedding_2(
            jax.nn.gelu(self.text_embedding_0(context), approximate=True))
        return [blk.cross_attn.kv_from_context(ctx) for blk in self.blocks]

    def rope_for_chunk(self, f: int, h_tok: int, w_tok: int, f_start: int):
        cos, sin = _rope_tables_3d(self.cfg.head_dim, f, h_tok, w_tok, f_start)
        return jnp.asarray(cos), jnp.asarray(sin)

    def patchify(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
        """[B,C,f,H,W] → tokens [B, f·h·w, dim] (conv patch embed as matmul)."""
        pt, ph, pw = self.cfg.patch_size
        b, c, f, hh, ww = x.shape
        h, w = hh // ph, ww // pw
        x = x.reshape(b, c, f // pt, pt, h, ph, w, pw)
        # token features ordered (C, pt, ph, pw) to match the conv kernel flatten
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b, (f // pt) * h * w, c * pt * ph * pw)
        return self.patch_embedding(x), (f // pt, h, w)

    def unpatchify(self, tokens: jnp.ndarray, grid: Tuple[int, int, int]) -> jnp.ndarray:
        f, h, w = grid
        pt, ph, pw = self.cfg.patch_size
        c = self.cfg.out_dim
        b = tokens.shape[0]
        x = tokens.reshape(b, f, h, w, pt, ph, pw, c)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(b, c, f * pt, h * ph, w * pw)
        return x

    def __call__(self, x, t, t_mod, rope_cos, rope_sin, ctx_kv,
                 lq_tokens: Optional[List[jnp.ndarray]] = None,
                 caches: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]] = None):
        """One streaming chunk. Returns (noise_pred, new_caches) where each
        new cache holds at most kv_len·2 latent frames of KV (trimmed here so
        steady-state shapes are constant — SelfAttention cache trim,
        model.py:625-632)."""
        cfg = self.cfg
        tokens, grid = self.patchify(x)
        f, h, w = grid
        keep = cfg.kv_len * 2 * h * w  # kv_len chunks of 2 latent frames
        new_caches = []
        for i, blk in enumerate(self.blocks):
            if lq_tokens is not None and i < len(lq_tokens):
                tokens = tokens + lq_tokens[i]
            ck, cv = (caches[i] if caches is not None else (None, None))
            k_ctx, v_ctx = ctx_kv[i]
            tokens, nk, nv = blk(tokens, t_mod, rope_cos, rope_sin, k_ctx, v_ctx,
                                 ck, cv)
            new_caches.append((nk[:, -keep:], nv[:, -keep:]))
        out = self.head(tokens, t)
        return self.unpatchify(out, grid), new_caches
