"""HunyuanImage-3.0 — autoregressive multimodal MoE backbone as a diffusion
denoiser, in JAX/NNX.

Faithful counterpart of the reference's
``src/transformer/hunyuanimage3/base/model.py``:

- ``HunyuanImage3ForCausalMM`` (model.py:2189): one causal-LM transformer
  serves both the text prefix and the image latent tokens. The sequence is
  ``[text tokens …, <timestep>, <img>×N, trailing tokens]``; the <timestep>
  slot is overwritten with ``timestep_emb(t)`` and the <img> slots with the
  UNet patch embedding of the latents (scatter semantics, model.py:2226/2343).
- ``UNetDown``/``UNetUp`` patch embed + final layer (model.py:870/947):
  conv3x3 stem → timestep-modulated ResBlocks (adaptive GroupNorm, zero-init
  out conv, avgpool down / nearest up), ``img_proj_type == "unet"``.
- Decoder layer (model.py:1721): RMSNorm → fused-QKV GQA attention → RMSNorm
  → MLP/MoE.  The fused qkv unpacks per-KV-head interleaved groups
  ``(kv, groups+2, hd)`` (model.py:1492-1500); 2-D rope is applied BEFORE the
  optional per-head QK RMSNorm (model.py:1513-1522).
- 2-D rope (model.py:458 ``build_2d_rope``): text tokens take diagonal (p,p)
  positions; image tokens take centered grid positions starting at
  ``beta_y = L + (wh-h)/2``, ``beta_x = L + (wh-w)/2``; the (y,x) pair
  multiplies alternating theta pairs (theta reshaped ``[d/4, 2]``) and the
  half-angle vector is tiled twice across the head dim (GPT-NeoX rotate-half).
- MoE (model.py:1292): shared always-on MLP (width ``moe_intermediate_size ×
  num_shared_expert``) + top-k routed experts with renormalized softmax gates
  (``topkgating`` model.py:268 with ``drop_tokens=False`` — numerically equal
  to ``easy_topk`` — incl. ``norm_topk_prob``/``routed_scaling_factor`` and
  optional DeepSeek group-limited greedy routing).
- SwiGLU order (model.py:1214): ``down(x1 * silu(x2))`` — the *second* chunk
  of ``gate_and_up_proj`` is the gate.
- Attention mask (engine t2i.py:292): causal everywhere, full attention
  within each image span.
- No final norm on the backbone output (model.py:2148): hidden states feed
  the UNetUp final layer directly, which carries its own out-norm.

TPU notes: the MoE runs as a dense scan-over-experts with per-token routing
weights — every expert runs on the full token batch and results combine by
weight. That trades FLOPs for static shapes (no capacity buckets / sorting),
the right default below the MXU's arithmetic-intensity knee; an `ep`-sharded
dispatch is the planned optimization for the 64-expert production config.
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
from apex_studio_tpu.models.vaes.autoencoder_kl import Conv2d, GroupNorm
from apex_studio_tpu.ops.attention import attention


@dataclasses.dataclass
class HunyuanImage3Config:
    vocab_size: int = 128000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    moe_intermediate_size: Optional[int] = None
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    attention_head_dim: Optional[int] = None
    hidden_act: str = "silu"
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    attention_bias: bool = False
    mlp_bias: bool = False
    use_qk_norm: bool = False
    norm_type: str = "hf_rms"
    # MoE
    num_experts: int = 1
    use_mixed_mlp_moe: bool = False
    num_shared_expert: int = 1
    moe_topk: int = 1
    moe_layer_num_skipped: int = 0
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0
    group_limited_greedy: bool = False
    n_group: Optional[int] = None
    topk_group: Optional[int] = None
    # image branch (img_proj_type == "unet")
    img_in_channels: int = 32
    img_out_channels: int = 32
    patch_size: int = 1
    patch_embed_hidden_dim: int = 1024

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads
        if self.attention_head_dim is None:
            self.attention_head_dim = self.hidden_size // self.num_attention_heads

    @classmethod
    def from_dict(cls, cfg: dict) -> "HunyuanImage3Config":
        cfg = dict(cfg)
        vae = cfg.get("vae")
        if isinstance(vae, dict) and "latent_channels" in vae:
            cfg.setdefault("img_in_channels", vae["latent_channels"])
            cfg.setdefault("img_out_channels", vae["latent_channels"])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})


def _timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """cos-first sinusoid (reference model.py:189 ``timestep_embedding``)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class _TimestepEmbedder(nnx.Module):
    """Sinusoid → Linear → GELU(erf) → Linear (reference model.py:635)."""

    def __init__(self, hidden_size: int, *, freq_size: int = 256,
                 dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.mlp_0 = Linear(freq_size, hidden_size, **kw)
        self.mlp_2 = Linear(hidden_size, hidden_size, **kw)
        self.freq_size = freq_size

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        freqs = _timestep_embedding(t, self.freq_size)
        h = self.mlp_0(freqs.astype(self.mlp_0.kernel.value.dtype))
        return self.mlp_2(nnx.gelu(h, approximate=False))


class _ResBlock(nnx.Module):
    """Timestep-modulated residual block (reference model.py:751): GroupNorm32
    → SiLU → conv3x3 (with optional avgpool-down / nearest-up between), then
    adaptive GroupNorm ``norm(h)·(1+scale)+shift`` → SiLU → zero-init conv3x3,
    plus a 1x1-conv (or identity) skip. NHWC."""

    def __init__(self, cin: int, emb: int, cout: Optional[int] = None, *,
                 up: bool = False, down: bool = False, dtype, param_dtype,
                 rngs: nnx.Rngs):
        cout = cout or cin
        self.in_norm = GroupNorm(cin, 32, eps=1e-5, rngs=rngs)
        self.in_conv = Conv2d(cin, cout, dtype=dtype, rngs=rngs)
        self.emb_layers = Linear(emb, 2 * cout, use_bias=True, dtype=dtype,
                                 param_dtype=param_dtype, rngs=rngs)
        self.out_norm = GroupNorm(cout, 32, eps=1e-5, rngs=rngs)
        self.out_conv = Conv2d(cout, cout, dtype=dtype, rngs=rngs)
        self.skip_connection = (
            None if cout == cin
            else Conv2d(cin, cout, kernel=1, padding=0, dtype=dtype, rngs=rngs))
        self.up, self.down = up, down

    @staticmethod
    def _avgpool(x):
        b, h, w, c = x.shape
        return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))

    @staticmethod
    def _nearest2x(x):
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        h = nnx.silu(self.in_norm(x))
        if self.down:
            h, x = self._avgpool(h), self._avgpool(x)
        elif self.up:
            h, x = self._nearest2x(h), self._nearest2x(x)
        h = self.in_conv(h)
        scale, shift = jnp.split(
            self.emb_layers(nnx.silu(emb))[:, None, None, :], 2, axis=-1)
        h = self.out_norm(h) * (1.0 + scale) + shift
        h = self.out_conv(nnx.silu(h))
        skip = x if self.skip_connection is None else self.skip_connection(x)
        return skip + h


class _OutConv(nnx.Module):
    """UNetUp's trailing Sequential(norm, SiLU, conv3x3) (model.py:1000)."""

    def __init__(self, cin: int, cout: int, *, dtype, rngs: nnx.Rngs):
        self.norm = GroupNorm(cin, 32, eps=1e-5, rngs=rngs)
        self.conv = Conv2d(cin, cout, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        return self.conv(nnx.silu(self.norm(x)))


class _UNetDown(nnx.Module):
    """Latents (NCHW) → token sequence (reference model.py:870). ``model`` is
    index-aligned with the reference ModuleList: [conv3x3, ResBlock…]."""

    def __init__(self, patch_size: int, in_ch: int, emb: int, hidden: int,
                 out: int, *, dtype, param_dtype, rngs: nnx.Rngs):
        assert patch_size in (1, 2, 4, 8)
        mods = [Conv2d(in_ch, hidden, dtype=dtype, rngs=rngs)]
        if patch_size == 1:
            mods.append(_ResBlock(hidden, emb, out, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs))
        else:
            for i in range(patch_size // 2):
                mods.append(_ResBlock(
                    hidden, emb,
                    hidden if (i + 1) * 2 != patch_size else out,
                    down=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs))
        self.model = nnx.List(mods)

    def __call__(self, x_nchw: jnp.ndarray, t_emb: jnp.ndarray):
        x = x_nchw.transpose(0, 2, 3, 1)
        for m in self.model:
            x = m(x, t_emb) if isinstance(m, _ResBlock) else m(x)
        b, th, tw, c = x.shape
        return x.reshape(b, th * tw, c), th, tw


class _UNetUp(nnx.Module):
    """Token sequence → latents (NCHW) (reference model.py:947), with the
    ``out_norm=True`` trailing norm+conv the final layer uses."""

    def __init__(self, patch_size: int, in_ch: int, emb: int, hidden: int,
                 out: int, *, dtype, param_dtype, rngs: nnx.Rngs):
        assert patch_size in (1, 2, 4, 8)
        mods = []
        if patch_size == 1:
            mods.append(_ResBlock(in_ch, emb, hidden, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs))
        else:
            for i in range(patch_size // 2):
                mods.append(_ResBlock(
                    in_ch if i == 0 else hidden, emb, hidden, up=True,
                    dtype=dtype, param_dtype=param_dtype, rngs=rngs))
        mods.append(_OutConv(hidden, out, dtype=dtype, rngs=rngs))
        self.model = nnx.List(mods)

    def __call__(self, tok: jnp.ndarray, t_emb: jnp.ndarray, th: int, tw: int):
        b, s, c = tok.shape
        x = tok.reshape(b, th, tw, c)
        for m in self.model:
            x = m(x, t_emb) if isinstance(m, _ResBlock) else m(x)
        return x.transpose(0, 3, 1, 2)


class _HYMLP(nnx.Module):
    """SwiGLU with the fused gate_and_up layout; the reference gates on the
    SECOND chunk: ``down(x1 * silu(x2))`` (model.py:1214-1218)."""

    def __init__(self, dim: int, hidden: int, *, use_bias: bool, dtype,
                 param_dtype, rngs):
        kw = dict(use_bias=use_bias, dtype=dtype, param_dtype=param_dtype,
                  rngs=rngs)
        self.gate_and_up_proj = Linear(dim, 2 * hidden, **kw)
        self.down_proj = Linear(hidden, dim, **kw)

    def __call__(self, x):
        x1, x2 = jnp.split(self.gate_and_up_proj(x), 2, axis=-1)
        return self.down_proj(x1 * nnx.silu(x2))


class _HYGate(nnx.Module):
    """Router (reference ``HunyuanTopKGate`` model.py:1227 + ``topkgating``
    :268 with drop_tokens=False): softmax gates → optional group-limited
    greedy mask → top-k → renormalize (or scale)."""

    def __init__(self, cfg: HunyuanImage3Config, *, rngs):
        self.wg = Linear(cfg.hidden_size, cfg.num_experts, use_bias=False,
                         dtype=jnp.float32, param_dtype=jnp.float32, rngs=rngs)
        self.cfg = cfg

    def __call__(self, x):
        cfg = self.cfg
        gates = jax.nn.softmax(self.wg(x.astype(jnp.float32)), axis=-1)
        if cfg.group_limited_greedy:
            g = cfg.n_group
            shp = gates.shape[:-1] + (g, gates.shape[-1] // g)
            group_scores = gates.reshape(shp).max(axis=-1)
            kth = jnp.sort(group_scores, axis=-1)[..., g - cfg.topk_group]
            group_mask = group_scores >= kth[..., None]
            keep = jnp.repeat(group_mask, gates.shape[-1] // g, axis=-1)
            gates = jnp.where(keep, gates, 0.0)
        topw, topi = jax.lax.top_k(gates, cfg.moe_topk)
        onehot = jax.nn.one_hot(topi, cfg.num_experts, dtype=gates.dtype)
        if cfg.norm_topk_prob and cfg.moe_topk > 1:
            denom = jnp.clip(topw.sum(-1, keepdims=True), 1e-8)
            w = (onehot * (topw / denom)[..., None]).sum(axis=-2)
        else:
            w = (onehot * topw[..., None]).sum(axis=-2) * cfg.routed_scaling_factor
        return w  # (..., E) routing weight, 0 outside the top-k


class _HYMoE(nnx.Module):
    def __init__(self, cfg: HunyuanImage3Config, *, dtype, param_dtype, rngs):
        d = cfg.hidden_size
        moe_hid = cfg.moe_intermediate_size or cfg.intermediate_size
        kw = dict(use_bias=cfg.mlp_bias, dtype=dtype, param_dtype=param_dtype,
                  rngs=rngs)
        self.gate = _HYGate(cfg, rngs=rngs)
        self.shared_mlp = (
            _HYMLP(d, moe_hid * cfg.num_shared_expert, **kw)
            if cfg.use_mixed_mlp_moe else None)
        self.experts = nnx.List([
            _HYMLP(d, moe_hid, **kw) for _ in range(cfg.num_experts)])

    def __call__(self, x):
        w_full = self.gate(x)  # (B, S, E) f32
        out = jnp.zeros(x.shape, jnp.float32)
        for e, expert in enumerate(self.experts):
            out = out + w_full[..., e:e + 1] * expert(x).astype(jnp.float32)
        if self.shared_mlp is not None:
            out = out + self.shared_mlp(x).astype(jnp.float32)
        return out.astype(x.dtype)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


class _HYAttention(nnx.Module):
    """Fused-QKV GQA (reference model.py:1410): qkv unpacks per-KV-head
    ``(groups+2)`` interleaved slots; rope precedes the optional QK norm."""

    def __init__(self, cfg: HunyuanImage3Config, *, dtype, param_dtype, rngs):
        h, kv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.attention_head_dim)
        kw = dict(use_bias=cfg.attention_bias, dtype=dtype,
                  param_dtype=param_dtype, rngs=rngs)
        self.qkv_proj = Linear(cfg.hidden_size, (h + 2 * kv) * hd, **kw)
        self.o_proj = Linear(h * hd, cfg.hidden_size, **kw)
        if cfg.use_qk_norm:
            self.query_layernorm = RMSNorm(hd, eps=cfg.rms_norm_eps)
            self.key_layernorm = RMSNorm(hd, eps=cfg.rms_norm_eps)
        else:
            self.query_layernorm = self.key_layernorm = None
        self.heads, self.kv_heads, self.hd = h, kv, hd

    def __call__(self, x, cos, sin, mask):
        b, s, _ = x.shape
        groups = self.heads // self.kv_heads
        qkv = self.qkv_proj(x).reshape(b, s, self.kv_heads, groups + 2, self.hd)
        q = qkv[:, :, :, :groups].reshape(b, s, self.heads, self.hd)
        k = qkv[:, :, :, groups]
        v = qkv[:, :, :, groups + 1]
        q = q * cos[:, :, None, :] + _rotate_half(q) * sin[:, :, None, :]
        k = k * cos[:, :, None, :] + _rotate_half(k) * sin[:, :, None, :]
        if self.query_layernorm is not None:
            q = self.query_layernorm(q).astype(x.dtype)
            k = self.key_layernorm(k).astype(x.dtype)
        if groups > 1:
            k = jnp.repeat(k, groups, axis=2)
            v = jnp.repeat(v, groups, axis=2)
        out = attention(q.astype(v.dtype), k.astype(v.dtype), v, mask=mask)
        return self.o_proj(out.reshape(b, s, -1))


class _HYLayer(nnx.Module):
    def __init__(self, cfg: HunyuanImage3Config, moe: bool, *, dtype,
                 param_dtype, rngs):
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.self_attn = _HYAttention(cfg, dtype=dtype, param_dtype=param_dtype,
                                      rngs=rngs)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size,
                                                eps=cfg.rms_norm_eps)
        self.mlp = (
            _HYMoE(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            if moe else
            _HYMLP(cfg.hidden_size, cfg.intermediate_size, use_bias=cfg.mlp_bias,
                   dtype=dtype, param_dtype=param_dtype, rngs=rngs))

    def __call__(self, x, cos, sin, mask):
        x = x + self.self_attn(self.input_layernorm(x), cos, sin, mask)
        return x + self.mlp(self.post_attention_layernorm(x))


def _build_2d_rope(seq_len: int, n_elem: int, img_begin: int, gh: int, gw: int,
                   theta_base: float) -> Tuple[np.ndarray, np.ndarray]:
    """Positions + angles per reference ``build_2d_rope`` (model.py:458):
    text takes diagonal (p,p); the image grid starts at the centered offsets
    ``beta_y = L + (wh-h)/2``, ``beta_x = L + (wh-w)/2`` with L = img_begin;
    trailing text resumes at ``L + wh``. theta pairs alternate (y, x)."""
    assert n_elem % 4 == 0
    L, wh = img_begin, gh * gw
    pre = np.arange(0, L, dtype=np.float64)
    by, bx = L + (wh - gh) / 2.0, L + (wh - gw) / 2.0
    gy, gx = np.meshgrid(np.arange(gh, dtype=np.float64),
                         np.arange(gw, dtype=np.float64), indexing="ij")
    post = np.arange(L + wh, seq_len, dtype=np.float64)
    y = np.concatenate([pre, (gy + by).reshape(-1), post])[:seq_len]
    x = np.concatenate([pre, (gx + bx).reshape(-1), post])[:seq_len]
    theta = 1.0 / (theta_base ** (np.arange(0, n_elem, 2, dtype=np.float64)
                                  / n_elem))
    theta = theta.reshape(n_elem // 4, 2)
    pos = np.stack([y, x], axis=-1)  # (S, 2)
    ang = (pos[:, None, :] * theta[None]).reshape(seq_len, n_elem // 2)
    ang = np.tile(ang, (1, 2))
    return np.cos(ang), np.sin(ang)


@transformer_registry.register(
    "hunyuanimage3.base",
    aliases=("hunyuanimage3", "HunyuanImage3ForCausalMM"))
class HunyuanImage3ForCausalMM(nnx.Module):
    config_class = HunyuanImage3Config

    def __init__(self, cfg: HunyuanImage3Config, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        init = nnx.initializers.normal(0.02)
        self.wte = nnx.Param(
            init(rngs.params(), (cfg.vocab_size, cfg.hidden_size), param_dtype))
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.timestep_emb = _TimestepEmbedder(cfg.hidden_size, **kw)
        self.time_embed = _TimestepEmbedder(cfg.hidden_size, **kw)
        self.time_embed_2 = _TimestepEmbedder(cfg.hidden_size, **kw)
        self.patch_embed = _UNetDown(
            cfg.patch_size, cfg.img_in_channels, cfg.hidden_size,
            cfg.patch_embed_hidden_dim, cfg.hidden_size, **kw)
        self.final_layer = _UNetUp(
            cfg.patch_size, cfg.hidden_size, cfg.hidden_size,
            cfg.patch_embed_hidden_dim, cfg.img_out_channels, **kw)
        moe = (cfg.num_experts or 1) > 1
        self.layers = nnx.List([
            _HYLayer(cfg, moe and i >= cfg.moe_layer_num_skipped, **kw)
            for i in range(cfg.num_hidden_layers)])

    @staticmethod
    def sharding_rules(cfg: "HunyuanImage3Config"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        # Fused qkv splits along kv-head blocks (contiguous in the out dim);
        # experts/shared MLP column-parallel in, row-parallel out.
        return ShardingRules([
            (r".*qkv_proj\.kernel", P(None, "tp")),
            (r".*gate_and_up_proj\.kernel", P(None, "tp")),
            (r".*(o_proj|down_proj)\.kernel", P("tp", None)),
        ])

    def __call__(self, img: jnp.ndarray, t: jnp.ndarray,
                 input_ids: jnp.ndarray,
                 img_begin: Optional[int] = None) -> jnp.ndarray:
        """img: (B, C, H', W') latents; t: (B,) flow timestep; input_ids:
        (B, L) tokens. With ``img_begin=None`` the ids are a pure text prefix
        and the sequence is ``[ids, <timestep>, <img>×N]``; otherwise the ids
        already contain placeholder slots and the image span starts at
        ``img_begin`` with the timestep token at ``img_begin - 1``
        (reference scatter semantics, model.py:2226/2343). Returns the
        velocity prediction at the latent shape."""
        cfg = self.cfg
        b, c, hh, ww = img.shape
        gh, gw = hh // cfg.patch_size, ww // cfg.patch_size
        n_img = gh * gw

        t_emb = self.time_embed(t)
        img_tok, th, tw = self.patch_embed(img.astype(self.dtype), t_emb)
        ts_tok = self.timestep_emb(t)[:, None]

        embeds = jnp.take(self.wte.value, input_ids, axis=0).astype(self.dtype)
        if img_begin is None:
            img_begin = int(input_ids.shape[1]) + 1
            seq = jnp.concatenate([embeds, ts_tok, img_tok], axis=1)
        else:
            seq = jax.lax.dynamic_update_slice_in_dim(
                embeds, img_tok, img_begin, axis=1)
            seq = jax.lax.dynamic_update_slice_in_dim(
                seq, ts_tok, img_begin - 1, axis=1)
        S = seq.shape[1]

        cos_np, sin_np = _build_2d_rope(
            S, cfg.attention_head_dim, img_begin, gh, gw, cfg.rope_theta)
        cos = jnp.asarray(cos_np, jnp.float32)[None]
        sin = jnp.asarray(sin_np, jnp.float32)[None]

        # causal + full attention within the image span (engine t2i.py:292)
        m = np.tril(np.ones((S, S), bool))
        m[img_begin:img_begin + n_img, img_begin:img_begin + n_img] = True
        mask = jnp.asarray(m)[None, None]

        for layer in self.layers:
            seq = layer(seq, cos, sin, mask)

        # no backbone final norm (model.py:2148); UNetUp owns the out-norm
        image_hidden = jax.lax.dynamic_slice_in_dim(seq, img_begin, n_img, axis=1)
        t_emb2 = self.time_embed_2(t)
        pred = self.final_layer(image_hidden, t_emb2, th, tw)
        return pred.astype(jnp.float32)
