"""HunyuanImage-3.0 — autoregressive multimodal MoE backbone as a diffusion
denoiser, in JAX/NNX.

Counterpart of the reference's ``src/transformer/hunyuanimage3/base/model.py``
(HunyuanImage3ForCausalMM, MoE at :1292, gate at :1227, decoder layer at
:1721): one causal-LM transformer serves both the text prefix and the image
latent tokens — the sequence is ``[text tokens, timestep token, image
tokens]``; text attends causally, image tokens attend bidirectionally among
themselves and to the whole prefix; each layer is GQA attention + a sparse
MoE FFN (shared always-on expert + top-k routed experts, DeepSeek-style
renormalized gates).

TPU notes on the MoE: routing uses the reference's ``easy_topk`` (softmax →
top-k → renormalize, model.py:1282). Expert execution is a dense
scan-over-experts with per-token routing weights — every expert runs on the
full token batch and results combine by weight. That trades FLOPs for static
shapes (no capacity buckets / sorting), which is the right default below the
chip's arithmetic-intensity knee; an `ep`-sharded dispatch path is the
planned optimization for the 64-expert production config.
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
from apex_studio_tpu.ops.rope import apply_rope_half, rope_freqs_1d


@dataclasses.dataclass
class HunyuanImage3Config:
    vocab_size: int = 128000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    moe_intermediate_size: Optional[int] = None
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    num_experts: int = 8
    moe_topk: int = 2
    use_mixed_mlp_moe: bool = True
    moe_layer_num_skipped: int = 0
    # image branch
    img_in_channels: int = 16
    img_out_channels: int = 16
    patch_size: int = 2

    @classmethod
    def from_dict(cls, cfg: dict) -> "HunyuanImage3Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "head_dim" not in kw and "hidden_size" in kw and "num_attention_heads" in kw:
            kw["head_dim"] = kw["hidden_size"] // kw["num_attention_heads"]
        return cls(**kw)


class _HYMLP(nnx.Module):
    """SwiGLU with the fused gate_and_up layout the checkpoints use."""

    def __init__(self, dim: int, hidden: int, *, dtype, rngs):
        kw = dict(use_bias=False, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.gate_and_up_proj = Linear(dim, 2 * hidden, **kw)
        self.down_proj = Linear(hidden, dim, **kw)

    def __call__(self, x):
        gate, up = jnp.split(self.gate_and_up_proj(x), 2, axis=-1)
        return self.down_proj(nnx.silu(gate) * up)


class _HYMoE(nnx.Module):
    def __init__(self, cfg: HunyuanImage3Config, *, dtype, rngs):
        d = cfg.hidden_size
        hid = cfg.moe_intermediate_size or cfg.intermediate_size
        self.wg = Linear(d, cfg.num_experts, use_bias=False, dtype=jnp.float32,
                         param_dtype=jnp.float32, rngs=rngs)
        self.shared_mlp = (_HYMLP(d, cfg.intermediate_size, dtype=dtype, rngs=rngs)
                           if cfg.use_mixed_mlp_moe else None)
        self.experts = nnx.List([
            _HYMLP(d, hid, dtype=dtype, rngs=rngs)
            for _ in range(cfg.num_experts)
        ])
        self.topk = cfg.moe_topk
        self.num_experts = cfg.num_experts

    def __call__(self, x):
        b, s, d = x.shape
        logits = self.wg(x.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)
        topw, topi = jax.lax.top_k(gates, self.topk)
        topw = topw / jnp.clip(topw.sum(-1, keepdims=True), 1e-8)
        # per-token weight for every expert (0 outside the top-k)
        onehot = jax.nn.one_hot(topi, self.num_experts, dtype=gates.dtype)
        w_full = (onehot * topw[..., None]).sum(axis=-2)  # (B, S, E)

        out = jnp.zeros_like(x, dtype=jnp.float32)
        for e, expert in enumerate(self.experts):
            out = out + (w_full[..., e:e + 1].astype(x.dtype)
                         * expert(x)).astype(jnp.float32)
        if self.shared_mlp is not None:
            out = out + self.shared_mlp(x).astype(jnp.float32)
        return out.astype(x.dtype)


class _HYAttention(nnx.Module):
    def __init__(self, cfg: HunyuanImage3Config, *, dtype, rngs):
        h, kv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
        kw = dict(use_bias=False, dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.q_proj = Linear(cfg.hidden_size, h * hd, **kw)
        self.k_proj = Linear(cfg.hidden_size, kv * hd, **kw)
        self.v_proj = Linear(cfg.hidden_size, kv * hd, **kw)
        self.o_proj = Linear(h * hd, cfg.hidden_size, **kw)
        self.query_layernorm = RMSNorm(hd, eps=cfg.rms_norm_eps)
        self.key_layernorm = RMSNorm(hd, eps=cfg.rms_norm_eps)
        self.heads, self.kv_heads, self.hd = h, kv, hd

    def __call__(self, x, cos, sin, mask):
        b, s, _ = x.shape
        q = self.q_proj(x).reshape(b, s, self.heads, self.hd)
        k = self.k_proj(x).reshape(b, s, self.kv_heads, self.hd)
        v = self.v_proj(x).reshape(b, s, self.kv_heads, self.hd)
        q = self.query_layernorm(q).astype(x.dtype)
        k = self.key_layernorm(k).astype(x.dtype)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        rep = self.heads // self.kv_heads
        if rep > 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = attention(q, k, v, mask=mask)
        return self.o_proj(out.reshape(b, s, -1))


class _HYLayer(nnx.Module):
    def __init__(self, cfg: HunyuanImage3Config, moe: bool, *, dtype, rngs):
        self.input_layernorm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.self_attn = _HYAttention(cfg, dtype=dtype, rngs=rngs)
        self.post_attention_layernorm = RMSNorm(cfg.hidden_size,
                                                eps=cfg.rms_norm_eps)
        self.mlp = (_HYMoE(cfg, dtype=dtype, rngs=rngs) if moe
                    else _HYMLP(cfg.hidden_size, cfg.intermediate_size,
                                dtype=dtype, rngs=rngs))

    def __call__(self, x, cos, sin, mask):
        x = x + self.self_attn(self.input_layernorm(x), cos, sin, mask)
        return x + self.mlp(self.post_attention_layernorm(x))


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
        self.embed_tokens = nnx.Param(
            init(rngs.params(), (cfg.vocab_size, cfg.hidden_size), param_dtype))
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch_dim = cfg.img_in_channels * cfg.patch_size ** 2
        self.img_in = Linear(patch_dim, cfg.hidden_size, **kw)
        self.time_in_1 = Linear(256, cfg.hidden_size, **kw)
        self.time_in_2 = Linear(cfg.hidden_size, cfg.hidden_size, **kw)
        moe = ((cfg.num_experts or 1) > 1)
        self.layers = nnx.List([
            _HYLayer(cfg, moe and i >= cfg.moe_layer_num_skipped,
                     dtype=dtype, rngs=rngs)
            for i in range(cfg.num_hidden_layers)
        ])
        self.norm = RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)
        self.img_head = Linear(cfg.hidden_size,
                               cfg.img_out_channels * cfg.patch_size ** 2, **kw)

    @staticmethod
    def sharding_rules(cfg: "HunyuanImage3Config"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules([
            (r".*(q_proj|k_proj|v_proj|gate_and_up_proj)\.kernel", P(None, "tp")),
            (r".*(o_proj|down_proj)\.kernel", P("tp", None)),
        ])

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.cfg.patch_size
        b, c, h, w = x.shape
        x = x.reshape(b, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5)
        return x.reshape(b, (h // p) * (w // p), c * p * p)

    def unpatchify(self, tok, h, w):
        p = self.cfg.patch_size
        c = self.cfg.img_out_channels
        b = tok.shape[0]
        x = tok.reshape(b, h // p, w // p, c, p, p)
        x = x.transpose(0, 3, 1, 4, 2, 5)
        return x.reshape(b, c, h, w)

    def __call__(self, img: jnp.ndarray, t: jnp.ndarray,
                 input_ids: jnp.ndarray) -> jnp.ndarray:
        """img: (B, C, H', W') latents; t: (B,) flow time (0..1000 domain);
        input_ids: (B, L) prompt tokens. Returns the velocity field."""
        cfg = self.cfg
        b, c, hh, ww = img.shape
        gh, gw = hh // cfg.patch_size, ww // cfg.patch_size
        text = jnp.take(self.embed_tokens.value, input_ids, axis=0
                        ).astype(self.dtype)
        half = 128
        freqs = jnp.asarray(np.exp(
            -math.log(10000.0) * np.arange(half, dtype=np.float64) / half),
            jnp.float32)
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        sincos = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        t_tok = self.time_in_2(nnx.silu(self.time_in_1(
            sincos.astype(self.dtype))))[:, None]
        img_tok = self.img_in(self.patchify(img).astype(self.dtype))

        L = text.shape[1]
        n_img = img_tok.shape[1]
        seq = jnp.concatenate([text, t_tok, img_tok], axis=1)
        S = seq.shape[1]

        # positions: text 1-D; image tokens 2-D (h on the first rope half,
        # w on the second), offset past the prefix (custom_pos_emb role)
        hd = cfg.head_dim
        text_pos = np.arange(L + 1, dtype=np.float64)
        gy, gx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        img_y = gy.reshape(-1) + L + 1
        img_x = gx.reshape(-1) + L + 1
        pos_a = jnp.asarray(np.concatenate([text_pos, img_y]), jnp.float32)
        pos_b = jnp.asarray(np.concatenate([text_pos, img_x]), jnp.float32)
        cos_a, sin_a = rope_freqs_1d(pos_a[None], hd // 2, cfg.rope_theta)
        cos_b, sin_b = rope_freqs_1d(pos_b[None], hd // 2, cfg.rope_theta)
        cos = jnp.concatenate([cos_a, cos_b], axis=-1)[:, :, None, :]
        sin = jnp.concatenate([sin_a, sin_b], axis=-1)[:, :, None, :]

        # mask: causal over the text prefix; t-token and image tokens attend
        # to everything (bidirectional within the generation region)
        causal = np.tril(np.ones((S, S), bool))
        causal[L:, :] = True
        mask = jnp.asarray(causal)[None, None]

        for layer in self.layers:
            seq = layer(seq, cos, sin, mask)
        out = self.img_head(self.norm(seq[:, -n_img:]))
        return self.unpatchify(out.astype(jnp.float32), hh, ww)
