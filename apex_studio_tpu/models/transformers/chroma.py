"""Chroma (Chroma1-HD) MMDiT, tpu-native.

Contract parity with the reference's ``src/transformer/chroma/base/model.py``
(ChromaTransformer2DModel) — a flux derivative with PRUNED modulation:
- no pooled-text/guidance embedders; a "distilled guidance" approximator
  produces every block's modulation rows at once (model.py:182):
  input_vec[b, i] = [sin-cos(t·1000, 16) | sin-cos(0, 16) | mod_proj_i(32)]
  where mod_proj is the static sin-cos table of ``arange(344)·1000``;
  approximator = in_proj → 5 residual (RMSNorm → Linear → SiLU → Linear)
  layers → out_proj (model.py:225)
- pooled_temb rows: single blocks get 3 rows each starting at row 0
  (model.py:686); double block i reads img rows at 3·n_single + 6·i and txt
  rows at 3·n_single + 6·n_double + 6·i (model.py:631); final norm uses the
  LAST 2 rows as (shift, scale) — shift first (model.py:175)
- per-block modulations are the raw rows (no per-block Linear) with the flux
  ordering (shift, scale, gate)×2 via chunk (model.py:104)
- attention masks the padded text tokens: [txt_mask | ones(img)] outer
  product (engine/chroma/t2i.py:138, model.py:299)
- blocks are otherwise flux: joint dual-stream attention with per-head qk
  RMSNorm and axial RoPE (16/56/56), parallel single blocks, 2×2 packed
  latents

TPU design: reuses the flux joint-attention kernel path; the approximator
runs once per step (344 tiny matmuls fused by XLA).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import GELUMLP, Linear, RMSNorm
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.flux import FluxJointAttention
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs


@dataclasses.dataclass
class ChromaConfig:
    patch_size: int = 1
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    approximator_num_channels: int = 64
    approximator_hidden_dim: int = 5120
    approximator_layers: int = 5

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def num_mod_rows(self) -> int:
        return 3 * self.num_single_layers + 2 * 6 * self.num_layers + 2

    @classmethod
    def from_dict(cls, cfg: dict) -> "ChromaConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: (tuple(v) if k == "axes_dims_rope" else v)
                      for k, v in cfg.items() if k in names})


class ChromaApproximator(nnx.Module):
    """Residual MLP stack emitting all modulation rows (model.py:225)."""

    def __init__(self, cfg: ChromaConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        h = cfg.approximator_hidden_dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.in_proj = Linear(cfg.approximator_num_channels, h, **kw)
        self.layers_1 = nnx.List([
            Linear(h, h, **kw) for _ in range(cfg.approximator_layers)
        ])
        self.layers_2 = nnx.List([
            Linear(h, h, **kw) for _ in range(cfg.approximator_layers)
        ])
        self.norms = nnx.List([
            RMSNorm(h, eps=1e-6, rngs=rngs) for _ in range(cfg.approximator_layers)
        ])
        self.out_proj = Linear(h, cfg.dim, **kw)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.in_proj(x)
        for l1, l2, nrm in zip(self.layers_1, self.layers_2, self.norms):
            x = x + l2(nnx.silu(l1(nrm(x).astype(x.dtype))))
        return self.out_proj(x)


def _mod_row_embedding(num_rows: int, dim: int) -> jnp.ndarray:
    """The reference's mod_proj buffer (model.py:193) calls
    get_timestep_embedding(torch.arange(n)*1000, ...) with an INTEGER tensor,
    and diffusers' `emb = torch.exp(exponent).to(timesteps.dtype)` then
    truncates every frequency to int64 — so freqs collapse to [1, 0, 0, ...].
    Chroma's approximator was distilled against this degenerate encoding, so
    checkpoints require it verbatim."""
    half = dim // 2
    freqs = np.trunc(np.exp(-np.log(10000.0) * np.arange(half) / half))
    angles = (np.arange(num_rows, dtype=np.float64) * 1000.0)[:, None] * freqs
    emb = np.concatenate([np.cos(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(emb, jnp.float32)


def chroma_input_vec(t: jnp.ndarray, num_channels: int, num_rows: int) -> jnp.ndarray:
    """[B] timesteps in [0,1] → [B, num_rows, 4·num_channels] (model.py:204)."""
    b = t.shape[0]
    t_proj = timestep_embedding(t.astype(jnp.float32) * 1000.0, num_channels)
    g_proj = timestep_embedding(jnp.zeros((b,), jnp.float32), num_channels)
    mod = _mod_row_embedding(num_rows, 2 * num_channels)  # [rows, 2C]
    tg = jnp.concatenate([t_proj, g_proj], axis=-1)  # [B, 2C]
    tg = jnp.tile(tg[:, None], (1, num_rows, 1))
    return jnp.concatenate([tg, jnp.tile(mod[None], (b, 1, 1))], axis=-1)


class ChromaDoubleBlock(nnx.Module):
    def __init__(self, cfg: ChromaConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        from apex_studio_tpu.models.transformers.flux import FluxConfig

        fcfg = FluxConfig(
            in_channels=cfg.in_channels,
            num_attention_heads=cfg.num_attention_heads,
            attention_head_dim=cfg.attention_head_dim,
            joint_attention_dim=cfg.joint_attention_dim,
        )
        d = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.attn = FluxJointAttention(fcfg, **kw)
        self.ff = GELUMLP(d, 4 * d, approximate=True, **kw)
        self.ff_context = GELUMLP(d, 4 * d, approximate=True, **kw)

    def __call__(self, img, txt, mod_img, mod_txt, rope_cos, rope_sin, mask_bias):
        # mod_* [B, 6, d] raw rows, flux chunk order (model.py:104)
        sh_i, sc_i, g_i, sh2_i, sc2_i, g2_i = [
            mod_img[:, i][:, None].astype(img.dtype) for i in range(6)
        ]
        sh_t, sc_t, g_t, sh2_t, sc2_t, g2_t = [
            mod_txt[:, i][:, None].astype(img.dtype) for i in range(6)
        ]
        img_n = layer_norm(img, eps=1e-6) * (1 + sc_i) + sh_i
        txt_n = layer_norm(txt, eps=1e-6) * (1 + sc_t) + sh_t
        attn_i, attn_t = self.attn(img_n, txt_n, rope_cos, rope_sin, mask_bias=mask_bias)
        img = img + g_i * attn_i
        txt = txt + g_t * attn_t
        img = img + g2_i * self.ff(layer_norm(img, eps=1e-6) * (1 + sc2_i) + sh2_i)
        txt = txt + g2_t * self.ff_context(
            layer_norm(txt, eps=1e-6) * (1 + sc2_t) + sh2_t
        )
        return img, txt


class ChromaSingleBlock(nnx.Module):
    def __init__(self, cfg: ChromaConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.norm_q = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.norm_k = RMSNorm(cfg.attention_head_dim, eps=1e-6, rngs=rngs)
        self.proj_mlp = Linear(d, 4 * d, **kw)
        self.proj_out = Linear(5 * d, d, **kw)
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim

    def __call__(self, x, mod, rope_cos, rope_sin, mask_bias):
        b, s, _ = x.shape
        shift, scale, gate = [mod[:, i][:, None].astype(x.dtype) for i in range(3)]
        xn = layer_norm(x, eps=1e-6) * (1 + scale) + shift
        q = self.norm_q(self.to_q(xn).reshape(b, s, self.heads, self.head_dim))
        k = self.norm_k(self.to_k(xn).reshape(b, s, self.heads, self.head_dim))
        v = self.to_v(xn).reshape(b, s, self.heads, self.head_dim)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        attn = attention_op(q, k, v, bias=mask_bias).reshape(b, s, -1)
        mlp = nnx.gelu(self.proj_mlp(xn), approximate=True)
        return x + gate * self.proj_out(jnp.concatenate([attn, mlp], axis=-1))


@transformer_registry.register("chroma.base", aliases=("chroma", "ChromaTransformer2DModel"))
class ChromaTransformer2DModel(nnx.Module):
    config_class = ChromaConfig

    def __init__(self, cfg: ChromaConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.x_embedder = Linear(cfg.in_channels, d, use_bias=True, **kw)
        self.context_embedder = Linear(cfg.joint_attention_dim, d, use_bias=True, **kw)
        self.distilled_guidance_layer = ChromaApproximator(cfg, **kw)
        self.transformer_blocks = nnx.List(
            [ChromaDoubleBlock(cfg, **kw) for _ in range(cfg.num_layers)]
        )
        self.single_transformer_blocks = nnx.List(
            [ChromaSingleBlock(cfg, **kw) for _ in range(cfg.num_single_layers)]
        )
        self.proj_out = Linear(d, cfg.patch_size**2 * cfg.out_channels,
                               use_bias=True, **kw)

    @staticmethod
    def sharding_rules(cfg: "ChromaConfig"):
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj)\.kernel", P(None, "tp")),
                (r"(to_out|to_add_out)\.kernel", P("tp", None)),
                (r"(ff|ff_context)\.fc1\.kernel", P(None, "tp")),
                (r"(ff|ff_context)\.fc2\.kernel", P("tp", None)),
                (r"proj_mlp\.kernel", P(None, "tp")),
                (r"single_transformer_blocks.*proj_out\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    # -- geometry (identical to flux) ----------------------------------------------

    def img_ids(self, h_tok: int, w_tok: int) -> np.ndarray:
        ids = np.zeros((h_tok, w_tok, 3), np.int64)
        ids[..., 1] = np.arange(h_tok)[:, None]
        ids[..., 2] = np.arange(w_tok)[None, :]
        return ids.reshape(-1, 3)

    def rope_tables(self, n_txt: int, h_tok: int, w_tok: int):
        txt_ids = np.zeros((n_txt, 3), np.int64)
        ids = np.concatenate([txt_ids, self.img_ids(h_tok, w_tok)], axis=0)
        cos, sin = precompute_axial_freqs(
            jnp.asarray(ids)[None], self.cfg.axes_dims_rope, self.cfg.rope_theta
        )
        return cos[:, :, None, :], sin[:, :, None, :]

    @staticmethod
    def pack_latents(x: jnp.ndarray) -> jnp.ndarray:
        b, c, h, w = x.shape
        x = x.reshape(b, c, h // 2, 2, w // 2, 2)
        return jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(b, (h // 2) * (w // 2), 4 * c)

    @staticmethod
    def unpack_latents(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, _, c4 = tokens.shape
        c = c4 // 4
        x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
        return jnp.transpose(x, (0, 3, 1, 4, 2, 5)).reshape(b, c, h, w)

    def __call__(
        self,
        hidden_states: jnp.ndarray,        # [B, S_img, in_channels] packed
        encoder_hidden_states: jnp.ndarray,  # [B, S_txt, joint_dim]
        timestep: jnp.ndarray,             # [B] in [0, 1]
        attention_mask: Optional[jnp.ndarray] = None,  # [B, S_txt] 1=keep
        rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        grid_hw: Optional[Tuple[int, int]] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        img = self.x_embedder(hidden_states.astype(self.dtype))
        txt = self.context_embedder(encoder_hidden_states.astype(self.dtype))
        n_txt, n_img = txt.shape[1], img.shape[1]

        if rope is None:
            rope = self.rope_tables(n_txt, *grid_hw)
        rope_cos, rope_sin = rope

        # All modulation rows in one shot.
        vec = chroma_input_vec(timestep, cfg.approximator_num_channels // 4,
                               cfg.num_mod_rows).astype(self.dtype)
        pooled = self.distilled_guidance_layer(vec).astype(jnp.float32)  # [B,rows,d]

        mask_bias = None
        if attention_mask is not None:
            full = jnp.concatenate(
                [attention_mask.astype(jnp.float32),
                 jnp.ones((img.shape[0], n_img), jnp.float32)], axis=1
            )
            pair = full[:, None, :] * full[:, :, None]          # [B, S, S]
            mask_bias = ((1.0 - pair) * -1e9)[:, None]          # [B, 1, S, S]

        n_single, n_double = cfg.num_single_layers, cfg.num_layers
        img_off = 3 * n_single
        txt_off = img_off + 6 * n_double
        for i, block in enumerate(self.transformer_blocks):
            mod_img = pooled[:, img_off + 6 * i: img_off + 6 * i + 6]
            mod_txt = pooled[:, txt_off + 6 * i: txt_off + 6 * i + 6]
            img, txt = block(img, txt, mod_img, mod_txt, rope_cos, rope_sin, mask_bias)

        x = jnp.concatenate([txt, img], axis=1)
        for i, block in enumerate(self.single_transformer_blocks):
            x = block(x, pooled[:, 3 * i: 3 * i + 3], rope_cos, rope_sin, mask_bias)
        x = x[:, n_txt:]

        # final pruned adaLN: rows [-2:] are (shift, scale) — shift FIRST
        shift = pooled[:, -2][:, None].astype(x.dtype)
        scale = pooled[:, -1][:, None].astype(x.dtype)
        x = layer_norm(x, eps=1e-6) * (1 + scale) + shift
        return self.proj_out(x)
