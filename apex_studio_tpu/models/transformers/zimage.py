"""Z-Image DiT (single-stream, adaLN-modulated, SwiGLU) in JAX/NNX.

Behavioral counterpart of the reference's ``src/transformer/zimage/base/model.py``
(ZImageTransformer2DModel): same parameterization and weight names, rebuilt
TPU-first:

- Static padded sequences: the engine pads caption tokens to a 32-multiple
  bucket and image tokens to SEQ_MULTI_OF, exactly like the reference's
  ``_pad_with_ids`` (pad tokens are *attended* — only cross-batch padding is
  masked), so outputs match while shapes stay jit-stable.
- Position ids / RoPE tables are trace-time numpy constants per shape bucket
  (reference rebuilds them per call on device).
- Attention flows through ops.attention (Pallas flash on TPU).

Contract quirks preserved (see engine/zimage/t2i.py:213-287): the engine feeds
``t = (1000 − scheduler_t)/1000`` and negates the model output.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear, RMSNorm, SwiGLU, TimestepEmbedder
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.ops import attention as attention_op
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import apply_rope

ADALN_DIM = 256
SEQ_MULTI_OF = 32


@dataclasses.dataclass
class ZImageConfig:
    dim: int = 3840
    n_layers: int = 30
    n_refiner_layers: int = 2
    n_heads: int = 30
    n_kv_heads: int = 30
    in_channels: int = 16
    cap_feat_dim: int = 2560
    norm_eps: float = 1e-5
    qk_norm: bool = True
    patch_size: int = 2
    f_patch_size: int = 1
    rope_theta: float = 256.0
    t_scale: float = 1000.0
    axes_dims: Tuple[int, ...] = (32, 48, 48)
    axes_lens: Tuple[int, ...] = (1024, 512, 512)

    @classmethod
    def from_dict(cls, cfg: dict) -> "ZImageConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        # Reference config stores list-valued patch sizes.
        if "all_patch_size" in cfg:
            kw["patch_size"] = int(cfg["all_patch_size"][0])
        if "all_f_patch_size" in cfg:
            kw["f_patch_size"] = int(cfg["all_f_patch_size"][0])
        for key in ("axes_dims", "axes_lens"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)


class ZImageAttention(nnx.Module):
    """Self-attention with per-head RMS qk-norm and interleaved RoPE."""

    def __init__(self, cfg: ZImageConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        self.heads = cfg.n_heads
        self.head_dim = d // cfg.n_heads
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.to_q = Linear(d, d, **kw)
        self.to_k = Linear(d, d, **kw)
        self.to_v = Linear(d, d, **kw)
        self.to_out = Linear(d, d, **kw)
        if cfg.qk_norm:
            self.norm_q = RMSNorm(self.head_dim, eps=1e-5, rngs=rngs)
            self.norm_k = RMSNorm(self.head_dim, eps=1e-5, rngs=rngs)
        else:
            self.norm_q = self.norm_k = None

    def __call__(self, x, mask, rope_cos, rope_sin):
        b, s, _ = x.shape
        q = self.to_q(x).reshape(b, s, self.heads, self.head_dim)
        k = self.to_k(x).reshape(b, s, self.heads, self.head_dim)
        v = self.to_v(x).reshape(b, s, self.heads, self.head_dim)
        if self.norm_q is not None:
            q = self.norm_q(q)
            k = self.norm_k(k)
        if rope_cos is not None:
            q = apply_rope(q, rope_cos, rope_sin)
            k = apply_rope(k, rope_cos, rope_sin)
        out = attention_op(q, k, v, mask=mask)
        return self.to_out(out.reshape(b, s, -1))


class ZImageBlock(nnx.Module):
    """Sandwich-norm block: x += gate·norm2(attn(norm1(x)·scale))."""

    def __init__(self, cfg: ZImageConfig, *, modulation: bool, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        self.modulation = modulation
        self.attention = ZImageAttention(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.feed_forward = SwiGLU(
            d, int(d / 3 * 8), dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self.attention_norm1 = RMSNorm(d, eps=cfg.norm_eps, rngs=rngs)
        self.attention_norm2 = RMSNorm(d, eps=cfg.norm_eps, rngs=rngs)
        self.ffn_norm1 = RMSNorm(d, eps=cfg.norm_eps, rngs=rngs)
        self.ffn_norm2 = RMSNorm(d, eps=cfg.norm_eps, rngs=rngs)
        if modulation:
            self.adaLN_modulation = Linear(
                min(d, ADALN_DIM), 4 * d, use_bias=True,
                dtype=dtype, param_dtype=param_dtype, rngs=rngs,
            )

    def __call__(self, x, mask, rope_cos, rope_sin, adaln=None):
        if self.modulation:
            mod = self.adaLN_modulation(adaln)[:, None, :]  # (B, 1, 4d)
            scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod, 4, axis=-1)
            gate_msa, gate_mlp = jnp.tanh(gate_msa), jnp.tanh(gate_mlp)
            scale_msa, scale_mlp = 1.0 + scale_msa, 1.0 + scale_mlp
            attn_out = self.attention(
                self.attention_norm1(x) * scale_msa, mask, rope_cos, rope_sin
            )
            x = x + gate_msa * self.attention_norm2(attn_out)
            x = x + gate_mlp * self.ffn_norm2(
                self.feed_forward(self.ffn_norm1(x) * scale_mlp)
            )
        else:
            attn_out = self.attention(self.attention_norm1(x), mask, rope_cos, rope_sin)
            x = x + self.attention_norm2(attn_out)
            x = x + self.ffn_norm2(self.feed_forward(self.ffn_norm1(x)))
        return x


class ZImageFinalLayer(nnx.Module):
    def __init__(self, dim: int, out_channels: int, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.linear = Linear(dim, out_channels, use_bias=True, dtype=dtype,
                             param_dtype=param_dtype, rngs=rngs)
        self.adaLN_modulation = Linear(
            min(dim, ADALN_DIM), dim, use_bias=True, dtype=dtype,
            param_dtype=param_dtype, rngs=rngs,
        )

    def __call__(self, x, c):
        scale = 1.0 + self.adaLN_modulation(nnx.silu(c))[:, None, :]
        x = layer_norm(x, eps=1e-6) * scale.astype(x.dtype)
        return self.linear(x)


@transformer_registry.register("zimage.base", aliases=("zimage",))
class ZImageTransformer2DModel(nnx.Module):
    config_class = ZImageConfig

    def __init__(self, cfg: ZImageConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        assert cfg.dim // cfg.n_heads == sum(cfg.axes_dims)

        patch_dim = cfg.f_patch_size * cfg.patch_size**2 * cfg.in_channels
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.x_embedder = Linear(patch_dim, cfg.dim, use_bias=True, **kw)
        self.final_layer = ZImageFinalLayer(cfg.dim, patch_dim, **kw)
        self.t_embedder = TimestepEmbedder(
            min(cfg.dim, ADALN_DIM), mid_size=1024, freq_size=256,
            max_period=10000.0, flip_sin_to_cos=True, **kw,
        )
        self.cap_embedder_norm = RMSNorm(cfg.cap_feat_dim, eps=cfg.norm_eps, rngs=rngs)
        self.cap_embedder_linear = Linear(cfg.cap_feat_dim, cfg.dim, use_bias=True, **kw)
        self.noise_refiner = nnx.List(
            [ZImageBlock(cfg, modulation=True, **kw) for _ in range(cfg.n_refiner_layers)]
        )
        self.context_refiner = nnx.List(
            [ZImageBlock(cfg, modulation=False, **kw) for _ in range(cfg.n_refiner_layers)]
        )
        self.layers = nnx.List(
            [ZImageBlock(cfg, modulation=True, **kw) for _ in range(cfg.n_layers)]
        )
        self.x_pad_token = nnx.Param(jnp.zeros((1, cfg.dim), param_dtype))
        self.cap_pad_token = nnx.Param(jnp.zeros((1, cfg.dim), param_dtype))

    @staticmethod
    def sharding_rules(cfg: ZImageConfig):
        """Tensor-parallel layout over the 'tp' mesh axis: attention heads and
        FFN columns split, output projections row-split (psum at block edges
        inserted by XLA); embedders/norms/adaLN replicated."""
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        return ShardingRules(
            [
                (r"attention\.to_[qkv]\.kernel", P(None, "tp")),
                (r"attention\.to_out\.kernel", P("tp", None)),
                (r"feed_forward\.w[13]\.kernel", P(None, "tp")),
                (r"feed_forward\.w2\.kernel", P("tp", None)),
            ],
            default=P(),
        )

    # -- host-side (trace-time) geometry -------------------------------------------

    def _pos_tables(self, h_tok: int, w_tok: int, n_pad: int, cap_len: int):
        """RoPE cos/sin for the unified [x, cap] sequence (numpy, trace-time)."""
        from apex_studio_tpu.ops.rope import precompute_axial_freqs

        # x tokens: axis0 = cap_len + 1 (constant), axes 1/2 = (row, col).
        grid = np.stack(
            np.meshgrid(
                np.array([cap_len + 1]), np.arange(h_tok), np.arange(w_tok), indexing="ij"
            ),
            axis=-1,
        ).reshape(-1, 3)
        pad_ids = np.zeros((n_pad - grid.shape[0], 3), np.int64)
        x_ids = np.concatenate([grid, pad_ids], axis=0)
        # cap tokens: axis0 = 1..cap_len. (Reference pads caption to the bucket
        # *before* assigning ids, so padded caption slots continue the ramp.)
        cap_ids = np.stack(
            [1 + np.arange(cap_len), np.zeros(cap_len), np.zeros(cap_len)], axis=-1
        )
        ids = np.concatenate([x_ids, cap_ids], axis=0)  # unified: [x, cap]
        cos, sin = precompute_axial_freqs(ids, self.cfg.axes_dims, self.cfg.rope_theta)
        n_x = x_ids.shape[0]
        return (cos[None, :n_x, None, :], sin[None, :n_x, None, :],
                cos[None, n_x:, None, :], sin[None, n_x:, None, :],
                cos[None, :, None, :], sin[None, :, None, :])

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, C, F, H, W] → [B, N, pF·pH·pW·C] (reference token order: f, h, w)."""
        p, pf = self.cfg.patch_size, self.cfg.f_patch_size
        b, c, f, h, w = x.shape
        x = x.reshape(b, c, f // pf, pf, h // p, p, w // p, p)
        # (b, f/pf, h/p, w/p, pf, p, p, c)
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
        return x.reshape(b, (f // pf) * (h // p) * (w // p), pf * p * p * c)

    def unpatchify(self, tokens: jnp.ndarray, f: int, h: int, w: int) -> jnp.ndarray:
        p, pf = self.cfg.patch_size, self.cfg.f_patch_size
        c = self.cfg.in_channels
        b = tokens.shape[0]
        n = (f // pf) * (h // p) * (w // p)
        x = tokens[:, :n].reshape(b, f // pf, h // p, w // p, pf, p, p, c)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # (b, c, f/pf, pf, h/p, p, w/p, p)
        return x.reshape(b, c, f, h, w)

    # -- forward -----------------------------------------------------------------

    def __call__(
        self,
        x: jnp.ndarray,          # [B, C, F, H, W] latents
        t: jnp.ndarray,          # [B] in [0, 1] — already (1000-t)/1000 per contract
        cap_feats: jnp.ndarray,  # [B, Lc, cap_feat_dim], Lc a multiple of 32
        cap_mask: Optional[jnp.ndarray] = None,  # [B, Lc] bool (batch padding only)
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, c, f, h, w = x.shape
        lc = cap_feats.shape[1]
        assert lc % SEQ_MULTI_OF == 0, "caption bucket must be a 32-multiple"

        adaln = self.t_embedder(t.astype(jnp.float32) * cfg.t_scale)

        tokens = self.x_embedder(self.patchify(x).astype(self.dtype))
        n = tokens.shape[1]
        n_pad = (-n) % SEQ_MULTI_OF
        if n_pad:
            pad = jnp.broadcast_to(
                self.x_pad_token.value.astype(self.dtype), (b, n_pad, cfg.dim)
            )
            tokens = jnp.concatenate([tokens, pad], axis=1)
        n_tot = n + n_pad

        (x_cos, x_sin, c_cos, c_sin, u_cos, u_sin) = self._pos_tables(
            h // cfg.patch_size, w // cfg.patch_size, n_tot, lc
        )

        # Noise refiner over image tokens (pad slots attended, like the reference).
        x_mask = None
        for blk in self.noise_refiner:
            tokens = blk(tokens, x_mask, x_cos, x_sin, adaln)

        cap = self.cap_embedder_linear(
            self.cap_embedder_norm(cap_feats.astype(self.dtype))
        )
        # cap_mask marks real caption tokens; bucket-padding slots take the
        # learned pad token but stay *attended* — the reference masks only
        # cross-batch padding (engine runs per-sample buckets, so none here).
        if cap_mask is not None:
            cap = jnp.where(
                cap_mask[..., None], cap, self.cap_pad_token.value.astype(self.dtype)
            )
        for blk in self.context_refiner:
            cap = blk(cap, None, c_cos, c_sin)

        unified = jnp.concatenate([tokens, cap], axis=1)
        for blk in self.layers:
            unified = blk(unified, None, u_cos, u_sin, adaln)

        out = self.final_layer(unified[:, :n_tot], adaln)
        return self.unpatchify(out, f, h, w)


# ------------------------------------------------------------------------------
# Control variant (ControlNet-in-one-model)
# ------------------------------------------------------------------------------


@dataclasses.dataclass
class ZImageControlConfig(ZImageConfig):
    """Reference ``src/transformer/zimage/control/model.py:108``
    (ZImageControlTransformer2DModel @register_to_config defaults)."""

    control_layers_places: Tuple[int, ...] = tuple(range(0, 30, 2))
    control_refiner_layers_places: Tuple[int, ...] = (0, 1)
    control_in_dim: int = 33
    add_control_noise_refiner: bool = True

    @classmethod
    def from_dict(cls, cfg: dict) -> "ZImageControlConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        if "all_patch_size" in cfg:
            kw["patch_size"] = int(cfg["all_patch_size"][0])
        if "all_f_patch_size" in cfg:
            kw["f_patch_size"] = int(cfg["all_f_patch_size"][0])
        for key in ("axes_dims", "axes_lens", "control_layers_places",
                    "control_refiner_layers_places"):
            if key in kw and kw[key] is not None:
                kw[key] = tuple(kw[key])
        return cls(**kw)


class ZImageControlBlock(ZImageBlock):
    """Control-branch block (control/model.py:45): block 0 projects the
    control stream onto the host stream (zero-init before_proj), every block
    emits a zero-init after_proj hint."""

    def __init__(self, cfg, first: bool, *, dtype, param_dtype, rngs: nnx.Rngs):
        super().__init__(cfg, modulation=True, dtype=dtype,
                         param_dtype=param_dtype, rngs=rngs)
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.before_proj = Linear(cfg.dim, cfg.dim, **kw) if first else None
        self.after_proj = Linear(cfg.dim, cfg.dim, **kw)


@transformer_registry.register(
    "zimage.control", aliases=("ZImageControlTransformer2DModel",))
class ZImageControlTransformer2DModel(ZImageTransformer2DModel):
    """Z-Image control: a ControlNet-style branch inside the model —
    control tokens run their own refiner + layer chain whose zero-init
    ``after_proj`` hints are added into the host stream at
    ``control_layers_places`` × ``control_context_scale``
    (control/model.py:553 forward, :613 refiner hints, :747 layer hints)."""

    config_class = ZImageControlConfig

    def __init__(self, cfg: Optional[ZImageControlConfig] = None, *,
                 dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        cfg = cfg or ZImageControlConfig()
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        patch_dim = cfg.f_patch_size * cfg.patch_size**2 * cfg.control_in_dim
        self.control_x_embedder = Linear(patch_dim, cfg.dim, use_bias=True, **kw)
        self.control_layers = nnx.List([
            ZImageControlBlock(cfg, first=(i == 0), **kw)
            for i in range(len(cfg.control_layers_places))
        ])
        self.control_noise_refiner = (
            nnx.List([
                ZImageControlBlock(cfg, first=(i == 0), **kw)
                for i in range(cfg.n_refiner_layers)
            ]) if cfg.add_control_noise_refiner else None
        )

    def patchify_control(self, x: jnp.ndarray) -> jnp.ndarray:
        p, pf = self.cfg.patch_size, self.cfg.f_patch_size
        b, c, f, h, w = x.shape
        x = x.reshape(b, c, f // pf, pf, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
        return x.reshape(b, (f // pf) * (h // p) * (w // p), pf * p * p * c)

    def __call__(self, x, t, cap_feats, cap_mask=None, control_context=None,
                 control_context_scale: float = 1.0):
        cfg = self.cfg
        if control_context is None:
            return super().__call__(x, t, cap_feats, cap_mask)
        b, c, f, h, w = x.shape
        lc = cap_feats.shape[1]
        assert lc % SEQ_MULTI_OF == 0

        adaln = self.t_embedder(t.astype(jnp.float32) * cfg.t_scale)
        tokens = self.x_embedder(self.patchify(x).astype(self.dtype))
        ctokens = self.control_x_embedder(
            self.patchify_control(control_context).astype(self.dtype))
        n = tokens.shape[1]
        n_pad = (-n) % SEQ_MULTI_OF
        if n_pad:
            pad = jnp.broadcast_to(
                self.x_pad_token.value.astype(self.dtype), (b, n_pad, cfg.dim))
            tokens = jnp.concatenate([tokens, pad], axis=1)
            ctokens = jnp.concatenate([ctokens, pad], axis=1)
        n_tot = n + n_pad

        (x_cos, x_sin, c_cos, c_sin, u_cos, u_sin) = self._pos_tables(
            h // cfg.patch_size, w // cfg.patch_size, n_tot, lc)

        scale = jnp.asarray(control_context_scale, jnp.float32).astype(self.dtype)

        # --- refiner stage with control hints (forward_control_2_0_refiner) ---
        if self.control_noise_refiner is not None:
            cr = ctokens
            refiner_hints = []
            for i, blk in enumerate(self.control_noise_refiner):
                if blk.before_proj is not None:
                    cr = blk.before_proj(cr) + tokens
                cr = ZImageBlock.__call__(blk, cr, None, x_cos, x_sin, adaln)
                refiner_hints.append(blk.after_proj(cr))
            ctokens = cr
            mapping = {p: i for i, p in enumerate(cfg.control_refiner_layers_places)}
            for i, blk in enumerate(self.noise_refiner):
                tokens = blk(tokens, None, x_cos, x_sin, adaln)
                if i in mapping:
                    tokens = tokens + refiner_hints[mapping[i]] * scale
        else:
            for blk in self.noise_refiner:
                tokens = blk(tokens, None, x_cos, x_sin, adaln)

        cap = self.cap_embedder_linear(
            self.cap_embedder_norm(cap_feats.astype(self.dtype)))
        if cap_mask is not None:
            cap = jnp.where(cap_mask[..., None], cap,
                            self.cap_pad_token.value.astype(self.dtype))
        for blk in self.context_refiner:
            cap = blk(cap, None, c_cos, c_sin)

        unified = jnp.concatenate([tokens, cap], axis=1)

        # --- control layer chain over [control ‖ cap] (forward_control_2_0_layers)
        cu = jnp.concatenate([ctokens, cap], axis=1)
        hints = []
        for blk in self.control_layers:
            if blk.before_proj is not None:
                cu = blk.before_proj(cu) + unified
            cu = ZImageBlock.__call__(blk, cu, None, u_cos, u_sin, adaln)
            hints.append(blk.after_proj(cu))

        mapping = {p: i for i, p in enumerate(cfg.control_layers_places)}
        for i, blk in enumerate(self.layers):
            unified = blk(unified, None, u_cos, u_sin, adaln)
            if i in mapping:
                unified = unified + hints[mapping[i]] * scale

        out = self.final_layer(unified[:, :n_tot], adaln)
        return self.unpatchify(out, f, h, w)
