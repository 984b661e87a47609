"""HunyuanImage 2.1 DiT in JAX/NNX.

Behavioral counterpart of the reference's
``src/transformer/hunyuanimage/base/model.py:584``
(HunyuanImageTransformer2DModel): the HunyuanVideo dual/single-stream
architecture operating on 2D latents — 20 dual + 40 single blocks at dim 3584
(28 heads x 128), Qwen2.5-VL text tokens refined by a 2-block token refiner,
optional ByT5 glyph branch (model.py:680 context_embedder_2, a
norm+3-linear GELU projection), 2-axis RoPE (64, 64) theta 256 on image
tokens, optional distilled-guidance embedding and meanflow ``timestep_r``
(model.py:122 HunyuanImageCombinedTimeGuidanceEmbedding — time and time_r
embeddings averaged).

TPU notes: the reference reorders text tokens per-sample into
[valid byt5, valid mllm, invalid byt5, invalid mllm] (model.py:858) — a
data-dependent gather. Attention with a key-padding mask is invariant to the
order of valid keys (no RoPE is applied to text), so we keep the static
[byt5, mllm] packing and carry the combined mask instead; same math, no
dynamic shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.hunyuanvideo import (
    HunyuanVideoDualBlock,
    HunyuanVideoSingleBlock,
)
from apex_studio_tpu.models.transformers.hunyuanvideo15 import TokenRefiner
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import precompute_axial_freqs


@dataclasses.dataclass
class HunyuanImageConfig:
    in_channels: int = 64
    out_channels: int = 64
    num_attention_heads: int = 28
    attention_head_dim: int = 128
    num_layers: int = 20
    num_single_layers: int = 40
    num_refiner_layers: int = 2
    mlp_ratio: float = 4.0
    patch_size: Tuple[int, int] = (1, 1)
    guidance_embeds: bool = False
    text_embed_dim: int = 3584
    text_embed_2_dim: Optional[int] = None
    rope_theta: float = 256.0
    rope_axes_dim: Tuple[int, ...] = (64, 64)
    use_meanflow: bool = False

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_dict(cls, cfg: dict) -> "HunyuanImageConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        for key in ("patch_size", "rope_axes_dim"):
            if key in kw and isinstance(kw[key], (list, tuple)):
                kw[key] = tuple(kw[key])
        if isinstance(kw.get("patch_size"), int):
            kw["patch_size"] = (kw["patch_size"], kw["patch_size"])
        return cls(**kw)


@transformer_registry.register(
    "hunyuanimage.base", aliases=("hunyuanimage", "HunyuanImageTransformer2DModel")
)
class HunyuanImageTransformer2DModel(nnx.Module):
    config_class = HunyuanImageConfig

    def __init__(self, cfg: HunyuanImageConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        ph, pw = cfg.patch_size
        self.x_embedder = Linear(cfg.in_channels * ph * pw, d, **kw)
        # Duck-typed config: TokenRefiner reads dim/mlp_ratio/heads/head_dim/
        # text_embed_dim/num_refiner_layers (model.py:291 HunyuanImageTokenRefiner).
        self.context_embedder = TokenRefiner(cfg, dtype=dtype,
                                             param_dtype=param_dtype, rngs=rngs)
        if cfg.text_embed_2_dim is not None:
            self.byt5_norm = LayerNorm(cfg.text_embed_2_dim, eps=1e-5, rngs=rngs)
            self.byt5_linear_1 = Linear(cfg.text_embed_2_dim, 2048, **kw)
            self.byt5_linear_2 = Linear(2048, 2048, **kw)
            self.byt5_linear_3 = Linear(2048, d, **kw)
        else:
            self.byt5_norm = None
        self.time_linear_1 = Linear(256, d, **kw)
        self.time_linear_2 = Linear(d, d, **kw)
        if cfg.use_meanflow:
            self.time_r_linear_1 = Linear(256, d, **kw)
            self.time_r_linear_2 = Linear(d, d, **kw)
        else:
            self.time_r_linear_1 = self.time_r_linear_2 = None
        if cfg.guidance_embeds:
            self.guidance_linear_1 = Linear(256, d, **kw)
            self.guidance_linear_2 = Linear(d, d, **kw)
        else:
            self.guidance_linear_1 = self.guidance_linear_2 = None
        self.transformer_blocks = nnx.List(
            [HunyuanVideoDualBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)]
        )
        self.single_transformer_blocks = nnx.List(
            [HunyuanVideoSingleBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_single_layers)]
        )
        self.norm_out_linear = Linear(d, 2 * d, **kw)
        self.proj_out = Linear(d, ph * pw * cfg.out_channels, **kw)

    @staticmethod
    def sharding_rules(cfg: "HunyuanImageConfig"):
        from apex_studio_tpu.models.transformers.hunyuanvideo import (
            HunyuanVideoTransformer3DModel,
        )

        return HunyuanVideoTransformer3DModel.sharding_rules(cfg)

    def rope_tables(self, h_tok: int, w_tok: int):
        ids = np.stack(
            np.meshgrid(np.arange(h_tok), np.arange(w_tok), indexing="ij"), axis=-1
        ).reshape(1, -1, 2)
        cos, sin = precompute_axial_freqs(ids, self.cfg.rope_axes_dim, self.cfg.rope_theta)
        return cos[:, :, None, :], sin[:, :, None, :]

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c, h, w = x.shape
        ph, pw = self.cfg.patch_size
        x = x.reshape(b, c, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 1, 3, 5)
        return x.reshape(b, (h // ph) * (w // pw), c * ph * pw)

    def unpatchify(self, tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b = tokens.shape[0]
        ph, pw = self.cfg.patch_size
        c = self.cfg.out_channels
        x = tokens.reshape(b, h // ph, w // pw, c, ph, pw)
        x = x.transpose(0, 3, 1, 4, 2, 5)
        return x.reshape(b, c, h, w)

    def _mlp2(self, l1, l2, vec):
        return l2(nnx.silu(l1(vec.astype(self.dtype))))

    def __call__(
        self,
        x: jnp.ndarray,                 # [B, C, H, W] latents
        t: jnp.ndarray,                 # [B] timestep (0..1000)
        text: jnp.ndarray,              # [B, Lt, text_embed_dim] mllm features
        text_mask: Optional[jnp.ndarray] = None,    # [B, Lt] 1=real
        text_2: Optional[jnp.ndarray] = None,       # [B, L2, byt5_dim] glyphs
        text_2_mask: Optional[jnp.ndarray] = None,  # [B, L2]
        guidance: Optional[jnp.ndarray] = None,     # [B] distilled guidance ×1000
        t_r: Optional[jnp.ndarray] = None,          # [B] meanflow end timestep
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, _, hh, ww = x.shape

        t_freq = timestep_embedding(t.astype(jnp.float32), 256, flip_sin_to_cos=True)
        temb = self._mlp2(self.time_linear_1, self.time_linear_2, t_freq)
        if self.time_r_linear_1 is not None and t_r is not None:
            r_freq = timestep_embedding(t_r.astype(jnp.float32), 256,
                                        flip_sin_to_cos=True)
            temb = (temb + self._mlp2(self.time_r_linear_1, self.time_r_linear_2,
                                      r_freq)) / 2.0
        if self.guidance_linear_1 is not None and guidance is not None:
            g_freq = timestep_embedding(guidance.astype(jnp.float32), 256,
                                        flip_sin_to_cos=True)
            temb = temb + self._mlp2(self.guidance_linear_1, self.guidance_linear_2,
                                     g_freq)

        img = self.x_embedder(self.patchify(x).astype(self.dtype))
        txt = self.context_embedder(text.astype(self.dtype), t, text_mask)
        if self.byt5_norm is not None and text_2 is not None:
            y = self.byt5_norm(text_2.astype(self.dtype))
            y = self.byt5_linear_2(nnx.gelu(self.byt5_linear_1(y), approximate=False))
            y = self.byt5_linear_3(nnx.gelu(y, approximate=False))
            txt = jnp.concatenate([y, txt], axis=1)
            if text_mask is not None:
                t2m = (text_2_mask if text_2_mask is not None
                       else jnp.ones(y.shape[:2], jnp.int32))
                text_mask = jnp.concatenate(
                    [t2m.astype(text_mask.dtype), text_mask], axis=1)

        rope_cos, rope_sin = self.rope_tables(hh // cfg.patch_size[0],
                                              ww // cfg.patch_size[1])
        n_img = img.shape[1]
        mask = None
        if text_mask is not None:
            mask = jnp.concatenate(
                [jnp.ones((b, n_img), bool), text_mask.astype(bool)], axis=1)

        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, None, 0, rope_cos, rope_sin, mask)
        xseq = jnp.concatenate([img, txt], axis=1)
        for blk in self.single_transformer_blocks:
            xseq = blk(xseq, n_img, temb, None, 0, rope_cos, rope_sin, mask)
        img = xseq[:, :n_img]

        scale, shift = jnp.split(self.norm_out_linear(nnx.silu(temb))[:, None, :],
                                 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        return self.unpatchify(self.proj_out(img), hh, ww)
