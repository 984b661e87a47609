"""SigLIP vision tower (so400m/14-384 class) in JAX/NNX.

Counterpart of the reference's HunyuanVideo 1.5 image-encoder helper
(``engine/hunyuanvideo15/shared/__init__.py:301`` — ``image_encoder(**image)
.last_hidden_state``): i2v conditions the DiT's third text stream on SigLIP's
post-layernormed last hidden states (729 tokens × 1152).

Differences from CLIP-ViT: no class token, learned position embeddings over
patches only, biased patch projection, gelu-tanh MLPs, and the
``last_hidden_state`` is taken AFTER the final layernorm.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear
from apex_studio_tpu.models.registry import text_encoder_registry
from apex_studio_tpu.models.text_encoders.clip import CLIPLayer, CLIPTextConfig

SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass
class SiglipVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"
    use_head: bool = False  # MAP attention-pooling head (get_image_features)

    @classmethod
    def from_dict(cls, cfg: dict) -> "SiglipVisionConfig":
        if "vision_config" in cfg:
            cfg = cfg["vision_config"]
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class SiglipMAPHead(nnx.Module):
    """SiglipMultiheadAttentionPoolingHead (transformers modeling_siglip):
    a learnable probe attends over the patch tokens, then a residual
    layernorm+MLP; used by ``get_image_features`` — the cosmos guardrail's
    frame embedding (reference postprocess/cosmos/guardrail.py:505)."""

    def __init__(self, cfg: SiglipVisionConfig, *, dtype, param_dtype,
                 rngs: nnx.Rngs):
        d = cfg.hidden_size
        init = nnx.initializers.normal(0.02)
        self.probe = nnx.Param(init(rngs.params(), (1, 1, d), param_dtype))
        self.in_proj_weight = nnx.Param(
            nnx.initializers.lecun_normal()(rngs.params(), (3 * d, d),
                                            param_dtype))
        self.in_proj_bias = nnx.Param(jnp.zeros((3 * d,), param_dtype))
        self.out_proj = Linear(d, d, dtype=dtype, param_dtype=param_dtype,
                               rngs=rngs)
        self.layernorm = LayerNorm(d, eps=cfg.layer_norm_eps, rngs=rngs)
        self.fc1 = Linear(d, cfg.intermediate_size, dtype=dtype,
                          param_dtype=param_dtype, rngs=rngs)
        self.fc2 = Linear(cfg.intermediate_size, d, dtype=dtype,
                          param_dtype=param_dtype, rngs=rngs)
        self.heads = cfg.num_attention_heads

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        b, n, d = x.shape
        hd = d // self.heads
        wq, wk, wv = jnp.split(self.in_proj_weight.value.astype(x.dtype), 3,
                               axis=0)
        bq, bk, bv = jnp.split(self.in_proj_bias.value.astype(x.dtype), 3,
                               axis=0)
        probe = self.probe.value.astype(x.dtype)
        q = jnp.broadcast_to(probe @ wq.T + bq, (b, 1, d))
        k = x @ wk.T + bk
        v = x @ wv.T + bv
        o = jax.nn.dot_product_attention(
            q.reshape(b, 1, self.heads, hd), k.reshape(b, n, self.heads, hd),
            v.reshape(b, n, self.heads, hd))
        h = self.out_proj(o.reshape(b, 1, d))
        h = h + self.fc2(nnx.gelu(self.fc1(self.layernorm(h)),
                                  approximate=True))
        return h[:, 0]


@text_encoder_registry.register(
    "SiglipVisionModel", aliases=("SiglipVisionModelWithProjection", "siglip",
                                  "Siglip2VisionModel")
)
class SiglipVisionEncoder(nnx.Module):
    config_class = SiglipVisionConfig

    def __init__(self, cfg: SiglipVisionConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.hidden_size
        init = nnx.initializers.normal(0.02)
        self.patch_embedding = Linear(
            3 * cfg.patch_size**2, d, use_bias=True, dtype=dtype,
            param_dtype=param_dtype, rngs=rngs,
        )
        self.position_embedding = nnx.Param(
            init(rngs.params(), (cfg.num_patches, d), param_dtype)
        )
        text_like = CLIPTextConfig(
            hidden_size=d, intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            layer_norm_eps=cfg.layer_norm_eps, hidden_act="gelu_tanh",
        )
        self.layers = nnx.List(
            [CLIPLayer(text_like, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_hidden_layers)]
        )
        self.post_layernorm = LayerNorm(d, eps=cfg.layer_norm_eps, rngs=rngs)
        self.head = (SiglipMAPHead(cfg, dtype=dtype, param_dtype=param_dtype,
                                   rngs=rngs) if cfg.use_head else None)

    def _patchify(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        p = self.cfg.patch_size
        b, c, h, w = pixel_values.shape
        # torch's strided Conv2d (kernel=stride=p, no padding) silently drops
        # the bottom/right remainder (e.g. so400m-patch14 on 384px uses only
        # 378px → 27×27 patches); crop to match.
        h, w = (h // p) * p, (w // p) * p
        pixel_values = pixel_values[:, :, :h, :w]
        x = pixel_values.reshape(b, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5)
        return x.reshape(b, (h // p) * (w // p), c * p * p)

    def __call__(self, pixel_values: jnp.ndarray,
                 pooled: bool = False) -> jnp.ndarray:
        """pixel_values [B,3,384,384] normalized to ±1 → [B, 729, 1152]
        (post-layernormed last hidden state, the transformers contract).
        ``pooled=True`` routes through the MAP head (get_image_features)."""
        x = self.patch_embedding(self._patchify(pixel_values.astype(self.dtype)))
        x = x + self.position_embedding.value.astype(self.dtype)
        for layer in self.layers:
            x = layer(x, None)
        x = self.post_layernorm(x)
        if pooled:
            if self.head is None:
                raise ValueError("config.use_head=False: no MAP pooling head")
            return self.head(x)
        return x


def preprocess_siglip_image(image: np.ndarray, size: int = 384) -> np.ndarray:
    """HWC uint8 RGB → [1,3,size,size] ±1-normalized float32 (SiglipImageProcessor)."""
    import cv2

    resized = cv2.resize(image, (size, size), interpolation=cv2.INTER_CUBIC)
    arr = resized.astype(np.float32) / 255.0
    arr = (arr - np.asarray(SIGLIP_MEAN, np.float32)) / np.asarray(SIGLIP_STD, np.float32)
    return arr.transpose(2, 0, 1)[None].astype(np.float32)
