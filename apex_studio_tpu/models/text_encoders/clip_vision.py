"""CLIP vision tower (ViT-H/14 class) in JAX/NNX.

Counterpart of the reference's CLIP helper (``src/helpers/clip.py:20``): Wan
i2v conditions cross-attention on the penultimate hidden states of a CLIP
vision encoder (257 tokens × 1280). Returns hidden_states[-2] by default.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear
from apex_studio_tpu.models.registry import text_encoder_registry
from apex_studio_tpu.models.text_encoders.clip import CLIPLayer, CLIPTextConfig

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass
class CLIPVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"  # ViT-H uses exact gelu

    @classmethod
    def from_dict(cls, cfg: dict) -> "CLIPVisionConfig":
        if "vision_config" in cfg:
            cfg = cfg["vision_config"]
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@text_encoder_registry.register(
    "CLIPVisionModel", aliases=("CLIPVisionModelWithProjection", "clip_vision")
)
class CLIPVisionEncoder(nnx.Module):
    config_class = CLIPVisionConfig

    def __init__(self, cfg: CLIPVisionConfig, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = dtype
        d = cfg.hidden_size
        init = nnx.initializers.normal(0.02)
        # Patch conv ≡ Linear over flattened patches (kernel stride = patch).
        self.patch_embedding = Linear(
            3 * cfg.patch_size**2, d, use_bias=False, dtype=dtype,
            param_dtype=param_dtype, rngs=rngs,
        )
        self.class_embedding = nnx.Param(init(rngs.params(), (d,), param_dtype))
        self.position_embedding = nnx.Param(
            init(rngs.params(), (cfg.num_patches + 1, d), param_dtype)
        )
        self.pre_layrnorm = LayerNorm(d, eps=cfg.layer_norm_eps, rngs=rngs)
        text_like = CLIPTextConfig(
            hidden_size=d, intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            layer_norm_eps=cfg.layer_norm_eps, hidden_act=cfg.hidden_act,
        )
        self.layers = nnx.List(
            [CLIPLayer(text_like, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_hidden_layers)]
        )
        self.post_layernorm = LayerNorm(d, eps=cfg.layer_norm_eps, rngs=rngs)

    def _patchify(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """[B,3,H,W] → [B, n_patches, 3·p²] in conv-weight flatten order (C,ph,pw)."""
        p = self.cfg.patch_size
        b, c, h, w = pixel_values.shape
        x = pixel_values.reshape(b, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5)
        return x.reshape(b, (h // p) * (w // p), c * p * p)

    def __call__(self, pixel_values: jnp.ndarray, penultimate: bool = True) -> jnp.ndarray:
        """pixel_values: [B,3,224,224], CLIP-normalized. Returns hidden states
        [B, 257, D] — penultimate layer output by default (Wan's conditioning)."""
        b = pixel_values.shape[0]
        patches = self.patch_embedding(self._patchify(pixel_values.astype(self.dtype)))
        cls = jnp.broadcast_to(
            self.class_embedding.value.astype(self.dtype), (b, 1, self.cfg.hidden_size)
        )
        x = jnp.concatenate([cls, patches], axis=1)
        x = x + self.position_embedding.value.astype(self.dtype)
        x = self.pre_layrnorm(x)
        n_run = len(self.layers) - (1 if penultimate else 0)
        for layer in list(self.layers)[:n_run]:
            x = layer(x, None)
        if not penultimate:
            x = self.post_layernorm(x)
        return x


def preprocess_clip_image(image: np.ndarray, size: int = 224) -> np.ndarray:
    """HWC uint8 RGB → [1,3,size,size] CLIP-normalized float32."""
    import cv2

    resized = cv2.resize(image, (size, size), interpolation=cv2.INTER_CUBIC)
    arr = resized.astype(np.float32) / 255.0
    arr = (arr - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    return arr.transpose(2, 0, 1)[None].astype(np.float32)
