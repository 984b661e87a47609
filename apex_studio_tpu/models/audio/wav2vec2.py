"""Wav2Vec2 speech encoder in JAX/NNX.

Behavioral counterpart of the HF ``Wav2Vec2Model`` used by the reference's
audio-driven Wan engines (``src/helpers/wan/multitalk.py:30``
Wav2Vec2ModelMultitalk; ``src/engine/wan/s2v.py:219`` audio_encoder helper):
7-layer strided conv feature extractor (group-norm or per-layer layer-norm
variants), feature projection, weight-normalized conv positional embedding,
and a post-norm or stable-pre-norm transformer encoder. Returns every hidden
state — the diffusion models consume stacked per-layer features.

TPU notes: convs run NLC with HWIO-kernels on the lane axis; the
weight-normalized positional conv keeps the checkpoint's (g, v)
parametrization and normalizes at call time, so loading stays a pure rename.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import LayerNorm, Linear
from apex_studio_tpu.models.registry import text_encoder_registry
from apex_studio_tpu.ops import attention as attention_op


@dataclasses.dataclass
class Wav2Vec2Config:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    feat_extract_norm: str = "group"      # "group" | "layer"
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_dict(cls, cfg: dict) -> "Wav2Vec2Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in cfg.items() if k in known}
        for key in ("conv_dim", "conv_kernel", "conv_stride"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)


class _Conv1d(nnx.Module):
    """NLC conv1d; kernel stored (K, Cin/groups, Cout)."""

    def __init__(self, cin, cout, kernel, stride=1, padding=0, groups=1,
                 use_bias=True, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(
            init(rngs.params(), (kernel, cin // groups, cout), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32)) if use_bias else None
        self.stride, self.padding, self.groups = stride, padding, groups

    def __call__(self, x):  # [B, L, C]
        y = jax.lax.conv_general_dilated(
            x, self.kernel.value, window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups)
        if self.bias is not None:
            y = y + self.bias.value
        return y


class _GroupNormCh(nnx.Module):
    """GroupNorm over the channel axis of NLC tensors (HF conv feature
    extractor uses num_groups == num_channels → per-channel instance norm)."""

    def __init__(self, channels: int, groups: int, eps: float = 1e-5, *,
                 rngs: nnx.Rngs):
        self.weight = nnx.Param(jnp.ones((channels,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((channels,), jnp.float32))
        self.groups, self.eps = groups, eps

    def __call__(self, x):  # [B, L, C]
        b, l, c = x.shape
        g = self.groups
        xg = x.astype(jnp.float32).reshape(b, l, g, c // g)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        return (xg.reshape(b, l, c) * self.weight.value + self.bias.value
                ).astype(x.dtype)


class _ConvLayer(nnx.Module):
    def __init__(self, cfg: Wav2Vec2Config, i: int, *, rngs: nnx.Rngs):
        cin = 1 if i == 0 else cfg.conv_dim[i - 1]
        cout = cfg.conv_dim[i]
        self.conv = _Conv1d(cin, cout, cfg.conv_kernel[i], cfg.conv_stride[i],
                            use_bias=cfg.feat_extract_norm == "layer", rngs=rngs)
        if i == 0 and cfg.feat_extract_norm == "group":
            self.layer_norm = _GroupNormCh(cout, cout, rngs=rngs)
        elif cfg.feat_extract_norm == "layer":
            self.layer_norm = LayerNorm(cout, eps=cfg.layer_norm_eps, rngs=rngs)
        else:
            self.layer_norm = None

    def __call__(self, x):
        x = self.conv(x)
        if self.layer_norm is not None:
            x = self.layer_norm(x)
        return nnx.gelu(x, approximate=False)


class _EncoderLayer(nnx.Module):
    def __init__(self, cfg: Wav2Vec2Config, *, rngs: nnx.Rngs):
        d = cfg.hidden_size
        kw = dict(use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32,
                  rngs=rngs)
        self.q_proj = Linear(d, d, **kw)
        self.k_proj = Linear(d, d, **kw)
        self.v_proj = Linear(d, d, **kw)
        self.out_proj = Linear(d, d, **kw)
        self.layer_norm = LayerNorm(d, eps=cfg.layer_norm_eps, rngs=rngs)
        self.intermediate_dense = Linear(d, cfg.intermediate_size, **kw)
        self.output_dense = Linear(cfg.intermediate_size, d, **kw)
        self.final_layer_norm = LayerNorm(d, eps=cfg.layer_norm_eps, rngs=rngs)
        self.heads = cfg.num_attention_heads
        self.head_dim = d // cfg.num_attention_heads
        self.stable = cfg.do_stable_layer_norm

    def _attn(self, x, mask):
        b, s, d = x.shape
        q = self.q_proj(x).reshape(b, s, self.heads, self.head_dim)
        k = self.k_proj(x).reshape(b, s, self.heads, self.head_dim)
        v = self.v_proj(x).reshape(b, s, self.heads, self.head_dim)
        out = attention_op(q, k, v, mask=mask).reshape(b, s, d)
        return self.out_proj(out)

    def _ff(self, x):
        return self.output_dense(nnx.gelu(self.intermediate_dense(x),
                                          approximate=False))

    def __call__(self, x, mask=None):
        if self.stable:
            x = x + self._attn(self.layer_norm(x), mask)
            x = x + self._ff(self.final_layer_norm(x))
        else:
            x = self.layer_norm(x + self._attn(x, mask))
            x = self.final_layer_norm(x + self._ff(x))
        return x


@text_encoder_registry.register("Wav2Vec2Model", aliases=("wav2vec2",))
class Wav2Vec2Model(nnx.Module):
    config_class = Wav2Vec2Config

    def __init__(self, cfg: Wav2Vec2Config, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.cfg = cfg
        self.dtype = jnp.float32  # audio features stay f32
        d = cfg.hidden_size
        self.conv_layers = nnx.List(
            [_ConvLayer(cfg, i, rngs=rngs)
             for i in range(len(cfg.conv_dim))])
        self.fp_layer_norm = LayerNorm(cfg.conv_dim[-1], eps=cfg.layer_norm_eps,
                                       rngs=rngs)
        self.fp_projection = Linear(cfg.conv_dim[-1], d, use_bias=True,
                                    dtype=jnp.float32, param_dtype=jnp.float32,
                                    rngs=rngs)
        # weight-normalized positional conv: weight = g · v/‖v‖ (per kernel tap)
        k = cfg.num_conv_pos_embeddings
        g = cfg.num_conv_pos_embedding_groups
        init = nnx.initializers.lecun_normal()
        self.pos_conv_g = nnx.Param(jnp.ones((1, 1, k), jnp.float32))
        self.pos_conv_v = nnx.Param(
            init(rngs.params(), (d, d // g, k), jnp.float32))
        self.pos_conv_bias = nnx.Param(jnp.zeros((d,), jnp.float32))
        self.enc_layer_norm = LayerNorm(d, eps=cfg.layer_norm_eps, rngs=rngs)
        self.layers = nnx.List(
            [_EncoderLayer(cfg, rngs=rngs) for _ in range(cfg.num_hidden_layers)])

    def _pos_conv(self, x):
        cfg = self.cfg
        k = cfg.num_conv_pos_embeddings
        v = self.pos_conv_v.value  # (Cout, Cin/g, K) torch layout
        norm = jnp.sqrt((v * v).sum(axis=(0, 1), keepdims=True) + 1e-12)
        w = (self.pos_conv_g.value * v / norm)
        w = jnp.transpose(w, (2, 1, 0))  # → (K, Cin/g, Cout)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=((k // 2, k // 2),),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=cfg.num_conv_pos_embedding_groups)
        y = y + self.pos_conv_bias.value
        if k % 2 == 0:  # SamePadLayer removes the trailing element
            y = y[:, :-1]
        return nnx.gelu(y, approximate=False)

    def extract_features(self, input_values: jnp.ndarray) -> jnp.ndarray:
        """[B, samples] raw waveform → [B, L, conv_dim[-1]] conv features."""
        x = input_values.astype(jnp.float32)[..., None]
        for layer in self.conv_layers:
            x = layer(x)
        return x

    def encode_features(self, features: jnp.ndarray,
                        mask: Optional[jnp.ndarray] = None):
        """Conv features → list of hidden states (embedding + each layer)."""
        x = self.fp_projection(self.fp_layer_norm(features))
        x = x + self._pos_conv(x)
        if not self.cfg.do_stable_layer_norm:
            x = self.enc_layer_norm(x)
        states = [x]
        for layer in self.layers:
            x = layer(x, mask)
            states.append(x)
        if self.cfg.do_stable_layer_norm:
            x = self.enc_layer_norm(x)
            states[-1] = x
        return states

    def __call__(self, input_values: jnp.ndarray,
                 seq_len: Optional[int] = None) -> List[jnp.ndarray]:
        """Waveform → all hidden states; optionally time-interpolated to
        ``seq_len`` before the encoder (multitalk.py:22 linear_interpolation
        with align_corners=True)."""
        feats = self.extract_features(input_values)
        if seq_len is not None and feats.shape[1] != seq_len:
            feats = interpolate_linear(feats, seq_len)
        return self.encode_features(feats)


def interpolate_linear(features: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=True) on [B, L, C]."""
    b, l, c = features.shape
    if l == out_len:
        return features
    if l == 1:
        return jnp.broadcast_to(features, (b, out_len, c))
    pos = jnp.linspace(0.0, l - 1.0, out_len)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, l - 1)
    hi = jnp.clip(lo + 1, 0, l - 1)
    w = (pos - lo.astype(jnp.float32))[None, :, None]
    return features[:, lo] * (1 - w) + features[:, hi] * w
