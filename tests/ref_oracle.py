"""Import the REFERENCE's vendored torch DiT modules as numeric oracles.

The reference transformer families (``/root/reference/apps/api/src/transformer``)
import a handful of diffusers symbols. diffusers is not installed here, so this
module provides a minimal *faithful* stand-in for exactly the pieces those
models exercise numerically (FeedForward/GELU, FP32LayerNorm, Timesteps/
TimestepEmbedding/PixArtAlphaTextProjection, ConfigMixin plumbing); everything
else (LoRA/PEFT hooks, cache mixins) is inert. The reference's own attention
math (``src/attention/functions.py`` sdpa backend) and efficiency ops run
unmodified — the oracle's numerics are the reference's, not ours.

``import_ref_module("src.transformer.wan.base.model")`` installs the shims,
synthesizes the ``src``/``src.transformer`` parent packages WITHOUT executing
``src/transformer/__init__.py`` (whose auto-discovery would import all ~25
families), and returns the module.
"""

from __future__ import annotations

import importlib
import logging
import math
import sys
import types
from dataclasses import dataclass

import torch
import torch.nn as nn
import torch.nn.functional as F

REF = "/root/reference/apps/api"


# ---------------------------------------------------------------- diffusers


def _get_activation(name: str) -> nn.Module:
    name = name.lower()
    if name == "silu" or name == "swish":
        return nn.SiLU()
    if name == "gelu":
        return nn.GELU()
    if name in ("gelu_tanh", "gelu-approximate"):
        return nn.GELU(approximate="tanh")
    if name == "mish":
        return nn.Mish()
    if name == "relu":
        return nn.ReLU()
    raise ValueError(f"activation {name}")


def get_timestep_embedding(
    timesteps: torch.Tensor,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1,
    scale: float = 1,
    max_period: int = 10000,
) -> torch.Tensor:
    """DDPM sinusoid, matching diffusers.models.embeddings (the reference
    vendors a bit-identical copy at src/transformer/qwenimage/base/model.py:46)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        0, half_dim, dtype=torch.float32, device=timesteps.device
    )
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent).to(timesteps.dtype)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = F.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels: int, flip_sin_to_cos: bool,
                 downscale_freq_shift: float, scale: int = 1):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift
        self.scale = scale

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels, flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift, scale=self.scale)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels: int, time_embed_dim: int, act_fn: str = "silu",
                 out_dim: int = None, post_act_fn=None, cond_proj_dim=None,
                 sample_proj_bias=True):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim, bias=sample_proj_bias)
        self.cond_proj = (nn.Linear(cond_proj_dim, in_channels, bias=False)
                          if cond_proj_dim is not None else None)
        self.act = _get_activation(act_fn)
        out = out_dim if out_dim is not None else time_embed_dim
        self.linear_2 = nn.Linear(time_embed_dim, out, bias=sample_proj_bias)
        self.post_act = _get_activation(post_act_fn) if post_act_fn else None

    def forward(self, sample, condition=None):
        if condition is not None:
            sample = sample + self.cond_proj(condition)
        sample = self.linear_1(sample)
        if self.act is not None:
            sample = self.act(sample)
        sample = self.linear_2(sample)
        if self.post_act is not None:
            sample = self.post_act(sample)
        return sample


class PixArtAlphaTextProjection(nn.Module):
    def __init__(self, in_features, hidden_size, out_features=None,
                 act_fn="gelu_tanh"):
        super().__init__()
        if out_features is None:
            out_features = hidden_size
        self.linear_1 = nn.Linear(in_features, hidden_size, bias=True)
        self.act_1 = _get_activation(act_fn)
        self.linear_2 = nn.Linear(hidden_size, out_features, bias=True)

    def forward(self, caption):
        return self.linear_2(self.act_1(self.linear_1(caption)))


class GELU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int, approximate: str = "none",
                 bias: bool = True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, hidden_states):
        return F.gelu(self.proj(hidden_states), approximate=self.approximate)


class GEGLU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int, bias: bool = True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, hidden_states):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class ApproximateGELU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int, bias: bool = True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


class BaseOutput(dict):
    """Minimal diffusers BaseOutput: attribute + mapping access."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        for k, v in kwargs.items():
            object.__setattr__(self, k, v)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


def _is_torch_version(op, version):
    from packaging.version import Version
    cur = Version(torch.__version__.split("+")[0])
    other = Version(version)
    return {"<": cur < other, "<=": cur <= other, ">": cur > other,
            ">=": cur >= other, "==": cur == other, "!=": cur != other}[op]


def _dispatch_attention_fn(query, key, value, attn_mask=None, dropout_p=0.0,
                           is_causal=False, backend=None, parallel_config=None,
                           **kwargs):
    """diffusers dispatch_attention_fn native path: tensors are [B, S, H, D]."""
    query, key, value = (x.transpose(1, 2) for x in (query, key, value))
    out = F.scaled_dot_product_attention(
        query, key, value, attn_mask=attn_mask, dropout_p=dropout_p,
        is_causal=is_causal)
    return out.transpose(1, 2)


class SwiGLU(nn.Module):
    """diffusers SwiGLU: fused [hidden|gate] projection, hidden * silu(gate)."""

    def __init__(self, dim_in: int, dim_out: int, bias: bool = True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)
        self.activation = nn.SiLU()

    def forward(self, hidden_states):
        hidden_states = self.proj(hidden_states)
        hidden_states, gate = hidden_states.chunk(2, dim=-1)
        return hidden_states * self.activation(gate)


class LinearActivation(nn.Module):
    def __init__(self, dim_in: int, dim_out: int, bias: bool = True,
                 activation: str = "silu"):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.activation = _get_activation(activation)

    def forward(self, hidden_states):
        return self.activation(self.proj(hidden_states))


class FeedForward(nn.Module):
    """diffusers.models.attention.FeedForward with the activation variants the
    reference families use (net.0 = activation(+proj), net.1 = dropout,
    net.2 = linear — the key layout the repo converters expect)."""

    def __init__(self, dim: int, dim_out=None, mult: int = 4, dropout: float = 0.0,
                 activation_fn: str = "geglu", final_dropout: bool = False,
                 inner_dim=None, bias: bool = True):
        super().__init__()
        inner_dim = inner_dim if inner_dim is not None else int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        if activation_fn == "gelu":
            act = GELU(dim, inner_dim, bias=bias)
        elif activation_fn == "gelu-approximate":
            act = GELU(dim, inner_dim, approximate="tanh", bias=bias)
        elif activation_fn == "geglu":
            act = GEGLU(dim, inner_dim, bias=bias)
        elif activation_fn == "linear-silu":
            act = LinearActivation(dim, inner_dim, bias=bias, activation="silu")
        elif activation_fn == "swiglu":
            act = SwiGLU(dim, inner_dim, bias=bias)
        else:
            raise ValueError(activation_fn)
        self.net = nn.ModuleList([act, nn.Dropout(dropout),
                                  nn.Linear(inner_dim, dim_out, bias=bias)])
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, hidden_states, *args, **kwargs):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


class FP32LayerNorm(nn.LayerNorm):
    def forward(self, inputs):
        origin_dtype = inputs.dtype
        return F.layer_norm(
            inputs.float(), self.normalized_shape,
            self.weight.float() if self.weight is not None else None,
            self.bias.float() if self.bias is not None else None,
            self.eps,
        ).to(origin_dtype)


class RMSNorm(nn.Module):
    def __init__(self, dim, eps: float, elementwise_affine: bool = True,
                 bias: bool = False):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim)) if elementwise_affine else None
        self.bias = nn.Parameter(torch.zeros(dim)) if (elementwise_affine and bias) else None

    def forward(self, hidden_states):
        input_dtype = hidden_states.dtype
        variance = hidden_states.to(torch.float32).pow(2).mean(-1, keepdim=True)
        hidden_states = hidden_states.to(torch.float32) * torch.rsqrt(variance + self.eps)
        if self.weight is not None:
            hidden_states = hidden_states.to(input_dtype) * self.weight
            if self.bias is not None:
                hidden_states = hidden_states + self.bias
        else:
            hidden_states = hidden_states.to(input_dtype)
        return hidden_states


class AttnProcessor2_0:
    """diffusers default sdpa processor (subset: no spatial-norm/group-norm
    paths, which none of the reference DiTs use)."""

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, **kwargs):
        residual = hidden_states
        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            batch, channel, h_, w_ = hidden_states.shape
            hidden_states = hidden_states.view(batch, channel,
                                               h_ * w_).transpose(1, 2)
        if getattr(attn, "group_norm", None) is not None:
            hidden_states = attn.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        batch, seq, _ = hidden_states.shape
        query = attn.to_q(hidden_states)
        key = attn.to_k(ctx)
        value = attn.to_v(ctx)
        inner = key.shape[-1]
        head_dim = inner // attn.heads
        query = query.view(batch, -1, attn.heads, head_dim).transpose(1, 2)
        key = key.view(batch, -1, attn.heads, head_dim).transpose(1, 2)
        value = value.view(batch, -1, attn.heads, head_dim).transpose(1, 2)
        if attn.norm_q is not None:
            query = attn.norm_q(query)
        if attn.norm_k is not None:
            key = attn.norm_k(key)
        out = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask, dropout_p=0.0,
            is_causal=False)
        out = out.transpose(1, 2).reshape(batch, -1, attn.heads * head_dim)
        out = out.to(query.dtype)
        out = attn.to_out[0](out)
        out = attn.to_out[1](out)
        if input_ndim == 4:
            out = out.transpose(1, 2).reshape(batch, channel, h_, w_)
        if getattr(attn, "residual_connection", False):
            out = out + residual
        return out


class MochiVaeAttnProcessor2_0:
    """diffusers Mochi-VAE sdpa processor: single-frame inputs bypass
    attention through to_v/to_out; otherwise causal sdpa with l2 qk norm."""

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, **kwargs):
        residual = hidden_states
        is_single_frame = hidden_states.shape[1] == 1

        batch_size, sequence_length, _ = (
            hidden_states.shape if encoder_hidden_states is None
            else encoder_hidden_states.shape)
        if attention_mask is not None:
            attention_mask = attn.prepare_attention_mask(
                attention_mask, sequence_length, batch_size)
            attention_mask = attention_mask.view(
                batch_size, attn.heads, -1, attention_mask.shape[-1])

        if is_single_frame:
            hidden_states = attn.to_v(hidden_states)
            hidden_states = attn.to_out[0](hidden_states)
            hidden_states = attn.to_out[1](hidden_states)
            if attn.residual_connection:
                hidden_states = hidden_states + residual
            return hidden_states / attn.rescale_output_factor

        query = attn.to_q(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)

        inner_dim = key.shape[-1]
        head_dim = inner_dim // attn.heads
        query = query.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        key = key.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        value = value.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        if attn.norm_q is not None:
            query = attn.norm_q(query)
        if attn.norm_k is not None:
            key = attn.norm_k(key)
        out = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask, dropout_p=0.0,
            is_causal=attn.is_causal)
        out = out.transpose(1, 2).reshape(batch_size, -1,
                                          attn.heads * head_dim)
        out = out.to(query.dtype)
        out = attn.to_out[0](out)
        out = attn.to_out[1](out)
        if attn.residual_connection:
            out = out + residual
        return out / attn.rescale_output_factor


class CogVideoXDownsample3D(nn.Module):
    """diffusers.models.downsampling.CogVideoXDownsample3D: optional odd-first
    temporal avg-pool, asymmetric (0,1,0,1) spatial pad, strided 2D conv."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=2,
                 padding=0, compress_time=False):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding)
        self.compress_time = compress_time

    def forward(self, x):
        if self.compress_time:
            batch_size, channels, frames, height, width = x.shape
            x = x.permute(0, 3, 4, 1, 2).reshape(
                batch_size * height * width, channels, frames)
            if x.shape[-1] % 2 == 1:
                x_first, x_rest = x[..., 0], x[..., 1:]
                if x_rest.shape[-1] > 0:
                    x_rest = F.avg_pool1d(x_rest, kernel_size=2, stride=2)
                x = torch.cat([x_first[..., None], x_rest], dim=-1)
            else:
                x = F.avg_pool1d(x, kernel_size=2, stride=2)
            x = x.reshape(batch_size, height, width, channels,
                          x.shape[-1]).permute(0, 3, 4, 1, 2)

        x = F.pad(x, (0, 1, 0, 1), mode="constant", value=0)
        batch_size, channels, frames, height, width = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(
            batch_size * frames, channels, height, width)
        x = self.conv(x)
        x = x.reshape(batch_size, frames, x.shape[1], x.shape[2],
                      x.shape[3]).permute(0, 2, 1, 3, 4)
        return x


class CogVideoXUpsample3D(nn.Module):
    """diffusers.models.upsampling.CogVideoXUpsample3D: nearest 2x upsample
    (odd-first temporal special case under compress_time), then 2D conv."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 padding=1, compress_time=False):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding)
        self.compress_time = compress_time

    def forward(self, inputs):
        if self.compress_time:
            if inputs.shape[2] > 1 and inputs.shape[2] % 2 == 1:
                x_first, x_rest = inputs[:, :, 0], inputs[:, :, 1:]
                x_first = F.interpolate(x_first, scale_factor=2.0)
                x_rest = F.interpolate(x_rest, scale_factor=2.0)
                inputs = torch.cat([x_first[:, :, None, :, :], x_rest], dim=2)
            elif inputs.shape[2] > 1:
                inputs = F.interpolate(inputs, scale_factor=2.0)
            else:
                inputs = inputs.squeeze(2)
                inputs = F.interpolate(inputs, scale_factor=2.0)
                inputs = inputs[:, :, None, :, :]
        else:
            b, c, t, h, w = inputs.shape
            inputs = inputs.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            inputs = F.interpolate(inputs, scale_factor=2.0)
            inputs = inputs.reshape(b, t, *inputs.shape[1:]).permute(
                0, 2, 1, 3, 4)

        b, c, t, h, w = inputs.shape
        inputs = inputs.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        inputs = self.conv(inputs)
        inputs = inputs.reshape(b, t, *inputs.shape[1:]).permute(0, 2, 1, 3, 4)
        return inputs


class _LpNorm(nn.Module):
    """diffusers.models.normalization.LpNorm (used by qk_norm='l2')."""

    def __init__(self, p=2, dim=-1, eps=1e-12):
        super().__init__()
        self.p, self.dim, self.eps = p, dim, eps

    def forward(self, x):
        return F.normalize(x, p=self.p, dim=self.dim, eps=self.eps)


class Attention(nn.Module):
    """Faithful subset of diffusers.models.attention_processor.Attention
    covering the constructor surface the reference DiTs use (to_q/k/v,
    added-kv projections, per-head qk RMSNorm, to_out/to_add_out, processor
    dispatch)."""

    fused_projections = False

    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False, qk_norm=None,
                 added_kv_proj_dim=None, added_proj_bias=True, out_bias=True,
                 out_dim=None, context_pre_only=None, pre_only=False,
                 eps=1e-5, processor=None, scale_qk=True,
                 norm_num_groups=None, residual_connection=False,
                 upcast_softmax=False, upcast_attention=False,
                 is_causal=False, rescale_output_factor=1.0,
                 _from_deprecated_attn_block=False, **_unused):
        super().__init__()
        self.residual_connection = residual_connection
        self.is_causal = is_causal
        self.rescale_output_factor = rescale_output_factor
        self.group_norm = (nn.GroupNorm(num_channels=query_dim,
                                        num_groups=norm_num_groups, eps=eps,
                                        affine=True)
                           if norm_num_groups is not None else None)
        self.inner_dim = out_dim if out_dim is not None else dim_head * heads
        self.heads = out_dim // dim_head if out_dim is not None else heads
        self.query_dim = query_dim
        self.out_dim = out_dim if out_dim is not None else query_dim
        self.context_pre_only = context_pre_only
        self.added_kv_proj_dim = added_kv_proj_dim
        self.pre_only = pre_only
        self.is_cross_attention = cross_attention_dim is not None
        cross_attention_dim = (query_dim if cross_attention_dim is None
                               else cross_attention_dim)

        if qk_norm is None:
            self.norm_q = self.norm_k = None
        elif qk_norm == "l2":
            self.norm_q = _LpNorm(p=2, dim=-1, eps=eps)
            self.norm_k = _LpNorm(p=2, dim=-1, eps=eps)
        elif qk_norm == "rms_norm":
            self.norm_q = RMSNorm(dim_head, eps=eps)
            self.norm_k = RMSNorm(dim_head, eps=eps)
        elif qk_norm == "rms_norm_across_heads":
            self.norm_q = RMSNorm(dim_head * heads, eps=eps)
            self.norm_k = RMSNorm(dim_head * heads, eps=eps)
        elif qk_norm == "layer_norm":
            self.norm_q = nn.LayerNorm(dim_head, eps=eps)
            self.norm_k = nn.LayerNorm(dim_head, eps=eps)
        else:
            raise ValueError(qk_norm)

        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim, self.inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim, self.inner_dim, bias=bias)

        self.add_q_proj = self.add_k_proj = self.add_v_proj = None
        self.norm_added_q = self.norm_added_k = None
        if added_kv_proj_dim is not None:
            self.add_k_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                        bias=added_proj_bias)
            self.add_v_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                        bias=added_proj_bias)
            if context_pre_only is not None:
                self.add_q_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                            bias=added_proj_bias)
            if qk_norm == "rms_norm":
                self.norm_added_q = RMSNorm(dim_head, eps=eps)
                self.norm_added_k = RMSNorm(dim_head, eps=eps)

        if not pre_only:
            self.to_out = nn.ModuleList(
                [nn.Linear(self.inner_dim, self.out_dim, bias=out_bias),
                 nn.Dropout(dropout)])
        if added_kv_proj_dim is not None and context_pre_only is False:
            self.to_add_out = nn.Linear(self.inner_dim, self.out_dim,
                                        bias=out_bias)

        self.processor = processor if processor is not None else AttnProcessor2_0()

    def prepare_attention_mask(self, attention_mask, target_length,
                               batch_size, out_dim=3):
        """diffusers Attention.prepare_attention_mask: pad to target length
        and expand per-head."""
        head_size = self.heads
        if attention_mask is None:
            return attention_mask
        current_length = attention_mask.shape[-1]
        if current_length != target_length:
            attention_mask = F.pad(attention_mask,
                                   (0, target_length - current_length),
                                   value=0.0)
        if out_dim == 3:
            if attention_mask.shape[0] < batch_size * head_size:
                attention_mask = attention_mask.repeat_interleave(
                    head_size, dim=0)
        elif out_dim == 4:
            attention_mask = attention_mask.unsqueeze(1)
            attention_mask = attention_mask.repeat_interleave(head_size, dim=1)
        return attention_mask

    def set_processor(self, processor):
        self.processor = processor

    def get_processor(self):
        return self.processor

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **kwargs):
        return self.processor(self, hidden_states,
                              encoder_hidden_states=encoder_hidden_states,
                              attention_mask=attention_mask, **kwargs)


class AttentionMixin:
    pass


class AttentionProcessor:
    """Base-class placeholder (only used in type hints / isinstance)."""


class SpatialNorm(nn.Module):
    def __init__(self, f_channels, zq_channels):
        super().__init__()
        self.norm_layer = nn.GroupNorm(num_channels=f_channels, num_groups=32,
                                       eps=1e-6, affine=True)
        self.conv_y = nn.Conv2d(zq_channels, f_channels, 1)
        self.conv_b = nn.Conv2d(zq_channels, f_channels, 1)

    def forward(self, f, zq):
        zq = F.interpolate(zq, size=f.shape[-2:], mode="nearest")
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class MochiAttention(nn.Module):
    """Faithful subset of diffusers MochiAttention (asymmetric img/txt dims,
    per-head RMSNorm, optional context output)."""

    def __init__(self, query_dim, added_kv_proj_dim, processor, heads=8,
                 dim_head=64, bias=False, added_proj_bias=True, out_dim=None,
                 out_context_dim=None, out_bias=True, context_pre_only=False,
                 eps=1e-5):
        super().__init__()
        self.inner_dim = out_dim if out_dim is not None else dim_head * heads
        self.out_dim = out_dim if out_dim is not None else query_dim
        self.out_context_dim = (out_context_dim if out_context_dim
                                else added_kv_proj_dim)
        self.context_pre_only = context_pre_only
        self.heads = out_dim // dim_head if out_dim is not None else heads
        self.norm_q = RMSNorm(dim_head, eps, True)
        self.norm_k = RMSNorm(dim_head, eps, True)
        self.norm_added_q = RMSNorm(dim_head, eps, True)
        self.norm_added_k = RMSNorm(dim_head, eps, True)
        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_v = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.add_k_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                    bias=added_proj_bias)
        self.add_v_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                    bias=added_proj_bias)
        if self.context_pre_only is not None:
            self.add_q_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                        bias=added_proj_bias)
        self.to_out = nn.ModuleList(
            [nn.Linear(self.inner_dim, self.out_dim, bias=out_bias),
             nn.Dropout(0.0)])
        if not self.context_pre_only:
            self.to_add_out = nn.Linear(self.inner_dim, self.out_context_dim,
                                        bias=out_bias)
        self.processor = processor

    def forward(self, hidden_states, encoder_hidden_states=None, **kwargs):
        return self.processor(self, hidden_states,
                              encoder_hidden_states=encoder_hidden_states,
                              **kwargs)


class PatchEmbed(nn.Module):
    """diffusers PatchEmbed subset: conv projection, optional LN, no pos embed
    when pos_embed_type is None (the mochi configuration)."""

    def __init__(self, height=224, width=224, patch_size=16, in_channels=3,
                 embed_dim=768, layer_norm=False, flatten=True, bias=True,
                 interpolation_scale=1, pos_embed_type="sincos",
                 pos_embed_max_size=None):
        super().__init__()
        self.flatten = flatten
        self.layer_norm = layer_norm
        self.proj = nn.Conv2d(in_channels, embed_dim, kernel_size=(patch_size,
                              patch_size), stride=patch_size, bias=bias)
        if layer_norm:
            self.norm = nn.LayerNorm(embed_dim, elementwise_affine=False,
                                     eps=1e-6)
        else:
            self.norm = None
        assert pos_embed_type is None, "only the no-pos-embed path is shimmed"

    def forward(self, latent):
        latent = self.proj(latent)
        if self.flatten:
            latent = latent.flatten(2).transpose(1, 2)
        if self.norm is not None:
            latent = self.norm(latent)
        return latent


class MochiCombinedTimestepCaptionEmbedding(nn.Module):
    def __init__(self, embedding_dim, pooled_projection_dim, text_embed_dim,
                 time_embed_dim=256, num_attention_heads=8):
        super().__init__()
        self.time_proj = Timesteps(num_channels=time_embed_dim,
                                   flip_sin_to_cos=True,
                                   downscale_freq_shift=0.0)
        self.timestep_embedder = TimestepEmbedding(
            in_channels=time_embed_dim, time_embed_dim=embedding_dim)
        self.pooler = MochiAttentionPool(
            num_attention_heads=num_attention_heads,
            embed_dim=text_embed_dim, output_dim=embedding_dim)
        self.caption_proj = nn.Linear(text_embed_dim, pooled_projection_dim)

    def forward(self, timestep, encoder_hidden_states, encoder_attention_mask,
                hidden_dtype=None):
        time_proj = self.time_proj(timestep)
        conditioning = self.timestep_embedder(time_proj.to(dtype=hidden_dtype))
        pooled_projections = self.pooler(encoder_hidden_states,
                                         encoder_attention_mask)
        caption_proj = self.caption_proj(encoder_hidden_states)
        conditioning = conditioning + pooled_projections
        return conditioning, caption_proj


class MochiAttentionPool(nn.Module):
    """diffusers MochiAttentionPool: masked softmax attention pooling with a
    mean-pooled query token."""

    def __init__(self, num_attention_heads, embed_dim, output_dim=None):
        super().__init__()
        self.output_dim = output_dim or embed_dim
        self.num_attention_heads = num_attention_heads
        self.to_kv = nn.Linear(embed_dim, 2 * embed_dim)
        self.to_q = nn.Linear(embed_dim, embed_dim)
        self.to_out = nn.Linear(embed_dim, self.output_dim)

    @staticmethod
    def pool_tokens(x, mask, *, keepdim=False):
        assert x.size(1) == mask.size(1)
        mask = mask[:, :, None].to(dtype=x.dtype)
        mask = mask / mask.sum(dim=1, keepdim=True).clamp(min=1)
        return (x * mask).sum(dim=1, keepdim=keepdim)

    def forward(self, x, mask):
        D = x.size(2)
        attn_mask = mask[:, None, None, :].bool()
        attn_mask = F.pad(attn_mask, (1, 0), value=True)
        x_pool = self.pool_tokens(x, mask, keepdim=True)
        x = torch.cat([x_pool, x], dim=1)
        kv = self.to_kv(x)
        q = self.to_q(x[:, 0])
        q = q.unsqueeze(2)
        head_dim = D // self.num_attention_heads
        q = q.view(-1, self.num_attention_heads, 1, head_dim)
        kv = kv.view(x.size(0), x.size(1), 2, self.num_attention_heads,
                     head_dim).permute(2, 0, 3, 1, 4)
        k, v = kv.unbind(0)
        x = F.scaled_dot_product_attention(
            q, k, v, attn_mask=attn_mask, dropout_p=0.0)
        x = x.reshape(x.size(0), D)
        return self.to_out(x)


class AttentionModuleMixin:
    fused_projections = False

    def set_processor(self, processor=None):
        if processor is None:
            processor = self._default_processor_cls()
        self.processor = processor

    def get_processor(self):
        return getattr(self, "processor", None)

    def prepare_attention_mask(self, attention_mask, target_length,
                               batch_size, out_dim=3):
        head_size = self.heads
        if attention_mask is None:
            return attention_mask
        current_length = attention_mask.shape[-1]
        if current_length != target_length:
            attention_mask = F.pad(attention_mask,
                                   (0, target_length - current_length),
                                   value=0.0)
        if out_dim == 3:
            if attention_mask.shape[0] < batch_size * head_size:
                attention_mask = attention_mask.repeat_interleave(
                    head_size, dim=0)
        elif out_dim == 4:
            attention_mask = attention_mask.unsqueeze(1)
            attention_mask = attention_mask.repeat_interleave(head_size, dim=1)
        return attention_mask


class CombinedTimestepTextProjEmbeddings(nn.Module):
    def __init__(self, embedding_dim, pooled_projection_dim):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(
            pooled_projection_dim, embedding_dim, act_fn="silu")

    def forward(self, timestep, pooled_projection):
        timesteps_proj = self.time_proj(timestep)
        timesteps_emb = self.timestep_embedder(
            timesteps_proj.to(dtype=pooled_projection.dtype))
        return timesteps_emb + self.text_embedder(pooled_projection)


class CombinedTimestepGuidanceTextProjEmbeddings(nn.Module):
    def __init__(self, embedding_dim, pooled_projection_dim):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)
        self.guidance_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(
            pooled_projection_dim, embedding_dim, act_fn="silu")

    def forward(self, timestep, guidance, pooled_projection):
        timesteps_emb = self.timestep_embedder(
            self.time_proj(timestep).to(dtype=pooled_projection.dtype))
        guidance_emb = self.guidance_embedder(
            self.time_proj(guidance).to(dtype=pooled_projection.dtype))
        time_guidance_emb = timesteps_emb + guidance_emb
        return time_guidance_emb + self.text_embedder(pooled_projection)


def apply_rotary_emb(x, freqs_cis, use_real=True, use_real_unbind_dim=-1,
                     sequence_dim=2):
    """diffusers.models.embeddings.apply_rotary_emb (real cos/sin path)."""
    if use_real:
        cos, sin = freqs_cis
        if sequence_dim == 2:
            cos = cos[None, None, :, :]
            sin = sin[None, None, :, :]
        elif sequence_dim == 1:
            cos = cos[None, :, None, :]
            sin = sin[None, :, None, :]
        cos, sin = cos.to(x.device), sin.to(x.device)
        if use_real_unbind_dim == -1:
            # interleaved pairs: (x0, x1) -> (-x1, x0)
            x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
            x_rotated = torch.stack([-x_imag, x_real], dim=-1).flatten(-2)
        elif use_real_unbind_dim == -2:
            x_real, x_imag = x.reshape(*x.shape[:-1], 2, -1).unbind(-2)
            x_rotated = torch.cat([-x_imag, x_real], dim=-1)
        else:
            raise ValueError(use_real_unbind_dim)
        return (x.float() * cos + x_rotated.float() * sin).to(x.dtype)
    x_rotated = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
    freqs_cis = freqs_cis.unsqueeze(2)
    return torch.view_as_real(x_rotated * freqs_cis).flatten(3).type_as(x)


def get_1d_rotary_pos_embed(dim, pos, theta=10000.0, use_real=False,
                            linear_factor=1.0, ntk_factor=1.0,
                            repeat_interleave_real=True,
                            freqs_dtype=torch.float32):
    assert dim % 2 == 0
    if isinstance(pos, int):
        pos = torch.arange(pos)
    theta = theta * ntk_factor
    freqs = (1.0 / (theta ** (torch.arange(0, dim, 2, dtype=freqs_dtype,
                                           device=pos.device)[: dim // 2] / dim))
             / linear_factor)
    freqs = torch.outer(pos, freqs)
    if use_real and repeat_interleave_real:
        cos = freqs.cos().repeat_interleave(2, dim=1).float()
        sin = freqs.sin().repeat_interleave(2, dim=1).float()
        return cos, sin
    if use_real:
        cos = torch.cat([freqs.cos(), freqs.cos()], dim=-1).float()
        sin = torch.cat([freqs.sin(), freqs.sin()], dim=-1).float()
        return cos, sin
    return torch.polar(torch.ones_like(freqs), freqs)


class AdaLayerNormZero(nn.Module):
    def __init__(self, embedding_dim, num_embeddings=None,
                 norm_type="layer_norm", bias=True):
        super().__init__()
        assert num_embeddings is None
        self.emb = None
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, 6 * embedding_dim, bias=bias)
        assert norm_type == "layer_norm"
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False,
                                 eps=1e-6)

    def forward(self, x, timestep=None, class_labels=None, hidden_dtype=None,
                emb=None):
        emb = self.linear(self.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            emb.chunk(6, dim=1))
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(nn.Module):
    def __init__(self, embedding_dim, norm_type="layer_norm", bias=True):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, 3 * embedding_dim, bias=bias)
        assert norm_type == "layer_norm"
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False,
                                 eps=1e-6)

    def forward(self, x, emb=None):
        emb = self.linear(self.silu(emb))
        shift_msa, scale_msa, gate_msa = emb.chunk(3, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa


class PixArtAlphaCombinedTimestepSizeEmbeddings(nn.Module):
    def __init__(self, embedding_dim, size_emb_dim,
                 use_additional_conditions=False):
        super().__init__()
        self.outdim = size_emb_dim
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)
        self.use_additional_conditions = use_additional_conditions
        assert not use_additional_conditions, "size-conditioned path unused"

    def forward(self, timestep, resolution=None, aspect_ratio=None,
                batch_size=None, hidden_dtype=None):
        timesteps_proj = self.time_proj(timestep)
        return self.timestep_embedder(timesteps_proj.to(dtype=hidden_dtype))


class AdaLayerNormSingle(nn.Module):
    """diffusers AdaLayerNormSingle (PixArt-sigma style, used by LTX)."""

    def __init__(self, embedding_dim, use_additional_conditions=False):
        super().__init__()
        self.emb = PixArtAlphaCombinedTimestepSizeEmbeddings(
            embedding_dim, size_emb_dim=embedding_dim // 3,
            use_additional_conditions=use_additional_conditions)
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, 6 * embedding_dim, bias=True)

    def forward(self, timestep, added_cond_kwargs=None, batch_size=None,
                hidden_dtype=None):
        added_cond_kwargs = added_cond_kwargs or {
            "resolution": None, "aspect_ratio": None}
        embedded_timestep = self.emb(timestep, **added_cond_kwargs,
                                     batch_size=batch_size,
                                     hidden_dtype=hidden_dtype)
        return self.linear(self.silu(embedded_timestep)), embedded_timestep


class AdaLayerNorm(nn.Module):
    """diffusers AdaLayerNorm, continuous-embedding variant (num_embeddings
    None), as used by CogVideoX for its norm_out."""

    def __init__(self, embedding_dim, num_embeddings=None, output_dim=None,
                 norm_elementwise_affine=False, norm_eps=1e-5, chunk_dim=0):
        super().__init__()
        self.chunk_dim = chunk_dim
        output_dim = output_dim or embedding_dim * 2
        assert num_embeddings is None
        self.emb = None
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, output_dim)
        self.norm = nn.LayerNorm(output_dim // 2, norm_eps,
                                 norm_elementwise_affine)

    def forward(self, x, timestep=None, temb=None):
        temb = self.linear(self.silu(temb))
        if self.chunk_dim == 1:
            shift, scale = temb.chunk(2, dim=1)
            shift = shift[:, None, :]
            scale = scale[:, None, :]
        else:
            scale, shift = temb.chunk(2, dim=0)
        return self.norm(x) * (1 + scale) + shift


class CogVideoXLayerNormZero(nn.Module):
    def __init__(self, conditioning_dim, embedding_dim, elementwise_affine=True,
                 eps=1e-5, bias=True):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(conditioning_dim, 6 * embedding_dim, bias=bias)
        self.norm = nn.LayerNorm(embedding_dim, eps=eps,
                                 elementwise_affine=elementwise_affine)

    def forward(self, hidden_states, encoder_hidden_states, temb):
        shift, scale, gate, enc_shift, enc_scale, enc_gate = self.linear(
            self.silu(temb)).chunk(6, dim=1)
        hidden_states = self.norm(hidden_states) * (
            1 + scale)[:, None, :] + shift[:, None, :]
        encoder_hidden_states = self.norm(encoder_hidden_states) * (
            1 + enc_scale)[:, None, :] + enc_shift[:, None, :]
        return hidden_states, encoder_hidden_states, gate[:, None, :], enc_gate[:, None, :]


class CombinedTimestepLabelEmbeddings(nn.Module):
    def __init__(self, num_classes, embedding_dim, class_dropout_prob=0.1):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=1)
        self.timestep_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)

    def forward(self, timestep, class_labels=None, hidden_dtype=None):
        timesteps_proj = self.time_proj(timestep)
        return self.timestep_embedder(timesteps_proj.to(dtype=hidden_dtype))


class CogVideoXPatchEmbed(nn.Module):
    """diffusers CogVideoXPatchEmbed subset: joint [text|video] embedding with
    2D (temporal_patch_size 1, conv2d) or 3D patching, no learned pos embed
    when use_positional_embeddings=False (CogVideoX-1.5 / fun configuration)
    and the static sincos path otherwise."""

    def __init__(self, patch_size=2, patch_size_t=None, in_channels=16,
                 embed_dim=1920, text_embed_dim=4096, bias=True,
                 sample_width=90, sample_height=60, sample_frames=49,
                 temporal_compression_ratio=4, max_text_seq_length=226,
                 spatial_interpolation_scale=1.875,
                 temporal_interpolation_scale=1.0,
                 use_positional_embeddings=True,
                 use_learned_positional_embeddings=True):
        super().__init__()
        self.patch_size = patch_size
        self.patch_size_t = patch_size_t
        assert not use_positional_embeddings and \
            not use_learned_positional_embeddings, \
            "only the rope configuration is shimmed"
        if patch_size_t is None:
            self.proj = nn.Conv2d(in_channels, embed_dim,
                                  kernel_size=(patch_size, patch_size),
                                  stride=patch_size, bias=bias)
        else:
            self.proj = nn.Linear(
                in_channels * patch_size * patch_size * patch_size_t,
                embed_dim, bias=bias)
        self.text_proj = nn.Linear(text_embed_dim, embed_dim)

    def forward(self, text_embeds, image_embeds):
        text_embeds = self.text_proj(text_embeds)
        batch_size, num_frames, channels, height, width = image_embeds.shape
        if self.patch_size_t is None:
            image_embeds = image_embeds.reshape(-1, channels, height, width)
            image_embeds = self.proj(image_embeds)
            image_embeds = image_embeds.view(batch_size, num_frames,
                                             *image_embeds.shape[1:])
            image_embeds = image_embeds.flatten(3).transpose(2, 3)
            image_embeds = image_embeds.flatten(1, 2)
        else:
            p = self.patch_size
            p_t = self.patch_size_t
            image_embeds = image_embeds.permute(0, 1, 3, 4, 2)
            image_embeds = image_embeds.reshape(
                batch_size, num_frames // p_t, p_t, height // p, p,
                width // p, p, channels)
            image_embeds = image_embeds.permute(
                0, 1, 3, 5, 7, 2, 4, 6).flatten(4, 7).flatten(1, 3)
            image_embeds = self.proj(image_embeds)
        return torch.cat([text_embeds, image_embeds], dim=1)


class FluxPosEmbed(nn.Module):
    """diffusers FluxPosEmbed (also vendored at reference flux/base/model.py:331)."""

    def __init__(self, theta, axes_dim):
        super().__init__()
        self.theta = theta
        self.axes_dim = axes_dim

    def forward(self, ids):
        n_axes = ids.shape[-1]
        cos_out, sin_out = [], []
        pos = ids.float()
        for i in range(n_axes):
            cos, sin = get_1d_rotary_pos_embed(
                self.axes_dim[i], pos[:, i], theta=self.theta,
                repeat_interleave_real=True, use_real=True,
                freqs_dtype=torch.float64)
            cos_out.append(cos)
            sin_out.append(sin)
        return (torch.cat(cos_out, dim=-1).to(ids.device),
                torch.cat(sin_out, dim=-1).to(ids.device))


class AdaLayerNormContinuous(nn.Module):
    def __init__(self, embedding_dim, conditioning_embedding_dim,
                 elementwise_affine=True, eps=1e-5, bias=True,
                 norm_type="layer_norm"):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(conditioning_embedding_dim, embedding_dim * 2,
                                bias=bias)
        assert norm_type == "layer_norm"
        self.norm = nn.LayerNorm(embedding_dim, eps, elementwise_affine, bias)

    def forward(self, x, conditioning_embedding):
        emb = self.linear(self.silu(conditioning_embedding).to(x.dtype))
        scale, shift = torch.chunk(emb, 2, dim=1)
        return self.norm(x) * (1 + scale)[:, None, :] + shift[:, None, :]


class CacheMixin:
    pass


class ModelMixin(nn.Module):
    _supports_gradient_checkpointing = False

    @property
    def dtype(self) -> torch.dtype:
        return next(self.parameters()).dtype

    @property
    def device(self) -> torch.device:
        return next(self.parameters()).device


class _FrozenConfig(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


class ConfigMixin:
    def register_to_config(self, **kwargs):
        existing = dict(getattr(self, "_internal_dict", {}))
        existing.update(kwargs)
        self._internal_dict = _FrozenConfig(existing)

    @property
    def config(self):
        return getattr(self, "_internal_dict", _FrozenConfig())


def register_to_config(init):
    import functools
    import inspect

    sig = inspect.signature(init)

    @functools.wraps(init)
    def wrapped(self, *args, **kwargs):
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items()
               if k not in ("self",) and not k.startswith("_")}
        cfg.pop("kwargs", None)
        ConfigMixin.register_to_config(self, **cfg)
        return init(self, *args, **kwargs)

    return wrapped


@dataclass
class Transformer2DModelOutput:
    sample: torch.Tensor


@dataclass
class AutoencoderKLOutput:
    latent_dist: "DiagonalGaussianDistribution"


@dataclass
class DecoderOutput:
    sample: torch.Tensor
    commit_loss: object = None


class AutoencoderMixin:
    pass


class DiagonalGaussianDistribution:
    """diffusers.models.autoencoders.vae.DiagonalGaussianDistribution."""

    def __init__(self, parameters, deterministic=False):
        self.parameters = parameters
        self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
        self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = torch.exp(0.5 * self.logvar)
        self.var = torch.exp(self.logvar)
        if deterministic:
            self.var = self.std = torch.zeros_like(self.mean)

    def sample(self, generator=None):
        noise = torch.randn(self.mean.shape, generator=generator,
                            dtype=self.parameters.dtype)
        return self.mean + self.std * noise

    def mode(self):
        return self.mean


def _module(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_diffusers_shim() -> None:
    if "diffusers" in sys.modules:
        return
    logging_mod = _module("diffusers.utils.logging",
                          get_logger=logging.getLogger)
    utils = _module(
        "diffusers.utils",
        USE_PEFT_BACKEND=False,
        logging=logging_mod,
        scale_lora_layers=lambda *a, **k: None,
        unscale_lora_layers=lambda *a, **k: None,
        is_torch_version=_is_torch_version,
        is_torch_npu_available=lambda: False,
        is_torchvision_available=lambda: False,
        deprecate=lambda *a, **k: None,
        BaseOutput=BaseOutput,
    )
    cfg_mod = _module("diffusers.configuration_utils",
                      ConfigMixin=ConfigMixin,
                      register_to_config=register_to_config)
    _FromOriginal = type("FromOriginalModelMixin", (), {})
    loaders = _module("diffusers.loaders",
                      FromOriginalModelMixin=_FromOriginal,
                      PeftAdapterMixin=type("PeftAdapterMixin", (), {}),
                      FluxTransformer2DLoadersMixin=type(
                          "FluxTransformer2DLoadersMixin", (), {}))
    _module("diffusers.loaders.single_file_model",
            FromOriginalModelMixin=_FromOriginal)
    def _randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
        import torch as _t

        return _t.randn(tuple(shape), generator=generator, device=device,
                        dtype=dtype)

    _module("diffusers.utils.torch_utils", maybe_allow_in_graph=lambda cls: cls,
            randn_tensor=_randn_tensor)
    _module("diffusers.utils.import_utils",
            is_torch_npu_available=lambda: False,
            is_torch_version=_is_torch_version,
            is_torchvision_available=lambda: False)
    _module("diffusers.models.attention_dispatch",
            dispatch_attention_fn=_dispatch_attention_fn,
            _CAN_USE_FLEX_ATTN=False)
    _module("diffusers.models.activations",
            GEGLU=GEGLU, GELU=GELU, ApproximateGELU=ApproximateGELU,
            get_activation=_get_activation)
    class _LoRACompatibleLinear(nn.Linear):
        def forward(self, hidden_states, scale=1.0):
            return super().forward(hidden_states)

    _module("diffusers.models.lora", LoRACompatibleLinear=_LoRACompatibleLinear)
    def _any_args(name):
        def init(self, *a, **k):
            pass
        return type(name, (), {"__init__": init})

    _module("diffusers.models._modeling_parallel",
            ContextParallelInput=_any_args("ContextParallelInput"),
            ContextParallelOutput=_any_args("ContextParallelOutput"))
    bria = _module("diffusers.models.transformers.transformer_bria")

    def _bria_getattr(name):
        # Resolve from the reference's own vendored fibo processor
        # (src/transformer/fibo/base/attention.py — identical math).
        mod = importlib.import_module("src.transformer.fibo.base.attention")
        return getattr(mod, name, None) or mod.BriaFiboAttnProcessor

    bria.__getattr__ = _bria_getattr
    _module("diffusers.models.transformers", transformer_bria=bria)
    _module("diffusers.utils.accelerate_utils",
            apply_forward_hook=lambda fn: fn)
    def _chunked_ff(ff, hidden_states, chunk_dim, chunk_size):
        if chunk_size is None:
            return ff(hidden_states)
        return torch.cat(
            [ff(c) for c in hidden_states.split(chunk_size, dim=chunk_dim)],
            dim=chunk_dim)

    attention = _module("diffusers.models.attention",
                        FeedForward=FeedForward, GELU=GELU, GEGLU=GEGLU,
                        _chunked_feed_forward=_chunked_ff,
                        LinearActivation=LinearActivation, SwiGLU=SwiGLU,
                        Attention=Attention, AttentionMixin=AttentionMixin,
                        AttentionModuleMixin=AttentionModuleMixin)
    attention_processor = _module("diffusers.models.attention_processor",
                                  Attention=Attention,
                                  ADDED_KV_ATTENTION_PROCESSORS=(),
                                  CROSS_ATTENTION_PROCESSORS=(),
                                  AttnAddedKVProcessor=AttentionProcessor,
                                  AttnProcessor=AttnProcessor2_0,
                                  FusedAttnProcessor2_0=AttnProcessor2_0,
                                  AttentionProcessor=AttentionProcessor,
                                  AttnProcessor2_0=AttnProcessor2_0,
                                  MochiVaeAttnProcessor2_0=MochiVaeAttnProcessor2_0,
                                  MochiAttention=MochiAttention,
                                  SpatialNorm=SpatialNorm,
                                  LoRAAttnAddedKVProcessor=AttentionProcessor,
                                  LoRAAttnProcessor=AttentionProcessor,
                                  LoRAAttnProcessor2_0=AttentionProcessor,
                                  LoRAXFormersAttnProcessor=AttentionProcessor)
    embeddings = _module("diffusers.models.embeddings",
                         Timesteps=Timesteps,
                         TimestepEmbedding=TimestepEmbedding,
                         PixArtAlphaTextProjection=PixArtAlphaTextProjection,
                         CombinedTimestepTextProjEmbeddings=CombinedTimestepTextProjEmbeddings,
                         CombinedTimestepGuidanceTextProjEmbeddings=CombinedTimestepGuidanceTextProjEmbeddings,
                         PixArtAlphaCombinedTimestepSizeEmbeddings=PixArtAlphaCombinedTimestepSizeEmbeddings,
                         MochiCombinedTimestepCaptionEmbedding=MochiCombinedTimestepCaptionEmbedding,
                         PatchEmbed=PatchEmbed,
                         CogVideoXPatchEmbed=CogVideoXPatchEmbed,
                         FluxPosEmbed=FluxPosEmbed,
                         get_timestep_embedding=get_timestep_embedding,
                         get_1d_rotary_pos_embed=get_1d_rotary_pos_embed,
                         apply_rotary_emb=apply_rotary_emb)
    normalization = _module("diffusers.models.normalization",
                            FP32LayerNorm=FP32LayerNorm, RMSNorm=RMSNorm,
                            AdaLayerNorm=AdaLayerNorm,
                            AdaLayerNormZero=AdaLayerNormZero,
                            AdaLayerNormZeroSingle=AdaLayerNormZeroSingle,
                            AdaLayerNormSingle=AdaLayerNormSingle,
                            AdaLayerNormContinuous=AdaLayerNormContinuous,
                            CogVideoXLayerNormZero=CogVideoXLayerNormZero,
                            CombinedTimestepLabelEmbeddings=CombinedTimestepLabelEmbeddings)
    outputs = _module("diffusers.models.modeling_outputs",
                      Transformer2DModelOutput=Transformer2DModelOutput,
                      AutoencoderKLOutput=AutoencoderKLOutput)
    # ref_oracle_vae2d.install() may already have registered this module with
    # the 2D Encoder/Decoder blocks — merge, never clobber (src/vae/auto/
    # model.py:35 imports AutoencoderMixin/Encoder/Decoder from here).
    akl = sys.modules.get("diffusers.models.autoencoders.autoencoder_kl")
    if akl is None:
        akl = _module("diffusers.models.autoencoders.autoencoder_kl")
    akl.AutoencoderKLOutput = AutoencoderKLOutput
    akl.DecoderOutput = DecoderOutput
    akl.AutoencoderMixin = AutoencoderMixin
    akl.DiagonalGaussianDistribution = DiagonalGaussianDistribution
    akl_cog = _module("diffusers.models.autoencoders.autoencoder_kl_cogvideox")

    def _akl_cog_getattr(name):
        # the reference's own cogvideo model defines the class diffusers
        # exports; alias it lazily to avoid a circular import at shim time
        mod = importlib.import_module("src.vae.cogvideo.model")
        return getattr(mod, name)

    akl_cog.__getattr__ = _akl_cog_getattr
    _module("diffusers.models.autoencoders",
            vae=_module("diffusers.models.autoencoders.vae",
                        AutoencoderMixin=AutoencoderMixin,
                        DecoderOutput=DecoderOutput,
                        DiagonalGaussianDistribution=DiagonalGaussianDistribution),
            autoencoder_kl=akl, autoencoder_kl_cogvideox=akl_cog)
    _module("diffusers.models.downsampling",
            CogVideoXDownsample3D=CogVideoXDownsample3D)
    _module("diffusers.models.upsampling",
            CogVideoXUpsample3D=CogVideoXUpsample3D)
    modeling_utils = _module("diffusers.models.modeling_utils",
                             ModelMixin=ModelMixin)
    cache_utils = _module("diffusers.models.cache_utils", CacheMixin=CacheMixin)
    models = _module("diffusers.models",
                     attention=attention,
                     attention_processor=attention_processor,
                     embeddings=embeddings,
                     normalization=normalization,
                     modeling_outputs=outputs, modeling_utils=modeling_utils,
                     cache_utils=cache_utils)
    root = _module("diffusers", utils=utils, configuration_utils=cfg_mod,
                   loaders=loaders, models=models,
                   ConfigMixin=ConfigMixin, ModelMixin=ModelMixin)
    root.__path__ = []  # mark as package


def install_ref_parents() -> None:
    """Make ``src.*`` importable from the reference tree WITHOUT running
    ``src/transformer/__init__.py`` (auto-imports every family)."""
    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")
        lg.logger = logging.getLogger("ref")
        sys.modules["loguru"] = lg
    if "omegaconf" not in sys.modules:
        # mmaudio's BigVGAN only needs OmegaConf.load on a yaml path
        class _OmegaConf:
            @staticmethod
            def load(path):
                import types as _types

                import yaml

                with open(path) as f:
                    return _types.SimpleNamespace(**yaml.safe_load(f))

        oc = types.ModuleType("omegaconf")
        oc.OmegaConf = _OmegaConf
        sys.modules["omegaconf"] = oc
    if "timm" not in sys.modules:
        # magi's ViT VAE only pulls to_2tuple + trunc_normal_ (init-time)
        def _to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        layers = types.ModuleType("timm.models.layers")
        layers.to_2tuple = _to_2tuple
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        models = types.ModuleType("timm.models")
        models.layers = layers
        timm = types.ModuleType("timm")
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name, sub in (("src", "src"), ("src.transformer", "src/transformer")):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = [f"{REF}/{sub}"]
            sys.modules[name] = m
    tf_pkg = sys.modules["src.transformer"]
    if not hasattr(tf_pkg, "TRANSFORMERS_REGISTRY"):
        base = importlib.import_module("src.transformer.base")
        tf_pkg.TRANSFORMERS_REGISTRY = base.TRANSFORMERS_REGISTRY
        tf_pkg.get_transformer = base.get_transformer


def import_ref_module(name: str):
    install_diffusers_shim()
    install_ref_parents()
    return importlib.import_module(name)
