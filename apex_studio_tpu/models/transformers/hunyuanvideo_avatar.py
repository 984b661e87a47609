"""HunyuanVideo Avatar (audio-driven talking portrait) in JAX/NNX.

Counterpart of the reference's
``src/transformer/hunyuanvideo/avatar/model.py`` —
HunyuanAvatarVideoTransformer3DModel (model.py:780): the standard
HunyuanVideo dual/single-stream DiT plus
- a second patch embed for the reference image latents
  (``ref_latents_embedder``) whose tokens are ADDED to the video tokens via
  ``ref_latents_proj`` (model.py:1029), with the ref FIRST-frame tokens
  (through the regular ``x_embedder``) PREPENDED to the sequence at RoPE
  time coordinate -1 (engine avatar.py:221 concat_dict mode="timecat",
  bias=-1; utils/models/hunyuan.py:270),
- extra condition embeddings: motion expression / head-pose buckets (each
  4 values embedded to dim/4, model.py:341-378) and an fps embedding,
- a Whisper-feature audio projection (HunyuanAudioProjNet2, model.py:87)
  producing 4 context tokens per frame, injected after double-stream
  blocks 1,3,…,19 through zero-initialised single-head perceiver
  cross-attentions gated by a per-token face mask (model.py:1062-1101).

The reference's ``use_cache`` path (replaying the final single block from a
stashed activation, model.py:1122) is a CUDA memory/latency trade the jitted
TPU step does not need — each step is one fused XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.models.layers import Linear
from apex_studio_tpu.models.registry import transformer_registry
from apex_studio_tpu.models.transformers.hunyuanvideo import (
    HunyuanVideoConfig,
    HunyuanVideoTransformer3DModel,
)
from apex_studio_tpu.ops.embeddings import timestep_embedding
from apex_studio_tpu.ops.norms import layer_norm
from apex_studio_tpu.ops.rope import precompute_axial_freqs


@dataclasses.dataclass
class HunyuanAvatarConfig(HunyuanVideoConfig):
    audio_seq_len: int = 10
    audio_blocks: int = 5
    audio_channels: int = 384
    audio_intermediate_dim: int = 1024
    audio_output_dim: int = 3072
    audio_context_tokens: int = 4
    audio_heads: int = 33
    double_stream_list: Tuple[int, ...] = (1, 3, 5, 7, 9, 11, 13, 15, 17, 19)


class AudioProjNet2(nnx.Module):
    """model.py:87 — per-frame (window·blocks·channels) → context tokens."""

    def __init__(self, cfg: HunyuanAvatarConfig, *, dtype, rngs: nnx.Rngs):
        in_dim = cfg.audio_seq_len * cfg.audio_blocks * cfg.audio_channels
        mid = cfg.audio_intermediate_dim
        out = cfg.audio_output_dim
        kw = dict(dtype=dtype, param_dtype=dtype, rngs=rngs)
        self.proj1 = Linear(in_dim, mid, **kw)
        self.proj2 = Linear(mid, mid, **kw)
        self.proj3 = Linear(mid, cfg.audio_context_tokens * out, **kw)
        self.norm_weight = nnx.Param(jnp.ones((out,), jnp.float32))
        self.norm_bias = nnx.Param(jnp.zeros((out,), jnp.float32))
        self.context_tokens = cfg.audio_context_tokens
        self.output_dim = out

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        # audio: [B, F, window, blocks, channels] → [B, F, ctx, out]
        b, f = audio.shape[:2]
        x = audio.reshape(b * f, -1)
        x = jax.nn.relu(self.proj1(x))
        x = jax.nn.relu(self.proj2(x))
        x = self.proj3(x).reshape(b * f, self.context_tokens, self.output_dim)
        x = layer_norm(x, self.norm_weight.value, self.norm_bias.value, 1e-5)
        return x.reshape(b, f, self.context_tokens, self.output_dim)


class PerceiverAttentionCA(nnx.Module):
    """model.py:163 — single-head perceiver cross-attention (inner dim ==
    dim_head; the ``heads`` config value is vestigial in the reference too).
    ``to_out`` is zero-initialised so an untrained adapter is a no-op."""

    def __init__(self, dim: int, dim_head: int, *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=dtype, rngs=rngs, use_bias=False)
        self.norm1_weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.norm1_bias = nnx.Param(jnp.zeros((dim,), jnp.float32))
        self.norm2_weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.norm2_bias = nnx.Param(jnp.zeros((dim,), jnp.float32))
        self.to_q = Linear(dim, dim_head, **kw)
        self.to_kv = Linear(dim, dim_head * 2, **kw)
        self.to_out = Linear(dim_head, dim, **kw)
        self.to_out.kernel.value = jnp.zeros_like(self.to_out.kernel.value)
        self.dim_head = dim_head

    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        # x: [B', A, D] audio tokens; latents: [B', S, D] frame tokens
        x = layer_norm(x, self.norm1_weight.value, self.norm1_bias.value, 1e-5)
        latents = layer_norm(latents, self.norm2_weight.value,
                             self.norm2_bias.value, 1e-5)
        q = self.to_q(latents)
        k, v = jnp.split(self.to_kv(x), 2, axis=-1)
        scale = 1.0 / np.sqrt(np.sqrt(self.dim_head))
        w = jnp.einsum("bsd,bad->bsa", q * scale, k * scale)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
        return self.to_out(jnp.einsum("bsa,bad->bsd", w, v))


@transformer_registry.register(
    "hunyuanvideo.avatar", aliases=("HunyuanAvatarVideoTransformer3DModel",))
class HunyuanAvatarVideoModel(HunyuanVideoTransformer3DModel):
    config_class = HunyuanAvatarConfig

    def __init__(self, cfg: HunyuanAvatarConfig = None, *, dtype=jnp.bfloat16,
                 param_dtype=jnp.bfloat16, rngs: Optional[nnx.Rngs] = None):
        cfg = cfg or HunyuanAvatarConfig()
        rngs = rngs or nnx.Rngs(0)
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        d = cfg.dim
        kw = dict(use_bias=True, dtype=dtype, param_dtype=param_dtype,
                  rngs=rngs)
        patch_dim = cfg.in_channels * cfg.patch_size_t * cfg.patch_size ** 2
        self.ref_latents_embedder = Linear(patch_dim, d, **kw)
        self.ref_latents_proj = Linear(d, d, **kw)
        # motion buckets: 4 values × dim/4 embeddings reshaped to [B, dim]
        self.motion_exp_linear_1 = Linear(256, d // 4, **kw)
        self.motion_exp_linear_2 = Linear(d // 4, d // 4, **kw)
        self.motion_pose_linear_1 = Linear(256, d // 4, **kw)
        self.motion_pose_linear_2 = Linear(d // 4, d // 4, **kw)
        self.fps_linear_1 = Linear(256, d, **kw)
        self.fps_linear_2 = Linear(d, d, **kw)
        self.audio_projection = AudioProjNet2(cfg, dtype=dtype, rngs=rngs)
        self.audio_adapter_blocks = nnx.List([
            PerceiverAttentionCA(cfg.audio_output_dim,
                                 cfg.audio_intermediate_dim, dtype=dtype,
                                 rngs=rngs)
            for _ in cfg.double_stream_list])

    @staticmethod
    def sharding_rules(cfg: "HunyuanAvatarConfig"):
        """Backbone inherits the hunyuanvideo TP layout; the single-head
        perceiver audio adapter and the tiny motion/fps/ref embedders stay
        replicated (their to_q/to_out would otherwise be caught — and
        mis-split — by the backbone's head-projection patterns)."""
        from apex_studio_tpu.parallel.sharding import P, ShardingRules

        replicated = ShardingRules(
            [(r"(audio_adapter_blocks|audio_projection|ref_latents_"
              r"|motion_|fps_linear)", P())],
            default=P(),
        )
        return replicated + HunyuanVideoTransformer3DModel.sharding_rules(cfg)

    def rope_tables(self, t_tok: int, h_tok: int, w_tok: int):
        """timecat rope (utils/models/hunyuan.py:270): one extra leading
        frame of tokens — the prepended ref-image tokens — at time -1."""
        ids = np.stack(
            np.meshgrid(np.arange(t_tok), np.arange(h_tok), np.arange(w_tok),
                        indexing="ij"), axis=-1).reshape(-1, 3)
        ref = np.stack(
            np.meshgrid(np.arange(1), np.arange(h_tok), np.arange(w_tok),
                        indexing="ij"), axis=-1).reshape(-1, 3)
        ref[:, 0] = -1
        ids = np.concatenate([ref, ids], axis=0)[None]
        cos, sin = precompute_axial_freqs(ids, self.cfg.rope_axes_dim,
                                          self.cfg.rope_theta)
        return cos[:, :, None, :], sin[:, :, None, :]

    def _bucket_emb(self, lin1, lin2, vals: jnp.ndarray, b: int) -> jnp.ndarray:
        freq = timestep_embedding(
            vals.reshape(-1).astype(jnp.float32), 256, flip_sin_to_cos=True)
        e = lin2(nnx.silu(lin1(freq.astype(self.dtype))))
        return e.reshape(b, -1)

    def __call__(
        self,
        x: jnp.ndarray,                       # [B, C, T, H, W] noisy latents
        t: jnp.ndarray,                       # [B]
        text: jnp.ndarray,                    # [B, Lt, 4096]
        text_mask: Optional[jnp.ndarray] = None,
        pooled: Optional[jnp.ndarray] = None,
        guidance: Optional[jnp.ndarray] = None,
        ref_latents: Optional[jnp.ndarray] = None,  # [B, C, T, H, W]
        audio: Optional[jnp.ndarray] = None,  # [B, F, win, blocks, ch]
        face_mask: Optional[jnp.ndarray] = None,  # [B, 1, T_lat, h, w] 0..1
        motion_exp: Optional[jnp.ndarray] = None,  # [B, 4]
        motion_pose: Optional[jnp.ndarray] = None,  # [B, 4]
        fps: Optional[jnp.ndarray] = None,    # [B]
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        p, pt = cfg.patch_size, cfg.patch_size_t
        ht, wt = hh // p, ww // p
        n_frames = tt // pt

        t_freq = timestep_embedding(t.astype(jnp.float32), 256,
                                    flip_sin_to_cos=True)
        temb = self.time_linear_2(nnx.silu(self.time_linear_1(
            t_freq.astype(self.dtype))))
        if guidance is not None and self.guidance_linear_1 is not None:
            g_freq = timestep_embedding(guidance.astype(jnp.float32), 256,
                                        flip_sin_to_cos=True)
            temb = temb + self.guidance_linear_2(nnx.silu(
                self.guidance_linear_1(g_freq.astype(self.dtype))))
        if motion_exp is not None:
            temb = temb + self._bucket_emb(self.motion_exp_linear_1,
                                           self.motion_exp_linear_2,
                                           motion_exp, b)
        if motion_pose is not None:
            temb = temb + self._bucket_emb(self.motion_pose_linear_1,
                                           self.motion_pose_linear_2,
                                           motion_pose, b)
        if fps is not None:
            f_freq = timestep_embedding(fps.astype(jnp.float32), 256,
                                        flip_sin_to_cos=True)
            temb = temb + self.fps_linear_2(nnx.silu(self.fps_linear_1(
                f_freq.astype(self.dtype))))
        if pooled is not None:
            temb = temb + self.text_linear_2(nnx.silu(self.text_linear_1(
                pooled.astype(self.dtype))))

        audio_tokens = self.audio_projection(audio.astype(self.dtype))
        # first audio frame repeated 3× then concat: groups of 4 latent
        # frames share 16 audio context tokens (model.py:1083)
        pad = jnp.repeat(audio_tokens[:, :1], 3, axis=1)
        audio_all = jnp.concatenate([pad, audio_tokens], axis=1)
        audio_all = audio_all.reshape(b, n_frames, 4 * cfg.audio_context_tokens,
                                      cfg.dim)

        img = self.x_embedder(self.patchify(x).astype(self.dtype))
        ref_tok = self.ref_latents_embedder(
            self.patchify(ref_latents).astype(self.dtype))
        ref_first = self.x_embedder(
            self.patchify(ref_latents[:, :, :pt]).astype(self.dtype))
        img = img + self.ref_latents_proj(ref_tok)
        ref_len = ref_first.shape[1]
        img = jnp.concatenate([ref_first, img], axis=1)

        txt = self.context_embedder(text.astype(self.dtype), t, text_mask)
        rope_cos, rope_sin = self.rope_tables(n_frames, ht, wt)

        if face_mask is None:
            face_mask = jnp.ones((b, 1, tt, hh, ww), jnp.float32)
        if face_mask.shape[2] == 1:
            face_mask = jnp.repeat(face_mask, tt, axis=2)
        # nearest-resize to the token grid (model.py:1040)
        fm = jax.image.resize(face_mask.astype(jnp.float32),
                              (b, 1, n_frames, ht, wt), method="nearest")
        fm = fm.reshape(b, n_frames * ht * wt, 1).astype(img.dtype)

        n_img = img.shape[1]
        mask = None
        if text_mask is not None:
            mask = jnp.concatenate(
                [jnp.ones((b, n_img), bool), text_mask.astype(bool)], axis=1)

        adapter = {blk: j for j, blk in enumerate(cfg.double_stream_list)}
        for bi, blk in enumerate(self.transformer_blocks):
            img, txt = blk(img, txt, temb, None, 0, rope_cos, rope_sin, mask)
            if bi in adapter:
                real = img[:, ref_len:].reshape(b * n_frames, ht * wt, cfg.dim)
                aud = audio_all.reshape(b * n_frames, -1, cfg.dim)
                inj = self.audio_adapter_blocks[adapter[bi]](aud, real)
                inj = inj.reshape(b, n_frames * ht * wt, cfg.dim) * fm
                img = img + jnp.concatenate(
                    [jnp.zeros_like(img[:, :ref_len]), inj], axis=1)

        xseq = jnp.concatenate([img, txt], axis=1)
        for blk in self.single_transformer_blocks:
            xseq = blk(xseq, n_img, temb, None, 0, rope_cos, rope_sin, mask)
        img = xseq[:, ref_len:n_img]

        scale, shift = jnp.split(
            self.norm_out_linear(nnx.silu(temb))[:, None, :], 2, axis=-1)
        img = layer_norm(img, eps=1e-6) * (1 + scale) + shift
        return self.unpatchify(self.proj_out(img), tt, hh, ww)
