"""HunyuanVideo Avatar engine — audio-driven talking portrait.

Counterpart of the reference's ``src/engine/hunyuanvideo/avatar.py``
(HunyuanAvatarEngine) + ``src/helpers/hunyuanvideo/avatar.py``
(HunyuanAvatar whisper/face preprocessing helper):

- whisper-encoder audio features → per-pixel-frame 10×5×384 windows
  (helper avatar.py:129 _encode_audio: all 5 encoder hidden states stacked,
  4 zero-frames front padding, per-frame window of 10 steps at 2·frame),
- reference image: VAE-encoded and repeated over time as ``ref_latents``,
- long-form windowed denoise (avatar.py:296): ``infer_length`` latent
  frames are denoised as overlapping ``frame_per_batch`` windows whose
  start rolls by ``shift_offset`` each step (modulo wraparound), predictions
  averaged per frame — one jitted window step is reused for every window,
- dynamic guidance: the CFG scale anneals linearly per step and text
  conditioning is dropped from the negative branch after step 10
  (avatar.py:349-374).

The reference's transformer activation cache (``use_cache``) is skipped:
it trades a second half-forward for host memory on CUDA; the TPU step is
one fused XLA program per window and recomputation is cheaper than the
host round-trip.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from apex_studio_tpu.engine.hunyuanvideo import HunyuanVideoShared
from apex_studio_tpu.engine.registry import register_engine
from apex_studio_tpu.utils.progress import make_mapped_progress, safe_emit_progress

logger = logging.getLogger(__name__)


def encode_avatar_audio(waveform: np.ndarray, sr: int, num_frames: int,
                        fps: float, whisper=None, feature_extractor=None
                        ) -> np.ndarray:
    """Audio → per-frame whisper-feature windows [F, 10, 5, 384]
    (helper avatar.py:113-155). Without a whisper checkpoint the features
    are zeros — the zero-init audio adapters then contribute nothing."""
    if whisper is None or feature_extractor is None:
        return np.zeros((num_frames, 10, 5, 384), np.float32)
    import torch

    if sr != 16000:
        # linear resample to whisper's 16 kHz
        n = int(len(waveform) * 16000 / sr)
        waveform = np.interp(np.linspace(0, len(waveform) - 1, n),
                             np.arange(len(waveform)), waveform)
    feats = feature_extractor(waveform, sampling_rate=16000,
                              return_tensors="pt").input_features
    with torch.no_grad():
        hs = whisper.encoder(feats[:, :, :3000],
                             output_hidden_states=True).hidden_states
    feats = torch.stack(hs, dim=2)  # [1, T, layers, 384]
    feats = torch.cat([torch.zeros_like(feats[:, :4]), feats], dim=1)
    step = 2 if abs(fps - 12.5) < 0.1 else 1
    windows = []
    for f in range(min(num_frames, 400)):
        cur = f * step * 2
        clip = feats[0, cur:cur + 10]
        if clip.shape[0] < 10:
            clip = torch.cat(
                [clip, torch.zeros(10 - clip.shape[0], *clip.shape[1:])], 0)
        windows.append(clip)
    out = torch.stack(windows).float().numpy()
    if out.shape[0] < num_frames:
        out = np.concatenate(
            [out, np.zeros((num_frames - out.shape[0], *out.shape[1:]),
                           np.float32)])
    return out


@register_engine("hunyuanvideo", "avatar")
class HunyuanAvatarEngine(HunyuanVideoShared):
    def _load_whisper(self):
        spec = self.component_specs.get("audio_encoder")
        if spec is None or not spec.get("model_path"):
            return None, None
        try:
            from transformers import AutoFeatureExtractor, WhisperModel

            from apex_studio_tpu.engine.base import select_variant

            variant = select_variant(spec.get("model_path"), None)
            path = self._resolve_path(variant.get("path"))
            return (WhisperModel.from_pretrained(path),
                    AutoFeatureExtractor.from_pretrained(path))
        except Exception:
            logger.exception("whisper load failed; audio features zeroed")
            return None, None

    def run(
        self,
        image: Any = None,
        audio: Any = None,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        height: int = 512,
        width: int = 512,
        duration: Optional[float] = None,
        fps: float = 25.0,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.5,
        dynamic_guidance_start: float = 3.5,
        dynamic_guidance_end: float = 6.5,
        frame_per_batch: int = 33,
        shift_offset: int = 10,
        face_mask: Any = None,
        motion_exp: Optional[List[float]] = None,
        motion_pose: Optional[List[float]] = None,
        seed: Optional[int] = None,
        shift: Optional[float] = None,
        return_latents: bool = False,
        progress_callback: Optional[Callable] = None,
        **_: Any,
    ):
        safe_emit_progress(progress_callback, 0.0, "Starting Avatar pipeline")
        self.load_components()
        if image is None:
            raise ValueError("avatar requires a reference image")
        cfg_t = self.transformer.cfg
        vae_cfg = self.vae.cfg
        s_scale, t_scale = vae_cfg.spatial_scale, vae_cfg.temporal_scale
        p = cfg_t.patch_size
        height -= height % (s_scale * p)
        width -= width % (s_scale * p)
        if num_frames is None:
            num_frames = int(round((duration or 5.0) * fps)) + 1
        num_frames = max(1, num_frames - (num_frames - 1) % t_scale)

        # audio features: precomputed array, waveform tuple, or wav path
        if isinstance(audio, np.ndarray) and audio.ndim == 4:
            audio_feats = audio.astype(np.float32)[:num_frames]
        elif audio is not None:
            if isinstance(audio, tuple):
                wav, sr = audio
            else:
                import scipy.io.wavfile as wavfile

                sr, wav = wavfile.read(audio)
                if wav.dtype.kind == "i":
                    wav = wav.astype(np.float32) / np.iinfo(wav.dtype).max
                if wav.ndim == 2:
                    wav = wav.mean(axis=1)
            whisper, fe = self._load_whisper()
            audio_feats = encode_avatar_audio(np.asarray(wav, np.float32),
                                              int(sr), num_frames, fps,
                                              whisper, fe)
        else:
            audio_feats = np.zeros(
                (num_frames, cfg_t.audio_seq_len, cfg_t.audio_blocks,
                 cfg_t.audio_channels), np.float32)
        want = (cfg_t.audio_seq_len, cfg_t.audio_blocks, cfg_t.audio_channels)
        if tuple(audio_feats.shape[1:]) != want:
            # whisper features don't match the model's audio geometry (e.g. a
            # tiny test config, or a missing audio encoder) — fall back to
            # silence; the zero-init adapters then contribute nothing
            logger.warning("audio feature shape %s != model %s; zeroing",
                           audio_feats.shape[1:], want)
            audio_feats = np.zeros((num_frames, *want), np.float32)
        if audio_feats.shape[0] < num_frames:
            pad = np.zeros((num_frames - audio_feats.shape[0],
                            *audio_feats.shape[1:]), np.float32)
            audio_feats = np.concatenate([audio_feats, pad])

        text, text_mask = self._encode_llama(prompt or "")
        pooled = self._encode_clip_pooled(prompt or "")
        use_cfg = negative_prompt is not None
        ntext, ntext_mask = (self._encode_llama(negative_prompt or "")
                             if use_cfg else (text, text_mask))
        npooled = (self._encode_clip_pooled(negative_prompt or "")
                   if use_cfg else pooled)
        safe_emit_progress(progress_callback, 0.15, "Prompts encoded")

        import cv2

        arr = self.load_image_input(image)
        resized = cv2.resize(arr, (width, height),
                             interpolation=cv2.INTER_LANCZOS4)
        frame = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0)
        frame = frame.transpose(2, 0, 1)[None, :, None]

        lat_h, lat_w = height // s_scale, width // s_scale
        lat_c = vae_cfg.latent_channels
        n_pixel_audio = audio_feats.shape[0]
        # avatar.py:238: pad the clip to whole 32-latent-frame segments
        # (reference hardcodes the 4× VAE stride; generalized to t_scale)
        infer_length = (n_pixel_audio // (32 * t_scale) + 1) * 32 + 1
        video_px = n_pixel_audio // t_scale * t_scale + 1
        video_length = (video_px - 1) // t_scale + 1  # latent frames kept
        fpb = min(frame_per_batch, infer_length)
        if infer_length == fpb or video_length == fpb:
            infer_length = fpb
            shift_offset = 0

        ref_pixels = jnp.repeat(frame, fpb * t_scale - (t_scale - 1), axis=2)
        ref_lat = self.encode_video_latents(ref_pixels).astype(jnp.float32)

        pad_audio = (n_pixel_audio // 128 + 1) * 128 + 4 - n_pixel_audio
        audio_all = np.concatenate(
            [audio_feats, np.zeros((pad_audio, *audio_feats.shape[1:]),
                                   np.float32)])

        if face_mask is not None:
            fm = np.asarray(face_mask, np.float32)
            if fm.ndim == 2:
                fm = fm[None, None, None]
            fm_dev = jnp.asarray(fm)
        else:
            fm_dev = jnp.ones((1, 1, 1, lat_h, lat_w), jnp.float32)
        me = jnp.asarray([motion_exp or [30.0] * 4], jnp.float32)
        mp = jnp.asarray([motion_pose or [25.0] * 4], jnp.float32)
        fps_vec = jnp.asarray([float(fps)], jnp.float32)

        latents_all = self.get_latents((1, lat_c, infer_length, lat_h, lat_w),
                                       seed=seed)
        ts, _ = self.get_timesteps(
            self.scheduler, num_inference_steps,
            **({"shift": shift} if shift is not None else {}))
        sigmas = np.asarray(self.scheduler.sigmas, np.float64)

        graphdef, tf_state = nnx.split(self.transformer)

        def _step_fn(neg_uses_pos_text: bool):
            key = ("avatar_step", fpb, lat_h, lat_w, int(text.shape[1]),
                   use_cfg, neg_uses_pos_text)
            fn = self._jit_cache.get(key)
            if fn is not None:
                return fn

            @jax.jit
            def fn(state, x, t_vec, aud, rlat, g, sig, sig_next,
                   txt_p, tm_p, pl_p, txt_n, tm_n, pl_n):
                m = nnx.merge(graphdef, state)

                def fwd(txt, tmask, pl, a):
                    return m(x.astype(m.dtype), t_vec, txt, tmask, pooled=pl,
                             ref_latents=rlat.astype(m.dtype), audio=a,
                             face_mask=fm_dev, motion_exp=me, motion_pose=mp,
                             fps=fps_vec).astype(jnp.float32)

                v = fwd(txt_p, tm_p, pl_p, aud)
                if use_cfg:
                    # negative branch: uncond audio always; the NEGATIVE text
                    # is swapped for the positive text after step 10
                    # (avatar.py:349-374 dynamic guidance)
                    v_n = fwd(txt_n, tm_n, pl_n, jnp.zeros_like(aud))
                    v = v_n + g * (v - v_n)
                return x + (sig_next - sig) * v

            self._jit_cache[key] = fn
            return fn

        cb = make_mapped_progress(progress_callback, 0.25, 0.9)
        roll = 0
        for i, t in enumerate(np.asarray(ts, np.float64)):
            pred = jnp.zeros_like(latents_all)
            counter = np.zeros((infer_length,), np.int32)
            if i < 10:
                g = (1 - i / len(ts)) * (guidance_scale - 2) + 2
                neg_uses_pos_text = False
            else:
                g = (1 - i / len(ts)) * (dynamic_guidance_end
                                         - dynamic_guidance_start) \
                    + dynamic_guidance_start
                neg_uses_pos_text = True
            step = _step_fn(neg_uses_pos_text)
            txt_n = text if neg_uses_pos_text else ntext
            tm_n = text_mask if neg_uses_pos_text else ntext_mask
            pl_n = pooled if neg_uses_pos_text else npooled
            for index_start in range(0, infer_length, fpb):
                start = index_start - roll
                idx = np.array([ii % infer_length
                                for ii in range(start, start + fpb)])
                aidx = np.array([min(ii % audio_all.shape[0],
                                     audio_all.shape[0] - 1)
                                 for ii in range(start * 4,
                                                 (start + fpb) * 4 - 3)])
                x_win = latents_all[:, :, idx]
                aud = jnp.asarray(audio_all[aidx])[None]
                t_vec = jnp.full((1,), float(t), jnp.float32)
                x_new = step(tf_state, x_win, t_vec, aud, ref_lat,
                             jnp.float32(g), jnp.float32(sigmas[i]),
                             jnp.float32(sigmas[i + 1]),
                             text, text_mask, pooled, txt_n, tm_n, pl_n)
                pred = pred.at[:, :, idx].add(x_new)
                counter[idx] += 1
            latents_all = pred / jnp.asarray(counter, jnp.float32)[None, None,
                                                                   :, None,
                                                                   None]
            roll = (roll + shift_offset) % fpb
            safe_emit_progress(cb, (i + 1) / len(ts),
                               f"Avatar step {i + 1}/{len(ts)}")

        x = latents_all[:, :, :video_length]
        if return_latents:
            safe_emit_progress(progress_callback, 1.0, "Returning latents")
            return x
        frames = self.decode_latents(x)
        safe_emit_progress(progress_callback, 1.0, "Avatar pipeline complete")
        return frames
