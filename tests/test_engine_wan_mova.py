"""MOVA dual-tower A/V family on tiny random weights (reference
src/engine/wan/mova.py, src/transformer/wan/mova{,_audio}/model.py,
src/helpers/wan/mova.py, src/vae/movaaudiovae/model.py)."""

import copy

import numpy as np
import pytest
import yaml
import jax.numpy as jnp
from flax import nnx

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer

AUDIO_TF = {
    "type": "transformer", "name": "audio_transformer",
    "base": "wan.mova_audio",
    "config": {"dim": 32, "in_dim": 8, "ffn_dim": 48, "out_dim": 8,
               "text_dim": 32, "freq_dim": 32, "patch_size": [1],
               "num_heads": 2, "num_layers": 2, "vae_type": "dac"},
}
BRIDGE = {
    "type": "helper", "name": "dual_tower_bridge", "base": "wan.mova",
    "config": {"visual_layers": 2, "audio_layers": 2,
               "visual_hidden_dim": 48, "audio_hidden_dim": 32,
               "head_dim": 16, "interaction_strategy": "full",
               "apply_cross_rope": True, "pooled_adaln": True},
}
DAC = {
    "type": "vae", "name": "audio_vae", "base": "dac",
    "config": {"encoder_dim": 4, "encoder_rates": [2, 2], "latent_dim": 8,
               "decoder_dim": 16, "decoder_rates": [2, 2],
               "sample_rate": 16000, "continuous": True},
}


def _mova_manifest():
    doc = copy.deepcopy(WAN_TINY)
    doc["metadata"]["id"] = "wan-mova-tiny-test"
    doc["spec"]["model_type"] = ["mova"]
    tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
    # DiffSynth-named video config: noise 4ch + condition (t_scale 2 + z 4)
    tf["base"] = "wan.mova"
    tf["config"] = {"dim": 48, "num_heads": 2, "in_dim": 10, "out_dim": 4,
                    "ffn_dim": 64, "text_dim": 32, "freq_dim": 32,
                    "eps": 1e-6, "patch_size": [1, 2, 2], "num_layers": 2,
                    "has_image_input": False}
    doc["spec"]["components"] += [AUDIO_TF, BRIDGE, DAC]
    return doc


class TestMovaAudioModel:
    def test_forward_shapes(self):
        from apex_studio_tpu.models.transformers.wan_mova import (
            MovaAudioConfig, MovaWanAudioModel)

        cfg = MovaAudioConfig.from_dict(AUDIO_TF["config"])
        m = MovaWanAudioModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                              rngs=nnx.Rngs(0))
        x = jnp.ones((1, 8, 12))
        out = m(x, jnp.ones((1,)), jnp.zeros((1, 5, 32)))
        assert out.shape == (1, 8, 12)
        assert np.isfinite(np.asarray(out)).all()

    def test_oobleck_rope_leaves_tail_unrotated(self):
        from apex_studio_tpu.models.transformers.wan_mova import (
            MovaAudioConfig, MovaWanAudioModel)

        cfg = MovaAudioConfig.from_dict(
            {**AUDIO_TF["config"], "vae_type": "oobleck"})
        m = MovaWanAudioModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                              rngs=nnx.Rngs(0))
        cos, sin = m.rope_tables(6)
        d0 = (cfg.head_dim - 2 * (cfg.head_dim // 3)) // 2
        np.testing.assert_allclose(np.asarray(cos[0, :, 0, d0:]), 1.0)
        np.testing.assert_allclose(np.asarray(sin[0, :, 0, d0:]), 0.0)


class TestDualTowerBridge:
    def test_interaction_strategies(self):
        from apex_studio_tpu.models.transformers.wan_mova import (
            interaction_layers)

        assert interaction_layers("shallow_focus", 30) == list(range(10))
        assert interaction_layers("distributed", 9) == [0, 3, 6]
        assert interaction_layers("progressive", 12) == list(range(8)) + [8, 11]
        assert interaction_layers("full", 3) == [0, 1, 2]

    def test_bridge_identity_outside_layers_and_shapes_inside(self):
        from apex_studio_tpu.models.transformers.wan_mova import (
            DualTowerBridge, MovaBridgeConfig)

        cfg = MovaBridgeConfig.from_dict(
            {**BRIDGE["config"], "interaction_strategy": "shallow_focus",
             "visual_layers": 6, "audio_layers": 6})
        b = DualTowerBridge(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                            rngs=nnx.Rngs(0))
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=(1, 2 * 2 * 2, 48)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(1, 5, 32)), jnp.float32)
        xf, yf = b.build_aligned_freqs(24.0, (2, 2, 2), 5)
        v2, a2 = b(0, v, a, x_freqs=xf, y_freqs=yf, video_grid=(2, 2, 2))
        assert v2.shape == v.shape and a2.shape == a.shape
        assert not np.allclose(np.asarray(v2), np.asarray(v))
        # deepest layer not in shallow_focus(2)=… mapping → identity
        v3, a3 = b(5, v, a, video_grid=(2, 2, 2))
        np.testing.assert_array_equal(np.asarray(v3), np.asarray(v))
        np.testing.assert_array_equal(np.asarray(a3), np.asarray(a))

    def test_aligned_freqs_video_positions_in_audio_steps(self):
        from apex_studio_tpu.models.transformers.wan_mova import (
            DualTowerBridge, MovaBridgeConfig)

        cfg = MovaBridgeConfig.from_dict(
            {**BRIDGE["config"], "audio_fps": 8.0})
        b = DualTowerBridge(cfg, rngs=nnx.Rngs(0))
        (cos_v, _), (cos_a, _) = b.build_aligned_freqs(16.0, (3, 1, 1), 4)
        # scale = audio_fps / (fps/4) = 8/4 = 2 → video frame positions 0,2,4
        np.testing.assert_allclose(np.asarray(cos_v[0]), np.asarray(cos_a[0]))
        np.testing.assert_allclose(np.asarray(cos_v[1]), np.asarray(cos_a[2]))


class TestDACVAE:
    def test_decode_shape_and_roundtrip(self):
        from apex_studio_tpu.models.vaes.mova_audio_vae import DACConfig, DACVAE

        cfg = DACConfig.from_dict(DAC["config"])
        vae = DACVAE(cfg, rngs=nnx.Rngs(0))
        assert cfg.hop_length == 4
        z = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 6)),
                        jnp.float32)
        wav = vae.decode(z)
        assert wav.shape == (1, 1, 24)
        assert np.isfinite(np.asarray(wav)).all()
        z2 = vae.encode(wav)
        assert z2.shape == (1, 8, 6)

    def test_decoder_matches_torch_oracle(self):
        """DAC decoder numerics (snake + weight-norm convs + transposed
        upsample, model.py:778) vs an inline torch re-implementation."""
        torch = pytest.importorskip("torch")
        import math
        import torch.nn as nn

        from apex_studio_tpu.loaders.converters import convert_keys
        from apex_studio_tpu.loaders.state_mapping import apply_state_dict
        from apex_studio_tpu.models.vaes.mova_audio_vae import DACConfig, DACVAE

        def snake(x, a):
            return x + (a + 1e-9).reciprocal() * torch.sin(a * x) ** 2

        class TSnake(nn.Module):
            def __init__(self, ch):
                super().__init__()
                self.alpha = nn.Parameter(torch.ones(1, ch, 1))

            def forward(self, x):
                return snake(x, self.alpha)

        def wn(m):
            return nn.utils.parametrizations.weight_norm(m) \
                if hasattr(nn.utils, "parametrizations") else nn.utils.weight_norm(m)

        class TRes(nn.Module):
            def __init__(self, d, dil):
                super().__init__()
                self.block = nn.Sequential(
                    TSnake(d),
                    nn.utils.weight_norm(nn.Conv1d(
                        d, d, 7, dilation=dil, padding=((7 - 1) * dil) // 2)),
                    TSnake(d),
                    nn.utils.weight_norm(nn.Conv1d(d, d, 1)))

            def forward(self, x):
                return x + self.block(x)

        class TDecBlock(nn.Module):
            def __init__(self, cin, cout, s):
                super().__init__()
                self.block = nn.Sequential(
                    TSnake(cin),
                    nn.utils.weight_norm(nn.ConvTranspose1d(
                        cin, cout, 2 * s, s, padding=math.ceil(s / 2),
                        output_padding=s % 2)),
                    TRes(cout, 1), TRes(cout, 3), TRes(cout, 9))

            def forward(self, x):
                return self.block(x)

        class TDecoder(nn.Module):
            def __init__(self, ld, ch, rates):
                super().__init__()
                layers = [nn.utils.weight_norm(nn.Conv1d(ld, ch, 7, padding=3))]
                out = ch
                for i, s in enumerate(rates):
                    layers.append(TDecBlock(ch // 2 ** i, ch // 2 ** (i + 1), s))
                    out = ch // 2 ** (i + 1)
                layers += [TSnake(out),
                           nn.utils.weight_norm(nn.Conv1d(out, 1, 7, padding=3)),
                           nn.Tanh()]
                self.model = nn.Sequential(*layers)

            def forward(self, x):
                return self.model(x)

        class TOracle(nn.Module):
            def __init__(self):
                super().__init__()
                self.post_quant_conv = nn.Conv1d(8, 8, 1)
                self.decoder = TDecoder(8, 16, [2, 2])

            def forward(self, z):
                return self.decoder(self.post_quant_conv(z))

        torch.manual_seed(0)
        oracle = TOracle().eval()
        sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
        cfg = DACConfig.from_dict(DAC["config"])
        vae = DACVAE(cfg, rngs=nnx.Rngs(0))
        missing, unexpected = apply_state_dict(
            vae, convert_keys("dac_vae", sd), strict=False)
        dec_unexpected = [k for k in unexpected if not k.startswith("encoder")]
        assert not dec_unexpected, dec_unexpected[:5]

        z = np.random.default_rng(1).normal(size=(1, 8, 6)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(z)).numpy()
        out = np.asarray(vae.decode(jnp.asarray(z)))
        np.testing.assert_allclose(out, ref, atol=2e-5)


class TestWanMovaEngine:
    def test_joint_i2v_produces_frames_and_waveform(self, tmp_path):
        path = tmp_path / "mova.yml"
        path.write_text(yaml.safe_dump(_mova_manifest()))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="mova")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        img = np.full((32, 32, 3), 128, np.uint8)
        out = eng.run(image=img, prompt="a drum", height=32, width=32,
                      num_frames=5, fps=4.0, num_inference_steps=2,
                      guidance_scale=2.0, boundary_ratio=None, seed=0)
        assert isinstance(out, tuple) and len(out) == 3
        frames, wav, sr = out
        assert len(frames) == 5 and frames[0].shape == (32, 32, 3)
        assert sr == 16000
        # 5 frames at 4 fps at 16 kHz → 20000 samples ≈ latent ceil/hop·hop
        assert wav.shape[0] == 1 and wav.shape[-1] >= 20000
        assert np.isfinite(wav).all()

    def test_return_latents_shapes(self, tmp_path):
        path = tmp_path / "mova2.yml"
        path.write_text(yaml.safe_dump(_mova_manifest()))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="mova")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        img = np.full((32, 32, 3), 60, np.uint8)
        v, a = eng.run(image=img, prompt="quiet", height=32, width=32,
                       num_frames=3, fps=4.0, num_inference_steps=1,
                       guidance_scale=1.0, negative_prompt=None,
                       boundary_ratio=None, seed=1, return_latents=True)
        assert np.asarray(v).shape == (1, 4, 2, 16, 16)
        assert np.asarray(a).shape[1] == 8
