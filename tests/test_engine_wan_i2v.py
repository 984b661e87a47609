import numpy as np
import pytest
import yaml

from tests.test_engine_wan import WAN_TINY
from tests.test_engine_zimage import make_tokenizer


def make_i2v_engine(tmp_path):
    doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
    doc["spec"]["model_type"] = "i2v"
    # i2v transformer: 4 noise + 8 condition channels (4 mask + 4 latent),
    # CLIP image branch.
    tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
    # tiny VAE has temporal_scale=2 → condition = 2 mask + 4 latent channels;
    # noise 4 → in_channels 10.
    tf["config"]["in_channels"] = 10
    tf["config"]["image_dim"] = 16
    # added_kv_proj_dim is the DiT inner dim (image features are projected to
    # inner_dim by the image embedder before the added-kv projections).
    tf["config"]["added_kv_proj_dim"] = 48
    doc["spec"]["components"].append(
        {
            "type": "helper",
            "name": "image_encoder",
            "base": "CLIPVisionModel",
            "config": {
                "hidden_size": 16,
                "intermediate_size": 32,
                "num_hidden_layers": 2,
                "num_attention_heads": 2,
                "image_size": 28,
                "patch_size": 14,
            },
        }
    )
    path = tmp_path / "wan-tiny-i2v.yml"
    path.write_text(yaml.safe_dump(doc))
    from apex_studio_tpu.engine import UniversalEngine

    eng = UniversalEngine(path, model_type="i2v")
    eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
    return eng


def sample_image(h=32, w=32):
    img = np.zeros((h, w, 3), np.uint8)
    img[8:24, 8:24] = [200, 120, 40]
    return img


class TestCLIPVision:
    def test_forward_shape(self):
        import jax
        import jax.numpy as jnp

        from apex_studio_tpu.models.text_encoders.clip_vision import (
            CLIPVisionConfig,
            CLIPVisionEncoder,
        )

        cfg = CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                               num_hidden_layers=2, num_attention_heads=2,
                               image_size=28, patch_size=14)
        model = CLIPVisionEncoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
        px = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 28, 28))
        out = model(px)
        assert out.shape == (1, 1 + 4, 16)  # cls + 2x2 patches

    def test_preprocess(self):
        from apex_studio_tpu.models.text_encoders.clip_vision import preprocess_clip_image

        arr = preprocess_clip_image(sample_image(), size=28)
        assert arr.shape == (1, 3, 28, 28)
        assert np.isfinite(arr).all()

    def test_converter(self):
        from apex_studio_tpu.loaders.converters import convert_keys

        sd = {
            "vision_model.embeddings.class_embedding": np.zeros((8,), np.float32),
            "vision_model.embeddings.patch_embedding.weight": np.zeros((8, 3, 14, 14), np.float32),
            "vision_model.embeddings.position_embedding.weight": np.zeros((5, 8), np.float32),
            "vision_model.encoder.layers.0.self_attn.q_proj.weight": np.zeros((8, 8), np.float32),
            "vision_model.pre_layrnorm.weight": np.zeros((8,), np.float32),
            "visual_projection.weight": np.zeros((4, 8), np.float32),
        }
        out = convert_keys("clip_vision", sd)
        assert "class_embedding" in out
        assert "patch_embedding.kernel" in out
        assert "layers.0.self_attn.q_proj.kernel" in out
        assert not any("visual_projection" in k for k in out)


class TestWanI2V:
    def test_i2v_produces_frames(self, tmp_path):
        eng = make_i2v_engine(tmp_path)
        frames = eng.run(
            image=sample_image(),
            prompt="hello",
            height=32,
            width=32,
            num_frames=5,
            num_inference_steps=2,
            guidance_scale=1.0,
            seed=3,
        )
        assert len(frames) == 5
        assert frames[0].shape == (32, 32, 3)

    def test_condition_channels(self, tmp_path):
        eng = make_i2v_engine(tmp_path)
        eng.load_components(return_latents=False)
        cond = eng.build_condition(sample_image(), num_frames=5, height=32, width=32)
        # 4 mask channels (t_scale=2 → packing 2... config temporal scale 2 here)
        assert cond.shape[0] == 1
        assert cond.shape[2] == 3  # (5-1)/2+1 latent frames
        assert np.isfinite(np.asarray(cond)).all()

    def test_requires_image(self, tmp_path):
        eng = make_i2v_engine(tmp_path)
        with pytest.raises(ValueError, match="image"):
            eng.run(prompt="x", height=32, width=32, num_frames=5,
                    num_inference_steps=1, guidance_scale=1.0)


def sample_video(n=5, h=32, w=32):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n)]


class TestWanV2V:
    def make_engine(self, tmp_path):
        doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
        doc["spec"]["model_type"] = "v2v"
        path = tmp_path / "wan-tiny-v2v.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="v2v")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        return eng

    def test_v2v_produces_frames(self, tmp_path):
        eng = self.make_engine(tmp_path)
        frames = eng.run(
            video=sample_video(), prompt="restyle", height=32, width=32,
            strength=0.6, num_inference_steps=3, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 5
        assert frames[0].shape == (32, 32, 3)

    def test_low_strength_stays_close_to_source(self, tmp_path):
        eng = self.make_engine(tmp_path)
        vid = sample_video()
        lo = eng.run(video=vid, prompt="x", height=32, width=32, strength=0.1,
                     num_inference_steps=10, guidance_scale=1.0, seed=1,
                     return_latents=True)
        hi = eng.run(video=vid, prompt="x", height=32, width=32, strength=0.9,
                     num_inference_steps=10, guidance_scale=1.0, seed=1,
                     return_latents=True)
        src = eng.encode_video_latents(
            __import__("apex_studio_tpu.engine.wan", fromlist=["x"])
            ._frames_to_video_tensor(vid, 32, 32))
        d_lo = float(np.abs(np.asarray(lo) - np.asarray(src)).mean())
        d_hi = float(np.abs(np.asarray(hi) - np.asarray(src)).mean())
        assert d_lo < d_hi  # weaker corruption → closer to the source video

    def test_requires_video(self, tmp_path):
        eng = self.make_engine(tmp_path)
        with pytest.raises(ValueError, match="video"):
            eng.run(prompt="x", height=32, width=32, num_inference_steps=1,
                    guidance_scale=1.0)


class TestWanFFLF:
    def make_engine(self, tmp_path):
        doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
        doc["spec"]["model_type"] = "fflf"
        tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
        tf["config"]["in_channels"] = 10  # 4 noise + 2 mask + 4 latent
        path = tmp_path / "wan-tiny-fflf.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="fflf")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        return eng

    def test_fflf_produces_frames(self, tmp_path):
        eng = self.make_engine(tmp_path)
        frames = eng.run(
            image=sample_image(), last_image=sample_image()[::-1].copy(),
            prompt="morph", height=32, width=32, num_frames=5,
            num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 5

    def test_condition_marks_both_endpoints(self, tmp_path):
        eng = self.make_engine(tmp_path)
        eng.load_components(return_latents=False)
        cond = eng.build_fflf_condition(
            sample_image(), sample_image()[::-1].copy(), 5, 32, 32)
        mask = np.asarray(cond)[:, :2]  # t_scale=2 mask channels
        assert mask[0, 0, 0].max() == 1.0   # first latent frame valid
        assert mask[0, -1, -1].max() == 1.0  # last latent frame valid
        assert mask[0, :, 1].max() == 0.0    # middle invalid

    def test_requires_both_frames(self, tmp_path):
        eng = self.make_engine(tmp_path)
        with pytest.raises(ValueError, match="last_image"):
            eng.run(image=sample_image(), prompt="x", height=32, width=32,
                    num_frames=5, num_inference_steps=1, guidance_scale=1.0)


class TestWanInpaint:
    def make_engine(self, tmp_path):
        doc = yaml.safe_load(yaml.safe_dump(WAN_TINY))
        doc["spec"]["model_type"] = "inp"
        tf = next(c for c in doc["spec"]["components"] if c["type"] == "transformer")
        tf["config"]["in_channels"] = 10  # 4 noise + 2 mask + 4 latent
        path = tmp_path / "wan-tiny-inp.yml"
        path.write_text(yaml.safe_dump(doc))
        from apex_studio_tpu.engine import UniversalEngine

        eng = UniversalEngine(path, model_type="inp")
        eng._spec_for_type("text_encoder")["tokenizer"] = make_tokenizer()
        return eng

    def square_mask(self, h=32, w=32):
        m = np.zeros((h, w), np.uint8)
        m[8:24, 8:24] = 255
        return m

    def test_inpaint_produces_frames(self, tmp_path):
        eng = self.make_engine(tmp_path)
        frames = eng.run(
            video=sample_video(), mask=self.square_mask(), prompt="fill the hole",
            height=32, width=32, num_inference_steps=2, guidance_scale=1.0, seed=3,
        )
        assert len(frames) == 5
        assert frames[0].shape == (32, 32, 3)

    def test_condition_masks_known_region(self, tmp_path):
        eng = self.make_engine(tmp_path)
        eng.load_components(return_latents=False)
        eng._inp_frames = sample_video()
        eng._inp_masks = [self.square_mask()]
        cond = eng.build_condition(eng._inp_frames[0], 5, 32, 32)
        m = np.asarray(cond)[:, :2]  # validity channels (t_scale=2)
        lat_h = m.shape[-1]
        # center (masked) → 0, corner (known) → 1
        assert m[0, 0, 0, lat_h // 2, lat_h // 2] == 0.0
        assert m[0, 0, 0, 0, 0] == 1.0

    def test_requires_mask(self, tmp_path):
        eng = self.make_engine(tmp_path)
        with pytest.raises(ValueError, match="mask"):
            eng.run(video=sample_video(), prompt="x", height=32, width=32,
                    num_inference_steps=1, guidance_scale=1.0)
