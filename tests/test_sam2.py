"""SAM2 promptable segmentation (JAX) — architecture + integration tests on
tiny random configs (checkpoints cannot be fetched in this environment; real
checkpoint loading goes through the "sam2" converter)."""

import numpy as np
import pytest

TINY = dict(
    embed_dim=8,
    num_heads=1,
    stages=(1, 1, 2, 1),
    window_specs=(4, 4, 4, 4),
    global_att_blocks=(2,),
    img_size=64,
    d_model=32,
    decoder_depth=2,
    decoder_heads=2,
    decoder_mlp_dim=64,
)


@pytest.fixture(scope="module")
def model():
    from flax import nnx

    from apex_studio_tpu.mask.sam2 import SAM2Config, SAM2ImageModel

    return SAM2ImageModel(SAM2Config(**TINY), rngs=nnx.Rngs(0))


class TestSAM2Architecture:
    def test_encoder_pyramid_shapes(self, model):
        import jax.numpy as jnp

        img = jnp.zeros((1, 64, 64, 3))
        s16, hi_s8, hi_s4 = model.encode_image(img)
        assert s16.shape == (1, 4, 4, 32)       # stride 16
        assert hi_s8.shape == (1, 8, 8, 8)      # stride 8, d/4
        assert hi_s4.shape == (1, 16, 16, 4)    # stride 4, d/8

    def test_predict_shapes_and_multimask(self, model):
        import jax.numpy as jnp

        img = jnp.zeros((1, 64, 64, 3))
        pts = jnp.asarray([[[0.5, 0.5], [0.2, 0.2], [0.0, 0.0], [0.0, 0.0]]])
        labels = jnp.asarray([[1, 0, -1, -1]], jnp.int32)
        masks, iou, obj = model.predict(img, pts, labels)
        assert masks.shape == (1, 4, 16, 16)  # 3 multimask + 1
        assert iou.shape == (1, 4) and obj.shape == (1, 1)
        assert np.isfinite(np.asarray(masks)).all()

    def test_prompts_change_output(self, model):
        import jax.numpy as jnp

        img = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
        p1 = jnp.asarray([[[0.2, 0.2], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]]])
        p2 = jnp.asarray([[[0.8, 0.8], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]]])
        labels = jnp.asarray([[1, -1, -1, -1]], jnp.int32)
        m1, _, _ = model.predict(img, p1, labels)
        m2, _, _ = model.predict(img, p2, labels)
        assert not np.allclose(np.asarray(m1), np.asarray(m2))

    def test_padding_labels_are_inert(self, model):
        import jax.numpy as jnp

        img = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3)), jnp.float32)
        base = jnp.asarray([[[0.5, 0.5], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]]])
        labels = jnp.asarray([[1, -1, -1, -1]], jnp.int32)
        # Same prompt with different garbage coords under pad labels.
        alt = jnp.asarray([[[0.5, 0.5], [0.9, 0.1], [0.3, 0.7], [0.6, 0.2]]])
        m1, _, _ = model.predict(img, base, labels)
        m2, _, _ = model.predict(img, alt, labels)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)


class TestSAM2PredictorIntegration:
    def test_predictor_from_checkpoint_dir_random_init(self, tmp_path):
        """Config-only checkpoint dir → random-init model, full predict path."""
        import json

        (tmp_path / "config.json").write_text(json.dumps(TINY))
        from apex_studio_tpu.mask.predictor import SAM2Predictor

        pred = SAM2Predictor.from_checkpoint(tmp_path)
        image = np.zeros((48, 72, 3), np.uint8)
        image[10:30, 20:50] = 200
        mask = pred.predict(image, [{"x": 30, "y": 20}], [1])
        assert mask.shape == (48, 72) and mask.dtype == np.uint8

    def test_mask_from_points_uses_sam_when_configured(self, tmp_path, monkeypatch):
        import json

        (tmp_path / "config.json").write_text(json.dumps(TINY))
        monkeypatch.setenv("APEX_SAM2_PATH", str(tmp_path))
        from apex_studio_tpu.mask import predictor as pred_mod
        from apex_studio_tpu.mask.segment import mask_from_points

        pred_mod.reset_sam2_predictor()
        try:
            calls = {}
            orig = pred_mod.SAM2Predictor.predict

            def spy(self, *a, **k):
                calls["hit"] = True
                return orig(self, *a, **k)

            monkeypatch.setattr(pred_mod.SAM2Predictor, "predict", spy)
            image = np.zeros((32, 32, 3), np.uint8)
            mask = mask_from_points(image, [{"x": 16, "y": 16}], [1])
            assert calls.get("hit") is True
            assert mask.shape == (32, 32)
        finally:
            pred_mod.reset_sam2_predictor()

    def test_fallback_without_checkpoint(self, monkeypatch):
        from apex_studio_tpu.mask import predictor as pred_mod

        monkeypatch.delenv("APEX_SAM2_PATH", raising=False)
        pred_mod.reset_sam2_predictor()
        assert pred_mod.get_sam2_predictor() is None
        pred_mod.reset_sam2_predictor()


def test_sam2_converter_maps_official_keys():
    from apex_studio_tpu.loaders.converters import convert_keys

    sd = {
        "image_encoder.trunk.blocks.0.attn.qkv.weight": np.zeros((24, 8), np.float32),
        "image_encoder.neck.convs.0.conv.weight": np.zeros((32, 8, 1, 1), np.float32),
        "sam_prompt_encoder.point_embeddings.1.weight": np.zeros((1, 32), np.float32),
        "sam_mask_decoder.transformer.layers.0.self_attn.q_proj.weight":
            np.zeros((32, 32), np.float32),
        "sam_mask_decoder.iou_token.weight": np.zeros((1, 32), np.float32),
        "sam_mask_decoder.output_upscaling.0.weight": np.zeros((32, 8, 2, 2), np.float32),
        "memory_encoder.something.weight": np.zeros((1,), np.float32),
    }
    out = convert_keys("sam2", sd)
    assert "trunk.blocks.0.qkv.kernel" in out
    assert "neck.convs.0.kernel" in out
    assert "prompt_encoder.point_embeddings.1" in out
    assert "mask_decoder.layers.0.self_attn.q_proj.kernel" in out
    assert "mask_decoder.iou_token" in out
    assert "mask_decoder.upscale1.kernel" in out
    assert not any(k.startswith("memory_") for k in out)


class TestSAM2MemoryBank:
    def _video_model(self):
        from apex_studio_tpu.mask.sam2 import SAM2Config, SAM2VideoModel
        from flax import nnx

        cfg = SAM2Config.from_dict(
            {"embed_dim": 16, "stages": [1, 1, 1, 1], "num_heads": 1,
             "d_model": 32})
        return SAM2VideoModel(cfg, rngs=nnx.Rngs(0))

    def test_memory_conditioning_changes_prediction(self):
        import jax.numpy as jnp

        m = self._video_model()
        img = jnp.asarray(
            np.random.default_rng(0).uniform(size=(1, 128, 128, 3)), jnp.float32)
        mask_a, _, mem = m.track_step(img, [])
        mask_b, _, _ = m.track_step(img, [(mem, 0)])
        # conditioning on a memory must alter the decoder's input features
        assert np.abs(np.asarray(mask_a) - np.asarray(mask_b)).max() > 1e-6

    def test_track_video_rolls_bank(self, monkeypatch):
        from apex_studio_tpu.mask.predictor import SAM2Predictor, sam2_track_video

        m = self._video_model()
        pred = SAM2Predictor(m, img_size=128)
        frames = [np.random.default_rng(i).integers(
            0, 255, size=(64, 64, 3), dtype=np.uint8) for i in range(10)]
        out = sam2_track_video(
            pred, frames, [{"x": 32, "y": 32}], [1], start_frame=0)
        assert set(out) == set(range(10))
        assert all(v.shape == (64, 64) for v in out.values())

    def test_memory_encoder_fuses_mask(self):
        import jax.numpy as jnp

        m = self._video_model()
        feat = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 8, 8, 32)), jnp.float32)
        logits_a = jnp.full((1, 128, 128, 1), -10.0, jnp.float32)
        logits_b = jnp.full((1, 128, 128, 1), 10.0, jnp.float32)
        ma = np.asarray(m.memory_encoder(feat, logits_a))
        mb = np.asarray(m.memory_encoder(feat, logits_b))
        assert ma.shape == (1, 8, 8, 64)
        assert np.abs(ma - mb).max() > 1e-6


class TestCheckpointAutoDownload:
    """Checkpoint resolution + loud fallback (reference mask/mask.py:57-80,
    :2069): explicit path -> auto-download per MASK_MODEL -> classical
    fallback surfaced on /system/memory."""

    def test_auto_download_resolves_and_caches(self, tmp_path, monkeypatch):
        from apex_studio_tpu.mask import predictor as P

        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        monkeypatch.delenv("APEX_SAM2_PATH", raising=False)
        monkeypatch.setenv("MASK_MODEL", "sam2_tiny")
        calls = []

        def fake_download(url, dest, **kw):
            calls.append(url)
            dest.parent.mkdir(parents=True, exist_ok=True)
            dest.write_bytes(b"ckpt")
            return dest

        import apex_studio_tpu.downloads.api as dl

        monkeypatch.setattr(dl, "download_file", fake_download)
        p = P._resolve_checkpoint()
        assert p is not None and p.exists()
        assert "sam2.1_hiera_tiny.pt" in str(p)
        assert calls and "dl.fbaipublicfiles.com" in calls[0]
        # second resolve: cached, no new download
        p2 = P._resolve_checkpoint()
        assert p2 == p and len(calls) == 1

    def test_sam3_tier_resolves(self, tmp_path, monkeypatch):
        from apex_studio_tpu.mask import predictor as P

        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        monkeypatch.delenv("APEX_SAM2_PATH", raising=False)
        monkeypatch.setenv("MASK_MODEL", "sam3")

        def fake_download(url, dest, **kw):
            dest.parent.mkdir(parents=True, exist_ok=True)
            dest.write_bytes(b"ckpt")
            return dest

        import apex_studio_tpu.downloads.api as dl

        monkeypatch.setattr(dl, "download_file", fake_download)
        p = P._resolve_checkpoint()
        assert p is not None and p.name == "sam3.pt"

    def test_failed_download_is_loud(self, tmp_path, monkeypatch, caplog):
        from apex_studio_tpu.mask import predictor as P

        monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "home"))
        monkeypatch.delenv("APEX_SAM2_PATH", raising=False)
        monkeypatch.setenv("MASK_MODEL", "sam2_tiny")

        def boom(url, dest, **kw):
            raise RuntimeError("no egress")

        import apex_studio_tpu.downloads.api as dl

        monkeypatch.setattr(dl, "download_file", boom)
        P.reset_sam2_predictor()
        import logging as _logging

        with caplog.at_level(_logging.ERROR, logger="apex.mask.sam2"):
            pred = P.get_sam2_predictor()
        assert pred is None
        assert any("GrabCut" in r.message for r in caplog.records)
        status = P.mask_backend_status()
        assert status["backend"] == "classical"
        assert "download failed" in str(status["error"])
        P.reset_sam2_predictor()

    def test_status_surfaces_on_system_memory(self, server):
        import requests

        r = requests.get(server + "/system/memory")
        assert r.ok
        assert "mask_backend" in r.json()
        assert r.json()["mask_backend"]["backend"] in ("classical", "sam2")
