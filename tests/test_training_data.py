"""Training data pipeline (reference apps/train/zimage/{text,vae}_encode.py,
convert_peft_lora_to_comfyui.py, datasets): encode a tiny dataset through
the tiny zimage manifest and train a LoRA step from the cached encodings."""

import csv

import numpy as np
import pytest
import yaml

from tests.test_engine_zimage import TINY_MANIFEST, make_tokenizer


@pytest.fixture()
def dataset(tmp_path):
    import cv2

    ddir = tmp_path / "data"
    ddir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        img = (rng.uniform(0, 255, size=(48, 64, 3))).astype(np.uint8)
        path = ddir / f"img_{i}.png"
        cv2.imwrite(str(path), img)
        rows.append({"image_path": str(path), "caption": f"sample {i}"})
    csv_path = ddir / "captions.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image_path", "caption"])
        w.writeheader()
        w.writerows(rows)
    manifest = tmp_path / "zimage-tiny.yml"
    manifest.write_text(yaml.safe_dump(TINY_MANIFEST))
    return ddir, csv_path, manifest


def _patch_tokenizer():
    from apex_studio_tpu.engine import registry as engine_registry_mod

    orig = engine_registry_mod.UniversalEngine.__new__

    def patched(cls, yaml_path, model_type=None, **kwargs):
        eng = orig(cls, yaml_path, model_type=model_type, **kwargs)
        spec = eng._spec_for_type("text_encoder")
        if spec is not None:
            spec["tokenizer"] = make_tokenizer()
        return eng

    engine_registry_mod.UniversalEngine.__new__ = patched
    return orig


class TestEncodePipeline:
    def test_text_and_vae_encode_roundtrip(self, dataset, tmp_path):
        from apex_studio_tpu.loaders.safetensors_io import load_safetensors
        from apex_studio_tpu.training.data import (
            LoraDataset, encode_images_vae, encode_texts)

        ddir, csv_path, manifest = dataset
        from apex_studio_tpu.engine import registry as engine_registry_mod

        orig = _patch_tokenizer()
        try:
            tpath = encode_texts(manifest, csv_path,
                                 tmp_path / "text.safetensors",
                                 max_sequence_length=16)
            vpath = encode_images_vae(manifest, csv_path,
                                      tmp_path / "vae.safetensors",
                                      max_area=48 * 64, mod_value=16)
        finally:
            engine_registry_mod.UniversalEngine.__new__ = orig

        text = load_safetensors(tpath)
        lats = load_safetensors(vpath)
        assert len(text) == 3 and len(lats) == 3
        for k, v in lats.items():
            assert v.ndim == 3 and np.isfinite(v).all()  # [C, h, w]
        ds = LoraDataset(csv_path, tpath, vpath)
        assert len(ds) == 3
        batch = next(ds.batches(batch_size=2, seed=1))
        assert len(batch) == 2
        assert batch[0]["latents"].ndim == 3
        assert batch[0]["text_embeds"].shape[-1] == text[batch[0]["image_path"]].shape[-1]

    def test_dataset_missing_encoding_raises(self, dataset, tmp_path):
        from apex_studio_tpu.loaders.safetensors_io import save_safetensors
        from apex_studio_tpu.training.data import LoraDataset

        ddir, csv_path, _ = dataset
        save_safetensors(tmp_path / "t.safetensors",
                         {"other": np.zeros((2, 4), np.float32)})
        save_safetensors(tmp_path / "v.safetensors",
                         {"other": np.zeros((4, 2, 2), np.float32)})
        with pytest.raises(KeyError):
            LoraDataset(csv_path, tmp_path / "t.safetensors",
                        tmp_path / "v.safetensors")


class TestLoraConversion:
    def test_peft_to_comfyui_keys(self):
        from apex_studio_tpu.training.data import convert_peft_lora_to_comfyui

        sd = {
            "base_model.model.layers.0.attention.to_q.lora_A.weight":
                np.zeros((4, 8), np.float32),
            "base_model.model.layers.0.attention.to_q.lora_B.weight":
                np.zeros((8, 4), np.float32),
        }
        out = convert_peft_lora_to_comfyui(sd)
        assert set(out) == {
            "layers.0.attention.to_q.lora_down.weight",
            "layers.0.attention.to_q.lora_up.weight",
        }

    def test_collision_raises(self):
        from apex_studio_tpu.training.data import convert_peft_lora_to_comfyui

        sd = {
            "base_model.model.x.lora_A.weight": np.zeros((1,), np.float32),
            "x.lora_A.weight": np.zeros((1,), np.float32),
        }
        with pytest.raises(ValueError):
            convert_peft_lora_to_comfyui(sd)
