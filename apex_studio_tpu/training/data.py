"""Training data pipeline: caption → text-encode → VAE-encode → dataset.

Counterpart of the reference's ``apps/train/zimage`` scripts:
- ``caption.py`` — LLaVA (joycaption) captions for an image folder → csv
- ``text_encode.py`` — captions.csv prompts → text_encodings.safetensors
- ``vae_encode.py`` — captions.csv images → vae_encodings.safetensors
- ``convert_peft_lora_to_comfyui.py`` — PEFT lora_A/B keys → ComfyUI
  lora_down/up keys
- ``datasets/`` — the train loop reads the two safetensors keyed by
  image path

Each stage is a plain function (CLI wrappers in ``python -m
apex_studio_tpu.training.data``) so they compose with the LoRA train step
in training/lora.py. Encoders run through UniversalEngine on whatever
backend jax selects; outputs are numpy safetensors readable by both this
repo and the reference's torch loaders.
"""

from __future__ import annotations

import argparse
import csv
import logging
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from apex_studio_tpu.loaders.safetensors_io import (
    load_safetensors,
    save_safetensors,
)

logger = logging.getLogger(__name__)

CAPTION_MODEL = "fancyfeast/llama-joycaption-beta-one-hf-llava"
CAPTION_PROMPT = "Write a brief caption for this image in a formal tone."
_IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".webp", ".bmp"}


def caption_images(
    dataset_dir: Path,
    out_csv: Optional[Path] = None,
    model_name: str = CAPTION_MODEL,
    prompt: str = CAPTION_PROMPT,
    max_new_tokens: int = 512,
    glob_pattern: str = "*",
) -> Path:
    """reference caption.py:55 — caption every image in a folder to csv
    rows (image_path, caption) using a LLaVA chat model."""
    dataset_dir = Path(dataset_dir)
    out_csv = Path(out_csv) if out_csv else dataset_dir / "captions.csv"
    images = sorted(
        p for p in dataset_dir.glob(glob_pattern)
        if p.suffix.lower() in _IMAGE_EXTS)
    if not images:
        raise FileNotFoundError(f"no images under {dataset_dir}")

    import torch
    from PIL import Image
    from transformers import AutoProcessor, LlavaForConditionalGeneration

    processor = AutoProcessor.from_pretrained(model_name)
    model = LlavaForConditionalGeneration.from_pretrained(
        model_name, torch_dtype=torch.float32).eval()

    rows = []
    for path in images:
        image = Image.open(path).convert("RGB")
        convo = [{"role": "user",
                  "content": [{"type": "image"},
                              {"type": "text", "text": prompt}]}]
        text = processor.apply_chat_template(convo, tokenize=False,
                                             add_generation_prompt=True)
        inputs = processor(images=[image], text=text, return_tensors="pt")
        with torch.no_grad():
            out = model.generate(**inputs, max_new_tokens=max_new_tokens,
                                 do_sample=False)
        new = out[0][inputs["input_ids"].shape[1]:]
        caption = processor.tokenizer.decode(
            new, skip_special_tokens=True).strip()
        rows.append({"image_path": str(path), "caption": caption})
        logger.info("captioned %s", path.name)

    with open(out_csv, "w", newline="", encoding="utf-8") as f:
        writer = csv.DictWriter(f, fieldnames=["image_path", "caption"])
        writer.writeheader()
        writer.writerows(rows)
    return out_csv


def _read_captions(captions_csv: Path) -> List[Dict[str, str]]:
    with open(captions_csv, "r", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def encode_texts(
    yaml_path: Path,
    captions_csv: Path,
    out_path: Path,
    max_sequence_length: int = 512,
) -> Path:
    """reference text_encode.py:67 — encode each caption with the
    manifest's text encoder; one tensor per image path."""
    from apex_studio_tpu.engine import UniversalEngine

    engine = UniversalEngine(yaml_path)
    engine.load_component_by_type("text_encoder")
    out: Dict[str, np.ndarray] = {}
    for row in _read_captions(Path(captions_csv)):
        hidden, mask = engine.text_encoder.encode(
            [row["caption"]], max_sequence_length=max_sequence_length)
        h = np.asarray(hidden[0], np.float32)
        out[row["image_path"]] = h[np.asarray(mask[0]).astype(bool)]
    save_safetensors(out_path, out, metadata={"format": "np"})
    return Path(out_path)


def _aspect_resize(arr: np.ndarray, max_area: int, mod: int) -> np.ndarray:
    import cv2

    h, w = arr.shape[:2]
    scale = min(1.0, (max_area / (h * w)) ** 0.5)
    nh = max(mod, int(round(h * scale / mod)) * mod)
    nw = max(mod, int(round(w * scale / mod)) * mod)
    return cv2.resize(arr, (nw, nh), interpolation=cv2.INTER_AREA)


def encode_images_vae(
    yaml_path: Path,
    captions_csv: Path,
    out_path: Path,
    max_area: int = 720 * 1280,
    mod_value: int = 16,
) -> Path:
    """reference vae_encode.py:82 — VAE-encode each image (aspect-ratio
    resized to ≤ max_area, dims a multiple of mod_value)."""
    import jax.numpy as jnp

    from apex_studio_tpu.engine import UniversalEngine

    engine = UniversalEngine(yaml_path)
    engine.load_component_by_type("vae")
    out: Dict[str, np.ndarray] = {}
    for row in _read_captions(Path(captions_csv)):
        arr = engine.load_image_input(row["image_path"])
        arr = _aspect_resize(arr, max_area, mod_value)
        px = (arr.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)[None]
        vae = engine.vae
        try:
            z = vae.encode(jnp.asarray(px))          # 2D image VAE
        except (TypeError, ValueError):
            z = vae.encode(jnp.asarray(px[:, :, None]))  # video VAE, 1 frame
        out[row["image_path"]] = np.asarray(z[0], np.float32)
    save_safetensors(out_path, out, metadata={"format": "np"})
    return Path(out_path)


def convert_peft_lora_to_comfyui(
    sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """reference convert_peft_lora_to_comfyui.py:28 — strip the
    ``base_model.model.`` prefix and rename lora_A/B → lora_down/up."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("base_model.model."):
            k = k[len("base_model.model."):]
        if k.endswith(".lora_A.weight"):
            k = k.replace(".lora_A.weight", ".lora_down.weight")
        elif k.endswith(".lora_B.weight"):
            k = k.replace(".lora_B.weight", ".lora_up.weight")
        if k in out:
            raise ValueError(f"key collision after conversion: {k}")
        out[k] = v
    return out


class LoraDataset:
    """captions.csv + the two encoding safetensors → train batches
    (reference apps/train/zimage/datasets usage in train.py)."""

    def __init__(self, captions_csv: Path, text_encodings: Path,
                 vae_encodings: Path):
        self.rows = _read_captions(Path(captions_csv))
        self.text = load_safetensors(text_encodings)
        self.latents = load_safetensors(vae_encodings)
        missing = [r["image_path"] for r in self.rows
                   if r["image_path"] not in self.text
                   or r["image_path"] not in self.latents]
        if missing:
            raise KeyError(f"encodings missing for {missing[:3]}…")

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        path = self.rows[i]["image_path"]
        return {"image_path": path, "caption": self.rows[i]["caption"],
                "text_embeds": self.text[path],
                "latents": self.latents[path]}

    def batches(self, batch_size: int = 1, seed: int = 0,
                epochs: Optional[int] = None) -> Iterator[List[Dict[str, Any]]]:
        rng = np.random.default_rng(seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(len(self.rows))
            for i in range(0, len(order) - batch_size + 1, batch_size):
                yield [self[int(j)] for j in order[i:i + batch_size]]
            epoch += 1


def main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(prog="apex-train-data")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("caption")
    c.add_argument("--dataset-dir", type=Path, required=True)
    c.add_argument("--out-csv", type=Path, default=None)
    c.add_argument("--model", default=CAPTION_MODEL)
    c.add_argument("--prompt", default=CAPTION_PROMPT)
    c.add_argument("--max-new-tokens", type=int, default=512)

    for name, fn in (("text-encode", None), ("vae-encode", None)):
        e = sub.add_parser(name)
        e.add_argument("--yaml-path", type=Path, required=True)
        e.add_argument("--dataset-dir", type=Path, required=True)
        e.add_argument("--captions-csv", type=Path, default=None)
        e.add_argument("--out-dir", type=Path, default=Path("training_inputs"))
        if name == "vae-encode":
            e.add_argument("--max-area", type=int, default=720 * 1280)
            e.add_argument("--mod-value", type=int, default=16)

    v = sub.add_parser("convert-lora")
    v.add_argument("--in", dest="in_path", type=Path, required=True)
    v.add_argument("--out", dest="out_path", type=Path, required=True)

    args = p.parse_args(argv)
    if args.cmd == "caption":
        out = caption_images(args.dataset_dir, args.out_csv, args.model,
                             args.prompt, args.max_new_tokens)
        print(f"wrote {out}")
        return
    if args.cmd == "convert-lora":
        sd = load_safetensors(args.in_path)
        save_safetensors(args.out_path, convert_peft_lora_to_comfyui(sd),
                         metadata={"format": "pt"})
        print(f"wrote {args.out_path}")
        return
    csv_path = args.captions_csv or args.dataset_dir / "captions.csv"
    args.out_dir.mkdir(parents=True, exist_ok=True)
    if args.cmd == "text-encode":
        out = encode_texts(args.yaml_path, csv_path,
                           args.out_dir / "text_encodings.safetensors")
    else:
        out = encode_images_vae(args.yaml_path, csv_path,
                                args.out_dir / "vae_encodings.safetensors",
                                args.max_area, args.mod_value)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
