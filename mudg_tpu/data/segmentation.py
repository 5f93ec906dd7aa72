"""Semantic segmentation stage (SegFormer-B3 cityscapes equivalent).

The reference runs SegFormer over every camera frame and stores raw class-id
.pfm files + palette RGB images (`data_process/pipeline_segment.py`,
`tools/semantic_tools.py`). The model weights cannot be vendored offline, so
this module provides:
  * the .pfm read/write used by the pipeline,
  * `segment_frames`: drives any `predictor(image)->class_ids` callable
    (e.g. a local transformers SegFormer when its weights are present) over a
    scene and writes seg/<frame>.pfm + semantic_dense/<frame>.jpg,
  * `load_segformer_predictor`: transformers-based predictor, gated on local
    weights.
"""
from __future__ import annotations

import os

import numpy as np


def write_pfm(path: str, data: np.ndarray, scale: float = 1.0):
    """Grayscale little-endian PFM (semantic_tools.read_semantic_pfm inverse)."""
    data = np.asarray(data, np.float32)
    assert data.ndim == 2
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(f"{-abs(scale)}\n".encode())
        f.write(np.flipud(data).astype("<f4").tobytes())


def read_pfm(path: str):
    """PFM reader (semantic_tools.py:7-43). Returns (data, scale)."""
    with open(path, "rb") as f:
        header = f.readline().decode().rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError("not a PFM file")
        dims = f.readline().decode().split()
        width, height = int(dims[0]), int(dims[1])
        scale = float(f.readline().decode().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.frombuffer(f.read(), endian + "f4")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)).copy(), abs(scale)


def load_segformer_predictor(model_path: str | None = None):
    """SegFormer predictor via transformers, if weights are locally available.

    Returns image(H,W,3 uint8) -> class_ids(H,W int64), or None if the model
    cannot be constructed (no network in this environment).
    """
    try:
        from transformers import (
            SegformerForSemanticSegmentation, SegformerImageProcessor,
        )
        import torch

        name = model_path or "nvidia/segformer-b3-finetuned-cityscapes-1024-1024"
        processor = SegformerImageProcessor.from_pretrained(name, local_files_only=True)
        model = SegformerForSemanticSegmentation.from_pretrained(
            name, local_files_only=True
        ).eval()
    except Exception:
        return None

    def predict(image: np.ndarray) -> np.ndarray:
        with torch.no_grad():
            inputs = processor(images=image, return_tensors="pt")
            logits = model(**inputs).logits
            up = torch.nn.functional.interpolate(
                logits, size=image.shape[:2], mode="bilinear", align_corners=False
            )
            return up.argmax(1)[0].numpy()

    return predict


def segment_frames(image_dir: str, out_root: str, cam: str, predictor,
                   palette_dir: str | None = None):
    """pipeline_segment equivalent over one camera directory: writes
    seg/NNNNNNNN.pfm and optionally semantic_dense/NNNNNNNN.jpg."""
    import cv2
    from ..utils.media import encode_semantic

    seg_dir = os.path.join(out_root, cam, "seg")
    os.makedirs(seg_dir, exist_ok=True)
    if palette_dir:
        os.makedirs(os.path.join(palette_dir, cam), exist_ok=True)

    frames = sorted(f for f in os.listdir(image_dir) if f.endswith((".jpg", ".png")))
    for i, fname in enumerate(frames):
        img = cv2.cvtColor(cv2.imread(os.path.join(image_dir, fname)),
                           cv2.COLOR_BGR2RGB)
        ids = predictor(img)
        write_pfm(os.path.join(seg_dir, f"{i:08d}.pfm"), ids.astype(np.float32))
        if palette_dir:
            rgb = encode_semantic(ids)
            cv2.imwrite(os.path.join(palette_dir, cam, f"{i:08d}.jpg"),
                        cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    return len(frames)
