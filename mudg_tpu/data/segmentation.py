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
    """SegFormer-B3 predictor running the JAX implementation
    (`models/segformer.py`, HF-oracle-tested) with weights imported from a
    local HuggingFace checkpoint (directory with model.safetensors /
    pytorch_model.bin, or a bare state-dict file).

    Returns image(H,W,3 uint8) -> class_ids(H,W int), or None if no weights
    are locally available (no network in this environment).
    """
    sd = _load_local_segformer_weights(model_path)
    if sd is None:
        return None

    import jax

    from ..models import segformer as S

    cfg = S.SegFormerConfig()
    params = S.import_hf_state_dict(sd)
    seg = jax.jit(lambda p, img: S.segment(p, cfg, img))

    def predict(image: np.ndarray) -> np.ndarray:
        img = np.asarray(image, np.float32) / 255.0
        return np.asarray(seg(params, img))

    return predict


def _load_local_segformer_weights(model_path: str | None):
    """Local-only weight lookup: explicit path, MUDG_SEGFORMER_PATH, or the
    HF cache for the standard cityscapes-B3 repo."""
    candidates = []
    if model_path:
        candidates.append(model_path)
    env = os.environ.get("MUDG_SEGFORMER_PATH")
    if env:
        candidates.append(env)
    try:  # resolved HF cache snapshot, if it was ever downloaded
        from huggingface_hub import snapshot_download

        candidates.append(snapshot_download(
            "nvidia/segformer-b3-finetuned-cityscapes-1024-1024",
            local_files_only=True))
    except Exception:
        pass

    for cand in candidates:
        try:
            if os.path.isdir(cand):
                for fname in ("model.safetensors", "pytorch_model.bin"):
                    f = os.path.join(cand, fname)
                    if os.path.exists(f):
                        return _read_weight_file(f)
            elif os.path.exists(cand):
                return _read_weight_file(cand)
        except Exception:
            continue
    return None


def _read_weight_file(path: str):
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    from ..train.checkpoint import _load_torch_pickle, normalize_state_dict

    return normalize_state_dict(_load_torch_pickle(path))


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
