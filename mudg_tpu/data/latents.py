"""Precomputed VAE latents for training (net-new vs the reference).

The round-4 backward family map (scripts/fambwd.py, docs/STATE.md) showed the
frozen 3-way VAE encode costs ~225 ms of the 737 ms MDM512 bs=1 training step
(30%) — the single largest family. The reference re-encodes every batch
(ddpm3d.py:1077-1079); but the Waymo pipeline is DETERMINISTIC per frame file
(fixed resize + center-crop, no augmentation, waymo_data.py:39-43), so the
encoder's posterior MOMENTS (mean ++ logvar, the quant_conv output) can be
computed once per (file, load-kind) and reused for every step/epoch/task that
touches the frame. Sampling stays at train time (vae.sample_scaled), so the
per-step latent noise distribution is IDENTICAL to on-the-fly encoding.

Cache layout: a sibling file per source frame —
    <frame>.<ext>            ->  <frame>.<ext>.z<H>x<W><kind>.npy
kind: 'b' rgb bilinear (dense targets), 'n' rgb nearest (sparse conditions),
      'd' depth .npy (clip [0,100] -> [-1,1]), 'm' normal .npy.
The moments are stored float16 (mean/logvar are O(1)-scaled; fp16 keeps
~3 decimal digits, well inside the bf16 training noise floor) at 1/24 the
pixel bytes: (40, 64, 8) fp16 = 41 kB vs (320, 512, 3) u8 jpg source.

Producers: apps/precompute_latents.py. Consumers: WaymoDataset(latents=True)
-> batches with {dense,sparse,depth}_moments + sparse_frame0, consumed by
models.mdm.training_loss's cached-latent branch.
"""
from __future__ import annotations

import os

import numpy as np

from . import waymo as W


def latent_path(src: str, resolution, kind: str) -> str:
    """Sibling cache path for a source frame file. kind in {b, n, d, m}."""
    h, w = resolution
    return f"{src}.z{h}x{w}{kind}.npy"


def load_pixels(path: str, resolution, kind: str) -> np.ndarray:
    """Load ONE frame exactly as WaymoDataset.load_item does for its kind,
    returning (H, W, 3) float32 in [-1, 1] (normal kind may exceed)."""
    h, w = resolution
    if kind in ("b", "n"):
        img = W._imread_rgb(path, (w, h), nearest=(kind == "n")).astype(np.float32)
        img = W.resize_center_crop(img[None], resolution)[0]
        return (img / 255.0 - 0.5) * 2
    if kind == "d":
        d = W._load_depth_npy(path, (w, h)).astype(np.float32)
        d = W.resize_center_crop(d[None], resolution)[0]
        return (np.clip(d, 0, 100) / 100.0 - 0.5) * 2
    if kind == "m":
        n = np.load(path, allow_pickle=True)[0].astype(np.float32)
        return W.resize_center_crop(n[None], resolution)[0]
    raise ValueError(kind)


def collect_jobs(items: list[dict], resolution) -> list[tuple[str, str]]:
    """Unique (source path, kind) pairs covering every frame any task of any
    item can touch. Mirrors WaymoDataset.load_item's path construction."""
    jobs: dict[tuple[str, str], None] = {}

    def add(sample, base_key, kind, ext=None):
        if base_key not in sample:
            return
        base = sample[base_key]
        for fr in sample["frames"]:
            if ext is not None:
                fr = fr[:-4] + ext
            jobs.setdefault((os.path.join(base, fr), kind), None)

    for sample in items:
        add(sample, "dense_color_base", "b")
        add(sample, "dense_semantic_base", "b")
        add(sample, "dense_depth_base", "d", ext=".npy")
        add(sample, "dense_normal_base", "m", ext=".npy")
        add(sample, "sparse_color_base", "n")
        add(sample, "sparse_depth_base", "d", ext=".npy")
    return list(jobs.keys())


def precompute(items: list[dict], vae_params, vae_cfg, resolution,
               batch: int = 16, skip_existing: bool = True,
               dtype=None, log=print) -> int:
    """Encode every job's frame to posterior moments and write the sibling
    .npy files. Returns the number of files written. Encoding runs in bf16
    (the training encoder dtype, AMP parity — docs/STATE.md round-2 s7)."""
    import jax
    import jax.numpy as jnp

    from ..nn import vae as V

    jobs = collect_jobs(items, resolution)
    if skip_existing:
        jobs = [(p, k) for p, k in jobs
                if not os.path.exists(latent_path(p, resolution, k))]
    if not jobs:
        return 0
    comp = jnp.bfloat16 if dtype is None else dtype

    @jax.jit
    def enc(x):
        return V.encode_moments_video(
            vae_params, vae_cfg, x.astype(comp)[None], chunk=0)[0]

    written = 0
    for i in range(0, len(jobs), batch):
        chunk = jobs[i:i + batch]
        px = np.stack([load_pixels(p, resolution, k) for p, k in chunk])
        # pad the tail batch so one executable serves every step
        n = len(chunk)
        if n < batch:
            px = np.concatenate(
                [px, np.zeros((batch - n, *px.shape[1:]), px.dtype)])
        moments = np.asarray(enc(jnp.asarray(px)), np.float16)
        for (p, k), m in zip(chunk, moments[:n]):
            np.save(latent_path(p, resolution, k), m)
        written += n
        if log and (i // batch) % 20 == 0:
            log(f"# latents {i + n}/{len(jobs)}")
    return written
