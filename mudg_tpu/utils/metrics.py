"""Image quality metrics for benchmarking against the reference: PSNR, SSIM.

BASELINE.md's quality criterion is PSNR parity with the CUDA reference; these
run on host numpy or as jittable jnp functions.
"""
from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    """PSNR between two arrays (default range 2.0 for [-1,1] images)."""
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range**2 / mse)


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Single-scale SSIM on (H,W,C) images in [0,1] (shared jax impl)."""
    import jax.numpy as jnp
    from ..gs.train import ssim as _ssim

    return float(_ssim(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))


def video_psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0):
    """Per-frame + mean PSNR over (T,H,W,C) videos."""
    per = [psnr(a[i], b[i], data_range) for i in range(len(a))]
    return float(np.mean(per)), per
