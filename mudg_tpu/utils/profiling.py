"""Profiling / observability helpers (the CUDACallback analog).

The reference logs epoch wall-time and peak GPU memory reduced across ranks
(`main/callbacks.py:104-133`) and enables cudnn autotune. TPU equivalents:
  * `device_memory_stats`: per-device HBM usage from the runtime,
  * `StepTimer`: rolling step-time statistics,
  * `trace`: context manager around jax.profiler for on-demand traces.
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def device_memory_stats() -> list[dict]:
    """Per-device memory stats (bytes); empty dicts when the backend does not
    expose them (CPU)."""
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out.append({
            "device": str(d),
            "bytes_in_use": s.get("bytes_in_use"),
            "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            "bytes_limit": s.get("bytes_limit"),
        })
    return out


class StepTimer:
    """Rolling wall-clock statistics over train/inference steps."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times: list[float] = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    def stats(self) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "mean_s": float(t.mean()),
            "p50_s": float(np.median(t)),
            "p90_s": float(np.percentile(t, 90)),
            "steps_per_sec": float(1.0 / max(t.mean(), 1e-9)),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope; view with TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
