"""Persistent XLA compilation cache setup.

All compiles (CPU included) route through a slow remote compile service in
this environment (~2-8 min for the full model); warm cache entries load in
seconds. Harmless when cold. Must run before the first jit lowering; safe
to call more than once.
"""
from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
