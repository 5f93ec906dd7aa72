"""Shared persistent-compile-cache setup for the bench/probe scripts.

Compiles (TPU and CPU alike) route through a slow remote compile service in
this environment; the persistent cache makes repeat probe runs skip every
unchanged compile. Import AFTER `import jax`, before building any jit.
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
