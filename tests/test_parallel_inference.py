"""Sharded inference on the 8-device CPU mesh: batch-parallel MDM sampling
agrees with the single-device result, and profiling helpers work."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudg_tpu.models import mdm as M
from mudg_tpu.parallel import mesh as PM
from test_mdm import tiny_mdm_cfg, T, H, W


def test_sharded_sampling_matches_replicated():
    cfg = tiny_mdm_cfg()
    params = M.init_mdm(jax.random.PRNGKey(0), cfg)
    b = 8  # one clip per device
    key = jax.random.PRNGKey(1)
    sparse = jax.random.uniform(key, (b, T, H, W, 3), minval=-1, maxval=1)
    depth = jax.random.uniform(key, (b, T, H, W, 3), minval=-1, maxval=1)
    tokens = jnp.zeros((b, 77), jnp.int32)
    null = jnp.zeros((77,), jnp.int32)
    labels = jnp.zeros((b,), jnp.int32)

    def run(sparse, depth, labels, tokens):
        return M.sample(
            params, cfg, jax.random.PRNGKey(2),
            sparse_frames=sparse, sparse_depth=depth, tokens=tokens,
            null_tokens=null, class_label=labels, num_steps=2,
            guidance_scale=7.5, decode=False, impl="xla",
        )

    ref = jax.jit(run)(sparse, depth, labels, tokens)

    mesh = PM.make_mesh()
    sparse_s = PM.shard_batch(sparse, mesh)
    depth_s = PM.shard_batch(depth, mesh)
    labels_s = PM.shard_batch(labels, mesh)
    tokens_s = PM.shard_batch(tokens, mesh)
    out = jax.jit(run)(sparse_s, depth_s, labels_s, tokens_s)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_profiling_helpers():
    from mudg_tpu.utils.profiling import StepTimer, device_memory_stats

    t = StepTimer()
    for _ in range(4):
        t.tick()
    s = t.stats()
    assert "p50_s" in s and s["steps_per_sec"] > 0
    stats = device_memory_stats()
    assert len(stats) == jax.device_count()
