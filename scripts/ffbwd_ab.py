"""A/B the TRUE-backward fused GEGLU FF in training (impl="train").

Both variants run impl="train"; the only delta is MUDG_FUSED_FF (read at
trace time), i.e. whether the FF forward+backward run as Pallas kernels
(kernels/mlp._ff_bwd_apply) or as plain XLA. One process, chained timing
per docs/STATE.md.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mudg_tpu.models import mdm as M
from mudg_tpu.train import step as TS


def build(bs=1):
    cfg = M.MDMConfig()
    shapes = jax.eval_shape(lambda k: M.init_mdm(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16), shapes)
    trainable, frozen = TS.split_params(params)
    t, hh, ww = 16, 320, 512
    key = jax.random.PRNGKey(1)
    batch = {
        "dense_frames": jax.random.uniform(key, (bs, t, hh, ww, 3), minval=-1, maxval=1),
        "sparse_frames": jax.random.uniform(key, (bs, t, hh, ww, 3), minval=-1, maxval=1),
        "sparse_depth": jax.random.uniform(key, (bs, t, hh, ww, 3), minval=-1, maxval=1),
        "tokens": jnp.zeros((bs, 77), jnp.int32),
        "class_label": jnp.zeros((bs,), jnp.int32),
        "fps": jnp.full((bs,), 10, jnp.int32),
    }
    sched_arrays = M.schedule_arrays(cfg.schedule())
    null_tokens = jnp.zeros((77,), jnp.int32)

    def loss_fn(tr, fz, batch, key):
        p = TS.merge_params(tr, fz)
        loss, _ = M.training_loss(
            p, cfg, sched_arrays, batch, key,
            null_tokens=null_tokens, impl="train", remat=True)
        return loss

    def gstep(tr, fz, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(tr, fz, batch, key)
        return loss, jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads)

    return gstep, trainable, frozen, batch


def timeit(f, args, n=4):
    loss, g = f(*args)
    float(loss)
    ts = []
    for i in range(n):
        a = list(args)
        a[3] = jax.random.PRNGKey(100 + i)
        t0 = time.perf_counter()
        loss, g = f(*a)
        float(loss)
        ts.append(time.perf_counter() - t0)
    return min(ts), float(loss)


def main():
    gstep, tr, fz, batch = build()
    out = {}
    for ff in ("0", "1"):
        os.environ["MUDG_FUSED_FF"] = ff
        f = jax.jit(gstep)
        print(f"# compiling MUDG_FUSED_FF={ff}", flush=True)
        t0 = time.perf_counter()
        sec, loss = timeit(f, (tr, fz, batch, jax.random.PRNGKey(2)))
        print(f"FUSED_FF={ff}: {sec*1e3:.0f} ms/fwd+bwd  loss={loss:.4f} "
              f"(compile+meas {time.perf_counter()-t0:.0f}s)", flush=True)
        out[ff] = sec
        f.clear_cache()
    print(f"delta: fused-FF training is {100*(out['0']-out['1'])/out['0']:+.1f}% "
          f"vs plain XLA FF", flush=True)


if __name__ == "__main__":
    main()
