"""A/B impl="auto" (replay-vjp Pallas kernels on) vs impl="train" in TRAINING.

The fused temporal/GEGLU kernels' custom_vjp replays the XLA math in
backward, and remat replays the fwd_rule too — so training pays
fused_fwd + xla_fwd + xla_bwd instead of xla_fwd twice + xla_bwd.
impl="train" (the make_train_step default) disables exactly those kernels.
One process, two traced variants, chained-timing per docs/STATE.md.
Measured (v5e-1, bs=1): MUDG_FUSED_TEMPORAL env A/B gave 924 vs 910 ms
(fused temporal alone is -1.6%); the impl A/B adds the GEGLU gate.
"""
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

    def make_gstep(impl):
        def loss_fn(tr, fz, batch, key):
            p = TS.merge_params(tr, fz)
            loss, _ = M.training_loss(
                p, cfg, sched_arrays, batch, key,
                null_tokens=null_tokens, impl=impl, remat=True)
            return loss

        def gstep(tr, fz, batch, key):
            loss, grads = jax.value_and_grad(loss_fn)(tr, fz, batch, key)
            return loss, jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads)

        return gstep

    return make_gstep, trainable, frozen, batch


def timeit(f, args, n=4):
    loss, g = f(*args)
    float(loss)
    ts = []
    for i in range(n):
        a = list(args)
        a[3] = jax.random.PRNGKey(100 + i)
        t0 = time.perf_counter()
        loss, g = f(*a)
        float(loss)  # force real sync
        ts.append(time.perf_counter() - t0)
    return min(ts), float(loss)


def main():
    make_gstep, tr, fz, batch = build()
    out = {}
    for impl in ("auto", "train"):
        f = jax.jit(make_gstep(impl))
        print(f"# compiling impl={impl}", flush=True)
        t0 = time.perf_counter()
        sec, loss = timeit(f, (tr, fz, batch, jax.random.PRNGKey(2)))
        print(f"impl={impl}: {sec*1e3:.0f} ms/fwd+bwd  loss={loss:.4f} "
              f"(compile+meas {time.perf_counter()-t0:.0f}s)", flush=True)
        out[impl] = sec
        f.clear_cache()
    print(f"delta: train-impl is {100*(out['auto']-out['train'])/out['auto']:+.1f}% "
          f"vs auto (fused-replay kernels on)", flush=True)


if __name__ == "__main__":
    main()
