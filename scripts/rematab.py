"""A/B remat policies in training: full per-block recompute vs saving
matmul/conv outputs (jax.checkpoint dots_with_no_batch_dims_saveable).

Full remat replays every block's forward in the backward (~one extra
forward of MXU work); the dots policy keeps matmul outputs in HBM instead.
Risk is HBM pressure at bs=1 with 1.44B bf16 params resident. One process,
chained timing per docs/STATE.md.
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

    def make_gstep(remat):
        def loss_fn(tr, fz, batch, key):
            p = TS.merge_params(tr, fz)
            loss, _ = M.training_loss(
                p, cfg, sched_arrays, batch, key,
                null_tokens=null_tokens, impl="train", remat=remat)
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
        float(loss)
        ts.append(time.perf_counter() - t0)
    return min(ts), float(loss)


def main():
    bs = 1
    want = []
    for v in sys.argv[1:]:
        if v.startswith("--bs="):
            bs = int(v.split("=")[1])
        else:
            want.append(v)
    want = want or ["True", "dots_small", "convs"]
    variants = [True if v == "True" else v for v in want]
    make_gstep, tr, fz, batch = build(bs)
    print(f"# bs={bs} (per-CLIP cost = step_ms / bs)", flush=True)
    out = {}
    for remat in variants:
        f = jax.jit(make_gstep(remat))
        print(f"# compiling remat={remat}", flush=True)
        t0 = time.perf_counter()
        try:
            sec, loss = timeit(f, (tr, fz, batch, jax.random.PRNGKey(2)))
            print(f"remat={remat}: {sec*1e3:.0f} ms/fwd+bwd loss={loss:.4f} "
                  f"(compile+meas {time.perf_counter()-t0:.0f}s)", flush=True)
            out[remat] = sec
        except Exception as e:
            print(f"remat={remat}: FAIL {type(e).__name__} "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
        f.clear_cache()
    if True in out:
        for k, v in out.items():
            if k is not True:
                print(f"delta: {k} is {100*(out[True]-v)/out[True]:+.1f}% "
                      "vs full-remat", flush=True)


if __name__ == "__main__":
    main()
