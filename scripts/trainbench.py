"""Stage-1 training-step throughput on one v5e chip (full MDM512).

Reference anchor: ~3 s/step at bs 8/GPU fp16 on 8 GPUs (grad-accum 2,
configs/stage1-512_mdm_waymo/config.yaml:154) => ~0.375 s per per-GPU
microbatch of 8 clips.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import benchcache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp
import numpy as np

from mudg_tpu.models import mdm as M
from mudg_tpu.train import step as TS


def main(bs=1, remat=True, grad_only=False):
    cfg = M.MDMConfig()
    print("# init params (abstract)", flush=True)
    shapes = jax.eval_shape(lambda k: M.init_mdm(k, cfg), jax.random.PRNGKey(0))
    dt = jnp.bfloat16 if grad_only else jnp.float32
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, dt), shapes)

    tc = TS.TrainConfig(accum_steps=1, learning_rate=1e-5)
    trainable, frozen = TS.split_params(params)
    if not grad_only:
        state = TS.init_train_state(params, tc)
        del params

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

    if grad_only:
        # fwd + bwd only: one chip can't hold full f32 Adam state for 1.44B
        # params (that's what the 8-chip ZeRO layout is for). Timing-wise the
        # optimizer update is a small bandwidth pass on top of this.
        null_emb = jax.jit(
            lambda fz, toks: M.encode_text(fz, cfg, toks[None])
        )(frozen, null_tokens)

        def loss_fn(tr, fz, batch, key):
            p = TS.merge_params(tr, fz)
            loss, _ = M.training_loss(
                p, cfg, sched_arrays, batch, key,
                null_emb=null_emb, impl="train", remat=remat)
            return loss

        @jax.jit
        def gstep(tr, fz, batch, key):  # frozen as ARG, not closure (3GB!)
            loss, grads = jax.value_and_grad(loss_fn)(tr, fz, batch, key)
            return loss, jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads)

        print("# compiling grad step", flush=True)
        t0 = time.perf_counter()
        loss, _ = gstep(trainable, frozen, batch, jax.random.PRNGKey(2))
        print(f"# compile+1st: {time.perf_counter()-t0:.1f}s loss={float(loss):.4f}",
              flush=True)
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            loss, _ = gstep(trainable, frozen, batch, jax.random.PRNGKey(3 + i))
            _ = float(loss)
            ts.append(time.perf_counter() - t0)
        per = min(ts)
        print(f"fwd+bwd bs={bs} remat={remat}: {per*1e3:.0f} ms "
              f"({bs/per:.2f} clips/s/chip; ref stage-1: 21.3 clips/s on "
              f"8 GPUs = 2.7/GPU)", flush=True)
        return

    step = TS.make_train_step(cfg, tc, frozen, sched_arrays, null_tokens,
                              impl="train", remat=remat, donate=True)

    print("# compiling train step", flush=True)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    print(f"# compile+1st: {time.perf_counter()-t0:.1f}s loss={float(metrics['loss']):.4f}",
          flush=True)

    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.PRNGKey(3 + i))
        _ = float(metrics["loss"])
        ts.append(time.perf_counter() - t0)
    per = min(ts)
    print(f"train step bs={bs} remat={remat}: {per*1e3:.0f} ms/step "
          f"({bs/per:.2f} clips/s/chip; ref ~21.3 clips/s on 8 GPUs)", flush=True)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--grad_only", action="store_true")
    a = p.parse_args()
    main(bs=a.bs, remat=not a.no_remat, grad_only=a.grad_only)
