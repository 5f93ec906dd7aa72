"""Flash oneshot with TWO q-blocks in flight per grid step (TPU probe).

Hypothesis (docs/STATE.md round-3 agenda): the oneshot forward is a serial
QK^T (MXU) -> softmax (VPU) -> PV (MXU) chain per q-block; with two
independent q-blocks in one kernel body, Mosaic can overlap block A's
softmax VPU time with block B's MXU dots, hiding the softmax cost that
keeps the kernel at ~38% of peak (50% D=64 ceiling).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PEAK = 197e12
LOG2E = 1.4426950408889634


def timed(fn, x, n_long=48, n_short=8):
    def chain(x, n):
        def body(c, _):
            return fn(c), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    fl = jax.jit(lambda x: chain(x, n_long))
    fs = jax.jit(lambda x: chain(x, n_short))
    float(fl(x)); float(fs(x))

    def best(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fl) - best(fs)) / (n_long - n_short)


def _oneshot1_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(qs, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0],
                    preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _oneshot2q_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, bq):
    """Two independent q sub-blocks; ops written interleaved so the
    scheduler can overlap VPU softmax with the other block's MXU dots."""
    k = k_ref[0]
    v = v_ref[0]
    qa = q_ref[0, pl.ds(0, bq), :]
    qb = q_ref[0, pl.ds(bq, bq), :]
    sc = scale * LOG2E
    qa = (qa.astype(jnp.float32) * sc).astype(qa.dtype)
    qb = (qb.astype(jnp.float32) * sc).astype(qb.dtype)
    sa = jax.lax.dot_general(qa, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    sb = jax.lax.dot_general(qb, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ma = jnp.max(sa, axis=-1, keepdims=True)
    pa = jnp.exp2(sa - ma)
    mb = jnp.max(sb, axis=-1, keepdims=True)
    pb = jnp.exp2(sb - mb)
    la = jnp.sum(pa, axis=-1, keepdims=True)
    lb = jnp.sum(pb, axis=-1, keepdims=True)
    oa = jax.lax.dot(pa.astype(v.dtype), v, preferred_element_type=jnp.float32)
    ob = jax.lax.dot(pb.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, pl.ds(0, bq), :] = (oa / la).astype(o_ref.dtype)
    o_ref[0, pl.ds(bq, bq), :] = (ob / lb).astype(o_ref.dtype)


def oneshot(q, k, v, bq, two):
    bh, lq, d = q.shape
    lk = k.shape[1]
    step = 2 * bq if two else bq
    kern = (functools.partial(_oneshot2q_kernel, scale=d**-0.5, bq=bq)
            if two else functools.partial(_oneshot1_kernel, scale=d**-0.5))
    return pl.pallas_call(
        kern,
        grid=(bh, lq // step),
        in_specs=[
            pl.BlockSpec((1, step, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, step, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


def main():
    rng = jax.random.PRNGKey(0)
    for (b, s, h, d) in [(32, 2560, 5, 64), (4, 9216, 10, 64)]:
        bh = b * h
        q = jax.random.normal(rng, (bh, s, d), jnp.bfloat16) * 0.1
        flops = 2 * bh * 2 * s * s * d

        def dense(q):
            s_ = jnp.einsum("bqd,bkd->bqk", q, q,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
            p = jax.nn.softmax(s_, axis=-1).astype(q.dtype)
            return jnp.einsum("bqk,bkd->bqd", p, q)

        ref = None
        if s <= 2560:
            ref = np.asarray(jax.jit(dense)(q), np.float32)

        for (bq, two) in ((256, False), (128, True), (256, True), (128, False)):
            if (2 * bq if two else bq) > s or s % (2 * bq if two else bq):
                continue
            try:
                out = np.asarray(jax.jit(
                    lambda x: oneshot(x, x, x, bq, two))(q), np.float32)
                err = np.abs(out - ref).max() if ref is not None else -1.0
                sec = timed(lambda x: oneshot(x, x, x, bq, two), q)
                print(f"s={s} bq={bq} two={int(two)}: {sec*1e3:7.3f} ms "
                      f"{100*flops/sec/PEAK:5.1f}% err={err:.4f}", flush=True)
            except Exception as e:
                print(f"s={s} bq={bq} two={int(two)}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
