"""Flash-attention block-size / variant tuning at the ds1 shape (TPU)."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PEAK = 197e12


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


# --- one-shot kernel: whole KV per q-block, plain softmax (no online loop) --

def _oneshot_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def oneshot(q, k, v, bq):
    bh, lq, d = q.shape
    lk = k.shape[1]
    grid = (bh, lq // bq)
    return pl.pallas_call(
        functools.partial(_oneshot_kernel, scale=d ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


# --- exp2 variant: scale*log2(e) folded into q, exp2 softmax ---------------
# removes the (bq, lk) f32 scale-multiply and uses the cheaper exp2; softmax
# is invariant under the base change (2^((s-m)*log2e) == e^(s-m)).

LOG2E = 1.4426950408889634


def _oneshot2_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(
        qs, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0],
                    preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def oneshot2(q, k, v, bq):
    bh, lq, d = q.shape
    lk = k.shape[1]
    grid = (bh, lq // bq)
    return pl.pallas_call(
        functools.partial(_oneshot2_kernel, scale=d ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


# --- current loop kernel with parametric blocks -----------------------------

from mudg_tpu.kernels import flash_attention as FA


def loop_variant(q, k, v, bq, bk):
    bh, lq, d = q.shape
    lk = k.shape[1]
    grid = (bh, lq // bq)
    out_shapes = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32),
    )
    o, _ = pl.pallas_call(
        functools.partial(FA._fwd_kernel, scale=d ** -0.5, block_k=bk, seq_k=lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
    )(q, k, v)
    return o


def main():
    rng = jax.random.PRNGKey(0)
    for (b, s, h, d) in [(32, 2560, 5, 64), (32, 640, 10, 64)]:
        bh = b * h
        q = jax.random.normal(rng, (bh, s, d), jnp.bfloat16) * 0.1
        flops = 2 * bh * 2 * s * s * d

        # reference dense for correctness
        def dense(q):
            s_ = jnp.einsum("bqd,bkd->bqk", q, q,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
            p = jax.nn.softmax(s_, axis=-1).astype(q.dtype)
            return jnp.einsum("bqk,bkd->bqd", p, q)

        import numpy as np
        ref = np.asarray(jax.jit(dense)(q), np.float32)

        for bq in (256, 512, 1024):
            if s % bq:
                continue
            try:
                out = np.asarray(jax.jit(lambda x: oneshot(x, x, x, bq))(q), np.float32)
                err = np.abs(out - ref).max()
                sec = timed(lambda x: oneshot(x, x, x, bq), q)
                print(f"s={s} oneshot bq={bq}: {sec*1e3:7.3f} ms "
                      f"{100*flops/sec/PEAK:5.1f}% err={err:.4f}", flush=True)
            except Exception as e:
                print(f"s={s} oneshot bq={bq}: FAIL {type(e).__name__}", flush=True)

        for bq in (256, 512, 1024):
            if s % bq:
                continue
            try:
                out = np.asarray(jax.jit(lambda x: oneshot2(x, x, x, bq))(q), np.float32)
                err = np.abs(out - ref).max()
                sec = timed(lambda x: oneshot2(x, x, x, bq), q)
                print(f"s={s} oneshot2(exp2) bq={bq}: {sec*1e3:7.3f} ms "
                      f"{100*flops/sec/PEAK:5.1f}% err={err:.4f}", flush=True)
            except Exception as e:
                print(f"s={s} oneshot2 bq={bq}: FAIL {type(e).__name__}", flush=True)

        for bq in (512, 1024, 2560):
            for bk in (512, 1280, 2560):
                if s % bq or s % bk or bk > s:
                    continue
                try:
                    sec = timed(lambda x: loop_variant(x, x, x, bq, bk), q)
                    print(f"s={s} loop bq={bq} bk={bk}: {sec*1e3:7.3f} ms "
                          f"{100*flops/sec/PEAK:5.1f}%", flush=True)
                except Exception as e:
                    print(f"s={s} loop bq={bq} bk={bk}: FAIL {type(e).__name__}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
