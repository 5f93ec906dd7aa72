"""Flash-attention forward tuning at the MDM1024 ds1 shape (TPU).

The render.sh recipe's long pole: spatial self-attention at L=9216
(72x128 latents), B=32 (CFG 2 x 16 frames), H=5, D=64. The production
kernel runs the whole-KV oneshot at bq=128 (~2.9 ms, ~38% of peak). Within
one grid cell QK^T (MXU) -> softmax (VPU) -> PV (MXU) serialize; these
variants split the 128-row q block into independent half-chains so the
Mosaic scheduler can overlap one half's VPU softmax with the other's MXU
matmul. VMEM: two (64, L) f32 score buffers == one (128, L), so the
footprint matches the production bq=128 envelope.
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


def timed(fn, x, n_long=24, n_short=4):
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


def _half_chain(q, k_ref, v_ref):
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0],
                    preferred_element_type=jnp.float32)
    return o / l


def _split_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, halves):
    bq = q_ref.shape[1]
    hq = bq // halves
    qs = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    outs = [
        _half_chain(qs[i * hq:(i + 1) * hq], k_ref, v_ref)
        for i in range(halves)
    ]
    o_ref[0] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)


def _staged_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, halves):
    """Both halves' QK^T issued before either softmax: gives the scheduler
    an explicit MXU->VPU overlap window."""
    bq = q_ref.shape[1]
    hq = bq // halves
    qs = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
    ss = [
        jax.lax.dot_general(qs[i * hq:(i + 1) * hq], k_ref[0],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for i in range(halves)
    ]
    outs = []
    for s in ss:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0],
                        preferred_element_type=jnp.float32)
        outs.append(o / l)
    o_ref[0] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)


def run_variant(kernel, q, k, v, bq, halves):
    bh, lq, d = q.shape
    lk = k.shape[1]
    return pl.pallas_call(
        functools.partial(kernel, scale=d ** -0.5, halves=halves),
        grid=(bh, lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


def main():
    from mudg_tpu.kernels.flash_attention import flash_attention

    rng = jax.random.PRNGKey(0)
    b, s, h, d = 32, 9216, 5, 64
    bh = b * h
    q = jax.random.normal(rng, (bh, s, d), jnp.bfloat16) * 0.1
    flops = 2 * bh * 2 * s * s * d

    # production path baseline (folds/unfolds included, (B,L,H,D) layout)
    q4 = q.reshape(b, h, s, d).transpose(0, 2, 1, 3)
    sec = timed(lambda x: flash_attention(x, x, x), q4)
    print(f"prod flash_attention: {sec*1e3:7.3f} ms {100*flops/sec/PEAK:5.1f}%",
          flush=True)

    ref = None
    for name, kern, bq, halves in [
        ("oneshot bq=128 (cur)", _split_kernel, 128, 1),
        ("oneshot bq=256", _split_kernel, 256, 1),
        ("split 2x128", _split_kernel, 256, 2),
        ("split 2x64", _split_kernel, 128, 2),
        ("staged 2x64", _staged_kernel, 128, 2),
        ("staged 2x128", _staged_kernel, 256, 2),
        ("split 4x32", _split_kernel, 128, 4),
    ]:
        try:
            out = np.asarray(
                jax.jit(lambda x: run_variant(kern, x, x, x, bq, halves))(q),
                np.float32)
            if ref is None:
                ref = out
            err = np.abs(out - ref).max()
            sec = timed(lambda x: run_variant(kern, x, x, x, bq, halves), q)
            print(f"{name}: {sec*1e3:7.3f} ms {100*flops/sec/PEAK:5.1f}% "
                  f"err={err:.5f}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__} "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
