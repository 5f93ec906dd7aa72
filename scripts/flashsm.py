"""Flash oneshot softmax-overhead anatomy at the MDM1024 ds1 shape
(bh=160, L=9216, D=64, bq=128).

The oneshot forward runs at ~38% of bf16 peak against a 50% structural
ceiling (both dots see D=64). The residual is VPU softmax passes over the
(bq, L) f32 scores: max, exp2, sum (+ the bf16 cast feeding PV). This probe
times numerics-INVALID isolation variants to locate the cost, plus one
numerics-VALID candidate:

  prod      — production kernel (max, exp2, sum, PV)
  nosum     — softmax denominator computed BY THE MXU: a ones-column is
              concatenated onto V inside the kernel, so PV's (bq, 65<=128)
              output carries sum(p) in lane 64. The 64->128 lane padding is
              already paid (the D=64 ceiling), so the extra column is free
              MXU work; the VPU sum pass disappears. VALID numerics.
  nomax     — exp2(s - 10) (no max reduce; INVALID)
  noexp     — p = s * 2^-7 (no exp2; INVALID)
  mxuonly   — p = s.astype(bf16) straight to PV (no softmax at all; INVALID)

Chained-scan timing (docs/STATE.md).
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

LOG2E = 1.4426950408889634


def make_kernel(variant):
    def kern(q_ref, k_ref, v_ref, o_ref, *, scale):
        q = q_ref[0]
        qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
        s = jax.lax.dot_general(
            qs, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        v = v_ref[0]
        if variant == "prod":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            o_ref[0] = (o / l).astype(o_ref.dtype)
        elif variant == "nosum":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            lk, d = v.shape
            ones = jnp.ones((lk, 128 - d), v.dtype)
            v2 = jnp.concatenate([v, ones], axis=1)
            o2 = jax.lax.dot(p.astype(v.dtype), v2,
                             preferred_element_type=jnp.float32)
            o = o2[:, :d]
            l = o2[:, d:d + 1]
            o_ref[0] = (o / l).astype(o_ref.dtype)
        elif variant == "nomax":
            p = jnp.exp2(s - 10.0)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            o_ref[0] = (o / l).astype(o_ref.dtype)
        elif variant == "noexp":
            p = s * (2.0 ** -7)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            o_ref[0] = (o / l).astype(o_ref.dtype)
        elif variant == "mxuonly":
            o = jax.lax.dot(s.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            o_ref[0] = (o * (2.0 ** -14)).astype(o_ref.dtype)
        else:
            raise ValueError(variant)

    return kern


def build(variant, bh, lk, d, bq):
    kern = functools.partial(make_kernel(variant), scale=d ** -0.5)
    def fn(q, k, v):
        return pl.pallas_call(
            kern,
            grid=(bh, q.shape[1] // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        )(q, k, v)
    return fn


def timed(fn, q, k, v, n_long=48, n_short=8):
    def chain(q, k, v, n):
        def body(c, _):
            y = fn(c, k, v)
            return c + 0.001 * y, None
        c, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    fl = jax.jit(functools.partial(chain, n=n_long))
    fs = jax.jit(functools.partial(chain, n=n_short))
    float(fl(q, k, v)); float(fs(q, k, v))

    def best(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(q, k, v))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fl) - best(fs)) / (n_long - n_short)


def main(bh=160, lk=9216, d=64, bq=128):
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (bh, lk, d), jnp.bfloat16) * 0.3
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, lk, d), jnp.bfloat16) * 0.3
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, lk, d), jnp.bfloat16) * 0.3
    flops = 2 * bh * lk * lk * d * 2  # QK + PV
    print(f"# bh={bh} L={lk} D={d} bq={bq}; {flops/1e12:.2f} TFLOP/call",
          flush=True)

    # numerics check for the valid candidate
    f_prod = jax.jit(build("prod", bh, lk, d, bq))
    f_nosum = jax.jit(build("nosum", bh, lk, d, bq))
    a = f_prod(q, k, v)
    b = f_nosum(q, k, v)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"# nosum vs prod max|diff| = {err:.2e}", flush=True)

    for variant in ("prod", "nosum", "nomax", "noexp", "mxuonly"):
        fn = build(variant, bh, lk, d, bq)
        t = timed(fn, q, k, v)
        print(f"{variant:8s} {t*1e3:7.3f} ms  ({flops/t/197e12*100:5.1f}% peak)",
              flush=True)


if __name__ == "__main__":
    main()
