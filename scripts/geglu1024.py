"""GEGLU FF kernel (bm, s) retune at MDM1024 shapes (VERDICT round-3 #2).

Current picks (kernels/mlp._ff_apply): C=640 -> bm=1024, s=640;
C=1280 -> bm=256, s<=512. Those were calibrated at MDM512 row counts
(m=2560..81920); MDM1024 runs m=73728 (ds2) and m=18432 (ds4) where the
grid aspect is different. Sweeps explicit (bm, s) through the SAME kernel
body and compares against XLA and the current auto pick.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mudg_tpu.kernels import mlp as M


def ff_with(x, w1, b1, w2, b2, bm, s):
    c = x.shape[-1]
    m = x.size // c
    xf = x.reshape(m, c)
    inner = w1.shape[1] // 2
    n_ic = inner // s
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1m = jnp.stack([b1[:inner], b1[inner:]]).astype(jnp.float32)
    b2 = b2.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(M._ff_kernel, n_ic=n_ic),
        grid=(m // bm, n_ic),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i, j: (0, j + n_ic), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32)],
    )(xf, w1, w1, b1m, w2, b2[None])
    return out


def xla_ff(x, w1, b1, w2, b2):
    u = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
    h, g = jnp.split(u, 2, axis=-1)
    h = h * jax.nn.gelu(g, approximate=False)
    return h @ w2.astype(x.dtype) + b2.astype(x.dtype)


def timed(fn, args, n_long=24, n_short=4):
    def chain(x, n):
        def body(c, _):
            y = fn(c, *args[1:])
            return (c + 0.01 * y.reshape(c.shape)).astype(c.dtype), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    fl = jax.jit(lambda x: chain(x, n_long))
    fs = jax.jit(lambda x: chain(x, n_short))
    x = args[0]
    float(fl(x)); float(fs(x))

    def best(f):
        return min(
            (lambda t0: (float(f(x)), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(3)
        )

    return (best(fl) - best(fs)) / (n_long - n_short)


def main():
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    cases = [
        ("1024-ds4", 18432, 1280, [(256, 512), (128, 1024), (256, 640),
                                   (512, 256), (128, 512), (512, 512)]),
        ("1024-ds2", 73728, 640, [(1024, 640), (512, 640), (1024, 512),
                                  (2048, 256), (512, 1280), (1024, 1280)]),
    ]
    for name, m, c, combos in cases:
        inner = 4 * c
        ks = jax.random.split(jax.random.fold_in(rng, c), 5)
        x = jax.random.normal(ks[0], (m, c), bf)
        w1 = 0.02 * jax.random.normal(ks[1], (c, 2 * inner), bf)
        b1 = 0.01 * jax.random.normal(ks[2], (2 * inner,), jnp.float32)
        w2 = 0.02 * jax.random.normal(ks[3], (inner, c), bf)
        b2 = 0.01 * jax.random.normal(ks[4], (c,), jnp.float32)
        args = (x, w1, b1, w2, b2)

        t = timed(xla_ff, args)
        print(f"{name}: xla {t*1e3:7.3f} ms", flush=True)
        t = timed(M.fused_geglu_ff, args)
        print(f"{name}: auto {t*1e3:7.3f} ms", flush=True)
        for bm, s in combos:
            if m % bm or inner % s:
                continue
            try:
                t = timed(lambda x_, *a: ff_with(x_, *a, bm, s), args)
                print(f"{name}: bm={bm} s={s} {t*1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"{name}: bm={bm} s={s} FAIL {type(e).__name__} "
                      f"{str(e).splitlines()[0][:80]}", flush=True)


if __name__ == "__main__":
    main()
