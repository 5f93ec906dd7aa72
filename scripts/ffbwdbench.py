"""Micro-bench: kernels/mlp._ff_bwd_apply vs XLA vjp at training shapes.

Training (MDM512, bs=1): ds1 m=40960 c=320 inner=1280; ds2 m=10240 c=640
inner=2560; ds4 m=2560 c=1280 inner=5120 (bwd-ineligible today). Chained
timing per docs/STATE.md.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mudg_tpu.kernels import mlp as M

PEAK = 197e12


def timed(fn, args, n_long=24, n_short=4):
    def chain(x, n):
        def body(c, _):
            outs = fn(c, *args[1:])
            return c + outs[0].astype(c.dtype) * 1e-6, None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    x = args[0]
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


def main():
    rng = jax.random.PRNGKey(0)
    for (m, c) in [(40960, 320), (10240, 640), (2560, 1280)]:
        inner = 4 * c
        ks = jax.random.split(rng, 5)
        x = (jax.random.normal(ks[0], (m, c), jnp.float32) * 0.5).astype(jnp.bfloat16)
        dy = (jax.random.normal(ks[1], (m, c), jnp.float32) * 0.5).astype(jnp.bfloat16)
        w1 = (jax.random.normal(ks[2], (c, 2 * inner), jnp.float32) * 0.05).astype(jnp.bfloat16)
        b1 = jnp.zeros((2 * inner,), jnp.bfloat16)
        w2 = (jax.random.normal(ks[3], (inner, c), jnp.float32) * 0.05).astype(jnp.bfloat16)
        b2 = jnp.zeros((c,), jnp.bfloat16)
        # bwd FLOPs: dh (m,c,inner via w2) + dw2 + dx twice (v/g) + dw1 twice
        flops = 2 * m * c * inner * (2 + 2 + 2)  # 6 big dots + 2 recompute
        flops += 2 * 2 * m * c * inner           # u,g recompute

        elig = M.ff_bwd_eligible(m, c, inner)
        print(f"m={m} c={c} inner={inner} eligible={elig} "
              f"blocks={M._pick_block_sizes_bwd(m, c, inner)}", flush=True)
        if elig:
            sec = timed(lambda x_, *a: M._ff_bwd_apply(x_, dy, w1, b1, w2),
                        (x,))
            print(f"  kernel bwd: {sec*1e3:7.3f} ms {100*flops/sec/PEAK:5.1f}%",
                  flush=True)

        def xla_bwd(x_):
            _, vjp = jax.vjp(M._ff_math, x_, w1, b1, w2, b2)
            return vjp(dy)

        sec = timed(lambda x_, *a: xla_bwd(x_), (x,))
        print(f"  xla vjp   : {sec*1e3:7.3f} ms {100*flops/sec/PEAK:5.1f}%",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
