"""TPU microbench for the new short-attention and fused-GEGLU kernels."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mudg_tpu.kernels.mlp import fused_geglu_ff, _ff_math
from mudg_tpu.kernels.short_attention import (
    packed_short_attention, short_kv_attention)

PEAK = 197e12


def timed(fn, x, n_long=64, n_short=8):
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


def main():
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    # fused GEGLU at the three UNet widths
    for m, c in [(81920, 320), (20480, 640), (5120, 1280)]:
        inner = 4 * c
        ks = jax.random.split(rng, 5)
        x = jax.random.normal(ks[0], (m, c), bf) * 0.5
        w1 = jax.random.normal(ks[1], (c, 2 * inner), bf) * 0.02
        b1 = jnp.zeros((2 * inner,), bf)
        w2 = jax.random.normal(ks[3], (inner, c), bf) * 0.02
        b2 = jnp.zeros((c,), bf)
        fl = 2 * m * (8 * c * c + 4 * c * c)
        sec = timed(lambda t: fused_geglu_ff(t, w1, b1, w2, b2), x)
        print(f"fused-geglu ({m}x{c})   : {sec*1e3:7.3f} ms {fl/sec/1e12:6.1f} TF/s {100*fl/sec/PEAK:5.1f}%", flush=True)
        sec = timed(lambda t: _ff_math(t, w1, b1, w2, b2), x)
        print(f"xla-geglu   ({m}x{c})   : {sec*1e3:7.3f} ms {fl/sec/1e12:6.1f} TF/s {100*fl/sec/PEAK:5.1f}%", flush=True)

    # packed temporal attention
    for b, t, h, d in [(5120, 16, 5, 64), (1280, 16, 10, 64), (320, 16, 20, 64)]:
        q = jax.random.normal(rng, (b, t, h, d), bf) * 0.1
        fl = 2 * b * h * 2 * t * t * d
        sec = timed(lambda c_: packed_short_attention(c_, q, q), q)
        print(f"packed-tattn (b{b} t{t} h{h}): {sec*1e3:7.3f} ms (dense-xla was ~{1.275*b/5120:.2f} ms at ds1 scale)", flush=True)

    # short-KV cross attention
    for lk in (93, 16):
        b, s, h, d = 32, 2560, 5, 64
        q = jax.random.normal(rng, (b, s, h, d), bf) * 0.1
        k = jax.random.normal(rng, (b, lk, h, d), bf) * 0.1
        sec = timed(lambda c_: short_kv_attention(c_, k, k), q)
        print(f"short-kv (s{s} kv{lk})  : {sec*1e3:7.3f} ms (xla dense was 0.454 ms @93)", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
