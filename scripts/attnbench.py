"""Focused flash-attention correctness + timing at UNet shapes (TPU)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.kernels.flash_attention import flash_attention

PEAK = 197e12


def timed(fn, *args, n_long=64, n_short=8):
    def chain(x, n):
        def body(c, _):
            return fn(c, *args[1:]), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    fl = jax.jit(lambda x: chain(x, n_long))
    fs = jax.jit(lambda x: chain(x, n_short))
    jax.block_until_ready(fl(args[0]))
    jax.block_until_ready(fs(args[0]))

    def best(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(args[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fl) - best(fs)) / (n_long - n_short)


def dense(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def main():
    rng = jax.random.PRNGKey(0)
    for (b, s, h, d) in [(32, 2560, 5, 64), (32, 640, 10, 64)]:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)

        ref = np.asarray(jax.jit(dense)(q, k, v), np.float32)
        out = np.asarray(jax.jit(flash_attention)(q, k, v), np.float32)
        err = np.abs(ref - out).max()
        print(f"s={s}: max|flash-dense| = {err:.4f}", flush=True)
        assert err < 0.02, "flash kernel mismatch"

        flops = 2 * b * h * 2 * s * s * d
        sec = timed(flash_attention, q, k, v)
        print(f"flash (b{b} s{s} h{h} d{d}): {sec*1e3:.3f} ms "
              f"{flops/sec/1e12:.1f} TF/s {100*flops/sec/PEAK:.1f}%", flush=True)

        # grad path
        def loss(q, k, v):
            return (flash_attention(q, k, v).astype(jnp.float32) ** 2).sum()

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        def gstep(q):
            dq, dk, dv = g(q, k, v)
            return q + 1e-6 * dq

        sec = timed(gstep, q)
        print(f"flash fwd+bwd step: {sec*1e3:.3f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
