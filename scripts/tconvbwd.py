"""Temporal-conv stage BACKWARD decomposition probe (round-4 VERDICT 1c/1d).

The round-3 family map (full remat) charged ~134 ms/step to temporal convs
in training. Before writing a true fused GN+SiLU+tconv backward kernel,
measure where the stage's fwd+bwd actually goes at the training shapes:

  chain   : y = tconv311(silu(gn(x)))      (the real stage)
  conv    : y = tconv311(x)                (dgrad+wgrad matmul cost alone)
  gnsilu  : y = silu(gn(x))                (GN fp32-island bwd cost alone)

per MDM512/MDM1024 stage shape at bs=1, grads wrt x AND the conv weight.
Chained-scan timing per docs/STATE.md. An ideal fused bwd can at best
remove (chain - conv - gnsilu) overlap + the elementwise HBM round trips;
if chain ~= conv + gnsilu and conv dominates at high MFU, the kernel is
not worth writing.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import benchcache  # noqa: F401
import jax.numpy as jnp

from mudg_tpu.nn import functional as F

V5E_BF16 = 197e12


def timed(fn, *args, n_long=48, n_short=8):
    def chain(x, *rest, n):
        def body(c, _):
            y = fn(c, *rest)
            return (c + 0.01 * y if y.shape == c.shape
                    else c + 0.01 * jnp.mean(y).astype(c.dtype)), None
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    fl = jax.jit(functools.partial(chain, n=n_long))
    fs = jax.jit(functools.partial(chain, n=n_short))
    float(fl(*args)); float(fs(*args))

    def best(f):
        return min(
            (lambda t0: (float(f(*args)), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(3))

    return (best(fl) - best(fs)) / (n_long - n_short)


def main():
    key = jax.random.PRNGKey(0)
    shapes = [
        ("512-ds1", (1, 16, 40, 64, 320)),
        ("512-ds2", (1, 16, 20, 32, 640)),
        ("1024-ds1", (1, 16, 72, 128, 320)),
    ]
    for name, xs in shapes:
        c = xs[-1]
        x = jax.random.normal(key, xs, jnp.bfloat16) * 0.1
        pg = {"weight": jnp.ones((c,), jnp.float32),
              "bias": jnp.zeros((c,), jnp.float32)}
        pc = {"weight": jax.random.normal(key, (3, 1, 1, c, c),
                                          jnp.bfloat16) * 0.02,
              "bias": jnp.zeros((c,), jnp.bfloat16)}

        variants = {
            "chain": lambda xx, w: F.conv3d({**pc, "weight": w},
                                            F.silu(F.group_norm(pg, xx))),
            "conv": lambda xx, w: F.conv3d({**pc, "weight": w}, xx),
            "gnsilu": lambda xx, w: (F.silu(F.group_norm(pg, xx))
                                     + 0.0 * jnp.mean(w).astype(xx.dtype)),
        }
        # conv FLOPs: 3 taps x 2MNK; fwd+bwd ~ 3x (fwd + dgrad + wgrad)
        rows = xs[0] * xs[1] * xs[2] * xs[3]
        flops = 2 * rows * c * c * 3
        line = [f"{name} {xs}"]
        for vn, fn in variants.items():
            def fwd(xx, w):
                return fn(xx, w)

            def fwdbwd(xx, w):
                def loss(a, b):
                    return jnp.mean(jnp.square(fn(a, b).astype(jnp.float32)))
                _, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(xx, w)
                return gx + 0.0 * jnp.mean(gw).astype(gx.dtype)

            tf = timed(fwd, x, pc["weight"])
            tb = timed(fwdbwd, x, pc["weight"])
            extra = ""
            if vn == "conv":
                extra = (f" [fwd {flops/tf/V5E_BF16*100:4.1f}% "
                         f"f+b {3*flops/tb/V5E_BF16*100:4.1f}% MFU]")
            line.append(f"{vn} {tf*1e3:6.3f}/{tb*1e3:6.3f} ms{extra}")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
