"""Conv3x3 forward vs backward MFU probe at the MDM512 training shapes.

The fambwd residual bucket (~230 ms of the 719 ms step) is mostly resblock
convs + projections. This probe times conv3x3 fwd and fwd+bwd per stage
shape (chained-scan method, docs/STATE.md) and derives the bwd-only cost and
its MFU: bwd = dgrad (same FLOPs as fwd) + wgrad (same FLOPs again), so an
ideal bwd is ~2x fwd time. A bwd/fwd ratio well above 2 means XLA's
transposed-conv lowering is the inefficiency, and an im2col matmul formulation
is worth trying.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mudg_tpu.nn import functional as F

V5E_BF16 = 197e12


def timed(fn, *args, n_long=64, n_short=8):
    def chain(x, *rest, n):
        def body(c, _):
            y = fn(c, *rest)
            return (c + 0.01 * y.astype(c.dtype) if y.shape == c.shape
                    else c + 0.01 * jnp.mean(y.astype(c.dtype))), None
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    fl = jax.jit(functools.partial(chain, n=n_long), static_argnums=())
    fs = jax.jit(functools.partial(chain, n=n_short))
    float(fl(*args)); float(fs(*args))

    def best(f):
        out = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            out.append(time.perf_counter() - t0)
        return min(out)

    return (best(fl) - best(fs)) / (n_long - n_short)


def main():
    key = jax.random.PRNGKey(0)
    # (B*T, H, W, C) per MDM512 stage at training bs=1
    shapes = [
        ("ds1", (16, 40, 64, 320), 320),
        ("ds2", (16, 20, 32, 640), 640),
        ("ds4", (16, 10, 16, 1280), 1280),
    ]
    for name, xs, c in shapes:
        x = jax.random.normal(key, xs, jnp.bfloat16) * 0.1
        p = {"weight": jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02,
             "bias": jnp.zeros((c,), jnp.bfloat16)}

        def fwd(c_, p_):
            return F.conv2d(p_, c_)

        def fwdbwd(c_, p_):
            def loss(xx, pp):
                return jnp.mean(jnp.square(F.conv2d(pp, xx).astype(jnp.float32)))
            _, (gx, gp) = jax.value_and_grad(loss, argnums=(0, 1))(c_, p_)
            return gx + 0.0 * jnp.mean(gp["weight"]).astype(gx.dtype)

        tf = timed(fwd, x, p)
        tb = timed(fwdbwd, x, p)
        flops = 2 * xs[0] * xs[1] * xs[2] * c * c * 9
        mfu_f = flops / tf / V5E_BF16
        # fwd+bwd ~= 3x fwd FLOPs (fwd + dgrad + wgrad)
        mfu_b = 3 * flops / tb / V5E_BF16
        print(f"{name} {xs} C={c}: fwd {tf*1e3:6.3f} ms ({mfu_f*100:4.1f}% MFU)"
              f"  fwd+bwd {tb*1e3:6.3f} ms ({mfu_b*100:4.1f}% MFU)"
              f"  bwd/fwd {(tb-tf)/tf:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
