"""flashblock_self_attention vs the XLA-projections+flash path at the
MDM1024 ds1 spatial shape (B=32, L=9216, C=320, heads=5) — the 330 ms
attend family (fambench --preset=mdm1024, docs/STATE.md round 4).

Chained-scan timing per docs/STATE.md; parity check on the same inputs.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import benchcache  # noqa: F401
import jax.numpy as jnp

from mudg_tpu.kernels import spatial_attn as SP
from mudg_tpu.nn import attention as A

B, L, C, HEADS = 32, 9216, 320, 5


def timed(fn, x, p_norm, p_attn, n_long=32, n_short=4):
    def chain(x, n):
        def body(c_, _):
            y = fn(c_, p_norm, p_attn)
            return c_ + 0.01 * y.astype(c_.dtype), None
        c_, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c_.astype(jnp.float32))

    fl = jax.jit(functools.partial(chain, n=n_long))
    fs = jax.jit(functools.partial(chain, n=n_short))
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
    p_attn = A.init_cross_attention(rng, C, heads=HEADS, dim_head=C // HEADS)
    p_attn = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p_attn)
    p_norm = {"weight": jnp.ones((C,), jnp.float32),
              "bias": jnp.zeros((C,), jnp.float32)}
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, C), jnp.bfloat16) * 0.1

    assert SP.flashblock_eligible(x, C, HEADS), SP._fb_pick(L, C, HEADS)
    print(f"# bq,bkv = {SP._fb_pick(L, C, HEADS)}", flush=True)

    from mudg_tpu.nn import functional as F

    fb = lambda x_, n_, a_: SP.flashblock_self_attention(x_, n_, a_, HEADS)
    # production fallback path at this shape: XLA LN+projections + the flash
    # kernel (the dense _xla_impl would materialize a (B,H,L,L) score tensor
    # at L=9216 — not runnable)
    ref = lambda x_, n_, a_: A.cross_attention(
        a_, F.layer_norm(n_, x_), None, heads=HEADS, impl="flash") + x_

    o1 = jax.jit(fb)(x, p_norm, p_attn)
    o2 = jax.jit(ref)(x, p_norm, p_attn)
    d = float(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)).max())
    sc = float(jnp.abs(o2.astype(jnp.float32)).max())
    print(f"parity max|diff| {d:.3e} at scale {sc:.3f}", flush=True)

    t_ref = timed(ref, x, p_norm, p_attn)
    t_fb = timed(fb, x, p_norm, p_attn)
    print(f"xla+flash path: {t_ref*1e3:7.2f} ms/call", flush=True)
    print(f"flashblock    : {t_fb*1e3:7.2f} ms/call  ({t_ref/t_fb:.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
