"""Streaming fused spatial-attention kernel vs the XLA-proj+flash path at
the MDM1024 ds2 shape (B=32, L=2304, C=640) it was built for. Chained-scan
timing per docs/STATE.md; also sanity-checks numerics on the real TPU.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.kernels import spatial_attn as SP
from mudg_tpu.nn import attention as A


def timed(fn, *args, n_long=256, n_short=32):
    def chain(x, n, *rest):
        def body(c, _):
            return fn(c, *rest), None
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    fl = jax.jit(functools.partial(chain, n=n_long))
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


def main(b=32, l=2304, c=640, heads=10):
    rng = jax.random.PRNGKey(0)
    p_attn = A.init_cross_attention(rng, c, heads=heads, dim_head=c // heads)
    p_attn = jax.tree.map(lambda a: a.astype(jnp.float32), p_attn)
    p_norm = {"weight": jnp.ones((c,), jnp.float32),
              "bias": jnp.zeros((c,), jnp.float32)}
    x = (jax.random.normal(jax.random.PRNGKey(1), (b, l, c), jnp.bfloat16)
         * 0.1)

    print(f"# shape (B={b}, L={l}, C={c}, H={heads}); "
          f"stream est {SP._stream_vmem_est(l, c)/2**20:.1f} MB; "
          f"whole-block bq={SP._pick_bq(l, c)}", flush=True)

    ref_fn = jax.jit(lambda x_: SP._xla_impl(x_, p_norm, p_attn, heads=heads))
    stream_fn = jax.jit(
        lambda x_: SP._stream_impl(x_, p_norm, p_attn, heads=heads))
    # what production currently runs at this shape: LN in XLA -> projections
    # -> flash kernel -> +residual
    from mudg_tpu.nn import functional as F

    flash_fn = jax.jit(lambda x_: A.cross_attention(
        p_attn, F.layer_norm(p_norm, x_), None, heads=heads, impl="auto") + x_)

    out_s = stream_fn(x)
    out_r = ref_fn(x)
    err = float(jnp.max(jnp.abs(out_s.astype(jnp.float32)
                                - out_r.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(out_r.astype(jnp.float32))))
    print(f"# stream vs xla max|diff| {err:.2e} (scale {scale:.3f})", flush=True)
    assert np.isfinite(np.asarray(out_s, np.float32)).all()

    t_stream = timed(stream_fn, x)
    t_flash = timed(flash_fn, x)
    print(f"stream {t_stream*1e3:7.3f} ms   xla+flash {t_flash*1e3:7.3f} ms "
          f"({t_flash/t_stream:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
