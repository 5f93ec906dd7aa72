"""flashblock (bq, bkv) sweep at the MDM1024 ds1 shape (VERDICT r4 item 6:
"flashblock bkv/bq sweep at L=9216 is the obvious untried tuning").

Times _fb_impl standalone at (B=32, L=9216, C=320, h=5) over every
scoped-vmem-feasible (bq, bkv) pair, chained-scan method, one process.
Production default is _fb_pick's greedy (512, 2048).

Usage: python scripts/fb_sweep.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import benchcache  # noqa: F401
import jax.numpy as jnp

from mudg_tpu.kernels import spatial_attn as SP

B, L, C, HEADS = 32, 9216, 320, 5


def timed(fn, x, p_norm, p_attn, n_long=24, n_short=4):
    def chain(x, n):
        def body(c_, _):
            y = fn(c_, p_norm, p_attn)
            return c_ + 0.01 * y.astype(c_.dtype), None
        c_, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c_.astype(jnp.float32))

    jl = jax.jit(functools.partial(chain, n=n_long))
    js = jax.jit(functools.partial(chain, n=n_short))
    float(jl(x)); float(js(x))
    tl = ts = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(jl(x)); tl = min(tl, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(js(x)); ts = min(ts, time.perf_counter() - t0)
    return (tl - ts) / (n_long - n_short)


def main():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    x = (jax.random.normal(ks[0], (B, L, C)) * 0.3).astype(jnp.bfloat16)
    p_norm = {"weight": jnp.ones((C,)), "bias": jnp.zeros((C,))}
    mk = lambda k: jax.random.normal(k, (C, C)) * (C ** -0.5)
    p_attn = {"to_q": {"weight": mk(ks[1])}, "to_k": {"weight": mk(ks[2])},
              "to_v": {"weight": mk(ks[3])},
              "to_out": {"0": {"weight": mk(ks[4]),
                               "bias": jnp.zeros((C,))}}}

    results = []
    for bq in (512, 256, 128):
        if L % bq:
            continue
        for bkv in (3072, 2304, 2048, 1536, 1152, 1024, 768, 512):
            if L % bkv or L // bkv < 2:
                continue
            cp = SP._fb_cpad(C)
            est = (2 * 2 * bkv * cp * 2 + 2 * bq * bkv * 4 + 3 * bq * C * 4
                   + 2 * 2 * C * C * 2 + 2 * 2 * bq * C * 2 * 2
                   + 3 * bq * C * 4)
            if est >= int(14.5 * 2**20):
                continue
            fn = functools.partial(SP._fb_impl, heads=HEADS, bq=bq, bkv=bkv)
            try:
                dt = timed(fn, x, p_norm, p_attn)
                results.append((bq, bkv, dt))
                print(f"bq={bq:4d} bkv={bkv:5d}: {dt*1e3:7.2f} ms/call "
                      f"(est {est/2**20:.1f}M)", flush=True)
            except Exception as e:
                print(f"bq={bq:4d} bkv={bkv:5d}: FAIL {type(e).__name__} "
                      f"(est {est/2**20:.1f}M)", flush=True)
    if results:
        best = min(results, key=lambda r: r[2])
        print(f"BEST: bq={best[0]} bkv={best[1]} {best[2]*1e3:.2f} ms "
              f"(production greedy pick = {SP._fb_pick(L, C, HEADS)})",
              flush=True)


if __name__ == "__main__":
    main()
