"""Sort-primitive costs on TPU for the GS build_pairs sort replacement
(VERDICT r4 item 4: the 5M fwd slope is lax.sort-bound).

Measures, at 2/5/12M i32 keys (+ i32 payload):
  1. lax.sort flat (the production build_pairs sort) — the baseline slope.
  2. lax.sort vectorized along the last axis of (R, C) — the block-sort
     primitive every hybrid scheme would lean on.
  3. one roll-based compare-exchange stage on (R, C) — the per-stage cost
     of a hand-built bitonic (x ~k(k+1)/2 stages for a full network).
  4. elementwise min/max row pair stage (row-crossing bitonic stage).
  5. histogram scatter-add of 12M tile ids into 2400 bins (radix pass 1).
  6. merge-split of sorted row pairs (reverse + minmax + 2 row-sorts) — the
     per-level cost of a block bitonic mergesort.

Usage: python scripts/sortbench.py [millions ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import benchcache  # noqa: F401
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    sizes = [float(a) for a in sys.argv[1:]] or [2.0, 5.0, 12.0]
    C = 2048
    for m in sizes:
        n = int(m * 1e6)
        n = (n + C - 1) // C * C
        R = n // C
        rng = np.random.default_rng(0)
        key = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
        pay = jnp.arange(n, dtype=jnp.int32)
        key2 = key.reshape(R, C)
        pay2 = pay.reshape(R, C)
        tiles = jnp.asarray(rng.integers(0, 2400, n, dtype=np.int32))

        t_flat = timed(jax.jit(
            lambda k, p: jax.lax.sort((k, p), num_keys=1)), key, pay)

        t_rows = timed(jax.jit(
            lambda k, p: jax.lax.sort((k, p), dimension=1, num_keys=1)),
            key2, pay2)

        @jax.jit
        def ce_lane(k, p, mshift=64):
            bit = (jnp.arange(C, dtype=jnp.int32) & mshift) > 0
            kp = jnp.where(bit, jnp.roll(k, mshift, 1), jnp.roll(k, -mshift, 1))
            pp = jnp.where(bit, jnp.roll(p, mshift, 1), jnp.roll(p, -mshift, 1))
            take_min = (~bit) == (k <= kp)
            return (jnp.where(take_min, jnp.minimum(k, kp), jnp.maximum(k, kp)),
                    jnp.where(take_min ^ (k > kp), p, pp))

        t_ce_lane = timed(ce_lane, key2, pay2)

        @jax.jit
        def ce_row(k, p):
            a, b = k[0::2], k[1::2]
            pa, pb = p[0::2], p[1::2]
            lo = jnp.minimum(a, b)
            hi = jnp.maximum(a, b)
            sel = a <= b
            plo = jnp.where(sel, pa, pb)
            phi = jnp.where(sel, pb, pa)
            out_k = jnp.stack([lo, hi], 1).reshape(R, C)
            out_p = jnp.stack([plo, phi], 1).reshape(R, C)
            return out_k, out_p

        t_ce_row = timed(ce_row, key2, pay2)

        @jax.jit
        def hist(t):
            return jnp.zeros((2400,), jnp.int32).at[t].add(1)

        t_hist = timed(hist, tiles)

        @jax.jit
        def merge_split(k, p):
            # rows pre-sorted ascending; merge row pairs (2i, 2i+1)
            ks, ps = jax.lax.sort((k, p), dimension=1, num_keys=1)
            a, b = ks[0::2], ks[1::2][:, ::-1]
            pa, pb = ps[0::2], ps[1::2][:, ::-1]
            sel = a <= b
            lo = jnp.where(sel, a, b)
            hi = jnp.where(sel, b, a)
            plo = jnp.where(sel, pa, pb)
            phi = jnp.where(sel, pb, pa)
            k2 = jnp.stack([lo, hi], 1).reshape(R, C)
            p2 = jnp.stack([plo, phi], 1).reshape(R, C)
            return jax.lax.sort((k2, p2), dimension=1, num_keys=1)

        t_ms = timed(merge_split, key2, pay2)

        print(f"n={n/1e6:.1f}M: flat_sort {t_flat*1e3:8.1f} ms | "
              f"row_sort(R,{C}) {t_rows*1e3:7.1f} | "
              f"ce_lane {t_ce_lane*1e3:6.2f} | ce_row {t_ce_row*1e3:6.2f} | "
              f"hist2400 {t_hist*1e3:6.1f} | merge_split {t_ms*1e3:7.1f}",
              flush=True)


if __name__ == "__main__":
    main()
