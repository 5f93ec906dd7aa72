"""Decompose _expand + the rows phase at the GS 5M point (round-5 gssort_split
result: rows 577 ms, expand +848 ms, sort only +90 ms — the round-4
"sort-bound" hypothesis was WRONG; the ragged expansions dominate).

Times each internal op standalone at the true sizes (n_rows=7.35M,
max_pairs=11.9M): cumsum, scatter-max-at-starts, cummax, owner gather,
plus composable alternatives (scan-free segment ids via sort, blocked
2D cummax).

Usage: python scripts/gsexpand_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import benchcache  # noqa: F401
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=4):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][:16].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0][:16].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n_rows = 7_352_448
    max_pairs = 11_882_368
    rng = np.random.default_rng(0)
    # spans ~ realistic: mean pairs/row = 11.88/7.35 ~ 1.6
    span = jnp.asarray(
        rng.poisson(1.6, n_rows).astype(np.int32))
    mark_init = jnp.full((max_pairs,), -1, jnp.int32)

    t = timed(jax.jit(lambda s: jnp.cumsum(s)), span)
    print(f"cumsum({n_rows/1e6:.1f}M):            {t*1e3:8.1f} ms", flush=True)

    offsets = jnp.cumsum(span)
    starts = offsets - span
    src_ids = jnp.arange(n_rows, dtype=jnp.int32)
    scat_at = jnp.where((span > 0) & (starts < max_pairs), starts, max_pairs)

    t = timed(jax.jit(
        lambda m, at, ids: m.at[at].max(ids, mode="drop")),
        mark_init, scat_at, src_ids)
    print(f"scatter-max({n_rows/1e6:.1f}M->{max_pairs/1e6:.1f}M): {t*1e3:8.1f} ms",
          flush=True)

    mark = mark_init.at[scat_at].max(src_ids, mode="drop")
    t = timed(jax.jit(lambda m: jax.lax.cummax(m)), mark)
    print(f"cummax({max_pairs/1e6:.1f}M):           {t*1e3:8.1f} ms", flush=True)

    owner = jnp.maximum(jax.lax.cummax(mark), 0)
    t = timed(jax.jit(lambda s, o: s[o]), starts, owner)
    print(f"gather({max_pairs/1e6:.1f}M rows of i32): {t*1e3:8.1f} ms", flush=True)

    # blocked 2D cummax: scan along the minor axis of (R, C) + carry fix-up
    # via a tiny second scan over per-row maxima
    C = 2048
    R = (max_pairs + C - 1) // C
    pad = R * C - max_pairs

    @jax.jit
    def cummax2d(m):
        m2 = jnp.pad(m, (0, pad), constant_values=-1).reshape(R, C)
        within = jax.lax.cummax(m2, axis=1)
        carry = jax.lax.cummax(within[:, -1])
        carry = jnp.concatenate([jnp.full((1,), -1, m.dtype), carry[:-1]])
        return jnp.maximum(within, carry[:, None]).reshape(-1)[:max_pairs]

    got = cummax2d(mark)
    ref = jax.lax.cummax(mark)
    assert bool(jnp.all(got == ref)), "cummax2d mismatch"
    t = timed(cummax2d, mark)
    print(f"cummax2d({max_pairs/1e6:.1f}M, C={C}):   {t*1e3:8.1f} ms", flush=True)

    # scatter via sort: stable-sort (scat_at, src) then the mark array is a
    # gather of the sorted stream — measures the sort-as-scatter alternative
    t = timed(jax.jit(
        lambda at, ids: jax.lax.sort((at, ids), num_keys=1)),
        scat_at, src_ids)
    print(f"sort({n_rows/1e6:.1f}M 2xi32):        {t*1e3:8.1f} ms", flush=True)

    # one-hot-free segment expand alternative: repeat via cumsum over a
    # 0/1 boundary array built by scatter-ADD of ones (is add cheaper than max?)
    t = timed(jax.jit(
        lambda at: jnp.zeros((max_pairs,), jnp.int32).at[at].add(
            1, mode="drop")),
        scat_at)
    print(f"scatter-add({n_rows/1e6:.1f}M->{max_pairs/1e6:.1f}M): {t*1e3:8.1f} ms",
          flush=True)

    # cumsum over the pair table (i32) — prefix-scan cost reference at 12M
    t = timed(jax.jit(lambda m: jnp.cumsum(m)), mark)
    print(f"cumsum({max_pairs/1e6:.1f}M):           {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
