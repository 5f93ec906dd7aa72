"""Split 3DGS pallas path cost: project+build_pairs vs composite kernel.

Methodology per docs/STATE.md: jit whole functions, fresh-ish inputs via
donated reuse, force host readback, min over reps, one process.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.gs import tile_raster as TR
from mudg_tpu.gs.gaussians import project_gaussians
from gsbench import make_scene  # noqa: E402  (scripts dir on path via __main__)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    W, H = 960, 640
    tw, th = TR._tile_grid(W, H)
    n_tiles = tw * th
    for n in (2_000_000,):
        g, K, w2c = make_scene(n)
        mp = max(4 * n, 1 << 22)

        @jax.jit
        def build_only(g):
            proj = project_gaussians(g, K, w2c, width=W, height=H)
            feats, bounds, nd = TR.build_pairs(
                proj, g.colors, width=W, height=H, max_pairs=mp)
            return feats, bounds, nd

        @jax.jit
        def full(g):
            return TR.rasterize_pallas(g, K, w2c, width=W, height=H,
                                       max_pairs=mp)

        feats, bounds, nd = build_only(g)
        print(f"n={n:,} pairs_total~{int(bounds[-1])} dropped={int(nd)}")

        @jax.jit
        def comp_only(feats, bounds):
            return TR.composite_tiles(feats, bounds, n_tiles, tw)

        t_build = timeit(build_only, g)
        t_comp = timeit(comp_only, feats, bounds)
        t_full = timeit(full, g)
        print(f"n={n:,}: build {t_build*1e3:.1f} ms, composite "
              f"{t_comp*1e3:.1f} ms, full {t_full*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
