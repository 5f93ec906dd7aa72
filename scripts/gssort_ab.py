"""GS build_pairs sort A/B + phase split at large N (round-4 VERDICT 3).

Round-2 measured 5M fwd 2.65 s BEFORE two round-3 changes landed unmeasured:
the packed i32 (tile|depth-bits) sort key and the MXU pair-composite
(per-chunk (npay, CK) x (CK, NPIX) contraction replacing per-channel
rowsums). The fresh round-4 queue run shows 3.0 s — a regression. This probe
attributes it within ONE process:

  full fwd        packed vs lex sort (MUDG_GS_SORT read at trace time)
  build_pairs     packed vs lex (projection + pair table only)

Usage: python scripts/gssort_ab.py [n_millions]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import benchcache  # noqa: F401
import jax.numpy as jnp

from mudg_tpu.gs import tile_raster as TR
from mudg_tpu.gs.gaussians import project_gaussians, view_colors
from gsbench import make_scene

W, H = 960, 640


def timed(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 5_000_000
    g, K, w2c = make_scene(n)
    mp = max(4 * n, 1 << 22)

    def full(gg):
        o = TR.rasterize_pallas(gg, K, w2c, width=W, height=H, max_pairs=mp)
        return o.color

    def pairs_only(gg):
        proj = project_gaussians(gg, K, w2c, width=W, height=H)
        feats, bounds, _ = TR.build_pairs(
            proj, view_colors(gg, w2c), width=W, height=H, max_pairs=mp)
        return feats[:, :1].sum() + bounds.sum()

    for mode in ("packed", "lex"):
        os.environ["MUDG_GS_SORT"] = mode
        t_full = timed(jax.jit(full), g)
        t_pairs = timed(jax.jit(pairs_only), g)
        print(f"{mode:6s}: full {t_full*1e3:8.1f} ms   "
              f"build_pairs {t_pairs*1e3:8.1f} ms   "
              f"kernel-ish {(t_full - t_pairs)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
