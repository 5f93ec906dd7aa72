"""build_pairs phase split + pair-budget sensitivity at large N.

q2 steps 1-2 (docs/STATE.md r4): at 5M gaussians the FULL forward is 3.0 s of
which build_pairs is 2.97 s and the Pallas composite ~22 ms; packed-vs-lex
sort keys are IDENTICAL — the sort is not the bottleneck. This probe answers
two questions in one process:

  1. what the TRUE pair count is vs the blind mp=4n budget (gsbench), and
     how fwd time scales as the budget shrinks toward it (build cost is
     known to scale with max_pairs, docs/STATE.md round 1);
  2. where build_pairs' time actually goes: projection / row expand / pair
     expand / sort / segment padding / feature pack — via prefix-jit
     differencing (each prefix returns a consumed scalar so nothing is DCE'd).

Usage: python scripts/gsbuild_phases.py [n_millions]
"""
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


def timed(fn, *args, reps=4):
    out = fn(*args)
    float(jnp.sum(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 5_000_000
    g, K, w2c = make_scene(n)

    # -- true pair count ----------------------------------------------------
    @jax.jit
    def count(gg):
        proj = project_gaussians(gg, K, w2c, width=W, height=H)
        _, _, n_dropped = TR.build_pairs(
            proj, view_colors(gg, w2c), width=W, height=H,
            max_pairs=4 * n)
        return n_dropped

    # n_dropped == max(total - max_pairs, 0) + row part; with a huge budget
    # it is 0 — re-derive the true total from a tiny budget instead:
    @jax.jit
    def total_pairs(gg):
        proj = project_gaussians(gg, K, w2c, width=W, height=H)
        # tiny pair budget + oversized row budget: n_dropped == total - 128
        _, _, nd = TR.build_pairs(
            proj, view_colors(gg, w2c), width=W, height=H, max_pairs=128,
            max_rows=2 * n)
        return nd

    tp = int(total_pairs(g)) + 128
    print(f"n={n:,}: true pairs ~{tp:,} (blind budget 4n = {4*n:,})",
          flush=True)

    # -- budget sensitivity on the full forward ------------------------------
    # sweep RELATIVE TO THE TRUE pair count (the first run of this probe put
    # mult x 4n up to 80M pairs and OOM'd the compile service); the blind 4n
    # budget rides along as the gsbench reference point
    for mp in (4 * n, int(tp * 2.0), int(tp * 1.5), int(tp * 1.25),
               TR._bucket(tp), int(tp * 0.75), int(tp * 0.5)):
        mp = mp // 128 * 128
        if mp < tp:
            note = " (UNDER true pairs — drops expected)"
        else:
            note = ""
        f = jax.jit(lambda gg: TR.rasterize_pallas(
            gg, K, w2c, width=W, height=H, max_pairs=mp).color)
        fo = jax.jit(lambda gg: TR.rasterize_pallas(
            gg, K, w2c, width=W, height=H, max_pairs=mp).n_dropped)
        t = timed(f, g)
        print(f"  mp={mp/1e6:6.1f}M: fwd {t*1e3:8.1f} ms  "
              f"dropped={int(fo(g))}{note}", flush=True)

    # -- phase split (prefix differencing) -----------------------------------
    mp = 4 * n

    def prefix(stage):
        def fn(gg):
            proj = project_gaussians(gg, K, w2c, width=W, height=H)
            if stage == "proj":
                return jnp.sum(proj.means2d) + jnp.sum(proj.depths)
            feats, bounds, nd = TR.build_pairs(
                proj, view_colors(gg, w2c), width=W, height=H, max_pairs=mp)
            return jnp.sum(feats[:, ::37]) + jnp.sum(bounds) + nd
        return jax.jit(fn)

    t_proj = timed(prefix("proj"), g)
    t_build = timed(prefix("all"), g)
    print(f"  proj-only {t_proj*1e3:8.1f} ms   proj+build {t_build*1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
