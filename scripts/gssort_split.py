"""Internal phase split of build_pairs at the 5M/exact-budget point:
level-2 expand vs sort vs bounds/pad vs feature gather (prefix-jit
differencing over reconstructed pipeline prefixes; the stages mirror
tile_raster.build_pairs and import its helpers so the math stays shared).

The budget sweep (docs/STATE.md r4) gives build = ~372 ms + ~131 ms/M; this
attributes the slope. Usage: python scripts/gssort_split.py [n_millions]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import benchcache  # noqa: F401
import jax.numpy as jnp

from mudg_tpu.gs import tile_raster as TR
from mudg_tpu.gs.gaussians import project_gaussians, view_colors
from mudg_tpu.gs.rasterize import _tile_grid
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
    mr, mp = TR.auto_budgets(g, K, w2c, width=W, height=H,
                             slack=1.0, bucket=False)
    print(f"n={n:,}: exact budgets rows={mr:,} pairs={mp:,}", flush=True)
    tw, th = _tile_grid(W, H)
    n_tiles = tw * th

    def prefix(stage):
        def fn(gg):
            proj = project_gaussians(gg, K, w2c, width=W, height=H)
            db = 31 - int(n_tiles + 1).bit_length()
            dmin = jnp.min(jnp.where(proj.visible, proj.depths, jnp.inf))
            dmax = jnp.max(jnp.where(proj.visible, proj.depths, -jnp.inf))
            qscale = ((1 << db) - 1) / jnp.maximum(dmax - dmin, 1e-12)
            dq_g = jnp.clip(
                jnp.clip((proj.depths - dmin) * qscale, 0,
                         None).astype(jnp.int32),
                0, (1 << db) - 1)
            rg, ty, tx0, span_x, total_rows, ex = TR._enumerate_rows(
                proj, tw=tw, th=th, max_rows=mr, extras=dq_g[:, None])
            if stage == "rows":
                return jnp.sum(span_x) + jnp.sum(ty[::997]) + total_rows
            rr, slot2, starts2, valid, total = TR._expand2(span_x, mp)
            rtab = jnp.stack([rg, ty, tx0, ex[:, 0], starts2], axis=1)
            rt = rtab[rr]
            gi = rt[:, 0]
            tile_id = jnp.where(
                valid, rt[:, 1] * tw + rt[:, 2] + (slot2 - rt[:, 4]),
                n_tiles)
            if stage == "expand":
                return (jnp.sum(gi[::997]) + jnp.sum(tile_id[::997])
                        + total)
            key = (tile_id << db) | rt[:, 3]
            key_s, gi_s = jax.lax.sort((key, gi), num_keys=1)
            if stage == "sort":
                return jnp.sum(gi_s[::997]) + jnp.sum(key_s[::997])
            feats, bounds, nd = TR.build_pairs(
                proj, view_colors(gg, w2c), width=W, height=H,
                max_pairs=mp, max_rows=mr)
            return jnp.sum(feats[:, ::37]) + jnp.sum(bounds) + nd
        return jax.jit(fn)

    ts = {}
    for stage in ("rows", "expand", "sort", "all"):
        ts[stage] = timed(prefix(stage), g)
        print(f"  through {stage:7s}: {ts[stage]*1e3:8.1f} ms", flush=True)
    print(f"  deltas: expand {1e3*(ts['expand']-ts['rows']):.0f}  "
          f"sort {1e3*(ts['sort']-ts['expand']):.0f}  "
          f"pad+gather {1e3*(ts['all']-ts['sort']):.0f} ms "
          f"(note: 'all' re-runs the shared prefix inside build_pairs)",
          flush=True)


if __name__ == "__main__":
    main()
