"""3DGS rasterizer scaling bench on TPU: Pallas tiles vs XLA sort+scan."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.gs import rasterize as R
from mudg_tpu.gs import tile_raster as TR
from mudg_tpu.gs.gaussians import init_from_points


def make_scene(n, seed=0):
    import os

    rng = np.random.default_rng(seed)
    # urban-ish: points spread over a 200m x 60m x 20m slab in front
    xyz = np.stack([
        rng.uniform(-60, 60, n), rng.uniform(-12, 12, n),
        rng.uniform(3, 200, n),
    ], -1).astype(np.float32)
    rgb = rng.random((n, 3)).astype(np.float32)
    g = init_from_points(jnp.asarray(xyz), jnp.asarray(rgb),
                         init_scale=0.25, opacity=0.5)
    if os.environ.get("GSBENCH_MIXED") == "1":
        # trained-scene-like opacity spread (most splats translucent):
        # exercises the opacity-aware extents culling
        logits = rng.normal(-2.0, 1.5, n).astype(np.float32)
        g = g._replace(opacity=jnp.asarray(logits))
    K = jnp.asarray([[560.0, 0, 480.0], [0, 560.0, 320.0], [0, 0, 1]])
    return g, K, jnp.eye(4)


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # force real sync through a host readback
    float(jnp.sum(out.color))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.color))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    W, H = 960, 640
    import os
    sizes = (200_000, 1_000_000, 2_000_000)
    if os.environ.get("GSBENCH_BIG") == "1":
        sizes = (5_000_000,)
    for n in sizes:
        g, K, w2c = make_scene(n)
        if os.environ.get("GSBENCH_AUTO", "0") == "1":
            # right-sized budgets from the exact count pass (the production
            # path: GSConfig.max_pairs=None); build cost scales with the
            # budget, so the blind 4n budget is pure slack
            t0 = time.perf_counter()
            # one-off render of a fixed view: exact count, no bucket slack
            mr, mp = TR.auto_budgets(g, K, w2c, width=W, height=H,
                                     slack=1.0, bucket=False)
            print(f"n={n:>9,}: auto budgets rows={mr:,} pairs={mp:,} "
                  f"(count pass {time.perf_counter()-t0:.1f}s incl compile)",
                  flush=True)
        else:
            mr, mp = None, max(4 * n, 1 << 22)

        f_pal = jax.jit(lambda g: TR.rasterize_pallas(
            g, K, w2c, width=W, height=H, max_pairs=mp, max_rows=mr))
        t_pal, out = bench(f_pal, g)
        print(f"n={n:>9,}: pallas fwd {t_pal*1e3:8.1f} ms  "
              f"dropped={int(out.n_dropped)} alpha_mean={float(out.alpha.mean()):.3f}",
              flush=True)

        if n <= 200_000:
            f_xla = jax.jit(lambda g: R.rasterize(
                g, K, w2c, width=W, height=H, max_per_tile=1024,
                tiles_per_gaussian=16))
            t_xla, out2 = bench(f_xla, g)
            print(f"             xla    fwd {t_xla*1e3:8.1f} ms  "
                  f"dropped={int(out2.n_dropped)}", flush=True)
            d = float(jnp.abs(out.color - out2.color).max())
            print(f"             |pallas - xla| max = {d:.4f} "
                  f"(xla drops make small diffs expected)", flush=True)

        # training step: fwd+bwd
        def loss_fn(g):
            o = TR.rasterize_pallas(g, K, w2c, width=W, height=H,
                                    max_pairs=mp, max_rows=mr)
            return jnp.mean(o.color ** 2) + jnp.mean(o.alpha)

        grad_f = jax.jit(jax.grad(lambda m: loss_fn(g._replace(means=m))))
        gm = grad_f(g.means)
        float(jnp.sum(gm))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(grad_f(g.means)))
            ts.append(time.perf_counter() - t0)
        print(f"             pallas fwd+bwd {min(ts)*1e3:8.1f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
