import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from mudg_tpu.gs import rasterize as R
from mudg_tpu.gs import tile_raster as TR
from mudg_tpu.gs.gaussians import init_from_points, Gaussians

rng = np.random.default_rng(0)
n = 5000
xyz = np.stack([rng.uniform(-30,30,n), rng.uniform(-8,8,n), rng.uniform(4,80,n)],-1).astype(np.float32)
rgb = rng.random((n,3)).astype(np.float32)
g = init_from_points(jnp.asarray(xyz), jnp.asarray(rgb), init_scale=0.15, opacity=0.5)
K = jnp.asarray([[300.0,0,240.0],[0,300.0,160.0],[0,0,1]]); w2c = jnp.eye(4)
W,H = 480, 320

ref = jax.jit(lambda g: R.rasterize(g, K, w2c, width=W, height=H, max_per_tile=2048, tiles_per_gaussian=256))(g)
out = jax.jit(lambda g: TR.rasterize_pallas(g, K, w2c, width=W, height=H, max_pairs=1<<18))(g)
print("ref dropped:", int(ref.n_dropped), " pallas dropped:", int(out.n_dropped), flush=True)
for name in ("color", "depth", "alpha"):
    a = np.asarray(getattr(out, name), np.float32); b = np.asarray(getattr(ref, name), np.float32)
    print(f"{name}: max|diff| = {np.abs(a-b).max():.2e}  (scale {np.abs(b).max():.3f})", flush=True)

# gradient parity on TPU
def loss(means, which):
    gg = g._replace(means=means)
    if which == "xla":
        o = R.rasterize(gg, K, w2c, width=W, height=H, max_per_tile=2048, tiles_per_gaussian=256)
    else:
        o = TR.rasterize_pallas(gg, K, w2c, width=W, height=H, max_pairs=1<<18)
    return jnp.mean(o.color**2) + 0.1*jnp.mean(o.alpha)
g1 = np.asarray(jax.jit(jax.grad(lambda m: loss(m, "xla")))(g.means))
g2 = np.asarray(jax.jit(jax.grad(lambda m: loss(m, "pal")))(g.means))
s = np.abs(g1).max()
print(f"grad means: max|diff| = {np.abs(g1-g2).max():.2e} (scale {s:.2e})", flush=True)
print("TPU-PARITY-OK" if np.abs(g1-g2).max() < 2e-3*s + 1e-9 else "TPU-PARITY-WEAK", flush=True)
