"""Component-level TPU timing: UNet step vs VAE decode vs flash-vs-dense
attention. Informs bench.py optimization."""
import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from mudg_tpu.nn import unet3d as U
    from mudg_tpu.nn import vae as V

    dtype = jnp.bfloat16
    ucfg = U.UNetConfig()
    rng = jax.random.PRNGKey(0)
    unet = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, dtype),
        jax.eval_shape(lambda k: U.init_unet(k, ucfg), rng),
    )
    b, t, hh, ww = 2, 16, 40, 64
    x = jnp.zeros((b, t, hh, ww, 12), dtype)
    ts = jnp.array([500, 500], jnp.int32)
    ctx = jnp.zeros((b, 77 + t * 16, 1024), dtype)
    lab = jnp.zeros((b,), jnp.int32)

    for impl in ("flash", "xla"):
        f = jax.jit(lambda u, x, ts, ctx, lab: U.unet_apply(
            u, ucfg, x, ts, ctx, c_label=lab, impl=impl))
        dt = timeit(f, unet, x, ts, ctx, lab)
        print(f"unet fwd b=2 impl={impl}: {dt*1000:.1f} ms", flush=True)

    vcfg = V.VAEConfig()
    for vd in (jnp.float32, jnp.bfloat16):
        vae = jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, vd),
            jax.eval_shape(lambda k: V.init_vae(k, vcfg), rng),
        )
        z = jnp.zeros((1, 16, 40, 64, 4), vd)
        for chunk in (1, 4, 16):
            f = jax.jit(lambda p, z: V.decode_video(p, vcfg, z, chunk=chunk))
            try:
                dt = timeit(f, vae, z)
                print(f"vae decode 16f chunk={chunk} {vd.__name__}: {dt*1000:.1f} ms", flush=True)
            except Exception as e:
                print(f"vae decode chunk={chunk} {vd.__name__}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
