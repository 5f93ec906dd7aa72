"""VAE decode dtype/impl sweep on TPU (MDM512 shapes: 16f 320x512).

bench.py decodes in f32 (229 ms of the 5.67 s clip). Questions:
  * how much does a bf16 decode save, and what is its pixel-space PSNR vs
    the f32 decode (quality bar: well above the bf16 UNet's 80 dB latent
    PSNR-vs-oracle, since decode error is additive at the end)?
  * does flash attention help the mid-block attention (L=2560, single head
    C=512) vs the forced dense-XLA path?
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from mudg_tpu.nn import vae as V


def timed(fn, x, n_long=12, n_short=2):
    def chain(x, n):
        def body(c, _):
            y = fn(c)
            return c + 1e-6 * jnp.mean(y).astype(c.dtype), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    fl = jax.jit(lambda x: chain(x, n_long))
    fs = jax.jit(lambda x: chain(x, n_short))
    float(fl(x)); float(fs(x))

    def best(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fl) - best(fs)) / (n_long - n_short)


def main():
    cfg = V.VAEConfig()
    rng = jax.random.PRNGKey(0)
    params = jax.tree.map(
        lambda s: jax.random.normal(jax.random.PRNGKey(hash(s.shape) % 2**31),
                                    s.shape, jnp.float32) * 0.05,
        jax.eval_shape(lambda k: V.init_vae(k, cfg), rng))
    z = jax.random.normal(rng, (1, 16, 40, 64, 4), jnp.float32) * 0.4

    ref = None
    for dt in (jnp.float32, jnp.bfloat16):
        fn = jax.jit(lambda z_: V.decode_video(params, cfg, z_.astype(dt),
                                               chunk=16))
        out = np.asarray(fn(z), np.float32)
        if ref is None:
            ref = out
        else:
            mse = float(np.mean((out - ref) ** 2))
            psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # range [-1,1] -> 4
            print(f"bf16 decode vs f32: max|d|={np.abs(out-ref).max():.4f} "
                  f"psnr={psnr:.1f} dB", flush=True)
        sec = timed(lambda z_: V.decode_video(params, cfg, z_.astype(dt),
                                              chunk=16), z)
        print(f"decode {jnp.dtype(dt).name:8s} chunk=16: {sec*1e3:7.1f} ms",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
