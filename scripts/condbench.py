"""Training-step conditioning-path costs on one v5e chip (MDM512, bs=1).

The 873 ms fwd+bwd step is not all UNet: training_loss runs THREE VAE
encodes (dense target + sparse RGB + sparse depth, vae_chunk=1), TWO CLIP
text encodes (cond + null), and the CLIP image tower + resampler every step.
This measures each component (chained-scan timing per docs/STATE.md) and the
encode chunk-size sweep (decode's sweep picked chunk=16; encode was never
tuned).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

# Persistent compile cache (same rationale as tests/conftest.py: compiles
# route through a slow remote service; repeat probe runs skip them)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from mudg_tpu.models import mdm as M
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
    cfg = M.MDMConfig()
    shapes = jax.eval_shape(lambda k: M.init_mdm(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, jnp.float32), shapes)
    rng = jax.random.PRNGKey(1)

    frames = jax.random.uniform(rng, (1, 16, 320, 512, 3), minval=-1, maxval=1)

    for dt in (jnp.float32, jnp.bfloat16):
        for chunk in (1, 16):
            sec = timed(lambda x: V.encode_video(params["vae"], cfg.vae,
                                                 x.astype(dt),
                                                 rng=jax.random.PRNGKey(0),
                                                 chunk=chunk), frames)
            print(f"vae encode {jnp.dtype(dt).name:8s} chunk={chunk:2d}: "
                  f"{sec*1e3:7.1f} ms", flush=True)

    # all three per-step encodes (dense + sparse RGB + sparse depth) stacked
    # into ONE encode call: the encoder is bandwidth-bound, so streaming the
    # weights once per chunk step for batch 3 should beat 3 separate calls
    frames3 = jnp.concatenate([frames, frames * 0.5, frames * 0.25], axis=0)
    for chunk in (1, 3, 16, 48):
        if 48 % chunk:
            continue
        sec = timed(lambda x: V.encode_video(params["vae"], cfg.vae,
                                             x.astype(jnp.bfloat16),
                                             rng=jax.random.PRNGKey(0),
                                             chunk=chunk), frames3)
        print(f"vae encode bf16 stacked3 chunk={chunk:2d}: {sec*1e3:7.1f} ms "
              f"(vs 3 separate calls)", flush=True)

    for dt in (jnp.float32, jnp.bfloat16):
        sec = timed(lambda x: M.embed_image(params, cfg, x[:, 0].astype(dt)),
                    frames)
        print(f"clip image + resampler {jnp.dtype(dt).name}: {sec*1e3:7.1f} ms",
              flush=True)

    # per-step text encode cost (the null-prompt encode is a hoistable
    # constant; this is what hoisting saves)
    tokens = jnp.zeros((1, 77), jnp.int32)
    sec = timed(lambda x: M.encode_text(params, cfg, tokens
                                        + (x[0, 0, 0, 0, 0] * 0).astype(jnp.int32)),
                frames)
    print(f"clip text encode (b=1): {sec*1e3:7.1f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
