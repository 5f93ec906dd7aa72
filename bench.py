"""Benchmark: MDM512 25-step DDIM, 16-frame 320x512 clip, end-to-end on TPU.

Measures the full per-clip pipeline at reference-inference fidelity
(BASELINE.md target: <10 s/clip on v5e; 2-point CFG so each DDIM step is one
UNet call at batch 2, plus per-frame VAE decode), with the full-size 1.44B
UNet in bfloat16 and Pallas flash attention on the spatial self-attention.

Weights are randomly initialized (the published .ckpt is not vendored); the
compute graph, shapes, and dtypes are identical to real inference, so timing
is representative.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mudg_tpu.models import mdm as M
    from mudg_tpu.nn import unet3d as U
    from mudg_tpu.nn import vae as V
    from mudg_tpu.diffusion import ddim
    from mudg_tpu.core import diffusion as D

    steps = 25
    b, t, hh, ww = 1, 16, 40, 64  # latent 320x512 / f8
    n_var = 2                     # 2-point CFG (render.sh recipe)
    guidance_scale, guidance_rescale = 7.5, 0.7

    ucfg = U.UNetConfig()
    vcfg = V.VAEConfig()
    dtype = jnp.bfloat16

    import sys
    import numpy as _np

    def log(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    rng = jax.random.PRNGKey(0)
    # weights are random-valued but cheap to materialize: abstract shapes
    # filled with a small constant (identical compute/timing to real weights)
    log("materializing params")
    unet_shapes = jax.eval_shape(lambda k: U.init_unet(k, ucfg), rng)
    unet = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, dtype), unet_shapes
    )
    vae_shapes = jax.eval_shape(lambda k: V.init_vae(k, vcfg), rng)
    vae = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, jnp.float32), vae_shapes)
    log("params ready")

    cfg_sched = M.MDMConfig()
    sched = cfg_sched.schedule()
    consts = ddim.make_ddim_constants(sched, steps, timestep_spacing="uniform_trailing", eta=1.0)

    context = jax.random.normal(
        rng, (n_var * b, 77 + t * ucfg.image_tokens_per_frame, ucfg.context_dim), dtype
    ) * 0.02
    c_concat = jax.random.normal(rng, (n_var * b, t, hh, ww, 8), dtype) * 0.1
    labels = jnp.zeros((n_var * b,), jnp.int32)
    fs = jnp.full((n_var * b,), 10, jnp.int32)

    @jax.jit
    def clip_fn(unet, vae, c_concat, context, key):
        def model_fn(x, tstep):
            xb = jnp.tile(x, (n_var, 1, 1, 1, 1))
            xin = jnp.concatenate([xb, c_concat], axis=-1)
            tb = jnp.tile(tstep, (n_var,))
            v = U.unet_apply(unet, ucfg, xin, tb, context, c_label=labels, fs=fs)
            e_uc, e_c = jnp.split(v, 2, axis=0)
            out = D.cfg_combine(e_uc, e_c, guidance_scale)
            return D.rescale_noise_cfg(out, e_c, guidance_rescale)

        z = ddim.ddim_sample(model_fn, key, (b, t, hh, ww, 4), consts, dtype=dtype)
        x = V.decode_video(vae, vcfg, z.astype(jnp.float32), chunk=1)
        return jnp.clip(x, -1, 1)

    # compile + warmup
    log("compiling + warmup")
    t0 = time.perf_counter()
    out = clip_fn(unet, vae, c_concat, context, jax.random.PRNGKey(1))
    out.block_until_ready()
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = clip_fn(unet, vae, c_concat, context, jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)

    p50 = float(np.median(times))
    frames_per_sec = t / p50
    result = {
        "metric": "mdm512_25step_clip_latency_p50",
        "value": round(p50, 3),
        "unit": "s/clip (16f 320x512, 25-step DDIM, 2pt-CFG, bf16, 1 chip)",
        "vs_baseline": round(10.0 / p50, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
