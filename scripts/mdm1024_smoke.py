"""Stage-2 (MDM1024, 576x1024) inference smoke + timing on one TPU chip.

Exercises the long-sequence spatial attention (s=9216 at ds1) and the
stage-2 memory envelope that the published render.sh recipe uses
(virtual_render/scripts/render.sh: 50 steps, cfg 7.5, 16 frames).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.core import diffusion as D
from mudg_tpu.diffusion import ddim
from mudg_tpu.models import mdm as M
from mudg_tpu.models import presets
from mudg_tpu.nn import unet3d as U
from mudg_tpu.nn import vae as V


def main(steps=5, int8_which=None):
    cfg = presets.get("mdm1024")
    ucfg, vcfg = cfg.unet, cfg.vae
    b, t, hh, ww = 1, 16, 72, 128  # 576x1024 / f8
    n_var = 2
    dtype = jnp.bfloat16

    rng = jax.random.PRNGKey(0)
    unet_shapes = jax.eval_shape(lambda k: U.init_unet(k, ucfg), rng)
    unet = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, dtype), unet_shapes)
    if int8_which:
        from mudg_tpu import quant

        unet = quant.quantize_pytree(unet, which=int8_which)
        print(f"# int8-quantized UNet (which={int8_which})", flush=True)
    vae_shapes = jax.eval_shape(lambda k: V.init_vae(k, vcfg), rng)
    vae = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, dtype), vae_shapes)

    sched = cfg.schedule()
    consts = ddim.make_ddim_constants(sched, steps,
                                      timestep_spacing="uniform_trailing", eta=1.0)
    context = jax.random.normal(
        rng, (n_var * b, 77 + t * ucfg.image_tokens_per_frame, ucfg.context_dim),
        dtype) * 0.02
    c_concat = jax.random.normal(rng, (n_var * b, t, hh, ww, 8), dtype) * 0.1
    labels = jnp.zeros((n_var * b,), jnp.int32)
    fs = jnp.full((n_var * b,), 10, jnp.int32)

    def make_clip_fn(cs):
        @jax.jit
        def clip_fn(unet, vae, c_concat, context, key):
            def model_fn(x, tstep):
                xb = jnp.tile(x, (n_var, 1, 1, 1, 1))
                xin = jnp.concatenate([xb, c_concat], axis=-1)
                tb = jnp.tile(tstep, (n_var,))
                v = U.unet_apply(unet, ucfg, xin, tb, context, c_label=labels, fs=fs)
                e_uc, e_c = jnp.split(v, 2, axis=0)
                out = D.cfg_combine(e_uc, e_c, 7.5)
                return D.rescale_noise_cfg(out, e_c, 0.7)

            z = ddim.ddim_sample(model_fn, key, (b, t, hh, ww, 4), cs, dtype=dtype)
            # production decode parity (render_infer --dtype bf16,
            # vae_chunk=16): the round-2/3 smoke decoded f32 at chunk=1
            # (~0.9 s at 576x1024) and the 50-step extrapolation then
            # multiplied that per-clip cost by 10
            x = V.decode_video(vae, vcfg, z.astype(dtype), chunk=16)
            return jnp.clip(x.astype(jnp.float32), -1, 1)

        return clip_fn

    clip_fn = make_clip_fn(consts)

    print(f"# compiling MDM1024 {steps}-step clip fn", flush=True)
    t0 = time.perf_counter()
    out = clip_fn(unet, vae, c_concat, context, jax.random.PRNGKey(1))
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print(f"# compile+1st: {time.perf_counter() - t0:.1f}s out={out.shape}", flush=True)

    def best(fn, *args):
        out_ts = []
        for i in range(2):
            t0 = time.perf_counter()
            o = fn(*args, jax.random.PRNGKey(2 + i))
            _ = float(jnp.sum(o.astype(jnp.float32)))
            out_ts.append(time.perf_counter() - t0)
        return min(out_ts), o

    t_long, out = best(clip_fn, unet, vae, c_concat, context)

    # difference a second, shorter clip so the per-clip constants (VAE
    # decode, sampler prologue) drop out of the per-step cost exactly
    if steps < 2:
        raise SystemExit("--steps must be >= 2 for the differencing "
                         "extrapolation (use --steps 5)")
    steps2 = max(steps - 3, 1)
    consts2 = ddim.make_ddim_constants(sched, steps2,
                                       timestep_spacing="uniform_trailing",
                                       eta=1.0)
    clip2 = make_clip_fn(consts2)
    print(f"# compiling {steps2}-step variant for differencing", flush=True)
    t0 = time.perf_counter()
    o2 = clip2(unet, vae, c_concat, context, jax.random.PRNGKey(1))
    _ = float(jnp.sum(o2.astype(jnp.float32)))
    print(f"# compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
    t_short, _ = best(clip2, unet, vae, c_concat, context)

    per_step = (t_long - t_short) / (steps - steps2)
    overhead = t_short - steps2 * per_step  # decode + prologue, per clip
    print(f"MDM1024 {steps}-step clip {t_long:.2f}s / {steps2}-step "
          f"{t_short:.2f}s -> {per_step*1e3:.0f} ms/UNet-step + "
          f"{overhead*1e3:.0f} ms/clip overhead (decode etc.); "
          f"50-step recipe = {per_step*50 + overhead:.1f}s/clip", flush=True)
    assert np.isfinite(np.asarray(out, np.float32)).all()


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--int8", default=None, choices=("all", "conv", "conv_wide"),
                   help="quantize the UNet first (quant.quantize_pytree "
                        "which=...) to measure the int8 serving policies "
                        "at stage-2 scale")
    a = p.parse_args()
    main(steps=a.steps, int8_which=a.int8)
