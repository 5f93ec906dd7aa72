"""Full-scale DPM-Solver++(2M) quality A/B vs DDIM (VERDICT r4 item 5).

One process, MDM512 bench shapes, random-VALUED weights, SHARED initial
noise: sample the same clip with DDIM-100 (the converged target), then
DDIM-50 / DDIM-25 / DPM-20 / DPM-15, and score each against the target in
pixel PSNR/SSIM. The round-4 claim ("~50-step-DDIM quality in ~20 calls")
was certified only on a mixture-model oracle (tests/test_dpm.py); this is
the full-size certification. eta=0 for DDIM here so every sampler is
deterministic given the shared x_T (ancestral noise would decorrelate the
comparison; the reference's render recipe uses eta=1, but quality-vs-target
ranking is what's being measured).

Usage: PYTHONPATH=... python scripts/dpm_ab.py [--preset=mdm1024] [--time_only]
  --preset=mdm1024: measure the 20-step clip wall time at stage-2 geometry
    (the round-4 "~19.6 s/clip" was computed, not measured).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.utils.cache import enable_compile_cache

enable_compile_cache(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_tpu_cache"))

from mudg_tpu.core import diffusion as D
from mudg_tpu.diffusion import ddim, dpm
from mudg_tpu.models import mdm as M
from mudg_tpu.nn import unet3d as U
from mudg_tpu.nn import vae as V
from mudg_tpu.utils import metrics as MT


def log(m):
    print(f"# {m}", file=sys.stderr, flush=True)


def main():
    preset = "mdm512"
    for a in sys.argv[1:]:
        if a.startswith("--preset="):
            preset = a.split("=", 1)[1]
    time_only = "--time_only" in sys.argv or preset == "mdm1024"
    if preset == "mdm1024":
        cfg = M.stage2_config()
        ucfg, vcfg = cfg.unet, cfg.vae
        b, t, hh, ww = 1, 16, 72, 128
    else:
        ucfg, vcfg = U.UNetConfig(), V.VAEConfig()
        b, t, hh, ww = 1, 16, 40, 64
    n_var = 2
    guidance_scale, guidance_rescale = 7.5, 0.7
    dtype = jnp.bfloat16

    rng = jax.random.PRNGKey(0)
    log(f"materializing params ({preset})")
    unet_shapes = jax.eval_shape(lambda k: U.init_unet(k, ucfg), rng)
    leaves, treedef = jax.tree.flatten(unet_shapes)

    def mk():
        return treedef.unflatten([
            jax.random.normal(jax.random.fold_in(rng, i), l.shape, dtype)
            * 0.02 for i, l in enumerate(leaves)])

    unet = jax.jit(mk)()
    vae_shapes = jax.eval_shape(lambda k: V.init_vae(k, vcfg), rng)
    vleaves, vdef = jax.tree.flatten(vae_shapes)
    # random-VALUED decoder: a constant-fill VAE maps every latent to a
    # near-constant image, compressing sampler differences to ~nothing
    # (first run of this A/B measured 64.3-64.5 dB for EVERY sampler and
    # numerically-broken SSIM on the near-constant outputs)
    vae = jax.jit(lambda: vdef.unflatten([
        jax.random.normal(jax.random.fold_in(rng, 10_000 + i), l.shape,
                          jnp.float32) * 0.05
        for i, l in enumerate(vleaves)]))()
    log("params ready")

    sched = M.MDMConfig().schedule() if preset != "mdm1024" else cfg.schedule()
    context = jax.random.normal(
        rng, (n_var * b, 77 + t * ucfg.image_tokens_per_frame,
              ucfg.context_dim), dtype) * 0.02
    c_concat = jax.random.normal(rng, (n_var * b, t, hh, ww, 8), dtype) * 0.1
    labels = jnp.zeros((n_var * b,), jnp.int32)
    fs = jnp.full((n_var * b,), 10, jnp.int32)
    x_T = jax.random.normal(jax.random.PRNGKey(42), (b, t, hh, ww, 4), dtype)

    def model_fn(unet, x, tstep):
        xb = jnp.tile(x, (n_var, 1, 1, 1, 1))
        xin = jnp.concatenate([xb, c_concat], axis=-1)
        tb = jnp.tile(tstep, (n_var,))
        v = U.unet_apply(unet, ucfg, xin, tb, context, c_label=labels, fs=fs)
        e_uc, e_c = jnp.split(v, 2, axis=0)
        out = D.cfg_combine(e_uc, e_c, guidance_scale)
        return D.rescale_noise_cfg(out, e_c, guidance_rescale)

    import functools

    @functools.partial(jax.jit, static_argnames=("sampler", "steps"))
    def clip_fn(unet, vae, sampler, steps):
        fn = lambda x, tt: model_fn(unet, x, tt)
        if sampler == "dpmpp":
            consts = dpm.make_dpmpp_constants(
                sched, steps, timestep_spacing="uniform_trailing")
            z = dpm.dpmpp_sample(fn, jax.random.PRNGKey(1),
                                 (b, t, hh, ww, 4), consts, dtype=dtype,
                                 x_T=x_T)
        else:
            consts = ddim.make_ddim_constants(
                sched, steps, timestep_spacing="uniform_trailing", eta=0.0)
            z = ddim.ddim_sample(fn, jax.random.PRNGKey(1),
                                 (b, t, hh, ww, 4), consts, dtype=dtype,
                                 x_T=x_T)
        x = V.decode_video(vae, vcfg, z.astype(dtype), chunk=16)
        return jnp.clip(x, -1, 1), z.astype(jnp.float32)

    def run(sampler, steps):
        t0 = time.perf_counter()
        out, z = clip_fn(unet, vae, sampler, steps)
        _ = float(jnp.mean(out.astype(jnp.float32)))
        log(f"{sampler}-{steps}: compile+first {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        out, z = clip_fn(unet, vae, sampler, steps)
        _ = float(jnp.mean(out.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        log(f"{sampler}-{steps}: {dt:.3f} s/clip")
        return (np.asarray(out, np.float32), np.asarray(z, np.float32)), dt

    if time_only:
        _, dt20 = run("dpmpp", 20)
        print(f"{preset} DPM-20 measured: {dt20:.2f} s/clip")
        return

    (target, ztarget), _ = run("ddim", 100)
    zscale = float(np.abs(ztarget).max()) + 1e-9
    rows = []
    for sampler, steps in (("ddim", 50), ("ddim", 25),
                           ("dpmpp", 20), ("dpmpp", 15)):
        (out, z), dt = run(sampler, steps)
        p = MT.psnr(out, target)
        pz = MT.psnr(z, ztarget, data_range=2 * zscale)
        s = float(np.mean([MT.ssim((out[0, i] + 1) / 2,
                                   (target[0, i] + 1) / 2)
                           for i in range(t)]))
        rows.append((f"{sampler}-{steps}", p, pz, s, dt))
        print(f"{sampler}-{steps}: PSNR-vs-DDIM100 {p:.2f} dB pixel / "
              f"{pz:.2f} latent, SSIM {s:.4f}, {dt:.2f} s/clip", flush=True)
    print("\n| sampler | pixel PSNR | latent PSNR | SSIM | s/clip |")
    for name, p, pz, s, dt in rows:
        print(f"| {name} | {p:.2f} | {pz:.2f} | {s:.4f} | {dt:.2f} |")


if __name__ == "__main__":
    main()
