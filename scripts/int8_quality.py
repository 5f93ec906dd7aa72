"""Full-size int8-conv quality + latency A/B vs the bf16 serving path.

Runs the SAME MDM512 25-step clip (bench.py shapes, shared random weights,
shared noise) through the bf16 UNet and the quantize_pytree(which="conv")
UNet in one process, and reports pixel PSNR between the two decoded clips
plus both latencies. This is the serving-policy quality number at full
size — the bench oracle's 65 dB is a LOWER bound from a fully-quantized
tiny model (min_size=0); here the real threshold/policy applies.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/int8_quality.py

--outliers: real checkpoints are NOT N(0, 0.02^2) — they carry sparse
within-channel weight outliers that inflate a channel's absmax scale and
cost the remaining weights mantissa bits (the known weak spot of absmax
per-channel quant). This mode plants 30x spikes on ~1/1000 conv weights
(and 3x heavier activations downstream follow naturally), giving a
pessimistic-realistic bound without real ckpts in the image.
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

from mudg_tpu import quant
from mudg_tpu.core import diffusion as D
from mudg_tpu.diffusion import ddim
from mudg_tpu.models import mdm as M
from mudg_tpu.nn import unet3d as U
from mudg_tpu.nn import vae as V


def log(m):
    print(f"# {m}", file=sys.stderr, flush=True)


def main():
    steps = 25
    b, t, hh, ww = 1, 16, 40, 64
    n_var = 2
    guidance_scale, guidance_rescale = 7.5, 0.7
    ucfg = U.UNetConfig()
    vcfg = V.VAEConfig()
    dtype = jnp.bfloat16

    rng = jax.random.PRNGKey(0)
    log("materializing params")
    unet_shapes = jax.eval_shape(lambda k: U.init_unet(k, ucfg), rng)
    # random-VALUED weights (not a constant fill): a constant-filled conv is
    # pathologically quantization-friendly, which would overstate PSNR
    leaves, treedef = jax.tree.flatten(unet_shapes)

    outliers = "--outliers" in sys.argv
    clip_pct = None
    which = "conv"
    for a in sys.argv[1:]:
        if a.startswith("--clip_pct="):
            clip_pct = float(a.split("=", 1)[1])
        if a.startswith("--which="):
            which = a.split("=", 1)[1]

    def mk():
        out = []
        for i, l in enumerate(leaves):
            k = jax.random.fold_in(rng, i)
            w = jax.random.normal(k, l.shape, dtype) * 0.02
            if outliers and w.ndim > 2:  # conv kernels = the quantized set
                spike = jax.random.bernoulli(
                    jax.random.fold_in(k, 1), 1e-3, l.shape)
                w = jnp.where(spike, w * 30.0, w)
            out.append(w)
        return treedef.unflatten(out)

    unet = jax.jit(mk)()
    vae_shapes = jax.eval_shape(lambda k: V.init_vae(k, vcfg), rng)
    vae = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, jnp.float32),
                       vae_shapes)
    unet_q = quant.quantize_pytree(unet, which=which, clip_pct=clip_pct)
    log("params ready")

    sched = M.MDMConfig().schedule()
    consts = ddim.make_ddim_constants(
        sched, steps, timestep_spacing="uniform_trailing", eta=1.0)
    context = jax.random.normal(
        rng, (n_var * b, 77 + t * ucfg.image_tokens_per_frame,
              ucfg.context_dim), dtype) * 0.02
    c_concat = jax.random.normal(rng, (n_var * b, t, hh, ww, 8), dtype) * 0.1
    labels = jnp.zeros((n_var * b,), jnp.int32)
    fs = jnp.full((n_var * b,), 10, jnp.int32)

    @jax.jit
    def clip_fn(unet, vae, c_concat, context, key):
        def model_fn(x, tstep):
            xb = jnp.tile(x, (n_var, 1, 1, 1, 1))
            xin = jnp.concatenate([xb, c_concat], axis=-1)
            tb = jnp.tile(tstep, (n_var,))
            v = U.unet_apply(unet, ucfg, xin, tb, context,
                             c_label=labels, fs=fs)
            e_uc, e_c = jnp.split(v, 2, axis=0)
            out = D.cfg_combine(e_uc, e_c, guidance_scale)
            return D.rescale_noise_cfg(out, e_c, guidance_rescale)

        z = ddim.ddim_sample(model_fn, key, (b, t, hh, ww, 4), consts,
                             dtype=dtype)
        x = V.decode_video(vae, vcfg, z.astype(dtype), chunk=16)
        return jnp.clip(x, -1, 1)

    def run(u, tag):
        t0 = time.perf_counter()
        out = clip_fn(u, vae, c_concat, context, jax.random.PRNGKey(1))
        _ = float(jnp.mean(out.astype(jnp.float32)))
        log(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        out = clip_fn(u, vae, c_concat, context, jax.random.PRNGKey(2))
        s = float(jnp.mean(out.astype(jnp.float32)))  # readback sync
        dt = time.perf_counter() - t0
        log(f"{tag}: {dt:.3f} s/clip (mean {s:.5f})")
        return np.asarray(out, np.float32), dt

    ref, t_bf16 = run(unet, "bf16")
    got, t_i8 = run(unet_q, "int8-conv")
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10.0 * np.log10(4.0 / max(mse, 1e-12))  # pixel range [-1, 1]
    tag = f"int8-{which}" + ("" if clip_pct is None else f"(clip{clip_pct})")
    print(f"pixel PSNR {tag} vs bf16: {psnr:.2f} dB "
          f"(bf16 {t_bf16:.3f} s, {tag} {t_i8:.3f} s, "
          f"outliers={outliers})")


if __name__ == "__main__":
    main()
