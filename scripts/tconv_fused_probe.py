"""Fused GN+SiLU+temporal-conv(3,1,1) stage kernel — MDM1024 revisit.

Round-2 verdict at MDM512 rows (81920): WASH (the HBM reread it saves is
~0.13 ms/stage). At MDM1024 ds1 the same stage moves 3.6x the bytes
(294912 rows x 320 ch) and the XLA chain measures ~31% MFU family-wide
(scripts/fambench.py --preset=mdm1024: temporal_conv family 212 ms of
1148). Hypothesis: one read + one write + VMEM-resident taps pays here.

Two kernel variants:
  A "3dot": y = xn@w1; y[hwc:] += xn[:-hwc]@w0; y[:-hwc] += xn[hwc:]@w2
  B "cat":  xcat = [shift-1(xn), xn, shift+1(xn)] lanes -> one (3C,C) dot

GN stats are precomputed outside (per-(B,C) scale/shift vectors) — XLA fuses
that reduction with the producer; the kernel fuses normalize+SiLU+taps+bias.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mudg_tpu.nn import functional as F
from mudg_tpu.nn import unet3d as U


def gn_scale_shift(p, x, num_groups=32, eps=1e-5):
    """Per-(B, C) affine folding GN stats + gamma/beta: y = x*scale + shift."""
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2, 3))                      # (B, C)
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2, 3))
    n = t * h * w
    gs = s.reshape(b, num_groups, -1).sum(-1, keepdims=True)
    gs2 = s2.reshape(b, num_groups, -1).sum(-1, keepdims=True)
    cnt = n * (c // num_groups)
    mean = (gs / cnt)
    var = gs2 / cnt - mean ** 2
    rstd = jax.lax.rsqrt(var + eps)
    mean = jnp.broadcast_to(mean, (b, num_groups, c // num_groups)).reshape(b, c)
    rstd = jnp.broadcast_to(rstd, (b, num_groups, c // num_groups)).reshape(b, c)
    gamma = p["weight"].astype(jnp.float32)
    beta = p["bias"].astype(jnp.float32)
    scale = rstd * gamma
    shift = beta - mean * scale
    return scale, shift


def _silu_norm(xb, sc, sh):
    xf = xb.astype(jnp.float32) * sc[0] + sh[0]
    return (xf * jax.nn.sigmoid(xf)).astype(jnp.bfloat16)


def _kernel_3dot(x_ref, sc_ref, sh_ref, w0, w1, w2, bias, o_ref, *, t, hwc):
    c = x_ref.shape[-1]
    xn = _silu_norm(x_ref[0].reshape(t * hwc, c), sc_ref[...], sh_ref[...])
    y = jax.lax.dot(xn, w1[...], preferred_element_type=jnp.float32)
    y0 = jax.lax.dot(xn[:(t - 1) * hwc], w0[...],
                     preferred_element_type=jnp.float32)
    y2 = jax.lax.dot(xn[hwc:], w2[...], preferred_element_type=jnp.float32)
    y = y.at[hwc:].add(y0)
    y = y.at[:(t - 1) * hwc].add(y2)
    o_ref[0] = (y + bias[...]).astype(o_ref.dtype).reshape(t, hwc, c)


def _kernel_cat(x_ref, sc_ref, sh_ref, wcat, bias, o_ref, cat, *, t, hwc):
    c = x_ref.shape[-1]
    rows = t * hwc
    xn = _silu_norm(x_ref[0].reshape(rows, c), sc_ref[...], sh_ref[...])
    cat[:, c:2 * c] = xn
    cat[:hwc, 0:c] = jnp.zeros((hwc, c), jnp.bfloat16)
    cat[hwc:, 0:c] = xn[:rows - hwc]
    cat[rows - hwc:, 2 * c:] = jnp.zeros((hwc, c), jnp.bfloat16)
    cat[:rows - hwc, 2 * c:] = xn[hwc:]
    y = jax.lax.dot(cat[...], wcat[...], preferred_element_type=jnp.float32)
    o_ref[0] = (y + bias[...]).astype(o_ref.dtype).reshape(t, hwc, c)


def fused_stage(x, p_gn, p_conv, variant="3dot", hwc=128):
    b, t, h, w_, c = x.shape
    hw = h * w_
    assert hw % hwc == 0
    scale, shift = gn_scale_shift(p_gn, x)
    wt = p_conv["weight"].astype(jnp.bfloat16)  # (3,1,1,C,C)
    w0, w1, w2 = wt[0, 0, 0], wt[1, 0, 0], wt[2, 0, 0]
    bias = p_conv["bias"].astype(jnp.float32).reshape(1, c)
    xr = x.reshape(b, t, hw, c)
    # (B, C) vectors ride as (B, 1, C) so the block's last-two dims (1, C)
    # equal the array dims (Mosaic constraint: mult-of-8/128 or exact).
    scale = scale.reshape(b, 1, c)
    shift = shift.reshape(b, 1, c)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, t, hwc, c), lambda i, j: (i, 0, j, 0),
                       memory_space=pltpu.VMEM)
    if variant == "3dot":
        out = pl.pallas_call(
            functools.partial(_kernel_3dot, t=t, hwc=hwc),
            grid=(b, hw // hwc),
            in_specs=[blk, vec, vec, const, const, const, const],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((b, t, hw, c), x.dtype),
            interpret=jax.default_backend() != "tpu",
        )(xr, scale, shift, w0, w1, w2, bias)
    else:
        wcat = jnp.concatenate([w0, w1, w2], axis=0)  # (3C, C)
        out = pl.pallas_call(
            functools.partial(_kernel_cat, t=t, hwc=hwc),
            grid=(b, hw // hwc),
            in_specs=[blk, vec, vec, const, const],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((b, t, hw, c), x.dtype),
            scratch_shapes=[pltpu.VMEM((t * hwc, 3 * c), jnp.bfloat16)],
            interpret=jax.default_backend() != "tpu",
        )(xr, scale, shift, wcat, bias)
    return out.reshape(b, t, h, w_, c)


def xla_stage(x, p_gn, p_conv):
    return F.conv3d(p_conv, F.silu(F.group_norm(p_gn, x)))


def timed(fn, x, n_long=24, n_short=4):
    def chain(x, n):
        def body(c, _):
            y = fn(c)
            return (c + 0.01 * y).astype(c.dtype), None
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
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    shapes = [
        ("1024-ds1", (2, 16, 72, 128, 320)),
        ("1024-ds2", (2, 16, 36, 64, 640)),
        ("512-ds1", (2, 16, 40, 64, 320)),
    ]
    for name, shp in shapes:
        c = shp[-1]
        pt = U._init_res(rng, c, c, 1280, True, 0.0)["temopral_conv"]
        pt = jax.tree.map(lambda a: a.astype(bf), pt)
        p_gn, p_conv = pt["conv1"]["0"], pt["conv1"]["2"]
        # randomize the conv (init may be skewed) and gn
        p_conv = {"weight": 0.05 * jax.random.normal(rng, p_conv["weight"].shape, bf),
                  "bias": 0.01 * jax.random.normal(rng, p_conv["bias"].shape, bf)}
        x = jax.random.normal(rng, shp, bf)

        ref = jax.jit(lambda x: xla_stage(x, p_gn, p_conv))(x)
        t_ref = timed(lambda v: xla_stage(v, p_gn, p_conv), x)
        print(f"{name}: xla {t_ref*1e3:7.3f} ms", flush=True)
        for variant in ("3dot", "cat"):
            for hwc in ((64,) if c >= 640 else (128, 64)):
                try:
                    out = jax.jit(lambda x: fused_stage(
                        x, p_gn, p_conv, variant, hwc))(x)
                    err = float(jnp.max(jnp.abs(
                        out.astype(jnp.float32) - ref.astype(jnp.float32))))
                    sc = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
                    t = timed(lambda v: fused_stage(v, p_gn, p_conv, variant,
                                                    hwc), x)
                    print(f"{name}: {variant} hwc={hwc} {t*1e3:7.3f} ms "
                          f"err={err:.2e} (scale {sc:.2f})", flush=True)
                except Exception as e:
                    print(f"{name}: {variant} hwc={hwc} FAIL "
                          f"{type(e).__name__} {str(e).splitlines()[0][:90]}",
                          flush=True)


if __name__ == "__main__":
    main()
