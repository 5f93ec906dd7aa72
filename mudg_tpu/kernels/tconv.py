"""Fused GroupNorm+SiLU+temporal-conv(3,1,1) stage (Pallas TPU).

Each TemporalConvBlock stage (`lvdm/modules/networks/openaimodel3d.py:239-279`,
rebuilt in nn/unet3d.temporal_conv_block) is GN -> SiLU -> Conv3d((3,1,1)).
The XLA composition (nn/functional.temporal_conv311 shifted matmuls) reads
and writes the full activation four times per stage (GN read, normalized
write, three tap reads, output write); at MDM1024 ds1 the whole family runs
at ~31% MFU (scripts/fambench.py --preset=mdm1024).

This kernel makes one HBM read + one write per stage:
  * GN statistics are folded OUTSIDE into per-(B, C) f32 scale/shift vectors
    (a reduction XLA fuses with the producer; exact same stats as
    functional.group_norm's layout-preserving form),
  * per (batch, 64-pixel-column) grid cell the kernel normalizes + SiLUs the
    (T, 64, C) block in f32, assembles the 3-tap neighborhood as a
    (T*64, 3C) lane-concat in VMEM scratch (row shift by 64 == shift by one
    t step because rows are t-major), and hits the MXU with ONE
    (T*64, 3C) x (3C, C) matmul — full 128-lane contraction instead of three
    C-wide taps.

Measured (scripts/tconv_fused_probe.py, v5e, bf16, cat/hwc=64 variant):
  MDM1024 ds1 (2,16,72,128,320): 3.06 vs 7.62 ms XLA  (2.5x)
  MDM512  ds1 (2,16,40,64,320):  0.66 vs 0.76 ms XLA
  C=640 (1024 ds2): 1.39 vs 1.16 ms — a LOSS; eligibility stops at c < 640.
Max |diff| vs the XLA path is one bf16 ulp (3.1e-2 at activation scale ~5):
the kernel applies the folded affine in f32 where XLA rounds the normalized
activation to bf16 first.

Forward-only: the custom_vjp replays the XLA math, so dispatch (unet3d)
enables it for inference impls only — training keeps the shifted-matmul
path whose backward is plain XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HWC = 64  # pixel columns per grid cell; 128 overflows scoped VMEM at C=320


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def gn_fold(p, x, num_groups: int = 32, eps: float = 1e-5):
    """Fold GroupNorm stats + gamma/beta into per-(B, C) f32 scale/shift so
    y = x * scale + shift. TWO-PASS (centered) variance exactly like
    functional.group_norm — the one-pass E[x^2]-E[x]^2 form goes NEGATIVE
    under f32 cancellation at large activation means (observed as NaNs in
    the MDM1024 smoke with constant weights) and is not parity-identical."""
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    g = num_groups
    cnt = t * h * w * (c // g)

    def group_mean(per_channel):  # (B, C) -> (B, C) broadcast group means
        gsum = per_channel.reshape(b, g, c // g).sum(axis=-1, keepdims=True)
        return jnp.broadcast_to(gsum / cnt, (b, g, c // g)).reshape(b, c)

    mean = group_mean(jnp.sum(xf, axis=(1, 2, 3)))
    centered = xf - mean[:, None, None, None, :]
    var = group_mean(jnp.sum(centered * centered, axis=(1, 2, 3)))
    rstd = jax.lax.rsqrt(var + eps)
    scale = rstd * p["weight"].astype(jnp.float32)
    shift = p["bias"].astype(jnp.float32) - mean * scale
    return scale, shift


def _kernel(x_ref, sc_ref, sh_ref, wcat_ref, bias_ref, o_ref, cat_ref,
            *, t, hwc):
    c = x_ref.shape[-1]
    rows = t * hwc
    xf = x_ref[0].reshape(rows, c).astype(jnp.float32) * sc_ref[0] + sh_ref[0]
    xn = (xf * jax.nn.sigmoid(xf)).astype(jnp.bfloat16)
    # 3-tap neighborhood as lane-concat: [x_{t-1} | x_t | x_{t+1}]; a row
    # shift by hwc is a shift by one t step (rows are t-major)
    cat_ref[:, c:2 * c] = xn
    cat_ref[:hwc, 0:c] = jnp.zeros((hwc, c), jnp.bfloat16)
    cat_ref[hwc:, 0:c] = xn[:rows - hwc]
    cat_ref[rows - hwc:, 2 * c:] = jnp.zeros((hwc, c), jnp.bfloat16)
    cat_ref[:rows - hwc, 2 * c:] = xn[hwc:]
    y = jax.lax.dot(cat_ref[...], wcat_ref[...],
                    preferred_element_type=jnp.float32)
    o_ref[0] = (y + bias_ref[...]).astype(o_ref.dtype).reshape(t, hwc, c)


def eligible(x, p_conv) -> bool:
    """x: (B, T, H, W, C) bf16 video block; p_conv a square-channel (3,1,1)
    conv. The c < 640 bound is measured (C=640 loses to XLA)."""
    if x.ndim != 5 or x.dtype != jnp.bfloat16:
        return False
    b, t, h, w, c = x.shape
    wt = p_conv.get("weight")
    return (
        jax.default_backend() == "tpu"
        and wt is not None
        and wt.shape == (3, 1, 1, c, c)
        and c < 640          # measured: C=640 loses to the XLA shifted matmuls
        and c % 32 == 0      # GN groups
        and (h * w) % HWC == 0
        and t >= 2
    )


def _fused_impl(x, p_gn, p_conv):
    b, t, h, w_, c = x.shape
    hw = h * w_
    scale, shift = gn_fold(p_gn, x)
    # (B, C) vectors ride as (B, 1, C): block last-two dims (1, C) equal the
    # array dims (Mosaic: mult-of-8/128 or exact)
    scale = scale.reshape(b, 1, c)
    shift = shift.reshape(b, 1, c)
    wt = p_conv["weight"].astype(jnp.bfloat16)
    wcat = jnp.concatenate([wt[0, 0, 0], wt[1, 0, 0], wt[2, 0, 0]], axis=0)
    bias = p_conv.get("bias")
    bias = (jnp.zeros((c,), jnp.float32) if bias is None
            else bias.astype(jnp.float32)).reshape(1, c)
    xr = x.reshape(b, t, hw, c)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, t, HWC, c), lambda i, j: (i, 0, j, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, t=t, hwc=HWC),
        grid=(b, hw // HWC),
        in_specs=[blk, vec, vec, const, const],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, t, hw, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((t * HWC, 3 * c), jnp.bfloat16)],
        interpret=_interpret(),
    )(xr, scale, shift, wcat, bias)
    return out.reshape(b, t, h, w_, c)


def _xla_math(x, p_gn, p_conv):
    from ..nn import functional as F

    return F.conv3d(p_conv, F.silu(F.group_norm(p_gn, x)))


@jax.custom_vjp
def fused_gn_silu_tconv(x, p_gn, p_conv):
    """GN -> SiLU -> temporal conv(3,1,1), one read + one write.
    x: (B, T, H, W, C). Requires eligible(x, p_conv)."""
    return _fused_impl(x, p_gn, p_conv)


def _vjp_fwd(x, p_gn, p_conv):
    return _fused_impl(x, p_gn, p_conv), (x, p_gn, p_conv)


def _vjp_bwd(res, g):
    x, p_gn, p_conv = res
    _, vjp = jax.vjp(_xla_math, x, p_gn, p_conv)
    return vjp(g)


fused_gn_silu_tconv.defvjp(_vjp_fwd, _vjp_bwd)
