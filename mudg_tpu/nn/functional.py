"""Functional NN primitives over explicit parameter pytrees.

Design: every "module" is a plain nested dict of arrays whose structure mirrors
the reference torch state_dict (so checkpoint import is a per-leaf layout
transform, see train/checkpoint.py), and every forward is a pure function.

Leaf layouts (TPU-preferred, converted at import time from torch layouts):
    Linear   {'weight': (in, out),             'bias': (out,)?}   torch: (out, in)
    Conv1d   {'weight': (k, in, out),          'bias': (out,)?}   torch: (out, in, k)
    Conv2d   {'weight': (kh, kw, in, out),     'bias': (out,)?}   torch: (out, in, kh, kw)
    Conv3d   {'weight': (kt, kh, kw, in, out), 'bias': (out,)?}   torch: (out, in, kt, kh, kw)
    Norm     {'weight': (C,), 'bias': (C,)}

Leaf names intentionally reuse the torch names ('weight'/'bias') and dicts
mirror torch module paths (Sequential indices become string keys), so a torch
checkpoint key maps to a pytree path with zero name-mapping tables.

Activations are channels-last: (N, H, W, C) spatial, (N, T, H, W, C) video.

Dtype policy: forwards run in the dtype of their input; weights are cast to
that dtype at application. Normalization layers are fp32 islands (they cast up,
normalize, cast back), matching GroupNormSpecific (lvdm/basics.py:76-78) and
the fp32 softmax spots that checkpoint parity depends on.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
from jax.ad_checkpoint import checkpoint_name
import jax.numpy as jnp
import numpy as np


def _quant():
    # deferred import: quant.py is only needed when a pytree holds
    # 'weight_i8' leaves (see quant.quantize_pytree)
    from .. import quant as _q

    return _q


def _weight(p, dtype):
    """Effective weight in `dtype`; transparently dequantizes weight-only
    int8 leaves (quant.py mode='w8')."""
    if "weight_q8" in p:
        return _quant().dequantize_weight(p, dtype)
    return p["weight"].astype(dtype)


def linear(p, x, tag: str | None = "mm_out"):
    """tag: checkpoint_name on the output (identity outside jax.checkpoint).
    Under the selective-remat policies in unet3d.unet_apply the backward
    replay keeps tagged outputs instead of re-running the matmul; callers
    with huge outputs (the GEGLU 8C inner) pass a non-default tag so the
    policy can exclude them."""
    if "weight_i8" in p:
        y = _quant().linear_i8(p, x)
        return checkpoint_name(y, tag) if tag else y
    w = _weight(p, x.dtype)
    y = x @ w
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return checkpoint_name(y, tag) if tag else y


def conv2d(p, x, stride: int | tuple = 1, padding="SAME", groups: int = 1):
    """x: (N, H, W, C) -> (N, H', W', O). groups>1 = grouped/depthwise conv
    (weight layout (kh, kw, C/groups, O), the natural transpose of torch's)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if "weight_i8" in p:
        return _quant().conv_i8(
            p, x, stride=stride, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), groups=groups,
        )
    y = jax.lax.conv_general_dilated(
        x,
        _weight(p, x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return checkpoint_name(y, "conv_out")


def batch_norm(p, x, eps: float = 1e-5):
    """Inference-mode BatchNorm over channels-last input (running stats)."""
    inv = jax.lax.rsqrt(p["running_var"].astype(jnp.float32) + eps)
    w = p["weight"].astype(jnp.float32) * inv
    b = p["bias"].astype(jnp.float32) - p["running_mean"].astype(jnp.float32) * w
    return (x.astype(jnp.float32) * w + b).astype(x.dtype)


def conv1d(p, x, stride: int = 1, padding="SAME"):
    """x: (N, L, C) -> (N, L', O)."""
    if "weight_i8" in p:
        return _quant().conv_i8(
            p, x, stride=(stride,), padding=padding,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
    y = jax.lax.conv_general_dilated(
        x,
        _weight(p, x.dtype),
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def temporal_conv311(p, x):
    """(3,1,1) temporal conv as three shifted matmuls.

    Equivalent to conv3d with a (3,1,1) kernel and SAME padding, but avoids
    XLA's 3-D convolution layout entirely: the conv output layout forces
    full-tensor relayout copies around the neighboring GroupNorms (measured:
    a GN+SiLU+conv3d x4 chain runs 8.8 ms at ds1 vs 2.9 ms in this form,
    scripts/tconvbench.py). x: (N, T, H, W, C); weight (3, 1, 1, C_in, C_out).
    """
    w = _weight(p, x.dtype)
    assert w.shape[:3] == (3, 1, 1), w.shape
    w0, w1, w2 = w[0, 0, 0], w[1, 0, 0], w[2, 0, 0]
    y = x @ w1
    pad_t = ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
    y = y + jnp.pad(x[:, :-1] @ w0, pad_t)
    y = y + jnp.pad(x[:, 1:] @ w2, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return checkpoint_name(y, "tconv_out")


def conv3d(p, x, stride=1, padding="SAME"):
    """x: (N, T, H, W, C) -> (N, T', H', W', O)."""
    wshape = next(p[k] for k in ("weight_i8", "weight_q8", "weight") if k in p).shape
    if wshape[:3] == (3, 1, 1) and stride in (1, (1, 1, 1)) and padding == "SAME":
        if "weight_i8" in p:
            return _quant().temporal_conv311_i8(p, x)
        return temporal_conv311(p, x)
    if isinstance(stride, int):
        stride = (stride, stride, stride)
    if "weight_i8" in p:
        return _quant().conv_i8(
            p, x, stride=stride, padding=padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    y = jax.lax.conv_general_dilated(
        x,
        _weight(p, x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def _use_fused_norms() -> bool:
    # Measured (docs/STATE.md): XLA already fuses the fp32-island norms well —
    # the Pallas kernels came out ~3% slower end-to-end on v5e. Kept as
    # opt-in infrastructure (MUDG_FUSED_NORMS=1) for future tuning; CPU uses
    # the interpreter and is always slower.
    import os as _os

    import jax as _jax

    return (
        _os.environ.get("MUDG_FUSED_NORMS") == "1"
        and _jax.default_backend() == "tpu"
    )


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over channels-last input; fp32 island (lvdm/basics.py:76-78).

    Normalizes over all non-batch dims within each channel group, like torch.
    On TPU, shapes that fit VMEM use the fused Pallas kernel (identical math,
    one bf16 read + one bf16 write).
    """
    if _use_fused_norms():
        from ..kernels import norms

        if norms.group_norm_fits(x):
            return checkpoint_name(
                norms.fused_group_norm(x, p["weight"], p["bias"], num_groups,
                                       eps), "gn_out")
    # Layout-preserving formulation: reduce per-CHANNEL over the spatial dims
    # (lane dim stays C), then combine channels into group stats on the tiny
    # (N, C) tensor. The obvious reshape-to-(..., G, C/G) splits the lane
    # dimension, and on TPU that costs two full f32 relayout copies of the
    # activation per call (measured ~2.5 ms per GN-after-conv at ds1 — the
    # dominant hidden cost of the temporal conv blocks; scripts/tconvbench.py).
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = xf.shape[-1]
    g = num_groups
    assert c % g == 0, f"channels {c} not divisible by groups {g}"
    n = xf.shape[0]
    spatial_axes = tuple(range(1, xf.ndim - 1))
    count = c // g
    for d in xf.shape[1:-1]:
        count *= d

    def group_mean(per_channel):  # (N, C) -> (N, C) broadcast group means
        gsum = per_channel.reshape(n, g, c // g).sum(axis=-1, keepdims=True)
        return jnp.broadcast_to(gsum / count, (n, g, c // g)).reshape(n, c)

    mean = group_mean(jnp.sum(xf, axis=spatial_axes))
    bshape = (n,) + (1,) * len(spatial_axes) + (c,)
    centered = xf - mean.reshape(bshape)
    var = group_mean(jnp.sum(centered * centered, axis=spatial_axes))
    xf = centered * jax.lax.rsqrt(var + eps).reshape(bshape)
    xf = xf * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    # tag: the fp32-island stats are the expensive part of a backward
    # replay; the "dots_gn" policy saves this (bf16) output to skip them
    return checkpoint_name(xf.astype(orig_dtype), "gn_out")


def layer_norm(p, x, eps: float = 1e-5):
    """LayerNorm over the last axis; fp32 accumulation. Fused Pallas kernel
    on TPU for 3-D inputs."""
    if _use_fused_norms():
        from ..kernels import norms

        if norms.layer_norm_fits(x):
            return norms.fused_layer_norm(x, p["weight"], p["bias"], eps)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return checkpoint_name(xf.astype(orig_dtype), "ln_out")


def silu(x):
    return jax.nn.silu(x)


def gelu(x):
    # torch.nn.GELU() defaults to the exact erf formulation; jax.nn.gelu
    # defaults to tanh-approximate, so pin approximate=False for parity.
    return jax.nn.gelu(x, approximate=False)


def avg_pool2d(x, window: int = 2, stride: int = 2):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), "VALID",
    ) / float(window * window)


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsampling on (N, H, W, C) (or (..., H, W, C))."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    x = jnp.repeat(x, 2, axis=h_axis)
    x = jnp.repeat(x, 2, axis=w_axis)
    return x


# ---------------------------------------------------------------------------
# Initializers (for from-scratch training; checkpoint import overwrites these)
# ---------------------------------------------------------------------------

def _kaiming_uniform(rng, shape, fan_in, dtype=jnp.float32):
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def init_linear(rng, d_in, d_out, bias=True, zero=False, dtype=jnp.float32):
    if zero:
        p = {"weight": jnp.zeros((d_in, d_out), dtype)}
        if bias:
            p["bias"] = jnp.zeros((d_out,), dtype)
        return p
    kw, kb = jax.random.split(rng)
    p = {"weight": _kaiming_uniform(kw, (d_in, d_out), d_in, dtype)}
    if bias:
        bound = 1.0 / math.sqrt(d_in)
        p["bias"] = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return p


def init_conv(rng, kernel: Sequence[int], c_in, c_out, bias=True, zero=False,
              dtype=jnp.float32):
    shape = (*kernel, c_in, c_out)
    if zero:
        p = {"weight": jnp.zeros(shape, dtype)}
        if bias:
            p["bias"] = jnp.zeros((c_out,), dtype)
        return p
    kw, kb = jax.random.split(rng)
    fan_in = c_in * int(np.prod(kernel))
    p = {"weight": _kaiming_uniform(kw, shape, fan_in, dtype)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(kb, (c_out,), dtype, -bound, bound)
    return p


def init_norm(c, dtype=jnp.float32):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
