"""Fused Pallas normalization kernels (GroupNorm / LayerNorm).

Motivation (measured on v5e, docs/STATE.md): the fp32-island norms cost ~30%
of UNet runtime when expressed as XLA elementwise chains, because the
cast-up/normalize/cast-down materializes fp32 copies in HBM. These kernels
read the bf16 tensor once, compute statistics in fp32 *registers/VMEM*, and
write bf16 once — identical numerics to the fp32-island formulation
(lvdm/basics.py:76-78) at bf16-pass memory cost.

Forward-only Pallas; the backward falls back to autodiff of the pure-JAX
reference implementation via custom_vjp (training pays the old cost on the
backward pass only; inference gets the full win).

STATUS (kept deliberately, round-2 decision): measured ~3% SLOWER end-to-end
than XLA's own fusion on v5e (docs/STATE.md), so these stay opt-in behind
MUDG_FUSED_NORMS=1. They remain in-tree as working infrastructure for future
hardware generations and as the documented negative result that stops the
experiment from being redone. Note the round-2 group_norm layout fix
(nn/functional.py) removed the relayout copies that motivated this kernel.

Used automatically by nn/functional when shapes fit the VMEM budget; exact
fallback otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-program VMEM working set cap (input + output + fp32 temps head-room)
VMEM_SAMPLE_BYTES = 6 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# GroupNorm over channels-last (N, *spatial, C)
# ---------------------------------------------------------------------------

def _gn_kernel(x_ref, w_ref, b_ref, o_ref, *, groups, eps):
    # Mosaic cannot reshape the lane (channel) dim, so group statistics are
    # computed with a (C, G) one-hot indicator matmul instead of reshaping
    # channels into (G, C/G).
    x = x_ref[...]
    shape = x.shape            # (1, *spatial, C)
    c = shape[-1]
    cg = c // groups
    n_spatial = 1
    for s in shape[1:-1]:
        n_spatial *= s
    xf = x.reshape(n_spatial, c).astype(jnp.float32)

    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = (ch_ids // cg == g_ids).astype(jnp.float32)  # (C, G)

    s1 = jnp.sum(xf, axis=0, keepdims=True)          # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)     # (1, C)
    denom = float(n_spatial * cg)
    gsum = jnp.dot(s1, onehot, preferred_element_type=jnp.float32)   # (1, G)
    gsq = jnp.dot(s2, onehot, preferred_element_type=jnp.float32)    # (1, G)
    mean_g = gsum / denom
    var_g = gsq / denom - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)

    # broadcast group stats back to channels: (1, G) @ (G, C)
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, onehot.T, preferred_element_type=jnp.float32)

    w = w_ref[...].astype(jnp.float32).reshape(1, c)
    b = b_ref[...].astype(jnp.float32).reshape(1, c)
    out = (xf - mean_c) * inv_c * w + b
    o_ref[...] = out.reshape(shape).astype(o_ref.dtype)


def _gn_forward(x, w, b, groups: int, eps: float):
    n = x.shape[0]
    sample = x[0]
    block = (1,) + sample.shape
    grid = (n,)
    idx = lambda i: (i,) + (0,) * sample.ndim
    return pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x, w, b)


def _gn_reference(x, w, b, groups, eps):
    """fp32-island reference (identical math, XLA-expressed) for backward."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    c = xf.shape[-1]
    spatial = xf.shape[1:-1]
    xg = xf.reshape(xf.shape[0], *spatial, groups, c // groups)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xf = xg.reshape(xf.shape)
    return (xf * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(orig)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm(x, w, b, groups: int = 32, eps: float = 1e-5):
    return _gn_forward(x, w, b, groups, eps)


def _gn_fwd(x, w, b, groups, eps):
    return _gn_forward(x, w, b, groups, eps), (x, w, b)


def _gn_bwd(groups, eps, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: _gn_reference(x, w, b, groups, eps), x, w, b)
    return vjp(g)


fused_group_norm.defvjp(_gn_fwd, _gn_bwd)


def group_norm_fits(x) -> bool:
    """One full sample (+fp32 temps) fits the per-program VMEM budget. The
    block covers the whole sample, so dims always satisfy the tiling rules."""
    if x.ndim < 3:
        return False
    sample_bytes = x[0].size * x.dtype.itemsize
    fp32_bytes = x[0].size * 4
    return sample_bytes * 2 + fp32_bytes <= VMEM_SAMPLE_BYTES * 2


# ---------------------------------------------------------------------------
# LayerNorm over the last axis of (B, L, C)
# ---------------------------------------------------------------------------

def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)   # (1, rows, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    w = w_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    o_ref[...] = (xn * w + b).astype(o_ref.dtype)


def _pick_rows(l: int, c: int, itemsize: int) -> int:
    budget_rows = max(VMEM_SAMPLE_BYTES // max(c * (itemsize + 4), 1), 8)
    r = 1
    for cand in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if l % cand == 0 and cand <= budget_rows:
            r = cand
            break
    return r


def _ln_forward(x, w, b, eps: float):
    bsz, l, c = x.shape
    rows = _pick_rows(l, c, x.dtype.itemsize)
    grid = (bsz, l // rows)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x, w, b)


def _ln_reference(x, w, b, eps):
    orig = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(orig)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, w, b, eps: float = 1e-5):
    return _ln_forward(x, w, b, eps)


def _ln_fwd(x, w, b, eps):
    return _ln_forward(x, w, b, eps), (x, w, b)


def _ln_bwd(eps, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: _ln_reference(x, w, b, eps), x, w, b)
    return vjp(g)


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)


def layer_norm_fits(x) -> bool:
    if x.ndim != 3:
        return False
    return _pick_rows(x.shape[1], x.shape[-1], x.dtype.itemsize) >= 8
