"""Fused GEGLU feed-forward Pallas kernel.

The transformer FF (GEGLU: u,g = x@W1 split; y = (u * gelu(g)) @ W2,
lvdm/modules/attention.py:579-606) is the single most expensive op family in
the UNet after attention, and XLA runs it at 38% of peak at ds1 because the
(M, 8C) intermediate makes two HBM round trips (scripts/opbench.py).

This kernel tiles over (row blocks x intermediate chunks) and keeps the
intermediate entirely in VMEM: per grid cell it computes a (BM, S) slice of
both the value and gate halves, applies the exact-erf GELU gate, and
accumulates the (BM, C) output across intermediate chunks in-place. W1 is
read twice per chunk via two BlockSpecs over the same array (value half at
column offset 0, gate half at offset 4C). HBM traffic: x and y once, weights
once per row-block sweep.

Forward kernel + XLA-math custom VJP (training recomputes the cheap
projections; activation memory stays O(M*C)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7, far below
    bf16 resolution): Mosaic TPU has no erf primitive, but exp lowers fine."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _ff_kernel(x_ref, w1v_ref, w1g_ref, b1_ref, w2_ref, b2_ref, o_ref,
               acc_ref, *, n_ic):
    ic = pl.program_id(1)

    @pl.when(ic == 0)
    def _init():
        acc_ref[...] = jnp.broadcast_to(
            b2_ref[...].astype(jnp.float32), acc_ref.shape
        )

    x = x_ref[...]
    u = jax.lax.dot(x, w1v_ref[...], preferred_element_type=jnp.float32)
    g = jax.lax.dot(x, w1g_ref[...], preferred_element_type=jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)  # (2, S): row 0 value, row 1 gate
    u = u + b1[0]
    g = g + b1[1]
    # exact-erf GELU gate: gelu(g) = g * Phi(g)
    h = (u * g * 0.5 * (1.0 + _erf(g * (2.0 ** -0.5)))).astype(x.dtype)
    acc_ref[...] += jax.lax.dot(
        h, w2_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(ic == n_ic - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _ff_ln_kernel(x_ref, lnw_ref, lnb_ref, w1v_ref, w1g_ref, b1_ref, w2_ref,
                  b2_ref, o_ref, acc_ref, xn_ref, *, n_ic):
    """LN -> GEGLU FF -> +residual variant: the pre-norm and the residual
    add ride the same kernel, saving the LN/add HBM round trips. xn is
    computed once per row block (ic == 0) into scratch and reused across
    intermediate chunks."""
    ic = pl.program_id(1)

    @pl.when(ic == 0)
    def _init():
        xf = x_ref[...].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        xn_ref[...] = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
                       * lnw_ref[...] + lnb_ref[...]).astype(xn_ref.dtype)
        acc_ref[...] = jnp.broadcast_to(
            b2_ref[...].astype(jnp.float32), acc_ref.shape
        )

    x = xn_ref[...]
    u = jax.lax.dot(x, w1v_ref[...], preferred_element_type=jnp.float32)
    g = jax.lax.dot(x, w1g_ref[...], preferred_element_type=jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    u = u + b1[0]
    g = g + b1[1]
    h = (u * g * 0.5 * (1.0 + _erf(g * (2.0 ** -0.5)))).astype(x.dtype)
    acc_ref[...] += jax.lax.dot(
        h, w2_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(ic == n_ic - 1)
    def _store():
        o_ref[...] = (acc_ref[...]
                      + x_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_chunk(inner: int) -> int:
    for s in (1024, 768, 640, 512, 384, 256, 128):
        if inner % s == 0:
            return s
    return inner


def _pick_block_sizes(m: int, c: int, inner: int):
    """(intermediate chunk, row block) for the LN+FF+res block kernel, under
    a scoped-vmem model calibrated on v5e: C=512 s=1024 bm=1024 OOMs at
    18.0M real (est 17.9M); C=320 bm=1024 compiles (est 9.6M); C=640
    bm=1024 OOMs at 18.2M. Counted: x + out blocks (double-buffered), the
    two w1 halves + w2 (double-buffered consts), f32 acc, xn scratch, f32
    LN temporaries."""
    s = _pick_chunk(inner)
    if c >= 1024:
        while s > 512 or inner % s:
            s //= 2

    def est(bm_):
        return (bm_ * c * 8 + 2 * 2 * c * s * 2 + 2 * s * c * 2
                + bm_ * c * 4 + bm_ * c * 2 + 2 * bm_ * c * 4)

    bm = next((b for b in (1024, 512, 256, 128)
               if m % b == 0 and est(b) < int(14.5 * 2**20)), 128)
    return s, bm


def geglu_ff_eligible(x, w1) -> bool:
    m = 1
    for d in x.shape[:-1]:
        m *= d
    c = x.shape[-1]
    inner = w1.shape[1] // 2
    # bf16-only: f32 activations double every VMEM buffer and blow the
    # scoped-vmem limit at C=1280 (seen in the training path).
    return (
        x.dtype == jnp.bfloat16
        and c % 8 == 0 and inner % 128 == 0 and m % 256 == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_geglu_ff(x, w1, b1, w2, b2):
    """x: (..., C); w1: (C, 2*inner) [value | gate]; w2: (inner, C)."""
    return _ff_apply(x, w1, b1, w2, b2)


def _ff_apply(x, w1, b1, w2, b2):
    orig_shape = x.shape
    c = x.shape[-1]
    m = x.size // c
    xf = x.reshape(m, c)
    inner = w1.shape[1] // 2

    s = _pick_chunk(inner)
    # bm=1024 at C<1024 measured ~5% faster than 512 at ds1 (3.10 vs 3.29 ms,
    # /tmp sweep 2026-08-16); bm=2048 fails compile. At C=1280, bm>=512 /
    # s>512 overflow the 16M scoped-VMEM limit once Mosaic double-buffers the
    # weight blocks (measured: 18.4M at bm=512, 16.25M at bm=256/s=640);
    # bm=256 + s<=512 stays comfortably under. C=640 must stay at bm<=512:
    # its bm=1024 kernel (s=640) compiles standalone but hits 16.93M scoped
    # vmem when REPLAYED inside the MDM1024 full-remat backward (round-5 q3
    # — Mosaic charges context overhead the standalone compile doesn't).
    bm = 1024
    if c >= 1024:
        bm = 256
        while s > 512 or inner % s:
            s //= 2
    elif c >= 640:
        bm = 512
    n_ic = inner // s
    while m % bm:
        bm //= 2

    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    # b1 as (2, S)-blockable matrix: row 0 = value bias, row 1 = gate bias
    b1m = jnp.stack([b1[:inner], b1[inner:]]).astype(jnp.float32)
    b2 = b2.astype(jnp.float32)

    grid = (m // bm, n_ic)
    out = pl.pallas_call(
        functools.partial(_ff_kernel, n_ic=n_ic),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i, j: (0, j + n_ic), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32)],
        interpret=_interpret(),
    )(xf, w1, w1, b1m, w2, b2[None])
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_geglu_ff_block(x, lnw, lnb, w1, b1, w2, b2):
    """LayerNorm(x) -> GEGLU FF -> + x, fused. x: (..., C)."""
    return _ff_block_apply(x, lnw, lnb, w1, b1, w2, b2)


def _ff_block_apply(x, lnw, lnb, w1, b1, w2, b2):
    orig_shape = x.shape
    c = x.shape[-1]
    m = x.size // c
    xf = x.reshape(m, c)
    inner = w1.shape[1] // 2

    s, bm = _pick_block_sizes(m, c, inner)
    n_ic = inner // s
    while m % bm:
        bm //= 2

    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    b1m = jnp.stack([b1[:inner], b1[inner:]]).astype(jnp.float32)
    b2 = b2.astype(jnp.float32)
    lnw = lnw.astype(jnp.float32).reshape(1, c)
    lnb = lnb.astype(jnp.float32).reshape(1, c)

    grid = (m // bm, n_ic)
    out = pl.pallas_call(
        functools.partial(_ff_ln_kernel, n_ic=n_ic),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i, j: (0, j + n_ic), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32),
                        pltpu.VMEM((bm, c), x.dtype)],
        interpret=_interpret(),
    )(xf, lnw, lnb, w1, w1, b1m, w2, b2[None])
    return out.reshape(orig_shape)


def _ff_block_math(x, lnw, lnb, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * lnw.astype(jnp.float32)
          + lnb.astype(jnp.float32)).astype(x.dtype)
    return _ff_math(xn, w1, b1, w2, b2) + x


def _ff_block_vjp_fwd(x, lnw, lnb, w1, b1, w2, b2):
    return _ff_block_apply(x, lnw, lnb, w1, b1, w2, b2), (x, lnw, lnb, w1, b1, w2, b2)


def _ff_block_vjp_bwd(res, g):
    x, lnw, lnb, w1, b1, w2, b2 = res
    c = x.shape[-1]
    m = x.size // c
    inner = w1.shape[1] // 2
    if ff_bwd_eligible(m, c, inner):
        # FF backward via the kernel on xn (recomputed, cheap elementwise);
        # the LN vjp and the residual add stay in XLA
        def ln(x_):
            xf = x_.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
            return (((xf - mu) * jax.lax.rsqrt(var + 1e-5))
                    * lnw.astype(jnp.float32) + lnb.astype(jnp.float32)
                    ).astype(x_.dtype)

        xn, ln_vjp = jax.vjp(ln, x)
        dxn, dw1, db1, dw2, db2 = _ff_bwd_apply(xn, g, w1, b1, w2)
        # dlnw/dlnb ride the same vjp trace as dx
        def ln_params(lw, lb):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
            return (((xf - mu) * jax.lax.rsqrt(var + 1e-5))
                    * lw.astype(jnp.float32) + lb.astype(jnp.float32)
                    ).astype(x.dtype)

        _, lnp_vjp = jax.vjp(ln_params, lnw, lnb)
        dlnw, dlnb = lnp_vjp(dxn)
        (dx_ln,) = ln_vjp(dxn)
        return (dx_ln + g, dlnw, dlnb, dw1, db1, dw2,
                db2.astype(b2.dtype))
    _, vjp = jax.vjp(_ff_block_math, *res)
    return vjp(g)


fused_geglu_ff_block.defvjp(_ff_block_vjp_fwd, _ff_block_vjp_bwd)


# ---------------------------------------------------------------------------
# True backward kernel: recompute-in-VMEM gradients for the GEGLU FF.
# Weight/bias gradients accumulate across the row-block grid dimension into
# revisited output blocks; the (M, inner) intermediates never touch HBM.
# ---------------------------------------------------------------------------

def _nrm_pdf(g):
    return jnp.exp(-0.5 * g * g) * (1.0 / 2.5066282746310002)  # 1/sqrt(2*pi)


def _ff_bwd_kernel(x_ref, dy_ref, w1v_ref, w1g_ref, b1_ref, w2_ref,
                   dx_ref, dw1v_ref, dw1g_ref, db1_ref, dw2_ref, db2_ref,
                   acc_ref, *, n_ic):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _init_j():  # first visit of every (·, j) weight-grad block
        dw1v_ref[...] = jnp.zeros_like(dw1v_ref[...])
        dw1g_ref[...] = jnp.zeros_like(dw1g_ref[...])
        db1_ref[...] = jnp.zeros_like(db1_ref[...])
        dw2_ref[...] = jnp.zeros_like(dw2_ref[...])

        @pl.when(j == 0)
        def _init_00():
            db2_ref[...] = jnp.zeros_like(db2_ref[...])

    @pl.when(j == 0)
    def _init_i():
        acc_ref[...] = jnp.zeros_like(acc_ref[...])

    x = x_ref[...]
    dy = dy_ref[...].astype(jnp.float32)
    dyb = dy.astype(x.dtype)

    @pl.when(j == 0)
    def _db2():
        db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)

    # recompute the (BM, S) intermediate slice
    u = jax.lax.dot(x, w1v_ref[...], preferred_element_type=jnp.float32)
    g = jax.lax.dot(x, w1g_ref[...], preferred_element_type=jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    u = u + b1[0]
    g = g + b1[1]
    phi = 0.5 * (1.0 + _erf(g * (2.0 ** -0.5)))
    gelu = g * phi
    h = (u * gelu).astype(x.dtype)

    dh = jax.lax.dot_general(
        dyb, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BM, S)
    dw2_ref[...] += jax.lax.dot_general(
        h, dyb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    du = dh * gelu
    dg = dh * u * (phi + g * _nrm_pdf(g))
    dub = du.astype(x.dtype)
    dgb = dg.astype(x.dtype)
    db1_ref[...] += jnp.concatenate(
        [jnp.sum(du, axis=0, keepdims=True),
         jnp.sum(dg, axis=0, keepdims=True)], axis=0)
    dw1v_ref[...] += jax.lax.dot_general(
        x, dub, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw1g_ref[...] += jax.lax.dot_general(
        x, dgb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    acc_ref[...] += (
        jax.lax.dot_general(dub, w1v_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(dgb, w1g_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32))

    @pl.when(j == n_ic - 1)
    def _store():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype)


def _pick_block_sizes_bwd(m: int, c: int, inner: int):
    """(s, bm) for the backward kernel: more f32 (BM, S) temporaries than the
    forward (u/g/dh/du/dg live together), so both dimensions shrink. s must
    stay a multiple of 128 (weight-block lane dimension)."""
    for s in (512, 384, 256, 128):
        if inner % s:
            continue
        for bm in (512, 256, 128):
            if m % bm:
                continue
            est = (6 * bm * s * 4          # u/g/phi/dh/du/dg f32
                   + 3 * c * s * 2 * 2     # w1v/w1g/w2 blocks, db
                   + 3 * c * s * 4 * 2     # dw1v/dw1g/dw2 out blocks, db
                   + 3 * bm * c * 2 * 2    # x/dy/dx blocks, db
                   + bm * c * 4)           # acc scratch
            # c == 640 runs against a tighter effective budget: its
            # (s=256, bm=256) pick (est 10.1M) measured 16.93M actual
            # scoped vmem inside the MDM1024 rematted backward (round-5
            # q1; the round-3 "16.73M spatial stub" was the same
            # instance) — context overhead the model misses, and
            # graph-dependent: the IDENTICAL kernel config compiled fine
            # in MDM512 training (round-2 session-5 ffbwd_ab). 8M forces
            # s=128/bm=256 (est 6.4M) for that width; the measured-good
            # c=320/c=1280 configs keep the calibrated 13M budget.
            if est < (8 if c == 640 else 13) * 2**20:
                return s, bm
    return 0, 0


def ff_bwd_eligible(m: int, c: int, inner: int) -> bool:
    return _pick_block_sizes_bwd(m, c, inner)[0] > 0


def _ff_bwd_apply(x, dy, w1, b1, w2):
    """Returns (dx, dw1, db1, dw2, db2) for y = geglu_ff(x) (bias grads f32)."""
    orig_shape = x.shape
    c = x.shape[-1]
    m = x.size // c
    xf = x.reshape(m, c)
    dyf = dy.reshape(m, c)
    inner = w1.shape[1] // 2
    s, bm = _pick_block_sizes_bwd(m, c, inner)
    n_ic = inner // s

    w1c = w1.astype(x.dtype)
    w2c = w2.astype(x.dtype)
    b1m = jnp.stack([b1[:inner], b1[inner:]]).astype(jnp.float32)

    blk = pl.BlockSpec((bm, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_ff_bwd_kernel, n_ic=n_ic),
        grid=(m // bm, n_ic),
        in_specs=[
            blk,
            blk,
            pl.BlockSpec((c, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i, j: (0, j + n_ic), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            blk,
            pl.BlockSpec((c, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, s), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, c), x.dtype),
            jax.ShapeDtypeStruct((c, inner), f32),
            jax.ShapeDtypeStruct((c, inner), f32),
            jax.ShapeDtypeStruct((2, inner), f32),
            jax.ShapeDtypeStruct((inner, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32)],
        interpret=_interpret(),
    )(xf, dyf, w1c, w1c, b1m, w2c)
    dx, dw1v, dw1g, db1m, dw2, db2 = outs
    dw1 = jnp.concatenate([dw1v, dw1g], axis=1).astype(w1.dtype)
    db1 = jnp.concatenate([db1m[0], db1m[1]]).astype(b1.dtype)
    return (dx.reshape(orig_shape), dw1, db1,
            dw2.astype(w2.dtype), db2.reshape(-1))


def _ff_math(x, w1, b1, w2, b2):
    u = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
    h, g = jnp.split(u, 2, axis=-1)
    h = h * jax.nn.gelu(g, approximate=False)
    return h @ w2.astype(x.dtype) + b2.astype(x.dtype)


def _ff_vjp_fwd(x, w1, b1, w2, b2):
    return _ff_apply(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ff_vjp_bwd(res, g):
    x, w1, b1, w2, b2 = res
    c = x.shape[-1]
    m = x.size // c
    inner = w1.shape[1] // 2
    if ff_bwd_eligible(m, c, inner):
        dx, dw1, db1, dw2, db2 = _ff_bwd_apply(x, g, w1, b1, w2)
        return dx, dw1, db1, dw2, db2.astype(b2.dtype)
    _, vjp = jax.vjp(_ff_math, x, w1, b1, w2, b2)
    return vjp(g)


fused_geglu_ff.defvjp(_ff_vjp_fwd, _ff_vjp_bwd)
