"""Pallas TPU flash attention (forward + backward).

Replaces xformers.ops.memory_efficient_attention in the reference hot path
(`lvdm/modules/attention.py:146-209`): block-wise online-softmax attention that
never materializes the (Lq, Lk) probability matrix in HBM. Backward follows
FlashAttention-2: the forward saves per-row logsumexp; dq/dk/dv are computed in
two Pallas kernels that re-form probabilities block-by-block.

Interface: q, k, v shaped (B, L, H, D) -> (B, L, H, D). Non-causal, no bias
(the only configuration MuDG's spatial self-attention needs; cross/temporal
attention use the dense XLA path in nn/attention.py because their key lengths
are tiny). fp32 softmax and accumulation; MXU matmuls take bf16 inputs.

On non-TPU backends (CPU tests) the kernels run in Pallas interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # 1/ln(2)

# Softmax runs in base 2 with scale*log2(e) folded into q before the QK^T
# matmul: 2^((s - m)*log2e) == e^(s - m) exactly, so probabilities are
# unchanged, but the (BQ, LK) f32 scale-multiply disappears and exp2 is the
# VPU's native exponential. Measured 10% on the oneshot forward
# (scripts/flashtune.py: 3.99 -> 3.57 ms, 34 -> 38% of peak at s=2560 d=64,
# max err vs dense f32 softmax unchanged at 1e-4). The saved lse stays in
# natural-log units (m/log2e + ln l) so the backward interface is unchanged.


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block(n: int, candidates=(512, 256, 128, 64)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k, seq_k):
    # Keep q/k in their storage dtype (bf16) for the MXU: f32 operands would
    # force the slow multi-pass f32 matmul path; preferred_element_type=f32
    # already gives f32 accumulation (FlashAttention numerics). The scale is
    # applied to the f32 logits so it stays exact for any head dim.
    q = q_ref[0]  # (BQ, D)
    bq, d = q.shape
    nk = seq_k // block_k
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK), base-2 logits
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m * (1.0 / LOG2E) + jnp.log(l)  # (BQ, 1), natural units


def _oneshot_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    """Whole-KV variant: when K/V fit VMEM, a plain softmax (no online
    rescale carry) is ~15% faster than the blocked loop (scripts/flashtune.py:
    4.00 vs 4.73 ms at s=2560 d=64)."""
    q = q_ref[0]
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(
        qs, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # base-2 logits
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0],
                    preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0] = m * (1.0 / LOG2E) + jnp.log(l)  # natural units


def _flash_fwd(q, k, v):
    """q,k,v: (BH, L, D) -> (o, lse)."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = d**-0.5
    # oneshot (whole KV resident, plain softmax) extends past lk=4096 as
    # long as a bq=128 block fits the 16M scoped-vmem limit counting the f32
    # scores AND their bf16 probability copy (6 B/elem) plus double-buffered
    # k/v: at MDM1024's s=9216 oneshot beats the online loop 2.91 vs 3.11 ms
    # at bq=128 (exact same outputs). bq=256 there compiled standalone but
    # OOM'd at 18.4M inside the full model — stay at 128 for long KV.
    oneshot = (lk <= 4096
               or 128 * lk * 6 + 4 * lk * d * 2 < int(14.5 * 2**20))
    # whole-sequence q block when the (LQ, LK) f32 score matrix fits VMEM:
    # at s=640 (ds2) this is 2.1x faster than bq=128 (0.42 vs 0.88 ms,
    # 19 -> 41% of peak — small blocks are grid-overhead-bound)
    if oneshot and lq % 8 == 0 and lq * lk * 4 <= 6 * 2**20:
        bq = lq
    else:
        cands = (256, 512, 128, 64) if lk <= 4096 else (128, 64)
        bq = _pick_block(lq, cands) if oneshot else _pick_block(
            lq, (512, 256, 128, 64))
    bk = _pick_block(lk, (1024, 512, 256, 128, 64))
    assert bq and bk, f"flash attention needs divisible seq lens, got {lq}, {lk}"

    if oneshot:
        grid = (bh, lq // bq)
        o, lse = pl.pallas_call(
            functools.partial(_oneshot_kernel, scale=scale),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(q.shape, q.dtype),
                jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32),
            ),
            interpret=_interpret(),
        )(q, k, v)
        return o, lse

    grid = (bh, lq // bq)
    out_shapes = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        # lse carried as (BH, L, 1): TPU blocks need sublane %8 == 0 and the
        # lane dim equal to the array dim, which (1, bq, 1) satisfies
        jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32),
    )
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=bk, seq_k=lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=_interpret(),
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale, block_k, seq_k):
    # bf16 operands for every MXU dot (f32 accumulation via
    # preferred_element_type); only softmax algebra stays f32.
    q = q_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0] * LOG2E      # (BQ, 1) -> base-2 units
    delta = delta_ref[0]  # (BQ, 1)
    bq, d = q.shape
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp2(s - lse2)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        return dq + scale * jax.lax.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, seq_k // block_k, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, block_q, seq_q):
    k = k_ref[0]
    v = v_ref[0]
    bk, d = k.shape

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse2 = lse_ref[0, pl.ds(i * block_q, block_q), :] * LOG2E  # (BQ, 1)
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]  # (BQ, 1)
        qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK), base-2 logits
        p = jnp.exp2(s - lse2)
        pb = p.astype(do.dtype)
        dv = dv + jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    z = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, seq_q // block_q, body, (z, z))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel_chunked(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                           dq_ref, *, scale):
    """Long-L variant: the kv loop is a grid dim, dq accumulates f32 into its
    revisited output block (the kernels/mlp.py _ff_bwd_kernel pattern). The
    whole-L kernels hold full-sequence k/v and (L, 1) lse/delta blocks whose
    1->128 lane padding alone is ~19 MB f32 at MDM1024's L=9216 — the
    scoped-vmem OOM that blocked stage-2 single-chip training (round 5)."""
    jj = pl.program_id(2)

    @pl.when(jj == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref[...])

    q = q_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0] * LOG2E
    delta = delta_ref[0]
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    p = jnp.exp2(s - lse2)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq_ref[0] = dq_ref[0] + scale * jax.lax.dot(
        ds, k, preferred_element_type=jnp.float32)


def _bwd_dkv_kernel_chunked(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                            dk_ref, dv_ref, *, scale):
    """Long-L variant of _bwd_dkv_kernel: q streams as a grid dim, dk/dv
    accumulate f32 into revisited output blocks (see _bwd_dq_kernel_chunked)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref[...])
        dv_ref[...] = jnp.zeros_like(dv_ref[...])

    k = k_ref[0]
    v = v_ref[0]
    q = q_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0] * LOG2E
    delta = delta_ref[0]
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    p = jnp.exp2(s - lse2)
    pb = p.astype(do.dtype)
    dv_ref[0] = dv_ref[0] + jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_ref[0] = dk_ref[0] + scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _flash_bwd_chunked(q, k, v, lse, delta, do, bq, bk):
    """Both bwd kernels with the long sequence streamed on a third grid dim.
    Outputs accumulate in f32 (grid-step accumulation in bf16 would lose
    low bits); cast back outside. Enables training at L=9216 (MDM1024)."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = d**-0.5
    f32 = jnp.float32

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_chunked, scale=scale),
        grid=(bh, lq // bq, lk // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, f32),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_chunked, scale=scale),
        grid=(bh, lk // bk, lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, f32),
            jax.ShapeDtypeStruct(k.shape, f32),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd_whole_fits(lq, lk, d, bq, bk) -> bool:
    """Scoped-vmem estimate for the whole-L dq/dkv kernels (double-buffered
    blocks; d and the trailing 1 of lse/delta pad to 128 lanes)."""
    dp = -(-d // 128) * 128
    est_dq = (2 * lk * dp * 2 * 2        # k, v whole-L, bf16, 2x buffers
              + 3 * bq * dp * 2 * 2      # q, do, dq blocks
              + 2 * bq * 128 * 4 * 2     # lse, delta (lane-padded 1 -> 128)
              + 4 * bq * bk * 4)         # s/p/dp/ds stack temporaries
    est_dkv = (2 * lq * dp * 2 * 2       # q, do whole-L
               + 2 * lq * 128 * 4 * 2    # lse, delta whole-L
               + 4 * bk * dp * 4 * 2     # k, v, dk, dv blocks
               + 4 * bq * bk * 4)
    # 14.5 MB working budget against the 16 MB scoped-vmem limit (docs/
    # STATE.md round-2 session 4); calibrated so the known-good whole-L
    # MDM512 shape (lq=2560, est 14.2 MB, measured fine for three rounds)
    # stays on the measured path and MDM1024's lq=9216 (est 34.6 MB,
    # observed 28 MB compile OOM) routes to the chunked kernels
    return max(est_dq, est_dkv) < int(14.5 * 2**20)


def _flash_bwd(q, k, v, o, lse, do):
    bh, lq, d = q.shape
    lk = k.shape[1]
    scale = d**-0.5
    # whole-sequence blocks when the f32 score/ds scratch fits VMEM (same
    # small-grid overhead as the forward; ~3 buffers of (bq, bk) f32)
    if lq % 8 == 0 and lq * lk * 12 <= 8 * 2**20:
        bq, bk = lq, lk
    else:
        bq = _pick_block(lq)
        bk = _pick_block(lk, (512, 256, 128, 64))

    delta = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
    )  # (BH, L, 1)

    if bq and bk and not _bwd_whole_fits(lq, lk, d, bq, bk):
        # long sequences (MDM1024 L=9216): whole-L operand blocks overflow
        # the 16 MB scoped-vmem budget -> stream the long dim on the grid
        return _flash_bwd_chunked(q, k, v, lse, delta, do, bq, bk)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=bk, seq_k=lk),
        grid=(bh, lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=bq, seq_q=lq),
        grid=(bh, lk // bk),
        in_specs=[
            pl.BlockSpec((1, lq, d), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, d), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, 1), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, 1), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public op with custom VJP, (B, L, H, D) layout
# ---------------------------------------------------------------------------
# Structure: the raw forward kernel runs OUTSIDE the custom_vjp (on
# stop_gradient'ed operands, so no tangent ever reaches the pallas_call) and
# its (o, lse) outputs are checkpoint_name-tagged; `_attach_grad` is an
# identity custom_vjp whose residuals are all INPUTS. Under jax.checkpoint
# with a save_only_these_names policy that includes "attn_o"/"attn_lse"
# (remat="dots_attn", the training default), the backward replay substitutes
# the saved o/lse and the forward kernel is dead-code-eliminated from the
# replay — the bwd kernels run without paying a second forward. Policies
# that don't save the names (remat=True etc.) replay the kernel as before.


def flash_attention(q, k, v):
    qf, kf, vf = _fold(q, k, v)
    o, lse = _flash_fwd(jax.lax.stop_gradient(qf), jax.lax.stop_gradient(kf),
                        jax.lax.stop_gradient(vf))
    o = checkpoint_name(o, "attn_o")
    lse = checkpoint_name(lse, "attn_lse")
    return _unfold(_attach_grad(qf, kf, vf, o, lse), q.shape)


def _fold(q, k, v):
    """(B, L, H, D) -> (B*H, L, D) for all three."""
    def t(x):
        b, l, h, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b * h, l, d)
    return t(q), t(k), t(v)


def _unfold(x, qshape):
    b, l, h, d = qshape
    return x.reshape(b, h, l, d).transpose(0, 2, 1, 3)


@jax.custom_vjp
def _attach_grad(qf, kf, vf, o, lse):
    """Identity on o carrying the FlashAttention-2 backward. o/lse arrive
    stop_gradient'ed (pure kernel outputs); gradients flow to q/k/v only."""
    return o


def _ag_fwd(qf, kf, vf, o, lse):
    return o, (qf, kf, vf, o, lse)


def _ag_bwd(res, gf):
    qf, kf, vf, o, lse = res
    dq, dk, dv = _flash_bwd(qf, kf, vf, o, lse, gf)
    return dq, dk, dv, jnp.zeros_like(o), jnp.zeros_like(lse)


_attach_grad.defvjp(_ag_fwd, _ag_bwd)
