"""Pallas TPU kernels for the UNet's short-sequence attention shapes.

Two shapes dominate outside the long spatial self-attention:

1. Temporal self-attention: T=16 tokens over a huge batch (B*H*W*heads).
   XLA lowers this to batched (16,64)@(64,16) matmuls that use ~1.5% of the
   MXU (measured 1.3 TF/s, scripts/opbench.py). `packed_short_attention`
   packs G = 128//T batch items into one 128-wide block-diagonal logits
   matmul: (128, D) @ (D, 128) with off-diagonal 16x16 blocks masked, giving
   MXU-shaped work at a G-fold FLOP overcompute that is ~16x cheaper than the
   tiny-matmul path (replaces the reference's xformers call on temporal
   attention, lvdm/modules/attention.py:146-209).

2. Cross-attention: thousands of queries over a tiny KV (93 text+image
   tokens / 16 image tokens). The XLA path materializes fp32 logits in HBM
   (measured 21 TF/s); `short_kv_attention` keeps the whole KV and the
   logits in VMEM, one pass over the queries.

Both run the softmax in fp32 (parity island) with bf16 MXU operands; both
fall back to interpret mode off-TPU. Forward-only kernels with XLA-math
custom VJPs (recompute; these shapes are cheap relative to flash attention).

STATUS (kept deliberately, round-2 decision): measured SLOWER than dense XLA
on v5e (1.77 vs 1.28 ms / 0.71 vs 0.45 ms, docs/STATE.md) — the fold/unfold
transposes and per-pack loops eat the MXU gain, and the round-2 XLA
block-diagonal packing (`attention._blockdiag_small_attend`) captured the
same idea faster in plain einsums. Opt-in behind MUDG_SHORT_ATTN=1; in-tree
as the documented negative result that stops the experiment being redone.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# packed block-diagonal attention for tiny T
# ---------------------------------------------------------------------------

def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, t, scale, packs_per_cell):
    # refs: (P, 128, D). Each 128-row slab holds G = 128//t independent
    # sequences; the mask keeps only the within-sequence 16x16 blocks.
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) // t
    cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // t
    mask = rows == cols

    def one(p, _):
        q = q_ref[p]
        k = k_ref[p]
        v = v_ref[p]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (128, 128)
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p_ = jnp.exp(s - m)
        p_ = p_ / jnp.sum(p_, axis=-1, keepdims=True)
        o_ref[p] = jax.lax.dot(
            p_.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, packs_per_cell, one, 0)


def _packed_fwd(qp, kp, vp, t, scale, packs_per_cell):
    n_pack, rows, d = qp.shape
    grid = (n_pack // packs_per_cell,)
    spec = pl.BlockSpec((packs_per_cell, rows, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_kernel, t=t, scale=scale,
                          packs_per_cell=packs_per_cell),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, qp.dtype),
        interpret=_interpret(),
    )(qp, kp, vp)


def packed_short_attention_eligible(q) -> bool:
    b, t, h, d = q.shape
    return t <= 64 and 128 % t == 0 and d in (64, 128) and (b * h * t) % 128 == 0


@jax.custom_vjp
def packed_short_attention(q, k, v):
    """Self-attention over tiny sequences. q/k/v: (B, T, H, D) with equal T;
    requires packed_short_attention_eligible(q)."""
    return _packed_apply(q, k, v)


def _pack(x):
    b, t, h, d = x.shape
    # (B, T, H, D) -> (B*H, T, D) -> (packs, 128, D)
    x = x.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    return x.reshape(b * h * t // 128, 128, d)


def _unpack(xp, shape):
    b, t, h, d = shape
    x = xp.reshape(b * h, t, d)
    return x.reshape(b, h, t, d).transpose(0, 2, 1, 3)


def _packed_apply(q, k, v):
    b, t, h, d = q.shape
    scale = d ** -0.5
    qp, kp, vp = _pack(q), _pack(k), _pack(v)
    n_pack = qp.shape[0]
    ppc = 8
    while n_pack % ppc:
        ppc //= 2
    o = _packed_fwd(qp, kp, vp, t, scale, ppc)
    return _unpack(o, q.shape)


def _dense_math(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return p, jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)


def _packed_vjp_fwd(q, k, v):
    return _packed_apply(q, k, v), (q, k, v)


def _packed_vjp_bwd(res, g):
    # XLA-math backward (recomputed probabilities); these shapes are small.
    q, k, v = res
    scale = q.shape[-1] ** -0.5
    p, o = _dense_math(q, k, v)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p.astype(g.dtype), g)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v, preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = scale * jnp.einsum("bhqk,bkhd->bqhd", ds.astype(k.dtype), k)
    dk = scale * jnp.einsum("bhqk,bqhd->bkhd", ds.astype(q.dtype), q)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


packed_short_attention.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


# ---------------------------------------------------------------------------
# short-KV cross attention (whole KV in VMEM, no HBM logits)
# ---------------------------------------------------------------------------

def _short_kv_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, lk):
    # q: (1, BQ, D); k/v: (1, LKP, D) zero-padded to LKP lanes; logits columns
    # beyond lk are masked.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, LKP)
    if s.shape[-1] != lk:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < lk, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def short_kv_attention_eligible(q, k) -> bool:
    b, lq, h, d = q.shape
    lk = k.shape[1]
    return lk <= 1024 and d in (64, 128) and lq % 256 == 0


@jax.custom_vjp
def short_kv_attention(q, k, v):
    """Cross-attention with a small KV set. q: (B, Lq, H, D); k/v: (B, Lk, H, D)."""
    return _short_kv_apply(q, k, v)


def _short_kv_apply(q, k, v):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = d ** -0.5
    lkp = max(128, -(-lk // 128) * 128)

    def fold(x):
        bb, l, hh, dd = x.shape
        return x.transpose(0, 2, 1, 3).reshape(bb * hh, l, dd)

    qf, kf, vf = fold(q), fold(k), fold(v)
    if lkp != lk:
        pad = ((0, 0), (0, lkp - lk), (0, 0))
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)

    bq = 512
    while lq % bq:
        bq //= 2
    grid = (b * h, lq // bq)
    o = pl.pallas_call(
        functools.partial(_short_kv_kernel, scale=scale, lk=lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, d), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, d), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        interpret=_interpret(),
    )(qf, kf, vf)
    return o.reshape(b, h, lq, d).transpose(0, 2, 1, 3)


def _short_kv_vjp_fwd(q, k, v):
    return _short_kv_apply(q, k, v), (q, k, v)


short_kv_attention.defvjp(_short_kv_vjp_fwd, _packed_vjp_bwd)
