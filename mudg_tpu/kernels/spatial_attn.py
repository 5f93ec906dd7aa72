"""Fused spatial self-attention block (Pallas TPU).

Replaces the XLA-projections + flash-kernel pipeline for the UNet's spatial
self-attention (`lvdm/modules/attention.py:146-209` hot path) where one
batch element's whole (L, C) sequence fits VMEM. The ENTIRE pre-norm
residual block runs in one kernel — per grid step (one batch element):

    LN(x) -> k/v full-width projections into SCRATCH refs
    -> loop over q-chunks: per-chunk LN -> q-proj -> per-head whole-KV
       base-2 softmax -> PV -> head concat -> out-proj -> +bias +residual

Wins over the previous path (measured, scripts/sattn.py, v5e):
  * projections run FULL WIDTH (the flash path's (B,L,H,D) layout forces
    per-head D=64 lane padding on q/k/v materialization and transposes),
  * q, k, v, o and the attention probabilities never touch HBM,
  * measured per call vs the XLA-projections+flash path (scripts/sattn.py
    harness): ds1 (L=2560, C=320) 4.04 vs 5.41 ms; ds2 (L=640, C=640)
    1.06 vs 1.23 ms.

Mosaic/XLA landmines encoded here (scripts/sattn_probe*.py, roll_probe.py):
  * capturing a THIRD live (L, C) value in a fori_loop body crashes the
    compiler at L=2560 -> k/v live in scratch refs, head slices read per use;
  * LN + residual-add as XLA ops AROUND the pallas call crash the REMOTE
    compile service at (B=32, L=2560) -> both live inside the kernel
    (row-wise LN per q-chunk is exact);
  * bf16 pltpu.roll crashes -> heads are split with 64-offset lane slices.

Backward: custom_vjp re-running the XLA math under jax.vjp (exact unfused
gradients). Training passes impl="train", which bypasses this kernel, so
the replay never runs in the training step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln(v, w, b):
    vf = v.astype(jnp.float32)
    mu = jnp.mean(vf, axis=-1, keepdims=True)
    var = jnp.mean((vf - mu) ** 2, axis=-1, keepdims=True)
    return ((vf - mu) * jax.lax.rsqrt(var + 1e-5) * w + b).astype(jnp.bfloat16)


def _kernel(x_ref, lnw, lnb, wq, wk, wv, wo, bo, o_ref, kb, vb,
            *, heads, bq, seq):
    c = x_ref.shape[-1]
    d = c // heads
    xn = _ln(x_ref[0], lnw[...], lnb[...])
    kb[...] = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    vb[...] = jax.lax.dot(xn, wv[...], preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    def qc_body(i, carry):
        xc = x_ref[0, pl.ds(i * bq, bq), :]
        q = jax.lax.dot(_ln(xc, lnw[...], lnb[...]), wq[...],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)  # scale*log2e folded into wq
        outs = []
        for h in range(heads):
            s = jax.lax.dot_general(
                q[:, h * d:(h + 1) * d], kb[:, h * d:(h + 1) * d],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (bq, L) base-2 logits
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vb[:, h * d:(h + 1) * d],
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_all = jnp.concatenate(outs, axis=1)  # (bq, C) head-major lanes
        out = (jax.lax.dot(o_all, wo[...], preferred_element_type=jnp.float32)
               + bo[...] + xc.astype(jnp.float32))
        o_ref[0, pl.ds(i * bq, bq), :] = out.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, seq // bq, qc_body, 0)


def _prep(p, c, heads):
    d = c // heads
    wq = (p["to_q"]["weight"].astype(jnp.float32) * (d ** -0.5 * LOG2E)
          ).astype(jnp.bfloat16)
    wk = p["to_k"]["weight"].astype(jnp.bfloat16)
    wv = p["to_v"]["weight"].astype(jnp.bfloat16)
    wo = p["to_out"]["0"]["weight"].astype(jnp.bfloat16)
    bo = p["to_out"]["0"].get("bias")
    bo = (jnp.zeros((c,), jnp.float32) if bo is None else bo.astype(jnp.float32))
    return wq, wk, wv, wo, bo.reshape(1, c)


def _vmem_est(l, c, bq):
    # The real constraint is the 16 MB scoped-vmem limit (the remote
    # compiler's HTTP-500s are this OOM; one surfaced in full: ds2 bq=320
    # "16.27M > 16.00M"). Model: double-buffered x/out blocks, k/v scratch,
    # (bq, L) f32 scores, weights DOUBLE-buffered (consts are pipelined
    # too), per-chunk LN f32 temporaries, q/o_all/out transients. A 14.5 MB
    # budget reproduces every observed pass/fail: ds1 (2560, 320) bq=128 ok
    # / bq=256 OOM; ds2 (640, 640) bq=320 OOM (16.27M real) / bq=128 ok.
    return (2 * (l * c * 2) * 2     # x + out blocks, double-buffered
            + 2 * l * c * 2         # k/v scratch
            + bq * l * 4            # scores
            + 2 * 4 * c * c * 2     # weights, double-buffered
            + 2 * bq * c * 4        # per-chunk LN f32 temporaries
            + 2 * bq * c * 4)       # q/o_all/out transients


def _pick_bq(l, c):
    for bq in (l, 512, 320, 256, 128):
        if l % bq == 0 and _vmem_est(l, c, bq) < int(14.5 * 2**20):
            return bq
    return 0


def eligible(x, c, heads) -> bool:
    """x: (B, L, C) tokens, self-attention over L. bf16 only (the kernel
    computes q/k/v/S/PV in bf16; fp32 callers would silently lose precision)."""
    l = x.shape[1]
    return (
        jax.default_backend() == "tpu"
        and x.dtype == jnp.bfloat16
        and c % heads == 0
        and (c // heads) % 64 == 0        # head slices on 64-lane boundaries
        and l % 128 == 0
        and _pick_bq(l, c) > 0
    )


def _fused_impl(x, p_norm, p_attn, *, heads, bq=None):
    b, l, c = x.shape
    bq = bq or _pick_bq(l, c)
    w = _prep(p_attn, c, heads)
    lnw = p_norm["weight"].astype(jnp.float32).reshape(1, c)
    lnb = p_norm["bias"].astype(jnp.float32).reshape(1, c)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, bq=bq, seq=l),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [const] * 7,
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((l, c), jnp.bfloat16),
                        pltpu.VMEM((l, c), jnp.bfloat16)],
        interpret=_interpret(),
    )(x, lnw, lnb, *w)


def _xla_impl(x, p_norm, p_attn, *, heads):
    """Reference math (LN -> self-attention -> +residual) in plain XLA; used
    for the custom-vjp backward and parity tests. impl="xla_dense" is an
    unrecognized impl value on purpose: attend() then takes its dense-einsum
    fallback, keeping this graph kernel-free on every backend."""
    from ..nn import attention as A
    from ..nn import functional as F

    return A.cross_attention(p_attn, F.layer_norm(p_norm, x), None,
                             heads=heads, impl="xla_dense") + x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_self_attention(x, p_norm, p_attn, heads):
    """LN -> spatial self-attention -> +residual, fused. x: (B, L, C).
    p_norm: LayerNorm params; p_attn: CrossAttention params (self-attn,
    no qkv biases)."""
    return _fused_impl(x, p_norm, p_attn, heads=heads)


def _vjp_fwd(x, p_norm, p_attn, heads):
    return _fused_impl(x, p_norm, p_attn, heads=heads), (x, p_norm, p_attn)


def _vjp_bwd(heads, res, g):
    x, p_norm, p_attn = res
    _, vjp = jax.vjp(lambda x_, n_, a_: _xla_impl(x_, n_, a_, heads=heads),
                     x, p_norm, p_attn)
    return vjp(g)


fused_self_attention.defvjp(_vjp_fwd, _vjp_bwd)
