"""Temporal fused-attention kernel v2 experiment: full-width projections.

The production kernel (kernels/temporal_attn.py) computes q/k/v/out per head
with (C, 64)-shaped dots — N=64 pads to 128 lanes, so every projection runs
at <=50% MXU. v2 computes the projections FULL WIDTH ((C, C) dots, no
padding waste) and extracts each head's 64 lanes with pltpu.roll + slice
(the Mosaic-legal lane move), packing the per-head attention outputs back
the same way before one full-width out-proj.

Measures both variants + the XLA reference at the ds1 and ds2 shapes with
the chained-scan methodology (docs/STATE.md).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mudg_tpu.kernels import temporal_attn as TA

LOG2E = TA.LOG2E
NEG = TA.NEG


def _attn_stage_v2(x, lnw, lnb, wq, wk, wv, wo, bo, mask, heads, group):
    """v2: full-width projections; wq/wk/wv/wo are (C, C)."""
    rows, c = x.shape
    d = c // heads
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * lnw + lnb).astype(jnp.bfloat16)

    q = jax.lax.dot(xn, wq, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    k = jax.lax.dot(xn, wk, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    v = jax.lax.dot(xn, wv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def head(x2, h):
        # 64-offset lane slices are Mosaic-legal (bf16 pltpu.roll is NOT —
        # it crashes the compiler; scripts/roll_probe.py)
        return x2[:, h * d:(h + 1) * d].reshape(group, 128, d)

    outs = []
    for h in range(heads):
        q3, k3, v3 = head(q, h), head(k, h), head(v, h)
        s = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = jnp.where(mask[None], s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (G, 128, d)
        outs.append(o.reshape(rows, d).astype(jnp.bfloat16))
    o_all = jnp.concatenate(outs, axis=1)  # (rows, C), head-major lanes
    out = jax.lax.dot(o_all, wo, preferred_element_type=jnp.float32)
    return xf + out + bo


def _kernel2(x_ref,
             ln1w, ln1b, wq1, wk1, wv1, wo1, bo1,
             ln2w, ln2b, wq2, wk2, wv2, wo2, bo2,
             o_ref, *, t, heads, group):
    x = x_ref[...]
    r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) // t
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // t
    mask = r == c
    h1 = _attn_stage_v2(x, ln1w[...], ln1b[...], wq1[...], wk1[...], wv1[...],
                        wo1[...], bo1[...], mask, heads, group)
    h2 = _attn_stage_v2(h1.astype(x.dtype), ln2w[...], ln2b[...], wq2[...],
                        wk2[...], wv2[...], wo2[...], bo2[...], mask, heads, group)
    o_ref[...] = h2.astype(o_ref.dtype)


def _kernel2_single(x_ref, lnw, lnb, wq, wk, wv, wo, bo, o_ref, *, t, heads, group):
    x = x_ref[...]
    r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) // t
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // t
    mask = r == c
    h = _attn_stage_v2(x, lnw[...], lnb[...], wq[...], wk[...], wv[...],
                       wo[...], bo[...], mask, heads, group)
    o_ref[...] = h.astype(o_ref.dtype)


def _prep_full(p, c, heads, *, fold_scale):
    d = c // heads
    wq = p["to_q"]["weight"].astype(jnp.bfloat16)
    if fold_scale:
        wq = (wq.astype(jnp.float32) * (d ** -0.5 * LOG2E)).astype(jnp.bfloat16)
    wk = p["to_k"]["weight"].astype(jnp.bfloat16)
    wv = p["to_v"]["weight"].astype(jnp.bfloat16)
    wo = p["to_out"]["0"]["weight"].astype(jnp.bfloat16)
    bo = p["to_out"]["0"].get("bias")
    bo = (jnp.zeros((c,), jnp.float32) if bo is None else bo.astype(jnp.float32))
    # heads are contiguous d-lane groups of the inner dim in both torch and
    # here; wo rows are (head, d)-major already, so full-width works directly
    return wq, wk, wv, wo, bo.reshape(1, c)


def fused_v2(tokens, p1, p2, *, t, heads, group):
    n, tt, c = tokens.shape
    rows = n * tt
    x2 = tokens.reshape(rows, c)
    w1 = _prep_full(p1, c, heads, fold_scale=True)
    w2 = _prep_full(p2, c, heads, fold_scale=True)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = 128 * group
    out = pl.pallas_call(
        functools.partial(_kernel2, t=t, heads=heads, group=group),
        grid=(rows // blk,),
        in_specs=[pl.BlockSpec((blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + [const] * 14,
        out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), tokens.dtype),
    )(x2, *TA._ln_args(p1, c), *w1,
      *TA._ln_args(p2, c), *w2)
    return out.reshape(n, tt, c)


def fused_v2_single(tokens, p1, p2, *, t, heads, group):
    n, tt, c = tokens.shape
    rows = n * tt
    x2 = tokens.reshape(rows, c)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk = 128 * group
    for p in (p1, p2):
        w = _prep_full(p, c, heads, fold_scale=True)
        x2 = pl.pallas_call(
            functools.partial(_kernel2_single, t=t, heads=heads, group=group),
            grid=(rows // blk,),
            in_specs=[pl.BlockSpec((blk, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + [const] * 7,
            out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, c), tokens.dtype),
        )(x2, *TA._ln_args(p, c), *w)
    return x2.reshape(n, tt, c)


def timed(fn, x, n_long=48, n_short=8):
    def chain(x, n):
        def body(c, _):
            return fn(c), None
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


def make_params(rng, c, heads):
    from mudg_tpu.nn import attention as A
    from mudg_tpu.nn import functional as F
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    def attn(k):
        p = A.init_cross_attention(k, c, heads=heads, dim_head=c // heads)
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    def norm():
        return {"weight": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}
    p1 = {"norm": norm(), **attn(k1)}
    p2 = {"norm": norm(), **attn(k2)}
    return p1, p2


def main():
    t = 16
    for (c, heads, n) in [(320, 5, 5120), (640, 10, 1280)]:
        rng = jax.random.PRNGKey(0)
        p1, p2 = make_params(rng, c, heads)
        x = jax.random.normal(jax.random.PRNGKey(1), (n, t, c), jnp.bfloat16)

        ref = np.asarray(
            jax.jit(lambda x: TA._xla_impl(x, p1, p2, t=t, heads=heads))(x),
            np.float32)
        cur = np.asarray(
            jax.jit(lambda x: TA._fused_impl(x, p1, p2, t=t, heads=heads)[0])(x),
            np.float32)
        scale = np.abs(ref).max()

        rows = n * t
        for g in (8, 4):
            if rows % (128 * g):
                continue
            for name, fn in (
                ("v2_double", functools.partial(fused_v2, p1=p1, p2=p2,
                                                t=t, heads=heads, group=g)),
                ("v2_single", functools.partial(fused_v2_single, p1=p1, p2=p2,
                                                t=t, heads=heads, group=g)),
            ):
                try:
                    out = np.asarray(jax.jit(fn)(x), np.float32)
                    err = np.abs(out - ref).max() / scale
                    sec = timed(fn, x)
                    print(f"C={c} g={g} {name}: {sec*1e3:7.3f} ms  rel_err={err:.4f}",
                          flush=True)
                except Exception as e:
                    msg = str(e).split(chr(10))[0][:120]
                    print(f"C={c} g={g} {name}: FAIL {type(e).__name__} {msg}",
                          flush=True)

        sec_cur = timed(lambda x: TA._fused_impl(x, p1, p2, t=t, heads=heads)[0], x)
        sec_xla = timed(lambda x: TA._xla_impl(x, p1, p2, t=t, heads=heads), x)
        err_cur = np.abs(cur - ref).max() / scale
        print(f"C={c} current fused: {sec_cur*1e3:7.3f} ms rel_err={err_cur:.4f}; "
              f"xla: {sec_xla*1e3:7.3f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
