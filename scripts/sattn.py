"""Fused spatial self-attention kernel experiment (TPU).

Current ds1 spatial self-attention path: XLA computes LN + 3 projections
(bandwidth-bound at M=81920 K=N=320), transposes (B,L,H,D)->(B*H,L,D) for
the flash kernel, runs flash (38% of peak, 50% D=64 ceiling), transposes
back, then the out-projection — q, o and the head-transposed k/v all make
HBM round trips.

This kernel takes xn=(B,L,C) directly: per batch element, k/v are projected
ONCE full-width into VMEM, then an inner loop over q-chunks computes
q-proj + per-head whole-KV softmax + out-proj + residual without anything
leaving VMEM. Head split via 64-offset lane slices (Mosaic-legal).

Measures vs the production path (projections in XLA + flash) at the ds1/ds2
shapes, chained-scan methodology.
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

from mudg_tpu.nn import attention as A
from mudg_tpu.nn import functional as F

LOG2E = 1.4426950408889634


def _sattn_kernel(x_ref, xn_ref, wq, wk, wv, wo, bo, o_ref, *, heads, bq, seq):
    c = x_ref.shape[-1]
    d = c // heads
    xn = xn_ref[0]  # (L, C) bf16
    k = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    v = jax.lax.dot(xn, wv[...], preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def qc_body(i, carry):
        xq = xn_ref[0, pl.ds(i * bq, bq), :]
        q = jax.lax.dot(xq, wq[...], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)  # scale*log2e folded into wq
        outs = []
        for h in range(heads):
            qh = q[:, h * d:(h + 1) * d]
            kh = k[:, h * d:(h + 1) * d]
            vh = v[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (bq, L) base-2 logits
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vh,
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_all = jnp.concatenate(outs, axis=1)  # (bq, C)
        out = (jax.lax.dot(o_all, wo[...], preferred_element_type=jnp.float32)
               + bo[...]
               + x_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32))
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


def fused_spatial_self_attn(x, p_norm, p_attn, *, heads, bq):
    """x: (B, L, C) -> attn(LN(x)) + x, attention over L within each b."""
    b, l, c = x.shape
    xn = F.layer_norm(p_norm, x).astype(jnp.bfloat16)
    w = _prep(p_attn, c, heads)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sattn_kernel, heads=heads, bq=bq, seq=l),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [const] * 5,
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
    )(x, xn, *w)


def _sattn2_kernel(x_hbm, ln_w, ln_b, wq, wk, wv, wo, bo, o_hbm,
                   xb, xnb, ob, sem, osem, *, heads, bq, seq):
    """Manual-DMA variant: x lives in HBM (ANY); the whole (L, C) slice is
    DMA'd once per grid step into scratch, so Pallas doesn't double-buffer
    three (1, L, C) VMEM blocks (which overflows VMEM at ds1: L=2560).
    xn is staged in a scratch ref because Mosaic has no dynamic_slice on
    VALUES — q-chunk slicing must go through pl.ds on a ref."""
    b = pl.program_id(0)
    c = xb.shape[-1]
    d = c // heads
    cp = pltpu.make_async_copy(x_hbm.at[b], xb, sem)
    cp.start()
    cp.wait()
    x = xb[...]  # (L, C) bf16
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * ln_w[...] + ln_b[...]
          ).astype(jnp.bfloat16)
    xnb[...] = xn
    k = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    v = jax.lax.dot(xn, wv[...], preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def qc_body(i, carry):
        xq = xnb[pl.ds(i * bq, bq), :]
        q = jax.lax.dot(xq, wq[...], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        outs = []
        for h in range(heads):
            qh = q[:, h * d:(h + 1) * d]
            kh = k[:, h * d:(h + 1) * d]
            vh = v[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vh,
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_all = jnp.concatenate(outs, axis=1)
        out = (jax.lax.dot(o_all, wo[...], preferred_element_type=jnp.float32)
               + bo[...]
               + xb[pl.ds(i * bq, bq), :].astype(jnp.float32))
        ob[...] = out.astype(ob.dtype)
        wcp = pltpu.make_async_copy(ob, o_hbm.at[b, pl.ds(i * bq, bq), :], osem)
        wcp.start()
        wcp.wait()
        return carry

    jax.lax.fori_loop(0, seq // bq, qc_body, 0)


def fused_spatial_self_attn2(x, p_norm, p_attn, *, heads, bq):
    b, l, c = x.shape
    w = _prep(p_attn, c, heads)
    ln_w = p_norm["weight"].astype(jnp.float32).reshape(1, c)
    ln_b = p_norm["bias"].astype(jnp.float32).reshape(1, c)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sattn2_kernel, heads=heads, bq=bq, seq=l),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [const] * 7,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((l, c), jnp.bfloat16),
            pltpu.VMEM((l, c), jnp.bfloat16),
            pltpu.VMEM((bq, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(x, ln_w, ln_b, *w)


def _sattn3_kernel(xn_ref, wq, wk, wv, wo, bo, o_ref, *, heads, bq, seq):
    """Lean variant for ds1: xn is the ONLY streamed input and the residual
    add happens in XLA — halves the double-buffered block footprint."""
    c = xn_ref.shape[-1]
    d = c // heads
    xn = xn_ref[0]
    k = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    v = jax.lax.dot(xn, wv[...], preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def qc_body(i, carry):
        xq = xn_ref[0, pl.ds(i * bq, bq), :]
        q = jax.lax.dot(xq, wq[...], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        outs = []
        for h in range(heads):
            qh = q[:, h * d:(h + 1) * d]
            kh = k[:, h * d:(h + 1) * d]
            vh = v[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vh,
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_all = jnp.concatenate(outs, axis=1)
        out = jax.lax.dot(o_all, wo[...], preferred_element_type=jnp.float32) + bo[...]
        o_ref[0, pl.ds(i * bq, bq), :] = out.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, seq // bq, qc_body, 0)


def fused_spatial_self_attn3(x, p_norm, p_attn, *, heads, bq):
    b, l, c = x.shape
    xn = F.layer_norm(p_norm, x).astype(jnp.bfloat16)
    w = _prep(p_attn, c, heads)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    attn = pl.pallas_call(
        functools.partial(_sattn3_kernel, heads=heads, bq=bq, seq=l),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [const] * 5,
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
    )(xn, *w)
    return attn + x


def _sattn4_kernel(xn_ref, wq, wk, wv, wo, o_ref, kb, vb, *, heads, bq, seq):
    """k/v staged in SCRATCH REFS: capturing a third live (L, C) value in the
    fori body crashes Mosaic at L=2560 (scripts/sattn_probe.py); reading
    head slices from refs avoids the capture entirely."""
    c = xn_ref.shape[-1]
    d = c // heads
    xn = xn_ref[0]
    kb[...] = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    vb[...] = jax.lax.dot(xn, wv[...], preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    def qc_body(i, carry):
        xq = xn_ref[0, pl.ds(i * bq, bq), :]
        q = jax.lax.dot(xq, wq[...], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        outs = []
        for h in range(heads):
            qh = q[:, h * d:(h + 1) * d]
            kh = kb[:, h * d:(h + 1) * d]
            vh = vb[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vh,
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_all = jnp.concatenate(outs, axis=1)
        out = jax.lax.dot(o_all, wo[...], preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(i * bq, bq), :] = out.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, seq // bq, qc_body, 0)


def fused_spatial_self_attn4(x, p_norm, p_attn, *, heads, bq):
    b, l, c = x.shape
    xn = F.layer_norm(p_norm, x).astype(jnp.bfloat16)
    *w, bo = _prep(p_attn, c, heads)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    attn = pl.pallas_call(
        functools.partial(_sattn4_kernel, heads=heads, bq=bq, seq=l),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [const] * 4,
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((l, c), jnp.bfloat16),
                        pltpu.VMEM((l, c), jnp.bfloat16)],
    )(xn, *w)
    return attn + bo.astype(x.dtype) + x


def xla_path(x, p_norm, p_attn, *, heads):
    return A.cross_attention(p_attn, F.layer_norm(p_norm, x), None,
                             heads=heads) + x


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


def main():
    for (b, l, c, heads) in [(32, 2560, 320, 5), (32, 640, 640, 10)]:
        rng = jax.random.PRNGKey(0)
        p_attn = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            A.init_cross_attention(rng, c, heads=heads, dim_head=c // heads))
        p_norm = {"weight": jnp.ones((c,), jnp.float32),
                  "bias": jnp.zeros((c,), jnp.float32)}
        x = jax.random.normal(jax.random.PRNGKey(1), (b, l, c), jnp.bfloat16)

        ref = np.asarray(
            jax.jit(lambda x: xla_path(x, p_norm, p_attn, heads=heads))(x),
            np.float32)
        scale = np.abs(ref).max()
        for name, maker in (("fused", fused_spatial_self_attn),
                            ("fused4", fused_spatial_self_attn4)):
            if name == "fused" and c == 320:
                continue  # known VMEM overflow (3 double-buffered (L,C) blocks)
            for bq in (256, 512, l):
                if l % bq:
                    continue
                fn = functools.partial(maker, p_norm=p_norm,
                                       p_attn=p_attn, heads=heads, bq=bq)
                try:
                    out = np.asarray(jax.jit(fn)(x), np.float32)
                    err = np.abs(out - ref).max() / scale
                    sec = timed(fn, x)
                    print(f"L={l} C={c} {name} bq={bq}: {sec*1e3:7.3f} ms "
                          f"rel_err={err:.4f}", flush=True)
                except Exception as e:
                    print(f"L={l} C={c} {name} bq={bq}: FAIL {type(e).__name__} "
                          f"{str(e).splitlines()[0][:90]}", flush=True)
        sec = timed(lambda x: xla_path(x, p_norm, p_attn, heads=heads), x)
        print(f"L={l} C={c} xla+flash   : {sec*1e3:7.3f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
