"""Probe: 2-head PV lane packing for D=64 flash attention (TPU).

The D=64 head dim caps the PV dot at 50% lane utilization. Idea: process
head pairs per grid step; QK^T stays a batched (2, bq, d)x(2, lk, d) dot
(still 64-deep), but the PV dot packs both heads' probabilities on lanes
(bq, 2lk) against a block-diagonal V (2lk, 128), using the full 128-lane
MXU width. V is pre-packed block-diagonal in XLA (included in timing).

MDM1024 spatial self-attention shapes (the surviving flash user):
ds1 bh=160 L=9216, ds2 bh=320 L=2304 (b=2 CFG, t=16).
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

from mudg_tpu.kernels import flash_attention as FA

PEAK = 197e12
LOG2E = 1.4426950408889634


def timed(fn, x, n_long=24, n_short=4):
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


def _packed_kernel(q_ref, k_ref, vd_ref, o_ref, *, scale):
    q = q_ref[0]                     # (2, bq, d)
    k = k_ref[0]                     # (2, lk, d)
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    s = jax.lax.dot_general(
        qs, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (2, bq, lk)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)           # (2, bq, 1)
    pb = p.astype(vd_ref.dtype)
    p_pack = jnp.concatenate([pb[0], pb[1]], axis=1)  # (bq, 2lk)
    o = jax.lax.dot(p_pack, vd_ref[...],
                    preferred_element_type=jnp.float32)  # (bq, 128)
    linv = 1.0 / l
    bq = q.shape[1]
    div = jnp.concatenate(
        [jnp.broadcast_to(linv[0], (bq, 64)),
         jnp.broadcast_to(linv[1], (bq, 64))], axis=1)
    o_ref[0] = (o * div).astype(o_ref.dtype)


def packed(q, k, vd, bq):
    """q, k: (BH2, 2, L, 64); vd: (BH2, 2L, 128) block-diagonal."""
    bh2, _, lq, d = q.shape
    lk = k.shape[2]
    grid = (bh2, lq // bq)
    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=d ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, bq, d), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, lk, d), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * lk, 128), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh2, lq, 128), q.dtype),
    )(q, k, vd.reshape(bh2 * 2 * lk, 128))


def pack_v(v):
    """(BH2, 2, L, 64) -> block-diagonal (BH2, 2L, 128)."""
    z = jnp.zeros_like(v[:, 0])
    top = jnp.concatenate([v[:, 0], z], axis=-1)
    bot = jnp.concatenate([z, v[:, 1]], axis=-1)
    return jnp.concatenate([top, bot], axis=1)


def packed_full(qp, bq):
    vd = pack_v(qp)
    o = packed(qp, qp, vd, bq)          # (BH2, L, 128)
    bh2, lq, _ = o.shape
    return o.reshape(bh2, lq, 2, 64).transpose(0, 2, 1, 3)


def main():
    rng = jax.random.PRNGKey(0)
    for (bh, s, d) in [(320, 2304, 64), (160, 9216, 64)]:
        q = jax.random.normal(rng, (bh, s, d), jnp.bfloat16) * 0.1
        qp = q.reshape(bh // 2, 2, s, d)
        flops = 2 * bh * 2 * s * s * d

        def dense(q):
            s_ = jnp.einsum("bqd,bkd->bqk", q, q,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
            p = jax.nn.softmax(s_, axis=-1).astype(q.dtype)
            return jnp.einsum("bqk,bkd->bqd", p, q)

        ref = None
        if s <= 4096:
            ref = np.asarray(jax.jit(dense)(q), np.float32).reshape(
                bh // 2, 2, s, d)

        q4 = q[:, :, None, :]  # (BH, L, 1, D) — production kernel layout
        sec = timed(lambda x: FA.flash_attention(x, x, x), q4)
        print(f"bh={bh} s={s} production flash: {sec*1e3:7.3f} ms "
              f"{100*flops/sec/PEAK:5.1f}%", flush=True)

        for bq in (64, 128, 256, 512):
            if s % bq:
                continue
            try:
                out = np.asarray(jax.jit(
                    lambda x: packed_full(x, bq))(qp), np.float32)
                tag = ""
                if ref is not None:
                    tag = f" err={np.abs(out - ref).max():.4f}"
                sec = timed(lambda x: packed_full(x, bq), qp)
                print(f"bh={bh} s={s} packed bq={bq}: {sec*1e3:7.3f} ms "
                      f"{100*flops/sec/PEAK:5.1f}%{tag}", flush=True)
            except Exception as e:
                print(f"bh={bh} s={s} packed bq={bq}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
