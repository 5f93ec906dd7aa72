"""Bisect the Mosaic compile crash at (L=2560, C=320) in the sattn kernel."""
import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, C, D, BQ = 2560, 320, 64, 256


def run(name, kern, n_out_lanes=C, extra_in=()):
    xn = jnp.ones((4, L, C), jnp.bfloat16)
    w = jnp.ones((C, C), jnp.bfloat16)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    try:
        out = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] + [const] * len(extra_in),
            out_specs=pl.BlockSpec((1, L, n_out_lanes), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, L, n_out_lanes), jnp.bfloat16),
        )(xn, *([w] * len(extra_in)))
        out.block_until_ready()
        print(f"{name}: ok", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}", flush=True)


def k_copy(x_ref, o_ref):
    o_ref[0] = x_ref[0]


def k_proj(x_ref, w_ref, o_ref):
    xn = x_ref[0]
    o_ref[0] = jax.lax.dot(xn, w_ref[...],
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def k_sdot(x_ref, w_ref, o_ref):
    # per-head S dot with N=2560 output lanes, f32
    xn = x_ref[0]
    k = jax.lax.dot(xn, w_ref[...], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
    acc = jnp.zeros((L, C), jnp.float32)
    for h in range(1):
        qh = k[0:BQ, h * D:(h + 1) * D]
        kh = k[:, h * D:(h + 1) * D]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (BQ, L)
        acc = acc.at[0:BQ, 0:1].add(jnp.sum(s, axis=1, keepdims=True)) if False else acc
        o_ref[0, pl.ds(0, BQ), :] = (s[:, 0:C]).astype(jnp.bfloat16)
    return


def k_loop(x_ref, w_ref, o_ref):
    xn = x_ref[0]

    def body(i, c_):
        xq = x_ref[0, pl.ds(i * BQ, BQ), :]
        q = jax.lax.dot(xq, w_ref[...], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        o_ref[0, pl.ds(i * BQ, BQ), :] = q
        return c_

    jax.lax.fori_loop(0, L // BQ, body, 0)


def k_loop_sdot(x_ref, w_ref, o_ref):
    xn = x_ref[0]
    k = jax.lax.dot(xn, w_ref[...], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)

    def body(i, c_):
        xq = x_ref[0, pl.ds(i * BQ, BQ), :]
        q = jax.lax.dot(xq, w_ref[...], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        outs = []
        for h in range(C // D):
            qh = q[:, h * D:(h + 1) * D]
            kh = k[:, h * D:(h + 1) * D]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), kh,
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_ref[0, pl.ds(i * BQ, BQ), :] = jnp.concatenate(outs, axis=1)
        return c_

    jax.lax.fori_loop(0, L // BQ, body, 0)


def k_full(x_ref, wq, wk, wv, wo, o_ref):
    xn = x_ref[0]
    k = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
    v = jax.lax.dot(xn, wv[...], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)

    def body(i, c_):
        xq = x_ref[0, pl.ds(i * BQ, BQ), :]
        q = jax.lax.dot(xq, wq[...], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        outs = []
        for h in range(C // D):
            qh = q[:, h * D:(h + 1) * D]
            kh = k[:, h * D:(h + 1) * D]
            vh = v[:, h * D:(h + 1) * D]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vh,
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_all = jnp.concatenate(outs, axis=1)
        out = jax.lax.dot(o_all, wo[...], preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(i * BQ, BQ), :] = out.astype(jnp.bfloat16)
        return c_

    jax.lax.fori_loop(0, L // BQ, body, 0)


def k_full_nov(x_ref, wq, wk, wv, wo, o_ref):
    """Same but PV uses kh (v never formed) — isolates the 3rd (L,C) live."""
    xn = x_ref[0]
    k = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)

    def body(i, c_):
        xq = x_ref[0, pl.ds(i * BQ, BQ), :]
        q = jax.lax.dot(xq, wq[...], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        outs = []
        for h in range(C // D):
            qh = q[:, h * D:(h + 1) * D]
            kh = k[:, h * D:(h + 1) * D]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), kh,
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_all = jnp.concatenate(outs, axis=1)
        out = jax.lax.dot(o_all, wo[...], preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(i * BQ, BQ), :] = out.astype(jnp.bfloat16)
        return c_

    jax.lax.fori_loop(0, L // BQ, body, 0)


def run_scratch(name, kern):
    xn = jnp.ones((4, L, C), jnp.bfloat16)
    w = jnp.ones((C, C), jnp.bfloat16)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    try:
        out = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] + [const] * 4,
            out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, L, C), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((L, C), jnp.bfloat16),
                            pltpu.VMEM((L, C), jnp.bfloat16)],
        )(xn, w, w, w, w)
        out.block_until_ready()
        print(f"{name}: ok", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}", flush=True)


def k_full_scratch(x_ref, wq, wk, wv, wo, o_ref, kb, vb):
    xn = x_ref[0]
    kb[...] = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    vb[...] = jax.lax.dot(xn, wv[...], preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    def body(i, c_):
        xq = x_ref[0, pl.ds(i * BQ, BQ), :]
        q = jax.lax.dot(xq, wq[...], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        outs = []
        for h in range(C // D):
            qh = q[:, h * D:(h + 1) * D]
            kh = kb[:, h * D:(h + 1) * D]
            vh = vb[:, h * D:(h + 1) * D]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vh,
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_all = jnp.concatenate(outs, axis=1)
        out = jax.lax.dot(o_all, wo[...], preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(i * BQ, BQ), :] = out.astype(jnp.bfloat16)
        return c_

    jax.lax.fori_loop(0, L // BQ, body, 0)


def main():
    run("copy", k_copy)
    run("proj(2560x320 @ 320x320)", k_proj, extra_in=(1,))
    run("S-dot N=2560", k_sdot, extra_in=(1,))
    run("fori+dyn-slice q-proj", k_loop, extra_in=(1,))
    run("fori + per-head softmax+PV", k_loop_sdot, extra_in=(1,))
    run("full kernel (k+v+outproj)", k_full, extra_in=(1, 2, 3, 4))
    run("full minus v", k_full_nov, extra_in=(1, 2, 3, 4))
    run_scratch("full with k/v scratch refs", k_full_scratch)
    print("done", flush=True)


if __name__ == "__main__":
    main()
