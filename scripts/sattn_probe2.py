"""Round 2 of the ds1 fused-sattn crash bisect: distinct weights, bq sweep,
manual-DMA input variant."""
import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, C, D = 2560, 320, 64
H = C // D


def body_attn(xn_src, kb, vb, wq, wk, wv, wo, write, bq):
    """Shared math: xn_src(i) -> q-chunk; kb/vb already filled."""
    def qc_body(i, c_):
        xq = xn_src(i)
        q = jax.lax.dot(xq, wq[...], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        outs = []
        for h in range(H):
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
        write(i, out.astype(jnp.bfloat16))
        return c_

    jax.lax.fori_loop(0, L // bq, qc_body, 0)


def make_weights(distinct):
    if distinct:
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        return [jax.random.normal(k, (C, C), jnp.bfloat16) * 0.05 for k in ks]
    w = jnp.ones((C, C), jnp.bfloat16) * 0.01
    return [w, w, w, w]


def block_variant(bq, distinct):
    def kern(xn_ref, wq, wk, wv, wo, o_ref, kb, vb):
        xn = xn_ref[0]
        kb[...] = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
        vb[...] = jax.lax.dot(xn, wv[...], preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
        body_attn(lambda i: xn_ref[0, pl.ds(i * bq, bq), :], kb, vb,
                  wq, wk, wv, wo,
                  lambda i, o: o_ref.__setitem__((0, pl.ds(i * bq, bq), slice(None)), o),
                  bq)

    xn = jnp.ones((8, L, C), jnp.bfloat16) * 0.01
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(8,),
        in_specs=[pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + [const] * 4,
        out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, L, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((L, C), jnp.bfloat16),
                        pltpu.VMEM((L, C), jnp.bfloat16)],
    )(xn, *make_weights(distinct))


def dma_in_variant(bq, distinct):
    """xn in ANY; one manual DMA into scratch per grid step (no double
    buffering of the input); output stays a block."""
    def kern(xn_hbm, wq, wk, wv, wo, o_ref, xb, kb, vb, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(xn_hbm.at[b], xb, sem)
        cp.start()
        cp.wait()
        xn = xb[...]
        kb[...] = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
        vb[...] = jax.lax.dot(xn, wv[...], preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
        body_attn(lambda i: xb[pl.ds(i * bq, bq), :], kb, vb,
                  wq, wk, wv, wo,
                  lambda i, o: o_ref.__setitem__((0, pl.ds(i * bq, bq), slice(None)), o),
                  bq)

    xn = jnp.ones((8, L, C), jnp.bfloat16) * 0.01
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(8,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [const] * 4,
        out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, L, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((L, C), jnp.bfloat16),
                        pltpu.VMEM((L, C), jnp.bfloat16),
                        pltpu.VMEM((L, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(xn, *make_weights(distinct))


def main():
    for name, fn in [
        ("block bq=128 same-w", lambda: block_variant(128, False)),
        ("block bq=128 distinct-w", lambda: block_variant(128, True)),
        ("block bq=256 distinct-w", lambda: block_variant(256, True)),
        ("dma-in bq=256 distinct-w", lambda: dma_in_variant(256, True)),
        ("dma-in bq=512 distinct-w", lambda: dma_in_variant(512, True)),
    ]:
        try:
            out = fn()
            out.block_until_ready()
            print(f"{name}: ok mean={float(jnp.mean(out.astype(jnp.float32))):.4f}",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
