"""Per-op TPU efficiency survey for the MDM512 UNet hot shapes.

Methodology (docs/STATE.md): per-call timings lie through the axon tunnel, so
each op is chained N times inside ONE lax.scan executable (output feeds
input), and the per-iteration time is the difference between a long and a
short chain, measured within one process.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/opbench.py
Emits one line per op: name, ms/iter, GFLOP, TFLOP/s, %peak(197 bf16).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16


def timed(fn, x, n_long=64, n_short=8, reps=3):
    """Returns seconds per iteration of fn via chained-scan differencing."""

    def chain(x, n):
        def body(c, _):
            return fn(c), None

        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    f_long = jax.jit(lambda x: chain(x, n_long))
    f_short = jax.jit(lambda x: chain(x, n_short))
    # compile
    jax.block_until_ready(f_long(x))
    jax.block_until_ready(f_short(x))

    def best(f, x):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tl = best(f_long, x)
    ts_ = best(f_short, x)
    return (tl - ts_) / (n_long - n_short)


def report(name, sec, flops):
    tfs = flops / sec / 1e12
    print(
        f"{name:48s} {sec*1e3:8.3f} ms  {flops/1e9:9.2f} GF"
        f"  {tfs:7.1f} TF/s  {100*tfs*1e12/PEAK:5.1f}%",
        flush=True,
    )


def main():
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    # ---- plain matmuls at UNet shapes (y must keep x's shape: use square) --
    for m, k in [(81920, 320), (81920, 384), (81920, 512),
                 (20480, 640), (5120, 1280), (81920, 256)]:
        w = jax.random.normal(rng, (k, k), bf) * 0.01
        x = jax.random.normal(rng, (m, k), bf)
        sec = timed(lambda c: (c @ w), x)
        report(f"matmul ({m}x{k})@({k}x{k})", sec, 2 * m * k * k)

    # FF shape: C -> 8C -> C (GEGLU-ish round trip keeps shape)
    for m, c in [(81920, 320), (20480, 640)]:
        w1 = jax.random.normal(rng, (c, 8 * c), bf) * 0.01
        w2 = jax.random.normal(rng, (4 * c, c), bf) * 0.01
        x = jax.random.normal(rng, (m, c), bf)

        def ff(h):
            u = h @ w1
            a, g = jnp.split(u, 2, axis=-1)
            u = a * jax.nn.gelu(g, approximate=False)
            return u @ w2

        sec = timed(ff, x)
        report(f"GEGLU-FF ({m}x{c})", sec, 2 * m * (8 * c * c + 4 * c * c))

    # ---- conv 3x3 at resblock shapes --------------------------------------
    for n, h, w_, c in [(32, 40, 64, 320), (32, 40, 64, 384),
                        (32, 20, 32, 640), (32, 10, 16, 1280)]:
        wt = jax.random.normal(rng, (3, 3, c, c), bf) * 0.01
        x = jax.random.normal(rng, (n, h, w_, c), bf)

        def conv(t):
            return jax.lax.conv_general_dilated(
                t, wt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        sec = timed(conv, x)
        report(f"conv3x3 ({n},{h},{w_},{c})", sec, 2 * n * h * w_ * 9 * c * c)

    # GN+SiLU+conv chain (fusion probe) at ds1
    c = 320
    wt = jax.random.normal(rng, (3, 3, c, c), bf) * 0.01
    gnw = jnp.ones((c,), jnp.float32)
    gnb = jnp.zeros((c,), jnp.float32)
    x = jax.random.normal(rng, (32, 40, 64, c), bf)

    def gn(t):
        tf32 = t.astype(jnp.float32)
        tg = tf32.reshape(*tf32.shape[:-1], 32, c // 32)
        mu = tg.mean(axis=(1, 2, 4), keepdims=True)
        var = tg.var(axis=(1, 2, 4), keepdims=True)
        tg = (tg - mu) * jax.lax.rsqrt(var + 1e-5)
        tf32 = tg.reshape(tf32.shape) * gnw + gnb
        return tf32.astype(t.dtype)

    def chain_op(t):
        return jax.lax.conv_general_dilated(
            jax.nn.silu(gn(t)), wt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    sec = timed(chain_op, x)
    report("GN+SiLU+conv3x3 (32,40,64,320)", sec, 2 * 32 * 40 * 64 * 9 * c * c)
    sec = timed(gn, x)
    report("GN alone (32,40,64,320) [bandwidth]", sec, 1)

    # temporal conv (3,1,1) at ds1: (B=2,T=16,40,64,320)
    wt3 = jax.random.normal(rng, (3, 1, 1, c, c), bf) * 0.01
    xv = jax.random.normal(rng, (2, 16, 40, 64, c), bf)

    def tconv(t):
        return jax.lax.conv_general_dilated(
            t, wt3, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    sec = timed(tconv, xv)
    report("tconv311 (2,16,40,64,320)", sec, 2 * 2 * 16 * 40 * 64 * 3 * c * c)

    # temporal conv reformulated as matmul over shifted stack
    def tconv_mm(t):
        w2d = wt3.reshape(3 * c, c)
        tm = jnp.concatenate(
            [jnp.pad(t[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))),
             t,
             jnp.pad(t[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))],
            axis=-1,
        )
        return tm @ w2d

    sec = timed(tconv_mm, xv)
    report("tconv311-as-matmul (2,16,40,64,320)", sec, 2 * 2 * 16 * 40 * 64 * 3 * c * c)

    # ---- attention cores ---------------------------------------------------
    from mudg_tpu.kernels.flash_attention import flash_attention

    for (b, s, hh, d) in [(32, 2560, 5, 64), (32, 640, 10, 64)]:
        q = jax.random.normal(rng, (b, s, hh, d), bf) * 0.1
        flops = 2 * b * hh * (2 * s * s * d)

        def dense(q):
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, q,
                                preferred_element_type=jnp.float32) * (d ** -0.5)
            p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", p, q)

        sec = timed(dense, q)
        report(f"dense-attn (b{b} s{s} h{hh} d{d})", sec, flops)

        def flash(q):
            return flash_attention(q, q, q)

        sec = timed(flash, q)
        report(f"flash-attn (b{b} s{s} h{hh} d{d})", sec, flops)

    # temporal attention core (tiny T)
    b, s, hh, d = 5120, 16, 5, 64
    q = jax.random.normal(rng, (b, s, hh, d), bf) * 0.1

    def dense_t(q):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, q,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, q)

    sec = timed(dense_t, q)
    report(f"dense-attn temporal (b{b} s{s} h{hh} d{d})", sec,
           2 * b * hh * 2 * s * s * d)

    # cross-attn core: S=2560 queries, 93 KV tokens
    b, s, sk, hh, d = 32, 2560, 93, 5, 64
    k = jax.random.normal(rng, (b, sk, hh, d), bf) * 0.1
    q = jax.random.normal(rng, (b, s, hh, d), bf) * 0.1

    def cross(q):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, k)

    sec = timed(cross, q)
    report(f"cross-attn core (s{s} kv{sk})", sec, 2 * b * hh * 2 * s * sk * d)

    # ---- full blocks at ds1 ------------------------------------------------
    from mudg_tpu.nn import attention as A
    from mudg_tpu.nn import unet3d as U

    p_sp = A.init_spatial_transformer(
        rng, 320, heads=5, dim_head=64, context_dim=1024, image_cross=True
    )
    p_sp = jax.tree.map(lambda a: a.astype(bf), p_sp)
    ctx = jax.random.normal(rng, (32, 93, 1024), bf) * 0.02
    xs = jax.random.normal(rng, (32, 40, 64, 320), bf)

    def sp(t):
        return A.spatial_transformer(p_sp, t, ctx, heads=5, image_cross=True)

    sec = timed(sp, xs)
    # rough flop count: qkvo self (4) + q+out cross (2) + kv cross small +
    # ip kv + ff 12C^2 per token + attn cores
    tok = 32 * 2560
    flops = 2 * tok * (4 * 320 * 320 + 2 * 320 * 320 + 12 * 320 * 320 + 2 * 320 * 320) \
        + 2 * 32 * 5 * 2 * 2560 * 2560 * 64 + 2 * 32 * 5 * 2 * 2560 * 109 * 64 \
        + 2 * 32 * 93 * (4 * 1024 * 320)
    report("spatial_transformer ds1 (full)", sec, flops)

    p_res = U._init_res(rng, 320, 320, 1280, True, 0.0)
    p_res = jax.tree.map(lambda a: a.astype(bf), p_res)
    emb = jax.random.normal(rng, (32, 1280), bf)

    def res(t):
        return U.resblock(p_res, t, emb, batch_size=2)

    sec = timed(res, xs)
    flops = 2 * 32 * 40 * 64 * (2 * 9 * 320 * 320 + 4 * 3 * 320 * 320)
    report("resblock+tconv ds1 (full)", sec, flops)

    print("done", flush=True)


if __name__ == "__main__":
    main()
