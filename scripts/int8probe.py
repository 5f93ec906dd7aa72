"""Probe: does int8 quantized matmul beat bf16 on v5e at the UNet hot shapes?

v5e peak: 197 TF/s bf16, 394 TOP/s int8. The ds1 matmuls are bandwidth-bound
(60% MFU at M=81920 K=N=320) so int8 halves traffic; ds4 matmuls are
compute-bound (98%) so int8 doubles MXU rate. This measures the REALISTIC
end-to-end op: dynamic per-row activation quantization + pre-quantized
weights + int8 MXU dot + dequant back to bf16 (including all quant overhead).

Methodology: chained-scan differencing (docs/STATE.md), one process.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/int8probe.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12


def timed(fn, x, n_long=64, n_short=8, reps=3):
    def chain(x, n):
        def body(c, _):
            return fn(c), None

        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    f_long = jax.jit(lambda x: chain(x, n_long))
    f_short = jax.jit(lambda x: chain(x, n_short))
    jax.block_until_ready(f_long(x))
    jax.block_until_ready(f_short(x))
    # force real device sync (tunnel can return early from block_until_ready)
    float(jnp.sum(f_long(x).astype(jnp.float32)))

    def best(f, x):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            y = f(x)
            float(jnp.sum(y.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tl = best(f_long, x)
    ts_ = best(f_short, x)
    return (tl - ts_) / (n_long - n_short)


def report(name, sec, flops):
    tfs = flops / sec / 1e12
    print(
        f"{name:52s} {sec*1e3:8.3f} ms  {tfs:7.1f} TF/s  "
        f"{100*tfs*1e12/PEAK_BF16:5.1f}% bf16-peak",
        flush=True,
    )


def main():
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    shapes = [(81920, 320), (81920, 512), (20480, 640), (5120, 1280)]
    for m, k in shapes:
        w = jax.random.normal(rng, (k, k), bf) * 0.02
        x = jax.random.normal(rng, (m, k), bf)
        flops = 2 * m * k * k

        # baseline bf16
        sec = timed(lambda c: c @ w, x)
        report(f"bf16   ({m}x{k})@({k}x{k})", sec, flops)

        # weight-only int8: w stored int8, dequant fused into the matmul read
        wscale = (jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0)
        w_i8 = jnp.clip(
            jnp.round(w.astype(jnp.float32) / wscale), -127, 127
        ).astype(jnp.int8)

        def wonly(c):
            wd = w_i8.astype(bf) * wscale.astype(bf)
            return c @ wd

        sec = timed(wonly, x)
        report(f"w-int8 ({m}x{k})@({k}x{k})", sec, flops)

        # full dynamic int8: per-row act absmax quant, int8 dot -> int32,
        # rescale to bf16
        def dyn(c):
            amax = jnp.max(jnp.abs(c), axis=-1, keepdims=True).astype(jnp.float32)
            xs = (127.0 / jnp.maximum(amax, 1e-6))
            xi = jnp.clip(
                jnp.round(c.astype(jnp.float32) * xs), -127, 127
            ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xi, w_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (
                acc.astype(jnp.float32) * (wscale[None, :] / xs)
            ).astype(bf)

        sec = timed(dyn, x)
        report(f"dyn-i8 ({m}x{k})@({k}x{k})", sec, flops)

        # pure int8 dot core (upper bound, no quant overhead): chain via
        # taking int8 of the int32 accum (keeps shapes)
        xi0 = jnp.clip(jnp.round(x.astype(jnp.float32) * 4), -127, 127).astype(
            jnp.int8
        )

        def core(c):
            acc = jax.lax.dot_general(
                c, w_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc >> 7).astype(jnp.int8)

        sec = timed(core, xi0)
        report(f"i8core ({m}x{k})@({k}x{k})", sec, flops)
        print(flush=True)

    # conv3x3 at ds1/ds4 shapes: int8 conv support probe
    for n, h, w_, c in [(32, 40, 64, 320), (32, 10, 16, 1280)]:
        wt = jax.random.normal(rng, (3, 3, c, c), bf) * 0.02
        x = jax.random.normal(rng, (n, h, w_, c), bf)
        flops = 2 * n * h * w_ * 9 * c * c

        def conv(t):
            return jax.lax.conv_general_dilated(
                t, wt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        sec = timed(conv, x)
        report(f"bf16 conv3x3 ({n},{h},{w_},{c})", sec, flops)

        wt_i8 = jnp.clip(jnp.round(wt.astype(jnp.float32) * 50), -127, 127).astype(
            jnp.int8
        )
        xi0 = jnp.clip(jnp.round(x.astype(jnp.float32) * 4), -127, 127).astype(
            jnp.int8
        )

        def conv_i8(t):
            try:
                acc = jax.lax.conv_general_dilated(
                    t, wt_i8, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
            except Exception as e:  # pragma: no cover
                print("int8 conv unsupported:", e)
                raise
            return (acc >> 7).astype(jnp.int8)

        try:
            sec = timed(conv_i8, xi0)
            report(f"i8   conv3x3 ({n},{h},{w_},{c})", sec, flops)
        except Exception as e:
            print(f"i8 conv3x3 ({n},{h},{w_},{c}) FAILED: {type(e).__name__}: {e}",
                  flush=True)
        print(flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
