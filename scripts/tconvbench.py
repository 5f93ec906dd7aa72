"""Why is the 4-stage temporal conv block 9.4ms when one stage is 0.62ms?"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mudg_tpu.nn import functional as F
from mudg_tpu.nn import unet3d as U


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
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    c = 320
    pt = U._init_res(rng, c, c, 1280, True, 0.0)["temopral_conv"]
    pt = jax.tree.map(lambda a: a.astype(bf), pt)
    xv = jax.random.normal(rng, (2, 16, 40, 64, c), bf)
    convs = [("conv1", "2"), ("conv2", "3"), ("conv3", "3"), ("conv4", "3")]

    def stage(i, t):
        blk, ci = convs[i]
        return F.conv3d(pt[blk][ci], F.silu(F.group_norm(pt[blk]["0"], t)))

    for n in (1, 2, 3, 4):
        def chain_n(t, n=n):
            h = t
            for i in range(n):
                h = stage(i, h)
            return h
        sec = timed(chain_n, xv)
        print(f"{n}-stage chain        : {sec*1e3:8.3f} ms", flush=True)

    # same 4 stages but reusing stage-0 weights (rules out weight variety)
    def chain_same(t):
        h = t
        for _ in range(4):
            h = stage(0, h)
        return h
    sec = timed(chain_same, xv)
    print(f"4x same-weights chain : {sec*1e3:8.3f} ms", flush=True)

    # all-bf16 GN (no fp32 island)
    def gn_bf16(p, t):
        g = 32
        tg = t.reshape(*t.shape[:-1], g, c // g)
        mu = tg.mean(axis=(1, 2, 3, 5), keepdims=True)
        var = tg.var(axis=(1, 2, 3, 5), keepdims=True)
        tg = (tg - mu) * jax.lax.rsqrt(var + 1e-5)
        return tg.reshape(t.shape) * p["weight"].astype(t.dtype) + p["bias"].astype(t.dtype)

    def chain4_bf16(t):
        h = t
        for i in range(4):
            blk, ci = convs[i]
            h = F.conv3d(pt[blk][ci], F.silu(gn_bf16(pt[blk]["0"], h)))
        return h
    sec = timed(chain4_bf16, xv)
    print(f"4-stage bf16-GN chain : {sec*1e3:8.3f} ms", flush=True)

    # 4 convs, no GN/silu at all
    def chain4_conv(t):
        h = t
        for i in range(4):
            blk, ci = convs[i]
            h = F.conv3d(pt[blk][ci], h)
        return h
    sec = timed(chain4_conv, xv)
    print(f"4 conv3d only         : {sec*1e3:8.3f} ms", flush=True)

    # 4 x (GN+silu) no convs
    def chain4_gn(t):
        h = t
        for i in range(4):
            blk, _ = convs[i]
            h = F.silu(F.group_norm(pt[blk]["0"], h))
        return h
    sec = timed(chain4_gn, xv)
    print(f"4 x GN+silu only      : {sec*1e3:8.3f} ms", flush=True)

    # flattened layout: (B*T, H, W, C) conv2d equivalents can't do temporal;
    # but check the same chain on 4-D GN (2*16,40,64,320) for layout effect
    x4 = xv.reshape(32, 40, 64, c)
    p2 = U._init_res(jax.random.PRNGKey(1), c, c, 1280, False, 0.0)

    def chain4_2d(t):
        h = t
        for i in range(4):
            blk, ci = convs[i]
            h = F.conv2d({"weight": pt[blk][ci]["weight"][0],
                          "bias": pt[blk][ci].get("bias")}, F.silu(F.group_norm(pt[blk]["0"], h)))
        return h
    sec = timed(chain4_2d, x4)
    print(f"4-stage 2d(1x1ified)  : {sec*1e3:8.3f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
