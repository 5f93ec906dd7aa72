"""Dissect the ds1 resblock's 12.9ms (opbench) vs ~4.5ms sum-of-parts."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mudg_tpu.nn import functional as F
from mudg_tpu.nn import unet3d as U

PEAK = 197e12


def timed(fn, x, n_long=64, n_short=8):
    def chain(x, n):
        def body(c, _):
            return fn(c), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    fl = jax.jit(lambda x: chain(x, n_long))
    fs = jax.jit(lambda x: chain(x, n_short))
    jax.block_until_ready(fl(x))
    jax.block_until_ready(fs(x))

    def best(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fl) - best(fs)) / (n_long - n_short)


def main():
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    c = 320
    p = U._init_res(rng, c, c, 1280, True, 0.0)
    p = jax.tree.map(lambda a: a.astype(bf), p)
    emb = jax.random.normal(rng, (32, 1280), bf)
    x = jax.random.normal(rng, (32, 40, 64, c), bf)
    xv = jax.random.normal(rng, (2, 16, 40, 64, c), bf)

    sec = timed(lambda t: U.resblock(p, t, emb, batch_size=2), x)
    print(f"resblock full          : {sec*1e3:8.3f} ms", flush=True)

    p2 = {k: v for k, v in p.items() if k != "temopral_conv"}
    sec = timed(lambda t: U.resblock(p2, t, emb, batch_size=None), x)
    print(f"resblock no-tconv      : {sec*1e3:8.3f} ms", flush=True)

    pt = p["temopral_conv"]
    sec = timed(lambda t: U.temporal_conv_block(pt, t), xv)
    print(f"tconv block (B,T,...)  : {sec*1e3:8.3f} ms", flush=True)

    def res_then_t(t):
        h = U.resblock(p2, t, emb, batch_size=None)
        hv = h.reshape(2, 16, 40, 64, c)
        hv = U.temporal_conv_block(pt, hv)
        return hv.reshape(32, 40, 64, c)

    sec = timed(res_then_t, x)
    print(f"res+reshape+tconv      : {sec*1e3:8.3f} ms", flush=True)

    # single GN->SiLU->conv3d stage
    sec = timed(lambda t: F.conv3d(pt["conv1"]["2"], F.silu(F.group_norm(pt["conv1"]["0"], t))), xv)
    print(f"GN+SiLU+conv3d x1      : {sec*1e3:8.3f} ms", flush=True)

    # conv3d alone at (2,16,40,64,320)
    sec = timed(lambda t: F.conv3d(pt["conv1"]["2"], t), xv)
    print(f"conv3d alone           : {sec*1e3:8.3f} ms", flush=True)

    # GN alone on the 5-D tensor
    sec = timed(lambda t: F.group_norm(pt["conv1"]["0"], t).astype(t.dtype), xv)
    print(f"GN alone 5-D           : {sec*1e3:8.3f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
