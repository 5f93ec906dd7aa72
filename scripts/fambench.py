"""Per-family UNet-step ablation (current kernels): time the full step, then
with one op family stubbed to identity at trace time; the difference is that
family's integrated cost. Chained-scan timing per docs/STATE.md.

--bwd: fwd+BACKWARD ablation at the training configuration (b=1, remat=True,
impl="train", grads wrt params accumulated across the chain like grad accum)
— locates where the ~855 ms training step goes (VERDICT round-2 item 1).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mudg_tpu.nn import attention as A
from mudg_tpu.nn import functional as F
from mudg_tpu.nn import unet3d as U

BWD = "--bwd" in sys.argv
PRESET = "mdm1024" if "--preset=mdm1024" in sys.argv else "mdm512"
REMAT = True  # training-config replay policy for --bwd (see train/step.py)
CHAIN = None  # (n_long, n_short) override: at MDM1024 the default 24-chain
# is a monster executable the remote compile service chews on for >50 min;
# --chain=6,2 keeps per-variant compiles tractable (4-step delta ~= 4.9 s of
# signal vs ~2 ms run-to-run noise).
for _a in sys.argv:
    if _a.startswith("--remat="):
        _v = _a.split("=", 1)[1]
        REMAT = True if _v == "True" else _v
    if _a.startswith("--chain="):
        CHAIN = tuple(int(v) for v in _a.split("=", 1)[1].split(","))


def build():
    if PRESET == "mdm1024":
        from mudg_tpu.models import presets

        cfg = presets.get("mdm1024").unet
        hh, ww = 72, 128
    else:
        cfg = U.UNetConfig()
        hh, ww = 40, 64
    params = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16),
        jax.eval_shape(lambda k: U.init_unet(k, cfg), jax.random.PRNGKey(0)))
    b = 1 if BWD else 2
    t = 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, hh, ww, cfg.in_channels),
                          jnp.bfloat16) * 0.1
    ts = jnp.full((b,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 77 + t * 16, 1024),
                            jnp.bfloat16) * 0.1
    lab = jnp.zeros((b,), jnp.int32)
    fs = jnp.full((b,), 10, jnp.int32)
    return cfg, params, (x, ts, ctx, lab, fs)


def timed(fn, params, args, n_long=24, n_short=4):
    def chain(params, x, ts, ctx, lab, fs, n):
        def body(c, _):
            y = fn(params, c, ts, ctx, lab, fs)
            # out_channels=4 -> feed back into the first 4 input channels
            c = c.at[..., :4].add(0.01 * y)
            return c, None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    def chain_bwd(params, x, ts, ctx, lab, fs, n):
        def loss(p, c):
            y = fn(p, c, ts, ctx, lab, fs)
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        # value_and_grad over (params, input); grads accumulate in the carry
        # (same structure as the accum_steps scan in train/step.py) so every
        # dL/dW is live and the iterations chain through gc.
        def body2(carry, _):
            c, gacc = carry
            l, (gp, gc) = jax.value_and_grad(loss, argnums=(0, 1))(params, c)
            gacc = jax.tree.map(jnp.add, gacc, gp)
            c = c + 0.01 * gc.astype(c.dtype)
            return (c, gacc), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (c, gacc), _ = jax.lax.scan(body2, (x, zero), None, length=n)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree.leaves(gacc))
        return jnp.sum(c.astype(jnp.float32)) + gn

    ch = chain_bwd if BWD else chain
    if BWD:
        n_long, n_short = 8, 2
    if CHAIN:
        if len(CHAIN) == 1:
            # single-length mode: one compile per variant; dispatch overhead
            # was measured ~0 in this environment (docs/STATE.md), so
            # best(fl)/n is directly comparable across variants.
            n_long, n_short = CHAIN[0], 0
        else:
            n_long, n_short = CHAIN
    fl = jax.jit(functools.partial(ch, n=n_long))
    fs_ = None if n_short == 0 else jax.jit(functools.partial(ch, n=n_short))
    float(fl(params, *args))
    if fs_ is not None:
        float(fs_(params, *args))

    def best(f):
        out = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(params, *args))
            out.append(time.perf_counter() - t0)
        return min(out)

    if fs_ is None:
        return best(fl) / n_long
    return (best(fl) - best(fs_)) / (n_long - n_short)


def main():
    cfg, params, args = build()
    if BWD:
        fn = lambda p, x, ts, ctx, lab, fs: U.unet_apply(
            p, cfg, x, ts, ctx, c_label=lab, fs=fs, impl="train", remat=REMAT)
    else:
        fn = lambda p, x, ts, ctx, lab, fs: U.unet_apply(
            p, cfg, x, ts, ctx, c_label=lab, fs=fs)

    base = timed(fn, params, args)
    print(f"full step: {base*1e3:7.2f} ms", flush=True)

    saved = {}

    def stub(mod, name, repl):
        saved[(mod, name)] = getattr(mod, name)
        setattr(mod, name, repl)

    def restore():
        for (mod, name), v in saved.items():
            setattr(mod, name, v)
        saved.clear()

    variants = {
        "spatial_transformer": lambda: stub(
            A, "spatial_transformer",
            lambda p, x, context=None, **kw: x),
        "temporal_transformer": lambda: stub(
            A, "temporal_transformer", lambda p, x, context=None, **kw: x),
        "feed_forward_block": lambda: stub(
            A, "feed_forward_block", lambda pf, pn, x, impl="auto": x),
        "temporal_conv": lambda: stub(
            U, "temporal_conv_block",
            lambda *a, **k: a[1]) if hasattr(U, "temporal_conv_block") else None,
        # attention CORES only (projections kept); scalar-mean keeps v in the
        # graph without shape coupling (cross-attn Lk != Lq, image-KV splits)
        "attend": lambda: stub(
            A, "attend", lambda q, k, v, **kw: q + 0.0 * jnp.mean(v)),
    }
    for name, do in variants.items():
        try:
            r = do()
            if r is None and not saved:
                print(f"-{name}: (no hook)", flush=True)
                continue
            t = timed(fn, params, args)
            print(f"-{name}: {t*1e3:7.2f} ms  (family ~{(base-t)*1e3:6.2f} ms)",
                  flush=True)
        except Exception as e:
            print(f"-{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        finally:
            restore()


if __name__ == "__main__":
    main()
