"""Analytic per-family FLOP map of the UNet forward (MFU accounting input).

Walks the jaxpr of unet_apply (impl="xla", so every op is a plain
dot_general/conv) and counts matmul/conv FLOPs; per-family numbers come from
re-tracing with one family stubbed to identity (same trick as
scripts/fambench.py) and differencing. Trace-only — no compiles — so this
runs anywhere; pair the FLOPs with the measured per-family ms from
fambench.py on TPU to get achieved TF/s per family.

Run: PYTHONPATH=/root/repo python scripts/flopmap.py [--preset=mdm1024]
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.extend import core as jex_core

from mudg_tpu.nn import attention as A
from mudg_tpu.nn import functional as F
from mudg_tpu.nn import unet3d as U

PRESET = "mdm1024" if "--preset=mdm1024" in sys.argv else "mdm512"


def _dot_flops(eqn):
    ((lc, rc), _batch) = eqn.params["dimension_numbers"]
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    bdims = eqn.params["dimension_numbers"][1][0]
    m = np.prod([d for i, d in enumerate(a.shape)
                 if i not in lc and i not in bdims], initial=1)
    k = np.prod([a.shape[i] for i in lc], initial=1)
    n = np.prod([d for i, d in enumerate(b.shape)
                 if i not in rc and i not in eqn.params["dimension_numbers"][1][1]],
                initial=1)
    batch = np.prod([a.shape[i] for i in bdims], initial=1)
    return 2.0 * batch * m * n * k


def _conv_flops(eqn):
    # 2 * out_elems * window * (Cin/groups); rhs layout is (*window, in/g, out)
    out = eqn.outvars[0].aval
    w = eqn.invars[1].aval
    return 2.0 * np.prod(out.shape, initial=1) * np.prod(w.shape[:-1],
                                                         initial=1)


def count_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            total += _dot_flops(eqn)
        elif eqn.primitive.name == "conv_general_dilated":
            total += _conv_flops(eqn)
        else:
            for v in eqn.params.values():
                if isinstance(v, jex_core.ClosedJaxpr):
                    total += count_flops(v.jaxpr)
                elif isinstance(v, jex_core.Jaxpr):
                    total += count_flops(v)
                elif isinstance(v, (tuple, list)):
                    for x in v:
                        if isinstance(x, jex_core.ClosedJaxpr):
                            total += count_flops(x.jaxpr)
    return total


def main():
    if PRESET == "mdm1024":
        from mudg_tpu.models import presets

        cfg = presets.get("mdm1024").unet
        hh, ww = 72, 128
    else:
        cfg = U.UNetConfig()
        hh, ww = 40, 64
    b, t = 2, 16  # CFG batch 2 (inference)
    shapes = jax.eval_shape(lambda k: U.init_unet(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
    x = jnp.zeros((b, t, hh, ww, cfg.in_channels), jnp.bfloat16)
    ts = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, 77 + t * cfg.image_tokens_per_frame, cfg.context_dim),
                    jnp.bfloat16)
    lab = jnp.zeros((b,), jnp.int32)

    def fwd(p, x):
        return U.unet_apply(p, cfg, x, ts, ctx, c_label=lab, impl="xla")

    def total():
        # make_jaxpr hits the tracing cache for an already-seen function
        # object + avals, which would silently ignore the stubs below
        jax.clear_caches()
        return count_flops(jax.make_jaxpr(fwd)(params, x).jaxpr)

    base = total()
    print(f"# {PRESET} CFG-batch {b}, {hh}x{ww} latents, T={t}")
    print(f"total matmul+conv FLOPs/call: {base/1e12:.3f} TF")

    saved = {}

    def stub(mod, name, repl):
        saved[(mod, name)] = getattr(mod, name)
        setattr(mod, name, repl)

    def restore():
        for (m, n), v in saved.items():
            setattr(m, n, v)
        saved.clear()

    variants = {
        "spatial_txf": lambda: stub(A, "spatial_transformer",
                                    lambda p, x, context=None, **kw: x),
        "temporal_txf": lambda: stub(A, "temporal_transformer",
                                     lambda p, x, context=None, **kw: x),
        "ff_geglu": lambda: stub(A, "feed_forward_block",
                                 lambda pf, pn, x, impl="auto": x),
        "attend_cores": lambda: stub(
            A, "attend", lambda q, k, v, **kw: q + 0.0 * jnp.mean(v)),
        "tconv": lambda: stub(U, "temporal_conv_block",
                              lambda p, x, **kw: x),
    }
    for name, do in variants.items():
        do()
        f = base - total()
        restore()
        print(f"{name:13s}: {f/1e12:7.3f} TF ({f/base*100:5.1f}%)")
    print(f"{'resblock+rest':13s}: (remainder)")


if __name__ == "__main__":
    main()
