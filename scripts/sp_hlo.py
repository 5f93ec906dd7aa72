"""Inspect the partitioned HLO of the sequence-parallel UNet at
production-divisible shapes (MDM512: BT=32, W=64/32/16 over 8 devices).

VERDICT round-2 item 3: the dryrun's tiny shapes (W=4, W=1) produced
"[SPMD] Involuntary full rematerialization" warnings — replicate-then-slice
instead of all-to-alls at the spatial<->temporal transitions. This script
checks whether that is a tiny-shape artifact or structural, by lowering a
narrow-width UNet at the REAL MDM512 sequence geometry (T=16, H=40, W=64)
and counting collectives in the optimized HLO.

Run: PYTHONPATH=/root/repo python scripts/sp_hlo.py [--explicit]
"""
import re
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mudg_tpu.nn import unet3d as U
from mudg_tpu.parallel import sp as SP


def main():
    n = 8
    mesh = Mesh(jax.devices()[:n], ("seq",))
    sp = SP.make_seq_sharding(mesh, explicit="--explicit" in sys.argv)

    # narrow width (fast CPU compile), REAL MDM512 sequence geometry
    cfg = U.UNetConfig(model_channels=32, num_head_channels=8,
                       context_dim=32, temporal_length=16)
    rng = jax.random.PRNGKey(0)
    params = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, jnp.float32),
        jax.eval_shape(lambda k: U.init_unet(k, cfg), rng))

    b, t, hh, ww = 2, 16, 40, 64
    x = jax.random.normal(rng, (b, t, hh, ww, cfg.in_channels)) * 0.1
    ts = jnp.full((b,), 500, jnp.int32)
    ctx = jax.random.normal(rng, (b, 77 + t * 16, cfg.context_dim)) * 0.1
    lab = jnp.zeros((b,), jnp.int32)
    fs = jnp.full((b,), 10, jnp.int32)

    fn = jax.jit(
        lambda p, x, ts, ctx, lab, fs: U.unet_apply(
            p, cfg, x, ts, ctx, c_label=lab, fs=fs, impl="xla", sp=sp),
    )
    print("# lowering + compiling on the 8-device CPU mesh...", flush=True)
    compiled = fn.lower(params, x, ts, ctx, lab, fs).compile()
    hlo = compiled.as_text()

    counts = {}
    for opname in ("all-to-all", "all-gather", "all-reduce",
                   "collective-permute", "dynamic-slice", "reduce-scatter"):
        counts[opname] = len(re.findall(rf"\b{opname}\b", hlo))
    print("collective counts in optimized HLO:", counts)

    # the replicate-then-slice signature: an all-gather feeding a
    # dynamic-slice on a big f32 activation
    a2a_lines = [l.strip() for l in hlo.splitlines() if "all-to-all" in l]
    print(f"\n{len(a2a_lines)} all-to-all instructions; first 6:")
    for l in a2a_lines[:6]:
        print("  ", l[:160])

    ag_lines = [l.strip() for l in hlo.splitlines()
                if re.search(r"\ball-gather\b", l) and "f32" in l]
    print(f"\n{len(ag_lines)} all-gather instructions; first 6:")
    for l in ag_lines[:6]:
        print("  ", l[:160])

    # sanity: it runs
    y = fn(params, x, ts, ctx, lab, fs)
    print("\noutput:", y.shape, float(jnp.sum(y)))


if __name__ == "__main__":
    main()
