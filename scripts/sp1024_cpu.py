"""Stage-2 (MDM1024) FSDP+SP training step at REAL 576x1024 geometry on the
8-device CPU mesh — the multi-chip escape hatch for the measured single-chip
HBM wall (VERDICT r4 item 1; docs/STATE.md round 5: dots_attn needs 37.5 G
vs 15.75 G on one v5e chip).

Layout = the bs=1 production recipe from apps/train_mdm.py (--sp 8 --fsdp):
('seq',) mesh, UNet activations sequence-parallel (frames for spatial
layers, W for temporal layers — W = 128/64/32 across MDM1024's levels, all
divisible by 8), params + moments ZeRO-3-sharded over the same axis,
precomputed-latent batch (the --latents path). Per chip that is ~1/8 of the
37.5 G activation+state footprint => fits v5e-8 with room.

Phase 1 (always): jit-lower + compile the step, count the collectives in
the optimized HLO (the explicit shard_map all-to-alls at the spatial<->
temporal transitions must be present — GSPMD's annotation fallback would
show involuntary all-gathers instead).
Phase 2 (--run): execute ONE step and report the loss (finiteness = the
sharded executable actually runs end-to-end; loss parity of this exact
layout vs the replicated step is covered at dryrun geometry by
__graft_entry__.dryrun_multichip and tests/test_parallel_inference.py).

Usage: python scripts/sp1024_cpu.py [--run]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mudg_tpu.utils.cache import enable_compile_cache

enable_compile_cache(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_test_cache"))

from mudg_tpu.models import mdm as M
from mudg_tpu.models import presets
from mudg_tpu.parallel import mesh as PM
from mudg_tpu.parallel import sp as SP
from mudg_tpu.train import step as TS


def main():
    assert jax.device_count() == 8, jax.devices()
    cfg = presets.get("mdm1024")
    hh, ww, t = 576, 1024, 16

    print("# init params (bf16 fill)", flush=True)
    shapes = jax.eval_shape(lambda k: M.init_mdm(k, cfg),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16),
                          shapes)
    trainable, frozen = TS.split_params(params)

    mesh = PM.make_mesh([8], ("seq",))
    spt = SP.make_seq_sharding(mesh)
    tc = TS.TrainConfig(learning_rate=1e-5, accum_steps=1, use_ema=False,
                        temporal_frozen=True)  # the stage-2 recipe freeze
    state = TS.init_train_state(params, tc)
    state, frozen = TS.place_train_state(state, frozen, mesh, fsdp=True,
                                         axis="seq")
    gm = {
        "unet": TS.temporal_frozen_mask(cfg.unet, state.params["unet"]),
        "image_proj": jax.tree.map(lambda _: True,
                                   state.params["image_proj"]),
    }

    batch = {
        "dense_moments": jnp.ones((1, t, hh // 8, ww // 8, 8), jnp.float32),
        "sparse_moments": jnp.ones((1, t, hh // 8, ww // 8, 8), jnp.float32),
        "depth_moments": jnp.ones((1, t, hh // 8, ww // 8, 8), jnp.float32),
        "sparse_frame0": jnp.zeros((1, hh, ww, 3), jnp.float32),
        "tokens": jnp.zeros((1, 77), jnp.int32),
        "class_label": jnp.zeros((1,), jnp.int32),
        "fps": jnp.full((1,), 10, jnp.int32),
    }
    sched_arrays = M.schedule_arrays(cfg.schedule())
    step = TS.make_train_step(cfg, tc, frozen, sched_arrays,
                              jnp.zeros((77,), jnp.int32), grad_mask=gm,
                              impl="xla", remat="dots_attn", donate=False,
                              sp=spt)

    # Phase 1: compile + HLO collective census
    print("# lowering + compiling (remote compile service; minutes)",
          flush=True)
    t0 = time.perf_counter()

    def whole(s, b, k):
        ns, m = step(s, b, k)
        # param checksum keeps the optimizer update live (loss alone would
        # let XLA DCE the whole backward+update)
        ck = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                 for l in jax.tree.leaves(ns.params))
        return m["loss"], ck

    lowered = jax.jit(whole).lower(state, batch, jax.random.PRNGKey(0))
    compiled = lowered.compile()
    hlo = compiled.as_text()
    n_a2a = hlo.count("all-to-all")
    n_ag = hlo.count("all-gather")
    n_rs = hlo.count("reduce-scatter")
    print(f"compiled in {time.perf_counter()-t0:.0f}s: "
          f"all-to-all x{n_a2a}, all-gather x{n_ag}, "
          f"reduce-scatter x{n_rs}", flush=True)
    assert n_a2a > 0, "no all-to-alls: SP transitions fell to annotation mode"

    if "--run" in sys.argv:
        t0 = time.perf_counter()
        loss, _ = compiled(state, batch, jax.random.PRNGKey(0))
        loss = float(loss)
        print(f"one FSDP+SP step at 576x1024: loss={loss:.4f} "
              f"({time.perf_counter()-t0:.0f}s on the 1-core host)",
              flush=True)
        assert jnp.isfinite(loss)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
