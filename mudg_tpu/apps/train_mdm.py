"""MDM training app (stage-1 512 / stage-2 1024 fine-tuning).

Rebuild of `main/trainer.py`: loads the DynamiCrafter/MuDG torch checkpoint
with import-time surgery (conv_in 8->12, class-embed clone), builds the data
loader and the jitted data-parallel train step, runs the step loop with
periodic checkpointing and metric logging.

Usage:
    python -m mudg_tpu.apps.train_mdm --items train_items.txt --out run1/ \
        [--ckpt dynamicrafter_512.ckpt] [--stage 1|2] [--max_steps N]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--items", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default=None, help="torch .ckpt (surgery applied) or orbax dir")
    p.add_argument("--stage", type=int, default=1, choices=(1, 2))
    p.add_argument("--bpe", default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--ckpt_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=20230211)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--profile_dir", default=None, help="jax.profiler trace dir")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import mdm as M
    from ..train import step as TS
    from ..train import checkpoint as C
    from ..parallel import mesh as PM
    from ..data.waymo import WaymoDataset, BatchLoader
    from ..conditioning.tokenizer import default_tokenizer

    # stage-dependent recipe (configs/stage{1,2}-*_mdm_waymo/config.yaml)
    if args.stage == 1:
        resolution = (args.height or 320, args.width or 512)
        cfg = M.MDMConfig(base_scale=0.7)
        temporal_frozen = False
    else:
        resolution = (args.height or 576, args.width or 1024)
        cfg = M.stage2_config()
        temporal_frozen = True

    tc = TS.TrainConfig(
        learning_rate=args.lr, accum_steps=args.accum, use_ema=args.use_ema,
        temporal_frozen=temporal_frozen,
    )

    # params: torch import with surgery, orbax restore, or random init
    if args.ckpt and args.ckpt.endswith(".ckpt"):
        trees = C.load_mudg_checkpoint(
            args.ckpt, expand_conv_in=True, add_class_embed=True
        )
        params = {
            "unet": trees["unet"],
            "vae": trees["vae"],
            "image_proj": trees["image_proj"],
            "clip_text": trees["clip_text"].get("model", trees["clip_text"]),
            "clip_image": trees["clip_image"].get("model", {}).get(
                "visual", trees["clip_image"]),
        }
        params = jax.tree.map(jnp.asarray, params)
    elif args.ckpt:
        params = C.load_pytree(args.ckpt)
    else:
        print("WARNING: training from scratch (no pretrained checkpoint)")
        params = M.init_mdm(jax.random.PRNGKey(args.seed), cfg)

    mesh = PM.make_mesh()
    n_dev = mesh.shape["data"]
    print(f"mesh: {n_dev} devices on 'data'")

    trainable, frozen = TS.split_params(params)
    state = TS.init_train_state(params, tc)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = TS.TrainState(
        PM.replicate(state.params, mesh),
        PM.shard_tree_zero(state.opt_state, mesh),
        PM.replicate(state.ema_params, mesh) if state.ema_params is not None else None,
        jax.device_put(state.step, NamedSharding(mesh, P())),
    )
    frozen = PM.replicate(frozen, mesh)

    grad_mask = None
    if temporal_frozen:
        gm_unet = TS.temporal_frozen_mask(cfg.unet, jax.tree.map(lambda x: x, state.params["unet"]))
        grad_mask = {
            "unet": gm_unet,
            "image_proj": jax.tree.map(lambda _: True, state.params["image_proj"]),
        }

    tokenizer = default_tokenizer(args.bpe)
    null_tokens = jnp.asarray(tokenizer([""])[0])
    sched_arrays = M.schedule_arrays(cfg.schedule())
    train_step = TS.make_train_step(
        cfg, tc, frozen, sched_arrays, null_tokens, grad_mask=grad_mask,
    )

    ds = WaymoDataset(args.items, video_length=args.video_length,
                      resolution=resolution, seed=args.seed)
    loader = BatchLoader(ds, args.batch_size, accum_steps=args.accum,
                         tokenizer=tokenizer, seed=args.seed)

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, "metrics.jsonl")
    rng = jax.random.PRNGKey(args.seed)
    step_i = 0
    t0 = time.time()
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    try:
        while step_i < args.max_steps:
            for batch in loader:
                batch = PM.shard_batch(
                    jax.tree.map(jnp.asarray, batch), mesh
                ) if args.accum <= 1 else jax.tree.map(jnp.asarray, batch)
                rng, key = jax.random.split(rng)
                state, metrics = train_step(state, batch, key)
                step_i += 1
                if step_i % args.log_every == 0:
                    loss = float(metrics["loss"])
                    dt = (time.time() - t0) / args.log_every
                    t0 = time.time()
                    rec = {"step": step_i, "loss": loss,
                           "grad_norm": float(metrics["grad_norm"]),
                           "sec_per_step": round(dt, 3)}
                    print(json.dumps(rec))
                    with open(log_path, "a") as f:
                        f.write(json.dumps(rec) + "\n")
                if step_i % args.ckpt_every == 0:
                    C.save_pytree(
                        os.path.join(args.out, f"step_{step_i}"),
                        jax.device_get(state.params),
                    )
                if step_i >= args.max_steps:
                    break
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
    C.save_pytree(os.path.join(args.out, "final"), jax.device_get(state.params))
    print("training done")


if __name__ == "__main__":
    main()
