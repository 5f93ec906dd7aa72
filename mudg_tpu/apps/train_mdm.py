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


def _log_samples(args, cfg, state, frozen, batch, tokenizer, step_i):
    """ImageLogger analog (main/callbacks.py:15-101): sample the model on the
    current batch's conditions and write mp4s under out/samples/."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import mdm as M
    from ..train.step import merge_params
    from ..utils import media

    # sample under the EMA weights when available — the reference's
    # ImageLogger runs log_images inside ema_scope (ddpm3d.py:741-788)
    weights = state.params if state.ema_params is None else state.ema_params
    params = merge_params(jax.device_get(weights), jax.device_get(frozen))
    latents = "sparse_moments" in batch
    b = batch["sparse_moments" if latents else "sparse_frames"]
    if b.ndim == 6:  # accum-shaped
        b = {k: np.asarray(v[0][:1]) for k, v in batch.items()}
    else:
        b = {k: np.asarray(v[:1]) for k, v in batch.items()}
    if latents:
        # --latents batches carry posterior moments, not pixel conditions:
        # M.sample consumes them directly (posterior mode == rng-free encode)
        conds = dict(
            sparse_moments=jnp.asarray(b["sparse_moments"]),
            depth_moments=jnp.asarray(b["depth_moments"]),
            frame0=jnp.asarray(b["sparse_frame0"]),
        )
    else:
        conds = dict(
            sparse_frames=jnp.asarray(b["sparse_frames"]),
            sparse_depth=jnp.asarray(b["sparse_depth"]),
        )
    out = M.sample(
        params, cfg, jax.random.PRNGKey(step_i),
        tokens=jnp.asarray(b["tokens"]),
        null_tokens=jnp.asarray(tokenizer([""])[0]),
        class_label=jnp.asarray(b["class_label"]),
        num_steps=args.__dict__.get("sample_steps", 10),
        guidance_scale=7.5, guidance_rescale=0.7,
        **conds,
    )
    sdir = os.path.join(args.out, "samples")
    os.makedirs(sdir, exist_ok=True)
    media.save_video(
        os.path.join(sdir, f"step_{step_i}.mp4"),
        media.to_uint8(np.asarray(out[0])), fps=10,
    )


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
    p.add_argument("--full_ckpt_every", type=int, default=1000,
                   help="save the FULL train state (params + optimizer "
                        "moments + EMA) every N steps as trainstate_N — the "
                        "reference's non-deleting trainstep checkpoints "
                        "(configs/stage1 modelckpt every 1000); 0 disables. "
                        "--auto_resume prefers these over weights-only "
                        "step_N so Adam moments survive preemption")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=20230211)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--remat", default="dots_attn",
                   choices=("full", "dots_small", "dots_gn", "dots_ln",
                            "dots_attn", "convs", "dots", "names",
                            "except_ff"),
                   help="backward recompute policy (docs/STATE.md round-3 "
                        "ablation: dots_attn 727 ms vs dots_ln 732 same-"
                        "process; dots_gn 726, dots_small 742, full 839 at "
                        "MDM512 bs=1; use convs/full if activations don't "
                        "fit)")
    p.add_argument("--profile_dir", default=None, help="jax.profiler trace dir")
    p.add_argument("--val_items", default=None)
    p.add_argument("--val_every", type=int, default=2000)
    p.add_argument("--sample_every", type=int, default=0,
                   help="log sampled videos every N steps (ImageLogger analog)")
    p.add_argument("--preset", default=None, choices=(None, "mdm512", "mdm1024", "tiny"))
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the latest step_N checkpoint in --out")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3/FSDP: shard params, optimizer moments, EMA "
                        "and the frozen encoder towers over the 'data' axis "
                        "(default shards only the moments, ZeRO-2)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree: builds a 2D ('data', "
                        "'model') mesh and Megatron-shards attention/FF "
                        "weights over 'model' (parallel/tp.py; composes "
                        "with --fsdp). Forces the pure-XLA step (Pallas "
                        "kernels cannot be partitioned)")
    p.add_argument("--latents", action="store_true",
                   help="train from precomputed VAE moment caches "
                        "(`python -m mudg_tpu precompute-latents` first): "
                        "removes the frozen VAE encode from the step — "
                        "~30%% of the MDM512 bs=1 step (docs/STATE.md r4). "
                        "--sample_every works: sample logging decodes the "
                        "cached posterior moments")
    p.add_argument("--train_labels", default="color,semantic,depth",
                   help="comma list of tasks to sample (the reference's "
                        "train_label config list, waymo_data.py:342-362); "
                        "e.g. --train_labels color for single-task runs")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel degree: builds a 2D ('data', "
                        "'seq') mesh and shards the UNet ACTIVATIONS "
                        "(frames for spatial layers, W for temporal layers, "
                        "parallel/sp.py shard_map all-to-alls at the "
                        "transitions) — the per-clip HBM lever when bs=1 "
                        "activations don't fit one chip (MDM1024). With "
                        "--fsdp and no data axis left, params shard over "
                        "'seq'. Forces the pure-XLA step. Mutually "
                        "exclusive with --tp")
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
    if args.preset:
        from ..models import presets

        cfg = presets.get(args.preset)

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

    import math

    assert args.tp == 1 or args.sp == 1, "--tp and --sp are mutually exclusive"
    model_par = max(args.tp, args.sp)
    assert jax.device_count() % model_par == 0, \
        f"--tp/--sp {model_par} must divide the {jax.device_count()} devices"
    n_data = math.gcd(args.batch_size, jax.device_count() // model_par)
    tp_axis = "model" if args.tp > 1 else None
    sp_shard = None
    if args.tp > 1:
        mesh = PM.make_mesh([n_data, args.tp], ("data", "model"),
                            devices=jax.devices()[:n_data * args.tp])
        print(f"mesh: {n_data} devices on 'data' x {args.tp} on 'model' "
              f"(batch {args.batch_size})")
    elif args.sp > 1:
        from ..parallel import sp as SP

        mesh = PM.make_mesh([n_data, args.sp], ("data", "seq"),
                            devices=jax.devices()[:n_data * args.sp])
        sp_shard = SP.make_seq_sharding(
            mesh, data_axis="data" if n_data > 1 else None)
        print(f"mesh: {n_data} devices on 'data' x {args.sp} on 'seq' "
              f"(batch {args.batch_size}, sequence-parallel activations)")
    else:
        mesh = PM.make_mesh([n_data], devices=jax.devices()[:n_data])
        print(f"mesh: {n_data} devices on 'data' (batch {args.batch_size})")
    # with one clip per step there is no data axis to FSDP over — shard the
    # params over the seq group instead (FSDP+SP, the bs=1 HBM-wall layout)
    fsdp_axis = "seq" if (args.fsdp and args.sp > 1 and n_data == 1) else "data"

    trainable, frozen = TS.split_params(params)
    state = TS.init_train_state(params, tc)
    state, frozen = TS.place_train_state(state, frozen, mesh, fsdp=args.fsdp,
                                         tp_axis=tp_axis, axis=fsdp_axis)
    if args.fsdp:
        print(f"fsdp: params/moments/EMA/frozen towers sharded over "
              f"'{fsdp_axis}'")

    grad_mask = None
    if temporal_frozen:
        gm_unet = TS.temporal_frozen_mask(cfg.unet, jax.tree.map(lambda x: x, state.params["unet"]))
        grad_mask = {
            "unet": gm_unet,
            "image_proj": jax.tree.map(lambda _: True, state.params["image_proj"]),
        }

    tokenizer = default_tokenizer(args.bpe, require_real=bool(args.ckpt))
    null_tokens = jnp.asarray(tokenizer([""])[0])
    sched_arrays = M.schedule_arrays(cfg.schedule())
    train_step = TS.make_train_step(
        cfg, tc, frozen, sched_arrays, null_tokens, grad_mask=grad_mask,
        impl="xla" if (args.tp > 1 or args.sp > 1) else "train",
        remat=True if args.remat == "full" else args.remat,
        sp=sp_shard,
    )

    labels = tuple(s for s in args.train_labels.split(",") if s)
    ds = WaymoDataset(args.items, video_length=args.video_length,
                      resolution=resolution, seed=args.seed,
                      latents=args.latents, train_labels=labels)
    loader = BatchLoader(ds, args.batch_size, accum_steps=args.accum,
                         tokenizer=tokenizer, seed=args.seed)

    # validation loss fn (reference validation_step, ddpm3d.py:398-405)
    val_loader = None
    if args.val_items:
        val_ds = WaymoDataset(args.val_items, video_length=args.video_length,
                              resolution=resolution, seed=args.seed + 1,
                              latents=args.latents, train_labels=labels)
        val_loader = BatchLoader(
            val_ds, args.batch_size, accum_steps=1, tokenizer=tokenizer,
            shuffle=False,
        )

        @jax.jit
        def val_loss_fn(trainable, batch, key):
            from ..train.step import merge_params
            loss, _ = M.training_loss(
                merge_params(trainable, frozen), cfg, sched_arrays, batch, key,
                null_tokens=null_tokens, remat=False,
            )
            return loss

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, "metrics.jsonl")
    rng = jax.random.PRNGKey(args.seed)
    step_i = 0

    # --auto_resume: restore from the newest checkpoint in the workspace
    # (trainer.py:27-28 analog, actually wired). Full trainstate_N
    # checkpoints win over weights-only step_N at the same or later step —
    # they restore the Adam moments and EMA too.
    if args.auto_resume:
        def newest(prefix):
            found = sorted(
                (int(d.split("_")[1]), d) for d in os.listdir(args.out)
                if d.startswith(prefix) and d.split("_")[1].isdigit()
            )
            return found[-1] if found else (None, None)

        w_step, w_dir = newest("step_")
        f_step, f_dir = newest("trainstate_")
        if f_step is not None and (w_step is None or f_step >= w_step):
            step_i, latest = f_step, f_dir
            like = jax.device_get({"params": state.params,
                                   "opt_state": state.opt_state,
                                   "ema": state.ema_params,
                                   "step": np.zeros((), np.int32)})
            try:
                restored = C.load_pytree(os.path.join(args.out, latest), like)
            except Exception as e:
                # structure mismatch — typically --use_ema differs from the
                # saving run. Degrade to weights-only instead of a deep
                # orbax traceback.
                print(f"auto-resume: full restore of {latest} failed "
                      f"({type(e).__name__}; --use_ema flag mismatch with "
                      "the saving run?) — restoring weights only, optimizer "
                      "state reset")
                raw = C.load_pytree(os.path.join(args.out, latest))
                restored = {"params": raw["params"],
                            "opt_state": state.opt_state,
                            "ema": state.ema_params}
            state = TS.TrainState(restored["params"], restored["opt_state"],
                                  restored["ema"],
                                  jnp.asarray(step_i, jnp.int32))
        elif w_step is not None:
            step_i, latest = w_step, w_dir
            # step_N artifacts carry the frozen towers (standalone render);
            # keep only the trainable subset here
            state = state._replace(
                params=TS.split_params(
                    C.load_pytree(os.path.join(args.out, latest)))[0],
                step=jnp.asarray(step_i, jnp.int32),
            )
        if w_step is not None or f_step is not None:
            state, _ = TS.place_train_state(state, {}, mesh, fsdp=args.fsdp,
                                            tp_axis=tp_axis, axis=fsdp_axis)
            print(f"auto-resume: restored {latest} at step {step_i}")

    t0 = time.time()

    # SIGUSR1 -> checkpoint now (preemptible-cluster hook, main/trainer.py:129-137)
    import signal

    want_ckpt = {"flag": False}
    signal.signal(signal.SIGUSR1, lambda *_: want_ckpt.update(flag=True))

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
                if val_loader is not None and step_i % args.val_every == 0:
                    vlosses = []
                    for vi, vb in enumerate(val_loader):
                        if vi >= 8:
                            break
                        vb = PM.shard_batch(jax.tree.map(jnp.asarray, vb), mesh)
                        vlosses.append(float(val_loss_fn(
                            state.params, vb, jax.random.PRNGKey(vi))))
                    rec = {"step": step_i, "val_loss": float(np.mean(vlosses))}
                    print(json.dumps(rec))
                    with open(log_path, "a") as f:
                        f.write(json.dumps(rec) + "\n")
                if args.sample_every and step_i % args.sample_every == 0:
                    _log_samples(args, cfg, state, frozen, batch, tokenizer,
                                 step_i)
                # SIGUSR1 (preemption) saves BOTH artifacts — the full state
                # is the one that makes resume lossless; params are gathered
                # from the devices once and shared between the two writes.
                save_weights = want_ckpt["flag"] or step_i % args.ckpt_every == 0
                save_full = want_ckpt["flag"] or (
                    args.full_ckpt_every
                    and step_i % args.full_ckpt_every == 0)
                want_ckpt["flag"] = False
                if save_weights or save_full:
                    host_params = jax.device_get(state.params)
                if save_weights:
                    # weights-only artifacts carry the frozen towers too so
                    # render_infer can run from them standalone (the
                    # reference's Lightning .ckpt likewise contains the
                    # first/cond-stage weights, ddpm3d.py state_dict)
                    C.save_pytree(
                        os.path.join(args.out, f"step_{step_i}"),
                        TS.merge_params(host_params, jax.device_get(frozen)))
                if save_full:
                    C.save_pytree(
                        os.path.join(args.out, f"trainstate_{step_i}"),
                        {"params": host_params,
                         "opt_state": jax.device_get(state.opt_state),
                         "ema": jax.device_get(state.ema_params),
                         "step": np.asarray(step_i, np.int32)},
                    )
                if step_i >= args.max_steps:
                    break
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
    C.save_pytree(os.path.join(args.out, "final"),
                  TS.merge_params(jax.device_get(state.params),
                                  jax.device_get(frozen)))
    print("training done")


if __name__ == "__main__":
    main()
