"""Serving daemon: warm-model multi-request inference over a spool directory.

Production counterpart of one-shot render_infer: the checkpoint is loaded and
the 3-task guided sampler jitted ONCE, then requests stream through with zero
reload/recompile cost (the reference re-launches virtual_pose_render.py per
scene, paying model load + first-call compile every time).

Protocol (filesystem spool — works on any shared filesystem, no server deps):
  * a request is a JSON file dropped into --spool:
        {"items": "<item-list path>", "out": "<output dir>",
         "prompt"?: str, "seed"?: int, "max_windows"?: int,
         "task_serial"?: bool}
  * requests are processed oldest-first; while one is in flight it is renamed
    to <name>.active (also makes concurrent daemons on a shared spool safe);
  * on success it becomes <name>.done holding {'windows', 'seconds'};
    on failure <name>.err holding the traceback. Outputs are written exactly
    like render_infer (per-task frames, depth .npy, compare mp4s).

Model/sampler flags (preset, ckpt, steps, size, quantize, ...) are fixed for
the daemon's lifetime — per-request knobs are only the ones that don't force
a recompile (prompt/seed/items/out/max_windows/task_serial*).
  (*task_serial batches per task: its batch-1 shape compiles separately once.)

Usage:
    python -m mudg_tpu serve --spool requests/ --preset mdm512 --ckpt m.ckpt
"""
from __future__ import annotations

import argparse
import json
import os
import time
import traceback

from .render_infer import (TASKS, build_sampler, load_params, make_sp,
                           prepare_serving_params, render_items)


def process_request(req, params, sample_fn, tokenizer, *, video_length,
                    resolution, fps, default_prompt):
    import jax.numpy as jnp

    from ..data.waymo import read_items

    items = read_items(req["items"])
    prompt = req.get("prompt", default_prompt)
    tokens = jnp.asarray(tokenizer([prompt] * len(TASKS)))
    null_tokens = jnp.asarray(tokenizer([""])[0])
    return render_items(
        params, sample_fn, items, req["out"],
        tokens=tokens, null_tokens=null_tokens, video_length=video_length,
        resolution=resolution, task_serial=bool(req.get("task_serial")),
        fps=fps, max_windows=req.get("max_windows"),
        seed=int(req.get("seed", 123)),
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--spool", required=True, help="request spool directory")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--bpe", default=None)
    p.add_argument("--preset", default="mdm512")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--cfg_img", type=float, default=None)
    p.add_argument("--multiple_cond_cfg", action="store_true")
    p.add_argument("--guidance_rescale", type=float, default=0.7)
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--timestep_spacing", default="uniform_trailing")
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--prompt", default="A photo a of driving scene.")
    p.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    p.add_argument("--quantize", default="none",
                   choices=("none", "int8", "int8-conv", "int8-conv-wide",
                            "int8-weights"))
    p.add_argument("--quantize_min_size", type=int, default=None,
                   help="min weight elements to quantize (see render_infer "
                        "--quantize_min_size; 200000 = v5e MFU-aware policy)")
    p.add_argument("--seq_parallel", action="store_true",
                   help="shard each clip's sampling over all devices "
                        "(parallel/sp.py; same flag as render_infer). "
                        "Ignored on a single device.")
    p.add_argument("--base_scale", type=float, default=None)
    p.add_argument("--sampler", default="ddim", choices=("ddim", "dpmpp"))
    p.add_argument("--poll", type=float, default=2.0,
                   help="spool scan interval (seconds)")
    p.add_argument("--max_requests", type=int, default=None,
                   help="exit after N requests (tests / batch drains)")
    p.add_argument("--exit_when_empty", action="store_true",
                   help="exit once the spool is empty instead of polling")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..conditioning.tokenizer import default_tokenizer
    from ..models import presets

    cfg = presets.get(args.preset)
    if args.base_scale is not None:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, base_scale=args.base_scale)
    params = load_params(args, cfg)
    sp, impl = make_sp(args.seq_parallel)
    params = prepare_serving_params(params, args.quantize, sp,
                                    min_size=args.quantize_min_size)
    tokenizer = default_tokenizer(args.bpe, require_real=bool(args.ckpt))
    sample_fn = build_sampler(
        cfg, steps=args.steps, cfg_scale=args.cfg_scale, cfg_img=args.cfg_img,
        multiple_cond_cfg=args.multiple_cond_cfg,
        guidance_rescale=args.guidance_rescale, eta=args.eta,
        timestep_spacing=args.timestep_spacing, fps=args.fps,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        impl=impl, sp=sp, sampler=args.sampler,
    )

    os.makedirs(args.spool, exist_ok=True)
    print(f"serve: watching {args.spool} (poll {args.poll}s)", flush=True)
    n_done = 0
    while True:
        pending = sorted(
            (f for f in os.listdir(args.spool) if f.endswith(".json")),
            key=lambda f: os.path.getmtime(os.path.join(args.spool, f)),
        )
        if not pending:
            if args.exit_when_empty or (
                args.max_requests and n_done >= args.max_requests
            ):
                break
            time.sleep(args.poll)
            continue
        name = pending[0]
        path = os.path.join(args.spool, name)
        active = path[: -len(".json")] + ".active"
        try:  # claim atomically; a concurrent daemon may have taken it
            os.rename(path, active)
        except OSError:
            continue
        t0 = time.time()
        try:
            req = json.load(open(active))
            metrics = process_request(
                req, params, sample_fn, tokenizer,
                video_length=args.video_length,
                resolution=(args.height, args.width), fps=args.fps,
                default_prompt=args.prompt,
            )
            metrics["request"] = name
            with open(active[: -len(".active")] + ".done", "w") as f:
                json.dump(metrics, f)
            print(f"serve: {name} done in {time.time()-t0:.1f}s", flush=True)
        except Exception:
            with open(active[: -len(".active")] + ".err", "w") as f:
                f.write(traceback.format_exc())
            print(f"serve: {name} FAILED", flush=True)
        finally:
            if os.path.exists(active):
                os.remove(active)
        n_done += 1
        if args.max_requests and n_done >= args.max_requests:
            break
    print(f"serve: exiting after {n_done} requests", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
