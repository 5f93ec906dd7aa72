"""Overfit-convergence proof: the training loop LEARNS (VERDICT r4 item 2).

The reference's de-facto learning test is training with periodic sampling
(main/callbacks.py:15-101, ddpm3d.py:741-788). This script is the rebuild's
equivalent, executable without real weights or real data: build a tiny
synthetic scene with STRUCTURED content (smooth gradients + a moving
square — learnable, unlike pure noise), train the tiny preset on it through
the REAL train-mdm app (single-task color recipe, --use_ema --sample_every),
then score DDIM samples from the random init / midpoint / final checkpoints
against the GT clip.

Success = train loss descends AND sample-vs-GT PSNR rises monotonically
across init -> mid -> final. Results recorded in docs/STATE.md.

Usage: python scripts/overfit.py [--steps 300] [--lr 5e-4] [--out DIR]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_scene(root: str, n_frames=4, h=64, w=96):
    """Structured synthetic scene: a vertical color gradient background with
    a bright square translating left->right across frames; sparse = the
    dense frame through a dot mask (splat-like); depth = a smooth ramp."""
    import cv2

    cam = "camera_FRONT"
    img_dir = os.path.join(root, "images", cam)
    sp_dir = os.path.join(root, "sparse", cam)
    dp_dir = os.path.join(root, "depth", cam)
    for d in (img_dir, sp_dir, dp_dir):
        os.makedirs(d, exist_ok=True)

    yy = np.linspace(0, 1, h)[:, None, None]
    xx = np.linspace(0, 1, w)[None, :, None]
    mask = np.zeros((h, w, 1), np.float32)
    mask[::4, ::4] = 1.0  # every-4th-pixel dot mask (sparse splat analog)
    for i in range(n_frames):
        img = np.concatenate(
            [0.8 * yy + 0 * xx, 0.2 + 0.6 * xx + 0 * yy,
             0.5 + 0.3 * np.sin(6.28 * (yy + xx))], axis=-1)
        x0 = int((i / max(n_frames - 1, 1)) * (w - 24))
        img[20:44, x0:x0 + 24] = [0.95, 0.9, 0.1]
        u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i:08d}.jpg"), u8[:, :, ::-1])
        sp = (u8.astype(np.float32) * mask).astype(np.uint8)
        # same filename as the dense frame (WaymoDataset._paths reuses it)
        cv2.imwrite(os.path.join(sp_dir, f"{i:08d}.jpg"), sp[:, :, ::-1])
        depth = (10 + 40 * yy[:, :, 0] + 5 * i).astype(np.float32)
        np.save(os.path.join(dp_dir, f"{i:08d}.npy"), depth * mask[:, :, 0])

    item = {
        "frames": [f"{i:08d}.jpg" for i in range(n_frames)],
        "dense_color_base": img_dir,
        "sparse_color_base": sp_dir,
        "sparse_depth_base": dp_dir,
    }
    return item


def sample_psnr(params, cfg, ds, tokenizer, gt, steps=25, seed=7):
    """DDIM-sample the color task from the item's conditions; PSNR vs GT."""
    import jax
    import jax.numpy as jnp

    from mudg_tpu.models import mdm as M
    from mudg_tpu.utils import metrics as MT

    it = ds.load_item(0, task="color")
    out = M.sample(
        params, cfg, jax.random.PRNGKey(seed),
        sparse_frames=jnp.asarray(it["sparse_frames"])[None],
        sparse_depth=jnp.asarray(it["sparse_depth"])[None],
        tokens=jnp.asarray(tokenizer([it["caption"]])),
        null_tokens=jnp.asarray(tokenizer([""])[0]),
        class_label=jnp.asarray([it["class_label"]]),
        num_steps=steps, guidance_scale=7.5, guidance_rescale=0.7,
    )
    return MT.psnr(np.asarray(out[0]), gt)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--out", default="/tmp/overfit_run")
    ap.add_argument("--sample_steps", type=int, default=25)
    args = ap.parse_args(argv)

    import jax

    from mudg_tpu.apps import train_mdm
    from mudg_tpu.conditioning.tokenizer import default_tokenizer
    from mudg_tpu.data.waymo import WaymoDataset, write_items
    from mudg_tpu.models import mdm as M
    from mudg_tpu.models import presets
    from mudg_tpu.train import checkpoint as C
    from mudg_tpu.train.step import split_params

    scene = os.path.join(args.out, "scene")
    os.makedirs(scene, exist_ok=True)
    item = build_scene(scene, h=args.height, w=args.width)
    items_path = os.path.join(args.out, "items.txt")
    write_items(items_path, [item] * 8)

    res = (args.height, args.width)
    cfg = presets.get("tiny")
    tokenizer = default_tokenizer(None)
    ds = WaymoDataset(items_path, video_length=4, resolution=res,
                      train_labels=("color",))
    gt = ds.load_item(0, task="color")["dense_frames"]

    mid = args.steps // 2
    run_dir = os.path.join(args.out, "run")

    # random-init baseline sample (what the app starts from, same seed)
    seed = 20230211
    params0 = M.init_mdm(jax.random.PRNGKey(seed), cfg)
    p0 = sample_psnr(params0, cfg, ds, tokenizer, gt, steps=args.sample_steps)
    print(json.dumps({"phase": "init", "sample_psnr_db": round(p0, 2)}),
          flush=True)
    del params0

    train_mdm.main([
        "--items", items_path, "--out", run_dir, "--preset", "tiny",
        "--height", str(args.height), "--width", str(args.width),
        "--video_length", "4", "--batch_size", "4", "--accum", "1",
        "--max_steps", str(args.steps), "--lr", str(args.lr),
        "--ckpt_every", str(mid), "--full_ckpt_every", "0",
        "--log_every", "10", "--seed", str(seed),
        "--train_labels", "color", "--use_ema",
        "--sample_every", str(mid),
    ])

    recs = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    losses = [(r["step"], r["loss"]) for r in recs if "loss" in r]
    k = max(len(losses) // 10, 1)
    first = float(np.mean([l for _, l in losses[:k]]))
    last = float(np.mean([l for _, l in losses[-k:]]))

    results = {"loss_first_window": round(first, 4),
               "loss_last_window": round(last, 4),
               "loss_curve": [(s, round(l, 4)) for s, l in losses],
               "init_sample_psnr_db": round(p0, 2)}
    for tag, name in (("mid", f"step_{mid}"), ("final", "final")):
        path = os.path.join(run_dir, name)
        if not os.path.isdir(path):
            continue
        params = C.load_pytree(path)
        p = sample_psnr(params, cfg, ds, tokenizer, gt,
                        steps=args.sample_steps)
        results[f"{tag}_sample_psnr_db"] = round(p, 2)
        del params
    print(json.dumps(results), flush=True)

    ok = (last < 0.7 * first
          and results.get("final_sample_psnr_db", -1) > p0)
    print(f"LEARNING {'VERIFIED' if ok else 'NOT DEMONSTRATED'}: "
          f"loss {first:.4f} -> {last:.4f}, sample PSNR {p0:.2f} -> "
          f"{results.get('final_sample_psnr_db')}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
