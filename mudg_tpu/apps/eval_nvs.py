"""Novel-view quality evaluation over the three MDM output modalities.

Wires the BASELINE quality criterion (PSNR parity with the reference) over
the `render_infer` output layout ({task}_re_{i}.png vs {task}_gt_{i}.png) or
any two directories of matching PNG frames. Prints one JSON summary and
writes per-frame metrics.

  --task color (default)  PSNR + SSIM (+ LPIPS when --lpips/MUDG_LPIPS_PATH
                          provides AlexNet-LPIPS weights, utils/lpips.py)
                          on the RGB frames
  --task semantic         pixel accuracy + mIoU on palette-decoded class ids
  --task depth            abs_rel / rmse / delta1 on the metric-depth .npy
                          outputs vs --gt_depth/{frame:08d}.npy (the scene's
                          six_frames_depth ground truth)

Usage:
    python -m mudg_tpu.apps.eval_nvs --dir out/virtual_color
    python -m mudg_tpu.apps.eval_nvs --dir out/virtual_semantic --task semantic
    python -m mudg_tpu.apps.eval_nvs --dir out/virtual_depth --task depth \
        --gt_depth scene/six_frames_depth/camera_FRONT
    python -m mudg_tpu.apps.eval_nvs --pred p/ --gt g/
"""
from __future__ import annotations

import argparse
import json
import os
import re


def collect_pairs(args):
    pairs = []
    if args.dir:
        pat = re.compile(rf"{args.prefix}_re_(\d+)\.png$")
        for f in sorted(os.listdir(args.dir)):
            m = pat.match(f)
            if m:
                gt = os.path.join(args.dir, f"{args.prefix}_gt_{m.group(1)}.png")
                if os.path.exists(gt):
                    pairs.append((os.path.join(args.dir, f), gt))
    else:
        preds = sorted(f for f in os.listdir(args.pred) if f.endswith(".png"))
        for f in preds:
            gt = os.path.join(args.gt, f)
            if os.path.exists(gt):
                pairs.append((os.path.join(args.pred, f), gt))
    return pairs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default=None,
                   help="render_infer task dir with {prefix}_re/_gt pairs")
    p.add_argument("--prefix", default=None,
                   help="pair filename prefix (default: --task)")
    p.add_argument("--task", default="color",
                   choices=("color", "depth", "semantic"))
    p.add_argument("--gt_depth", default=None,
                   help="dir of GT metric-depth {frame:08d}.npy (depth task)")
    p.add_argument("--pred", default=None)
    p.add_argument("--gt", default=None)
    p.add_argument("--out", default=None, help="write per-frame JSONL here")
    p.add_argument("--lpips", default=None,
                   help="AlexNet-LPIPS torch state dict (or set "
                        "MUDG_LPIPS_PATH); omitted/absent -> no lpips key")
    args = p.parse_args(argv)
    assert args.dir or (args.pred and args.gt)
    if args.prefix is None:
        args.prefix = args.task

    import cv2
    import numpy as np

    from ..utils import metrics

    rows = []
    if args.task == "depth":
        assert args.dir and args.gt_depth, "--task depth needs --dir + --gt_depth"
        pat = re.compile(r"depth_re_(\d+)\.npy$")
        for f in sorted(os.listdir(args.dir)):
            m = pat.match(f)
            if not m:
                continue
            gt_path = os.path.join(args.gt_depth, f"{int(m.group(1)):08d}.npy")
            if not os.path.exists(gt_path):
                continue
            pred = np.load(os.path.join(args.dir, f))
            gt = np.load(gt_path)
            if gt.shape != pred.shape:
                gt = cv2.resize(gt, pred.shape[::-1],
                                interpolation=cv2.INTER_NEAREST)
            rows.append({"frame": f,
                         **{k: (round(v, 4) if isinstance(v, float) else v)
                            for k, v in metrics.depth_metrics(pred, gt).items()}})
        assert rows, "no depth frame pairs found"
        keys = ("abs_rel", "rmse", "delta1")
    elif args.task == "semantic":
        from ..utils import media

        pairs = collect_pairs(args)
        assert pairs, "no frame pairs found"
        for pred_path, gt_path in pairs:
            a = cv2.imread(pred_path)[:, :, ::-1]
            b = cv2.imread(gt_path)[:, :, ::-1]
            _, ia = media.decode_semantic(a.astype(np.float32))
            _, ib = media.decode_semantic(b.astype(np.float32))
            rows.append({"frame": os.path.basename(pred_path),
                         **{k: (round(v, 4) if isinstance(v, float) else v)
                            for k, v in metrics.miou(ia, ib, 19).items()}})
        keys = ("miou", "pixel_acc")
    else:
        pairs = collect_pairs(args)
        assert pairs, "no frame pairs found"
        # LPIPS (paper metric) is weights-gated: --lpips/MUDG_LPIPS_PATH must
        # point at an AlexNet-LPIPS torch state dict (utils/lpips.py). With
        # no weights in this zero-egress image the metric reports null
        # rather than an uncalibrated number.
        from ..utils import lpips as LP

        lp_params = LP.load_lpips(args.lpips)
        lp_fn = None
        if lp_params is not None:
            import jax

            lp_fn = jax.jit(lambda a, b: LP.lpips(lp_params, a, b))
        for pred_path, gt_path in pairs:
            a = cv2.imread(pred_path).astype(np.float32) / 255.0
            b = cv2.imread(gt_path).astype(np.float32) / 255.0
            row = {
                "frame": os.path.basename(pred_path),
                "psnr": round(metrics.psnr(a, b, data_range=1.0), 4),
                "ssim": round(metrics.ssim(a[:, :, ::-1], b[:, :, ::-1]), 4),
            }
            if lp_fn is not None:
                # cv2 reads BGR; LPIPS nets are RGB-calibrated, range [-1,1]
                row["lpips"] = round(float(lp_fn(
                    (a[None, :, :, ::-1] * 2 - 1).copy(),
                    (b[None, :, :, ::-1] * 2 - 1).copy())[0]), 4)
            rows.append(row)
        keys = ("psnr", "ssim") + (("lpips",) if lp_fn is not None else ())
    summary = {"task": args.task, "n_frames": len(rows)}
    for k in keys:
        vals = [r[k] for r in rows if r.get(k) is not None]
        summary[f"{k}_mean"] = round(float(np.mean(vals)), 4) if vals else None
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
