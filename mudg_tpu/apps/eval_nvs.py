"""Novel-view quality evaluation: PSNR / SSIM between generated frames and GT.

Wires the BASELINE quality criterion (PSNR parity with the reference) over
the `render_infer` output layout ({task}_re_{i}.png vs {task}_gt_{i}.png) or
any two directories of matching PNG frames. Prints one JSON summary and
writes per-frame metrics.

Usage:
    python -m mudg_tpu.apps.eval_nvs --dir out/virtual_color [--prefix color]
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
    p.add_argument("--prefix", default="color")
    p.add_argument("--pred", default=None)
    p.add_argument("--gt", default=None)
    p.add_argument("--out", default=None, help="write per-frame JSONL here")
    args = p.parse_args(argv)
    assert args.dir or (args.pred and args.gt)

    import cv2
    import numpy as np

    from ..utils import metrics

    pairs = collect_pairs(args)
    assert pairs, "no frame pairs found"
    rows = []
    for pred_path, gt_path in pairs:
        a = cv2.imread(pred_path).astype(np.float32) / 255.0
        b = cv2.imread(gt_path).astype(np.float32) / 255.0
        rows.append({
            "frame": os.path.basename(pred_path),
            "psnr": round(metrics.psnr(a, b, data_range=1.0), 4),
            "ssim": round(metrics.ssim(a[:, :, ::-1], b[:, :, ::-1]), 4),
        })
    summary = {
        "n_frames": len(rows),
        "psnr_mean": round(float(np.mean([r["psnr"] for r in rows])), 4),
        "ssim_mean": round(float(np.mean([r["ssim"] for r in rows])), 4),
    }
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
