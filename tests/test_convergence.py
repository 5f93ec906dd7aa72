"""Learning regression test (VERDICT r4 item 2): the full train app must
actually DESCEND on an overfittable synthetic scene — optimizer, EMA, remat,
bf16 islands and data pipeline composed, not just "loss is finite".

The reference's equivalent is training with periodic sampling
(main/callbacks.py:15-101). The full-strength run (loss 0.211 -> 0.073 over
300 steps, sample PSNR 8.88 -> 9.28 monotone) is scripts/overfit.py +
docs/STATE.md round 5; this is the cheap always-on version.
"""
import json
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.mark.slow
def test_train_app_descends_on_overfit_scene(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    from overfit import build_scene

    from mudg_tpu.apps import train_mdm
    from mudg_tpu.data.waymo import write_items

    scene = str(tmp_path / "scene")
    os.makedirs(scene)
    item = build_scene(scene, h=64, w=96)
    items_path = str(tmp_path / "items.txt")
    write_items(items_path, [item] * 8)

    out = str(tmp_path / "run")
    # batch 3: gcd(3, 8 virtual devices) = 1 -> a SINGLE-device mesh. The
    # 4-device sharded tiny train step (batch 4 under the 8-dev conftest)
    # hit a >60-min pathological compile through the remote service
    # (round 5); the 1-device executable compiles in seconds and the
    # learning signal is equivalent (scripts/overfit.py, bs=4 1-dev:
    # loss 0.21 -> 0.035 by step 120 — 6x against the 1.67x bar below).
    train_mdm.main([
        "--items", items_path, "--out", out, "--preset", "tiny",
        "--height", "64", "--width", "96", "--video_length", "4",
        "--batch_size", "3", "--accum", "1", "--max_steps", "120",
        "--lr", "5e-4", "--ckpt_every", "1000", "--full_ckpt_every", "0",
        "--log_every", "10", "--train_labels", "color", "--use_ema",
    ])
    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert len(losses) >= 10
    first = float(np.mean(losses[:3]))
    last = float(np.mean(losses[-3:]))
    # measured: 0.21 -> 0.035 by step 120 at this config; 40% is a loose bar
    assert last < 0.6 * first, (first, last)
