"""The reference's ACTUAL lifecycle, chained end-to-end from raw sensor
bytes to a render from trained weights:

  tfrecord (synthetic, wire-valid)
    -> preprocess ETL              (data_process/preprocess.py equiv)
    -> build_clouds                (pipeline_process.py save_object/bg equiv)
    -> segment                     (pipeline_segment.py equiv, stub weights)
    -> make_conditions             (tools/generate_sparse.py equiv)
    -> train-mdm N steps           (main/trainer.py equiv, tiny preset)
    -> render_infer with the TRAINED checkpoint (virtual_pose_render.py)

Every stage consumes only the previous stage's on-disk artifacts, exactly
like a user running the CLIs in sequence.
"""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_waymo_proto import build_frame, write_tfrecord  # noqa: E402


@pytest.mark.slow
def test_lifecycle_tfrecord_to_trained_render(tmp_path, monkeypatch):
    from mudg_tpu.apps import build_clouds, render_infer, segment, train_mdm
    from mudg_tpu.apps.make_conditions import render_scene_conditions
    from mudg_tpu.data import waymo_etl as ETL
    from mudg_tpu.data.waymo import write_items

    # ---- 1. raw tfrecord -> processed scene -------------------------------
    n, cam = 4, "camera_FRONT"
    rec = str(tmp_path / "seq.tfrecord")
    write_tfrecord(rec, [build_frame(i, n) for i in range(n)])
    scene = str(tmp_path / "scene")
    ETL.process_sequence(rec, scene)
    assert os.path.exists(os.path.join(scene, "scenario.pt"))

    # ---- 2. lidar rays -> colored clouds (objects/ + objects_info.pkl) ----
    obj_info = build_clouds.build_scene_clouds(
        scene, cameras=(cam,), voxel_bg=0.01, max_range=100.0)
    assert os.path.exists(os.path.join(scene, "objects", "background.ply"))
    from mudg_tpu.render.pointcloud import fetch_ply

    xyz, rgb, _ = fetch_ply(os.path.join(scene, "objects", "background.ply"))
    assert len(xyz) > 10 and np.isfinite(xyz).all()
    assert rgb.min() >= 0 and rgb.max() <= 1
    # the synthetic scene's moving vehicle survived the motion filter;
    # the static pedestrian did not
    assert [o["class_name"] for o in obj_info] == ["Vehicle"]

    # ---- 3. semantics (stubbed SegFormer weights, real CLI + artifacts) ---
    import mudg_tpu.data.segmentation as SEGMOD

    monkeypatch.setattr(
        SEGMOD, "load_segformer_predictor",
        lambda model_path=None: (
            lambda img: (img[:, :, 0] > 128).astype(np.int64) * 7))
    assert segment.main(["--scene", scene, "--cameras", cam]) == 0
    assert os.path.exists(
        os.path.join(scene, "semantic_dense", cam, "00000000.jpg"))

    # ---- 4. sparse RGB/depth conditions + 6-frame aggregated depth ---------
    from mudg_tpu.apps.make_conditions import render_six_frame_depth

    render_scene_conditions(scene, (cam,))
    render_six_frame_depth(scene, (cam,))
    assert os.path.exists(os.path.join(scene, "sparse", cam, "00000000.jpg"))
    assert os.path.exists(os.path.join(scene, "depth", cam, "00000000.npy"))
    d = np.load(os.path.join(scene, "six_frames_depth", cam, "00000000.npy"))
    assert d.shape == (48, 64) and np.isfinite(d).all() and d.max() > 0

    # ---- 5. train the MDM on the generated conditions ----------------------
    item = {
        "frames": [f"{i:08d}.jpg" for i in range(n)],
        "dense_color_base": os.path.join(scene, "images", cam),
        "sparse_color_base": os.path.join(scene, "sparse", cam),
        "dense_semantic_base": os.path.join(scene, "semantic_dense", cam),
        "dense_depth_base": os.path.join(scene, "six_frames_depth", cam),
        "sparse_depth_base": os.path.join(scene, "depth", cam),
    }
    items_path = str(tmp_path / "items.txt")
    write_items(items_path, [item] * 4)
    run_dir = str(tmp_path / "run")
    train_mdm.main([
        "--items", items_path, "--out", run_dir, "--preset", "tiny",
        "--height", "32", "--width", "64", "--video_length", "4",
        "--batch_size", "2", "--accum", "1", "--max_steps", "2",
        "--ckpt_every", "2", "--log_every", "1",
    ])
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert all(np.isfinite(l["loss"]) for l in lines if "loss" in l)
    ckpt = os.path.join(run_dir, "final")
    assert os.path.isdir(ckpt)

    # ---- 6. render with the TRAINED checkpoint ------------------------------
    # (the hash-tokenizer guard is for REAL torch ckpts; this one was trained
    # in-process with the same tokenizer)
    monkeypatch.setenv("MUDG_ALLOW_HASH_TOKENIZER", "1")
    out = str(tmp_path / "mdm_out")
    render_infer.main([
        "--items", items_path, "--out", out, "--ckpt", ckpt,
        "--preset", "tiny", "--height", "32", "--width", "64",
        "--video_length", "4", "--steps", "2", "--max_windows", "1",
    ])
    img = cv2.imread(os.path.join(out, "virtual_color", "color_re_0.png"))
    assert img is not None and np.isfinite(img.astype(np.float32)).all()
