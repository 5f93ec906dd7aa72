"""Whole-pipeline integration: the MuDG user story end-to-end on the
synthetic scene (reference flow: pipeline_process -> virtual_pose_render ->
external 3DGS refinement; here all in-repo):

  1. condition generation (make_conditions)
  2. multi-modal MDM inference (render_infer, tiny preset, random weights)
  3. 3DGS refinement SUPERVISED BY the MDM outputs (refine_gs --supervision,
     with the MDM depth as the depth target)
  4. multi-modal evaluation of the MDM outputs (eval_nvs color/semantic) and
     of the refined scene (holdout PSNR)

Each stage consumes the previous stage's real on-disk artifacts.
"""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.mark.slow
def test_full_pipeline(scene, tmp_path):
    from mudg_tpu.apps.make_conditions import render_scene_conditions
    from mudg_tpu.data.waymo import write_items
    from mudg_tpu.apps import render_infer, refine_gs, eval_nvs

    # 1. conditions
    render_scene_conditions(scene, ("camera_FRONT",))
    cam = "camera_FRONT"
    item = {
        "frames": [f"{i:08d}.jpg" for i in range(4)],
        "dense_color_base": os.path.join(scene, "images", cam),
        "sparse_color_base": os.path.join(scene, "sparse", cam),
        "dense_semantic_base": os.path.join(scene, "semantic_dense", cam),
        "dense_depth_base": os.path.join(scene, "six_frames_depth", cam),
        "sparse_depth_base": os.path.join(scene, "depth", cam),
    }
    items_path = str(tmp_path / "items.txt")
    write_items(items_path, [item])

    # 2. MDM inference (all three modalities)
    mdm_out = str(tmp_path / "mdm_out")
    render_infer.main([
        "--items", items_path, "--out", mdm_out,
        "--preset", "tiny", "--height", "32", "--width", "64",
        "--video_length", "4", "--steps", "2", "--max_windows", "1",
    ])

    # 3. 3DGS refinement supervised by the MDM outputs (color + depth npys)
    gs_out = str(tmp_path / "gs_out")
    refine_gs.main([
        "--scene", scene, "--out", gs_out,
        "--supervision", mdm_out,
        "--height", "32", "--width", "48", "--steps", "30",
        "--capacity", "4096", "--limit_frames", "4", "--holdout_every", "4",
    ])
    m = json.load(open(os.path.join(gs_out, "metrics.json")))
    assert np.isfinite(m["holdout_psnr_mean"])
    # the supervision actually came from stage 2: the color frames exist and
    # the refine run consumed the window render_infer wrote
    assert os.path.exists(os.path.join(mdm_out, "virtual_color",
                                       "color_re_0.png"))

    # 4. evaluation of the MDM outputs: color PSNR/SSIM + semantic mIoU
    s_color = eval_nvs.main(["--dir", os.path.join(mdm_out, "virtual_color")])
    assert s_color["n_frames"] >= 4 and np.isfinite(s_color["psnr_mean"])
    s_sem = eval_nvs.main(["--dir", os.path.join(mdm_out, "virtual_semantic"),
                           "--task", "semantic"])
    assert s_sem["n_frames"] >= 4
    assert s_sem["pixel_acc_mean"] is not None
    # depth vs the scene's GT lidar maps
    s_d = eval_nvs.main(["--dir", os.path.join(mdm_out, "virtual_depth"),
                         "--task", "depth",
                         "--gt_depth", os.path.join(scene, "six_frames_depth",
                                                    cam)])
    assert s_d["n_frames"] >= 4 and s_d["abs_rel_mean"] is not None
