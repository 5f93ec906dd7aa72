"""Data pipeline integration: synthetic scene -> condition rendering ->
dataset loading -> batches; plus ETL math and media utilities."""
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mudg_tpu.data import waymo as W
from mudg_tpu.data import conditions as DC
from mudg_tpu.data import waymo_etl as ETL
from mudg_tpu.utils import media
from mudg_tpu.render import pointcloud as PC
from mudg_tpu.render import lidar as L


def test_make_conditions_renders_scene(scene):
    from mudg_tpu.apps.make_conditions import render_scene_conditions

    render_scene_conditions(scene, ("camera_FRONT",), limit_frames=2)
    sp = os.path.join(scene, "sparse", "camera_FRONT", "00000000.jpg")
    dp = os.path.join(scene, "depth", "camera_FRONT", "00000000.npy")
    assert os.path.exists(sp) and os.path.exists(dp)
    img = cv2.imread(sp)
    assert img.shape == (64, 96, 3)
    assert img.max() > 0  # the wall is visible
    depth = np.load(dp)
    hit = depth[depth > 0]
    assert len(hit) > 100
    # wall at z=8 from camera at z<=0.5 => depths in [7.5, 8.0]
    assert 7.0 < np.median(hit) < 8.1


def test_make_conditions_virtual_poses(scene):
    from mudg_tpu.apps.make_conditions import render_scene_conditions

    render_scene_conditions(scene, ("camera_FRONT",), virtual=True,
                            limit_frames=1)
    v1 = os.path.join(scene, "virtual_sparse", "camera_FRONT", "00000000_1.jpg")
    v2 = os.path.join(scene, "virtual_sparse", "camera_FRONT", "00000000_2.jpg")
    assert os.path.exists(v1) and os.path.exists(v2)
    # the two lateral shifts see different parts of the wall
    a = cv2.imread(v1).astype(np.float32)
    b = cv2.imread(v2).astype(np.float32)
    assert np.abs(a - b).mean() > 1.0


def test_dataset_loading_and_batching(scene, tmp_path):
    from mudg_tpu.apps.make_conditions import render_scene_conditions

    render_scene_conditions(scene, ("camera_FRONT",))  # all 4 frames
    cam = "camera_FRONT"
    item = {
        "scene": scene,
        "frames": [f"{i:08d}.jpg" for i in range(4)],
        "dense_color_base": os.path.join(scene, "images", cam),
        "sparse_color_base": os.path.join(scene, "sparse", cam),
        "dense_semantic_base": os.path.join(scene, "semantic_dense", cam),
        "dense_depth_base": os.path.join(scene, "six_frames_depth", cam),
        "sparse_depth_base": os.path.join(scene, "depth", cam),
    }
    items_path = str(tmp_path / "items.txt")
    W.write_items(items_path, [item, item])

    ds = W.WaymoDataset(items_path, video_length=4, resolution=(32, 64))
    for task in ("color", "semantic", "depth"):
        ex = ds.load_item(0, task=task)
        assert ex["dense_frames"].shape == (4, 32, 64, 3)
        assert ex["sparse_frames"].shape == (4, 32, 64, 3)
        assert ex["sparse_depth"].shape == (4, 32, 64, 3)
        assert -1.0 <= ex["dense_frames"].min() and ex["dense_frames"].max() <= 1.0
        assert ex["class_label"] == W.CLASS_LABELS[task]

    from mudg_tpu.conditioning.tokenizer import HashTokenizer

    loader = W.BatchLoader(ds, batch_size=2, accum_steps=1,
                           tokenizer=HashTokenizer())
    batch = next(iter(loader))
    assert batch["dense_frames"].shape == (2, 4, 32, 64, 3)
    assert batch["tokens"].shape == (2, 77)

    loader2 = W.BatchLoader(ds, batch_size=1, accum_steps=2,
                            tokenizer=HashTokenizer())
    b2 = next(iter(loader2))
    assert b2["dense_frames"].shape == (2, 1, 4, 32, 64, 3)


def test_batchloader_prefetch_equivalence(scene, tmp_path):
    """Background-prefetch iteration yields byte-identical batches in the
    same order as the synchronous path (shuffle included, same seed)."""
    from mudg_tpu.apps.make_conditions import render_scene_conditions

    render_scene_conditions(scene, ("camera_FRONT",))
    cam = "camera_FRONT"
    item = {
        "scene": scene,
        "frames": [f"{i:08d}.jpg" for i in range(4)],
        "dense_color_base": os.path.join(scene, "images", cam),
        "sparse_color_base": os.path.join(scene, "sparse", cam),
        "dense_semantic_base": os.path.join(scene, "semantic_dense", cam),
        "dense_depth_base": os.path.join(scene, "six_frames_depth", cam),
        "sparse_depth_base": os.path.join(scene, "depth", cam),
    }
    items_path = str(tmp_path / "items.txt")
    W.write_items(items_path, [item] * 6)
    def fresh_ds():  # task sampling draws from a per-dataset RNG sequence
        return W.WaymoDataset(items_path, video_length=4, resolution=(32, 64),
                              seed=11)

    sync = list(W.BatchLoader(fresh_ds(), batch_size=2, seed=3, prefetch=0))
    pre = list(W.BatchLoader(fresh_ds(), batch_size=2, seed=3, prefetch=2))
    assert len(sync) == len(pre) == 3
    for bs, bp in zip(sync, pre):
        assert bs.keys() == bp.keys()
        for k in bs:
            np.testing.assert_array_equal(bs[k], bp[k])

    # abandoning iteration mid-stream must not deadlock or leak errors
    it = iter(W.BatchLoader(fresh_ds(), batch_size=2, prefetch=1))
    next(it)
    it.close()


def test_inference_conditions(scene):
    cam = "camera_FRONT"
    sample = {
        "frames": [f"{i:08d}.jpg" for i in range(4)],
        "dense_color_base": os.path.join(scene, "images", cam),
        "sparse_color_base": os.path.join(scene, "sparse", cam),
        "dense_semantic_base": os.path.join(scene, "semantic_dense", cam),
        "dense_depth_base": os.path.join(scene, "six_frames_depth", cam),
        "sparse_depth_base": os.path.join(scene, "depth", cam),
    }
    for task in ("color", "depth", "semantic"):
        d = DC.get_task_frames(sample, task, (32, 64))
        assert d["dense_frames"].shape == (4, 32, 64, 3)
    sd = DC.get_sparse_depth(sample, (32, 64))
    assert sd.shape == (4, 32, 64, 3)
    assert sd.min() >= -1 and sd.max() <= 1


def test_task_sampling_distribution():
    ds = W.WaymoDataset.__new__(W.WaymoDataset)
    ds.train_labels = ("color", "semantic", "depth")
    ds._rng = np.random.default_rng(0)
    labels = [ds.sample_task() for _ in range(4000)]
    import collections

    c = collections.Counter(labels)
    assert abs(c["color"] / 4000 - 0.5) < 0.05
    assert abs(c["semantic"] / 4000 - 0.25) < 0.05
    assert abs(c["depth"] / 4000 - 0.25) < 0.05


# ---------------------------------------------------------------------------
# ETL math
# ---------------------------------------------------------------------------

def test_opencv_waymo_conversion():
    # the waymo +x axis is the opencv +z axis
    z_cv = np.array([0, 0, 1, 0.0])
    np.testing.assert_allclose(ETL.OPENCV_TO_WAYMO @ z_cv, [1, 0, 0, 0])
    # opencv y (down) maps to waymo -z
    y_cv = np.array([0, 1, 0, 0.0])
    np.testing.assert_allclose(ETL.OPENCV_TO_WAYMO @ y_cv, [0, 0, -1, 0])


def test_range_image_rays_geometry():
    incl = ETL.compute_inclinations(-0.3, 0.2, 8)
    assert incl[0] > incl[-1]  # top row = highest inclination
    rays = ETL.range_image_rays(8, 16, incl, np.eye(4))
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-9)
    # column at 3/4 width corresponds to azimuth ~ -pi/2+... monotonic sweep:
    az = np.arctan2(rays[4, :, 1], rays[4, :, 0])
    assert az[0] > az[-1]  # azimuth decreases left->right


def test_rolling_shutter_identity():
    rays_o = np.zeros((5, 3))
    rays_d = np.tile([1.0, 0, 0], (5, 1))
    frame_pose = np.eye(4)
    extr = np.eye(4)
    pixel_pose = np.tile(np.eye(4), (5, 1, 1))
    o, d, dpose = ETL.apply_rolling_shutter(rays_o, rays_d, pixel_pose,
                                            frame_pose, extr)
    np.testing.assert_allclose(o, rays_o, atol=1e-12)
    np.testing.assert_allclose(d, rays_d, atol=1e-12)

    # pure ego translation moves origins, not directions
    pp = np.tile(np.eye(4), (5, 1, 1))
    pp[:, 0, 3] = 2.0
    o, d, _ = ETL.apply_rolling_shutter(rays_o, rays_d, pp, frame_pose, extr)
    np.testing.assert_allclose(o[:, 0], 2.0)
    np.testing.assert_allclose(d, rays_d, atol=1e-12)


def test_lidar_coloring_and_segmentation():
    # wall points; one camera sees them
    xyz = np.array([[0, 0, 5.0], [0, 0, 6.0], [50, 0, 5.0]], np.float32)
    img = np.full((64, 64, 3), 200, np.uint8)
    K = np.array([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]])
    cams = [{"K": K, "c2w": np.eye(4), "image": img}]
    rgb, colored = L.color_points_from_cameras(xyz, cams)
    assert colored[0] and colored[1] and not colored[2]
    np.testing.assert_allclose(rgb[0], 200 / 255.0, atol=1e-6)

    objs = [{"id": "a", "transform_obj": np.eye(4) * 1.0, "size": (2, 2, 12)}]
    objs[0]["transform_obj"] = np.eye(4)
    per_obj, bg_mask = L.segment_objects(xyz, rgb, objs)
    assert per_obj[0]["count"] == 2  # the two near-axis points inside the box
    assert bg_mask.sum() == 1


def test_motion_filter():
    still = np.tile([1.0, 2, 3], (10, 1))
    assert not L.is_object_moving(still)
    moving = still.copy()
    moving[-1, 0] += 1.0
    assert L.is_object_moving(moving)


def test_media_semantic_roundtrip():
    ids = np.random.default_rng(0).integers(0, 19, (16, 16))
    rgb = media.encode_semantic(ids)
    rgb_noisy = rgb.astype(np.float32) + np.random.default_rng(1).normal(0, 5, rgb.shape)
    decoded_rgb, decoded_ids = media.decode_semantic(rgb_noisy)
    np.testing.assert_array_equal(decoded_ids, ids)


def test_media_spectral_colormap():
    img = np.linspace(0, 1, 100).reshape(10, 10)
    out = media.spectral_colormap(img)
    assert out.shape == (10, 10, 3)
    np.testing.assert_allclose(out[0, 0], media._SPECTRAL[0], atol=1e-6)
    np.testing.assert_allclose(out[-1, -1], media._SPECTRAL[-1], atol=1e-6)
