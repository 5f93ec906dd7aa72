"""Scene point-cloud construction: lidar rays -> colored world points ->
per-object canonical clouds + static background cloud.

Rebuilds the first stage of `data_process/pipeline_process.py:30-36`
(`tools/process_lidar.py save_object_from_pt`:141-209 +
`save_background_from_pt`:212-262) on the host-side primitives in
render/lidar.py: per frame, unproject the TOP lidar's (shutter-compensated)
rays to world points, color them by projecting into the surround cameras,
carve out moving Vehicle/Pedestrian boxes into canonical per-object clouds,
and aggregate the remainder into objects/background.ply. Writes

    <scene>/objects/background.ply      voxel-downsampled static cloud
    <scene>/objects/<obj_id>.ply        per moving object, box frame
    <scene>/lidar_clouds/NNNNNNNN.ply   per-frame background cloud (consumed
                                        by make_conditions.render_six_frame_depth,
                                        the pipeline_depth.py 6-frame window)
    <scene>/objects_info.pkl            [{id, class_name, visibility (F,),
                                          bbox (F,3), transform_obj (F,4,4),
                                          point_cloud{points, colors}}]

which is exactly what make_conditions / refine_gs consume, completing the
preprocess -> build_clouds -> make_conditions -> train/render chain.

Usage:
    python -m mudg_tpu.apps.build_clouds --scene <dir> [--voxel_bg 0.1]
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from ..data.waymo_etl import lidar_frame_to_world
from ..render import lidar as L
from ..render import pointcloud as PC

DEFAULT_CAMERAS = (
    "camera_FRONT", "camera_FRONT_LEFT", "camera_FRONT_RIGHT",
    "camera_SIDE_LEFT", "camera_SIDE_RIGHT",
)


def flatten_objects(scenario: dict, classes=("Vehicle", "Pedestrian")):
    """scenario.pt objects (per-segment runs, waymo_etl.py:417-437) ->
    per-object dense (F,4,4) transforms, (F,3) box extents, (F,) visibility
    (save_object_from_pt:159-175 semantics)."""
    n_frames = scenario["metas"]["n_frames"]
    out = []
    for key, obj in scenario["objects"].items():
        if obj.get("class_name") not in classes:
            continue
        transform = np.tile(np.eye(4), (n_frames, 1, 1))
        bbox = np.zeros((n_frames, 3))
        vis = np.zeros(n_frames, np.int64)
        for seg in obj["segments"]:
            s, nf = seg["start_frame"], seg["n_frames"]
            transform[s:s + nf] = seg["data"]["transform"]
            bbox[s:s + nf] = seg["data"]["scale"]
            vis[s:s + nf] = 1
        out.append(dict(id=obj.get("id", key), class_name=obj["class_name"],
                        visibility=vis, bbox=bbox, transform_obj=transform))
    return out


def _frame_cameras(scene: str, observers: dict, cameras, index: int):
    """Camera dicts (K, c2w, image) for render/lidar.color_points_from_cameras
    — front camera first, like the reference order (process_lidar.py:45)."""
    import cv2

    cams = []
    for name in cameras:
        cam = observers.get(name)
        if cam is None:
            continue
        path = os.path.join(scene, "images", name, f"{index:08d}.jpg")
        img = cv2.imread(path)
        if img is None:
            continue
        cams.append(dict(
            K=np.asarray(cam["data"]["intr"][index], np.float64),
            c2w=np.asarray(cam["data"]["c2w"][index], np.float64),
            image=img[..., ::-1],  # BGR -> RGB
        ))
    return cams


def build_scene_clouds(
    scene: str,
    *,
    cameras=DEFAULT_CAMERAS,
    sensor: str = "lidar_TOP",
    voxel_obj: float = 0.05,
    voxel_bg: float = 0.1,
    max_range: float = 75.0,
    motion_thresh: float = 0.5,
    limit_frames: int | None = None,
):
    """The save_object_from_pt + save_background_from_pt pipeline. Returns
    the objects_info list (also pickled to <scene>/objects_info.pkl)."""
    with open(os.path.join(scene, "scenario.pt"), "rb") as f:
        scenario = pickle.load(f)
    observers = scenario["observers"]
    lidar = observers[sensor]
    n_frames = lidar["n_frames"]
    if limit_frames:
        n_frames = min(n_frames, limit_frames)

    objs = flatten_objects(scenario)
    # motion filter: static objects stay part of the background
    # (is_object_motion, process_lidar.py:265-280)
    moving = []
    for o in objs:
        centers = o["transform_obj"][o["visibility"] > 0][:, :3, 3]
        if L.is_object_moving(centers, motion_thresh):
            moving.append(o)

    bg_pts, bg_rgb = [], []
    obj_pts = {o["id"]: [] for o in moving}
    obj_rgb = {o["id"]: [] for o in moving}

    for index in range(n_frames):
        path = os.path.join(scene, "lidars", sensor, f"{index:08d}.npz")
        if not os.path.exists(path):
            continue
        data = np.load(path)
        rays_o = data["rays_o"].reshape(-1, 3)
        rays_d = data["rays_d"].reshape(-1, 3)
        ranges = data["ranges"].reshape(-1)
        l2w = np.asarray(lidar["data"]["l2w"][index], np.float64)
        rays_o, rays_d = lidar_frame_to_world(rays_o, rays_d, l2w)
        xyz, _ = L.rays_to_points(rays_o, rays_d, ranges, max_range)

        cams = _frame_cameras(scene, observers, cameras, index)
        rgb, colored = L.color_points_from_cameras(xyz, cams)
        # reference keeps only camera-covered points (process_lidar.py:240-242)
        xyz, rgb = xyz[colored], rgb[colored]

        frame_objs = [
            dict(id=o["id"], transform_obj=o["transform_obj"][index],
                 size=o["bbox"][index])
            for o in moving if o["visibility"][index]
        ]
        segs, bg_mask = L.segment_objects(xyz, rgb, frame_objs)
        for s in segs:
            if s["count"]:
                obj_pts[s["id"]].append(s["points"])
                obj_rgb[s["id"]].append(s["colors"])
        bg_pts.append(xyz[bg_mask])
        bg_rgb.append(rgb[bg_mask])

        # per-frame cloud for the 6-frame depth window (pipeline_depth.py)
        cloud_dir = os.path.join(scene, "lidar_clouds")
        os.makedirs(cloud_dir, exist_ok=True)
        if bg_mask.any():
            PC.store_ply(
                os.path.join(cloud_dir, f"{index:08d}.ply"), xyz[bg_mask],
                (np.clip(rgb[bg_mask], 0, 1) * 255).astype(np.uint8))

    obj_dir = os.path.join(scene, "objects")
    os.makedirs(obj_dir, exist_ok=True)

    obj_info = []
    for o in moving:
        pts, rgb = L.aggregate_object_cloud(
            obj_pts[o["id"]], obj_rgb[o["id"]], voxel_obj)
        o["point_cloud"] = dict(points=pts, colors=rgb)
        obj_info.append(o)
        if len(pts):
            PC.store_ply(os.path.join(obj_dir, f"{o['id']}.ply"),
                         pts, (np.clip(rgb, 0, 1) * 255).astype(np.uint8))

    xyz, rgb = L.build_background_cloud(bg_pts, bg_rgb, voxel_bg)
    PC.store_ply(os.path.join(obj_dir, "background.ply"),
                 xyz, (np.clip(rgb, 0, 1) * 255).astype(np.uint8))

    with open(os.path.join(scene, "objects_info.pkl"), "wb") as f:
        pickle.dump(obj_info, f)
    print(f"[build_clouds] {scene}: background {len(xyz)} pts, "
          f"{len(obj_info)} moving objects")
    return obj_info


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", required=True)
    p.add_argument("--cameras", nargs="*", default=list(DEFAULT_CAMERAS))
    p.add_argument("--voxel_obj", type=float, default=0.05)
    p.add_argument("--voxel_bg", type=float, default=0.1)
    p.add_argument("--max_range", type=float, default=75.0)
    p.add_argument("--limit_frames", type=int, default=None)
    a = p.parse_args(argv)
    build_scene_clouds(
        a.scene, cameras=tuple(a.cameras), voxel_obj=a.voxel_obj,
        voxel_bg=a.voxel_bg, max_range=a.max_range,
        limit_frames=a.limit_frames)


if __name__ == "__main__":
    main()
