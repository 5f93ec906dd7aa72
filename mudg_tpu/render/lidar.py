"""LiDAR point-cloud processing: unprojection, coloring, object segmentation.

Host-side rebuild of `data_process/tools/process_lidar.py`:
  * rays (origins + directions + ranges from the ETL step) -> world points,
  * per-point RGB by projecting into the surround cameras and sampling
    (get_color_from_camera, :45-82),
  * dynamic-object segmentation by oriented 3D boxes (segment_object_pcd,
    :121-138) using the native points_in_box kernel,
  * per-object canonical clouds + visibility + motion filtering (>0.5 m
    displacement, is_object_motion :265-280),
  * background cloud = everything minus object points, voxel-downsampled.
"""
from __future__ import annotations

import numpy as np

from ..utils import native


def rays_to_points(rays_o: np.ndarray, rays_d: np.ndarray, ranges: np.ndarray,
                   max_range: float = 75.0):
    """World-space hit points from lidar rays; drops non-returns (range<=0)
    and beyond-max-range points."""
    valid = (ranges > 0) & (ranges < max_range)
    pts = rays_o[valid] + rays_d[valid] * ranges[valid][:, None]
    return pts.astype(np.float32), valid


def color_points_from_cameras(
    xyz: np.ndarray, cameras: list[dict], default=(0.5, 0.5, 0.5),
):
    """Per-point RGB by projecting into each camera and sampling its image
    (process_lidar.py:45-82). cameras: dicts with K (3,3), c2w (4,4),
    image (H,W,3 uint8/float). First camera whose frustum contains the point
    wins (front camera listed first, like the reference order)."""
    n = len(xyz)
    rgb = np.tile(np.asarray(default, np.float32), (n, 1))
    colored = np.zeros(n, bool)
    for cam in cameras:
        K, c2w, img = cam["K"], cam["c2w"], cam["image"]
        h, w = img.shape[:2]
        w2c = np.linalg.inv(c2w)
        p = xyz @ w2c[:3, :3].T + w2c[:3, 3]
        z = p[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = K[0, 0] * p[:, 0] / z + K[0, 2]
            v = K[1, 1] * p[:, 1] / z + K[1, 2]
        ok = (~colored) & (z > 0.1) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        ui = np.clip(u[ok].astype(np.int64), 0, w - 1)
        vi = np.clip(v[ok].astype(np.int64), 0, h - 1)
        c = img[vi, ui].astype(np.float32)
        if c.max() > 1.5:
            c = c / 255.0
        rgb[ok] = c
        colored |= ok
    return rgb, colored


def box_world_to_box(transform_obj: np.ndarray) -> np.ndarray:
    """world-to-box 4x4 from an object's box-to-world pose."""
    return np.linalg.inv(transform_obj)


def segment_objects(
    xyz: np.ndarray, rgb: np.ndarray, objects_frame: list[dict],
):
    """Split a frame's cloud into per-object point sets + background mask.

    objects_frame: list of {id, transform_obj (4,4 box->world),
    size (3,) full extents}. Returns (per-object {points, colors} in the
    BOX frame — canonical, like save_object_from_pt — and the background
    mask)."""
    bg_mask = np.ones(len(xyz), bool)
    out = []
    for obj in objects_frame:
        w2b = box_world_to_box(np.asarray(obj["transform_obj"], np.float64))
        half = np.asarray(obj["size"], np.float64) / 2.0
        inside = native.points_in_box(xyz, w2b.astype(np.float32), half)
        pts_box = native.transform_points(xyz[inside], w2b.astype(np.float32))
        out.append({
            "id": obj["id"],
            "points": pts_box,
            "colors": rgb[inside],
            "count": int(inside.sum()),
        })
        bg_mask &= ~inside
    return out, bg_mask


def is_object_moving(centers: np.ndarray, thresh: float = 0.5) -> bool:
    """Displacement filter (process_lidar.py:265-280): moving if the box
    center travels more than `thresh` meters over the clip."""
    if len(centers) < 2:
        return False
    d = np.linalg.norm(centers.max(axis=0) - centers.min(axis=0))
    return bool(d > thresh)


def aggregate_object_cloud(per_frame_points: list[np.ndarray],
                           per_frame_colors: list[np.ndarray],
                           voxel: float = 0.05):
    """Merge a dynamic object's per-frame canonical clouds and downsample."""
    if not per_frame_points:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    xyz = np.concatenate(per_frame_points, axis=0)
    rgb = np.concatenate(per_frame_colors, axis=0)
    return native.voxel_downsample(xyz, rgb, voxel)


def build_background_cloud(per_frame_points: list[np.ndarray],
                           per_frame_colors: list[np.ndarray],
                           voxel: float = 0.1):
    """Aggregate background points over all frames + voxel downsample
    (save_background_from_pt, process_lidar.py:212-262)."""
    return aggregate_object_cloud(per_frame_points, per_frame_colors, voxel)
