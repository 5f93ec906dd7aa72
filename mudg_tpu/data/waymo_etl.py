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

Frame-proto decoding is fully self-contained: `data/waymo_proto.py` is a
hand-rolled protobuf wire decoder for exactly the Frame fields this ETL
consumes — no waymo_open_dataset or TensorFlow dependency. The tfrecord
framing itself is handled natively (utils/native.tfrecord_index).
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


def iter_frames(tfrecord_path: str):
    """Decode Waymo Frames straight from a tfrecord, no TF/waymo packages
    (wire decoder in waymo_proto.py)."""
    from . import waymo_proto as WP

    for rec in iter_tfrecord(tfrecord_path):
        yield WP.parse_frame(rec)


def rotation_rpy(roll, pitch, yaw) -> np.ndarray:
    """R_z(yaw) @ R_y(pitch) @ R_x(roll), vectorized over leading dims
    (waymo transform_utils.get_rotation_matrix semantics,
    preprocess.py:313-315)."""
    roll, pitch, yaw = (np.asarray(a, np.float64) for a in (roll, pitch, yaw))
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    R = np.empty((*roll.shape, 3, 3))
    R[..., 0, 0] = cy * cp
    R[..., 0, 1] = cy * sp * sr - sy * cr
    R[..., 0, 2] = cy * sp * cr + sy * sr
    R[..., 1, 0] = sy * cp
    R[..., 1, 1] = sy * sp * sr + cy * cr
    R[..., 1, 2] = sy * sp * cr - cy * sr
    R[..., 2, 0] = -sp
    R[..., 2, 1] = cp * sr
    R[..., 2, 2] = cp * cr
    return R


def _pixel_poses(pose_mat: np.ndarray) -> np.ndarray:
    """(..., 6) [roll pitch yaw x y z] -> (..., 4, 4) homogeneous transforms
    (transform_utils.get_transform, preprocess.py:317-320)."""
    T = np.zeros((*pose_mat.shape[:-1], 4, 4))
    T[..., :3, :3] = rotation_rpy(pose_mat[..., 0], pose_mat[..., 1],
                                  pose_mat[..., 2])
    T[..., :3, 3] = pose_mat[..., 3:6]
    T[..., 3, 3] = 1.0
    return T


def _object_to_vehicle(box) -> np.ndarray:
    """Label box -> o2v transform (preprocess.py:443-452)."""
    c, s = np.cos(box.heading), np.sin(box.heading)
    return np.array([
        [c, -s, 0, box.center_x],
        [s, c, 0, box.center_y],
        [0, 0, 1, box.center_z],
        [0, 0, 0, 1.0],
    ])


# ---------------------------------------------------------------------------
# Dynamic-object statistics (data_process/tools/filter_dynamic.py:10-119)
# ---------------------------------------------------------------------------

WAYMO_CLASSES = ["unknown", "Vehicle", "Pedestrian", "Sign", "Cyclist"]


def collect_loc_motion(frames):
    """Per-object xy world paths + inter-frame motion, and the ego path
    (filter_dynamic.py:10-38)."""
    categories: dict = {}
    ego_path = np.empty((3, 0))
    for frame in frames:
        v2w = np.asarray(frame.pose, np.float64)
        ego_path = np.concatenate([ego_path, v2w[:3, 3:]], axis=1)
        for label in frame.laser_labels:
            cls = WAYMO_CLASSES[int(label.type)]
            cat = categories.setdefault(cls, {})
            b = label.box
            loc = (v2w @ np.array([b.center_x, b.center_y, b.center_z, 1.0]))[:2]
            if label.id not in cat:
                cat[label.id] = dict(paths=[loc], motions=[0.0])
            else:
                d = cat[label.id]
                d["motions"].append(float(np.linalg.norm(d["paths"][-1] - loc)))
                d["paths"].append(loc)
    return categories, ego_path


def collect_box_speed(frames):
    """Per-object |v_xy| series from label metadata (filter_dynamic.py:41-61)."""
    categories: dict = {}
    for frame in frames:
        for label in frame.laser_labels:
            cls = WAYMO_CLASSES[int(label.type)]
            cat = categories.setdefault(cls, {})
            m = label.metadata
            cat.setdefault(label.id, dict(motions=[]))["motions"].append(
                float(np.hypot(m.speed_x, m.speed_y))
            )
    return categories


def count_all(frames):
    """Per-object observation counts (filter_dynamic.py:64-81)."""
    categories: dict = {}
    for frame in frames:
        for label in frame.laser_labels:
            cls = WAYMO_CLASSES[int(label.type)]
            cat = categories.setdefault(cls, {})
            cat[label.id] = cat.get(label.id, -1) + 1
    return categories


def stat_dynamic_objects(frames, speed_eps=0.2, loc_eps=0.03):
    """Union of the speed- and location-motion dynamic filters
    (filter_dynamic.py:84-119). `frames` may be a list (iterated twice)."""
    frames = list(frames) if not isinstance(frames, (list, tuple)) else frames
    stats = {c: {"n_dynamic": 0, "is_dynamic": [], "by_speed": [], "by_loc": []}
             for c in WAYMO_CLASSES}
    for cls, cat in collect_box_speed(frames).items():
        stats[cls]["by_speed"] = [
            oid for oid, d in cat.items() if np.max(d["motions"]) > speed_eps
        ]
    loc_stats, _ = collect_loc_motion(frames)
    for cls, cat in loc_stats.items():
        stats[cls]["by_loc"] = [
            oid for oid, d in cat.items() if np.max(d["motions"]) > loc_eps
        ]
    for cls, d in stats.items():
        dyn = sorted(set(d["by_speed"]) | set(d["by_loc"]))
        d["is_dynamic"] = dyn
        d["n_dynamic"] = len(dyn)
    return stats


# ---------------------------------------------------------------------------
# Full-sequence ETL
# ---------------------------------------------------------------------------

def process_sequence(tfrecord_path: str, out_dir: str, *,
                     class_names=tuple(WAYMO_CLASSES),
                     should_offset_pos: bool = True,
                     should_offset_timestamp: bool = True,
                     save_images: bool = True,
                     save_lidar: bool = True) -> dict:
    """Full ETL of one Waymo sequence, no TF/waymo-package dependency
    (preprocess.py:31-533 via the waymo_proto wire decoder).

    Writes out_dir/images/camera_X/{frame:08d}.jpg (raw JPEG payloads),
    out_dir/lidars/lidar_X/{frame:08d}.npz (rays_o/rays_d/ranges[, dpose]),
    and out_dir/scenario.pt with the reference observer/object layout.
    Returns the scenario dict.
    """
    import pickle

    from . import waymo_proto as WP

    frames = list(iter_frames(tfrecord_path))
    if not frames:
        raise ValueError(f"no frames in {tfrecord_path}")
    frame0 = frames[0]

    world_offset = np.zeros(3)
    if should_offset_pos:
        world_offset = np.asarray(frame0.pose, np.float64)[:3, 3].copy()
    timestamp_offset = frame0.timestamp_micros / 1e6 if should_offset_timestamp else 0.0

    dynamic_stats = stat_dynamic_objects(frames)

    scene_observers: dict = {}
    scene_objects: dict = {}
    frame_timestamps = []

    os.makedirs(out_dir, exist_ok=True)

    for frame_ind, frame in enumerate(frames):
        frame_pose = np.asarray(frame.pose, np.float64).copy()
        frame_pose[:3, 3] -= world_offset
        frame_timestamp = frame.timestamp_micros / 1e6 - timestamp_offset
        frame_timestamps.append(frame_timestamp)

        ego = scene_observers.setdefault(
            "ego_car", dict(class_name="EgoVehicle", n_frames=0,
                            data=dict(v2w=[], global_timestamps=[],
                                      global_frame_inds=[])))
        ego["n_frames"] += 1
        ego["data"]["v2w"].append(frame_pose)
        ego["data"]["global_timestamps"].append(frame_timestamp)
        ego["data"]["global_frame_inds"].append(frame_ind)

        # ---- cameras (preprocess.py:150-231); images are saved as the raw
        # JPEG payload (no decode/re-encode round trip)
        images_by_name = {im.name: im for im in frame.images}
        for c in frame.context.camera_calibrations:
            camera = images_by_name.get(c.name)
            if camera is None:
                continue
            str_id = "camera_" + WP.CAMERA_NAMES[c.name]
            cam_ts = camera.pose_timestamp - (
                timestamp_offset if should_offset_timestamp else 0.0
            )
            fx, fy, cx, cy, *distortion = c.intrinsic
            intr = np.eye(3)
            intr[0, 0], intr[1, 1] = fx, fy
            intr[0, 2], intr[1, 2] = cx, cy

            c2v = np.asarray(c.extrinsic, np.float64)
            v2w = np.asarray(camera.pose, np.float64).copy()
            v2w[:3, 3] -= world_offset
            c2w = v2w @ c2v @ OPENCV_TO_WAYMO

            obs = scene_observers.setdefault(
                str_id, dict(class_name="Camera", n_frames=0,
                             data=dict(hw=[], intr=[], distortion=[], c2v_0=[],
                                       c2v=[], sensor_v2w=[], c2w=[],
                                       global_timestamps=[],
                                       global_frame_inds=[])))
            obs["n_frames"] += 1
            d = obs["data"]
            d["hw"].append((c.height, c.width))
            d["intr"].append(intr)
            d["distortion"].append(np.asarray(distortion))
            d["c2v_0"].append(c2v)
            d["c2v"].append(c2v @ OPENCV_TO_WAYMO)
            d["sensor_v2w"].append(v2w)
            d["c2w"].append(c2w)
            d["global_timestamps"].append(cam_ts)
            d["global_frame_inds"].append(frame_ind)

            if save_images and camera.image:
                img_dir = os.path.join(out_dir, "images", str_id)
                os.makedirs(img_dir, exist_ok=True)
                with open(os.path.join(img_dir, f"{frame_ind:08d}.jpg"), "wb") as f:
                    f.write(camera.image)

        # ---- lidars (preprocess.py:236-413)
        lasers_by_name = {l.name: l for l in frame.lasers}
        for c in sorted(frame.context.laser_calibrations, key=lambda c: c.name):
            laser = lasers_by_name.get(c.name)
            if laser is None:
                continue
            str_id = "lidar_" + WP.LASER_NAMES[c.name]
            extrinsic = np.asarray(c.extrinsic, np.float64)
            l2w = frame_pose @ extrinsic

            obs = scene_observers.setdefault(
                str_id, dict(class_name="RaysLidar", n_frames=0,
                             data=dict(l2v=[], l2w=[], global_timestamps=[],
                                       global_frame_inds=[])))
            obs["n_frames"] += 1
            d = obs["data"]
            d["l2v"].append(extrinsic)
            d["l2w"].append(l2w)
            d["global_timestamps"].append(frame_timestamp)
            d["global_frame_inds"].append(frame_ind)

            if not (save_lidar and laser.ri_return1 is not None):
                continue
            ri = laser.ri_return1.matrix()  # (H, W, 4): range/intensity/elong/NLZ
            hh, ww = ri.shape[:2]
            if c.beam_inclinations is not None and len(c.beam_inclinations):
                incl = np.asarray(c.beam_inclinations, np.float64)[::-1].copy()
            else:
                incl = compute_inclinations(
                    c.beam_inclination_min, c.beam_inclination_max, hh)
            ranges = np.asarray(ri[..., 0], np.float64)
            rays_d = range_image_rays(hh, ww, incl, extrinsic)
            rays_o = np.zeros_like(rays_d)

            lidar_dir = os.path.join(out_dir, "lidars", str_id)
            os.makedirs(lidar_dir, exist_ok=True)
            fpath = os.path.join(lidar_dir, f"{frame_ind:08d}.npz")

            pose_blob = laser.ri_return1.range_image_pose_compressed
            if c.name == 1 and pose_blob:  # TOP: rolling-shutter compensation
                pose_mat = WP.decode_compressed_matrix(pose_blob)  # (H, W, 6)
                mask_valid = np.all(pose_mat != 0, axis=-1)
                pixel_pose = _pixel_poses(pose_mat[mask_valid])
                pixel_pose[:, :3, 3] -= world_offset
                o, dd, dpose = apply_rolling_shutter(
                    rays_o[mask_valid], rays_d[mask_valid], pixel_pose,
                    frame_pose, extrinsic)
                np.savez_compressed(
                    fpath,
                    rays_o=o[None].astype(np.float32),
                    rays_d=dd[None].astype(np.float32),
                    ranges=ranges[mask_valid][None].astype(np.float32),
                    dpose=dpose[None].astype(np.float32))
            else:
                np.savez_compressed(
                    fpath,
                    rays_o=rays_o.astype(np.float32),
                    rays_d=rays_d.astype(np.float32),
                    ranges=ranges.astype(np.float32))

        # ---- objects (preprocess.py:415-468)
        for label in frame.laser_labels:
            cls = WAYMO_CLASSES[int(label.type)]
            if cls not in class_names:
                continue
            obj = scene_objects.setdefault(
                str(label.id), dict(id=label.id, class_name=cls,
                                    frame_annotations=[]))
            pose = frame_pose @ _object_to_vehicle(label.box)
            dimension = [label.box.length, label.box.width, label.box.height]
            obj["frame_annotations"].append(
                [[frame_ind, frame_timestamp], [pose, dimension]]
            )

    n_global_frames = len(frames)

    for odict in scene_observers.values():
        odict["data"] = {k: np.array(v) for k, v in odict["data"].items()}

    # contiguous frame runs -> segments (preprocess.py:478-512)
    for odict in scene_objects.values():
        annos = odict.pop("frame_annotations")
        segments = []
        cur = None
        for i, ((find, fts), (pose, dim)) in enumerate(annos):
            if i == 0 or find - annos[i - 1][0][0] != 1:
                cur = dict(start_frame=find, n_frames=None, data=dict(
                    transform=[], scale=[], global_timestamps=[],
                    global_frame_inds=[]))
            cd = cur["data"]
            cd["transform"].append(pose)
            cd["scale"].append(dim)
            cd["global_timestamps"].append(fts)
            cd["global_frame_inds"].append(find)
            if i == len(annos) - 1 or annos[i + 1][0][0] - find != 1:
                cur["data"] = {k: np.array(v) for k, v in cd.items()}
                cur["n_frames"] = find - cur["start_frame"] + 1
                segments.append(cur)
        odict["n_full_frames"] = n_global_frames
        odict["segments"] = segments

    scenario = dict(
        scene_id=frame0.context.name,
        metas=dict(n_frames=n_global_frames, world_offset=world_offset,
                   timestamp_offset=timestamp_offset,
                   frame_timestamps=np.array(frame_timestamps),
                   dynamic_stats=dynamic_stats),
        objects=scene_objects,
        observers=scene_observers,
    )
    with open(os.path.join(out_dir, "scenario.pt"), "wb") as f:
        pickle.dump(scenario, f)
    return scenario
