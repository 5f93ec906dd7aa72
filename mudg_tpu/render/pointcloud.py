"""Host-side point-cloud utilities: voxel downsampling, hidden-point removal,
PLY I/O, dynamic-object assembly.

Replaces the reference's Open3D (C++) calls — voxel_down_sample
(`data_process/tools/process_lidar.py:36-42`) and hidden_point_removal
(`data_process/pipeline_depth.py:117-127`) — and plyfile
(`data_process/tools/merge_points.py:19-47`) with numpy/scipy equivalents.
These run in the offline ETL pipeline, not on TPU.
"""
from __future__ import annotations

import numpy as np


def voxel_downsample(xyz: np.ndarray, rgb: np.ndarray | None, voxel: float):
    """Average points (and colors) per voxel cell (Open3D voxel_down_sample
    semantics: centroid of each occupied voxel)."""
    if len(xyz) == 0:
        return xyz, rgb
    keys = np.floor(xyz / voxel).astype(np.int64)
    # hash voxel coords to one int64 per point
    mn = keys.min(axis=0)
    keys = keys - mn
    dims = keys.max(axis=0) + 1
    flat = (keys[:, 0] * dims[1] + keys[:, 1]) * dims[2] + keys[:, 2]
    uniq, inv, counts = np.unique(flat, return_inverse=True, return_counts=True)
    out_xyz = np.zeros((len(uniq), 3), np.float64)
    np.add.at(out_xyz, inv, xyz)
    out_xyz /= counts[:, None]
    out_rgb = None
    if rgb is not None:
        out_rgb = np.zeros((len(uniq), rgb.shape[1]), np.float64)
        np.add.at(out_rgb, inv, rgb)
        out_rgb /= counts[:, None]
        out_rgb = out_rgb.astype(rgb.dtype)
    return out_xyz.astype(xyz.dtype), out_rgb


def hidden_point_removal(xyz: np.ndarray, camera: np.ndarray, radius: float = 1e5):
    """Katz et al. spherical-flip + convex hull visibility (Open3D
    hidden_point_removal semantics, pipeline_depth.py:123). Returns indices of
    visible points."""
    from scipy.spatial import ConvexHull

    p = xyz - camera[None, :]
    norm = np.linalg.norm(p, axis=1, keepdims=True)
    norm = np.maximum(norm, 1e-9)
    flipped = p + 2 * (radius - norm) * (p / norm)
    pts = np.concatenate([flipped, np.zeros((1, 3))], axis=0)  # camera at origin
    hull = ConvexHull(pts)
    visible = np.setdiff1d(hull.vertices, [len(pts) - 1])
    return np.sort(visible)


# ---------------------------------------------------------------------------
# PLY I/O (binary little-endian, xyz + rgb + normals) — merge_points.py:19-47
# ---------------------------------------------------------------------------

def store_ply(path: str, xyz: np.ndarray, rgb_uint8: np.ndarray):
    """Write a binary PLY with x,y,z,nx,ny,nz,red,green,blue."""
    n = len(xyz)
    normals = np.zeros_like(xyz, dtype=np.float32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.zeros(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
               ("red", "u1"), ("green", "u1"), ("blue", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = xyz.astype(np.float32).T
    rec["nx"], rec["ny"], rec["nz"] = normals.T
    rec["red"], rec["green"], rec["blue"] = rgb_uint8.astype(np.uint8).T
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def fetch_ply(path: str):
    """Read a binary/ascii PLY -> (xyz float32 (N,3), rgb float32 [0,1] (N,3),
    normals). Handles the subset of PLY this pipeline writes."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    body = data[end:]

    fmt = next(l.split()[1] for l in header if l.startswith("format"))
    n = int(next(l.split()[2] for l in header if l.startswith("element vertex")))
    props = []
    for l in header:
        if l.startswith("property"):
            _, typ, name = l.split()
            props.append((name, typ))
    np_types = {"float": "<f4", "float32": "<f4", "double": "<f8",
                "uchar": "u1", "uint8": "u1", "int": "<i4", "uint": "<u4",
                "short": "<i2", "ushort": "<u2", "char": "i1"}
    if fmt == "ascii":
        rows = np.loadtxt([l for l in body.decode().splitlines() if l.strip()][:n])
        table = {name: rows[:, i] for i, (name, _) in enumerate(props)}
    else:
        rec = np.frombuffer(
            body, dtype=[(name, np_types[typ]) for name, typ in props], count=n
        )
        table = {name: rec[name] for name, _ in props}

    xyz = np.stack([table["x"], table["y"], table["z"]], axis=1).astype(np.float32)
    rgb = None
    if "red" in table:
        rgb = np.stack([table["red"], table["green"], table["blue"]], axis=1)
        rgb = rgb.astype(np.float32)
        if rgb.max() > 1.0:
            rgb = rgb / 255.0
    normals = None
    if "nx" in table:
        normals = np.stack([table["nx"], table["ny"], table["nz"]], axis=1).astype(np.float32)
    return xyz, rgb, normals


# ---------------------------------------------------------------------------
# Dynamic-object assembly (generate_sparse.py:226-260)
# ---------------------------------------------------------------------------

def object_visibility_table(obj_info: list[dict]) -> np.ndarray:
    """(frames, n_objects) visibility matrix from per-object records."""
    vis = np.stack([obj["visibility"] for obj in obj_info], axis=0)
    return vis.T


def merge_objects_at_frame(obj_info: list[dict], obj_vis: np.ndarray, frame: int):
    """Gather all visible objects' canonical clouds transformed into world at
    `frame`. Returns (xyz (N,3), rgb (N,3)); a far-away dummy point when no
    object is visible (matching generate_sparse.py:255-256)."""
    xs, cs = [], []
    for index, visible in enumerate(obj_vis[frame]):
        if visible == 1:
            obj = obj_info[index]
            tf = obj["transform_obj"][frame]
            pts = obj["point_cloud"]["points"] @ tf[:3, :3].T + tf[:3, 3]
            xs.append(pts)
            cs.append(obj["point_cloud"]["colors"])
    if not xs:
        return np.array([[1000.0, 1000.0, 1000.0]]), np.array([[0.0, 0.0, 0.0]])
    return np.concatenate(xs, axis=0), np.concatenate(cs, axis=0)


def read_colmap_points3d_bin(path: str):
    """Colmap points3D.bin reader (tools/merge_points.py:48-76; colmap
    Reconstruction::ReadPoints3DBinary layout: u64 count, then per point
    [u64 id, 3x f64 xyz, 3x u8 rgb, f64 error, u64 track_len, track_len x
    (i32 image_id, i32 point2D_idx)]).

    Returns (xyz (N,3) f64, rgb (N,3) u8, error (N,) f64).
    """
    import struct

    with open(path, "rb") as f:
        data = f.read()
    (n,) = struct.unpack_from("<Q", data, 0)
    off = 8
    xyz = np.empty((n, 3))
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n)
    head = struct.Struct("<QdddBBBdQ")
    for i in range(n):
        vals = head.unpack_from(data, off)
        off += head.size
        xyz[i] = vals[1:4]
        rgb[i] = vals[4:7]
        err[i] = vals[7]
        off += 8 * vals[8]  # skip the (image_id, point2D_idx) track
    return xyz, rgb, err


def merge_sfm_lidar(out_path: str, colmap_bin: str, lidar_ply: str):
    """Concatenate colmap SfM points with the LiDAR cloud into merged.ply
    (tools/merge_points.py:79-93). Returns the merged (xyz, rgb01)."""
    sfm_xyz, sfm_rgb, _ = read_colmap_points3d_bin(colmap_bin)
    lidar_xyz, lidar_rgb01, _ = fetch_ply(lidar_ply)
    xyz = np.concatenate([lidar_xyz.astype(np.float64), sfm_xyz], axis=0)
    rgb01 = np.concatenate(
        [lidar_rgb01, sfm_rgb.astype(np.float32) / 255.0], axis=0)
    store_ply(out_path, xyz.astype(np.float32),
              (rgb01 * 255).astype(np.uint8))
    return xyz, rgb01
