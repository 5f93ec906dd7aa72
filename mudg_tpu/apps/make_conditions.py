"""Offline condition-map generation: sparse RGB/depth for real + virtual poses.

Rebuild of `data_process/pipeline_process.py` + `tools/generate_sparse.py` +
`pipeline_depth.py` on top of the vectorized scatter renderer (render/splat):

  per scene directory (the preprocess output layout):
    scenario.pt            pickled dict with observers (cameras: intr/c2w/hw)
    objects/background.ply aggregated static background cloud
    objects_info.pkl       per-object clouds + per-frame poses + visibility
  outputs:
    sparse/<cam>/NNNNNNNN.jpg (+_bg/_obj/_mask), depth/<cam>/NNNNNNNN.npy
    virtual_sparse/, virtual_depth/ for +/-2m lateral shifts
    six_frames_depth/ aggregated 6-frame lidar depth with hidden-point removal

Usage:
    python -m mudg_tpu.apps.make_conditions --scene <dir> [--render_virtual]
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def _load_scene(scene: str):
    with open(os.path.join(scene, "scenario.pt"), "rb") as f:
        data = pickle.load(f)
    return data


def _camera_params(camera, index):
    hw = camera["data"]["hw"][index]
    K = np.asarray(camera["data"]["intr"][index], np.float32)
    c2w = np.asarray(camera["data"]["c2w"][index], np.float32)
    return int(hw[0]), int(hw[1]), K, c2w


def render_scene_conditions(
    scene: str,
    cameras=("camera_FRONT",),
    *,
    virtual: bool = False,
    shift: float = 2.0,
    limit_frames: int | None = None,
):
    """generate_dynamic_sparse / generate_virtual_dynamic_sparse equivalent."""
    import jax.numpy as jnp
    from ..render import splat as SP
    from ..render import pointcloud as PC
    from ..utils import media

    data = _load_scene(scene)
    observers = data["observers"]
    n_frames = observers["lidar_TOP"]["n_frames"]
    if limit_frames:
        n_frames = min(n_frames, limit_frames)

    bg_xyz, bg_rgb, _ = PC.fetch_ply(os.path.join(scene, "objects", "background.ply"))
    with open(os.path.join(scene, "objects_info.pkl"), "rb") as f:
        obj_info = pickle.load(f)
    obj_vis = PC.object_visibility_table(obj_info) if obj_info else None

    sparse_root = os.path.join(scene, "virtual_sparse" if virtual else "sparse")
    depth_root = os.path.join(scene, "virtual_depth" if virtual else "depth")

    for cam_name in cameras:
        camera = observers[cam_name]
        cam_sparse = os.path.join(sparse_root, cam_name)
        cam_depth = os.path.join(depth_root, cam_name)
        os.makedirs(cam_sparse, exist_ok=True)
        os.makedirs(cam_depth, exist_ok=True)

        for index in range(n_frames):
            h, w, K, c2w = _camera_params(camera, index)
            if obj_info:
                obj_xyz, obj_rgb = PC.merge_objects_at_frame(obj_info, obj_vis, index)
            else:
                obj_xyz = np.array([[1000.0, 1000.0, 1000.0]], np.float32)
                obj_rgb = np.zeros((1, 3), np.float32)

            poses = (
                SP.virtual_poses(c2w, shift=shift, with_original=True)[1:]
                if virtual else [c2w]
            )
            for vi, pose in enumerate(poses):
                color, depth, mask = SP.render_sparse_frame(
                    jnp.asarray(bg_xyz), jnp.asarray(bg_rgb),
                    jnp.asarray(obj_xyz, dtype=jnp.float32),
                    jnp.asarray(obj_rgb, dtype=jnp.float32),
                    jnp.asarray(K), jnp.asarray(pose),
                    height=h, width=w,
                )
                color = np.asarray(color)
                depth = np.asarray(depth)
                stem = (
                    f"{index:08d}_{vi + 1}" if virtual else f"{index:08d}"
                )
                media.save_image(
                    os.path.join(cam_sparse, stem + ".jpg"),
                    (np.clip(color, 0, 1) * 255).astype(np.uint8),
                )
                media.save_image(
                    os.path.join(cam_sparse, stem + "_mask.jpg"),
                    (np.asarray(mask).astype(np.uint8) * 255)[..., None].repeat(3, -1),
                )
                np.save(os.path.join(cam_depth, stem + ".npy"), depth)
            print(f"{cam_name} frame {index}: done")


def render_six_frame_depth(
    scene: str,
    cameras=("camera_FRONT",),
    *,
    window=(-2, 4),
    hpr_radius: float = 1e5,
    limit_frames: int | None = None,
):
    """pipeline_depth.py equivalent: aggregate lidar over frames [i-2, i+3],
    add visible dynamic objects, hidden-point removal from the camera center,
    splat to six_frames_depth/ + six_frames_sparse/."""
    import jax.numpy as jnp
    from ..render import splat as SP
    from ..render import pointcloud as PC
    from ..utils import media

    data = _load_scene(scene)
    observers = data["observers"]
    n_frames = observers["lidar_TOP"]["n_frames"]
    if limit_frames:
        n_frames = min(n_frames, limit_frames)

    with open(os.path.join(scene, "objects_info.pkl"), "rb") as f:
        obj_info = pickle.load(f)
    obj_vis = PC.object_visibility_table(obj_info) if obj_info else None

    # per-frame background clouds saved by the lidar step
    def load_frame_cloud(i):
        path = os.path.join(scene, "lidar_clouds", f"{i:08d}.ply")
        if os.path.exists(path):
            xyz, rgb, _ = PC.fetch_ply(path)
            return xyz, rgb
        return None

    for cam_name in cameras:
        camera = observers[cam_name]
        out_depth = os.path.join(scene, "six_frames_depth", cam_name)
        out_sparse = os.path.join(scene, "six_frames_sparse", cam_name)
        os.makedirs(out_depth, exist_ok=True)
        os.makedirs(out_sparse, exist_ok=True)

        for index in range(n_frames):
            h, w, K, c2w = _camera_params(camera, index)
            clouds = []
            colors = []
            for off in range(window[0], window[1]):
                j = index + off
                if 0 <= j < n_frames:
                    res = load_frame_cloud(j)
                    if res is not None:
                        clouds.append(res[0])
                        colors.append(
                            res[1] if res[1] is not None
                            else np.full_like(res[0], 0.5)
                        )
            if obj_info:
                oxyz, orgb = PC.merge_objects_at_frame(obj_info, obj_vis, index)
                clouds.append(oxyz.astype(np.float32))
                colors.append(orgb.astype(np.float32))
            if not clouds:
                continue
            xyz = np.concatenate(clouds, 0)
            rgb = np.concatenate(colors, 0)

            cam_center = c2w[:3, 3]
            vis = PC.hidden_point_removal(xyz.astype(np.float64), cam_center,
                                          radius=hpr_radius)
            xyz, rgb = xyz[vis], rgb[vis]

            color, depth = SP.splat_points(
                jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(K),
                jnp.asarray(np.linalg.inv(c2w)), height=h, width=w,
                point_size=2.5,
            )
            np.save(os.path.join(out_depth, f"{index:08d}.npy"), np.asarray(depth))
            media.save_image(
                os.path.join(out_sparse, f"{index:08d}.jpg"),
                (np.clip(np.asarray(color), 0, 1) * 255).astype(np.uint8),
            )
            print(f"{cam_name} six-frame depth {index}: done")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", required=True)
    p.add_argument("--cameras", nargs="+", default=["camera_FRONT"])
    p.add_argument("--render_virtual", action="store_true")
    p.add_argument("--six_frame_depth", action="store_true")
    p.add_argument("--shift", type=float, default=2.0)
    p.add_argument("--limit_frames", type=int, default=None)
    p.add_argument("--emit_virtual_items", default=None, metavar="PATH",
                   help="after rendering, write the virtual-pose inference "
                        "item list (generate_virtual_item.py equivalent)")
    p.add_argument("--window", type=int, default=16,
                   help="item window length for --emit_virtual_items")
    args = p.parse_args(argv)

    render_scene_conditions(
        args.scene, tuple(args.cameras), virtual=False,
        limit_frames=args.limit_frames,
    )
    if args.render_virtual:
        render_scene_conditions(
            args.scene, tuple(args.cameras), virtual=True, shift=args.shift,
            limit_frames=args.limit_frames,
        )
    if args.six_frame_depth:
        render_six_frame_depth(
            args.scene, tuple(args.cameras), limit_frames=args.limit_frames
        )
    if args.emit_virtual_items:
        from ..data.waymo import make_virtual_item_list, write_items

        items = make_virtual_item_list(
            args.scene, tuple(args.cameras), window=args.window)
        write_items(args.emit_virtual_items, items)
        print(f"wrote {len(items)} virtual items -> {args.emit_virtual_items}")


if __name__ == "__main__":
    main()
