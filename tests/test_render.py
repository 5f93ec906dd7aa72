"""Sparse-condition renderer: analytic projection/z-buffer checks (BASELINE
config 1 is CPU-runnable), voxel downsampling, HPR, PLY roundtrip."""
import numpy as np
import jax.numpy as jnp

from mudg_tpu.render import splat as SP
from mudg_tpu.render import pointcloud as PC


def _simple_camera(h=32, w=32, f=16.0):
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)  # camera at origin, z forward (OpenCV)
    return K, c2w


def test_projection_center_pixel():
    K, c2w = _simple_camera()
    xyz = jnp.array([[0.0, 0.0, 5.0]])  # on the optical axis
    u, v, z = SP.project_points(xyz, jnp.asarray(K), jnp.asarray(np.linalg.inv(c2w)))
    assert float(u[0]) == 16.0 and float(v[0]) == 16.0 and float(z[0]) == 5.0


def test_zbuffer_near_point_wins():
    K, c2w = _simple_camera()
    xyz = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 3.0]])
    rgb = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    color, depth = SP.splat_points(
        xyz, rgb, jnp.asarray(K), jnp.asarray(np.linalg.inv(c2w)),
        height=32, width=32, point_size=1,
    )
    np.testing.assert_allclose(np.asarray(color[16, 16]), [0, 1, 0])  # nearer green wins
    np.testing.assert_allclose(float(depth[16, 16]), 3.0)
    # empty background pixel is black with zero depth
    np.testing.assert_allclose(np.asarray(color[0, 0]), 0.0)
    assert float(depth[0, 0]) == 0.0


def test_point_size_footprint():
    K, c2w = _simple_camera()
    xyz = jnp.array([[0.0, 0.0, 4.0]])
    rgb = jnp.array([[1.0, 1.0, 1.0]])
    c1, _ = SP.splat_points(xyz, rgb, jnp.asarray(K), jnp.asarray(np.linalg.inv(c2w)),
                            height=32, width=32, point_size=1)
    c3, _ = SP.splat_points(xyz, rgb, jnp.asarray(K), jnp.asarray(np.linalg.inv(c2w)),
                            height=32, width=32, point_size=3)
    assert int((np.asarray(c1).sum(-1) > 0).sum()) == 1
    assert int((np.asarray(c3).sum(-1) > 0).sum()) == 9


def test_points_behind_camera_culled():
    K, c2w = _simple_camera()
    xyz = jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, 500.0]])  # behind + past zfar
    rgb = jnp.ones((2, 3))
    color, depth = SP.splat_points(xyz, rgb, jnp.asarray(K), jnp.asarray(np.linalg.inv(c2w)),
                                   height=32, width=32, point_size=1)
    assert float(jnp.max(color)) == 0.0


def test_virtual_poses_lateral_shift():
    c2w = np.eye(4, dtype=np.float64)
    c2w[:3, 3] = [10, 20, 30]
    poses = SP.virtual_poses(c2w, shift=2.0)
    assert len(poses) == 3
    np.testing.assert_allclose(poses[0], c2w)
    # identity rotation: lateral shift directly moves world x by -/+2
    np.testing.assert_allclose(poses[1][:3, 3], [8, 20, 30])
    np.testing.assert_allclose(poses[2][:3, 3], [12, 20, 30])


def test_render_sparse_frame_obj_overrides_bg():
    K, c2w = _simple_camera()
    bg_xyz = np.array([[0.0, 0.0, 10.0]], np.float32)
    bg_rgb = np.array([[1.0, 0.0, 0.0]], np.float32)
    # note: the mask needs ALL channels > 0 (np.all(obj_map > 0), reference
    # generate_sparse.py:99), so pure-primary colors never mask — use gray-blue
    obj_xyz = np.array([[0.0, 0.0, 5.0]], np.float32)
    obj_rgb = np.array([[0.1, 0.1, 1.0]], np.float32)
    color, depth, mask = SP.render_sparse_frame(
        jnp.asarray(bg_xyz), jnp.asarray(bg_rgb), jnp.asarray(obj_xyz),
        jnp.asarray(obj_rgb), jnp.asarray(K), jnp.asarray(c2w),
        height=32, width=32,
    )
    assert bool(mask[16, 16])
    np.testing.assert_allclose(np.asarray(color[16, 16]), [0.1, 0.1, 1.0])
    # dilated mask extends beyond the 4px splat
    assert int(np.asarray(mask).sum()) > 16


def test_voxel_downsample():
    xyz = np.array([[0.0, 0, 0], [0.01, 0, 0], [5.0, 5, 5]], np.float64)
    rgb = np.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1]])
    out_xyz, out_rgb = PC.voxel_downsample(xyz, rgb, voxel=0.1)
    assert out_xyz.shape == (2, 3)
    i = int(np.argmin(out_xyz[:, 0]))
    np.testing.assert_allclose(out_xyz[i], [0.005, 0, 0], atol=1e-9)
    np.testing.assert_allclose(out_rgb[i], [0.5, 0.5, 0], atol=1e-9)


def test_hidden_point_removal():
    # two points along +z from camera; the nearer occludes the farther
    xyz = np.array([[0, 0, 5.0], [0, 0, 10.0], [3, 0, 5.0], [0, 3, 5.0], [-3, 0, 5.0], [0, -3, 5.0]])
    cam = np.zeros(3)
    vis = PC.hidden_point_removal(xyz, cam, radius=1e4)
    assert 0 in vis      # near point visible
    assert 1 not in vis  # occluded point removed


def test_ply_roundtrip(tmp_path):
    xyz = np.random.randn(10, 3).astype(np.float32)
    rgb = (np.random.rand(10, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "pc.ply")
    PC.store_ply(path, xyz, rgb)
    x2, c2, n2 = PC.fetch_ply(path)
    np.testing.assert_allclose(x2, xyz, rtol=1e-6)
    np.testing.assert_allclose(c2 * 255, rgb, atol=0.5)


def test_merge_objects_at_frame():
    obj_info = [
        {
            "id": "a",
            "visibility": np.array([1, 0]),
            "transform_obj": [np.eye(4), np.eye(4)],
            "point_cloud": {"points": np.ones((5, 3)), "colors": np.zeros((5, 3))},
        }
    ]
    vis = PC.object_visibility_table(obj_info)
    xyz, rgb = PC.merge_objects_at_frame(obj_info, vis, 0)
    assert xyz.shape == (5, 3)
    # frame 1: object invisible -> far dummy point
    xyz1, _ = PC.merge_objects_at_frame(obj_info, vis, 1)
    np.testing.assert_allclose(xyz1, [[1000, 1000, 1000]])
