"""Z-buffered point splatting as vectorized scatter ops (jit-able).

TPU/vectorized replacement for the reference's pyrender/OpenGL offscreen
point rasterizer (`data_process/tools/generate_sparse.py:48-63`): points are
projected with OpenCV-convention intrinsics/extrinsics (no GL axis flip
needed — we work in OpenCV camera axes directly, absorbing the T_cv2gl dance
at generate_sparse.py:57-61), splatted with a square footprint of
`point_size` pixels (GL_POINTS semantics), and composited by a scatter-min
z-buffer instead of GL depth testing.

Winner resolution is exact: depth is bit-packed with the point index into a
single int32 key per pixel (monotonic float32->int mapping), one scatter-min
resolves both depth and color owner.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ZNEAR = 1e-4   # generate_sparse.py:48
ZFAR = 200.0


def project_points(xyz, K, w2c):
    """World points (N,3) -> pixel coords + depth under OpenCV convention.

    K: (3,3) intrinsics; w2c: (4,4) world-to-camera. Returns (u, v, z) float.
    """
    cam = xyz @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * cam[:, 0] / zs + K[0, 2]
    v = K[1, 1] * cam[:, 1] / zs + K[1, 2]
    return u, v, z


def _footprint_offsets(point_size: float):
    """GL_POINTS square footprint: a point of size s covers ceil(s) pixels
    centered on the projected position."""
    s = max(int(round(point_size)), 1)
    lo = -(s // 2)
    offs = [(dy, dx) for dy in range(lo, lo + s) for dx in range(lo, lo + s)]
    return tuple(offs)


@partial(jax.jit, static_argnames=("height", "width", "point_size"))
def splat_points(
    xyz, rgb, K, w2c, *, height: int, width: int, point_size: float = 2.5,
):
    """Render points to (color_map (H,W,3), depth_map (H,W)).

    rgb in [0,1]; background is black / depth 0 like the reference scene
    (bg_color=[0,0,0], generate_sparse.py:51; empty depth pixels are 0).
    """
    n = xyz.shape[0]
    u, v, z = project_points(xyz, K, w2c)
    valid = (z > ZNEAR) & (z < ZFAR)

    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)

    # positive float32 depths bitcast to int32 preserve ordering (sign bit 0),
    # so a plain int32 scatter-min is an exact depth test
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(z, 0.0).astype(jnp.float32), jnp.int32
    )
    inf_bits = jnp.int32(0x7F800000)  # +inf
    offsets = _footprint_offsets(point_size)

    def targets():
        for dy, dx in offsets:
            yy = vi + dy
            xx = ui + dx
            ok = valid & (yy >= 0) & (yy < height) & (xx >= 0) & (xx < width)
            yield ok, jnp.where(ok, yy * width + xx, 0)

    # pass 1: winning depth per pixel
    zbuf = jnp.full((height * width,), inf_bits, dtype=jnp.int32)
    for ok, flat in targets():
        zbuf = zbuf.at[flat].min(jnp.where(ok, depth_bits, inf_bits), mode="drop")

    # pass 2: among depth winners, lowest point index owns the pixel
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(2**30)
    ibuf = jnp.full((height * width,), big, dtype=jnp.int32)
    for ok, flat in targets():
        wins = ok & (depth_bits == zbuf[flat])
        ibuf = ibuf.at[flat].min(jnp.where(wins, idx, big), mode="drop")

    hit = ibuf != big
    win_idx = jnp.where(hit, ibuf, 0)
    depth = jax.lax.bitcast_convert_type(zbuf, jnp.float32)

    color = jnp.where(hit[:, None], rgb[win_idx], 0.0)
    depth = jnp.where(hit, depth, 0.0)
    return color.reshape(height, width, 3), depth.reshape(height, width)


def dilate_mask(mask, kernel: int = 5, iterations: int = 3):
    """Binary dilation via max-pooling (cv2.dilate equivalent,
    generate_sparse.py:100)."""
    m = mask.astype(jnp.float32)[None, :, :, None]
    pad = kernel // 2
    for _ in range(iterations):
        m = jax.lax.reduce_window(
            m, -jnp.inf, jax.lax.max, (1, kernel, kernel, 1), (1, 1, 1, 1),
            [(0, 0), (pad, pad), (pad, pad), (0, 0)],
        )
    return (m[0, :, :, 0] > 0.5)


def render_sparse_frame(
    bg_xyz, bg_rgb, obj_xyz, obj_rgb, K, c2w, *, height: int, width: int,
    bg_point_size: float = 2.5, obj_point_size: float = 4.0,
):
    """Full sparse-condition frame: background + dynamic objects merged via a
    dilated object mask (generate_dynamic_sparse, generate_sparse.py:10-113).

    Returns (color (H,W,3) in [0,1], depth (H,W), mask (H,W) bool).
    """
    w2c = jnp.linalg.inv(c2w)
    bg_color, bg_depth = splat_points(
        bg_xyz, bg_rgb, K, w2c, height=height, width=width,
        point_size=bg_point_size,
    )
    obj_color, obj_depth = splat_points(
        obj_xyz, obj_rgb, K, w2c, height=height, width=width,
        point_size=obj_point_size,
    )
    # reference thresholds the *uint8 jpg* at >0 on all channels
    # (generate_sparse.py:99); equivalent float threshold at half a level
    mask = jnp.all(obj_color > (0.5 / 255.0), axis=2)
    mask = dilate_mask(mask)
    mf = mask.astype(bg_color.dtype)
    color = bg_color * (1 - mf[:, :, None]) + obj_color * mf[:, :, None]
    depth = bg_depth * (1 - mf) + obj_depth * mf
    return color, depth, mask


def virtual_poses(c2w: np.ndarray, shift: float = 2.0, with_original: bool = True):
    """Laterally shifted novel-view camera poses: c2w @ T(±shift along cam x)
    (generate_sparse.py:263-278)."""
    out = [c2w] if with_original else []
    for direction in (-1.0, 1.0):
        v = np.eye(4, dtype=c2w.dtype)
        v[0, 3] += round(direction * shift, 4)
        out.append(c2w @ v)
    return out
