"""3D Gaussian scene representation: parameters + screen-space projection.

The reference delegates 3DGS refinement to external CUDA rasterizers
(StreetGaussians, README.md:113-114); this subsystem provides the TPU-native
equivalent. Gaussians are a flat pytree of arrays (fixed capacity N with an
active mask, so shapes stay static across densify/prune cycles).

Projection follows the EWA splatting pipeline (Zwicker et al., the 3DGS
convention): world-space covariance R S S^T R^T, camera projection with a
local affine (Jacobian) approximation, 2D covariance + 0.3px low-pass.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Gaussians(NamedTuple):
    means: jnp.ndarray      # (N, 3) world positions
    log_scales: jnp.ndarray # (N, 3)
    quats: jnp.ndarray      # (N, 4) wxyz, unnormalized
    opacity: jnp.ndarray    # (N,) logit
    colors: jnp.ndarray     # (N, 3) rgb in [0,1] (logit-free; SH deg 0)
    active: jnp.ndarray     # (N,) bool — fixed-capacity active mask

    @property
    def n(self):
        return self.means.shape[0]


def init_from_points(xyz, rgb, capacity: int | None = None,
                     init_scale: float | None = None, opacity: float = 0.1):
    """Seed gaussians from a (colored) point cloud (the LiDAR cloud in the
    MuDG pipeline). Pads to `capacity` with inactive slots."""
    n = xyz.shape[0]
    capacity = capacity or n
    assert capacity >= n
    if init_scale is None:
        # mean nearest-neighbor-ish spacing heuristic from bbox volume
        bbox = jnp.ptp(xyz, axis=0)
        init_scale = float((jnp.prod(bbox) / max(n, 1)) ** (1 / 3) + 1e-4)

    pad = capacity - n
    means = jnp.concatenate([xyz, jnp.zeros((pad, 3), xyz.dtype)])
    colors = jnp.concatenate([rgb, jnp.zeros((pad, 3), rgb.dtype)])
    return Gaussians(
        means=means,
        log_scales=jnp.full((capacity, 3), jnp.log(init_scale), jnp.float32),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (capacity, 1)),
        opacity=jnp.full((capacity,), jnp.log(opacity / (1 - opacity)), jnp.float32),
        colors=colors,
        active=jnp.arange(capacity) < n,
    )


def quat_to_rotmat(q):
    """(N,4) wxyz -> (N,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)


def covariance3d(g: Gaussians):
    """Sigma = R S S^T R^T, (N,3,3)."""
    R = quat_to_rotmat(g.quats)
    S = jnp.exp(g.log_scales)
    RS = R * S[:, None, :]
    return RS @ RS.transpose(0, 2, 1)


class Projected(NamedTuple):
    means2d: jnp.ndarray  # (N, 2) pixel coords
    depths: jnp.ndarray   # (N,)
    conics: jnp.ndarray   # (N, 3) inverse 2D covariance (a, b, c) for
                          # a*dx^2 + 2*b*dx*dy + c*dy^2
    radii: jnp.ndarray    # (N,) pixel radius (3 sigma)
    opacities: jnp.ndarray  # (N,) sigmoid
    visible: jnp.ndarray  # (N,) bool


def project_gaussians(g: Gaussians, K, w2c, *, width: int, height: int,
                      near: float = 0.05, far: float = 500.0,
                      eps2d: float = 0.3) -> Projected:
    """EWA projection of all gaussians into one camera (OpenCV convention)."""
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    p_cam = g.means @ R.T + t
    z = p_cam[:, 2]
    zc = jnp.maximum(z, 1e-6)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = fx * p_cam[:, 0] / zc + cx
    v = fy * p_cam[:, 1] / zc + cy

    # Jacobian of the projection at each mean
    zero = jnp.zeros_like(z)
    J = jnp.stack([
        jnp.stack([fx / zc, zero, -fx * p_cam[:, 0] / zc**2], -1),
        jnp.stack([zero, fy / zc, -fy * p_cam[:, 1] / zc**2], -1),
    ], -2)  # (N, 2, 3)

    sigma = covariance3d(g)
    sigma_cam = R[None] @ sigma @ R.T[None]
    cov2d = J @ sigma_cam @ J.transpose(0, 2, 1)  # (N, 2, 2)
    # low-pass: ensure each splat covers ~a pixel (3DGS convention)
    cov2d = cov2d + eps2d * jnp.eye(2)[None]

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2
    det = jnp.maximum(det, 1e-12)
    inv = jnp.stack([
        cov2d[:, 1, 1] / det, -cov2d[:, 0, 1] / det, cov2d[:, 0, 0] / det
    ], -1)  # conic (a, b, c)

    # 3-sigma extent from the largest eigenvalue
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam1 = mid + jnp.sqrt(jnp.maximum(mid**2 - det, 0.0))
    radii = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    visible = (
        g.active
        & (z > near) & (z < far)
        & (u + radii > 0) & (u - radii < width)
        & (v + radii > 0) & (v - radii < height)
        & (radii > 0)
    )
    return Projected(
        means2d=jnp.stack([u, v], -1),
        depths=z,
        conics=inv,
        radii=radii,
        opacities=jax.nn.sigmoid(g.opacity),
        visible=visible,
    )
