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
    colors: jnp.ndarray     # (N, 3) rgb in [0,1] — the view-independent
                            # (SH degree-0 / DC) component
    active: jnp.ndarray     # (N,) bool — fixed-capacity active mask
    sh: jnp.ndarray | None = None  # (N, K, 3) rest SH coefficients for
                            # view-dependent color (K = (deg+1)^2 - 1,
                            # deg <= 3); None = view-independent (legacy)
    sem: jnp.ndarray | None = None  # (N, S) semantic class logits for
                            # StreetGaussians-style semantic rendering
                            # (softmaxed + alpha-composited via the
                            # rasterizer's `features` channel); None = no
                            # semantic field
    group: jnp.ndarray | None = None  # (N,) int32 rigid-group id for dynamic
                            # scenes (StreetGaussians-style): 0 = static
                            # background, i>0 = tracked object i, whose
                            # means/quats are stored in the object's
                            # CANONICAL (box) frame and moved per frame by
                            # apply_group_transforms. None = fully static.
    sh_rot: jnp.ndarray | None = None  # (N, 3, 3) canonical->world rotation
                            # set TRANSIENTLY by apply_group_transforms when
                            # sh is present: view_colors rotates the view
                            # direction back into the canonical frame so a
                            # turning object's SH appearance turns with it.
                            # Never stored/trained; None on canonical trees.

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


# Real spherical-harmonics constants (the 3DGS convention; INRIA
# gaussian-splatting sh_utils.py is the de-facto reference ordering)
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def sh_degree_from_k(k: int) -> int:
    deg = {3: 1, 8: 2, 15: 3}.get(k)
    assert deg is not None, f"unsupported SH coefficient count {k}"
    return deg


def sh_basis(dirs, deg: int):
    """Real SH basis (rest bands 1..deg) at unit directions. (N,3)->(N,K)."""
    assert 1 <= deg <= 3, deg
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    out = [-_C1 * y, _C1 * z, -_C1 * x]
    if deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        out += [_C2[0] * x * y, _C2[1] * y * z, _C2[2] * (2 * zz - xx - yy),
                _C2[3] * x * z, _C2[4] * (xx - yy)]
    if deg >= 3:
        out += [_C3[0] * y * (3 * xx - yy), _C3[1] * x * y * z,
                _C3[2] * y * (4 * zz - xx - yy),
                _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                _C3[4] * x * (4 * zz - xx - yy), _C3[5] * z * (xx - yy),
                _C3[6] * x * (xx - 3 * yy)]
    return jnp.stack(out, -1)


def view_colors(g: Gaussians, w2c):
    """Per-gaussian color for the camera at w2c: the stored DC color plus
    the SH rest bands evaluated at the camera->gaussian direction, clamped
    at 0 (the 3DGS clamp_min convention). g.sh=None returns g.colors
    unchanged — bit-identical to the view-independent path."""
    if g.sh is None:
        return g.colors
    R, t = w2c[:3, :3], w2c[:3, 3]
    cam_pos = -R.T @ t
    d = g.means - cam_pos
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-8)
    if g.sh_rot is not None:
        # dynamic rigid groups: the coefficients live in the object's
        # canonical frame — rotate the (world) view direction back so the
        # appearance turns with the object (d_canonical = R_group^T d_world)
        d = jnp.einsum("nik,ni->nk", g.sh_rot, d)
    basis = sh_basis(d, sh_degree_from_k(g.sh.shape[1]))  # (N, K)
    return jnp.maximum(g.colors + jnp.einsum("nk,nkc->nc", basis, g.sh), 0.0)


def quat_mul(a, b):
    """Hamilton product of wxyz quaternions, broadcasting leading dims."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def rotmat_to_quat(R):
    """(..., 3, 3) -> (..., 4) wxyz, branchless (component magnitudes from
    the diagonal, signs from the off-diagonal antisymmetric part — exact for
    w > 0, which holds for tracked-box poses away from 180-degree flips;
    normalized at use by quat_to_rotmat anyway)."""
    r00, r11, r22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    w = jnp.sqrt(jnp.maximum(1 + r00 + r11 + r22, 0.0)) / 2
    x = jnp.sqrt(jnp.maximum(1 + r00 - r11 - r22, 0.0)) / 2
    y = jnp.sqrt(jnp.maximum(1 - r00 + r11 - r22, 0.0)) / 2
    z = jnp.sqrt(jnp.maximum(1 - r00 - r11 + r22, 0.0)) / 2
    x = jnp.copysign(x, R[..., 2, 1] - R[..., 1, 2])
    y = jnp.copysign(y, R[..., 0, 2] - R[..., 2, 0])
    z = jnp.copysign(z, R[..., 1, 0] - R[..., 0, 1])
    return jnp.stack([w, x, y, z], -1)


def apply_group_transforms(g: Gaussians, T, vis=None) -> Gaussians:
    """Move each rigid group's gaussians from their canonical frame into the
    current frame's world pose: T (G, 4, 4) canonical->world per group
    (row 0 = identity for the static background), vis (G,) bool visibility.
    Differentiable wrt the canonical means/quats (the transforms are data).
    g.group=None returns g unchanged (static scene)."""
    if g.group is None:
        return g
    T = jnp.asarray(T, jnp.float32)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    qT = rotmat_to_quat(R)                       # (G, 4)
    means = jnp.einsum("nij,nj->ni", R[g.group], g.means) + t[g.group]
    quats = quat_mul(qT[g.group], g.quats)
    active = g.active
    if vis is not None:
        active = active & jnp.asarray(vis).astype(bool)[g.group]
    out = g._replace(means=means, quats=quats, active=active)
    if g.sh is not None:
        out = out._replace(sh_rot=R[g.group])  # for view_colors (see field)
    return out


def with_sem(g: Gaussians, n_classes: int) -> Gaussians:
    """Attach zero-initialized semantic logits (uniform class prior)."""
    return g._replace(sem=jnp.zeros((g.n, n_classes), jnp.float32))


def with_sh(g: Gaussians, deg: int) -> Gaussians:
    """Attach zero-initialized rest-band SH coefficients (view-dependent
    color starts at the stored DC color, exactly the prior rendering)."""
    assert 1 <= deg <= 3, deg
    k = (deg + 1) ** 2 - 1
    return g._replace(sh=jnp.zeros((g.n, k, 3), jnp.float32))


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
    radii: jnp.ndarray    # (N,) pixel radius (3 sigma, isotropic bound)
    opacities: jnp.ndarray  # (N,) sigmoid
    visible: jnp.ndarray  # (N,) bool
    extents: jnp.ndarray  # (N, 2) tight per-axis AABB half-extents of the
                          # ellipse where alpha can still reach ALPHA_MIN:
                          # sqrt(qmax * diag(cov2d)) with qmax = 2*ln(255*op).
                          # Opacity-aware (low-opacity splats shrink) and
                          # anisotropy-aware — FlashGS-style pair culling.
    qmax: jnp.ndarray     # (N,) the alpha-cutoff level-set value itself


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

    # Flattened EWA covariance: the straightforward batched form
    # (Sigma = R_q S S^T R_q^T; R_c Sigma R_c^T; J . J^T) builds (N, 3, 3)
    # and (N, 2, 3) arrays whose tiny trailing dims tile-pad ~57x on TPU.
    # The forward fuses, but the BACKWARD materializes padded cotangents —
    # 9.4 + 4.7 + 4.7 G HBM at N=5M (round-5 q6 OOM). Expanding
    # B = J @ R_c @ R_q @ diag(S), cov2d = B B^T into per-entry (N,)
    # column arithmetic keeps fwd AND bwd purely elementwise.
    qn = g.quats / jnp.linalg.norm(
        g.quats, axis=-1, keepdims=True).clip(1e-8)
    qw, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    r = [[1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
          2 * (qx * qz + qw * qy)],
         [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
          2 * (qy * qz - qw * qx)],
         [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
          1 - 2 * (qx * qx + qy * qy)]]
    s = jnp.exp(g.log_scales)  # (N, 3)
    a = [[sum(R[j, m] * r[m][k] for m in range(3)) for k in range(3)]
         for j in range(3)]  # A = R_cam @ R_quat, as 9 (N,) columns
    j0 = fx / zc
    j1 = fy / zc
    j2x = -fx * p_cam[:, 0] / zc**2
    j2y = -fy * p_cam[:, 1] / zc**2
    c00 = c01 = c11 = 0.0
    for k in range(3):
        b0k = (j0 * a[0][k] + j2x * a[2][k]) * s[:, k]
        b1k = (j1 * a[1][k] + j2y * a[2][k]) * s[:, k]
        c00 = c00 + b0k * b0k
        c01 = c01 + b0k * b1k
        c11 = c11 + b1k * b1k
    # low-pass: ensure each splat covers ~a pixel (3DGS convention)
    c00 = c00 + eps2d
    c11 = c11 + eps2d

    det = c00 * c11 - c01 ** 2
    det = jnp.maximum(det, 1e-12)
    inv = jnp.stack([c11 / det, -c01 / det, c00 / det], -1)  # conic (a, b, c)

    # 3-sigma extent from the largest eigenvalue
    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid**2 - det, 0.0))
    radii = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    # Tight per-axis AABB of the alpha cutoff: the compositors zero every
    # alpha below ALPHA_MIN, so a splat contributes only where
    # op*exp(-q/2) >= 1/255  <=>  q(d) <= qmax := 2*ln(255*op). The AABB
    # half-extents of that ellipse are sqrt(qmax * diag(cov2d)) — exact, so
    # tiles outside contribute exactly 0 (and 0 grads) and may be culled.
    # This both shrinks low-opacity splats (op=0.1 -> 2.54 sigma) and fixes
    # the 3-sigma circle's truncation of near-opaque ones (op~1 -> 3.33).
    opacities = jax.nn.sigmoid(g.opacity)
    qmax = 2.0 * jnp.log(jnp.maximum(opacities, 1e-12) * 255.0)
    qpos = jnp.maximum(qmax, 0.0)
    ext = jnp.ceil(jnp.sqrt(
        qpos[:, None] * jnp.maximum(jnp.stack([c00, c11], -1), 0.0)))

    visible = (
        g.active
        & (z > near) & (z < far)
        & (u + ext[:, 0] > 0) & (u - ext[:, 0] < width)
        & (v + ext[:, 1] > 0) & (v - ext[:, 1] < height)
        & (qmax > 0) & (ext[:, 0] > 0) & (ext[:, 1] > 0)
    )
    return Projected(
        means2d=jnp.stack([u, v], -1),
        depths=z,
        conics=inv,
        radii=radii,
        opacities=opacities,
        visible=visible,
        extents=ext,
        qmax=qmax,
    )


def rect_qmin(mux, muy, ca, cb, cc, lx, hx, ly, hy):
    """Exact minimum of q(d) = ca*dx^2 + 2*cb*dx*dy + cc*dy^2 over the rect
    [lx,hx]x[ly,hy] around the mean (mux, muy). The conic is PD (ca, cc > 0,
    cb^2 < ca*cc after the eps2d low-pass), so q is convex: the minimum is 0
    when the mean lies inside, else it sits on one of the four edges, each a
    clamped 1D quadratic minimization in closed form. Used for exact
    ellipse-tile intersection culling (FlashGS-style, arXiv 2408.07967)."""
    dx0, dx1 = lx - mux, hx - mux
    dy0, dy1 = ly - muy, hy - muy
    # degenerate-conic guard: keeps the edge-minimizer ratios finite (a 0/0
    # NaN would wrongly cull); the clip below absorbs the huge-ratio case
    ca = jnp.maximum(ca, 1e-20)
    cc = jnp.maximum(cc, 1e-20)

    def q(dx, dy):
        return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

    inside = (dx0 <= 0) & (dx1 >= 0) & (dy0 <= 0) & (dy1 >= 0)
    qx0 = q(dx0, jnp.clip(-cb * dx0 / cc, dy0, dy1))
    qx1 = q(dx1, jnp.clip(-cb * dx1 / cc, dy0, dy1))
    qy0 = q(jnp.clip(-cb * dy0 / ca, dx0, dx1), dy0)
    qy1 = q(jnp.clip(-cb * dy1 / ca, dx0, dx1), dy1)
    qmin = jnp.minimum(jnp.minimum(qx0, qx1), jnp.minimum(qy0, qy1))
    return jnp.where(inside, 0.0, qmin)


# Safety margin on the cull threshold: the compositor computes q with a
# different op fusion order, so borderline pairs get a tiny benefit of the
# doubt (the margin admits alphas down to ~1/255 * (1 - 5e-4) — invisible).
QMAX_CULL_EPS = 1e-3


def ellipse_row_xrange(ca, cb, cc, Q, dyl, dyu):
    """Exact x-interval (relative to the mean) of {q(d) <= Q} restricted to
    dy in [dyl, dyu], where q = ca*dx^2 + 2*cb*dx*dy + cc*dy^2 is PD.

    At fixed dy the sublevel set is the interval m(dy) +- h(dy) with
    m = -(cb/ca)*dy, h = sqrt(ca*Q - det*dy^2)/ca (det = ca*cc - cb^2);
    the union over the clipped dy range has hi = max(m+h) attained either at
    an endpoint or at the interior argmax dy* = -cb*sqrt(Q/(cc*det)) where it
    equals the global half-extent sqrt(Q*cc/det) (and symmetrically for lo).
    Returns (lo, hi, nonempty)."""
    ca = jnp.maximum(ca, 1e-20)
    cc = jnp.maximum(cc, 1e-20)
    det = jnp.maximum(ca * cc - cb * cb, 1e-30)
    Qp = jnp.maximum(Q, 0.0)
    ey = jnp.sqrt(ca * Qp / det)          # dy support half-width
    nonempty = (dyl <= ey) & (dyu >= -ey) & (Q > 0)
    l = jnp.clip(dyl, -ey, ey)
    u = jnp.clip(dyu, -ey, ey)

    def mh(dy, sign):
        h = jnp.sqrt(jnp.maximum(ca * Qp - det * dy * dy, 0.0)) / ca
        return -(cb / ca) * dy + sign * h

    ex = jnp.sqrt(cc * Qp / det)          # global dx half-extent
    dy_star = -cb * jnp.sqrt(Qp / (cc * det))
    hi = jnp.where((dy_star >= l) & (dy_star <= u), ex,
                   jnp.maximum(mh(l, 1.0), mh(u, 1.0)))
    lo = jnp.where((-dy_star >= l) & (-dy_star <= u), -ex,
                   jnp.minimum(mh(l, -1.0), mh(u, -1.0)))
    return lo, hi, nonempty
