"""3DGS: projection math, analytic single-gaussian renders, depth ordering,
differentiability."""
import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.gs import gaussians as G
from mudg_tpu.gs.rasterize import rasterize


def _cam(h=32, w=32, f=32.0):
    K = jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4, dtype=jnp.float32)
    return K, w2c


def _one_gaussian(xyz=(0, 0, 4.0), color=(1, 0, 0), scale=0.15, opacity=8.0):
    return G.Gaussians(
        means=jnp.array([xyz], jnp.float32),
        log_scales=jnp.full((1, 3), np.log(scale), jnp.float32),
        quats=jnp.array([[1.0, 0, 0, 0]], jnp.float32),
        opacity=jnp.array([opacity], jnp.float32),  # sigmoid ~ 0.9997
        colors=jnp.array([color], jnp.float32),
        active=jnp.array([True]),
    )


def test_quat_identity_rotation():
    R = G.quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
    # 90deg about z
    s = np.sin(np.pi / 4)
    R = G.quat_to_rotmat(jnp.array([[np.cos(np.pi / 4), 0, 0, s]], jnp.float32))
    np.testing.assert_allclose(
        np.asarray(R[0]) @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-6
    )


def test_projection_center():
    K, w2c = _cam()
    g = _one_gaussian()
    p = G.project_gaussians(g, K, w2c, width=32, height=32)
    np.testing.assert_allclose(np.asarray(p.means2d[0]), [16, 16], atol=1e-5)
    assert float(p.depths[0]) == 4.0
    assert bool(p.visible[0])
    assert float(p.radii[0]) >= 1


def test_single_gaussian_render():
    K, w2c = _cam()
    g = _one_gaussian(color=(1, 0, 0))
    out = rasterize(g, K, w2c, width=32, height=32)
    c = np.asarray(out.color)
    # peak near the projected center (pixel center is +0.5 off the mean,
    # so peak alpha ~= exp(-0.5*|0.5,0.5|^2/sigma^2)), red, radial falloff
    assert c[16, 16, 0] > 0.8
    assert c[16, 16, 1] < 1e-3
    assert c[16, 16, 0] > c[16, 18, 0] > c[16, 19, 0] > 0
    # depth at center approximately the gaussian depth (alpha-weighted)
    assert abs(float(out.depth[16, 16]) / max(float(out.alpha[16, 16]), 1e-6) - 4.0) < 0.1


def test_depth_ordering_front_occludes_back():
    K, w2c = _cam()
    g = G.Gaussians(
        means=jnp.array([[0, 0, 6.0], [0, 0, 3.0]], jnp.float32),
        log_scales=jnp.full((2, 3), np.log(0.2), jnp.float32),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
        opacity=jnp.array([12.0, 12.0], jnp.float32),  # nearly opaque
        colors=jnp.array([[0, 1, 0], [1, 0, 0]], jnp.float32),
        active=jnp.array([True, True]),
    )
    out = rasterize(g, K, w2c, width=32, height=32)
    c = np.asarray(out.color[16, 16])
    assert c[0] > 0.9 and c[1] < 0.1  # near red wins over far green


def test_inactive_gaussians_ignored():
    K, w2c = _cam()
    g = _one_gaussian()
    g = g._replace(active=jnp.array([False]))
    out = rasterize(g, K, w2c, width=32, height=32)
    assert float(jnp.max(out.alpha)) == 0.0


def test_background_color():
    K, w2c = _cam()
    g = _one_gaussian()
    g = g._replace(active=jnp.array([False]))
    out = rasterize(g, K, w2c, width=32, height=32, bg_color=(0.2, 0.4, 0.6))
    np.testing.assert_allclose(np.asarray(out.color[0, 0]), [0.2, 0.4, 0.6], atol=1e-6)


def test_gradients_flow():
    K, w2c = _cam()
    g = _one_gaussian(color=(0.5, 0.5, 0.5))
    target = jnp.zeros((32, 32, 3))

    def loss(means, colors, opacity, log_scales):
        gg = g._replace(means=means, colors=colors, opacity=opacity,
                        log_scales=log_scales)
        out = rasterize(gg, K, w2c, width=32, height=32)
        return jnp.mean((out.color - target) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        g.means, g.colors, g.opacity, g.log_scales
    )
    for gr in grads:
        assert np.all(np.isfinite(np.asarray(gr)))
    # color gradient definitely nonzero (white gaussian on black target)
    assert float(jnp.abs(grads[1]).sum()) > 0
    assert float(jnp.abs(grads[2]).sum()) > 0


def test_rect_qmin_matches_dense_grid():
    """Closed-form convex-quadratic rect minimum vs dense evaluation."""
    rng = np.random.default_rng(0)
    n = 256
    # random PD conics: a, c > 0, b^2 < a*c
    a = rng.uniform(0.05, 3.0, n).astype(np.float32)
    c = rng.uniform(0.05, 3.0, n).astype(np.float32)
    b = (rng.uniform(-0.95, 0.95, n) * np.sqrt(a * c)).astype(np.float32)
    mux = rng.uniform(-20, 20, n).astype(np.float32)
    muy = rng.uniform(-20, 20, n).astype(np.float32)
    lx = rng.uniform(-12, 8, n).astype(np.float32)
    hx = lx + rng.uniform(1, 16, n).astype(np.float32)
    ly = rng.uniform(-12, 8, n).astype(np.float32)
    hy = ly + rng.uniform(1, 16, n).astype(np.float32)

    got = np.asarray(G.rect_qmin(*map(jnp.asarray, (mux, muy, a, b, c,
                                                    lx, hx, ly, hy))))
    # dense grid over each rect (edges included): grid min >= exact min, and
    # approaches it as the grid refines
    ts = np.linspace(0, 1, 41, dtype=np.float32)
    gx = lx[:, None, None] + (hx - lx)[:, None, None] * ts[None, :, None]
    gy = ly[:, None, None] + (hy - ly)[:, None, None] * ts[None, None, :]
    dx, dy = gx - mux[:, None, None], gy - muy[:, None, None]
    q = (a[:, None, None] * dx * dx + 2 * b[:, None, None] * dx * dy
         + c[:, None, None] * dy * dy)
    dense = q.reshape(n, -1).min(1)
    assert np.all(got <= dense + 1e-4)        # never overestimates
    assert np.all(dense - got < 0.8)          # and is tight (grid gap only)
    inside = ((mux >= lx) & (mux <= hx) & (muy >= ly) & (muy <= hy))
    np.testing.assert_allclose(got[inside], 0.0, atol=1e-6)


def test_row_xrange_matches_rect_qmin():
    """The ragged-row enumeration (ellipse_row_xrange) must include exactly
    the tiles the per-tile rect test includes (same Q, pixel-center rects),
    up to fp noise at the decision boundary."""
    rng = np.random.default_rng(1)
    n, T = 64, 16
    a = rng.uniform(0.001, 0.3, n).astype(np.float32)
    c = rng.uniform(0.001, 0.3, n).astype(np.float32)
    b = (rng.uniform(-0.9, 0.9, n) * np.sqrt(a * c)).astype(np.float32)
    mux = rng.uniform(-10, 170, n).astype(np.float32)
    muy = rng.uniform(-10, 170, n).astype(np.float32)
    Q = rng.uniform(2.0, 12.0, n).astype(np.float32)

    txs, tys = np.meshgrid(np.arange(10), np.arange(10), indexing="xy")
    txs, tys = txs.ravel(), tys.ravel()  # 100 tiles

    def bc(x):  # (n, 1) for broadcasting against (tiles,)
        return jnp.asarray(x)[:, None]

    lx = jnp.asarray(txs * T + 0.5)[None, :]
    hx = jnp.asarray(txs * T + T - 0.5)[None, :]
    ly = jnp.asarray(tys * T + 0.5)[None, :]
    hy = jnp.asarray(tys * T + T - 0.5)[None, :]
    qmin = np.asarray(G.rect_qmin(bc(mux), bc(muy), bc(a), bc(b), bc(c),
                                  lx, hx, ly, hy))
    inc_rect = qmin <= Q[:, None]

    lo, hi, ne = G.ellipse_row_xrange(bc(a), bc(b), bc(c), bc(Q),
                                      ly - bc(muy), hy - bc(muy))
    lo, hi, ne = np.asarray(lo), np.asarray(hi), np.asarray(ne)
    inc_row = ne & (np.asarray(lx) <= mux[:, None] + hi) \
        & (np.asarray(hx) >= mux[:, None] + lo)

    boundary = np.abs(qmin - Q[:, None]) < 1e-2
    mismatch = (inc_rect != inc_row) & ~boundary
    assert not mismatch.any(), f"{mismatch.sum()} mismatches off-boundary"
    # and the test is non-vacuous: plenty of included and excluded tiles
    assert inc_rect.sum() > 100 and (~inc_rect).sum() > 100


def test_extents_opacity_aware():
    """Low-opacity splats get smaller boxes; near-opaque slightly larger
    than 3 sigma (the cutoff ellipse extends past it)."""
    K, w2c = _cam()
    hi = _one_gaussian(opacity=8.0)    # sigmoid ~ 0.9997
    lo = _one_gaussian(opacity=-3.0)   # sigmoid ~ 0.047
    p_hi = G.project_gaussians(hi, K, w2c, width=32, height=32)
    p_lo = G.project_gaussians(lo, K, w2c, width=32, height=32)
    assert float(p_hi.extents[0, 0]) >= float(p_hi.radii[0])
    assert float(p_lo.extents[0, 0]) < float(p_lo.radii[0])
    # op below 1/255 can never pass the alpha cutoff -> invisible
    never = _one_gaussian(opacity=-6.0)  # sigmoid ~ 0.0025 < 1/255
    p_never = G.project_gaussians(never, K, w2c, width=32, height=32)
    assert not bool(p_never.visible[0])


def test_init_from_points_padding():
    xyz = jnp.ones((5, 3))
    rgb = jnp.full((5, 3), 0.5)
    g = G.init_from_points(xyz, rgb, capacity=8)
    assert g.n == 8
    assert int(g.active.sum()) == 5


def test_ssim_identity_and_range():
    from mudg_tpu.gs.train import ssim

    rng = jax.random.PRNGKey(0)
    a = jax.random.uniform(rng, (32, 32, 3))
    assert abs(float(ssim(a, a)) - 1.0) < 1e-5
    b = 1.0 - a
    assert float(ssim(a, b)) < 0.5


def test_gs_fit_converges_on_single_view():
    """A few optimization steps must reduce the loss on a fixed target."""
    from mudg_tpu.gs import train as GT

    K, w2c = _cam()
    # target: render of a known gaussian; init: perturbed color
    g_true = _one_gaussian(color=(0.9, 0.2, 0.1))
    target = rasterize(g_true, K, w2c, width=32, height=32).color
    g0 = _one_gaussian(color=(0.2, 0.8, 0.9))

    cfg = GT.GSConfig(densify_every=10_000, lr_colors=5e-2)
    state = GT.init_state(g0, cfg)
    step = GT.make_gs_train_step(cfg, width=32, height=32)
    zeros = jnp.zeros((32, 32), jnp.float32)
    losses = []
    for _ in range(30):
        state, m = step(state, K, w2c, target, zeros, zeros)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7
    color = np.asarray(state.gaussians.colors[0])
    assert abs(color[0] - 0.9) < 0.4  # moved toward the target red


def test_densify_prune_cycle():
    from mudg_tpu.gs import train as GT

    xyz = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)), jnp.float32)
    rgb = jnp.full((10, 3), 0.5)
    g = G.init_from_points(xyz, rgb, capacity=32)
    cfg = GT.GSConfig(prune_opacity_thresh=0.5)  # aggressive prune (init opacity 0.1)
    state = GT.init_state(g, cfg)
    state2 = GT.densify_and_prune(state, cfg)
    assert int(state2.gaussians.active.sum()) == 0  # all pruned

    # high fake gradients trigger cloning into free slots
    g2 = G.init_from_points(xyz, rgb, capacity=32)
    cfg2 = GT.GSConfig(prune_opacity_thresh=0.001, densify_grad_thresh=1e-9,
                       split_scale_thresh=1e9)
    st = GT.init_state(g2, cfg2)
    st = st._replace(grad_accum=jnp.ones((32,)), grad_count=jnp.ones((32,)))
    st2 = GT.densify_and_prune(st, cfg2)
    assert int(st2.gaussians.active.sum()) == 20  # 10 originals + 10 clones


def test_sh_basis_known_values():
    """Band values at canonical directions match the 3DGS constants."""
    d = jnp.array([[0.0, 0.0, 1.0]])
    b = np.asarray(G.sh_basis(d, 3))[0]
    np.testing.assert_allclose(b[1], 0.4886025119029199, rtol=1e-6)   # C1*z
    assert b[0] == 0 and b[2] == 0                                    # x=y=0
    np.testing.assert_allclose(b[5], 0.31539156525252005 * 2, rtol=1e-6)
    np.testing.assert_allclose(b[11], 0.3731763325901154 * 2, rtol=1e-6)
    assert G.sh_basis(d, 1).shape == (1, 3)
    assert G.sh_basis(d, 2).shape == (1, 8)
    assert G.sh_basis(d, 3).shape == (1, 15)


def test_sh_view_dependent_render():
    """Nonzero rest-band SH makes the rendered color depend on the camera
    position; zero SH is bit-identical to the sh=None render."""
    K, w2c = _cam()
    g = G.with_sh(_one_gaussian(color=(0.5, 0.5, 0.5)), 1)

    base = rasterize(_one_gaussian(color=(0.5, 0.5, 0.5)), K, w2c,
                     width=32, height=32).color
    zero = rasterize(g, K, w2c, width=32, height=32).color
    np.testing.assert_array_equal(np.asarray(zero), np.asarray(base))

    # red channel rises along the -x view direction (basis[2] = -C1*x)
    g = g._replace(sh=g.sh.at[0, 2, 0].set(0.5))
    w2c_left = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(2.0)   # cam at x=-2
    c_front = rasterize(g, K, w2c, width=32, height=32).color
    c_left = rasterize(g, K, w2c_left, width=32, height=32).color
    assert not np.allclose(np.asarray(c_front), np.asarray(c_left))
    # view_colors directly: the direction flips the sign of the x band
    col_a = np.asarray(G.view_colors(g, w2c))[0]
    col_b = np.asarray(G.view_colors(g, w2c_left))[0]
    assert abs(col_a[0] - col_b[0]) > 0.05
    np.testing.assert_allclose(col_a[1:], col_b[1:], atol=1e-6)


def test_sh_gradients_flow_and_training():
    """d(loss)/d(sh) is nonzero, and a few sh_degree>0 optimization steps
    reduce the loss (the sh field rides the optimizer + densify plumbing)."""
    from mudg_tpu.gs import train as GT

    K, w2c = _cam()
    g_true = _one_gaussian(color=(0.9, 0.2, 0.1))
    target = rasterize(g_true, K, w2c, width=32, height=32).color
    g0 = _one_gaussian(color=(0.2, 0.8, 0.9))

    cfg = GT.GSConfig(densify_every=10_000, lr_colors=5e-2, lr_sh=5e-2,
                      sh_degree=2)
    zeros = jnp.zeros((32, 32), jnp.float32)
    views = [{"K": K, "w2c": w2c, "rgb": target}]
    state, history = GT.fit_scene(g0, views, cfg, width=32, height=32,
                                  steps=25, log_every=5)
    assert state.gaussians.sh is not None
    assert state.gaussians.sh.shape == (1, 8, 3)
    assert history[-1]["loss"] < history[0]["loss"]
    # the sh coefficients actually moved (gradients flowed)
    assert float(jnp.abs(state.gaussians.sh).max()) > 0

    # densify copies sh rows alongside the other fields
    cfg2 = GT.GSConfig(prune_opacity_thresh=1e-4, densify_grad_thresh=1e-9,
                       split_scale_thresh=1e9, sh_degree=2)
    xyz = jnp.zeros((1, 3), jnp.float32)
    g2 = G.with_sh(G.init_from_points(xyz, jnp.full((1, 3), 0.5), capacity=4), 2)
    g2 = g2._replace(sh=g2.sh.at[0].set(0.25))
    st = GT.init_state(g2, cfg2)._replace(
        grad_accum=jnp.ones((4,)), grad_count=jnp.ones((4,)))
    st2 = GT.densify_and_prune(st, cfg2)
    assert int(st2.gaussians.active.sum()) == 2
    np.testing.assert_allclose(np.asarray(st2.gaussians.sh[1]), 0.25)


def test_rotmat_quat_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(5):
        yaw, pitch = rng.uniform(-1.2, 1.2, 2)
        Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                       [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
        Ry = np.array([[np.cos(pitch), 0, np.sin(pitch)], [0, 1, 0],
                       [-np.sin(pitch), 0, np.cos(pitch)]])
        R = jnp.asarray((Rz @ Ry)[None], jnp.float32)
        q = G.rotmat_to_quat(R)
        R2 = G.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_apply_group_transforms():
    """Rigid-group motion: group-1 means move by the frame transform, the
    background stays, invisible groups deactivate; group=None is a no-op."""
    g = G.Gaussians(
        means=jnp.array([[0, 0, 4.0], [0.5, 0, 4.0]], jnp.float32),
        log_scales=jnp.full((2, 3), np.log(0.1), jnp.float32),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (2, 1)),
        opacity=jnp.full((2,), 8.0, jnp.float32),
        colors=jnp.full((2, 3), 0.5, jnp.float32),
        active=jnp.array([True, True]),
        group=jnp.array([0, 1], jnp.int32),
    )
    T = jnp.stack([jnp.eye(4),
                   jnp.eye(4).at[0, 3].set(2.0)])  # group 1: +2 in x
    g2 = G.apply_group_transforms(g, T, jnp.array([True, True]))
    np.testing.assert_allclose(np.asarray(g2.means[0]), [0, 0, 4.0])
    np.testing.assert_allclose(np.asarray(g2.means[1]), [2.5, 0, 4.0])
    g3 = G.apply_group_transforms(g, T, jnp.array([True, False]))
    assert bool(g3.active[0]) and not bool(g3.active[1])
    assert G.apply_group_transforms(g._replace(group=None), T) is not None

    # rendering the transformed group matches a static gaussian placed at
    # the transformed position
    K, w2c = _cam()
    ref = _one_gaussian(xyz=(2.5, 0, 4.0), color=(0.5, 0.5, 0.5), scale=0.1)
    only_obj = g2._replace(active=jnp.array([False, True]))
    img_dyn = rasterize(only_obj, K, w2c, width=32, height=32).color
    img_ref = rasterize(ref, K, w2c, width=32, height=32).color
    np.testing.assert_allclose(np.asarray(img_dyn), np.asarray(img_ref),
                               atol=1e-5)


def test_dynamic_group_gradients_reach_canonical_means():
    """d(loss)/d(canonical means) is nonzero through the rigid transform —
    the dynamic-scene training path is differentiable end-to-end."""
    from mudg_tpu.gs import train as GT

    K, w2c = _cam()
    target = rasterize(_one_gaussian(xyz=(1.0, 0, 4.0)), K, w2c,
                       width=32, height=32).color
    g = _one_gaussian(xyz=(0.5, 0, 4.0))._replace(
        group=jnp.array([1], jnp.int32))
    T = jnp.stack([jnp.eye(4), jnp.eye(4).at[0, 3].set(0.3)])
    vis = jnp.array([True, True])

    def loss(means):
        gg = g._replace(means=means)
        gg = G.apply_group_transforms(gg, T, vis)
        out = rasterize(gg, K, w2c, width=32, height=32)
        return jnp.mean((out.color - target) ** 2)

    grad = jax.grad(loss)(g.means)
    assert float(jnp.abs(grad).max()) > 0


def test_semantic_feature_compositing():
    """features= composites per-gaussian vectors with the shared alpha walk:
    an opaque gaussian with a one-hot class vector dominates its footprint,
    and the plain-color output is unchanged by the extra channels."""
    K, w2c = _cam()
    g = _one_gaussian(color=(1, 0, 0), opacity=12.0)
    feat = jnp.zeros((1, 19)).at[0, 5].set(1.0)
    out = rasterize(g, K, w2c, width=32, height=32, features=feat)
    assert out.features.shape == (32, 32, 19)
    p = np.asarray(out.features[16, 16]) / max(float(out.alpha[16, 16]), 1e-6)
    assert p.argmax() == 5 and p[5] > 0.99
    base = rasterize(g, K, w2c, width=32, height=32)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(base.color),
                               atol=1e-6)
    assert base.features is None


def test_semantic_field_training():
    """fit_scene(semantic_weight>0): the per-gaussian semantic logits learn
    the supervising class map (holdout-style argmax matches at the center)."""
    from mudg_tpu.gs import train as GT

    K, w2c = _cam()
    g = _one_gaussian(color=(0.5, 0.5, 0.5), opacity=12.0)
    target = rasterize(g, K, w2c, width=32, height=32).color
    sem_ids = np.full((32, 32), 7, np.int32)

    cfg = GT.GSConfig(densify_every=10_000, semantic_weight=1.0, lr_sem=0.5,
                      backend="xla")
    views = [{"K": K, "w2c": w2c, "rgb": jnp.asarray(target),
              "sem_ids": jnp.asarray(sem_ids)}]
    state, history = GT.fit_scene(g, views, cfg, width=32, height=32,
                                  steps=20, log_every=5)
    assert state.gaussians.sem is not None
    assert int(jnp.argmax(state.gaussians.sem[0])) == 7
    assert history[-1]["loss"] < history[0]["loss"]


def test_opacity_reset():
    """reset_opacity clamps every opacity to <= the ceiling (floater
    control, 3DGS cadence) and leaves lower opacities untouched."""
    from mudg_tpu.gs import train as GT

    xyz = jnp.zeros((3, 3), jnp.float32)
    g = G.init_from_points(xyz, jnp.full((3, 3), 0.5), capacity=3)
    g = g._replace(opacity=jnp.array([8.0, -6.0, 0.0]))
    st = GT.init_state(g, GT.GSConfig())
    st2 = GT.reset_opacity(st, GT.GSConfig(), ceiling=0.01)
    op = 1 / (1 + np.exp(-np.asarray(st2.gaussians.opacity)))
    assert np.all(op <= 0.0101)
    np.testing.assert_allclose(np.asarray(st2.gaussians.opacity[1]), -6.0)


def test_appearance_compensation():
    """Per-view affine exposure compensation: with two targets of the SAME
    scene at different exposures, the appearance-enabled fit reaches a lower
    loss than the plain fit, and the darker view's learned transform
    deviates from identity."""
    from mudg_tpu.gs import train as GT

    K, w2c = _cam()
    # frame-filling content: a global affine needs signal on most pixels
    # (an empty background makes the SSIM gradient on it degenerate)
    g_true = _one_gaussian(color=(0.8, 0.6, 0.4), scale=2.0, opacity=12.0)
    base = rasterize(g_true, K, w2c, width=32, height=32).color
    views = [
        {"K": K, "w2c": w2c, "rgb": base},
        {"K": K, "w2c": w2c, "rgb": base * 0.6},  # exposure drift
    ]
    g0 = _one_gaussian(color=(0.5, 0.5, 0.5), scale=2.0, opacity=12.0)

    def run(appearance):
        cfg = GT.GSConfig(densify_every=10_000, lr_colors=2e-2,
                          lr_appearance=5e-3, appearance=appearance,
                          backend="xla", opacity_reset_every=0)
        state, hist = GT.fit_scene(g0, views, cfg, width=32, height=32,
                                   steps=80, log_every=80, seed=3)
        return state, hist[-1]["loss"]

    st_plain, loss_plain = run(False)
    st_app, loss_app = run(True)
    assert st_plain.appearance is None
    assert st_app.appearance is not None and st_app.appearance.shape == (2, 3, 4)
    # the inconsistent exposures put a floor under the plain fit; the
    # appearance transform removes it (measured ~0.08 vs ~0.004)
    assert loss_app < loss_plain * 0.5
    dev = np.abs(np.asarray(st_app.appearance[1])
                 - np.asarray(GT._identity_appearance(1)[0]))
    assert dev.max() > 0.02  # the drifted view learned a non-identity map


def test_sh_rotates_with_dynamic_group():
    """A rotated object's SH appearance turns with it: the transformed
    object viewed from the rotated direction matches the canonical object
    viewed from the canonical direction (and would NOT without the
    canonical-frame view-direction correction)."""
    rngv = np.random.default_rng(5)
    g = G.with_sh(_one_gaussian(xyz=(1.0, 0, 4.0), color=(0.5, 0.5, 0.5)), 2)
    g = g._replace(
        sh=jnp.asarray(rngv.normal(0, 0.2, g.sh.shape).astype(np.float32)),
        group=jnp.array([1], jnp.int32))
    yaw = 0.7
    Rz = np.eye(4, dtype=np.float32)
    Rz[:3, :3] = [[np.cos(yaw), -np.sin(yaw), 0],
                  [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
    T = jnp.stack([jnp.eye(4), jnp.asarray(Rz)])
    g_t = G.apply_group_transforms(g, T, jnp.array([True, True]))
    assert g_t.sh_rot is not None

    K, w2c = _cam()  # camera at the origin in both cases
    col_t = np.asarray(G.view_colors(g_t, w2c))
    col_c = np.asarray(G.view_colors(g._replace(group=None), w2c))
    np.testing.assert_allclose(col_t, col_c, atol=1e-5)
    col_wrong = np.asarray(G.view_colors(g_t._replace(sh_rot=None), w2c))
    assert np.abs(col_wrong - col_c).max() > 1e-3


def test_inria_ply_roundtrip(tmp_path):
    """INRIA-layout PLY export/import (gs/io.py): all fields roundtrip
    bit-exactly, the channel-major f_rest flattening matches the reference
    layout, and inactive slots are dropped on export."""
    from mudg_tpu.gs import io as GIO

    rng = np.random.default_rng(9)
    n = 7
    g = G.Gaussians(
        means=jnp.asarray(rng.normal(0, 2, (n, 3)).astype(np.float32)),
        log_scales=jnp.asarray(rng.normal(-2, 0.3, (n, 3)).astype(np.float32)),
        quats=jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
        opacity=jnp.asarray(rng.normal(0, 2, (n,)).astype(np.float32)),
        colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        active=jnp.asarray([True] * 5 + [False] * 2),
        sh=jnp.asarray(rng.normal(0, 0.1, (n, 8, 3)).astype(np.float32)),
    )
    path = str(tmp_path / "pc.ply")
    assert GIO.save_gaussians_ply(path, g) == 5
    g2 = GIO.load_gaussians_ply(path)
    assert g2.n == 5 and bool(g2.active.all())
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means[:5]))
    np.testing.assert_allclose(np.asarray(g2.log_scales),
                               np.asarray(g.log_scales[:5]))
    np.testing.assert_allclose(np.asarray(g2.quats), np.asarray(g.quats[:5]))
    np.testing.assert_allclose(np.asarray(g2.opacity),
                               np.asarray(g.opacity[:5]))
    np.testing.assert_allclose(np.asarray(g2.colors), np.asarray(g.colors[:5]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.sh), np.asarray(g.sh[:5]),
                               atol=1e-7)
    # identical renders from the roundtripped scene
    K, w2c = _cam()
    a = rasterize(g._replace(active=g.active), K, w2c, width=32, height=32)
    b = rasterize(g2, K, w2c, width=32, height=32)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                               atol=1e-5)
