"""Pallas tile rasterizer vs the XLA sort+scan path: forward + gradients.

Runs in Pallas interpret mode on CPU; the TPU path compiles the same kernel
bodies (benched separately in scripts/gsbench.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudg_tpu.gs import rasterize as R
from mudg_tpu.gs import tile_raster as TR
from mudg_tpu.gs.gaussians import Gaussians, init_from_points


def _scene(n=300, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(0, spread, (n, 3)).astype(np.float32) + [0, 0, 10.0]
    # keep every point safely in front of the camera: behind-camera gaussians
    # produce inf/nan projections whose grads are masked but poison a
    # max-based tolerance scale
    xyz[:, 2] = np.clip(xyz[:, 2], 2.0, 25.0)
    rgb = rng.random((n, 3)).astype(np.float32)
    g = init_from_points(jnp.asarray(xyz), jnp.asarray(rgb), opacity=0.35)
    K = jnp.asarray([[60.0, 0, 48.0], [0, 60.0, 32.0], [0, 0, 1]])
    w2c = jnp.eye(4)
    return g, K, w2c


WIDTH, HEIGHT = 96, 64


def test_forward_matches_xla_path():
    g, K, w2c = _scene()
    ref = R.rasterize(g, K, w2c, width=WIDTH, height=HEIGHT,
                      max_per_tile=512, tiles_per_gaussian=36)
    out = TR.rasterize_pallas(g, K, w2c, width=WIDTH, height=HEIGHT,
                              max_pairs=8192)
    assert int(ref.n_dropped) == 0 and int(out.n_dropped) == 0
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=2e-5)
    # scene actually renders something
    assert float(jnp.max(out.alpha)) > 0.2


def test_forward_dense_occlusion():
    """Many overlapping opaque gaussians -> exercises the T<=T_MIN saturation
    path and multi-chunk tiles."""
    g, K, w2c = _scene(n=600, spread=0.8)
    g = g._replace(opacity=jnp.full_like(g.opacity, 3.0))  # sigmoid ~0.95
    ref = R.rasterize(g, K, w2c, width=WIDTH, height=HEIGHT,
                      max_per_tile=1024, tiles_per_gaussian=64)
    out = TR.rasterize_pallas(g, K, w2c, width=WIDTH, height=HEIGHT,
                              max_pairs=1 << 15)
    assert int(ref.n_dropped) == 0 and int(out.n_dropped) == 0
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=5e-5)


def test_gradients_match_xla_path():
    g, K, w2c = _scene(n=150)
    target = jnp.zeros((HEIGHT, WIDTH, 3)) + 0.25

    def loss_with(raster):
        def loss(means, log_scales, quats, opacity, colors):
            gg = Gaussians(means, log_scales, quats, opacity, colors, g.active)
            if raster == "xla":
                out = R.rasterize(gg, K, w2c, width=WIDTH, height=HEIGHT,
                                  max_per_tile=512, tiles_per_gaussian=36)
            else:
                out = TR.rasterize_pallas(gg, K, w2c, width=WIDTH,
                                          height=HEIGHT, max_pairs=8192)
            return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.alpha)
        return loss

    args = (g.means, g.log_scales, g.quats, g.opacity, g.colors)
    g_ref = jax.grad(loss_with("xla"), argnums=tuple(range(5)))(*args)
    g_out = jax.grad(loss_with("pallas"), argnums=tuple(range(5)))(*args)
    names = ["means", "log_scales", "quats", "opacity", "colors"]
    for name, a, b in zip(names, g_out, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        # absolute floor: near-zero gradient families (quats here are
        # ~1e-10 in this scene) would otherwise compare numerical noise —
        # the two paths' projections may fuse/round differently (the
        # pallas path remats the projection) at the 1e-10 level
        np.testing.assert_allclose(
            a, b, atol=2e-3 * scale + 1e-8,
            err_msg=f"grad mismatch for {name}")


def _brute_force(g, K, w2c, width, height):
    """Tiling-free per-pixel oracle: every gaussian composited over every
    pixel in depth order with the exact production cutoffs (ALPHA_MIN zero,
    0.999 clamp, T_MIN stop). Independent of AABBs/extents/tile culling, so
    it catches any pair the tiled paths wrongly cull."""
    from mudg_tpu.gs.gaussians import project_gaussians
    from mudg_tpu.gs.rasterize import ALPHA_MIN, T_MIN

    proj = project_gaussians(g, K, w2c, width=width, height=height)
    # depth order with stable ties (matches the (tile, depth, gi) sort)
    order = jnp.argsort(proj.depths, stable=True)
    px, py = jnp.meshgrid(jnp.arange(width, dtype=jnp.float32) + 0.5,
                          jnp.arange(height, dtype=jnp.float32) + 0.5,
                          indexing="xy")
    in_front = g.active & (proj.depths > 0.05)

    def body(carry, gi):
        color, depth, T = carry
        mu = proj.means2d[gi]
        a, b_, c = proj.conics[gi, 0], proj.conics[gi, 1], proj.conics[gi, 2]
        dx, dy = px - mu[0], py - mu[1]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b_ * dx * dy
        alpha = jnp.minimum(proj.opacities[gi] * jnp.exp(power), 0.999)
        alpha = jnp.where(in_front[gi] & (alpha >= ALPHA_MIN) & (T > T_MIN),
                          alpha, 0.0)
        w = alpha * T
        color = color + w[..., None] * g.colors[gi]
        depth = depth + w * proj.depths[gi]
        return (color, depth, T * (1.0 - alpha)), None

    c0 = jnp.zeros((height, width, 3))
    d0 = jnp.zeros((height, width))
    t0 = jnp.ones((height, width))
    (color, depth, T), _ = jax.lax.scan(body, (c0, d0, t0), order)
    return color, depth, 1.0 - T


def test_culling_is_exact_vs_brute_force():
    """Tight extents + the ellipse-tile cull must not change any output:
    mixed very-low / near-opaque opacities exercise both the shrunk and the
    grown (beyond-3-sigma) AABBs."""
    g, K, w2c = _scene(n=80)
    rng = np.random.default_rng(3)
    op = rng.choice([-4.0, -1.0, 3.0, 8.0], size=(g.n,)).astype(np.float32)
    g = g._replace(opacity=jnp.asarray(op))
    ref_c, ref_d, ref_a = _brute_force(g, K, w2c, WIDTH, HEIGHT)

    out = R.rasterize(g, K, w2c, width=WIDTH, height=HEIGHT,
                      max_per_tile=512, tiles_per_gaussian=64)
    assert int(out.n_dropped) == 0
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref_c), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref_a), atol=3e-5)

    out = TR.rasterize_pallas(g, K, w2c, width=WIDTH, height=HEIGHT,
                              max_pairs=8192)
    assert int(out.n_dropped) == 0
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref_c), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref_a), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref_d), atol=3e-4)
    assert float(jnp.max(out.alpha)) > 0.2  # scene isn't trivially empty


def test_overflow_reported_not_silent():
    g, K, w2c = _scene(n=400)
    out = TR.rasterize_pallas(g, K, w2c, width=WIDTH, height=HEIGHT,
                              max_pairs=256)
    assert int(out.n_dropped) > 0


def test_no_per_gaussian_tile_cap():
    """A giant gaussian covering every tile renders without truncation (the
    XLA path would clip it at tiles_per_gaussian)."""
    xyz = jnp.asarray([[0.0, 0.0, 4.0]])
    rgb = jnp.asarray([[1.0, 0.5, 0.25]])
    g = init_from_points(xyz, rgb, opacity=0.9, init_scale=3.0)
    K = jnp.asarray([[40.0, 0, 48.0], [0, 40.0, 32.0], [0, 0, 1]])
    out = TR.rasterize_pallas(g, K, jnp.eye(4), width=WIDTH, height=HEIGHT,
                              max_pairs=1024)
    alpha = np.asarray(out.alpha)
    assert int(out.n_dropped) == 0
    # covers the whole image, not just a 4x4-tile window around the center
    assert alpha[0, 0] > 0.05 and alpha[-1, -1] > 0.05 and alpha.min() > 0.0


def test_features_match_xla_path():
    """Extra per-gaussian feature channels (the semantic field's class
    distributions) composite identically on both backends, widening the pair
    pack to 32 lanes, and the color/depth/alpha outputs are unchanged by the
    extra payload."""
    g, K, w2c = _scene(n=200)
    rng = np.random.default_rng(7)
    feat = jnp.asarray(jax.nn.softmax(
        jnp.asarray(rng.normal(0, 2, (g.n, 19)).astype(np.float32)), -1))

    ref = R.rasterize(g, K, w2c, width=WIDTH, height=HEIGHT,
                      max_per_tile=512, tiles_per_gaussian=36, features=feat)
    out = TR.rasterize_pallas(g, K, w2c, width=WIDTH, height=HEIGHT,
                              max_pairs=8192, features=feat)
    base = TR.rasterize_pallas(g, K, w2c, width=WIDTH, height=HEIGHT,
                               max_pairs=8192)
    assert int(out.n_dropped) == 0
    assert out.features.shape == (HEIGHT, WIDTH, 19)
    np.testing.assert_allclose(np.asarray(out.features),
                               np.asarray(ref.features), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(base.color),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(base.depth),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(base.alpha),
                               atol=2e-5)
    assert float(jnp.max(out.alpha)) > 0.2


def test_feature_gradients_match_xla_path():
    """Gradients through the widened 32-lane pack: d(loss)/d(features) and
    d(loss)/d(geometry) agree with the XLA path when compositing a semantic
    cross-entropy-style loss."""
    g, K, w2c = _scene(n=120)
    rng = np.random.default_rng(11)
    logits0 = jnp.asarray(rng.normal(0, 1, (g.n, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, 8, (HEIGHT, WIDTH)))

    def loss_with(raster):
        def loss(means, opacity, logits):
            gg = g._replace(means=means, opacity=opacity)
            feat = jax.nn.softmax(logits, -1)
            if raster == "xla":
                out = R.rasterize(gg, K, w2c, width=WIDTH, height=HEIGHT,
                                  max_per_tile=512, tiles_per_gaussian=36,
                                  features=feat)
            else:
                out = TR.rasterize_pallas(gg, K, w2c, width=WIDTH,
                                          height=HEIGHT, max_pairs=8192,
                                          features=feat)
            p = out.features / jnp.maximum(out.alpha[..., None], 1e-6)
            onehot = jax.nn.one_hot(tgt, 8)
            ce = -jnp.log(jnp.sum(p * onehot, -1).clip(1e-8))
            mask = (out.alpha > 0.5).astype(jnp.float32)
            return (jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
                    + jnp.mean((out.color - 0.25) ** 2))
        return loss

    args = (g.means, g.opacity, logits0)
    g_ref = jax.grad(loss_with("xla"), argnums=(0, 1, 2))(*args)
    g_out = jax.grad(loss_with("pallas"), argnums=(0, 1, 2))(*args)
    for name, a, b in zip(["means", "opacity", "logits"], g_out, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a, b, atol=2e-3 * scale,
                                   err_msg=f"grad mismatch for {name}")


def test_semantic_training_on_pallas_backend():
    """refine-gs --semantic now runs on the Pallas backend (no XLA
    fallback): the semantic logits learn the supervising class map."""
    from mudg_tpu.gs import train as GT
    from mudg_tpu.gs import gaussians as G

    K = jnp.asarray([[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1]])
    w2c = jnp.eye(4)
    g = G.Gaussians(
        means=jnp.asarray([[0.0, 0.0, 4.0]]),
        log_scales=jnp.full((1, 3), np.log(0.3), jnp.float32),
        quats=jnp.asarray([[1.0, 0, 0, 0]]),
        opacity=jnp.asarray([12.0]),  # logit: sigmoid ~ 1
        colors=jnp.asarray([[0.5, 0.5, 0.5]]),
        active=jnp.asarray([True]),
    )
    target = TR.rasterize_pallas(g, K, w2c, width=32, height=32).color
    sem_ids = np.full((32, 32), 7, np.int32)

    cfg = GT.GSConfig(densify_every=10_000, semantic_weight=1.0, lr_sem=0.5,
                      backend="pallas", max_pairs=1024)
    views = [{"K": K, "w2c": w2c, "rgb": jnp.asarray(target),
              "sem_ids": jnp.asarray(sem_ids)}]
    state, history = GT.fit_scene(g, views, cfg, width=32, height=32,
                                  steps=20, log_every=5)
    assert state.gaussians.sem is not None
    assert int(jnp.argmax(state.gaussians.sem[0])) == 7
    assert history[-1]["loss"] < history[0]["loss"]


def test_bucket_grid():
    # {1, 1.25, 1.5, 1.75} x 2^k grid, ceiling semantics, CK-multiple
    for n in (1, 1000, 1024, 1100, 5_000_000, 19_999_999):
        b = TR._bucket(n, slack=1.0)
        assert b >= max(n, 1024) and b % TR.CK == 0
        # over-size bounded by one grid step (25%) + CK rounding
        assert b <= int(max(n, 1024) * 1.25) + TR.CK
    assert TR._bucket(1 << 20, slack=1.0) == 1 << 20  # exact grid point kept


def test_count_pairs_matches_enumeration():
    """count_pairs' total must equal the number of pairs build_pairs actually
    emits (derived from its per-tile counts with a drop-free budget)."""
    from mudg_tpu.gs.gaussians import project_gaussians, view_colors

    g, K, w2c = _scene(n=250)
    proj = project_gaussians(g, K, w2c, width=WIDTH, height=HEIGHT)
    rows, pairs = TR.count_pairs(proj, width=WIDTH, height=HEIGHT,
                                 max_rows=1 << 14)
    feats, bounds, nd = TR.build_pairs(
        proj, view_colors(g, w2c), width=WIDTH, height=HEIGHT,
        max_pairs=1 << 14)
    assert int(nd) == 0
    pe = int(pairs)
    assert int(rows) > 0 and pe > 0
    # authoritative cross-check via dropped-pair accounting (budgets must be
    # CK-aligned for the pack reshape): the next CK multiple >= pe is
    # drop-free; the CK multiple below pe drops exactly pe - budget pairs
    mp_hi = (pe + TR.CK - 1) // TR.CK * TR.CK
    _, _, nd_hi = TR.build_pairs(
        proj, view_colors(g, w2c), width=WIDTH, height=HEIGHT,
        max_pairs=mp_hi)
    assert int(nd_hi) == 0
    mp_lo = max((pe - 1) // TR.CK * TR.CK, TR.CK)
    if mp_lo < pe:
        _, _, nd_lo = TR.build_pairs(
            proj, view_colors(g, w2c), width=WIDTH, height=HEIGHT,
            max_pairs=mp_lo)
        assert int(nd_lo) == pe - mp_lo


def test_auto_budgets_drop_free_and_parity():
    g, K, w2c = _scene(n=300)
    mr, mp = TR.auto_budgets(g, K, w2c, width=WIDTH, height=HEIGHT)
    assert mp % TR.CK == 0 and mr >= 1024
    auto = TR.rasterize_pallas(g, K, w2c, width=WIDTH, height=HEIGHT,
                               max_pairs=mp, max_rows=mr)
    blind = TR.rasterize_pallas(g, K, w2c, width=WIDTH, height=HEIGHT,
                                max_pairs=1 << 14)
    assert int(auto.n_dropped) == 0
    np.testing.assert_allclose(np.asarray(auto.color),
                               np.asarray(blind.color), atol=1e-6)


def test_fit_scene_auto_budget():
    """cfg.max_pairs=None resolves per-scene budgets (pallas backend) and
    trains; the budget machinery must survive densify re-resolution."""
    from mudg_tpu.gs import train as GT

    g, K, w2c = _scene(n=40)
    target = TR.rasterize_pallas(g, K, w2c, width=32, height=32,
                                 max_pairs=4096).color
    cfg = GT.GSConfig(densify_every=5, backend="pallas", max_pairs=None)
    views = [{"K": K, "w2c": w2c, "rgb": jnp.asarray(target)}]
    state, history = GT.fit_scene(g, views, cfg, width=32, height=32,
                                  steps=12, log_every=4)
    assert np.isfinite(history[-1]["loss"])
