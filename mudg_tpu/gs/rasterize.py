"""Differentiable tile-based Gaussian rasterization (XLA sort + composite).

TPU-native replacement for the external CUDA 3DGS rasterizer the reference
relies on (StreetGaussians, README.md:113-114). Design:

  1. project gaussians (gs/gaussians.py),
  2. build (tile, depth)-ordered keys by duplicating each gaussian across the
     tiles its 3-sigma box covers (bounded by MAX_TILES_PER_GAUSSIAN — static
     shapes; overflowing tiles are dropped and logged by the caller),
  3. one global variadic sort by (tile_id, depth), int64-free,
  4. per-tile segment extraction via searchsorted into a fixed-capacity
     (tiles, K) index table,
  5. front-to-back alpha compositing vectorized over all pixels of all tiles
     with a lax.scan over the capacity dimension and transmittance masking
     (the early-termination analog; compute is masked, not skipped —
     XLA-friendly).

Everything is differentiable end-to-end: gradients flow to means, scales,
quats, opacity, colors through the composite. The sort/gather is a
permutation, so autodiff handles it exactly.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussians import (Gaussians, Projected, project_gaussians,
                        QMAX_CULL_EPS, rect_qmin as G_rect_qmin, view_colors)

TILE = 16
ALPHA_MIN = 1.0 / 255.0
T_MIN = 1e-4  # stop compositing below this transmittance (3DGS convention)


class RasterOut(NamedTuple):
    color: jnp.ndarray   # (H, W, 3)
    depth: jnp.ndarray   # (H, W) alpha-weighted expected depth
    alpha: jnp.ndarray   # (H, W) accumulated opacity
    n_dropped: jnp.ndarray  # scalar: gaussian-tile pairs beyond capacity
    features: jnp.ndarray | None = None  # (H, W, C) alpha-composited extra
                         # per-gaussian features (e.g. the semantic class
                         # distributions of refine-gs --semantic); None
                         # unless `features` was passed


def _tile_grid(width, height):
    tw = (width + TILE - 1) // TILE
    th = (height + TILE - 1) // TILE
    return tw, th


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "max_per_tile", "tiles_per_gaussian"),
)
def rasterize(
    g: Gaussians,
    K,
    w2c,
    *,
    width: int,
    height: int,
    max_per_tile: int = 256,
    tiles_per_gaussian: int = 16,
    bg_color=(0.0, 0.0, 0.0),
    features=None,
):
    """features: optional (N, C) per-gaussian vectors alpha-composited
    alongside the color (same weights, shared transmittance walk); returned
    as RasterOut.features (H, W, C). Used for semantic class distributions
    (StreetGaussians-style semantic rendering)."""
    proj = project_gaussians(g, K, w2c, width=width, height=height)
    tw, th = _tile_grid(width, height)
    n_tiles = tw * th
    n = g.n
    tpg = tiles_per_gaussian

    # --- gaussian -> tile duplication (static tpg slots per gaussian) -------
    # tight per-axis opacity-aware AABB (gaussians.py extents): exact wrt the
    # ALPHA_MIN cutoff, so culled tiles lose exactly-zero contributions
    x0 = jnp.floor((proj.means2d[:, 0] - proj.extents[:, 0]) / TILE).astype(jnp.int32)
    x1 = jnp.floor((proj.means2d[:, 0] + proj.extents[:, 0]) / TILE).astype(jnp.int32)
    y0 = jnp.floor((proj.means2d[:, 1] - proj.extents[:, 1]) / TILE).astype(jnp.int32)
    y1 = jnp.floor((proj.means2d[:, 1] + proj.extents[:, 1]) / TILE).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, tw - 1); x1 = jnp.clip(x1, 0, tw - 1)
    y0 = jnp.clip(y0, 0, th - 1); y1 = jnp.clip(y1, 0, th - 1)
    span_x = x1 - x0 + 1
    span_y = y1 - y0 + 1

    slot = jnp.arange(tpg, dtype=jnp.int32)
    sx = slot[None, :] % jnp.maximum(span_x, 1)[:, None]
    sy = slot[None, :] // jnp.maximum(span_x, 1)[:, None]
    tile_x = x0[:, None] + sx
    tile_y = y0[:, None] + sy
    pair_valid = (
        proj.visible[:, None]
        & (slot[None, :] < span_x[:, None] * span_y[:, None])
        & (tile_y <= y1[:, None])
    )
    # exact ellipse-tile intersection: keep a pair only if q can reach qmax
    # somewhere among the tile's pixel centers (min over the center rect)
    qmin = G_rect_qmin(
        proj.means2d[:, 0:1], proj.means2d[:, 1:2],
        proj.conics[:, 0:1], proj.conics[:, 1:2], proj.conics[:, 2:3],
        tile_x.astype(jnp.float32) * TILE + 0.5,
        tile_x.astype(jnp.float32) * TILE + (TILE - 0.5),
        tile_y.astype(jnp.float32) * TILE + 0.5,
        tile_y.astype(jnp.float32) * TILE + (TILE - 0.5),
    )
    pair_valid &= qmin <= proj.qmax[:, None] + QMAX_CULL_EPS
    n_dropped = jnp.sum(
        jnp.maximum(span_x * span_y - tpg, 0) * proj.visible
    )
    tile_id = jnp.where(pair_valid, tile_y * tw + tile_x, n_tiles)  # overflow bin

    # --- global (tile, depth) sort -----------------------------------------
    # lexicographic (tile, depth) via two stable sorts (radix style; avoids
    # packing into int64, which x64-disabled JAX lacks)
    tile_flat = tile_id.reshape(-1)
    depth_flat = jnp.broadcast_to(proj.depths[:, None], (n, tpg)).reshape(-1)
    gauss_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, tpg)
    ).reshape(-1)
    # one variadic sort by (tile, depth) carrying the gaussian index —
    # measured ~12% faster than two argsorts + permutation gathers in the
    # pallas path's build_pairs (same pattern, docs/STATE.md)
    sorted_tile, _, sorted_idx = jax.lax.sort(
        (tile_flat, depth_flat, gauss_idx), num_keys=2)

    # --- per-tile segments -> fixed-capacity table -------------------------
    starts = jnp.searchsorted(sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32))
    counts = (
        jnp.searchsorted(sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="right")
        - starts
    )
    cap = jnp.arange(max_per_tile, dtype=jnp.int32)
    gather_pos = jnp.clip(starts[:, None] + cap[None, :], 0, sorted_idx.shape[0] - 1)
    table = sorted_idx[gather_pos]                      # (n_tiles, K)
    table_valid = cap[None, :] < counts[:, None]        # (n_tiles, K)

    # --- composite ----------------------------------------------------------
    # pixel coords per tile: (n_tiles, TILE*TILE, 2)
    ty = jnp.arange(th, dtype=jnp.int32)
    tx = jnp.arange(tw, dtype=jnp.int32)
    tile_origin = jnp.stack(
        jnp.meshgrid(tx * TILE, ty * TILE, indexing="xy"), axis=-1
    ).reshape(n_tiles, 1, 2)
    py, px = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    local = jnp.stack([px, py], -1).reshape(1, TILE * TILE, 2)
    pix = (tile_origin + local).astype(jnp.float32) + 0.5  # pixel centers

    means2d = proj.means2d
    conics = proj.conics
    opac = proj.opacities
    colors = view_colors(g, w2c)  # per-gaussian SH view-dependent color
    n_chan = 3
    if features is not None:
        n_chan = 3 + features.shape[-1]
        colors = jnp.concatenate([colors, features], -1)
    depths = proj.depths

    def body(carry, k_slot):
        color_acc, depth_acc, trans = carry
        gi = table[:, k_slot]                   # (n_tiles,)
        valid = table_valid[:, k_slot]
        mu = means2d[gi][:, None, :]            # (n_tiles, 1, 2)
        d = pix - mu                            # (n_tiles, P, 2)
        con = conics[gi]                        # (n_tiles, 3)
        power = -0.5 * (
            con[:, 0:1] * d[..., 0] ** 2
            + con[:, 2:3] * d[..., 1] ** 2
        ) - con[:, 1:2] * d[..., 0] * d[..., 1]
        alpha = jnp.minimum(opac[gi][:, None] * jnp.exp(power), 0.999)
        alpha = jnp.where(
            valid[:, None] & (alpha >= ALPHA_MIN) & (trans > T_MIN), alpha, 0.0
        )
        w = alpha * trans                       # (n_tiles, P)
        color_acc = color_acc + w[..., None] * colors[gi][:, None, :]
        depth_acc = depth_acc + w * depths[gi][:, None]
        trans = trans * (1.0 - alpha)
        return (color_acc, depth_acc, trans), None

    c0 = jnp.zeros((n_tiles, TILE * TILE, n_chan), jnp.float32)
    d0 = jnp.zeros((n_tiles, TILE * TILE), jnp.float32)
    t0 = jnp.ones((n_tiles, TILE * TILE), jnp.float32)
    (color, depth, trans), _ = jax.lax.scan(
        body, (c0, d0, t0), jnp.arange(max_per_tile)
    )

    alpha_img = 1.0 - trans
    feat = color[..., 3:] if features is not None else None
    color = color[..., :3]
    bg = jnp.asarray(bg_color, jnp.float32)
    color = color + trans[..., None] * bg

    # --- untile to (H, W) ----------------------------------------------------
    def untile(x):
        ch = x.shape[-1] if x.ndim == 3 else None
        if ch is None:
            x = x[..., None]
            ch = 1
        x = x.reshape(th, tw, TILE, TILE, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(th * TILE, tw * TILE, ch)
        x = x[:height, :width]
        return x[..., 0] if ch == 1 else x

    return RasterOut(
        color=untile(color),
        depth=untile(depth),
        alpha=untile(alpha_img),
        n_dropped=n_dropped,
        features=None if feat is None else untile(feat),
    )
