"""Pallas TPU tile rasterizer for 3D Gaussian Splatting (fwd + bwd).

Scales the 3DGS subsystem past the XLA sort+scan path (gs/rasterize.py),
replacing the external CUDA rasterizer dependency of the reference
(README.md:113-114; SURVEY §2.7(5)). Differences from the XLA path:

  * no per-gaussian tile cap: gaussian->tile pairs are enumerated EXACTLY —
    a two-level ragged expansion (gaussian -> ellipse rows -> the tiles each
    row's closed-form x-interval touches, FlashGS-style) under a single
    global `max_pairs` budget; no AABB slack reaches the sort or the budget
    (overflow degrades gracefully: the deepest-sorted tail is dropped and
    reported, not silently mis-rendered),
  * no per-tile capacity: each tile's sorted segment is streamed through
    VMEM in chunks with a dynamic while-loop and early termination when
    every pixel's transmittance is saturated,
  * compositing math runs in one kernel pass (alpha, block-diagonal-free
    prefix transmittances via a strictly-lower-triangular matmul in log
    space) instead of a max_per_tile-step lax.scan.

Orientation inside the kernel: gaussians on sublanes (chunk of 128), pixels
on lanes (16x16 tile = 256). The backward kernel recomputes the forward in
two sweeps (total + prefix), avoiding reverse-order transmittance division.

Parity semantics with gs/rasterize.py: 0.999 alpha clamp, 1/255 alpha
cutoff, T<=1e-4 saturation masking, front-to-back (tile, depth) ordering —
exact up to the fused sort key's db-bit depth quantization (db>=14, see
build_pairs): splats whose camera depths differ by less than range/2^db can
composite in either order, a divergence class the XLA path (full f32 depth
key) and the reference CUDA rasterizer (u64 key, all 32 float bits) do not
have.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gaussians import (Gaussians, project_gaussians, ellipse_row_xrange,
                        QMAX_CULL_EPS, view_colors)
from .rasterize import RasterOut, TILE, ALPHA_MIN, T_MIN, _tile_grid

NPIX = TILE * TILE  # 256
CK = 128            # gaussians per streamed chunk
NFEAT = 16          # default feature lanes per pair (10 used: 6 geometry +
                    # rgb + depth, 8 pairs per 128-lane HBM row). Extra
                    # per-gaussian `features` (e.g. the 3DGS semantic field's
                    # softmaxed class distribution) widen the pack to 32
                    # lanes / 4 pairs per row — up to 26 payload channels,
                    # enough for 19 semantic classes + rgb + depth in ONE
                    # pass. Geometry always occupies lanes 0-5; the payload
                    # is [r, g, b, depth, extras...].
NEG_BIG = -1e30


def _npay_nfeat(n_extra: int) -> tuple[int, int]:
    """Payload channel count (rgb + depth + extras) and the pair lane width
    that fits it (6 geometry lanes + payload, in {16, 32})."""
    npay = 4 + n_extra
    nfeat = 16 if 6 + npay <= 16 else 32
    if 6 + npay > 32:
        raise ValueError(f"at most 26 payload channels (got {npay})")
    return npay, nfeat


def _nout(npay: int) -> int:
    """Output rows per tile: payload + transmittance, padded to a multiple
    of 8 (TPU sublane granularity)."""
    return ((npay + 1 + 7) // 8) * 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# pair building (XLA): exact tile coverage under one global budget
# ---------------------------------------------------------------------------

# Packed-pair HBM layout: (P/8, 128) rows of 8 pairs x NFEAT lanes, where
# HBM row r lane-group k of each 128-pair chunk holds the pair of DEPTH RANK
# k*16 + r — exactly what the kernel's unpack (concat of 8 lane-groups along
# sublanes) restores to depth order. HBM DMAs need 128-aligned lane slices,
# hence the packing; the rank interleave is folded into build_pairs' gather
# indices (_chunk_rank) rather than materialized as a reshape/transpose —
# an earlier (P/8, 8, 16, NFEAT) transpose form padded NFEAT=16 lanes to 128
# (8x expansion: 2 x 9.7 GB HLO temps at 5M gaussians, HBM OOM).


def _chunk_rank(co, ppr=8):
    """Within-chunk slot co (0..127, row-major ppr-pairs-per-row) -> the
    depth rank whose pair it must hold: slot (r, k) stores rank
    k*(CK/ppr) + r."""
    return (co % ppr) * (CK // ppr) + co // ppr


def _lane_roll(x, shift):
    """Rotate lanes; Mosaic needs the dedicated roll op (a plain shifted
    slice leaves mismatched lane offsets that concat can't reconcile)."""
    if _interpret():
        return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift % x.shape[1], 1)  # pltpu.roll wants shift >= 0


def _kernel_unpack(buf8, nfeat=NFEAT):
    """(CK/ppr, 128) chunk -> (CK, nfeat) in depth order (inverse of the
    packed layout; ppr = 128/nfeat pairs per row). Each nfeat-lane group is
    rotated to lane offset 0 before the sublane concat so all parts share
    one layout."""
    ppr = 128 // nfeat
    parts = [buf8[:, :nfeat]]
    for k in range(1, ppr):
        parts.append(_lane_roll(buf8, -k * nfeat)[:, :nfeat])
    return jnp.concatenate(parts, axis=0)


def _kernel_pack(g, nfeat=NFEAT):
    """(CK, nfeat) -> (CK/ppr, 128), inverse of _kernel_unpack: lane-pad
    each CK/ppr-row slab to 128 lanes, rotate into place, sum."""
    ppr = 128 // nfeat
    rows = CK // ppr
    out = jnp.pad(g[0:rows, :], ((0, 0), (0, 128 - nfeat)))
    for k in range(1, ppr):
        part = jnp.pad(g[k * rows:(k + 1) * rows, :],
                       ((0, 0), (0, 128 - nfeat)))
        out = out + _lane_roll(part, k * nfeat)
    return out


def _expand2(span, max_slots):
    """Ragged expansion: item i owns span[i] consecutive slots. Returns
    (owner (max_slots,) i32, slot, starts (n_items,), valid, total). Owner
    is recovered by scatter-at-starts + cummax (a searchsorted here costs
    ~570 ms at 4M slots on v5e — XLA lowers it to a per-iteration gather
    binary search). The caller computes local = slot - starts[owner]; on
    TPU each multi-million-element gather is issue-bound (~11 ns/elem,
    130 ms at 12M — scripts/gsexpand_probe.py round 5), so callers fold
    the starts column into their one packed per-item row gather instead
    of paying a dedicated gather here."""
    offsets = jnp.cumsum(span)                       # inclusive
    total = offsets[-1]
    starts = offsets - span                          # exclusive starts
    slot = jnp.arange(max_slots, dtype=jnp.int32)
    mark = jnp.full((max_slots,), -1, jnp.int32)
    src_ids = jnp.arange(span.shape[0], dtype=jnp.int32)
    scat_at = jnp.where((span > 0) & (starts < max_slots),
                        starts, max_slots)           # OOB drops
    mark = mark.at[scat_at].max(src_ids, mode="drop")
    owner = jnp.maximum(jax.lax.cummax(mark), 0)
    return owner, slot, starts, slot < total, total


def _expand(span, max_slots):
    """Compatibility form of _expand2 (pays the starts[owner] gather)."""
    owner, slot, starts, valid, total = _expand2(span, max_slots)
    return owner, slot - starts[owner], valid, total


def _enumerate_rows(proj, *, tw: int, th: int, max_rows: int, extras=None):
    """Shared enumeration prefix (gaussian -> ellipse tile rows -> per-row
    exact tile x-span). Returns (rg, ty, tx0, span_x, total_rows, ex) where
    span_x[i] is the EXACT number of tiles row i's ellipse slice touches.

    extras: optional (N, E) per-gaussian i32 columns to carry to the rows;
    they ride the ONE packed row gather (bitcast into the f32 table) and
    come back as ex (max_rows, E) i32. TPU gathers at these sizes are
    issue-bound (~130 ms per 12M elements regardless of width, round-5
    gsexpand_probe), so every per-gaussian column must share a single
    gather — this phase used to pay three (y0, starts, ctab)."""
    # level 1: gaussian -> tile rows over the cutoff ellipse's y-extent
    y0 = jnp.clip(jnp.floor((proj.means2d[:, 1] - proj.extents[:, 1]) / TILE), 0, th - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((proj.means2d[:, 1] + proj.extents[:, 1]) / TILE), 0, th - 1).astype(jnp.int32)
    row_span = jnp.where(proj.visible, y1 - y0 + 1, 0)
    rg, slot, rstarts, row_valid, total_rows = _expand2(row_span, max_rows)

    # ONE packed row gather: ellipse coefficients + y0 + row start (+extras).
    # The whole enumeration is combinatorial (every output is an integer
    # decision), so the table is explicitly non-differentiable — without the
    # stop_gradient, the gather's bwd keeps the (N, 9) table alive as a
    # residual AND allocates a scatter accumulator, both in a pathological
    # 56.9x-padded layout (14 G HBM at 5M gaussians, round-5 q4 OOM).
    # Gradients to geometry/color flow ONLY through build_pairs' feature
    # table gather.
    n_ex = 0 if extras is None else extras.shape[1]
    icols = [y0[:, None], rstarts[:, None]]
    if extras is not None:
        icols.append(extras)
    ctab = jax.lax.stop_gradient(jnp.concatenate(
        [proj.means2d, proj.conics, proj.qmax[:, None],
         jax.lax.bitcast_convert_type(
             jnp.concatenate(icols, axis=1), jnp.float32)], axis=1))
    cf = ctab[rg]
    iview = jax.lax.bitcast_convert_type(cf[:, 6:], jnp.int32)
    ty = iview[:, 0] + (slot - iview[:, 1])
    ex = iview[:, 2:2 + n_ex] if n_ex else None

    # exact x-interval of the ellipse within this row's pixel-center band
    mux, muy = cf[:, 0], cf[:, 1]
    ry = ty.astype(jnp.float32) * TILE
    lo, hi, nonempty = ellipse_row_xrange(
        cf[:, 2], cf[:, 3], cf[:, 4], cf[:, 5] + QMAX_CULL_EPS,
        ry + 0.5 - muy, ry + (TILE - 0.5) - muy)
    # tiles whose pixel-center column range [tx*T+0.5, tx*T+T-0.5] overlaps
    # [mux+lo, mux+hi]; emptiness decided BEFORE clipping to the image
    tx0 = jnp.ceil((mux + lo - (TILE - 0.5)) / TILE).astype(jnp.int32)
    tx1 = jnp.floor((mux + hi - 0.5) / TILE).astype(jnp.int32)
    tx0 = jnp.maximum(tx0, 0)
    tx1 = jnp.minimum(tx1, tw - 1)
    span_x = jnp.where(row_valid & nonempty & (tx1 >= tx0), tx1 - tx0 + 1, 0)
    return rg, ty, tx0, span_x, total_rows, ex


def count_pairs(proj, *, width: int, height: int, max_rows: int):
    """EXACT (total_rows, total_pairs) of the enumeration — the right-sizing
    pass for `max_pairs` (build_pairs' cost scales with the BUDGET, not the
    true pair count: the level-2 expand, the sort and the feature gather are
    all budget-sized). Needs only a ROW budget; rows are ~10-100x fewer than
    pairs. If total_rows > max_rows the pair count is a lower bound — bump
    the row bucket and re-count (see auto_budgets)."""
    tw, th = _tile_grid(width, height)
    _, _, _, span_x, total_rows, _ = _enumerate_rows(
        proj, tw=tw, th=th, max_rows=max_rows)
    return total_rows, jnp.sum(span_x)  # i32: pairs < 2^31 by construction


def _bucket(n: int, slack: float = 1.1) -> int:
    """Round n*slack up to {1, 1.25, 1.5, 1.75} x 2^k (max 25% over-size,
    4 compile buckets per octave), then to a CK multiple."""
    t = max(int(n * slack), 1024)
    k = max(t.bit_length() - 3, 0)
    b = ((t >> k) + 1) << k if (t >> k) << k != t else t
    return (b + CK - 1) // CK * CK


@functools.lru_cache(maxsize=64)
def _count_fn(width: int, height: int, max_rows: int):
    # one SHARED jitted count pass per (geometry, row budget): g/K/w2c ride
    # as arguments so different views and growing scenes reuse the compile
    # (jit re-specializes per N internally). The WHOLE pass — projection
    # included — must run under one jit: eager project_gaussians
    # materializes (N, 3, 3) intermediates that TPU tiling pads 57x
    # (9.5 GB HBM OOM at N=5M, measured r4 q5).
    @jax.jit
    def fn(gg, K, w2c, obj_T, obj_vis):
        if obj_T is not None:
            from .gaussians import apply_group_transforms

            gg = apply_group_transforms(gg, obj_T, obj_vis)
        proj = project_gaussians(gg, K, w2c, width=width, height=height)
        return count_pairs(proj, width=width, height=height,
                           max_rows=max_rows)

    return fn


def auto_budgets(g, K, w2c, *, width: int, height: int,
                 slack: float = 1.1, start_rows: int = 1 << 18,
                 bucket: bool = True, obj_T=None, obj_vis=None):
    """Right-size (max_rows, max_pairs) for a scene+view by running the cheap
    count pass (host-level helper — call OUTSIDE jit; the returned ints are
    static shapes for the jitted build). The count executable is shared
    across views/calls (g/K/w2c are jit arguments); each distinct
    (shape, row-budget) pays one compile. The reference's CUDA rasterizer
    sizes its key buffer exactly this way — a prefix-sum over per-gaussian
    tile counts before allocation (diff-gaussian-rasterization
    InclusiveSum; here the allocation must be a static shape, hence
    buckets).

    obj_T/obj_vis: per-view rigid group transforms (dynamic scenes) —
    counting must see the gaussians where the raster will draw them, not
    at their canonical poses.

    bucket=False: skip the {1,1.25,1.5,1.75}x2^k grid (up to 25% over-size)
    and return the exact slack-scaled count CK-ceiled — for one-off renders
    of a fixed scene+view, where a recompile per call is inherent anyway."""
    rows, pairs = _count_fn(width, height, start_rows)(
        g, K, w2c, obj_T, obj_vis)
    rows = int(rows)
    if rows > start_rows:  # row budget too small -> pair count was a floor
        rows, pairs = _count_fn(width, height, _bucket(rows, slack))(
            g, K, w2c, obj_T, obj_vis)
        rows = int(rows)
    if not bucket:
        ck_ceil = lambda n: (max(int(n * slack), 1024) + CK - 1) // CK * CK
        return ck_ceil(rows), ck_ceil(int(pairs))
    return _bucket(rows, slack), _bucket(int(pairs), slack)


def build_pairs(proj, colors, *, width: int, height: int, max_pairs: int,
                max_rows: int | None = None, extras=None):
    """Returns (feats (P_pad/ppr, 128) f32, bounds (n_tiles+1,) i32 with
    every segment padded to a CK multiple, n_dropped). Pair lanes:
    [mux, muy, conic_a, conic_b, conic_c, opacity, r, g, b, depth,
    extras..., 0...]; padding pairs are all-zero (alpha == 0, no
    contribution, zero grads). extras: optional (N, E) per-gaussian payload
    channels (e.g. softmaxed semantic logits) composited alongside color —
    E > 6 widens the pack from 16 to 32 lanes (4 pairs per row).

    Pair enumeration is EXACT (FlashGS-style, arXiv 2408.07967): gaussians
    expand to tile ROWS over the alpha-cutoff ellipse's y-extent, each row
    expands to exactly the tiles its row x-interval (ellipse_row_xrange)
    touches. No AABB slack ever reaches the sort or the budget, so max_pairs
    only needs to cover true intersections (2-4x less than a bounding-box
    enumeration for typical anisotropic/low-opacity scenes)."""
    tw, th = _tile_grid(width, height)
    n_tiles = tw * th
    max_rows = max_rows or max(max_pairs // 2, 1024)

    # depth quantization PER GAUSSIAN (it only depends on the gaussian), so
    # dq and the f32 depth ride the packed level-1 gather instead of paying
    # dedicated 12M-element gathers per pair (issue-bound at ~130 ms each,
    # round-5 gsexpand_probe — this phase used to do five).
    db = 31 - int(n_tiles + 1).bit_length()
    packed_sort = db >= 14 and os.environ.get("MUDG_GS_SORT",
                                              "packed") != "lex"
    if packed_sort:
        dmin = jnp.min(jnp.where(proj.visible, proj.depths, jnp.inf))
        dmax = jnp.max(jnp.where(proj.visible, proj.depths, -jnp.inf))
        qscale = ((1 << db) - 1) / jnp.maximum(dmax - dmin, 1e-12)
        # clamp in INT space: (1<<db)-1 is not f32-representable for db>24,
        # so a float-space clip rounds up to 1<<db and the top depth bit
        # would bleed into the tile id
        dq_g = jnp.clip(
            jnp.clip((proj.depths - dmin) * qscale, 0, None
                     ).astype(jnp.int32),
            0, (1 << db) - 1)
    else:
        dq_g = jax.lax.bitcast_convert_type(proj.depths, jnp.int32)

    rg, ty, tx0, span_x, total_rows, ex = _enumerate_rows(
        proj, tw=tw, th=th, max_rows=max_rows, extras=dq_g[:, None])
    dq_row = ex[:, 0]

    # level 2: row -> pairs. ONE packed row gather carries every per-row
    # column (gaussian id, ty, tx0, dq, pair start) to the pair slots.
    rr, slot2, starts2, valid, total = _expand2(span_x, max_pairs)
    rtab = jnp.stack([rg, ty, tx0, dq_row, starts2], axis=1)
    rt = rtab[rr]
    gi = rt[:, 0]
    plocal = slot2 - rt[:, 4]
    tile_id = jnp.where(valid, rt[:, 1] * tw + rt[:, 2] + plocal, n_tiles)
    n_dropped = (jnp.maximum(total - max_pairs, 0)
                 + jnp.maximum(total_rows - max_rows, 0))

    # (tile, depth) order via ONE fused i32 key: tile id in the high bits,
    # depth quantized to the remaining `db` bits (the reference's CUDA
    # rasterizer packs tile|depth-bits into a u64 radix key the same way,
    # diff-gaussian-rasterization duplicateWithKeys). Sorting a single i32
    # key with the gaussian index carried is cheaper than the previous
    # (tile, depth, gi) num_keys=2 variadic sort — the sort moves 8 B/pair
    # instead of 12 and compares one word instead of two. Depth order
    # inversions are only possible between gaussians closer than
    # range/2^db (db >= 14 -> sub-cm at city scale) and only reorder the
    # alpha compositing of near-coincident splats; payload depths stay
    # exact f32. Falls back to the lexicographic sort if the tile count
    # ever leaves fewer than 14 depth bits (MUDG_GS_SORT=lex forces it —
    # the A/B lever, and the lossless option if a scene ever exposes
    # db-bit depth-quantization ordering artifacts).
    if packed_sort:
        key = (tile_id << db) | rt[:, 3]
        key_s, gi_s = jax.lax.sort((key, gi), num_keys=1)
        bounds = jnp.searchsorted(
            key_s, jnp.arange(n_tiles + 1, dtype=jnp.int32) << db
        ).astype(jnp.int32)
    else:  # lex fallback (>131k tiles, or MUDG_GS_SORT=lex)
        depth = jax.lax.bitcast_convert_type(rt[:, 3], jnp.float32)
        tile_s, _, gi_s = jax.lax.sort((tile_id, depth, gi), num_keys=2)
        bounds = jnp.searchsorted(
            tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)

    # pad every tile segment to a CK multiple (DMA chunks must align with the
    # 128-pair packing groups). Padded slot -> tile via scatter+cummax (row
    # SCATTERS of the pair table measured 8x worse than this gather form;
    # searchsorted over millions of queries costs ~570 ms — avoid both).
    counts = bounds[1:] - bounds[:-1]
    pcounts = ((counts + CK - 1) // CK) * CK
    pbounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pcounts).astype(jnp.int32)])
    p_pad = max_pairs + n_tiles * CK
    slot_pad = jnp.arange(p_pad, dtype=jnp.int32)
    tmark = jnp.full((p_pad,), 0, jnp.int32)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tmark = tmark.at[jnp.where(pcounts > 0, pbounds[:-1], p_pad)].max(
        tile_ids, mode="drop")
    t_of = jax.lax.cummax(tmark)
    # ONE packed per-tile row gather (was three issue-bound 12M gathers:
    # pbounds[t_of], bounds[t_of], counts[t_of])
    btab = jnp.stack([pbounds[:-1], bounds[:-1], counts], axis=1)
    bt = btab[t_of]
    off = slot_pad - bt[:, 0]
    n_extra = 0 if extras is None else extras.shape[-1]
    npay, nfeat = _npay_nfeat(n_extra)
    ppr = 128 // nfeat

    # fold the chunk-rank interleave into the gather: slot co of each
    # 128-pair chunk fetches the pair of depth rank _chunk_rank(co)
    co = off % CK
    offp = off - co + _chunk_rank(co, ppr)
    src = jnp.clip(bt[:, 1] + offp, 0, max_pairs - 1)
    keep = offp < bt[:, 2]
    gp = jnp.where(keep, gi_s[src], 0)

    # one row-gather from a small per-gaussian feature table
    cols = [proj.means2d, proj.conics, proj.opacities[:, None], colors,
            proj.depths[:, None]]
    if extras is not None:
        cols.append(extras)
    cols.append(jnp.zeros((proj.depths.shape[0], nfeat - 6 - npay),
                          jnp.float32))
    table = jnp.concatenate(cols, axis=1).astype(jnp.float32)
    feats_pad = jnp.where(keep[:, None], table[gp], 0.0)

    return feats_pad.reshape(p_pad // ppr, ppr * nfeat), pbounds, n_dropped


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _pix_coords(t, tw):
    """Pixel-center coordinates of tile t as two (1, NPIX) rows."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = (t % tw) * TILE + lane % TILE
    py = (t // tw) * TILE + lane // TILE
    return px.astype(jnp.float32) + 0.5, py.astype(jnp.float32) + 0.5


def _tri_excl():
    """(CK, CK) strictly-lower-triangular ones: row i sums entries j < i."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CK, CK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CK, CK), 1)
    return (c < r).astype(jnp.float32)


def _chunk_alpha(f, px, py, nrem):
    """Per-(gaussian, pixel) alpha for one chunk. f: (CK, NFEAT)."""
    mux, muy = f[:, 0:1], f[:, 1:2]
    ca, cb, cc = f[:, 2:3], f[:, 3:4], f[:, 4:5]
    op = f[:, 5:6]
    dx = px - mux          # (CK, NPIX)
    dy = py - muy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g2d = jnp.exp(power)
    alpha = jnp.minimum(op * g2d, 0.999)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (CK, 1), 0)
    alive = rowid < nrem
    alpha = jnp.where(alive & (alpha >= ALPHA_MIN), alpha, 0.0)
    return alpha, power, g2d, dx, dy


def _chunk_copy(feats_hbm, buf, sem, start, i, ppr=8):
    return pltpu.make_async_copy(
        feats_hbm.at[pl.ds((start + i * CK) // ppr, CK // ppr), :],
        buf.at[i % 2], sem.at[i % 2])


def _paysum(f_pay, w):
    """Composite one chunk's payload: (CK, npay)^T @ (CK, NPIX) -> the
    (npay, NPIX) sum of w[g] * payload[g] over the chunk's gaussians —
    one MXU contraction instead of npay rowsums."""
    return jax.lax.dot_general(
        f_pay, w, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_kernel(bounds_ref, feats_hbm, out_ref, buf, sem, *, tw, npay, nfeat):
    t = pl.program_id(0)
    start = bounds_ref[t]
    count = bounds_ref[t + 1] - start
    px, py = _pix_coords(t, tw)
    tri = _tri_excl()
    ppr = 128 // nfeat

    nck = (count + CK - 1) // CK

    @pl.when(nck > 0)
    def _prefetch0():
        _chunk_copy(feats_hbm, buf, sem, start, 0, ppr).start()

    def cond(c):
        i, T, _ = c
        return (i < nck) & (jnp.max(T) > T_MIN)

    def body(c):
        i, T, acc = c

        @pl.when(i + 1 < nck)
        def _prefetch_next():  # overlap the next chunk's DMA with compute
            _chunk_copy(feats_hbm, buf, sem, start, i + 1, ppr).start()

        _chunk_copy(feats_hbm, buf, sem, start, i, ppr).wait()
        f = _kernel_unpack(buf[i % 2], nfeat)
        alpha0, *_ = _chunk_alpha(f, px, py, count - i * CK)
        lg0 = jnp.log(1.0 - alpha0)
        tat = T * jnp.exp(jax.lax.dot(tri, lg0, preferred_element_type=jnp.float32))
        alpha = jnp.where(tat > T_MIN, alpha0, 0.0)
        w = alpha * tat
        acc = acc + _paysum(f[:, 6:6 + npay], w)
        T = T * jnp.exp(jnp.sum(jnp.log(1.0 - alpha), axis=0, keepdims=True))
        return i + 1, T, acc

    init = (jnp.int32(0), jnp.ones((1, NPIX), jnp.float32),
            jnp.zeros((npay, NPIX), jnp.float32))
    i_end, T, acc = jax.lax.while_loop(cond, body, init)

    @pl.when(i_end < nck)
    def _drain():  # early exit leaves the prefetched chunk in flight
        _chunk_copy(feats_hbm, buf, sem, start, i_end, ppr).wait()

    nout = _nout(npay)
    out_ref[0] = jnp.concatenate(
        [acc, T, jnp.zeros((nout - npay - 1, NPIX), jnp.float32)],
        axis=0)  # (nout, NPIX): [payload..., T, pad]


def _composite_fwd_impl(feats, bounds, *, n_tiles, tw, npay):
    _, nfeat = _npay_nfeat(npay - 4)
    nout = _nout(npay)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, nout, NPIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CK * nfeat // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tw=tw, npay=npay, nfeat=nfeat),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, nout, NPIX), jnp.float32),
        interpret=_interpret(),
    )(bounds, feats)


# ---------------------------------------------------------------------------
# backward kernel (two forward sweeps: totals, then prefix + grads)
# ---------------------------------------------------------------------------

def _bwd_kernel(bounds_ref, feats_hbm, gout_ref, dfeats_hbm, buf, gbuf, sem,
                wsem, *, tw, npay, nfeat):
    t = pl.program_id(0)
    start = bounds_ref[t]
    count = bounds_ref[t + 1] - start
    px, py = _pix_coords(t, tw)
    tri = _tri_excl()
    ppr = 128 // nfeat
    nck = (count + CK - 1) // CK

    g_pay = gout_ref[0, 0:npay, :]           # (npay, NPIX)
    g_t = gout_ref[0, npay:npay + 1, :]      # (1, NPIX)

    # double-buffered chunk loads (same pattern as the forward kernel): the
    # next chunk's DMA overlaps the current chunk's compute in both sweeps
    def load(i):
        _chunk_copy(feats_hbm, buf, sem, start, i, ppr).wait()
        return _kernel_unpack(buf[i % 2], nfeat)

    def prefetch(i):
        @pl.when(i + 1 < nck)
        def _():
            _chunk_copy(feats_hbm, buf, sem, start, i + 1, ppr).start()

    @pl.when(nck > 0)
    def _prefetch0():
        _chunk_copy(feats_hbm, buf, sem, start, 0, ppr).start()

    def gdot(f):
        # per-(gaussian, pixel) payload . dout: (CK, npay) @ (npay, NPIX)
        return jax.lax.dot(f[:, 6:6 + npay], g_pay,
                           preferred_element_type=jnp.float32)

    # ---- sweep 1: total sum of w*G and final T ----------------------------
    def body1(c):
        i, T, wg = c
        prefetch(i)
        f = load(i)
        alpha0, *_ = _chunk_alpha(f, px, py, count - i * CK)
        lg0 = jnp.log(1.0 - alpha0)
        tat = T * jnp.exp(jax.lax.dot(tri, lg0, preferred_element_type=jnp.float32))
        alpha = jnp.where(tat > T_MIN, alpha0, 0.0)
        w = alpha * tat
        wg = wg + jnp.sum(w * gdot(f), axis=0, keepdims=True)
        T = T * jnp.exp(jnp.sum(jnp.log(1.0 - alpha), axis=0, keepdims=True))
        return i + 1, T, wg

    def cond1(c):
        i, T, _ = c
        return (i < nck) & (jnp.max(T) > T_MIN)

    z = jnp.zeros((1, NPIX), jnp.float32)
    i1_end, t_final, wg_total = jax.lax.while_loop(
        cond1, body1, (jnp.int32(0), jnp.ones((1, NPIX), jnp.float32), z))

    @pl.when(i1_end < nck)
    def _drain1():  # early exit leaves the prefetched chunk in flight
        _chunk_copy(feats_hbm, buf, sem, start, i1_end, ppr).wait()

    # re-prime the pipeline for sweep 2
    @pl.when(nck > 0)
    def _prefetch0b():
        _chunk_copy(feats_hbm, buf, sem, start, 0, ppr).start()

    tail = t_final * g_t  # contribution of dT_final through every (1-alpha)

    # ---- sweep 2: prefix + per-pair grads (runs ALL chunks so every pair
    # row of this tile gets written, even past saturation). Grad writes are
    # double-buffered too: slot i%2 is reused only after write i-2 lands ----
    def wr_copy(i, slot):
        return pltpu.make_async_copy(
            gbuf.at[slot],
            dfeats_hbm.at[pl.ds((start + i * CK) // ppr, CK // ppr), :],
            wsem.at[slot])

    def body2(c):
        i, T, cum = c
        prefetch(i)
        f = load(i)
        alpha0, power, g2d, dx, dy = _chunk_alpha(f, px, py, count - i * CK)
        lg0 = jnp.log(1.0 - alpha0)
        tat = T * jnp.exp(jax.lax.dot(tri, lg0, preferred_element_type=jnp.float32))
        alpha = jnp.where(tat > T_MIN, alpha0, 0.0)
        w = alpha * tat
        G = gdot(f)
        wG = w * G
        # prefix-inclusive sum over ALL earlier pairs (across chunks)
        pref = cum + jax.lax.dot(tri, wG, preferred_element_type=jnp.float32) + wG
        suffix = wg_total - pref
        live = alpha > 0.0
        dalpha = jnp.where(
            live, tat * G - (suffix + tail) / (1.0 - alpha), 0.0)
        # clamp gate: no grad where op*g2d hit the 0.999 ceiling
        unclamped = (f[:, 5:6] * g2d) < 0.999
        dalpha = jnp.where(unclamped, dalpha, 0.0)
        dop_px = dalpha * g2d
        dpow = dalpha * f[:, 5:6] * g2d
        ca, cb, cc = f[:, 2:3], f[:, 3:4], f[:, 4:5]

        def rsum(x):
            return jnp.sum(x, axis=1, keepdims=True)  # (CK, 1)

        dmux = rsum(dpow * (ca * dx + cb * dy))
        dmuy = rsum(dpow * (cc * dy + cb * dx))
        dca = rsum(dpow * (-0.5 * dx * dx))
        dcb = rsum(dpow * (-dx * dy))
        dcc = rsum(dpow * (-0.5 * dy * dy))
        dop = rsum(dop_px)
        # payload grads: (CK, NPIX) @ (npay, NPIX)^T -> (CK, npay)
        dpay = jax.lax.dot_general(
            w, g_pay, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        grads = jnp.concatenate(
            [dmux, dmuy, dca, dcb, dcc, dop, dpay,
             jnp.zeros((CK, nfeat - 6 - npay), jnp.float32)], axis=1)

        @pl.when(i >= 2)
        def _reclaim():  # slot reused two iterations later
            wr_copy(i - 2, i % 2).wait()

        gbuf[i % 2] = _kernel_pack(grads, nfeat)
        wr_copy(i, i % 2).start()
        cum = cum + jnp.sum(wG, axis=0, keepdims=True)
        T = T * jnp.exp(jnp.sum(jnp.log(1.0 - alpha), axis=0, keepdims=True))
        return i + 1, T, cum

    def cond2(c):
        return c[0] < nck

    i2_end, _, _ = jax.lax.while_loop(
        cond2, body2, (jnp.int32(0), jnp.ones((1, NPIX), jnp.float32), z))

    @pl.when(i2_end >= 2)
    def _drain_w2():
        wr_copy(i2_end - 2, i2_end % 2).wait()

    @pl.when(i2_end >= 1)
    def _drain_w1():
        wr_copy(i2_end - 1, (i2_end - 1) % 2).wait()
    # dummy aliasing write so the out ref is considered produced
    # (all real writes went through DMA)


def _composite_bwd_impl(feats, bounds, gout, *, n_tiles, tw, npay):
    _, nfeat = _npay_nfeat(npay - 4)
    nout = _nout(npay)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, nout, NPIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, CK * nfeat // 128, 128), jnp.float32),
            pltpu.VMEM((2, CK * nfeat // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tw=tw, npay=npay, nfeat=nfeat),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(feats.shape, jnp.float32),
        interpret=_interpret(),
    )(bounds, feats, gout)


# ---------------------------------------------------------------------------
# custom-vjp composite op + public rasterizer
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def composite_tiles(feats, bounds, n_tiles: int, tw: int, npay: int = 4):
    """feats (P_pad/ppr, 128) packed sorted pairs -> (n_tiles, nout, NPIX)
    images [payload..., T, pad] with payload = [r, g, b, depth, extras...]."""
    return _composite_fwd_impl(feats, bounds, n_tiles=n_tiles, tw=tw,
                               npay=npay)


def _ct_fwd(feats, bounds, n_tiles, tw, npay):
    out = _composite_fwd_impl(feats, bounds, n_tiles=n_tiles, tw=tw,
                              npay=npay)
    return out, (feats, bounds)


def _ct_bwd(n_tiles, tw, npay, res, gout):
    feats, bounds = res
    dfeats = _composite_bwd_impl(feats, bounds, gout, n_tiles=n_tiles, tw=tw,
                                 npay=npay)
    # packed rows past the last padded segment were never visited: zero them.
    _, nfeat = _npay_nfeat(npay - 4)
    nvalid_rows = bounds[n_tiles] // (128 // nfeat)
    row = jnp.arange(feats.shape[0], dtype=jnp.int32)[:, None]
    dfeats = jnp.where(row < nvalid_rows, dfeats, 0.0)
    return dfeats, None


composite_tiles.defvjp(_ct_fwd, _ct_bwd)


def rasterize_pallas(
    g: Gaussians,
    K,
    w2c,
    *,
    width: int,
    height: int,
    max_pairs: int = 2 ** 21,
    max_rows: int | None = None,
    bg_color=(0.0, 0.0, 0.0),
    features=None,
) -> RasterOut:
    """Pallas-tiled differentiable rasterization (drop-in for
    rasterize.rasterize, minus the per-tile/per-gaussian capacity caps).

    features: optional (N, E) per-gaussian vectors alpha-composited alongside
    color (e.g. softmaxed semantic class distributions, refine-gs --semantic)
    and returned as RasterOut.features (H, W, E); E <= 22 extra channels ride
    the same kernel pass (the pair pack widens from 16 to 32 lanes when
    E > 6)."""
    tw, th = _tile_grid(width, height)
    n_tiles = tw * th
    # remat the projection: its batched-3x3 intermediates ((N, 3, 3) covs/
    # jacobians) tile-pad ~57x on TPU, so saving them as backward residuals
    # costs 14 G HBM at N=5M (round-5 q5 OOM) while recomputing them in the
    # bwd costs ~30 ms (the measured proj time)
    proj = jax.checkpoint(
        lambda gg: project_gaussians(gg, K, w2c, width=width, height=height)
    )(g)
    feats, bounds, n_dropped = build_pairs(
        proj, view_colors(g, w2c), width=width, height=height,
        max_pairs=max_pairs, max_rows=max_rows, extras=features)
    n_extra = 0 if features is None else features.shape[-1]
    npay = 4 + n_extra
    out = composite_tiles(feats, bounds, n_tiles, tw, npay)

    color = out[:, 0:3, :].transpose(0, 2, 1)   # (n_tiles, NPIX, 3)
    depth = out[:, 3, :]
    feat = (out[:, 4:4 + n_extra, :].transpose(0, 2, 1)
            if n_extra else None)
    trans = out[:, npay, :]
    bg = jnp.asarray(bg_color, jnp.float32)
    color = color + trans[..., None] * bg[None, None]

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
        alpha=untile(1.0 - trans),
        n_dropped=n_dropped,
        features=None if feat is None else untile(feat),
    )
