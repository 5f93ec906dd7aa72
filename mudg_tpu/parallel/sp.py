"""Sequence-parallel (frame/width-sharded) single-clip inference.

The reference has no multi-GPU inference at all: `virtual_pose_render.py`
runs batch-1 clips on one GPU (SURVEY §2.6 "Sequence/context parallel:
none"). On TPU the UNet's own dataflow invariant makes latency scaling
natural: spatial layers see (B*T, H, W, C) — frames are independent — and
temporal layers see (B, T, H, W, C) — pixels are independent. So we shard

  * spatial-layer activations on the leading B*T (frame) axis, and
  * temporal-layer activations on W (the only spatial dim divisible by 8
    at every UNet level for both MDM512 and MDM1024),

and let the XLA SPMD partitioner insert the all-to-alls at each
spatial<->temporal layout transition (the same reshape boundaries the
reference rearranges at, openaimodel3d.py:43-45, 591). Per transition each
chip exchanges activation_bytes/n — a few MB at MDM512 — over ICI.

Two transition mechanisms (`unet3d.unet_apply(..., sp=...)` calls
`to_video`/`to_rows` at each boundary):

  * annotation (explicit=False): `with_sharding_constraint` around the
    reshape; GSPMD picks the collective. At the rows->video boundary the
    flattened (B*T) source sharding maps to a TWO-dim (B, T) tiling after
    the reshape whenever B > 1, and GSPMD has no multi-dim-source
    all-to-all: it falls back to "[SPMD] Involuntary full rematerialization"
    (replicate + slice) — observed in MULTICHIP_r02 and reproduced at
    production-divisible shapes by scripts/sp_hlo.py.
  * explicit (explicit=True, the default from make_seq_sharding when shapes
    divide): the boundary is ONE `jax.shard_map` all-to-all — each chip
    exchanges exactly activation_bytes * (n-1)/n^2 over ICI, the minimal
    resharding traffic. Differentiable (the transpose of an all-to-all is
    the reverse all-to-all), so training under sp uses it too.

Interplay with the Pallas kernels: like tensor parallelism (parallel/tp.py),
the SPMD partitioner cannot partition a tpu_custom_call, so sharded runs
must pass impl="xla". Combine with TP on a 2D ('seq','model') mesh if the
per-chip matmuls get too thin.
"""
from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class SeqSharding:
    """Shardings for the UNet/VAE activation layouts.

    rows:   applied to (B*T, ...) spatial-layer activations (shards dim 0;
            also used for the per-frame emb/context tensors).
    video:  applied to (B, T, H, W, C) temporal-layer activations (shards W).
    frames: applied to (B, T, H, W, C) per-frame-independent video tensors
            (shards T) — the frozen VAE encode/decode around the sampler.
    explicit: emit the spatial<->temporal transitions as explicit
            shard_map all-to-alls instead of annotation (see module doc);
            used whenever (B*T) % n == 0 and W % n == 0 at a boundary,
            falling back to annotation otherwise.
    data_axis: optional name of a batch-parallel mesh axis (DP x SP
            training): the batch dim B rides `data_axis` while frames/W
            ride `axis` within each data group. rows then shard dim 0 over
            (data_axis, axis) — B*T is B-major so the data split lands on
            whole clips — and the explicit all-to-alls stay purely within
            the seq groups.
    """
    rows: NamedSharding
    video: NamedSharding
    frames: NamedSharding
    explicit: bool = True
    data_axis: str | None = None

    @property
    def mesh(self) -> Mesh:
        return self.rows.mesh

    @property
    def axis(self) -> str:
        spec0 = self.rows.spec[0]
        return spec0[-1] if isinstance(spec0, tuple) else spec0

    @property
    def n(self) -> int:
        return self.mesh.shape[self.axis]

    @property
    def n_data(self) -> int:
        return 1 if self.data_axis is None else self.mesh.shape[self.data_axis]


def make_seq_sharding(mesh: Mesh, axis: str = "seq", *,
                      explicit: bool = True,
                      data_axis: str | None = None) -> SeqSharding:
    da = data_axis
    return SeqSharding(
        rows=NamedSharding(mesh, P((da, axis) if da else axis)),
        video=NamedSharding(mesh, P(da, None, None, axis)),
        frames=NamedSharding(mesh, P(da, axis)),
        explicit=explicit,
        data_axis=da,
    )


def constrain(x, sharding: NamedSharding | None):
    """with_sharding_constraint that tolerates sharding=None (no-op)."""
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


def rows(x, sp: SeqSharding | None):
    return x if sp is None else constrain(x, sp.rows)


def video(x, sp: SeqSharding | None):
    return x if sp is None else constrain(x, sp.video)


def frames(x, sp: SeqSharding | None):
    return x if sp is None else constrain(x, sp.frames)


def _explicit_ok(sp, bt: int, b: int, ww: int) -> bool:
    return (sp.explicit and ww % sp.n == 0
            and b % sp.n_data == 0 and (bt // sp.n_data) % sp.n == 0)


def to_video(h, batch_size: int, sp: SeqSharding | None):
    """Rows-sharded (B*T, H, W, C) -> W-sharded (B, T, H, W, C).

    Explicit mode: ONE all-to-all per boundary — each chip splits its local
    frame block along W and concatenates the frame blocks it receives, i.e.
    exactly the resharding the temporal layer needs, with activation/n bytes
    exchanged per chip. Annotation mode: reshape + with_sharding_constraint
    (GSPMD replicates when B > 1, see module doc). With a data_axis, the
    all-to-all runs inside each seq group; the clip's B block stays put on
    its data shard (shard_map sees the per-(data, seq)-shard local block)."""
    bt, hh, ww, c = h.shape
    t = bt // batch_size
    if sp is None:
        return h.reshape(batch_size, t, hh, ww, c)
    if _explicit_ok(sp, bt, batch_size, ww):
        n, ax, bl = sp.n, sp.axis, batch_size // sp.n_data

        def f(xl):  # xl: (bt/(nd*n), H, W, C) local
            y = jax.lax.all_to_all(xl, ax, split_axis=2, concat_axis=0,
                                   tiled=True)  # (bt/nd, H, W/n, C)
            return y.reshape(bl, t, hh, ww // n, c)

        return jax.shard_map(
            f, mesh=sp.mesh, in_specs=sp.rows.spec,
            out_specs=sp.video.spec)(h)
    return constrain(h.reshape(batch_size, t, hh, ww, c), sp.video)


def to_rows(hv, sp: SeqSharding | None):
    """W-sharded (B, T, H, W, C) -> rows-sharded (B*T, H, W, C): inverse
    of to_video (the reverse all-to-all in explicit mode)."""
    b, t, hh, ww, c = hv.shape
    bt = b * t
    if sp is None:
        return hv.reshape(bt, hh, ww, c)
    if _explicit_ok(sp, bt, b, ww):
        n, ax = sp.n, sp.axis

        def f(xl):  # xl: (B/nd, T, H, W/n, C) local
            y = xl.reshape(-1, hh, ww // n, c)  # (bt/nd, H, W/n, C)
            return jax.lax.all_to_all(y, ax, split_axis=0, concat_axis=2,
                                      tiled=True)  # (bt/(nd*n), H, W, C)

        return jax.shard_map(
            f, mesh=sp.mesh, in_specs=sp.video.spec,
            out_specs=sp.rows.spec)(hv)
    return constrain(hv.reshape(bt, hh, ww, c), sp.rows)
