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

This is pure annotation: `unet3d.unet_apply(..., sp=...)` inserts
`with_sharding_constraint` at the transitions; nothing else changes.

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
    """
    rows: NamedSharding
    video: NamedSharding
    frames: NamedSharding


def make_seq_sharding(mesh: Mesh, axis: str = "seq") -> SeqSharding:
    return SeqSharding(
        rows=NamedSharding(mesh, P(axis)),
        video=NamedSharding(mesh, P(None, None, None, axis)),
        frames=NamedSharding(mesh, P(None, axis)),
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
