"""Device mesh + sharding rules.

TPU-native replacement for the reference's NCCL/DDP stack
(`torch.distributed.launch` + DDPShardedStrategy, SURVEY §2.6): instead of
process groups and explicit collectives, we build a `jax.sharding.Mesh`,
annotate batch/param/optimizer shardings, and let the XLA SPMD partitioner
emit all-reduce/all-gather over ICI.

Default layout (v5e-8 analog of the 8-GPU recipe):
  * mesh ('data',): batch sharded over data, params replicated,
  * optimizer state sharded over 'data' on each leaf's largest divisible
    axis — the ZeRO-2/DDPSharded analog (main/utils_train.py:126-137),
  * optional ('data', 'model') mesh for tensor-parallel attention at 1024-res.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int] | None = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over available devices; default 1-D ('data',) mesh."""
    devices = jax.devices() if devices is None else devices
    if axis_sizes is None:
        axis_sizes = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))


def replicate(tree, mesh: Mesh):
    """Fully replicated sharding for every leaf (params under pure DP)."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_batch_spec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading (batch) dimension over `axis`."""
    s = shard_batch_spec(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def largest_divisible_axis_spec(shape, n: int, axis_name: str,
                                exclude=()) -> P:
    """PartitionSpec sharding the largest dim divisible by n, else replicated.

    Used for ZeRO-style optimizer-state sharding: big leaves split across the
    data axis, small ones stay replicated. `exclude` lists dims already
    claimed by another mesh axis (tensor parallelism) that must stay
    untouched."""
    if not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if i not in exclude and shape[i] % n == 0 and shape[i] >= n:
            spec = [None] * len(shape)
            spec[i] = axis_name
            return P(*spec)
    return P()


def shard_tree_zero(tree, mesh: Mesh, axis: str = "data", min_size: int = 2**14):
    """Apply ZeRO-style sharding to a pytree (optimizer moments): leaves
    smaller than min_size stay replicated."""
    n = mesh.shape[axis]

    def place(x):
        if not hasattr(x, "shape") or int(np.prod(x.shape)) < min_size:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = largest_divisible_axis_spec(x.shape, n, axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def tree_shardings(tree, mesh: Mesh, spec_fn):
    """Build a sharding pytree (for jit in_shardings/out_shardings)."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, spec_fn(getattr(x, "shape", ()))), tree
    )
