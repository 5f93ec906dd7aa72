"""Tensor-parallel sharding rules for the UNet (optional 'model' mesh axis).

The reference has no tensor parallelism (SURVEY §2.6) — at 1.4B params it
fits one chip — but 576x1024 inference and larger future models benefit from
sharding attention/FF over a second mesh axis. TPU-idiomatically this is
pure *annotation*: Megatron-style column/row sharding specs on the attention
and feed-forward weights; the XLA SPMD partitioner propagates shardings and
inserts the all-reduces after row-sharded projections over ICI.

Pairing:
  to_q/to_k/to_v/to_k_ip/to_v_ip  (in, out) -> P(None, 'model')   [column]
  to_out.0                        (in, out) -> P('model', None)   [row]
  ff.net.0.proj                   (in, out) -> P(None, 'model')   [column]
  ff.net.2                        (in, out) -> P('model', None)   [row]
  everything else replicated.

Interplay with the Pallas kernels: the SPMD partitioner cannot partition a
tpu_custom_call, so ANY run that shards over 'model' — inference or
training — must pass impl="xla", which disables every Pallas kernel
(including flash attention, which impl="train" keeps). Data-parallel
sharding is unaffected: kernels see per-shard batches.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN = ("to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "proj")
_ROW_PARENTS = ("to_out", "2")  # to_out.0 and ff net '2'


def _spec_for_path(path, leaf, axis: str, n_model: int) -> P:
    names = [str(getattr(k, "key", k)) for k in path]
    # int8-quantized leaves (quant.py: weight_i8/weight_q8) shard exactly
    # like their fp originals; the (out,) scales stay replicated like biases
    # (the SPMD partitioner slices replicated operands of sharded ops).
    if (
        not names
        or names[-1] not in ("weight", "weight_i8", "weight_q8")
        or leaf.ndim != 2
    ):
        return P()
    parent = names[-2] if len(names) >= 2 else ""
    gparent = names[-3] if len(names) >= 3 else ""
    in_ff = "net" in names
    in_attn = any(n.startswith("attn") for n in names)
    if not (in_ff or in_attn):
        return P()
    if parent in _COLUMN or (in_ff and parent == "proj"):
        if leaf.shape[1] % n_model == 0:
            return P(None, axis)
        return P()
    if (in_attn and parent == "0" and gparent == "to_out") or (
        in_ff and parent == "2" and gparent == "net"
    ):
        if leaf.shape[0] % n_model == 0:
            return P(axis, None)
        return P()
    return P()


def unet_tp_shardings(params, mesh: Mesh, axis: str = "model"):
    """Per-leaf NamedShardings implementing the column/row TP layout."""
    n_model = mesh.shape[axis]

    def spec(path, leaf):
        return NamedSharding(mesh, _spec_for_path(path, leaf, axis, n_model))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_unet_tp(params, mesh: Mesh, axis: str = "model"):
    """Place UNet params according to the TP layout."""
    shardings = unet_tp_shardings(params, mesh, axis)
    return jax.tree.map(jax.device_put, params, shardings)


def unet_tp_fsdp_shardings(params, mesh: Mesh, tp_axis: str = "model",
                           dp_axis: str = "data", min_size: int = 2**14):
    """2D weight sharding: Megatron TP specs first, then each big leaf's
    largest TP-unused dim sharded over the data axis (FSDP/ZeRO-3) — the
    standard production layout when neither axis alone is enough. Leaves the
    TP layout untouched on dims the column/row specs claim; small leaves
    stay as pure TP (replicated over 'data')."""
    import numpy as np

    from . import mesh as PM

    n_model = mesh.shape[tp_axis]
    n_data = mesh.shape[dp_axis]

    def spec(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        tp_spec = _spec_for_path(path, leaf, tp_axis, n_model)
        full = list(tp_spec) + [None] * (len(shape) - len(tp_spec))
        if shape and int(np.prod(shape)) >= min_size:
            used = {i for i, s in enumerate(full) if s is not None}
            dp = PM.largest_divisible_axis_spec(shape, n_data, dp_axis,
                                                exclude=used)
            for i, a in enumerate(dp):
                if a is not None:
                    full[i] = a
        return NamedSharding(mesh, P(*full))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_unet_tp_fsdp(params, mesh: Mesh, tp_axis: str = "model",
                       dp_axis: str = "data", min_size: int = 2**14):
    """Place UNet params on the combined FSDP x TP 2D layout."""
    shardings = unet_tp_fsdp_shardings(params, mesh, tp_axis, dp_axis,
                                       min_size=min_size)
    return jax.tree.map(jax.device_put, params, shardings)
