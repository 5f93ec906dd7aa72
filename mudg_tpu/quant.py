"""Post-training int8 quantization for inference (serving path).

TPU-native rationale: v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197
TOP/s) and int8 halves HBM traffic — the MDM UNet's ds1 matmuls are
bandwidth-bound (60% MFU, docs/STATE.md), so quantization attacks exactly the
residual cost families. The reference has no quantization path (it inferences
under fp16 autocast, virtual_pose_render.py:218); this is a net-new serving
capability.

Scheme (standard W8A8 dynamic):
  * weights: symmetric per-output-channel int8, absmax calibration
    (no data needed); stored as {'weight_i8': int8, 'scale': f32 (out,)}
    in place of {'weight': ...}. 'bias' rides along unchanged.
  * activations: dynamic symmetric quantization at matmul time — per-row
    absmax for linears (each output element consumes exactly one row), and
    per-tensor absmax for convs (an output pixel mixes several input rows,
    so row scales would be incorrect).
  * accumulation in int32 on the MXU (lax.dot_general / lax.conv with
    preferred_element_type=int32), dequantized to the input dtype.

Norm layers, embedding tables, and the fp32 algebra islands stay untouched;
`quantize_pytree` only converts conv/linear 'weight' leaves above a size
threshold. The fused bf16 Pallas kernels (kernels/{mlp,spatial_attn,
temporal_attn}.py) gate on the presence of a plain 'weight' leaf and fall
back to the XLA path automatically for quantized layers; the flash-attention
kernel operates on activations only and still applies.

Usage:
    qparams = quant.quantize_pytree(unet_params)
    y = unet_apply(qparams, cfg, ...)   # same call, int8 matmuls inside
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Leaves smaller than this stay in the original dtype: the quant/dequant
# overhead outweighs any traffic win, and tiny layers (time-embed MLPs,
# norms) are also the most precision-sensitive.
MIN_QUANT_SIZE = 65536


def quantize_weight(w, axis=-1, clip_pct: float | None = None):
    """Symmetric per-output-channel int8 quantization of a weight array.

    `axis` is the output-channel axis (kept per-channel; all other axes share
    a scale). Returns (w_i8, scale) with w ~= w_i8 * scale (broadcast on
    `axis`).

    clip_pct (e.g. 99.9): scale from the clip_pct-th percentile of |w| within
    each channel instead of the absmax; weights beyond it SATURATE at +-127.
    Real checkpoints carry sparse within-channel outliers that inflate an
    absmax scale and cost every other weight mantissa bits — clipping trades
    a large error on ~1/1000 outliers for finer resolution on the rest
    (standard percentile-calibration practice). None = exact absmax."""
    wf = jnp.asarray(w, jnp.float32)
    ax = axis % wf.ndim
    if clip_pct is None:
        reduce_axes = tuple(i for i in range(wf.ndim) if i != ax)
        amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    else:
        flat = jnp.moveaxis(jnp.abs(wf), ax, 0).reshape(wf.shape[ax], -1)
        shape = [1] * wf.ndim
        shape[ax] = wf.shape[ax]
        amax = jnp.percentile(flat, clip_pct, axis=1).reshape(shape)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale.reshape((wf.shape[ax],))


def _is_quantizable_leaf_dict(p) -> bool:
    if not isinstance(p, dict) or "weight" not in p:
        return False
    w = p["weight"]
    if not hasattr(w, "ndim") or w.ndim < 2:  # norms/embeddings are 1-D
        return False
    # exclude embedding-table-like dicts (no conv/linear semantics)
    return set(p.keys()) <= {"weight", "bias"}


def quantize_pytree(params, *, min_size: int | None = None, mode: str = "w8a8",
                    conv_mode: str | None = None, which: str = "all",
                    clip_pct: float | None = None, jit: bool = True):
    """Walk a torch-layout parameter pytree and quantize every conv/linear
    'weight' leaf (ndim >= 2, size >= min_size) to int8 + per-out-channel
    scale. Returns a new pytree; unquantized leaves are shared, not copied.

    mode:
      "w8a8" (default) — int8 weights AND dynamic int8 activations; int32
          MXU dots (2x peak rate + half the activation traffic).
      "w8"   — weight-only: int8 storage/HBM traffic, dequantized to the
          activation dtype inside the matmul/conv (bf16 compute, no
          activation-quantization error; halves the UNet's parameter
          footprint — e.g. MDM1024 HBM relief — at unchanged MXU rate).

    conv_mode overrides `mode` for convolution leaves (weight ndim > 2;
    (3,1,1) temporal convs run as matmuls and follow `mode`). Use
    conv_mode="w8" with sharded inference (parallel/sp.py): XLA's SPMD
    partitioner RET_CHECK-crashes on int8 conv_general_dilated (a
    wrong-element-type broadcast it emits after partitioning), while int8
    dot_general partitions fine — caught by
    tests/test_parallel_inference.py.

    which selects the leaf population:
      "all"  (default) — every conv/linear weight above the threshold.
      "conv" — ONLY spatial convolution leaves (ndim > 2, excluding the
          (3,1,1) temporal convs, which run as shifted matmuls at ~95% MFU
          in bf16). Motivated by measurement (docs/STATE.md): blanket W8A8
          is a net end-to-end LOSS (7.23 vs 5.53 s/clip) because quantized
          matmul layers forfeit the fused bf16 Pallas kernels, while int8
          convs measured 1.5-2x (ds1 conv3x3 1.04 -> 0.52 ms) and the conv
          population never overlaps the fused kernels.
      "conv_wide" — "conv" plus WIDE matmul leaves (2-D linears and (3,1,1)
          temporal convs with min channel >= 1024). At C >= 1024 no fused
          bf16 matmul kernel is eligible anyway (kernels/{mlp,temporal_attn,
          spatial_attn} all stop below 1024; flash attention is
          activation-only and still applies), so nothing is displaced, and
          the int8 probe measured ~2-3x there ((5120, 1280) dyn-W8A8
          0.076 -> 0.025 ms, docs/STATE.md round-2 session 11). Targets the
          MDM1024/ds4 + middle-block widths.

    Output-channel axis is -1 for every layout in this codebase
    (Linear (in, out), ConvNd (*k, in, out) — nn/functional.py:7-12).

    clip_pct is forwarded to quantize_weight (percentile-clipped per-channel
    scales for outlier-heavy checkpoints; None = exact absmax).

    jit=True (default) runs the conversion as ONE compiled executable over
    ONLY the selected weight leaves: eagerly it is ~6 ops x O(100s) of
    leaves, which is pathologically slow through the axon remote-dispatch
    tunnel (docs/STATE.md). Pass-through leaves (biases, norms, unselected
    weights) never enter the jit, so they are genuinely shared, not copied —
    no transient HBM doubling for the 1.44B UNet. All structure decisions
    (threshold, conv detection) read only static shapes, so tracing is
    safe."""
    threshold = MIN_QUANT_SIZE if min_size is None else min_size
    assert mode in ("w8a8", "w8"), mode
    conv_mode = mode if conv_mode is None else conv_mode
    assert conv_mode in ("w8a8", "w8"), conv_mode
    assert which in ("all", "conv", "conv_wide"), which
    WIDE_MIN = 1024

    def is_spatial_conv(w) -> bool:
        return w.ndim > 2 and tuple(w.shape[:3]) != (3, 1, 1)

    def is_wide_matmul(w) -> bool:
        # 2-D linear or (3,1,1) temporal conv (runs as shifted matmuls)
        # whose narrowest channel dim is >= WIDE_MIN
        if w.ndim == 2:
            return min(w.shape) >= WIDE_MIN
        return tuple(w.shape[:3]) == (3, 1, 1) and min(w.shape[-2:]) >= WIDE_MIN

    def keyname(w) -> str:
        m = conv_mode if is_spatial_conv(w) else mode
        return "weight_i8" if m == "w8a8" else "weight_q8"

    def selected(w) -> bool:
        if which == "all":
            return True
        if which == "conv":
            return is_spatial_conv(w)
        return is_spatial_conv(w) or is_wide_matmul(w)

    def picked(p) -> bool:
        return (_is_quantizable_leaf_dict(p)
                and p["weight"].size >= threshold
                and selected(p["weight"]))

    def walk(p, quantize):
        if isinstance(p, dict):
            if picked(p):
                w_i8, scale = quantize(p["weight"])
                q = {keyname(p["weight"]): w_i8, "scale": scale}
                if "bias" in p and p["bias"] is not None:
                    q["bias"] = p["bias"]
                return q
            return {k: walk(v, quantize) for k, v in p.items()}
        return p

    def qw(w):
        return quantize_weight(w, clip_pct=clip_pct)

    if jit:
        weights = []
        walk(params, lambda w: (weights.append(w), (w, w))[1])
        if weights and all(isinstance(w, jax.Array) for w in weights):
            qs = iter(jax.jit(lambda ws: [qw(w) for w in ws])(weights))
            return walk(params, lambda w: next(qs))
    return walk(params, qw)


def conv_w8a8_to_w8(params):
    """Demote W8A8 conv leaves to weight-only (w8a8 -> w8) in place of a
    re-quantization: weight_i8 and weight_q8 hold the IDENTICAL int8 tensor
    (same quantize_weight output) — only the leaf key selects the forward
    path — so this is a pure key rename on conv leaves (ndim > 2, excluding
    the (3,1,1) temporal convs, which run as matmuls and partition fine).

    Used when serving an already-quantized checkpoint (apps/quantize_ckpt.py
    artifact) under sequence parallelism: XLA's SPMD partitioner cannot
    handle int8 conv_general_dilated (see quantize_pytree docstring).
    Returns (new_tree, n_renamed)."""
    n = 0

    def walk(p):
        nonlocal n
        if isinstance(p, dict):
            w = p.get("weight_i8")
            if (w is not None and hasattr(w, "ndim") and w.ndim > 2
                    and tuple(w.shape[:3]) != (3, 1, 1)):
                n += 1
                return {("weight_q8" if k == "weight_i8" else k): v
                        for k, v in p.items()}
            return {k: walk(v) for k, v in p.items()}
        return p

    return walk(params), n


def dequantize_weight(p, dtype):
    """Weight-only leaf -> effective weight in `dtype` (XLA fuses the
    int8 read + rescale into the consuming matmul/conv)."""
    return p["weight_q8"].astype(dtype) * p["scale"].astype(dtype)


def size_report(params) -> dict:
    """Bytes by dtype class — for logging the compression ratio."""
    int8 = fp = 0
    for leaf in jax.tree.leaves(params):
        nbytes = leaf.size * leaf.dtype.itemsize
        if leaf.dtype == jnp.int8:
            int8 += nbytes
        else:
            fp += nbytes
    return {"int8_bytes": int(int8), "other_bytes": int(fp)}


# ---------------------------------------------------------------------------
# Quantized forwards (dispatched from nn/functional.py)
# ---------------------------------------------------------------------------

def _dyn_quant_rows(x):
    """Per-row (last-axis) symmetric dynamic quantization.

    Returns (x_i8, x_scale) with x ~= x_i8 * x_scale; x_scale keeps the
    reduced axis as size-1 for broadcasting against the output."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x_i8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_i8, scale


def _dyn_quant_tensor(x):
    """Per-tensor symmetric dynamic quantization (for convolutions)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x_i8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_i8, scale


def linear_i8(p, x):
    """int8 W8A8 linear: y = (q(x) @ w_i8) * (x_scale * w_scale) + b."""
    x_i8, x_scale = _dyn_quant_rows(x)
    acc = jax.lax.dot_general(
        x_i8, p["weight_i8"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (x_scale * p["scale"])
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv_i8(p, x, *, stride, padding, dimension_numbers, groups: int = 1):
    """int8 W8A8 convolution with per-tensor activation scale."""
    x_i8, x_scale = _dyn_quant_tensor(x)
    acc = jax.lax.conv_general_dilated(
        x_i8, p["weight_i8"],
        window_strides=stride,
        padding=padding,
        dimension_numbers=dimension_numbers,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (x_scale * p["scale"])
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def temporal_conv311_i8(p, x):
    """(3,1,1) temporal conv as three shifted int8 matmuls (the same
    layout-avoidance trick as functional.temporal_conv311, quantized).
    Activation scales are per-row, exact for each tap's matmul."""
    w = p["weight_i8"]
    assert w.shape[:3] == (3, 1, 1), w.shape
    x_i8, x_scale = _dyn_quant_rows(x)

    def tap(xi, wi):
        acc = jax.lax.dot_general(
            xi, wi, (((xi.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32)

    s = x_scale * p["scale"]  # (..., 1) * (out,) -> (..., out)
    y = tap(x_i8, w[1, 0, 0]) * s
    pad_t = ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
    y = y + jnp.pad(tap(x_i8[:, :-1], w[0, 0, 0]) * s[:, :-1], pad_t)
    y = y + jnp.pad(
        tap(x_i8[:, 1:], w[2, 0, 0]) * s[:, 1:],
        ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)),
    )
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)
