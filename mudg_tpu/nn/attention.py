"""Attention modules: cross/self attention, spatial & temporal transformers.

Functional rebuild of `lvdm/modules/attention.py` for TPU:
  * one `attend()` primitive covers all three attention shapes (spatial self,
    text/image cross, temporal self); it dispatches to a Pallas flash kernel
    for long self-attention and to a fused XLA einsum path otherwise
    (replacing xformers memory_efficient_attention, attention.py:146-209),
  * decoupled image cross-attention (IP-Adapter style to_k_ip/to_v_ip,
    attention.py:74-78,129-142) is two attend() calls + scaled add,
  * temporal attention supports an optional causal mask and additive
    relative-position bias (attention.py:20-39,104-124).

Param pytrees mirror the torch module paths, e.g. a CrossAttention is
{'to_q': .., 'to_k': .., 'to_v': .., 'to_out': {'0': ..}, ['to_k_ip', 'to_v_ip']}.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
from jax.ad_checkpoint import checkpoint_name
import jax.numpy as jnp

from . import functional as F

# Flash kernel threshold: below this sequence length a dense XLA attention is
# both faster (no pipeline overhead) and exactly fuses with surrounding ops.
# With the whole-KV oneshot kernel, flash wins already at s=640 (1.10 vs
# 1.48 ms dense, scripts/attnbench.py).
FLASH_MIN_SEQ = 512

# `impl` vocabulary, threaded through every transformer entry point:
#   "auto"  — inference default: all Pallas kernels eligible.
#   "train" — like auto, but kernels whose custom_vjp REPLAYS the XLA math
#             (fused temporal double-attention, fused GEGLU) are disabled:
#             under remat their backward pays fused_fwd + xla_fwd + xla_bwd,
#             a measured net LOSS vs plain XLA (-1.6%/step for the temporal
#             kernel alone, scripts/trainfused.py). Flash attention keeps its
#             real backward kernels and stays on.
#   "flash" — force the flash kernel where shapes allow (tests).
#   "xla"   — NO Pallas custom calls at all (plain XLA everywhere): required
#             for 'model'-sharded (tensor-parallel) runs, where the SPMD
#             partitioner cannot split a tpu_custom_call. Also the reference
#             impl for kernel parity tests.
_AUTO = ("auto", "train")


def _flash_available():
    try:
        from ..kernels import flash_attention  # noqa: F401
        return True
    except Exception:  # pragma: no cover
        return False


def _short_kernels_on() -> bool:
    # TPU-only: CPU tests would hit the slow Pallas interpreter.
    return jax.default_backend() == "tpu"


def attend(q, k, v, *, bias=None, causal=False, impl="auto"):
    """Scaled dot-product attention.

    q: (B, Lq, H, D), k/v: (B, Lk, H, D) -> (B, Lq, H, D).
    Softmax runs in fp32 regardless of input dtype (parity-sensitive island).
    `bias` is an additive (Lq, Lk) or (B*H or 1, Lq, Lk) logit bias.
    """
    scale = q.shape[-1] ** -0.5
    eligible = (
        bias is None
        and not causal
        and q.shape[1] == k.shape[1]
        and q.shape[1] % 64 == 0
        and q.shape[-1] % 64 == 0
    )
    use_flash = eligible and (
        (impl == "flash" and _flash_available())
        or (impl in _AUTO and q.shape[1] >= FLASH_MIN_SEQ and _flash_available())
    )
    if use_flash:
        from ..kernels.flash_attention import flash_attention
        return flash_attention(q, k, v)

    # Tiny equal-length self-attention (temporal T=16): pack 128//T sequences
    # into one 128-row block-diagonal attention in PLAIN XLA — bit-exact and
    # 26% faster than the batched tiny-matmul einsum (0.94 vs 1.27 ms at the
    # ds1 shape; /tmp-probe recorded in docs/STATE.md). The MXU sees
    # (128, D) @ (D, 128) instead of 16x16 tiles.
    if (
        bias is None and not causal and impl in _AUTO
        and jax.default_backend() == "tpu"
        and q.shape[1] == k.shape[1] == v.shape[1]
        and q.shape[1] <= 64 and 128 % q.shape[1] == 0
        and (q.shape[0] * q.shape[2] * q.shape[1]) % 128 == 0
    ):
        return _blockdiag_small_attend(q, k, v, scale)

    # NEGATIVE RESULT (v5e, don't redo blindly): the Pallas short-sequence
    # kernels (kernels/short_attention.py) measured SLOWER than the dense
    # XLA path at the UNet shapes — packed temporal 1.77 vs 1.28 ms, short-KV
    # cross 0.71 vs 0.45 ms (fold/unfold transposes + per-pack loop overhead
    # eat the MXU gain; scripts/kernelbench.py). Opt-in via MUDG_SHORT_ATTN=1
    # for future tuning.
    if (
        bias is None and not causal and impl in _AUTO
        and os.environ.get("MUDG_SHORT_ATTN") == "1" and _short_kernels_on()
    ):
        from ..kernels import short_attention as SA

        if SA.short_kv_attention_eligible(q, k):
            return SA.short_kv_attention(q, k, v)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        if bias.ndim == 2:
            bias = bias[None, None]
        elif bias.ndim == 3:
            bias = bias.reshape(-1, q.shape[2], *bias.shape[-2:]) if bias.shape[0] > 1 else bias[:, None]
        logits = logits + bias.astype(logits.dtype)
    if causal:
        lq, lk = logits.shape[-2:]
        mask = jnp.tril(jnp.ones((lq, lk), dtype=bool), lk - lq)
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _blockdiag_small_attend(q, k, v, scale):
    """Self-attention over tiny equal-length sequences via 128-row
    block-diagonal packing (128//T sequences per slab, off-diagonal TxT
    blocks masked). Exactly equal to the per-sequence softmax."""
    b, t, h, d = q.shape
    g = 128 // t
    nb = b * h // g

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(nb, g * t, x.shape[-1])

    qf, kf, vf = fold(q), fold(k), fold(v)
    s = jnp.einsum("bqd,bkd->bqk", qf, kf,
                   preferred_element_type=jnp.float32) * scale
    r = jax.lax.broadcasted_iota(jnp.int32, (g * t, g * t), 0) // t
    c = jax.lax.broadcasted_iota(jnp.int32, (g * t, g * t), 1) // t
    s = jnp.where((r == c)[None], s, jnp.finfo(s.dtype).min)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkd->bqd", p, vf)
    return o.reshape(b, h, t, d).transpose(0, 2, 1, 3)


def _split_heads(x, heads):
    b, l, _ = x.shape
    return x.reshape(b, l, heads, -1)


def _merge_heads(x):
    b, l, h, d = x.shape
    return x.reshape(b, l, h * d)


def relative_position_bias(table, length_q, length_k, max_rel):
    """Clipped relative-position embedding lookup (attention.py:20-39).

    table: (2*max_rel+1, d). Returns (length_q, length_k, d).
    """
    rq = jnp.arange(length_q)[:, None]
    rk = jnp.arange(length_k)[None, :]
    idx = jnp.clip(rk - rq, -max_rel, max_rel) + max_rel
    return table[idx]


def cross_attention(
    p,
    x,
    context=None,
    *,
    heads,
    image_cross=False,
    ip_scale=1.0,
    text_len=77,
    causal=False,
    temporal_length=None,
    impl="auto",
):
    """CrossAttention forward (attention.py:81-209).

    x: (B, Lq, C). context None => self-attention. With `image_cross` and a
    context longer than `text_len`, the tail tokens go through the decoupled
    image-KV path and are added with `ip_scale` (optionally modulated by a
    learned alpha: out + scale*out_ip*(tanh(alpha)+1), attention.py:138-142).
    """
    self_attn = context is None
    ctx = x if self_attn else context

    out_ip = None
    if image_cross and not self_attn and ctx.shape[1] <= text_len:
        # context carries no image tokens (e.g. text-only conditioning);
        # the decoupled image branch has nothing to attend to
        image_cross = False
    if image_cross and not self_attn:
        ctx, ctx_img = ctx[:, :text_len], ctx[:, text_len:]
        q = _split_heads(F.linear(p["to_q"], x), heads)
        k = _split_heads(F.linear(p["to_k"], ctx), heads)
        v = _split_heads(F.linear(p["to_v"], ctx), heads)
        k_ip = _split_heads(F.linear(p["to_k_ip"], ctx_img), heads)
        v_ip = _split_heads(F.linear(p["to_v_ip"], ctx_img), heads)
        out = attend(q, k, v, impl=impl)
        out_ip = attend(q, k_ip, v_ip, impl=impl)
    else:
        if not self_attn:
            ctx = ctx[:, :text_len]
        # NOTE: fusing QKV into one (C,3C) matmul was measured 12% SLOWER on
        # v5e (XLA does not hoist the weight concat out of the sampling scan;
        # 418 vs 375 ms/UNet-step) — keep the three separate projections.
        q = _split_heads(F.linear(p["to_q"], x), heads)
        k = _split_heads(F.linear(p["to_k"], ctx), heads)
        v = _split_heads(F.linear(p["to_v"], ctx), heads)
        if "relative_position_k" in p:
            # additive rel-pos on logits + values (attention.py:104-124);
            # temporal sequences are tiny (T=16) so the dense path is right.
            scale = q.shape[-1] ** -0.5
            lq, lk = q.shape[1], k.shape[1]
            k2 = relative_position_bias(
                p["relative_position_k"]["embeddings_table"], lq, lk, temporal_length
            )
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            logits = logits + jnp.einsum(
                "bqhd,qkd->bhqk", q.astype(jnp.float32), k2.astype(jnp.float32)
            )
            logits = logits * scale
            if causal:
                mask = jnp.tril(jnp.ones((lq, lk), dtype=bool))
                logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
            v2 = relative_position_bias(
                p["relative_position_v"]["embeddings_table"], lq, lq, temporal_length
            )
            out = out + jnp.einsum("bhqk,qkd->bqhd", probs, v2.astype(probs.dtype))
        else:
            out = attend(q, k, v, causal=causal, impl=impl)

    out = _merge_heads(out)
    if out_ip is not None:
        out_ip = _merge_heads(out_ip)
        if "alpha" in p:
            out = out + ip_scale * out_ip * (jnp.tanh(p["alpha"]) + 1.0)
        else:
            out = out + ip_scale * out_ip
    return F.linear(p["to_out"]["0"], out)


def joint_cross_attention(p, x, *, heads, num_tasks, impl="auto"):
    """JointCrossAttention (attention.py:212-345): cross-task self-attention
    where keys/values are shared across the task-chunks of the batch.

    x: (B, L, C) with B = num_tasks * per_task_batch (task-major chunks, like
    torch.chunk). split_tasks (attention.py:336-345): each sample attends to
    the concatenated KV of all tasks at its within-chunk index.
    """
    b, l, c = x.shape
    assert b % num_tasks == 0, f"batch {b} not divisible by num_tasks {num_tasks}"
    per = b // num_tasks

    q = _split_heads(F.linear(p["to_q"], x), heads)
    k = F.linear(p["to_k"], x)
    v = F.linear(p["to_v"], x)
    # (M*per, L, C) -> (per, M*L, C): concat each task's sequence
    k = k.reshape(num_tasks, per, l, c).transpose(1, 0, 2, 3).reshape(per, num_tasks * l, c)
    v = v.reshape(num_tasks, per, l, c).transpose(1, 0, 2, 3).reshape(per, num_tasks * l, c)
    k = jnp.tile(k, (num_tasks, 1, 1))
    v = jnp.tile(v, (num_tasks, 1, 1))
    out = attend(q, _split_heads(k, heads), _split_heads(v, heads), impl=impl)
    return F.linear(p["to_out"]["0"], _merge_heads(out))


def feed_forward(p, x, impl="auto"):
    """GEGLU feed-forward (attention.py:579-606): net.0=GEGLU, net.2=Linear.

    On TPU this runs as one fused Pallas kernel (kernels/mlp.py) that keeps
    the (M, 8C) intermediate in VMEM — XLA's version makes two HBM round
    trips through it (38% vs ~70% of peak at ds1, scripts/opbench.py).
    Training uses it only when the TRUE backward kernel fits
    (kernels/mlp._ff_bwd_apply); otherwise the custom_vjp would replay XLA
    math, which under remat costs an extra forward per FF in backward."""
    w1 = p["net"]["0"]["proj"].get("weight")
    w2 = p["net"]["2"].get("weight")
    if (
        w1 is not None  # int8-quantized FFs take the XLA path (quant.py)
        and impl != "xla"
        and os.environ.get("MUDG_FUSED_FF", "1") == "1"
        and jax.default_backend() == "tpu"
    ):
        from ..kernels import mlp as M

        ok = M.geglu_ff_eligible(x, w1)
        if ok and impl == "train":
            # training requires the TRUE backward kernel; otherwise the
            # custom_vjp would replay XLA math (a net loss under remat)
            c = x.shape[-1]
            ok = M.ff_bwd_eligible(x.size // c, c, w1.shape[1] // 2)
        if ok:
            b1, b2 = _ff_biases(p, x, w1, w2)
            return M.fused_geglu_ff(x, w1, b1, w2, b2)
    # tag="ff_inner": the (M, 8C) intermediate must NOT be kept by the
    # selective-remat policies (210 MB per ds1 FF at bs=1 — recompute it)
    h = F.linear(p["net"]["0"]["proj"], x, tag="ff_inner")
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * F.gelu(gate)
    return F.linear(p["net"]["2"], h)


def _ff_biases(p, x, w1, w2):
    inner = w1.shape[1] // 2
    b1 = p["net"]["0"]["proj"].get("bias")
    b2 = p["net"]["2"].get("bias")
    if b1 is None:
        b1 = jnp.zeros((2 * inner,), x.dtype)
    if b2 is None:
        b2 = jnp.zeros((w2.shape[1],), x.dtype)
    return b1, b2


def feed_forward_block(p_ff, p_norm, x, impl="auto"):
    """LayerNorm -> GEGLU feed-forward -> +residual. On TPU (inference) the
    whole block runs as one Pallas kernel (kernels/mlp.fused_geglu_ff_block):
    the pre-norm and residual add ride the FF kernel, saving their HBM round
    trips. Training fuses too when the TRUE backward kernel fits
    (kernels/mlp._ff_bwd_apply); impl="xla" and ineligible shapes use the
    unfused composition."""
    if (
        impl != "xla"
        and "weight" in p_ff["net"]["0"]["proj"]  # not int8-quantized
        and os.environ.get("MUDG_FUSED_FF", "1") == "1"
        and jax.default_backend() == "tpu"
        # measured (v5e, chained harness): the LN+res fusion wins only at
        # narrow widths (C=320: 1.96 vs 2.07 ms); at C=640 the bm=512
        # VMEM concession cancels it (1.37 vs 1.35) and C=1280 is slightly
        # worse (1.28 vs 1.23) — those keep LN/res in XLA + plain FF kernel
        and x.shape[-1] < 640
    ):
        from ..kernels import mlp as M

        w1 = p_ff["net"]["0"]["proj"]["weight"]
        ok = M.geglu_ff_eligible(x, w1)
        if ok and impl == "train":
            c = x.shape[-1]
            ok = M.ff_bwd_eligible(x.size // c, c, w1.shape[1] // 2)
        if ok:
            w2 = p_ff["net"]["2"]["weight"]
            b1, b2 = _ff_biases(p_ff, x, w1, w2)
            return M.fused_geglu_ff_block(
                x, p_norm["weight"], p_norm["bias"], w1, b1, w2, b2)
    return feed_forward(p_ff, F.layer_norm(p_norm, x), impl=impl) + x


def basic_transformer_block(
    p, x, context=None, *, heads, image_cross=False, ip_scale=1.0, text_len=77,
    causal=False, temporal_length=None, num_tasks=1, impl="auto",
):
    """self-attn -> (joint task attn) -> cross-attn -> FF with pre-LN
    residuals (attention.py:392-400)."""
    c = x.shape[-1]
    # Fused spatial self-attention block (kernels/spatial_attn.py): LN ->
    # full-width qkv -> whole-KV softmax -> out-proj -> +residual in one
    # kernel. ds1 4.13 vs 5.39 ms, ds2 measured vs the flash path in
    # scripts/sattn.py. Ineligible shapes (temporal T=16 rows, ds4 C=1280
    # weights, MDM1024's L=9216 KV) keep the flash/dense path below.
    use_sfused = (
        not causal
        and impl == "auto"
        and "relative_position_k" not in p["attn1"]
        and all("bias" not in p["attn1"][k] for k in ("to_q", "to_k", "to_v"))
        # int8-quantized projections take the XLA path (quant.py)
        and "weight" in p["attn1"]["to_q"]
        and "weight" in p["attn1"]["to_out"]["0"]
        # kernel assumes square full-width projections (inner == C)
        and p["attn1"]["to_q"]["weight"].shape == (c, c)
        and p["attn1"]["to_out"]["0"]["weight"].shape == (c, c)
        and os.environ.get("MUDG_FUSED_SPATIAL", "1") == "1"
    )
    variant = None
    if use_sfused:
        from ..kernels import spatial_attn as SP

        if SP.eligible(x, c, heads):
            variant = "fused"
        elif (SP.stream_eligible(x, c, heads)
              and os.environ.get("MUDG_STREAM_SPATIAL", "1") == "1"):
            # streaming variant: x/out chunks ride manual DMAs, only k/v +
            # one score block live in VMEM — admits MDM1024's ds2 shape
            # (L=2304, C=640) where the whole-block kernel is VMEM-ineligible.
            # MUDG_STREAM_SPATIAL=0 keeps the flash path (A/B + safety valve).
            variant = "stream"
        elif (SP.flashblock_eligible(x, c, heads)
              and os.environ.get("MUDG_FLASHBLOCK", "1") == "1"):
            # long-L tier (MDM1024 ds1, L=9216): online softmax over k/v
            # chunks shared across heads, LN/q-proj/out-proj/residual fused.
            # Measured (r4 q9): 51.5 vs 55.3 ms/block standalone (1.07x),
            # MDM1024 e2e 1008 vs 1034 ms/step (51.0 vs 52.4 s/clip).
            # MUDG_FLASHBLOCK=0 keeps the flash path (A/B + safety valve).
            variant = "flashblock"
    if variant is not None:
        fn = {"fused": SP.fused_self_attention,
              "stream": SP.stream_self_attention,
              "flashblock": SP.flashblock_self_attention}[variant]
        x = fn(x, p["norm1"], p["attn1"], heads)
    else:
        x = cross_attention(
            p["attn1"], F.layer_norm(p["norm1"], x), None,
            heads=heads, causal=causal, temporal_length=temporal_length,
            impl=impl,
        ) + x
    # named checkpoints: with remat="names" the backward replay reuses these
    # saved block-level outputs instead of recomputing the attentions/FF
    # (jax.checkpoint save_only_these_names policy in unet3d.run)
    x = checkpoint_name(x, "blk_attn1")
    if "attn_joint" in p:
        x = joint_cross_attention(
            p["attn_joint"], F.layer_norm(p["norm_joint"], x),
            heads=heads, num_tasks=num_tasks, impl=impl,
        ) + x
    # NEGATIVE RESULT (v5e, don't redo): a fused image-KV cross-attention
    # kernel (LN + q-proj + 77/16-token attentions + combine + out-proj +
    # residual per q-chunk, k/v in XLA) measured SLOWER than this XLA path
    # (0.97 vs 0.93 ms at ds1, 0.56 vs 0.49 at ds2) — per-head dots against
    # <=80-row KV leave the MXU idle, the same failure mode as
    # kernels/short_attention.py. Kernel deleted; the XLA einsum stays.
    x = cross_attention(
        p["attn2"], F.layer_norm(p["norm2"], x), context,
        heads=heads, image_cross=image_cross, ip_scale=ip_scale,
        text_len=text_len, temporal_length=temporal_length, impl=impl,
    ) + x
    x = checkpoint_name(x, "blk_attn2")
    x = feed_forward_block(p["ff"], p["norm3"], x, impl=impl)
    return checkpoint_name(x, "blk_ff")


def _proj(p, x):
    """proj_in/proj_out that is either Linear or a 1x1 Conv1d/Conv2d in the
    checkpoint (attention.py:421-424,489-493); a k=1 conv is a linear."""
    wk = next(k for k in ("weight_i8", "weight_q8", "weight") if k in p)
    w = p[wk]
    if w.ndim == 2:
        return F.linear(p, x)
    q = dict(p, **{wk: w.reshape(w.shape[-2], w.shape[-1])})
    return F.linear(q, x)


def spatial_transformer(
    p, x, context=None, *, heads, depth=1, image_cross=False, ip_scale=1.0,
    text_len=77, num_tasks=1, impl="auto", remat=False,
):
    """SpatialTransformer (attention.py:403-467). x: (N, H, W, C)."""
    n, h, w, c = x.shape
    x_in = x
    x = F.group_norm(p["norm"], x, eps=1e-6)
    x = x.reshape(n, h * w, c)
    x = _proj(p["proj_in"], x)
    block = partial(
        basic_transformer_block, heads=heads, image_cross=image_cross,
        ip_scale=ip_scale, text_len=text_len, num_tasks=num_tasks, impl=impl,
    )
    if remat:
        block = jax.checkpoint(block, static_argnums=())
    for d in range(depth):
        x = block(p["transformer_blocks"][str(d)], x, context)
    x = _proj(p["proj_out"], x)
    return x.reshape(n, h, w, c) + x_in


def temporal_transformer(
    p, x, context=None, *, heads, depth=1, causal=False, temporal_length=None,
    impl="auto", remat=False,
):
    """TemporalTransformer (attention.py:529-576). x: (B, T, H, W, C);
    attention runs over T on (B*H*W, T, C) tokens.

    context=None is the only_self_att=True path every MuDG config uses
    (temporal_selfatt_only: true). With context (B*T, L, D) — the reference's
    only_self_att=False mode (attention.py:556-566) — each block's attn2
    cross-attends per-frame context: the reference repeats frame j's context
    rows (h*w)//t times so the spatial token row i of each batch attends to
    frame i // ((h*w)//t), loops batches serially (a torch 65535-batch
    workaround), and skips the causal mask; here it is one batched call with
    the identical row->frame mapping.
    """
    b, t, h, w, c = x.shape
    x_in = x
    x = F.group_norm(p["norm"], x, eps=1e-6)
    # (B, T, H, W, C) -> (B*H*W, T, C)
    x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
    x = _proj(p["proj_in"], x)
    if context is not None:
        hw = h * w
        if hw % t:
            raise ValueError(
                f"cross temporal transformer requires (h*w) % t == 0 "
                f"(reference repeat semantics), got {hw} % {t}")
        l, dc = context.shape[-2:]
        # (B*T, L, D) -> (B, T, L, D) -> repeat each frame hw//t times
        # (t-major, so row i maps to frame i // (hw//t)) -> (B*HW, L, D)
        ctx = jnp.repeat(context.reshape(b, t, l, dc), hw // t, axis=1)
        ctx = ctx.reshape(b * hw, l, dc)
        xblock = partial(basic_transformer_block, heads=heads, impl=impl)
        if remat:
            xblock = jax.checkpoint(xblock)
        for d in range(depth):
            x = xblock(p["transformer_blocks"][str(d)], x, ctx)
        x = _proj(p["proj_out"], x)
        x = x.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
        return x + x_in
    block = partial(
        basic_transformer_block, heads=heads, causal=causal,
        temporal_length=temporal_length, impl=impl,
    )
    if remat:
        block = jax.checkpoint(block)
    for d in range(depth):
        pb = p["transformer_blocks"][str(d)]
        # Fused Pallas double-attention (kernels/temporal_attn.py): both
        # self-attentions + LNs + residuals of the block in one kernel, the
        # (128,128) block-diag logits never leaving VMEM. The XLA blockdiag
        # path pays ~0.75 ms/core of HBM logits traffic at ds1.
        use_fused = (
            not causal
            and impl in ("auto", "train")
            # the kernel handles neither rel-pos bias nor qkv projection
            # biases (to_out bias is) — require their absence on BOTH attns
            # so forward and custom-vjp backward stay the same function
            and all(
                "relative_position_k" not in pb[a]
                and "weight" in pb[a]["to_q"]  # not int8-quantized
                and "bias" not in pb[a]["to_q"]
                and "bias" not in pb[a]["to_k"]
                and "bias" not in pb[a]["to_v"]
                for a in ("attn1", "attn2")
            )
            and os.environ.get("MUDG_FUSED_TEMPORAL", "1") == "1"
        )
        if use_fused:
            from ..kernels import temporal_attn as TA

            use_fused = TA.eligible(x, x.shape[-1], heads, t)
            if use_fused and impl == "train":
                # training requires the TRUE backward kernel (C<=512);
                # otherwise the custom_vjp would replay XLA math — a
                # measured net loss under remat (docs/STATE.md)
                use_fused = TA.bwd_eligible(x.shape[0] * t, x.shape[-1])
        if use_fused:
            def fused_block(pb_, x_):
                from ..kernels import temporal_attn as TA

                x_ = TA.fused_double_self_attn(
                    x_, {"norm": pb_["norm1"], **pb_["attn1"]},
                    {"norm": pb_["norm2"], **pb_["attn2"]}, t, heads)
                x_ = checkpoint_name(x_, "blk_attn2")
                return checkpoint_name(
                    feed_forward_block(pb_["ff"], pb_["norm3"], x_, impl=impl),
                    "blk_ff")

            if remat:
                fused_block = jax.checkpoint(fused_block)
            x = fused_block(pb, x)
        else:
            x = block(pb, x, None)
    x = _proj(p["proj_out"], x)
    x = x.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
    return x + x_in


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def init_cross_attention(
    rng, query_dim, *, context_dim=None, heads=8, dim_head=64,
    image_cross=False, relative_position=False, temporal_length=None,
    alpha_learnable=False,
):
    inner = heads * dim_head
    context_dim = query_dim if context_dim is None else context_dim
    ks = jax.random.split(rng, 8)
    p = {
        "to_q": F.init_linear(ks[0], query_dim, inner, bias=False),
        "to_k": F.init_linear(ks[1], context_dim, inner, bias=False),
        "to_v": F.init_linear(ks[2], context_dim, inner, bias=False),
        "to_out": {"0": F.init_linear(ks[3], inner, query_dim)},
    }
    if image_cross:
        p["to_k_ip"] = F.init_linear(ks[4], context_dim, inner, bias=False)
        p["to_v_ip"] = F.init_linear(ks[5], context_dim, inner, bias=False)
        if alpha_learnable:
            p["alpha"] = jnp.zeros(())
    if relative_position:
        assert temporal_length is not None
        shape = (2 * temporal_length + 1, dim_head)
        limit = (6.0 / sum(shape)) ** 0.5  # xavier_uniform
        p["relative_position_k"] = {
            "embeddings_table": jax.random.uniform(ks[6], shape, jnp.float32, -limit, limit)
        }
        p["relative_position_v"] = {
            "embeddings_table": jax.random.uniform(ks[7], shape, jnp.float32, -limit, limit)
        }
    return p


def init_feed_forward(rng, dim, mult=4):
    inner = int(dim * mult)
    k1, k2 = jax.random.split(rng)
    return {
        "net": {
            "0": {"proj": F.init_linear(k1, dim, inner * 2)},
            "2": F.init_linear(k2, inner, dim),
        }
    }


def init_transformer_block(
    rng, dim, *, heads, dim_head, context_dim=None, image_cross=False,
    relative_position=False, temporal_length=None, alpha_learnable=False,
    domain_cross=False,
):
    ks = jax.random.split(rng, 3)
    p = {
        "attn1": init_cross_attention(
            ks[0], dim, heads=heads, dim_head=dim_head,
            relative_position=relative_position, temporal_length=temporal_length,
        ),
        "attn2": init_cross_attention(
            ks[1], dim, context_dim=context_dim, heads=heads, dim_head=dim_head,
            image_cross=image_cross, relative_position=relative_position,
            temporal_length=temporal_length, alpha_learnable=alpha_learnable,
        ),
        "ff": init_feed_forward(ks[2], dim),
        "norm1": F.init_norm(dim),
        "norm2": F.init_norm(dim),
        "norm3": F.init_norm(dim),
    }
    if domain_cross:
        # zero-init q/k/v/out and norm scale -> identity at init
        # (attention.py:245-256,375-378)
        inner = heads * dim_head
        p["attn_joint"] = {
            "to_q": {"weight": jnp.zeros((dim, inner))},
            "to_k": {"weight": jnp.zeros((dim, inner))},
            "to_v": {"weight": jnp.zeros((dim, inner))},
            "to_out": {"0": {"weight": jnp.zeros((inner, dim)),
                             "bias": jnp.zeros((dim,))}},
        }
        p["norm_joint"] = {"weight": jnp.zeros((dim,)), "bias": jnp.zeros((dim,))}
    return p


def _init_proj(rng, d_in, d_out, use_linear, zero=False):
    if use_linear:
        return F.init_linear(rng, d_in, d_out, zero=zero)
    # stored as 1x1 Conv1d layout (k, in, out) to match torch checkpoints
    return F.init_conv(rng, (1,), d_in, d_out, zero=zero)


def init_spatial_transformer(
    rng, in_channels, *, heads, dim_head, depth=1, context_dim=None,
    use_linear=True, image_cross=False, alpha_learnable=False,
    domain_cross=False,
):
    inner = heads * dim_head
    ks = jax.random.split(rng, depth + 2)
    return {
        "norm": F.init_norm(in_channels),
        "proj_in": _init_proj(ks[0], in_channels, inner, use_linear),
        "transformer_blocks": {
            str(d): init_transformer_block(
                ks[2 + d], inner, heads=heads, dim_head=dim_head,
                context_dim=context_dim, image_cross=image_cross,
                alpha_learnable=alpha_learnable, domain_cross=domain_cross,
            )
            for d in range(depth)
        },
        "proj_out": _init_proj(ks[1], inner, in_channels, use_linear, zero=True),
    }


def init_temporal_transformer(
    rng, in_channels, *, heads, dim_head, depth=1, use_linear=True,
    relative_position=False, temporal_length=None, context_dim=None,
):
    """context_dim sizes the blocks' attn2 k/v projections for the
    only_self_att=False cross path (attention.py:505-506: context_dim is
    forced to None when only_self_att); None = self-attention blocks."""
    inner = heads * dim_head
    ks = jax.random.split(rng, depth + 2)
    return {
        "norm": F.init_norm(in_channels),
        "proj_in": _init_proj(ks[0], in_channels, inner, use_linear),
        "transformer_blocks": {
            str(d): init_transformer_block(
                ks[2 + d], inner, heads=heads, dim_head=dim_head,
                context_dim=context_dim,
                relative_position=relative_position, temporal_length=temporal_length,
            )
            for d in range(depth)
        },
        "proj_out": _init_proj(ks[1], inner, in_channels, use_linear, zero=True),
    }
