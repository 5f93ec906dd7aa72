"""Fused spatial self-attention block (Pallas TPU).

Replaces the XLA-projections + flash-kernel pipeline for the UNet's spatial
self-attention (`lvdm/modules/attention.py:146-209` hot path) where one
batch element's whole (L, C) sequence fits VMEM. The ENTIRE pre-norm
residual block runs in one kernel — per grid step (one batch element):

    LN(x) -> k/v full-width projections into SCRATCH refs
    -> loop over q-chunks: per-chunk LN -> q-proj -> per-head whole-KV
       base-2 softmax -> PV -> head concat -> out-proj -> +bias +residual

Wins over the previous path (measured, scripts/sattn.py, v5e):
  * projections run FULL WIDTH (the flash path's (B,L,H,D) layout forces
    per-head D=64 lane padding on q/k/v materialization and transposes),
  * q, k, v, o and the attention probabilities never touch HBM,
  * measured per call vs the XLA-projections+flash path (scripts/sattn.py
    harness): ds1 (L=2560, C=320) 4.04 vs 5.41 ms; ds2 (L=640, C=640)
    1.06 vs 1.23 ms.

Mosaic/XLA landmines encoded here (scripts/sattn_probe*.py, roll_probe.py):
  * capturing a THIRD live (L, C) value in a fori_loop body crashes the
    compiler at L=2560 -> k/v live in scratch refs, head slices read per use;
  * LN + residual-add as XLA ops AROUND the pallas call crash the REMOTE
    compile service at (B=32, L=2560) -> both live inside the kernel
    (row-wise LN per q-chunk is exact);
  * bf16 pltpu.roll crashes -> heads are split with 64-offset lane slices.

Backward: custom_vjp re-running the XLA math under jax.vjp (exact unfused
gradients). Training passes impl="train", which bypasses this kernel, so
the replay never runs in the training step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634
NEG_BIG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln(v, w, b):
    vf = v.astype(jnp.float32)
    mu = jnp.mean(vf, axis=-1, keepdims=True)
    var = jnp.mean((vf - mu) ** 2, axis=-1, keepdims=True)
    return ((vf - mu) * jax.lax.rsqrt(var + 1e-5) * w + b).astype(jnp.bfloat16)


def _kernel(x_ref, lnw, lnb, wq, wk, wv, wo, bo, o_ref, kb, vb,
            *, heads, bq, seq):
    # x_ref and o_ref ALIAS (input_output_aliases={0: 0}): the access
    # pattern is alias-safe by construction — the whole block is read once
    # up front (xn -> k/v scratch), then each q-chunk reads its x rows
    # BEFORE writing the same rows, and never re-reads earlier rows.
    # Sharing the buffer removes the separate out allocation from the
    # scoped-vmem envelope (3.3 MB at (2560, 320)) — the margin that made
    # the kernel graph-context-fragile (round-5 entry() 16.07M OOM).
    c = x_ref.shape[-1]
    d = c // heads
    xn = _ln(x_ref[0], lnw[...], lnb[...])
    kb[...] = jax.lax.dot(xn, wk[...], preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    vb[...] = jax.lax.dot(xn, wv[...], preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    def qc_body(i, carry):
        xc = x_ref[0, pl.ds(i * bq, bq), :]
        q = jax.lax.dot(_ln(xc, lnw[...], lnb[...]), wq[...],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)  # scale*log2e folded into wq
        outs = []
        for h in range(heads):
            s = jax.lax.dot_general(
                q[:, h * d:(h + 1) * d], kb[:, h * d:(h + 1) * d],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (bq, L) base-2 logits
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vb[:, h * d:(h + 1) * d],
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_all = jnp.concatenate(outs, axis=1)  # (bq, C) head-major lanes
        out = (jax.lax.dot(o_all, wo[...], preferred_element_type=jnp.float32)
               + bo[...] + xc.astype(jnp.float32))
        o_ref[0, pl.ds(i * bq, bq), :] = out.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, seq // bq, qc_body, 0)


def _prep(p, c, heads):
    d = c // heads
    wq = (p["to_q"]["weight"].astype(jnp.float32) * (d ** -0.5 * LOG2E)
          ).astype(jnp.bfloat16)
    wk = p["to_k"]["weight"].astype(jnp.bfloat16)
    wv = p["to_v"]["weight"].astype(jnp.bfloat16)
    wo = p["to_out"]["0"]["weight"].astype(jnp.bfloat16)
    bo = p["to_out"]["0"].get("bias")
    bo = (jnp.zeros((c,), jnp.float32) if bo is None else bo.astype(jnp.float32))
    return wq, wk, wv, wo, bo.reshape(1, c)


def _vmem_est(l, c, bq):
    # The real constraint is the 16 MB scoped-vmem limit (the remote
    # compiler's HTTP-500s are this OOM; one surfaced in full: ds2 bq=320
    # "16.27M > 16.00M"). Model: double-buffered x/out blocks, k/v scratch,
    # (bq, L) f32 scores, weights DOUBLE-buffered (consts are pipelined
    # too), per-chunk LN f32 temporaries, q/o_all/out transients. A 14.5 MB
    # budget reproduces every observed pass/fail: ds1 (2560, 320) bq=128 ok
    # / bq=256 OOM; ds2 (640, 640) bq=320 OOM (16.27M real) / bq=128 ok.
    return ((l * c * 2) * 2         # x/out ALIASED block, double-buffered
            + 2 * l * c * 2         # k/v scratch
            + bq * l * 4            # scores
            + 2 * 4 * c * c * 2     # weights, double-buffered
            + 2 * bq * c * 4        # per-chunk LN f32 temporaries
            + 2 * bq * c * 4)       # q/o_all/out transients


def _pick_bq(l, c):
    # 12 MB budget (was 14.5): the whole-block kernel's ACTUAL scoped vmem
    # is bq-INDEPENDENT at large L (x/out whole-L blocks + k/v scratch all
    # double-buffered = the fixed 16.07M observed at (2560, 320) for both
    # bq=128 and bq=64) and graph-dependent: that instance compiled inside
    # bench's clip graph for three rounds, then OOM'd inside the round-5
    # driver entry() graph by 76 KB. est <= 12M keeps admitted shapes'
    # actuals under the limit with margin; MDM512's ds1/ds2 move to the
    # flashblock / streaming tiers (never to plain XLA).
    for bq in (l, 512, 320, 256, 128):
        if l % bq == 0 and _vmem_est(l, c, bq) < 12 * 2**20:
            return bq
    return 0


def eligible(x, c, heads) -> bool:
    """x: (B, L, C) tokens, self-attention over L. bf16 only (the kernel
    computes q/k/v/S/PV in bf16; fp32 callers would silently lose precision)."""
    l = x.shape[1]
    return (
        jax.default_backend() == "tpu"
        and x.dtype == jnp.bfloat16
        and c % heads == 0
        and (c // heads) % 64 == 0        # head slices on 64-lane boundaries
        and l % 128 == 0
        and _pick_bq(l, c) > 0
    )


def _fused_impl(x, p_norm, p_attn, *, heads, bq=None):
    b, l, c = x.shape
    bq = bq or _pick_bq(l, c)
    w = _prep(p_attn, c, heads)
    lnw = p_norm["weight"].astype(jnp.float32).reshape(1, c)
    lnb = p_norm["bias"].astype(jnp.float32).reshape(1, c)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, bq=bq, seq=l),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [const] * 7,
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((l, c), jnp.bfloat16),
                        pltpu.VMEM((l, c), jnp.bfloat16)],
        input_output_aliases={0: 0},
        interpret=_interpret(),
    )(x, lnw, lnb, *w)


def _xla_impl(x, p_norm, p_attn, *, heads):
    """Reference math (LN -> self-attention -> +residual) in plain XLA; used
    for the custom-vjp backward and parity tests. impl="xla_dense" is an
    unrecognized impl value on purpose: attend() then takes its dense-einsum
    fallback, keeping this graph kernel-free on every backend."""
    from ..nn import attention as A
    from ..nn import functional as F

    return A.cross_attention(p_attn, F.layer_norm(p_norm, x), None,
                             heads=heads, impl="xla_dense") + x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_self_attention(x, p_norm, p_attn, heads):
    """LN -> spatial self-attention -> +residual, fused. x: (B, L, C).
    p_norm: LayerNorm params; p_attn: CrossAttention params (self-attn,
    no qkv biases)."""
    return _fused_impl(x, p_norm, p_attn, heads=heads)


def _vjp_fwd(x, p_norm, p_attn, heads):
    return _fused_impl(x, p_norm, p_attn, heads=heads), (x, p_norm, p_attn)


def _vjp_bwd(heads, res, g):
    x, p_norm, p_attn = res
    _, vjp = jax.vjp(lambda x_, n_, a_: _xla_impl(x_, n_, a_, heads=heads),
                     x, p_norm, p_attn)
    return vjp(g)


fused_self_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Streaming variant: x/out chunks ride manual double-buffered DMAs and the
# projection weights are DMA'd once into scratch, so only k/v (+ one f32
# score block) must fit VMEM. This admits the MDM1024 ds2 shape
# (L=2304, C=640), where the whole-block kernel's double-buffered x/out
# blocks alone (12*L*C bytes = 17.7 MB) blow the 14.5 MB scoped budget.
# ---------------------------------------------------------------------------

def _stream_kernel(x_hbm, lnw, lnb, w_hbm, bo, o_hbm,
                   ws, kb, vb, xbuf, obuf, wsem, xsem, osem,
                   *, heads, bq, seq):
    c = kb.shape[-1]
    d = c // heads
    bi = pl.program_id(0)
    nch = seq // bq

    @pl.when(bi == 0)
    def _load_w():
        dma = pltpu.make_async_copy(w_hbm, ws, wsem)
        dma.start()
        dma.wait()

    def x_dma(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(i * bq, bq), :], xbuf.at[slot], xsem.at[slot])

    def o_dma(slot):
        # one descriptor shape per slot; the destination offset varies, but
        # wait() only needs the matching transfer size
        def at(i):
            return pltpu.make_async_copy(
                obuf.at[slot], o_hbm.at[bi, pl.ds(i * bq, bq), :],
                osem.at[slot])
        return at

    # ---- phase 1: k/v projections into scratch ----
    x_dma(0, 0).start()

    def kv_body(i, carry):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nch)
        def _prefetch():
            x_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        x_dma(slot, i).wait()
        xn = _ln(xbuf[slot], lnw[...], lnb[...])
        kb[pl.ds(i * bq, bq), :] = jax.lax.dot(
            xn, ws[1], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        vb[pl.ds(i * bq, bq), :] = jax.lax.dot(
            xn, ws[2], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return carry

    jax.lax.fori_loop(0, nch, kv_body, 0)

    # ---- phase 2: q chunks against the full k/v ----
    x_dma(0, 0).start()

    def q_body(i, carry):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nch)
        def _prefetch():
            x_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        x_dma(slot, i).wait()
        xc = xbuf[slot]
        q = jax.lax.dot(_ln(xc, lnw[...], lnb[...]), ws[0],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)  # scale*log2e folded into wq
        outs = []
        for h in range(heads):
            s = jax.lax.dot_general(
                q[:, h * d:(h + 1) * d], kb[:, h * d:(h + 1) * d],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(jnp.bfloat16), vb[:, h * d:(h + 1) * d],
                            preferred_element_type=jnp.float32)
            outs.append((o / l).astype(jnp.bfloat16))
        o_all = jnp.concatenate(outs, axis=1)
        out = (jax.lax.dot(o_all, ws[3], preferred_element_type=jnp.float32)
               + bo[...] + xc.astype(jnp.float32))

        # the slot's previous out DMA (chunk i-2) must land before overwrite
        @pl.when(i >= 2)
        def _drain_prev():
            o_dma(slot)(i - 2).wait()

        obuf[slot] = out.astype(obuf.dtype)
        o_dma(slot)(i).start()
        return carry

    jax.lax.fori_loop(0, nch, q_body, 0)

    # drain the last two out DMAs (eligibility guarantees nch >= 2)
    o_dma((nch - 2) % 2)(nch - 2).wait()
    o_dma((nch - 1) % 2)(nch - 1).wait()


_STREAM_BQ = 128


def _stream_vmem_est(l, c, bq=_STREAM_BQ):
    # k/v scratch + weight scratch + x/out double buffers + per-head f32
    # score pair (s and exp2(s-m) live together) + q/o_all/out transients.
    return (2 * l * c * 2          # k/v scratch
            + 4 * c * c * 2        # weight scratch (single-buffered)
            + 4 * bq * c * 2       # x/out double buffers
            + 2 * bq * l * 4       # score block + exp2 copy
            + 4 * bq * c * 4)      # LN/q/o_all/out f32 transients


def stream_eligible(x, c, heads) -> bool:
    """Streaming fused block: same math as `eligible`, but only k/v +
    one score block must fit VMEM. bf16 only."""
    l = x.shape[1]
    return (
        jax.default_backend() == "tpu"
        and x.dtype == jnp.bfloat16
        and c % heads == 0
        and (c // heads) % 64 == 0
        and l % _STREAM_BQ == 0
        and l // _STREAM_BQ >= 2
        # manual HBM DMA slices must be 128-aligned on lanes: the x/out
        # chunk DMAs slice (bq, C) directly from the (B, L, C) operand, so
        # C itself must be a 128 multiple (c=320 crashes Mosaic with
        # "Slice shape along dimension 2 must be aligned to tiling" —
        # round-5 q10; the flashblock tier lane-pads its k/v copies
        # instead and handles any C)
        and c % 128 == 0
        and _stream_vmem_est(l, c) < int(14.5 * 2**20)
    )


def _stream_impl(x, p_norm, p_attn, *, heads, bq=_STREAM_BQ):
    b, l, c = x.shape
    # the kernel's final drain waits on the DMAs for chunks nch-2 and nch-1
    # unconditionally; with a single chunk that semaphore never fires (hang)
    if l // bq < 2:
        raise ValueError(
            f"stream_self_attention needs >=2 q-chunks (L={l}, bq={bq}); "
            "use fused_self_attention/flash for short sequences")
    wq, wk, wv, wo, bo = _prep(p_attn, c, heads)
    w_all = jnp.stack([wq, wk, wv, wo])
    lnw = p_norm["weight"].astype(jnp.float32).reshape(1, c)
    lnb = p_norm["bias"].astype(jnp.float32).reshape(1, c)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        functools.partial(_stream_kernel, heads=heads, bq=bq, seq=l),
        grid=(b,),
        in_specs=[hbm, const, const, hbm, const],
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, c, c), jnp.bfloat16),   # ws
            pltpu.VMEM((l, c), jnp.bfloat16),      # kb
            pltpu.VMEM((l, c), jnp.bfloat16),      # vb
            pltpu.VMEM((2, bq, c), x.dtype),       # xbuf (bf16 in production;
                                                   # DMA dtype must match x)
            pltpu.VMEM((2, bq, c), x.dtype),       # obuf
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(x, lnw, lnb, w_all, bo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def stream_self_attention(x, p_norm, p_attn, heads):
    """Streaming LN -> spatial self-attention -> +residual. x: (B, L, C)."""
    return _stream_impl(x, p_norm, p_attn, heads=heads)


def _svjp_fwd(x, p_norm, p_attn, heads):
    return _stream_impl(x, p_norm, p_attn, heads=heads), (x, p_norm, p_attn)


stream_self_attention.defvjp(_svjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Flash-block variant: online-softmax over streamed k/v chunks, with the LN,
# q projection, out projection and residual fused around the flash core.
# Admits MDM1024's ds1 shape (L=9216, C=320) where both kernels above are
# VMEM-ineligible (k/v scratch alone is 11.8 MB). k/v come in PRE-PROJECTED
# (B, L, C) full-width — computed by one XLA LN+matmul pair at ~95% MFU —
# and are DMA'd in (bkv, C) chunks shared by ALL heads (the flash kernel's
# (B, L, H, D) layout reloads per-head (bkv, 64) blocks instead).
#
# Measured motivation (docs/STATE.md round 4): at MDM1024 the attend family
# is 330 ms of the 1035 ms UNet call (31% of peak vs flash's 37% standalone
# and the D=64 structural 50%); the integrated-vs-standalone gap is the
# XLA boundary traffic this kernel removes (q materialization, o round
# trip, out-proj round trip, (B,L,H,D) transposes).
# ---------------------------------------------------------------------------

def _fb_kernel(x_ref, lnw, lnb, wq, wo, bo, k_hbm, v_hbm, o_ref,
               kbuf, vbuf, macc, lacc, oacc, ksem, vsem,
               *, heads, bq, bkv, seq):
    c = x_ref.shape[-1]
    d = c // heads
    bi = pl.program_id(0)
    nkv = seq // bkv

    def kv_dma(slot, j):
        return (
            pltpu.make_async_copy(
                k_hbm.at[bi, pl.ds(j * bkv, bkv), :], kbuf.at[slot],
                ksem.at[slot]),
            pltpu.make_async_copy(
                v_hbm.at[bi, pl.ds(j * bkv, bkv), :], vbuf.at[slot],
                vsem.at[slot]),
        )

    for dma in kv_dma(0, 0):
        dma.start()

    xc = x_ref[0]
    q = jax.lax.dot(_ln(xc, lnw[...], lnb[...]), wq[...],
                    preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)  # scale*log2e folded into wq

    # per-head online-softmax state broadcast across each head's 64-lane
    # block: layout-friendly (bq, C) f32 planes instead of (bq, heads)
    # scalars (lane dim stays 128-aligned, all updates are elementwise)
    macc[...] = jnp.full(macc.shape, NEG_BIG, jnp.float32)
    lacc[...] = jnp.zeros(lacc.shape, jnp.float32)
    oacc[...] = jnp.zeros(oacc.shape, jnp.float32)

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nkv)
        def _prefetch():
            for dma in kv_dma(jax.lax.rem(j + 1, 2), j + 1):
                dma.start()

        for dma in kv_dma(slot, j):
            dma.wait()
        for h in range(heads):
            lo, hi = h * d, (h + 1) * d
            s = jax.lax.dot_general(
                q[:, lo:hi], kbuf[slot][:, lo:hi], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (bq, bkv) base-2
            m_new = jnp.maximum(macc[:, lo:hi],
                                jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(macc[:, lo:hi] - m_new)
            p = jnp.exp2(s - m_new[:, 0:1])
            lacc[:, lo:hi] = lacc[:, lo:hi] * alpha + jnp.sum(
                p, axis=-1, keepdims=True)
            pv = jax.lax.dot(p.astype(jnp.bfloat16), vbuf[slot][:, lo:hi],
                             preferred_element_type=jnp.float32)
            oacc[:, lo:hi] = oacc[:, lo:hi] * alpha + pv
            macc[:, lo:hi] = m_new
        return carry

    jax.lax.fori_loop(0, nkv, body, 0)

    o_all = (oacc[...] / lacc[...]).astype(jnp.bfloat16)
    out = (jax.lax.dot(o_all, wo[...], preferred_element_type=jnp.float32)
           + bo[...] + xc.astype(jnp.float32))
    o_ref[0] = out.astype(o_ref.dtype)


def _fb_cpad(c):
    # manual HBM<->VMEM DMAs need a 128-multiple lane width (the round-2
    # "HBM DMA lane slices must be 128-aligned" rule — C=320 crashed the
    # compile helper at the first dma_start); k/v are lane-padded to the
    # next 128 multiple for the DMA'd buffers only
    return (c + 127) // 128 * 128


def _fb_pick(l, c, heads):
    """(bq, bkv) fitting the 14.5 MB scoped budget, or (0, 0). Larger bq
    first: the whole k/v re-streams once per q-block, so k/v HBM traffic is
    (l/bq) * l * cp * 4 bytes — bq=512 at L=9216 C=320 is ~9 GB/call (11 ms
    at peak BW, hidden under the ~35 ms of D=64 dots), bq=128 would be 4x
    that and poke above the compute envelope."""
    cp = _fb_cpad(c)
    for bq in (512, 256, 128):
        if l % bq:
            continue
        for bkv in (2048, 1536, 1152, 1024, 768, 512):
            if l % bkv or l // bkv < 2:
                continue
            est = (2 * 2 * bkv * cp * 2       # k/v chunk double buffers
                   + 2 * bq * bkv * 4         # score block + exp2 copy
                   + 3 * bq * c * 4           # m/l/o accumulator planes
                   + 2 * 2 * c * c * 2        # wq/wo, double-buffered consts
                   + 2 * 2 * bq * c * 2 * 2   # x/out blocks, double-buffered
                   + 3 * bq * c * 4)          # LN/q/out f32 transients
            if est < int(14.5 * 2**20):
                return bq, bkv
    return 0, 0


def flashblock_eligible(x, c, heads) -> bool:
    """Long-L fallback tier: whole-block and streaming kernels are VMEM-
    ineligible but the chunked online-softmax fits. bf16 only."""
    l = x.shape[1]
    return (
        jax.default_backend() == "tpu"
        and x.dtype == jnp.bfloat16
        and c % heads == 0
        and (c // heads) % 64 == 0
        and _fb_pick(l, c, heads)[0] > 0
    )


def _fb_impl(x, p_norm, p_attn, *, heads, bq=None, bkv=None):
    from ..nn import functional as F

    b, l, c = x.shape
    if bq is None or bkv is None:
        bq, bkv = _fb_pick(l, c, heads)
    wq, wk, wv, wo, bo = _prep(p_attn, c, heads)
    lnw32 = p_norm["weight"].astype(jnp.float32).reshape(1, c)
    lnb32 = p_norm["bias"].astype(jnp.float32).reshape(1, c)
    # k/v in plain XLA at full width (LN + matmul fuse well, ~95% MFU);
    # the kernel streams them per chunk, shared across heads
    xn = F.layer_norm(p_norm, x)
    k = jnp.einsum("blc,cd->bld", xn, wk.astype(x.dtype)).astype(jnp.bfloat16)
    v = jnp.einsum("blc,cd->bld", xn, wv.astype(x.dtype)).astype(jnp.bfloat16)
    cp = _fb_cpad(c)
    if cp != c:  # lane-pad for the manual k/v DMAs (see _fb_cpad)
        pad = [(0, 0), (0, 0), (0, cp - c)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        functools.partial(_fb_kernel, heads=heads, bq=bq, bkv=bkv, seq=l),
        grid=(b, l // bq),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            const, const, const, const, const,
            hbm, hbm,
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bkv, _fb_cpad(c)), jnp.bfloat16),   # k chunks
            pltpu.VMEM((2, bkv, _fb_cpad(c)), jnp.bfloat16),   # v chunks
            pltpu.VMEM((bq, c), jnp.float32),        # m plane
            pltpu.VMEM((bq, c), jnp.float32),        # l plane
            pltpu.VMEM((bq, c), jnp.float32),        # o accumulator
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(x, lnw32, lnb32, wq, wo, bo, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flashblock_self_attention(x, p_norm, p_attn, heads):
    """Chunked-KV LN -> spatial self-attention -> +residual for long L.
    x: (B, L, C); see flashblock_eligible."""
    return _fb_impl(x, p_norm, p_attn, heads=heads)


def _fbvjp_fwd(x, p_norm, p_attn, heads):
    return _fb_impl(x, p_norm, p_attn, heads=heads), (x, p_norm, p_attn)


flashblock_self_attention.defvjp(_fbvjp_fwd, _vjp_bwd)
