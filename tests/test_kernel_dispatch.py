"""Kernel dispatch / VMEM-estimator boundary tests.

These pin the calibrated scoped-vmem models to the compile outcomes observed
on real v5e hardware (docs/STATE.md session 4): every block-size choice
below was either measured to compile or measured to OOM the 16 MB
scoped-vmem limit. If an estimator change flips one of these, it WILL
reintroduce a remote-compiler crash (opaque HTTP 500) at runtime.
"""
import jax.numpy as jnp
import numpy as np

from mudg_tpu.kernels import mlp as M
from mudg_tpu.kernels import spatial_attn as SP
from mudg_tpu.kernels import temporal_attn as TA


def test_spatial_attn_bq_choices():
    # Round-5 recalibration: the kernel now ALIASES its x/out block
    # (input_output_aliases), cutting 3.3 MB from the fixed envelope that
    # had made it graph-context-fragile (the non-aliased (2560,320)
    # instance ran at 16.07M actual and OOM'd the driver entry() graph by
    # 76 KB while compiling fine in bench's graph for three rounds). The
    # 12M estimate budget leaves ~3.3M for the observed graph overhead.
    assert SP._pick_bq(2560, 320) == 256
    assert SP._pick_bq(640, 640) == 128
    assert SP._pick_bq(1024, 320) == 512
    # MDM1024 shapes exceed the envelope entirely -> stream/flashblock.
    assert SP._pick_bq(9216, 320) == 0
    assert SP._pick_bq(2304, 640) == 0
    assert SP._stream_vmem_est(2304, 640) < int(14.5 * 2**20)
    # the pre-aliasing hardware-rejected config class keeps a margin note:
    # est + 3.3M observed overhead must stay under the 16M limit
    assert SP._vmem_est(2560, 320, 256) + int(3.3 * 2**20) < 16 * 2**20


def test_spatial_attn_stream_envelope():
    # The streaming variant exists exactly for MDM1024 ds2 (L=2304, C=640):
    # whole-block ineligible (above), streaming fits (k/v 5.9M + weights
    # 3.3M + score pair 2.4M ~= 12M).
    assert SP._stream_vmem_est(2304, 640) < int(14.5 * 2**20)
    # MDM1024 ds1 (L=9216, C=320): k/v alone 11.8M + score pair 9.4M -> out.
    assert SP._stream_vmem_est(9216, 320) >= int(14.5 * 2**20)


def test_temporal_attn_group_choices():
    # C=320 double kernel at group=8 (measured 1.74 ms); C=640 only the
    # single-stage kernel fits, at group=4 (double crashed at any group).
    assert TA._pick_group(81920, 320, 2) == 8
    assert TA._pick_group(20480, 640, 1) == 4
    assert TA._pick_group(20480, 640, 2) < 4
    # C=1280: one stage's full-width weights alone are 13.1 MB -> XLA.
    assert TA._pick_group(5120, 1280, 1) == 0


def test_temporal_attn_eligibility():
    x320 = jnp.zeros((5120, 16, 320), jnp.bfloat16)
    # backend is CPU under tests -> never eligible at runtime here, but the
    # shape legs of the predicate must hold
    assert 128 % 16 == 0 and (5120 * 16) % 128 == 0
    assert not TA.eligible(x320.astype(jnp.float32), 320, 5, 16)  # bf16 only


def test_ff_block_bm_choices():
    # Observed: C=512 (init_attn, inner 2048) OOMs at bm=1024 (18.0M real);
    # C=320 compiles at bm=1024; C=640 OOMs at bm=1024 (18.18M real).
    assert M._pick_block_sizes(81920, 320, 1280)[1] == 1024
    assert M._pick_block_sizes(81920, 512, 2048)[1] == 512
    assert M._pick_block_sizes(20480, 640, 2560)[1] == 512


def test_ff_block_matches_module_estimator():
    """The inline estimator above must track _ff_block_apply's actual bm
    selection (smoke: run tiny shapes through the public op and compare
    against the unfused composition)."""
    from mudg_tpu.nn import attention as A
    from mudg_tpu.nn import functional as F

    c = 64
    x = jnp.linspace(-1, 1, 2 * 256 * c, dtype=jnp.float32).reshape(2, 256, c)
    w1 = jnp.eye(c, 8 * c) * 0.5
    b1 = jnp.zeros((8 * c,))
    w2 = jnp.eye(4 * c, c) * 0.5
    b2 = jnp.zeros((c,))
    lnw = jnp.ones((c,))
    lnb = jnp.zeros((c,))
    out = M.fused_geglu_ff_block(x, lnw, lnb, w1, b1, w2, b2)
    pf = {"net": {"0": {"proj": {"weight": w1, "bias": b1}},
                  "2": {"weight": w2, "bias": b2}}}
    ref = A.feed_forward(pf, F.layer_norm({"weight": lnw, "bias": lnb}, x)) + x
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2 * float(jnp.abs(ref).max()))


def test_tconv_fused_parity_interpret():
    """Fused GN+SiLU+tconv stage (kernels/tconv.py) vs the XLA composition,
    f32 math in interpret mode on a tiny video block."""
    import jax

    from mudg_tpu.kernels import tconv as TC
    from mudg_tpu.nn import functional as F

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    b, t, h, w, c = 1, 4, 8, 16, 64
    x = jax.random.normal(ks[0], (b, t, h, w, c), jnp.float32).astype(jnp.bfloat16)
    p_gn = {"weight": jax.random.normal(ks[1], (c,), jnp.float32) * 0.1 + 1.0,
            "bias": jax.random.normal(ks[2], (c,), jnp.float32) * 0.1}
    p_conv = {"weight": jax.random.normal(ks[3], (3, 1, 1, c, c), jnp.float32) * 0.05,
              "bias": jnp.zeros((c,), jnp.float32)}
    got = TC.fused_gn_silu_tconv(x, p_gn, p_conv)
    want = F.conv3d(p_conv, F.silu(F.group_norm(p_gn, x)))
    gf = np.asarray(got, np.float32)
    wf = np.asarray(want, np.float32)
    scale = np.abs(wf).max()
    assert np.abs(gf - wf).max() <= 0.05 * scale + 1e-3


def test_tconv_eligibility():
    from mudg_tpu.kernels import tconv as TC

    x = jnp.zeros((1, 16, 40, 64, 320), jnp.bfloat16)
    ok_conv = {"weight": jnp.zeros((3, 1, 1, 320, 320), jnp.bfloat16)}
    # backend-gated: on CPU never eligible; shape rules still enforced
    import jax

    expected = jax.default_backend() == "tpu"
    assert TC.eligible(x, ok_conv) == expected
    # C=640 measured slower than XLA -> never eligible
    x640 = jnp.zeros((1, 16, 36, 64, 640), jnp.bfloat16)
    c640 = {"weight": jnp.zeros((3, 1, 1, 640, 640), jnp.bfloat16)}
    assert not TC.eligible(x640, c640)
    # int8-quantized convs (no 'weight') keep the quant path
    assert not TC.eligible(x, {"weight_i8": jnp.zeros((3, 1, 1, 320, 320), jnp.int8)})
