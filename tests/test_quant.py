"""int8 post-training quantization (mudg_tpu/quant.py).

Validates the W8A8 scheme numerically on CPU: per-channel weight roundtrip,
quantized linear/conv/temporal-conv against their fp32 counterparts, and the
whole-UNet quantized forward staying close to the bf16/f32 forward (the
serving-path quality bound)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudg_tpu import quant
from mudg_tpu.nn import functional as F
from mudg_tpu.nn import unet3d as U


def snr_db(ref, y):
    ref = np.asarray(ref, np.float64)
    y = np.asarray(y, np.float64)
    err = np.mean((ref - y) ** 2)
    sig = np.mean(ref**2) + 1e-30
    return 10 * np.log10(sig / max(err, 1e-30))


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, (64, 48)).astype(np.float32)
    # one column with a very different magnitude: per-channel scales must adapt
    w[:, 7] *= 40.0
    w_i8, scale = quant.quantize_weight(jnp.asarray(w))
    assert w_i8.dtype == jnp.int8 and scale.shape == (48,)
    wd = np.asarray(w_i8, np.float32) * np.asarray(scale)
    # max error is half an int8 step per channel
    step = np.asarray(scale)
    assert np.all(np.abs(wd - w) <= 0.5 * step + 1e-8)
    assert snr_db(w, wd) > 40


@pytest.mark.parametrize("mode,key,bound", [
    ("w8a8", "weight_i8", 35),
    ("w8", "weight_q8", 40),  # weight-only: no activation-quant error
])
def test_linear_quantized_matches_fp32(mode, key, bound):
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.05, (96, 64)).astype(np.float32)
    b = rng.normal(0, 0.1, (64,)).astype(np.float32)
    x = rng.normal(0, 1.0, (5, 7, 96)).astype(np.float32)
    p = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    q = quant.quantize_pytree(p, min_size=0, mode=mode)
    assert key in q and q[key].shape == (96, 64) and "weight" not in q
    y_ref = F.linear(p, jnp.asarray(x))
    y_q = F.linear(q, jnp.asarray(x))
    assert y_q.dtype == y_ref.dtype
    assert snr_db(y_ref, y_q) > bound


def test_w8_conv_and_temporal_conv():
    rng = np.random.default_rng(9)
    w = rng.normal(0, 0.05, (3, 3, 16, 24)).astype(np.float32)
    x = rng.normal(0, 1.0, (2, 9, 11, 16)).astype(np.float32)
    p = {"weight": jnp.asarray(w)}
    q = quant.quantize_pytree(p, min_size=0, mode="w8")
    assert snr_db(F.conv2d(p, jnp.asarray(x)), F.conv2d(q, jnp.asarray(x))) > 38

    wt = rng.normal(0, 0.05, (3, 1, 1, 16, 16)).astype(np.float32)
    xv = rng.normal(0, 1.0, (2, 5, 4, 6, 16)).astype(np.float32)
    pt = {"weight": jnp.asarray(wt)}
    qt = quant.quantize_pytree(pt, min_size=0, mode="w8")
    assert snr_db(F.conv3d(pt, jnp.asarray(xv)), F.conv3d(qt, jnp.asarray(xv))) > 38


def test_conv2d_i8_matches_fp32():
    rng = np.random.default_rng(2)
    w = rng.normal(0, 0.05, (3, 3, 16, 24)).astype(np.float32)
    b = rng.normal(0, 0.1, (24,)).astype(np.float32)
    x = rng.normal(0, 1.0, (2, 9, 11, 16)).astype(np.float32)
    p = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    q = quant.quantize_pytree(p, min_size=0)
    y_ref = F.conv2d(p, jnp.asarray(x))
    y_q = F.conv2d(q, jnp.asarray(x))
    assert y_q.shape == y_ref.shape
    assert snr_db(y_ref, y_q) > 30


def test_conv2d_i8_strided_padded():
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.05, (3, 3, 8, 8)).astype(np.float32)
    x = rng.normal(0, 1.0, (2, 8, 8, 8)).astype(np.float32)
    p = {"weight": jnp.asarray(w)}
    q = quant.quantize_pytree(p, min_size=0)
    y_ref = F.conv2d(p, jnp.asarray(x), stride=2, padding=((1, 1), (1, 1)))
    y_q = F.conv2d(q, jnp.asarray(x), stride=2, padding=((1, 1), (1, 1)))
    assert y_q.shape == y_ref.shape
    assert snr_db(y_ref, y_q) > 30


def test_temporal_conv311_i8_matches_fp32():
    rng = np.random.default_rng(4)
    w = rng.normal(0, 0.05, (3, 1, 1, 16, 16)).astype(np.float32)
    b = rng.normal(0, 0.02, (16,)).astype(np.float32)
    x = rng.normal(0, 1.0, (2, 5, 4, 6, 16)).astype(np.float32)
    p = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    q = quant.quantize_pytree(p, min_size=0)
    y_ref = F.conv3d(p, jnp.asarray(x))  # shifted-matmul path
    y_q = F.conv3d(q, jnp.asarray(x))    # temporal_conv311_i8
    assert y_q.shape == y_ref.shape
    assert snr_db(y_ref, y_q) > 30


def test_conv_w8a8_to_w8_rename():
    """conv_w8a8_to_w8 demotes only true-conv w8a8 leaves (ndim > 2, not
    (3,1,1) temporal) by a pure key rename: the result must be IDENTICAL to
    quantizing with conv_mode='w8' in the first place, and linear/temporal
    leaves must keep their w8a8 key."""
    rng = np.random.default_rng(7)
    p = {
        "conv": {"weight": jnp.asarray(rng.normal(0, 0.05, (3, 3, 8, 8)).astype(np.float32))},
        "tconv": {"weight": jnp.asarray(rng.normal(0, 0.05, (3, 1, 1, 16, 16)).astype(np.float32))},
        "lin": {"weight": jnp.asarray(rng.normal(0, 0.05, (16, 16)).astype(np.float32)),
                "bias": jnp.zeros((16,))},
    }
    q = quant.quantize_pytree(p, min_size=0)
    demoted, n = quant.conv_w8a8_to_w8(q)
    assert n == 1
    assert "weight_q8" in demoted["conv"] and "weight_i8" not in demoted["conv"]
    assert "weight_i8" in demoted["tconv"]   # (3,1,1) runs as matmuls: keep
    assert "weight_i8" in demoted["lin"]
    ref = quant.quantize_pytree(p, min_size=0, conv_mode="w8")
    for path in (("conv", "weight_q8"), ("conv", "scale")):
        np.testing.assert_array_equal(
            np.asarray(demoted[path[0]][path[1]]),
            np.asarray(ref[path[0]][path[1]]))
    # idempotent on an already-demoted tree
    again, n2 = quant.conv_w8a8_to_w8(demoted)
    assert n2 == 0


def test_quantize_pytree_selectivity():
    """Norms/embeddings/small leaves stay fp; conv/linear weights convert."""
    rng = jax.random.PRNGKey(0)
    p = {
        "lin": F.init_linear(rng, 64, 64),
        "norm": F.init_norm(64),
        "small": F.init_linear(rng, 4, 4),
        "rel": {"embeddings_table": jnp.zeros((33, 64))},
    }
    q = quant.quantize_pytree(p, min_size=1024)
    assert "weight_i8" in q["lin"] and "weight" not in q["lin"]
    assert "weight" in q["norm"]          # 1-D, never quantized
    assert "weight" in q["small"]          # under threshold
    assert "embeddings_table" in q["rel"]  # untouched
    rep = quant.size_report(q)
    assert rep["int8_bytes"] == 64 * 64


def test_quantize_pytree_which_conv():
    """which="conv" quantizes only spatial convs: linears and (3,1,1)
    temporal convs keep their bf16 'weight' leaf (so the fused Pallas
    kernels stay engaged); conv3x3 leaves convert."""
    rng = jax.random.PRNGKey(0)
    p = {
        "lin": F.init_linear(rng, 64, 64),
        "conv": F.init_conv(rng, (3, 3), 32, 32),
        "tconv": F.init_conv(rng, (3, 1, 1), 32, 32),
    }
    q = quant.quantize_pytree(p, min_size=0, which="conv")
    assert "weight" in q["lin"] and "weight" in q["tconv"]
    assert "weight_i8" in q["conv"] and "weight" not in q["conv"]
    # w8 conv_mode composes with the filter
    q8 = quant.quantize_pytree(p, min_size=0, which="conv", conv_mode="w8")
    assert "weight_q8" in q8["conv"] and "weight" in q8["lin"]


def test_quantize_pytree_jit_matches_eager():
    """The single-executable (jit=True, default) conversion matches the
    eager walk: identical tree structure, scales within float-fusion ulps,
    int8 codes off by at most 1 at round boundaries."""
    rng = jax.random.PRNGKey(3)
    p = {"lin": F.init_linear(rng, 48, 96),
         "conv": F.init_conv(rng, (3, 3), 16, 32)}
    qj = quant.quantize_pytree(p, min_size=0)
    qe = quant.quantize_pytree(p, min_size=0, jit=False)
    assert jax.tree.structure(qj) == jax.tree.structure(qe)
    for a, b in zip(jax.tree.leaves(qj), jax.tree.leaves(qe)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.int8:
            assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1
        else:
            np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_unet_quantized_forward_close(dtype):
    """Whole tiny-UNet forward: quantized output stays close to full-precision
    (the end-to-end serving quality bound; per-layer SNR compounds)."""
    cfg = U.UNetConfig(
        in_channels=12, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_head_channels=16,
        context_dim=16, temporal_length=4, image_tokens_per_frame=16,
        dropout=0.0,
    )
    rng = jax.random.PRNGKey(0)
    params = U.init_unet(rng, cfg)
    # re-randomize every leaf: init_unet zero-inits the final conv (and other
    # proj_out leaves), which would make the forward identically zero and the
    # comparison vacuous
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(rng, len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [jax.random.normal(k, l.shape, jnp.float32) * 0.05
         for k, l in zip(keys, leaves)],
    )
    qparams = quant.quantize_pytree(params, min_size=0)

    b, t, hw = 1, 4, 8
    x = jax.random.normal(rng, (b, t, hw, hw, 12), dtype)
    ctx = jax.random.normal(rng, (b, 77 + t * 16, 16), dtype) * 0.3
    lbl = jnp.zeros((b,), jnp.int32)

    fwd = jax.jit(lambda pp: U.unet_apply(
        pp, cfg, x, jnp.array([500]), ctx, c_label=lbl))
    y_ref = fwd(
        jax.tree.map(lambda a: a.astype(dtype) if a.ndim >= 2 else a, params))
    y_q = fwd(qparams)
    assert y_q.shape == y_ref.shape and y_q.dtype == y_ref.dtype
    # bf16 reference itself has ~0.4% noise; int8 must stay in the same
    # regime. 20 dB latent SNR ~= 1% relative error end-to-end.
    assert snr_db(np.asarray(y_ref, np.float32), np.asarray(y_q, np.float32)) > (
        20 if dtype == jnp.float32 else 15
    )


def test_sample_with_quantized_unet():
    """End-to-end guided sampling with an int8 UNet (the render_infer
    --quantize int8 path): runs, stays finite, and stays close to the
    full-precision sample at identical seeds."""
    from mudg_tpu.models import mdm as M
    from tests.test_mdm import tiny_mdm_cfg

    cfg = tiny_mdm_cfg()
    params = M.init_mdm(jax.random.PRNGKey(0), cfg)
    # randomize the UNet (init zero-inits proj_out/final conv leaves, which
    # would make the denoiser output — and thus the comparison — degenerate)
    leaves, treedef = jax.tree.flatten(params["unet"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = dict(params, unet=jax.tree.unflatten(
        treedef,
        [jax.random.normal(k, l.shape, jnp.float32) * 0.05
         for k, l in zip(keys, leaves)],
    ))
    qparams = dict(params, unet=quant.quantize_pytree(params["unet"], min_size=0))
    B, T, H, W = 1, 4, 16, 16
    rng = jax.random.PRNGKey(1)
    kw = dict(
        sparse_frames=jax.random.uniform(rng, (B, T, H, W, 3), minval=-1, maxval=1),
        sparse_depth=jax.random.uniform(rng, (B, T, H, W, 3), minval=-1, maxval=1),
        tokens=jnp.zeros((B, 77), jnp.int32),
        null_tokens=jnp.zeros((77,), jnp.int32),
        class_label=jnp.zeros((B,), jnp.int32),
        num_steps=2, guidance_scale=7.5, guidance_rescale=0.7, impl="xla",
    )
    out_ref = M.sample(params, cfg, jax.random.PRNGKey(3), **kw)
    out_q = M.sample(qparams, cfg, jax.random.PRNGKey(3), **kw)
    assert out_q.shape == out_ref.shape
    assert np.all(np.isfinite(np.asarray(out_q)))
    # guided multi-step sampling amplifies per-layer noise; int8 must still
    # track the full-precision trajectory closely in pixel space
    assert snr_db(out_ref, out_q) > 12


def test_quantize_ckpt_app_roundtrip(tmp_path):
    """apps/quantize_ckpt: orbax -> quantized orbax; int8 leaves survive the
    save/restore and the result loads as a serving checkpoint."""
    from mudg_tpu.apps import quantize_ckpt
    from mudg_tpu.models import mdm as M
    from mudg_tpu.train import checkpoint as C
    from tests.test_mdm import tiny_mdm_cfg

    cfg = tiny_mdm_cfg()
    params = M.init_mdm(jax.random.PRNGKey(0), cfg)
    src = str(tmp_path / "src")
    C.save_pytree(src, params)

    out = str(tmp_path / "q")
    rc = quantize_ckpt.main([
        "--ckpt", src, "--out", out, "--preset", "tiny",
        "--mode", "int8", "--min_size", "0",
    ])
    assert rc == 0
    restored = C.load_pytree(out)
    qleaf = restored["unet"]["input_blocks"]["1"]["0"]["in_layers"]["2"]
    assert qleaf["weight_i8"].dtype == jnp.int8
    w_src = params["unet"]["input_blocks"]["1"]["0"]["in_layers"]["2"]["weight"]
    deq = (np.asarray(qleaf["weight_i8"], np.float32)
           * np.asarray(qleaf["scale"]))
    assert snr_db(np.asarray(w_src), deq) > 40
    # the quantized tree runs through the model forward
    y = M.denoise(
        restored, cfg,
        jnp.zeros((1, 4, 8, 8, 4)), jnp.array([5]),
        jnp.zeros((1, 4, 8, 8, 8)),
        jnp.zeros((1, 77 + 4 * 2, 16)), jnp.zeros((1,), jnp.int32),
    )
    assert np.all(np.isfinite(np.asarray(y)))


def test_quantized_tree_is_jit_argument_friendly():
    """The quantized pytree must pass through jit boundaries (int8 leaves as
    arguments, not baked constants)."""
    rng = jax.random.PRNGKey(1)
    p = F.init_linear(rng, 64, 32)
    q = quant.quantize_pytree(p, min_size=0)
    x = jax.random.normal(rng, (8, 64))

    @jax.jit
    def f(q, x):
        return F.linear(q, x)

    y = f(q, x)
    assert y.shape == (8, 32)


def test_quantize_weight_clip_pct_beats_absmax_on_outliers():
    """Sparse within-channel outliers inflate an absmax scale; percentile
    clipping (clip_pct) must recover resolution on the non-outlier mass
    while the outliers saturate at +-127 (quant.quantize_weight docstring)."""
    rng = np.random.default_rng(5)
    w = rng.normal(0, 0.05, (4096, 8)).astype(np.float32)
    spikes = rng.random((4096, 8)) < 1e-3
    w = np.where(spikes, w * 30.0, w)
    wj = jnp.asarray(w)

    def body_snr(clip_pct):
        w_i8, scale = quant.quantize_weight(wj, clip_pct=clip_pct)
        wd = np.asarray(w_i8, np.float32) * np.asarray(scale)
        mask = ~spikes  # quality on the 99.9% non-outlier mass
        return snr_db(w[mask], wd[mask])

    snr_abs, snr_clip = body_snr(None), body_snr(99.9)
    assert snr_clip > snr_abs + 6  # >= 1 extra bit of resolution

    # clipped values saturate, never wrap
    w_i8, scale = quant.quantize_weight(wj, clip_pct=99.9)
    assert int(jnp.max(jnp.abs(w_i8))) == 127

    # pytree plumbing: clip_pct reaches the leaves through the jitted walk
    p = {"weight": wj, "bias": jnp.zeros((8,))}
    q = quant.quantize_pytree(p, min_size=0, clip_pct=99.9)
    q_ref, _ = quant.quantize_weight(wj, clip_pct=99.9)
    np.testing.assert_array_equal(np.asarray(q["weight_i8"]), np.asarray(q_ref))


def test_quantize_pytree_which_conv_wide():
    """conv_wide = spatial convs + matmul-like leaves with min channel dim
    >= 1024 (2-D linears AND (3,1,1) temporal convs, which run as shifted
    matmuls); narrow matmuls and norms stay untouched."""
    rng = np.random.default_rng(11)
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.05, s).astype(np.float32))
    p = {
        "conv": {"weight": mk(3, 3, 8, 8)},
        "tconv_narrow": {"weight": mk(3, 1, 1, 320, 320)},
        "tconv_wide": {"weight": mk(3, 1, 1, 1280, 1280)},
        "lin_narrow": {"weight": mk(320, 320)},
        "lin_wide": {"weight": mk(1280, 1280)},
        "lin_rect": {"weight": mk(1280, 640)},  # min dim 640 < 1024
        "norm": {"weight": mk(1280)},
    }
    q = quant.quantize_pytree(p, min_size=0, which="conv_wide")
    assert "weight_i8" in q["conv"]
    assert "weight" in q["tconv_narrow"]          # narrow tconv untouched
    assert "weight_i8" in q["tconv_wide"]
    assert "weight" in q["lin_narrow"]
    assert "weight_i8" in q["lin_wide"]
    assert "weight" in q["lin_rect"]
    assert "weight" in q["norm"]
