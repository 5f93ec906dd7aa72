"""3D UNet: topology vs the reference construction, shapes, param counts,
embedding conditioning, and gradient flow with remat."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudg_tpu.nn import unet3d as U


def tiny_cfg(**kw):
    base = dict(
        in_channels=12,
        out_channels=4,
        model_channels=32,
        num_res_blocks=1,
        attention_resolutions=(2, 1),
        channel_mult=(1, 2),
        num_head_channels=16,
        context_dim=24,
        temporal_length=4,
        image_tokens_per_frame=2,
    )
    base.update(kw)
    return U.UNetConfig(**base)


def test_block_plan_matches_reference_topology():
    """Full-size config must produce the reference's block indices:
    12 input blocks (conv_in + 2x[res,sp,tmp] per level + 3 downs),
    middle = res,sp,tmp,res, 12 output blocks."""
    cfg = U.UNetConfig()
    inp, mid, out = U.block_plan(cfg)
    assert len(inp) == 12  # 1 + (2+1)*3 + 2
    assert [lt for lt, _ in inp[1]] == ["res", "spatial", "temporal"]
    assert [lt for lt, _ in inp[3]] == ["down"]
    # ds=8 level has no attention (attention_resolutions (4,2,1))
    assert [lt for lt, _ in inp[10]] == ["res"]
    assert [lt for lt, _ in mid] == ["res", "spatial", "temporal", "res"]
    assert len(out) == 12
    # last block of non-zero levels ends with upsample
    assert out[2][-1][0] == "up"
    assert [lt for lt, _ in out[-1]] == ["res", "spatial", "temporal"]
    # heads = channels // 64
    assert inp[1][1][1]["heads"] == 5
    assert inp[4][1][1]["heads"] == 10
    assert inp[7][1][1]["heads"] == 20


def test_full_unet_param_count():
    """Reference UNet (DynamiCrafter-512 derived, + MuDG conv_in/class-embed
    surgery) is ~1.44B params. Guard against topology drift; computed
    abstractly so the test is cheap."""
    cfg = U.UNetConfig()
    shapes = jax.eval_shape(lambda k: U.init_unet(k, cfg), jax.random.PRNGKey(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 1.40e9 < n < 1.48e9, f"unexpected param count {n:,}"


def test_unet_forward_shapes_and_grad():
    cfg = tiny_cfg()
    params = U.init_unet(jax.random.PRNGKey(0), cfg)
    b, t, h, w = 2, 4, 8, 8
    x = jnp.ones((b, t, h, w, cfg.in_channels), jnp.float32)
    ts = jnp.array([3, 500])
    ctx = jnp.ones((b, 77 + t * cfg.image_tokens_per_frame, cfg.context_dim))
    label = jnp.array([0, 500])

    fwd = jax.jit(lambda p, remat: U.unet_apply(
        p, cfg, x, ts, ctx, c_label=label, remat=remat), static_argnums=1)
    y = fwd(params, False)
    assert y.shape == (b, t, h, w, cfg.out_channels)
    assert np.all(np.isfinite(np.asarray(y)))

    # remat path agrees with non-remat and is differentiable
    def loss(p):
        return jnp.mean(
            U.unet_apply(p, cfg, x, ts, ctx, c_label=label, remat=True) ** 2
        )

    g = jax.jit(jax.grad(loss))(params)
    gnorm = sum(jnp.sum(jnp.abs(v)) for v in jax.tree.leaves(g))
    assert np.isfinite(float(gnorm)) and float(gnorm) >= 0

    y2 = fwd(params, True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-6)


def test_class_label_changes_output():
    cfg = tiny_cfg()
    params = U.init_unet(jax.random.PRNGKey(0), cfg)
    # at init every zero-init conv/proj (reference design) makes the UNet
    # ignore conditioning entirely; fill zeros with noise to test the wiring
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
    leaves = [
        jax.random.normal(k, l.shape, l.dtype) * 0.02 if float(jnp.abs(l).sum()) == 0 else l
        for k, l in zip(keys, leaves)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    b, t = 1, 4
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, 8, 8, cfg.in_channels))
    ts = jnp.array([100])
    ctx = jnp.ones((b, 77 + t * cfg.image_tokens_per_frame, cfg.context_dim))
    y0 = U.unet_apply(params, cfg, x, ts, ctx, c_label=jnp.array([0]))
    y500 = U.unet_apply(params, cfg, x, ts, ctx, c_label=jnp.array([500]))
    assert float(jnp.max(jnp.abs(y0 - y500))) > 1e-6


def test_context_without_image_tokens_broadcasts():
    cfg = tiny_cfg()
    params = U.init_unet(jax.random.PRNGKey(0), cfg)
    b, t = 1, 4
    x = jnp.zeros((b, t, 8, 8, cfg.in_channels))
    ts = jnp.array([0])
    ctx = jnp.ones((b, 50, cfg.context_dim))  # not 77+t*16 -> broadcast path
    y = U.unet_apply(params, cfg, x, ts, ctx, c_label=jnp.array([0]))
    assert y.shape == (b, t, 8, 8, 4)


def test_zero_init_out_conv():
    """out conv is zero-init so an untrained UNet emits zeros (stable v-pred init)."""
    cfg = tiny_cfg()
    params = U.init_unet(jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(params["out"]["2"]["weight"]), 0.0)


def test_unet_temporal_cross_attention_path():
    """temporal_selfatt_only=False (openaimodel3d.py:412 only_self_att):
    temporal blocks' attn2 cross-attends per-frame context. The forward must
    run, differ from a zeroed-context forward (context reaches the temporal
    blocks), and the init must size attn2 k/v to context_dim."""
    cfg = tiny_cfg(temporal_selfatt_only=False)
    params = U.init_unet(jax.random.PRNGKey(0), cfg)
    ia = params["init_attn"]["0"]["transformer_blocks"]["0"]["attn2"]
    assert ia["to_k"]["weight"].shape[0] == cfg.context_dim
    # temporal blocks (not init_attn) as well
    plans = U.block_plan(cfg)[0]
    ti = next(i for i, plan in enumerate(plans)
              for lt, _ in plan if lt == "temporal")
    li = next(str(j) for j, (lt, _) in enumerate(plans[ti]) if lt == "temporal")
    tb = params["input_blocks"][str(ti)][li]["transformer_blocks"]["0"]["attn2"]
    assert tb["to_k"]["weight"].shape[0] == cfg.context_dim

    # re-randomize every leaf: init_unet zero-inits the final conv and the
    # transformers' proj_out, which would make the output context-blind
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [jax.random.normal(k, l.shape, jnp.float32) * 0.05
         for k, l in zip(keys, leaves)])

    b, t = 1, cfg.temporal_length
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (b, t, 8, 8, cfg.in_channels)) * 0.5
    ts_ = jnp.zeros((b,), jnp.int32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(2),
        (b, 77 + t * cfg.image_tokens_per_frame, cfg.context_dim))
    lab = jnp.zeros((b,), jnp.int32)
    out = U.unet_apply(params, cfg, x, ts_, ctx, c_label=lab, impl="xla")
    assert np.all(np.isfinite(np.asarray(out)))
    out0 = U.unet_apply(params, cfg, x, ts_, ctx * 0, c_label=lab, impl="xla")
    assert float(jnp.abs(out - out0).max()) > 1e-6
