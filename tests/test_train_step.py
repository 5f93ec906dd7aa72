"""Train step: optimizer update, grad accumulation, EMA, temporal freezing,
and data-parallel execution on an 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudg_tpu.models import mdm as M
from mudg_tpu.train import step as TS
from mudg_tpu.parallel import mesh as PM

from test_mdm import tiny_mdm_cfg, B, T, H, W


def _batch(rng, b=2, accum=None):
    shape = lambda *s: ((accum, b) + s) if accum else ((b,) + s)
    k = jax.random.PRNGKey(rng)
    return {
        "dense_frames": jax.random.uniform(k, shape(T, H, W, 3), minval=-1, maxval=1),
        "sparse_frames": jax.random.uniform(k, shape(T, H, W, 3), minval=-1, maxval=1),
        "sparse_depth": jax.random.uniform(k, shape(T, H, W, 3), minval=-1, maxval=1),
        "tokens": jnp.zeros(shape(77), jnp.int32),
        "class_label": jnp.zeros(shape(), jnp.int32),
        "fps": jnp.full(shape(), 10, jnp.int32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_mdm_cfg()
    params = M.init_mdm(jax.random.PRNGKey(0), cfg)
    sched_arrays = M.schedule_arrays(cfg.schedule())
    null_tokens = jnp.zeros((77,), jnp.int32)
    return cfg, params, sched_arrays, null_tokens


def test_single_step_updates_params(setup):
    cfg, params, arrays, null = setup
    tc = TS.TrainConfig(accum_steps=1, learning_rate=1e-3)
    trainable, frozen = TS.split_params(params)
    state = TS.init_train_state(params, tc)
    step = TS.make_train_step(cfg, tc, frozen, arrays, null, impl="xla", remat=False, donate=False)
    state2, metrics = step(state, _batch(1), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # zero-init out conv still moves (weight decay + grads through other paths)
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params))
    )
    assert diff > 0


def test_grad_accumulation(setup):
    cfg, params, arrays, null = setup
    tc = TS.TrainConfig(accum_steps=2, learning_rate=1e-3)
    _, frozen = TS.split_params(params)
    state = TS.init_train_state(params, tc)
    step = TS.make_train_step(cfg, tc, frozen, arrays, null, impl="xla", remat=False, donate=False)
    state2, metrics = step(state, _batch(3, b=1, accum=2), jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_ema_updates(setup):
    cfg, params, arrays, null = setup
    tc = TS.TrainConfig(accum_steps=1, use_ema=True, learning_rate=1e-3)
    _, frozen = TS.split_params(params)
    state = TS.init_train_state(params, tc)
    step = TS.make_train_step(cfg, tc, frozen, arrays, null, impl="xla", remat=False, donate=False)
    state2, _ = step(state, _batch(5), jax.random.PRNGKey(6))
    assert state2.ema_params is not None
    # warmup: at step 0, decay = min(0.9999, 1/10) = 0.1 -> ema moves 90% toward new
    e0 = jax.tree.leaves(state.ema_params)[0]
    e1 = jax.tree.leaves(state2.ema_params)[0]
    p1 = jax.tree.leaves(state2.params)[0]
    expected = e0 - 0.9 * (e0 - p1)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(expected), atol=1e-6)


def test_temporal_frozen_mask(setup):
    cfg, params, arrays, null = setup
    mask = TS.temporal_frozen_mask(cfg.unet, params["unet"])
    # same structure
    assert jax.tree.structure(mask) == jax.tree.structure(params["unet"])
    flat_mask = jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen_leaves = [p for p, v in flat_mask if not v]
    trainable_leaves = [p for p, v in flat_mask if v]
    assert len(frozen_leaves) > 0 and len(trainable_leaves) > 0
    # attention block 1 in tiny cfg: [res, spatial, temporal] -> index '2' frozen
    keys = ["".join(str(getattr(k, "key", "")) for k in p) for p, _ in flat_mask if not _]
    assert any("input_blocks" in k and "2" in k for k in keys)

    # frozen leaves don't change after a masked step
    tc = TS.TrainConfig(accum_steps=1, learning_rate=1e-2, weight_decay=0.0)
    _, frozen = TS.split_params(params)
    state = TS.init_train_state(params, tc)
    gm = {"unet": mask, "image_proj": jax.tree.map(lambda _: True, state.params["image_proj"])}
    step = TS.make_train_step(cfg, tc, frozen, arrays, null, grad_mask=gm,
                              impl="xla", remat=False, donate=False)
    state2, _ = step(state, _batch(7), jax.random.PRNGKey(8))
    before = jax.tree_util.tree_flatten_with_path(state.params["unet"])[0]
    after = jax.tree_util.tree_flatten_with_path(state2.params["unet"])[0]
    mask_flat = {tuple(str(k) for k in p): v for p, v in flat_mask}
    for (pb, vb), (pa, va) in zip(before, after):
        key = tuple(str(k) for k in pb)
        if not mask_flat[key]:
            np.testing.assert_array_equal(np.asarray(vb), np.asarray(va))


def test_data_parallel_mesh_step(setup):
    """8 virtual CPU devices: batch sharded over ('data',), params replicated;
    one jitted step executes and returns finite loss."""
    cfg, params, arrays, null = setup
    assert jax.device_count() == 8
    mesh = PM.make_mesh()
    tc = TS.TrainConfig(accum_steps=1, learning_rate=1e-3)
    _, frozen = TS.split_params(params)
    state = TS.init_train_state(params, tc)

    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state = TS.TrainState(
        PM.replicate(state.params, mesh),
        PM.shard_tree_zero(state.opt_state, mesh),
        None,
        jax.device_put(state.step, rep),
    )
    frozen = PM.replicate(frozen, mesh)
    batch = PM.shard_batch(_batch(9, b=8), mesh)

    step = TS.make_train_step(cfg, tc, frozen, arrays, null, impl="xla", remat=False, donate=False)
    state2, metrics = step(state, batch, jax.random.PRNGKey(10))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_fsdp_param_sharding_step(setup):
    """FSDP/ZeRO-3 placement (place_train_state(fsdp=True)): params, moments
    and frozen towers sharded over ('data',); the step must produce the SAME
    loss and updated params as the replicated placement — sharding is pure
    placement, never math."""
    cfg, params, arrays, null = setup
    mesh = PM.make_mesh()
    tc = TS.TrainConfig(accum_steps=1, learning_rate=1e-3)
    _, frozen = TS.split_params(params)
    batch = _batch(11, b=8)

    def run(fsdp):
        state, fz = TS.place_train_state(
            TS.init_train_state(params, tc), frozen, mesh, fsdp=fsdp)
        if fsdp:
            sharded = [x for x in jax.tree.leaves(state.params)
                       if not x.sharding.is_fully_replicated]
            assert sharded, "fsdp placement left every param replicated"
        step = TS.make_train_step(cfg, tc, fz, arrays, null,
                                  impl="xla", remat=False, donate=False)
        st2, metrics = step(state, PM.shard_batch(batch, mesh),
                            jax.random.PRNGKey(12))
        return st2, float(metrics["loss"])

    st_rep, loss_rep = run(False)
    st_fsdp, loss_fsdp = run(True)
    assert abs(loss_rep - loss_fsdp) < 1e-5
    for a, b in zip(jax.tree.leaves(st_rep.params), jax.tree.leaves(st_fsdp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_place_train_state_tp_moments_mirror_params(setup):
    """Under TP the Adam mu/nu trees must take the params' TP shardings
    (local optimizer update), not stay replicated over 'model'."""
    cfg, params, arrays, null = setup
    mesh = PM.make_mesh([4, 2], ("data", "model"))
    tc = TS.TrainConfig(accum_steps=1)
    _, frozen = TS.split_params(params)
    state, _ = TS.place_train_state(
        TS.init_train_state(params, tc), frozen, mesh,
        fsdp=True, tp_axis="model", min_size=256)

    pspecs = jax.tree.map(lambda x: x.sharding.spec, state.params)
    assert any("model" in [a for a in s if a is not None]
               for s in jax.tree.leaves(pspecs,
                                        is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec)))
    # mu (and nu) mirror the params pytree: identical per-leaf specs
    def find_adam(s):
        if hasattr(s, "mu"):
            return s
        if isinstance(s, (tuple, list)):
            for x in s:
                r = find_adam(x)
                if r is not None:
                    return r
        return None

    mu = find_adam(state.opt_state).mu
    mspecs = jax.tree.map(lambda x: x.sharding.spec, mu)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: a == b, pspecs, mspecs,
        is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec)))


def test_zero_sharding_specs():
    mesh = PM.make_mesh()
    spec = PM.largest_divisible_axis_spec((320, 1280), 8, "data")
    assert spec == jax.sharding.PartitionSpec(None, "data")
    spec2 = PM.largest_divisible_axis_spec((7,), 8, "data")
    assert spec2 == jax.sharding.PartitionSpec()


def test_remat_policies_same_grads(setup):
    """Selective-remat policies change WHAT the backward replays, never the
    math: loss and every grad leaf must be identical to the no-remat graph
    (the TPU default is dots_ln; docs/STATE.md round-3 ablation)."""
    cfg, params, arrays, null = setup
    trainable, frozen = TS.split_params(params)
    batch = _batch(21)
    rng = jax.random.PRNGKey(22)
    null_emb = M.encode_text(params, cfg, null[None])

    def grads(remat):
        def f(tr):
            loss, _ = M.training_loss(
                TS.merge_params(tr, frozen), cfg, arrays, batch, rng,
                null_emb=null_emb, impl="xla", remat=remat)
            return loss
        return jax.jit(jax.value_and_grad(f))(trainable)

    l_ref, g_ref = grads(False)
    for policy in ("dots_ln", "dots_gn", "dots_small"):
        l, g = grads(policy)
        assert abs(float(l) - float(l_ref)) < 1e-6, policy
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=policy)


def test_lr_schedules():
    """ddpm3d.py:1007-1031 schedulers: warmup-lambda + cosine anneal."""
    tc = TS.TrainConfig(learning_rate=1e-3, scheduler="lambda_warmup",
                        warmup_steps=10)
    sched = TS.make_lr_schedule(tc, tc.learning_rate)
    assert np.isclose(float(sched(0)), 1e-4)
    assert np.isclose(float(sched(9)), 1e-3)
    assert np.isclose(float(sched(500)), 1e-3)  # constant after warmup

    tc = TS.TrainConfig(learning_rate=1e-3, scheduler="cosine",
                        decay_steps=100, min_lr_ratio=0.1)
    sched = TS.make_lr_schedule(tc, tc.learning_rate)
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(100)), 1e-4)  # alpha * lr
    mid = float(sched(50))
    assert 1e-4 < mid < 1e-3

    # default: constant (the MuDG stage configs set no scheduler key)
    assert TS.make_lr_schedule(TS.TrainConfig(), 1e-5) == 1e-5

    with pytest.raises(NotImplementedError):
        TS.make_lr_schedule(TS.TrainConfig(scheduler="nope"), 1e-5)

    # the optimizer builds and steps with a schedule active
    opt = TS.make_optimizer(TS.TrainConfig(scheduler="lambda_warmup"))
    p = {"w": jnp.ones((4,))}
    st = opt.init(p)
    g = {"w": jnp.ones((4,))}
    upd, st = opt.update(g, st, p)
    assert np.all(np.isfinite(np.asarray(upd["w"])))
