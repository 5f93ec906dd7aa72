"""Sharded inference on the 8-device CPU mesh: batch-parallel MDM sampling
agrees with the single-device result, and profiling helpers work."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudg_tpu.models import mdm as M
from mudg_tpu.parallel import mesh as PM
from test_mdm import tiny_mdm_cfg, T, H, W


def test_sharded_sampling_matches_replicated():
    cfg = tiny_mdm_cfg()
    params = M.init_mdm(jax.random.PRNGKey(0), cfg)
    b = 8  # one clip per device
    key = jax.random.PRNGKey(1)
    sparse = jax.random.uniform(key, (b, T, H, W, 3), minval=-1, maxval=1)
    depth = jax.random.uniform(key, (b, T, H, W, 3), minval=-1, maxval=1)
    tokens = jnp.zeros((b, 77), jnp.int32)
    null = jnp.zeros((77,), jnp.int32)
    labels = jnp.zeros((b,), jnp.int32)

    def run(sparse, depth, labels, tokens):
        return M.sample(
            params, cfg, jax.random.PRNGKey(2),
            sparse_frames=sparse, sparse_depth=depth, tokens=tokens,
            null_tokens=null, class_label=labels, num_steps=2,
            guidance_scale=7.5, decode=False, impl="xla",
        )

    ref = jax.jit(run)(sparse, depth, labels, tokens)

    mesh = PM.make_mesh()
    sparse_s = PM.shard_batch(sparse, mesh)
    depth_s = PM.shard_batch(depth, mesh)
    labels_s = PM.shard_batch(labels, mesh)
    tokens_s = PM.shard_batch(tokens, mesh)
    out = jax.jit(run)(sparse_s, depth_s, labels_s, tokens_s)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_profiling_helpers():
    from mudg_tpu.utils.profiling import StepTimer, device_memory_stats

    t = StepTimer()
    for _ in range(4):
        t.tick()
    s = t.stats()
    assert "p50_s" in s and s["steps_per_sec"] > 0
    stats = device_memory_stats()
    assert len(stats) == jax.device_count()


def test_tensor_parallel_unet_matches_replicated():
    """2-way tensor parallelism over ('data','model'): column/row-sharded
    attention+FF weights give the same UNet output as replicated params."""
    from mudg_tpu.nn import unet3d as U
    from mudg_tpu.parallel import tp as TP

    cfg = tiny_mdm_cfg().unet
    params = M.init_mdm(jax.random.PRNGKey(0), tiny_mdm_cfg())["unet"]
    b, t = 2, 4
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, 8, 8, cfg.in_channels))
    ts = jnp.array([3, 500])
    ctx = jax.random.normal(
        jax.random.PRNGKey(2),
        (b, 77 + t * cfg.image_tokens_per_frame, cfg.context_dim),
    )
    lab = jnp.array([0, 500])

    fn = jax.jit(lambda p, x: U.unet_apply(p, cfg, x, ts, ctx, c_label=lab,
                                           impl="xla"))
    ref = fn(params, x)

    mesh = PM.make_mesh([4, 2], ("data", "model"))
    # sanity: the layout actually shards something
    shardings = TP.unet_tp_shardings(params, mesh)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any(s != jax.sharding.PartitionSpec() for s in specs)

    params_tp = TP.shard_unet_tp(params, mesh)
    out = fn(params_tp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # int8-quantized UNets keep the same column/row layout (quant.py renames
    # 'weight' -> 'weight_i8'/'weight_q8'; the rules must still match) and
    # still run under the TP mesh
    from mudg_tpu import quant

    for mode in ("w8a8", "w8"):
        qparams = quant.quantize_pytree(params, min_size=0, mode=mode)
        qspecs = {
            jax.tree_util.keystr(path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(
                TP.unet_tp_shardings(qparams, mesh))[0]
        }
        n_sharded = sum(
            1 for k, s in qspecs.items()
            if ("weight_i8" in k or "weight_q8" in k)
            and s != jax.sharding.PartitionSpec()
        )
        assert n_sharded > 0, f"{mode}: no quantized leaf got a TP sharding"
        q_tp = TP.shard_unet_tp(qparams, mesh)
        out_q = fn(q_tp, x)
        ref_q = fn(qparams, x)
        np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q),
                                   atol=2e-5)


def test_tp_fsdp_2d_sharding_matches_replicated():
    """FSDP x TP 2D layout (tp.unet_tp_fsdp_shardings): TP column/row specs
    plus the largest TP-unused dim of each big leaf sharded over 'data'.
    The placed UNet's forward must match the replicated forward, the TP dims
    must be preserved, and at least one leaf must be sharded on BOTH axes."""
    from mudg_tpu.nn import unet3d as U
    from mudg_tpu.parallel import tp as TP

    cfg = tiny_mdm_cfg().unet
    params = M.init_mdm(jax.random.PRNGKey(0), tiny_mdm_cfg())["unet"]
    b, t = 2, 4
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, 8, 8, cfg.in_channels))
    ts = jnp.array([3, 500])
    ctx = jax.random.normal(
        jax.random.PRNGKey(2),
        (b, 77 + t * cfg.image_tokens_per_frame, cfg.context_dim),
    )
    lab = jnp.array([0, 500])
    fn = jax.jit(lambda p, x: U.unet_apply(p, cfg, x, ts, ctx, c_label=lab,
                                           impl="xla"))
    ref = fn(params, x)

    mesh = PM.make_mesh([4, 2], ("data", "model"))
    # the tiny preset's biggest leaves are small: lower min_size so the test
    # actually exercises the 2D path
    sh2d = TP.unet_tp_fsdp_shardings(params, mesh, min_size=256)
    tp_only = TP.unet_tp_shardings(params, mesh)
    both = 0
    for s2, s1 in zip(jax.tree.leaves(sh2d), jax.tree.leaves(tp_only)):
        axes = [a for a in s2.spec if a is not None]
        if "model" in axes:
            # TP-claimed dims must be untouched by the data sharding
            for i, a in enumerate(s1.spec):
                if a is not None:
                    assert s2.spec[i] == a
        if "model" in axes and "data" in axes:
            both += 1
    assert both > 0, "no leaf is sharded on both axes"

    params_2d = jax.tree.map(jax.device_put, params, sh2d)
    out = fn(params_2d, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sequence_parallel_unet_matches_replicated():
    """Single-clip sequence parallelism (parallel/sp.py): spatial layers
    sharded on the frame axis, temporal layers on W, all-to-alls inserted by
    the SPMD partitioner at the layout transitions. Output must match the
    unsharded UNet; the reference has no multi-device inference at all
    (SURVEY §2.6)."""
    from mudg_tpu.nn import unet3d as U
    from mudg_tpu.parallel import sp as SP

    cfg = tiny_mdm_cfg().unet
    params = M.init_mdm(jax.random.PRNGKey(0), tiny_mdm_cfg())["unet"]
    b, t = 2, 4  # B*T = 8 rows -> one frame per device
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, 8, 8, cfg.in_channels))
    ts = jnp.array([3, 500])
    ctx = jax.random.normal(
        jax.random.PRNGKey(2),
        (b, 77 + t * cfg.image_tokens_per_frame, cfg.context_dim),
    )
    lab = jnp.array([0, 500])

    ref = jax.jit(
        lambda p, x: U.unet_apply(p, cfg, x, ts, ctx, c_label=lab, impl="xla")
    )(params, x)

    mesh = PM.make_mesh(axis_names=("seq",))
    seq = SP.make_seq_sharding(mesh)
    fn_sp = jax.jit(lambda p, x: U.unet_apply(p, cfg, x, ts, ctx, c_label=lab,
                                              impl="xla", sp=seq))
    out = fn_sp(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # the partitioned module really redistributes at the spatial<->temporal
    # transitions (the constraints aren't optimized away into replication)
    hlo = fn_sp.lower(params, x).compile().as_text()
    assert any(op in hlo for op in
               ("all-to-all", "all-gather", "collective-permute")), \
        "expected resharding collectives in the partitioned HLO"

    # sequence parallelism composes with int8 quantization (serve/render can
    # pass both --seq_parallel and --quantize): the quantized sharded forward
    # must match the quantized replicated forward. conv_mode="w8" because
    # XLA's SPMD partitioner RET_CHECK-crashes on int8 conv_general_dilated
    # (s8 broadcast type mismatch) — render_infer applies the same fallback.
    from mudg_tpu import quant

    qparams = quant.quantize_pytree(params, min_size=0, conv_mode="w8")
    ref_q = jax.jit(
        lambda p, x: U.unet_apply(p, cfg, x, ts, ctx, c_label=lab, impl="xla")
    )(qparams, x)
    out_q = fn_sp(qparams, x)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q), atol=2e-5)


def test_sequence_parallel_sampling_matches_replicated():
    """Sequence-parallel INFERENCE end-to-end: one clip's DDIM sampling over
    the 8-device mesh matches the single-device result."""
    from mudg_tpu.parallel import sp as SP
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = tiny_mdm_cfg()
    params = M.init_mdm(jax.random.PRNGKey(0), cfg)
    b = 1
    key = jax.random.PRNGKey(1)
    sparse = jax.random.uniform(key, (b, T, H, W, 3), minval=-1, maxval=1)
    depth = jax.random.uniform(key, (b, T, H, W, 3), minval=-1, maxval=1)
    tokens = jnp.zeros((b, 77), jnp.int32)
    null = jnp.zeros((77,), jnp.int32)
    labels = jnp.zeros((b,), jnp.int32)

    def run(params, sparse, depth, labels, tokens, sp=None):
        return M.sample(
            params, cfg, jax.random.PRNGKey(2),
            sparse_frames=sparse, sparse_depth=depth, tokens=tokens,
            null_tokens=null, class_label=labels, num_steps=2,
            guidance_scale=7.5, decode=False, impl="xla", sp=sp,
        )

    ref = jax.jit(run)(params, sparse, depth, labels, tokens)

    mesh = PM.make_mesh(axis_names=("seq",))
    seq = SP.make_seq_sharding(mesh)
    rep = NamedSharding(mesh, P())
    params_r, sparse_r, depth_r, labels_r, tokens_r = jax.tree.map(
        lambda a: jax.device_put(a, rep),
        (params, sparse, depth, labels, tokens))
    out = jax.jit(lambda p, s, d, l, tk: run(p, s, d, l, tk, sp=seq))(
        params_r, sparse_r, depth_r, labels_r, tokens_r)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_sequence_parallel_training_step_matches():
    """Sequence-parallel TRAINING: one fwd+bwd+update step with the UNet
    frame/W-sharded over the 8-device mesh gives the same loss and updated
    params as the replicated step (the SURVEY §5.7 '(b·t)-axis sharding'
    memory lever for MDM1024-scale training)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mudg_tpu.parallel import sp as SP
    from mudg_tpu.train import step as TS
    from test_train_step import _batch

    cfg = tiny_mdm_cfg()
    params = M.init_mdm(jax.random.PRNGKey(0), cfg)
    arrays = M.schedule_arrays(cfg.schedule())
    null = jnp.zeros((77,), jnp.int32)
    tc = TS.TrainConfig(accum_steps=1, learning_rate=1e-3)
    _, frozen = TS.split_params(params)
    batch, key = _batch(1), jax.random.PRNGKey(2)

    state = TS.init_train_state(params, tc)
    step = TS.make_train_step(cfg, tc, frozen, arrays, null, impl="xla",
                              remat=False, donate=False)
    ref_state, ref_metrics = step(state, batch, key)

    mesh = PM.make_mesh(axis_names=("seq",))
    seq = SP.make_seq_sharding(mesh)
    rep = NamedSharding(mesh, P())
    put = lambda t: jax.tree.map(lambda a: jax.device_put(a, rep), t)
    state_r = TS.init_train_state(put(params), tc)
    step_sp = TS.make_train_step(cfg, tc, put(frozen), put(arrays), put(null),
                                 impl="xla", remat=False, donate=False, sp=seq)
    sp_state, sp_metrics = step_sp(state_r, put(batch), key)

    np.testing.assert_allclose(float(sp_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=1e-5)
    for a, b_ in zip(jax.tree.leaves(ref_state.params),
                     jax.tree.leaves(sp_state.params)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-5)


def test_dp_sp_fsdp_training_step_matches():
    """DP x SP x FSDP training: batch over 'data' x UNet activations
    sequence-parallel over 'seq' (sp.SeqSharding(data_axis='data') — the
    all-to-alls run within each seq group) x params/moments/frozen towers
    ZeRO-3-sharded over 'data'. One step must give the same loss and updated
    params as the plain unsharded step. The lowered module must carry the
    shard_map all-to-alls (bt/nd=4 and W=8,4 all divide the 4-wide seq
    group, so every boundary takes the explicit path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mudg_tpu.parallel import sp as SP
    from mudg_tpu.train import step as TS
    from test_train_step import _batch

    cfg = tiny_mdm_cfg()
    params = M.init_mdm(jax.random.PRNGKey(0), cfg)
    arrays = M.schedule_arrays(cfg.schedule())
    null = jnp.zeros((77,), jnp.int32)
    tc = TS.TrainConfig(accum_steps=1, learning_rate=1e-3)
    _, frozen = TS.split_params(params)
    batch, key = _batch(1, b=2), jax.random.PRNGKey(2)

    state = TS.init_train_state(params, tc)
    step = TS.make_train_step(cfg, tc, frozen, arrays, null, impl="xla",
                              remat=False, donate=False)
    ref_state, ref_metrics = step(state, batch, key)

    mesh = PM.make_mesh([2, 4], ("data", "seq"))
    seq = SP.make_seq_sharding(mesh, data_axis="data")
    sstate, sfrozen = TS.place_train_state(
        TS.init_train_state(params, tc), frozen, mesh, fsdp=True,
        axis="data", min_size=256)
    step_sp = TS.make_train_step(cfg, tc, sfrozen, arrays, null,
                                 impl="xla", remat=False, donate=False,
                                 sp=seq)
    sbatch = PM.shard_batch(batch, mesh)
    low = step_sp.jitted.lower(sfrozen, sstate, sbatch, key).as_text()
    assert ("all_to_all" in low) or ("all-to-all" in low)
    sp_state, sp_metrics = step_sp(sstate, sbatch, key)

    np.testing.assert_allclose(float(sp_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=1e-5)
    for a, b_ in zip(jax.tree.leaves(ref_state.params),
                     jax.tree.leaves(sp_state.params)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-5)


def test_tensor_parallel_sampling_matches_replicated():
    """Tensor-parallel INFERENCE: UNet weights column/row-sharded over a
    ('model',) mesh via parallel/tp.py annotations; the SPMD partitioner
    inserts the all-reduces. Sampling output must match the replicated run
    (single clip, so this is the pure TP latency-scaling path)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mudg_tpu.parallel import tp as TP

    cfg = tiny_mdm_cfg()
    params = M.init_mdm(jax.random.PRNGKey(0), cfg)
    b = 1
    key = jax.random.PRNGKey(1)
    sparse = jax.random.uniform(key, (b, T, H, W, 3), minval=-1, maxval=1)
    depth = jax.random.uniform(key, (b, T, H, W, 3), minval=-1, maxval=1)
    tokens = jnp.zeros((b, 77), jnp.int32)
    null = jnp.zeros((77,), jnp.int32)
    labels = jnp.zeros((b,), jnp.int32)

    def run(params, sparse, depth, labels, tokens):
        return M.sample(
            params, cfg, jax.random.PRNGKey(2),
            sparse_frames=sparse, sparse_depth=depth, tokens=tokens,
            null_tokens=null, class_label=labels, num_steps=2,
            guidance_scale=7.5, decode=False, impl="xla",
        )

    ref = jax.jit(run)(params, sparse, depth, labels, tokens)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
    params_tp = {**params, "unet": TP.shard_unet_tp(params["unet"], mesh)}
    rep = NamedSharding(mesh, P())
    args = jax.tree.map(lambda a: jax.device_put(a, rep),
                        (sparse, depth, labels, tokens))
    out = jax.jit(run)(params_tp, *args)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
