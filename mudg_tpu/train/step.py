"""Training step: optimizer, EMA, gradient accumulation, mesh sharding.

TPU rebuild of the reference training runtime (`main/trainer.py`,
PL + DDPSharded + fp16): the step is one jitted function over a device mesh —
batch sharded on ('data',), trainable params replicated, optimizer moments
ZeRO-sharded (parallel/mesh.py). XLA inserts the gradient all-reduce over ICI.

Matches the reference recipe:
  * AdamW (ddpm3d.py:1292), lr = base_lr (scale_lr False in the stage
    configs; trainer.py:88-93 otherwise multiplies by world_size*bs),
  * global-norm gradient clipping 0.5 (config.yaml:139-140),
  * grad accumulation 2 via lax.scan microbatches (config.yaml:133),
  * trainable set = UNet + image projector; VAE/CLIP frozen
    (ddpm3d.py:1267-1282),
  * LitEma decay with warmup min(decay, (1+n)/(10+n)) (lvdm/ema.py:29-34).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import mdm as M

TRAINABLE_KEYS = ("unet", "image_proj")
FROZEN_KEYS = ("vae", "clip_text", "clip_image")


class TrainState(NamedTuple):
    params: Any          # trainable sub-pytree {unet, image_proj}
    opt_state: Any
    ema_params: Any | None
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1.0e-5      # config.yaml:3
    weight_decay: float = 0.01         # torch AdamW default
    beta1: float = 0.9
    beta2: float = 0.999
    grad_clip: float = 0.5             # config.yaml:140
    accum_steps: int = 2               # config.yaml:133
    use_ema: bool = False              # config.yaml:23
    ema_decay: float = 0.9999
    scale_lr: bool = False
    temporal_frozen: bool = False      # stage-2: freeze temporal layers
    # LR schedule (ddpm3d.py:1007-1031 configure_schedulers; the shipped MuDG
    # stage configs set no `scheduler:` key, so the default is constant LR —
    # parity). "lambda_warmup": linear 0->1 warmup over warmup_steps, then
    # constant (the LambdaLR recipe LVDM configs use); "cosine": cosine
    # anneal to min_lr_ratio*lr over decay_steps (CosineAnnealingLR T_max).
    scheduler: str | None = None
    warmup_steps: int = 1000
    decay_steps: int = 100000
    min_lr_ratio: float = 0.0


def split_params(params: dict):
    trainable = {k: params[k] for k in TRAINABLE_KEYS if k in params}
    frozen = {k: params[k] for k in FROZEN_KEYS if k in params}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    return {**trainable, **frozen}


def temporal_frozen_mask(unet_cfg, unet_params) -> dict:
    """True/False pytree over UNet params marking *trainable* leaves under
    stage-2 temporal freezing: the per-level TemporalTransformers are frozen
    (attention.py:522-527 via temporal_frozen=True in the stage-2 config);
    init_attn and temporal convs stay trainable (they receive no
    temporal_frozen flag, openaimodel3d.py:404-414)."""
    from ..nn.unet3d import block_plan

    inp_plan, mid_plan, out_plan = block_plan(unet_cfg)

    def mark(plans, blocks):
        out = {}
        for i, plan in enumerate(plans):
            bi = {}
            for j, (ltype, _) in enumerate(plan):
                trainable = ltype != "temporal"
                bi[str(j)] = jax.tree.map(lambda _: trainable, blocks[str(i)][str(j)])
            out[str(i)] = bi
        return out

    mask = {k: jax.tree.map(lambda _: True, v) for k, v in unet_params.items()
            if k not in ("input_blocks", "middle_block", "output_blocks")}
    mask["input_blocks"] = mark(inp_plan, unet_params["input_blocks"])
    mask["output_blocks"] = mark(out_plan, unet_params["output_blocks"])
    mask["middle_block"] = {
        str(j): jax.tree.map(lambda _: ltype != "temporal", unet_params["middle_block"][str(j)])
        for j, (ltype, _) in enumerate(mid_plan)
    }
    return mask


def place_train_state(state: "TrainState", frozen: dict, mesh, *,
                      fsdp: bool = False, axis: str = "data",
                      tp_axis: str | None = None, min_size: int = 2**14):
    """Place a TrainState + frozen towers on a mesh. Returns (state, frozen).

    fsdp=False (default, the reference's DDPSharded analog,
    main/utils_train.py:126-137): params/EMA replicated, optimizer moments
    ZeRO-2-sharded over `axis`.

    fsdp=True (ZeRO-3 / FSDP, beyond the reference): params, moments, EMA
    AND the frozen encoder towers are all sharded over `axis` on each leaf's
    largest divisible dim (parallel/mesh.shard_tree_zero). Pure placement —
    the XLA SPMD partitioner inserts the all-gathers at use and
    reduce-scatters in backward; per-chip HBM for the 1.44B bf16 params +
    f32 masters + 2 moments drops ~n_devices-fold, the lever for MDM1024
    training at scale.

    tp_axis: name of a size>1 'model' mesh axis to add Megatron column/row
    tensor parallelism on the attention/FF weights (parallel/tp.py); with
    fsdp=True the two compose (tp.unet_tp_fsdp_shardings). TP requires the
    step to run impl='xla' (the SPMD partitioner cannot split Pallas calls).
    The Adam mu/nu trees mirror the params pytree exactly and take the SAME
    TP(,FSDP) shardings — the optimizer update stays local per shard; other
    opt-state leaves and the frozen towers follow the fsdp/ZeRO placement.

    min_size: leaves smaller than this stay replicated (both the ZeRO and
    the FSDP-over-TP placements)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import mesh as PM

    def zero(t):
        return PM.shard_tree_zero(t, mesh, axis, min_size=min_size)

    place = zero if fsdp else (lambda t: PM.replicate(t, mesh))
    param_shardings = None
    if tp_axis is not None and mesh.shape[tp_axis] > 1:
        from ..parallel import tp as TP

        param_shardings = (
            TP.unet_tp_fsdp_shardings(state.params, mesh, tp_axis, axis,
                                      min_size=min_size)
            if fsdp else TP.unet_tp_shardings(state.params, mesh, tp_axis)
        )

    def place_like_params(t):
        if param_shardings is None:
            return place(t)
        return jax.tree.map(jax.device_put, t, param_shardings)

    pstruct = jax.tree.structure(state.params)

    def is_params_shaped(n):
        try:
            return jax.tree.structure(n) == pstruct
        except Exception:
            return False

    def place_opt(t):
        if param_shardings is None:
            return zero(t)
        return jax.tree.map(
            lambda n: (jax.tree.map(jax.device_put, n, param_shardings)
                       if is_params_shaped(n) else zero(n)),
            t, is_leaf=is_params_shaped,
        )

    new_state = TrainState(
        place_like_params(state.params),
        place_opt(state.opt_state),
        place_like_params(state.ema_params)
        if state.ema_params is not None else None,
        jax.device_put(state.step, NamedSharding(mesh, P())),
    )
    return new_state, place(frozen)


def make_lr_schedule(tc: TrainConfig, lr: float):
    """Optax schedule mirroring ddpm3d.py:1007-1031. None -> constant."""
    if tc.scheduler is None:
        return lr
    if tc.scheduler == "lambda_warmup":
        return lambda step: lr * jnp.minimum(
            (step + 1.0) / max(tc.warmup_steps, 1), 1.0)
    if tc.scheduler == "cosine":
        return optax.cosine_decay_schedule(
            lr, tc.decay_steps, alpha=tc.min_lr_ratio)
    raise NotImplementedError(f"scheduler {tc.scheduler!r}")


def make_optimizer(tc: TrainConfig, world_batch: int | None = None):
    lr = tc.learning_rate
    if tc.scale_lr and world_batch:
        lr = lr * world_batch  # trainer.py:91
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(make_lr_schedule(tc, lr),
                    b1=tc.beta1, b2=tc.beta2, weight_decay=tc.weight_decay),
    )


def init_train_state(params: dict, tc: TrainConfig) -> TrainState:
    trainable, _ = split_params(params)
    opt = make_optimizer(tc)
    opt_state = opt.init(trainable)
    ema = jax.tree.map(jnp.copy, trainable) if tc.use_ema else None
    return TrainState(trainable, opt_state, ema, jnp.zeros((), jnp.int32))


def ema_update(ema, new, step, decay=0.9999):
    """LitEma shadow update with warmup (lvdm/ema.py:29-41)."""
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p), ema, new)


def make_train_step(
    cfg: M.MDMConfig,
    tc: TrainConfig,
    frozen_params: dict,
    sched_arrays,
    null_tokens,
    *,
    grad_mask=None,
    impl: str = "train",
    remat: bool | str = "dots_attn",
    donate: bool = True,
    sp=None,
):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    batch leaves have a leading microbatch axis when tc.accum_steps > 1:
    (accum, B_micro, ...). The scan accumulates gradients before one
    optimizer update (the accumulate_grad_batches analog). `grad_mask` is a
    True/False pytree over trainable params (see temporal_frozen_mask);
    False leaves get zero updates.

    sp: optional parallel.sp.SeqSharding — sequence-parallel the UNet
    forward/backward (frame-sharded spatial layers, W-sharded temporal
    layers). An activation-memory and latency lever for MDM1024-scale
    training when the per-clip activations outgrow one chip; requires
    impl="xla" (the SPMD partitioner cannot split Pallas calls).

    remat: True = full per-block recompute; "dots_attn" (default) saves
    tagged matmul/conv/attention-block, GroupNorm/LayerNorm AND flash
    kernel (o, lse) outputs — the backward replay substitutes the saved
    attention outputs so the flash forward kernel never reruns (verified
    via jaxpr pallas-call counts) — but still recomputes the GEGLU 8C
    inners. Measured 727 ms/step at MDM512 bs=1 single-chip vs 732
    "dots_ln" (same process; earlier session: 724/742/839 for
    dots_ln/dots_small/full — scripts/rematab.py, docs/STATE.md round 3);
    "convs" saves half the activation HBM for tighter configs (751 ms).
    "except_ff" (save everything but the 8C inners) fails to compile at
    bs=1 — HBM wall.
    """
    opt = make_optimizer(tc)

    # The null-prompt embedding is constant across steps: encode it ONCE here
    # instead of running a CLIP text forward inside every step. (1, 77, D) is
    # ~300 KB — safe to close over, unlike the multi-GB towers below.
    null_emb = jax.jit(
        lambda fz, toks: M.encode_text(fz, cfg, toks[None])
    )(frozen_params, null_tokens)

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        return M.training_loss(
            params, cfg, sched_arrays, batch, rng,
            null_emb=null_emb, impl=impl, remat=remat, sp=sp,
        )

    def step_fn(frozen, state: TrainState, batch, rng):
        if tc.accum_steps > 1:
            keys = jax.random.split(rng, tc.accum_steps)

            def micro(carry, xs):
                grads_acc, loss_acc = carry
                mb, k = xs
                (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, frozen, mb, k
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss), _ = jax.lax.scan(
                micro, (zero, jnp.zeros(())), (batch, keys)
            )
            grads = jax.tree.map(lambda g: g / tc.accum_steps, grads)
            loss = loss / tc.accum_steps
        else:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, frozen, batch, rng
            )

        if grad_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g * jnp.asarray(m, g.dtype), grads, grad_mask
            )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, params, state.step, tc.ema_decay)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(params, opt_state, ema, state.step + 1)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    # frozen params ride as a jit ARGUMENT: closure capture bakes the 2-3 GB
    # frozen tower weights into the executable as constants and roughly
    # doubles compile time (CLAUDE.md / round-1 finding; observed again via
    # the captured-constants warning in scripts/trainbench.py).
    donate_args = (1,) if donate else ()
    jitted = jax.jit(step_fn, donate_argnums=donate_args)

    def run(state, batch, rng):
        return jitted(frozen_params, state, batch, rng)

    # expose the underlying jit for AOT inspection (dryrun_multichip greps
    # the lowered module for the sequence-parallel all-to-alls)
    run.jitted = jitted
    run.frozen_params = frozen_params
    return run
