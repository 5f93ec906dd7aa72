"""DynamiCrafter-style 3D video UNet denoiser, TPU-first.

Functional rebuild of `lvdm/modules/networks/openaimodel3d.py` (UNetModel,
ResBlock, TemporalConvBlock, Down/Upsample, lines 19-628):

  * activations are channels-last; spatial layers see (B*T, H, W, C) and
    temporal layers (B, T, H, W, C) — same dataflow invariant as the
    reference's rearrange sandwich (openaimodel3d.py:43-45, 591, 627),
  * a static "block plan" derived from the config drives both parameter
    initialization and the forward pass, so the pytree structure always
    matches the torch state_dict layout (input_blocks.N.M..., including the
    reference's 'temopral_conv' key spelling, openaimodel3d.py:190),
  * time/fps/class-label embeddings: sinusoidal -> 2-layer MLP, summed
    (openaimodel3d.py:567-602); class labels {0,1,500,1000} select the task,
  * context is the hard-coded 77 text + T*16 per-frame image token split
    (openaimodel3d.py:581-585),
  * gradient checkpointing via jax.checkpoint per block when remat=True.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import jax.numpy as jnp

from . import functional as F
from . import attention as A
from ..core.schedules import timestep_embedding
from ..parallel import sp as SP


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Mirrors the reference UNetModel kwargs (stage configs, config.yaml:32-64)."""
    in_channels: int = 12          # 4 noisy + 4 sparse-RGB z + 4 sparse-depth z
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    dropout: float = 0.1
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    use_linear: bool = True
    temporal_conv: bool = True
    temporal_attention: bool = True
    # only_self_att on the reference's TemporalTransformer (attention.py:505):
    # every MuDG config sets temporal_selfatt_only: true; False routes the
    # text/image context into the temporal blocks' attn2 (cross path)
    temporal_selfatt_only: bool = True
    use_relative_position: bool = False
    use_causal_attention: bool = False
    temporal_length: int = 16
    addition_attention: bool = True
    image_cross_attention: bool = True
    image_cross_attention_scale_learnable: bool = False
    default_fs: int = 10
    fs_condition: bool = True
    class_label_condition: bool = True
    domain_cross_attention: bool = False  # JointCrossAttention in input blocks
    num_tasks: int = 1
    text_context_len: int = 77
    image_tokens_per_frame: int = 16  # Resampler num_queries


# ---------------------------------------------------------------------------
# Block plan: static description of the UNet topology (init/apply share it)
# ---------------------------------------------------------------------------

def block_plan(cfg: UNetConfig):
    """Returns (input_blocks, middle_block, output_blocks, out_ch_trace).

    Each block is a list of (layer_type, layer_static_args) tuples where
    layer_type in {conv_in, res, spatial, temporal, down, up}. Mirrors the
    construction loop in openaimodel3d.py:398-565.
    """
    mc = cfg.model_channels
    tdim = 4 * mc

    def heads(ch):
        return ch // cfg.num_head_channels

    inp = [[("conv_in", dict(c_in=cfg.in_channels, c_out=mc))]]
    input_chans = [mc]
    ch, ds = mc, 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            block = [("res", dict(c_in=ch, c_out=mult * mc, emb=tdim,
                                  temporal=cfg.temporal_conv))]
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                # only input-block spatial transformers carry the joint task
                # attention (openaimodel3d.py:441 vs :487,:534)
                block.append(("spatial", dict(ch=ch, heads=heads(ch),
                                              domain=cfg.domain_cross_attention)))
                if cfg.temporal_attention:
                    block.append(("temporal", dict(ch=ch, heads=heads(ch))))
            inp.append(block)
            input_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            inp.append([("down", dict(ch=ch))])
            input_chans.append(ch)
            ds *= 2

    mid = [
        ("res", dict(c_in=ch, c_out=ch, emb=tdim, temporal=cfg.temporal_conv)),
        ("spatial", dict(ch=ch, heads=heads(ch))),
    ]
    if cfg.temporal_attention:
        mid.append(("temporal", dict(ch=ch, heads=heads(ch))))
    mid.append(("res", dict(c_in=ch, c_out=ch, emb=tdim, temporal=cfg.temporal_conv)))

    out = []
    chans = list(input_chans)
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            block = [("res", dict(c_in=ch + ich, c_out=mult * mc, emb=tdim,
                                  temporal=cfg.temporal_conv))]
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                block.append(("spatial", dict(ch=ch, heads=heads(ch))))
                if cfg.temporal_attention:
                    block.append(("temporal", dict(ch=ch, heads=heads(ch))))
            if level and i == cfg.num_res_blocks:
                block.append(("up", dict(ch=ch)))
                ds //= 2
            out.append(block)
    return inp, mid, out


# ---------------------------------------------------------------------------
# Layer forwards
# ---------------------------------------------------------------------------

def temporal_conv_block(p, x, *, drop_rng=None, dropout=0.0, impl="auto"):
    """TemporalConvBlock (openaimodel3d.py:239-279): four GN->SiLU->Conv3d(3,1,1)
    stages with zero-init conv4; residual. x: (B, T, H, W, C).

    On TPU inference each stage runs as one fused Pallas kernel
    (kernels/tconv.py: folded-GN + SiLU + lane-concat 3-tap matmul — 2.5x
    the XLA chain at MDM1024 ds1, one HBM read+write per stage). Training
    (impl="train") and dropout keep the shifted-matmul XLA path, whose
    backward is plain XLA (the kernel's custom_vjp would replay)."""
    use_fused = (
        impl == "auto"
        and (drop_rng is None or dropout <= 0.0)
        and os.environ.get("MUDG_FUSED_TCONV", "1") == "1"
    )
    if use_fused:
        from ..kernels import tconv as TC

        use_fused = all(
            TC.eligible(x, stage)
            for stage in (p["conv1"]["2"], p["conv2"]["3"],
                          p["conv3"]["3"], p["conv4"]["3"])
        )
    if use_fused:
        h = TC.fused_gn_silu_tconv(x, p["conv1"]["0"], p["conv1"]["2"])
        h = TC.fused_gn_silu_tconv(h, p["conv2"]["0"], p["conv2"]["3"])
        h = TC.fused_gn_silu_tconv(h, p["conv3"]["0"], p["conv3"]["3"])
        h = TC.fused_gn_silu_tconv(h, p["conv4"]["0"], p["conv4"]["3"])
        return x + h
    identity = x
    h = F.conv3d(p["conv1"]["2"], F.silu(F.group_norm(p["conv1"]["0"], x)))
    h = F.silu(F.group_norm(p["conv2"]["0"], h))
    h = _dropout(h, dropout, drop_rng)
    h = F.conv3d(p["conv2"]["3"], h)
    h = F.silu(F.group_norm(p["conv3"]["0"], h))
    h = _dropout(h, dropout, drop_rng)
    h = F.conv3d(p["conv3"]["3"], h)
    h = F.silu(F.group_norm(p["conv4"]["0"], h))
    h = _dropout(h, dropout, drop_rng)
    h = F.conv3d(p["conv4"]["3"], h)
    return identity + h


def _dropout(x, rate, rng):
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)




def resblock(p, x, emb, *, batch_size=None, dropout=0.0, drop_rng=None,
             sp=None, impl="auto"):
    """ResBlock (+optional TemporalConvBlock), openaimodel3d.py:109-236.

    x: (B*T, H, W, C), emb: (B*T, emb_dim). batch_size enables the temporal
    conv (reshapes to (B, T, H, W, C) around it, openaimodel3d.py:232-235).
    """
    h = F.conv2d(p["in_layers"]["2"], F.silu(F.group_norm(p["in_layers"]["0"], x)))
    emb_out = F.linear(p["emb_layers"]["1"], F.silu(emb)).astype(h.dtype)
    h = h + emb_out[:, None, None, :]
    h = F.silu(F.group_norm(p["out_layers"]["0"], h))
    h = _dropout(h, dropout, drop_rng)
    h = F.conv2d(p["out_layers"]["3"], h)
    if "skip_connection" in p:
        x = F.conv2d(p["skip_connection"], x)
    h = x + h
    if "temopral_conv" in p and batch_size is not None:
        hv = SP.to_video(h, batch_size, sp)
        hv = temporal_conv_block(p["temopral_conv"], hv, dropout=dropout,
                                 drop_rng=drop_rng, impl=impl)
        h = SP.to_rows(hv, sp)
    return h


def downsample(p, x):
    """Conv stride-2 downsample with torch pad=1 semantics (openaimodel3d.py:51-77)."""
    return F.conv2d(p["op"], x, stride=2, padding=((1, 1), (1, 1)))


def upsample(p, x):
    """Nearest 2x + conv (openaimodel3d.py:80-106)."""
    return F.conv2d(p["conv"], F.upsample_nearest_2x(x))


# ---------------------------------------------------------------------------
# UNet forward
# ---------------------------------------------------------------------------

def _apply_block(
    layers_p, layers_plan, h, emb, context, *, cfg, batch_size, impl, drop_rng,
    sp=None,
):
    dropout = cfg.dropout if drop_rng is not None else 0.0
    for idx, (ltype, args) in enumerate(layers_plan):
        p = layers_p[str(idx)]
        if ltype == "conv_in":
            h = F.conv2d(p, h)
        elif ltype == "res":
            h = resblock(p, h, emb, batch_size=batch_size, dropout=dropout,
                         drop_rng=drop_rng, sp=sp, impl=impl)
        elif ltype == "spatial":
            h = A.spatial_transformer(
                p, h, context, heads=args["heads"], depth=cfg.transformer_depth,
                image_cross=cfg.image_cross_attention, text_len=cfg.text_context_len,
                num_tasks=cfg.num_tasks, impl=impl,
            )
        elif ltype == "temporal":
            hv = SP.to_video(h, batch_size, sp)
            # context is already per-frame rows (B*T, L, D) — the reference
            # layout its only_self_att=False branch consumes (unet_apply
            # preamble, openaimodel3d.py:581-588)
            hv = A.temporal_transformer(
                p, hv, None if cfg.temporal_selfatt_only else context,
                heads=args["heads"], depth=cfg.transformer_depth,
                causal=cfg.use_causal_attention,
                temporal_length=cfg.temporal_length, impl=impl,
            )
            h = SP.to_rows(hv, sp)
        elif ltype == "down":
            h = downsample(p, h)
        elif ltype == "up":
            h = upsample(p, h)
        else:
            raise ValueError(ltype)
    return h


def unet_apply(
    params,
    cfg: UNetConfig,
    x,
    timesteps,
    context,
    *,
    c_label=None,
    fs=None,
    impl="auto",
    remat=False,
    drop_rng=None,
    sp=None,
):
    """UNetModel.forward (openaimodel3d.py:567-628).

    x: (B, T, H, W, C_in) channels-last video latents (+concat conditions).
    timesteps: (B,) int; context: (B, 77 + T*16, context_dim) or (B, L, D);
    c_label: (B,) task labels; fs: (B,) frame-stride/fps.
    sp: optional parallel.sp.SeqSharding — shards spatial layers on the
    frame axis and temporal layers on W for single-clip latency scaling
    over a mesh (requires impl="xla"; Pallas calls can't be partitioned).
    Returns (B, T, H, W, out_channels).
    """
    b, t, hh, ww, _ = x.shape
    mc = cfg.model_channels
    dtype = x.dtype

    t_emb = timestep_embedding(timesteps, mc).astype(dtype)
    emb = F.linear(params["time_embed"]["2"], F.silu(F.linear(params["time_embed"]["0"], t_emb)))

    if cfg.class_label_condition:
        assert c_label is not None, "class_label is required"
        c_emb = timestep_embedding(c_label, mc).astype(dtype)
        c_emb = F.linear(params["class_embed"]["2"], F.silu(F.linear(params["class_embed"]["0"], c_emb)))
        emb = emb + c_emb

    # context split: 77 text tokens broadcast over frames, 16 image tokens
    # per frame distributed to their frame (openaimodel3d.py:581-588)
    l_ctx = context.shape[1]
    if l_ctx == cfg.text_context_len + t * cfg.image_tokens_per_frame:
        ctx_text = context[:, : cfg.text_context_len]
        ctx_img = context[:, cfg.text_context_len :]
        ctx_text = jnp.repeat(ctx_text, t, axis=0)  # (B*T, 77, D)
        ctx_img = ctx_img.reshape(b * t, cfg.image_tokens_per_frame, -1)
        context = jnp.concatenate([ctx_text, ctx_img], axis=1)
    else:
        context = jnp.repeat(context, t, axis=0)
    emb = jnp.repeat(emb, t, axis=0)

    if cfg.fs_condition:
        if fs is None:
            fs = jnp.full((b,), cfg.default_fs, dtype=jnp.int32)
        fs_emb = timestep_embedding(fs, mc).astype(dtype)
        fs_emb = F.linear(params["fps_embedding"]["2"], F.silu(F.linear(params["fps_embedding"]["0"], fs_emb)))
        emb = emb + jnp.repeat(fs_emb, t, axis=0)

    if sp is not None and impl != "xla":
        # The SPMD partitioner cannot split a tpu_custom_call: any Pallas
        # kernel inside the sharded graph is a compile-time crash on a real
        # TPU mesh (invisible on CPU test meshes, where kernels don't
        # dispatch). Same rule as tensor parallelism (parallel/tp.py).
        raise ValueError(f"sequence parallelism requires impl='xla', got {impl!r}")

    h = x.reshape(b * t, hh, ww, x.shape[-1])
    if sp is not None:
        h = SP.rows(h, sp)
        emb = SP.rows(emb, sp)
        context = SP.rows(context, sp)

    inp_plan, mid_plan, out_plan = block_plan(cfg)

    def run(plan, p, h):
        def f(p, h, emb, context):
            return _apply_block(p, plan, h, emb, context, cfg=cfg,
                                batch_size=b, impl=impl, drop_rng=drop_rng,
                                sp=sp)
        if remat:
            # remat=True: full per-block recompute (lowest memory).
            # remat="names": save each transformer block's attention/FF
            # outputs (checkpoint_name tags in nn/attention.py) so the
            # backward replay skips recomputing them — ~1 GB of bf16
            # activations at MDM512 bs=1 for one fewer attention+FF forward
            # per block in the backward.
            # remat="dots": save ALL matmul/conv outputs — OOMs at MDM512
            # bs=1 single-chip (docs/STATE.md); kept for sharded scales.
            # remat="dots_small": save every tagged matmul/conv output
            # (qkv/out projections, resblock convs, temporal convs) but
            # recompute the cheap elementwise/norm chains and the huge
            # GEGLU inners (tag "ff_inner", excluded) — the backward
            # replay then skips re-running the MXU-heavy ops without the
            # remat="dots" policy's OOM (it kept the 8C FF intermediates).
            # remat="convs": like dots_small minus the attention/proj
            # linears — half the activation HBM, for tighter configs.
            if remat == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif remat == "dots_small":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "mm_out", "conv_out", "tconv_out",
                    "blk_attn1", "blk_attn2", "blk_ff")
            elif remat == "dots_ln":
                # dots_gn + LayerNorm outputs (attention-block pre-norms,
                # another fp32-stat island recomputed in the replay)
                policy = jax.checkpoint_policies.save_only_these_names(
                    "mm_out", "conv_out", "tconv_out", "gn_out", "ln_out",
                    "blk_attn1", "blk_attn2", "blk_ff")
            elif remat == "dots_attn":
                # dots_ln + the flash-attention kernel outputs (o, lse):
                # kernels/flash_attention tags them and attaches the
                # FA-2 backward via an inputs-only-residual custom_vjp, so
                # the backward replay substitutes the saved o/lse and the
                # forward kernel is DCE'd from the replay — one flash fwd
                # per site instead of two. ~27 MB per ds1 site at bs=1.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "mm_out", "conv_out", "tconv_out", "gn_out", "ln_out",
                    "attn_o", "attn_lse", "attn_h1",
                    "blk_attn1", "blk_attn2", "blk_ff")
            elif remat == "except_ff":
                # save EVERY intermediate except the tagged GEGLU 8C inners
                # — probes how close to remat=False the HBM allows
                policy = jax.checkpoint_policies.save_anything_except_these_names(
                    "ff_inner")
            elif remat == "dots_gn":
                # dots_small + GroupNorm outputs: the fp32-island GN stats
                # are the costliest non-matmul replay (83 ms family cost at
                # MDM512 bs=1, docs/STATE.md round 3); saving the bf16 GN
                # output skips them at ~26 MB per GN at bs=1.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "mm_out", "conv_out", "tconv_out", "gn_out",
                    "blk_attn1", "blk_attn2", "blk_ff")
            elif remat == "convs":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "tconv_out",
                    "blk_attn1", "blk_attn2", "blk_ff")
            elif remat == "names":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "blk_attn1", "blk_attn2", "blk_ff")
            else:
                policy = None
            f = jax.checkpoint(f, policy=policy)
        return f(p, h, emb, context)

    hs = []
    for i, plan in enumerate(inp_plan):
        h = run(plan, params["input_blocks"][str(i)], h)
        if i == 0 and cfg.addition_attention:
            hv = SP.to_video(h, b, sp)
            hv = A.temporal_transformer(
                params["init_attn"]["0"], hv,
                None if cfg.temporal_selfatt_only else context, heads=8,
                depth=cfg.transformer_depth, causal=False,
                temporal_length=cfg.temporal_length, impl=impl,
            )
            h = SP.to_rows(hv, sp)
        hs.append(h)

    h = run(mid_plan, params["middle_block"], h)

    for i, plan in enumerate(out_plan):
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        h = run(plan, params["output_blocks"][str(i)], h)

    h = F.silu(F.group_norm(params["out"]["0"], h))
    y = F.conv2d(params["out"]["2"], h)
    return y.reshape(b, t, hh, ww, cfg.out_channels)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_res(rng, c_in, c_out, emb, temporal, dropout):
    ks = jax.random.split(rng, 5)
    p = {
        "in_layers": {"0": F.init_norm(c_in), "2": F.init_conv(ks[0], (3, 3), c_in, c_out)},
        "emb_layers": {"1": F.init_linear(ks[1], emb, c_out)},
        "out_layers": {"0": F.init_norm(c_out), "3": F.init_conv(ks[2], (3, 3), c_out, c_out, zero=True)},
    }
    if c_in != c_out:
        p["skip_connection"] = F.init_conv(ks[3], (1, 1), c_in, c_out)
    if temporal:
        tk = jax.random.split(ks[4], 4)
        p["temopral_conv"] = {
            "conv1": {"0": F.init_norm(c_out), "2": F.init_conv(tk[0], (3, 1, 1), c_out, c_out)},
            "conv2": {"0": F.init_norm(c_out), "3": F.init_conv(tk[1], (3, 1, 1), c_out, c_out)},
            "conv3": {"0": F.init_norm(c_out), "3": F.init_conv(tk[2], (3, 1, 1), c_out, c_out)},
            "conv4": {"0": F.init_norm(c_out), "3": F.init_conv(tk[3], (3, 1, 1), c_out, c_out, zero=True)},
        }
    return p


def _init_layer(rng, ltype, args, cfg: UNetConfig):
    if ltype == "conv_in":
        return F.init_conv(rng, (3, 3), args["c_in"], args["c_out"])
    if ltype == "res":
        return _init_res(rng, args["c_in"], args["c_out"], args["emb"],
                         args["temporal"], cfg.dropout)
    if ltype == "spatial":
        return A.init_spatial_transformer(
            rng, args["ch"], heads=args["heads"], dim_head=cfg.num_head_channels,
            depth=cfg.transformer_depth, context_dim=cfg.context_dim,
            use_linear=cfg.use_linear, image_cross=cfg.image_cross_attention,
            alpha_learnable=cfg.image_cross_attention_scale_learnable,
            domain_cross=args.get("domain", False),
        )
    if ltype == "temporal":
        return A.init_temporal_transformer(
            rng, args["ch"], heads=args["heads"], dim_head=cfg.num_head_channels,
            depth=cfg.transformer_depth, use_linear=cfg.use_linear,
            relative_position=cfg.use_relative_position,
            temporal_length=cfg.temporal_length,
            context_dim=(None if cfg.temporal_selfatt_only
                         else cfg.context_dim),
        )
    if ltype == "down":
        return {"op": F.init_conv(rng, (3, 3), args["ch"], args["ch"])}
    if ltype == "up":
        return {"conv": F.init_conv(rng, (3, 3), args["ch"], args["ch"])}
    raise ValueError(ltype)


def init_unet(rng, cfg: UNetConfig):
    mc = cfg.model_channels
    tdim = 4 * mc
    inp_plan, mid_plan, out_plan = block_plan(cfg)
    n = len(inp_plan) + len(out_plan) + len(mid_plan) + 8
    keys = iter(jax.random.split(rng, 4 * n))

    params = {
        "time_embed": {
            "0": F.init_linear(next(keys), mc, tdim),
            "2": F.init_linear(next(keys), tdim, tdim),
        },
        "out": {
            "0": F.init_norm(mc),
            "2": F.init_conv(next(keys), (3, 3), mc, cfg.out_channels, zero=True),
        },
    }
    if cfg.class_label_condition:
        params["class_embed"] = {
            "0": F.init_linear(next(keys), mc, tdim),
            "2": F.init_linear(next(keys), tdim, tdim),
        }
    if cfg.fs_condition:
        # zero-init last layer (openaimodel3d.py:396-397)
        params["fps_embedding"] = {
            "0": F.init_linear(next(keys), mc, tdim),
            "2": F.init_linear(next(keys), tdim, tdim, zero=True),
        }
    if cfg.addition_attention:
        # fixed 8 heads x num_head_channels (openaimodel3d.py:404-414), conv proj
        params["init_attn"] = {
            "0": A.init_temporal_transformer(
                next(keys), mc, heads=8, dim_head=cfg.num_head_channels,
                depth=cfg.transformer_depth, use_linear=False,
                relative_position=cfg.use_relative_position,
                temporal_length=cfg.temporal_length,
                context_dim=(None if cfg.temporal_selfatt_only
                             else cfg.context_dim),
            )
        }

    def init_blocks(plans):
        out = {}
        for i, plan in enumerate(plans):
            out[str(i)] = {
                str(j): _init_layer(next(keys), ltype, args, cfg)
                for j, (ltype, args) in enumerate(plan)
            }
        return out

    params["input_blocks"] = init_blocks(inp_plan)
    params["middle_block"] = {
        str(j): _init_layer(next(keys), ltype, args, cfg)
        for j, (ltype, args) in enumerate(mid_plan)
    }
    params["output_blocks"] = init_blocks(out_plan)
    return params


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
