"""Stable-Diffusion-2-family 2D conditional UNet (diffusers layout) in JAX.

This is the denoiser family behind the reference's depth-densification stage
(`/root/reference/data_process/depthlab_tools.py:452-476`): DepthLab loads a
Marigold (SD2-based) `UNet2DConditionModel` twice — a `reference_unet`
(in_channels=4) that encodes the RGB latent and a `denoising_unet`
(in_channels=12) that inpaints the depth latent while *reading* the reference
UNet's self-attention hidden states (ReferenceNet / mutual-self-attention, the
AnimateAnyone mechanism DepthLab builds on).

Param pytrees mirror the diffusers `UNet2DConditionModel` state_dict naming
(`down_blocks.0.resnets.0.conv1.weight`, `...attentions.0.transformer_blocks.
0.attn1.to_q.weight`, ...), so published Marigold / DepthLab / SD2 UNet
weights import through `train/checkpoint.state_dict_to_pytree` unchanged.
The attention/feed-forward leaf naming is identical to `nn/attention.py`
(diffusers and lvdm both descend from the CompVis code), so the fused-GEGLU
and flash-attention TPU paths are shared.

Reference-attention protocol (write/read):
  * ``apply(..., ref_mode="write")`` returns ``(out, bank)`` where ``bank`` is
    the list of post-norm1 hidden states of every BasicTransformerBlock in
    traversal order (down -> mid -> up).
  * ``apply(..., ref_mode="read", ref_bank=bank)`` concatenates the matching
    bank entry into the self-attention K/V of each block
    (``attn1(q=x, kv=cat([x, ref], seq))``).
  Both UNets share one architecture, so traversal order gives the same
  channel-wise pairing that the torch implementation produces by sorting
  BasicTransformerBlocks per channel width.

Activations are channels-last (B, H, W, C); bf16-friendly with fp32 norm
islands, like the rest of the framework.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.schedules import timestep_embedding
from ..nn import functional as F
from ..nn.attention import attend, feed_forward_block, init_cross_attention, init_feed_forward


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    """Shape config of a diffusers UNet2DConditionModel (SD2 defaults).

    DepthLab instances (depthlab_tools.py:452-460): denoising_unet
    ``in_channels=12``; reference_unet ``in_channels=4``; Marigold depth
    (the base checkpoint) uses ``in_channels=8``.
    """

    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    head_dim: int = 64
    norm_num_groups: int = 32
    transformer_depth: int = 1

    @property
    def num_levels(self) -> int:
        return len(self.block_out_channels)

    def heads(self, ch: int) -> int:
        return max(1, ch // self.head_dim)

    def level_has_attn_down(self, i: int) -> bool:
        # CrossAttnDownBlock2D for all but the last level (DownBlock2D).
        return i < self.num_levels - 1

    def level_has_attn_up(self, i: int) -> bool:
        # up_blocks[0] is UpBlock2D (mirror of the last down block).
        return i > 0


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _resnet(p, x, temb, *, groups: int):
    """diffusers ResnetBlock2D: GN/SiLU/conv x2 with a time-embedding shift
    and optional 1x1 `conv_shortcut`."""
    h = F.conv2d(p["conv1"], F.silu(F.group_norm(p["norm1"], x, num_groups=groups)))
    emb = F.linear(p["time_emb_proj"], F.silu(temb)).astype(h.dtype)
    h = h + emb[:, None, None, :]
    h = F.conv2d(p["conv2"], F.silu(F.group_norm(p["norm2"], h, num_groups=groups)))
    if "conv_shortcut" in p:
        x = F.conv2d(p["conv_shortcut"], x)
    return x + h


def _basic_block(p, x, context, *, heads, ref_mode, bank):
    """diffusers BasicTransformerBlock with reference-attention hooks.

    self-attn -> cross-attn -> GEGLU FF, pre-LN residuals. In "write" mode the
    post-norm1 hidden state is appended to `bank`; in "read" mode the next
    bank entry is concatenated into the self-attention K/V sequence.
    """
    xn = F.layer_norm(p["norm1"], x)
    if ref_mode == "write":
        bank.append(xn)
        kv = xn
    elif ref_mode == "read":
        ref = bank.pop(0)
        kv = jnp.concatenate([xn, ref.astype(xn.dtype)], axis=1)
    else:
        kv = xn
    h_dim = p["attn1"]["to_q"]["weight"].shape[1] // heads
    q = F.linear(p["attn1"]["to_q"], xn).reshape(xn.shape[0], xn.shape[1], heads, h_dim)
    k = F.linear(p["attn1"]["to_k"], kv).reshape(kv.shape[0], kv.shape[1], heads, h_dim)
    v = F.linear(p["attn1"]["to_v"], kv).reshape(kv.shape[0], kv.shape[1], heads, h_dim)
    out = attend(q, k, v)
    x = F.linear(p["attn1"]["to_out"]["0"], out.reshape(xn.shape[0], xn.shape[1], -1)) + x

    xn = F.layer_norm(p["norm2"], x)
    ctx = xn if context is None else context.astype(xn.dtype)
    q = F.linear(p["attn2"]["to_q"], xn).reshape(xn.shape[0], xn.shape[1], heads, h_dim)
    k = F.linear(p["attn2"]["to_k"], ctx).reshape(ctx.shape[0], ctx.shape[1], heads, h_dim)
    v = F.linear(p["attn2"]["to_v"], ctx).reshape(ctx.shape[0], ctx.shape[1], heads, h_dim)
    out = attend(q, k, v)
    x = F.linear(p["attn2"]["to_out"]["0"], out.reshape(xn.shape[0], xn.shape[1], -1)) + x

    x = feed_forward_block(p["ff"], p["norm3"], x)
    return x


def _transformer2d(p, x, context, *, cfg: SDUNetConfig, ref_mode, bank):
    """diffusers Transformer2DModel with use_linear_projection=True (SD2)."""
    n, h, w, c = x.shape
    heads = cfg.heads(c)
    x_in = x
    x = F.group_norm(p["norm"], x, num_groups=cfg.norm_num_groups, eps=1e-6)
    x = x.reshape(n, h * w, c)
    x = F.linear(p["proj_in"], x)
    for d in range(cfg.transformer_depth):
        x = _basic_block(
            p["transformer_blocks"][str(d)], x, context,
            heads=heads, ref_mode=ref_mode, bank=bank,
        )
    x = F.linear(p["proj_out"], x)
    return x.reshape(n, h, w, c) + x_in


# ---------------------------------------------------------------------------
# Full UNet forward
# ---------------------------------------------------------------------------

def apply(
    params,
    cfg: SDUNetConfig,
    x,
    t,
    context,
    *,
    ref_mode: str | None = None,
    ref_bank: list | None = None,
):
    """UNet2DConditionModel.forward.

    x: (B, H, W, in_channels) channels-last; t: (B,) int timesteps; context:
    (B, L, cross_attention_dim) encoder hidden states. Returns the predicted
    noise/v (B, H, W, out_channels); with ``ref_mode="write"`` returns
    ``(out, bank)``.
    """
    ch0 = cfg.block_out_channels[0]
    bank: list = [] if ref_mode == "write" else (list(ref_bank) if ref_mode == "read" else [])

    temb = timestep_embedding(t, ch0).astype(x.dtype)
    temb = F.linear(params["time_embedding"]["linear_1"], temb)
    temb = F.linear(params["time_embedding"]["linear_2"], F.silu(temb))

    h = F.conv2d(params["conv_in"], x)
    skips = [h]
    for i in range(cfg.num_levels):
        block = params["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = _resnet(block["resnets"][str(j)], h, temb, groups=cfg.norm_num_groups)
            if cfg.level_has_attn_down(i):
                h = _transformer2d(
                    block["attentions"][str(j)], h, context,
                    cfg=cfg, ref_mode=ref_mode, bank=bank,
                )
            skips.append(h)
        if i < cfg.num_levels - 1:
            h = F.conv2d(block["downsamplers"]["0"]["conv"], h, stride=2,
                         padding=((1, 1), (1, 1)))
            skips.append(h)

    mid = params["mid_block"]
    h = _resnet(mid["resnets"]["0"], h, temb, groups=cfg.norm_num_groups)
    h = _transformer2d(mid["attentions"]["0"], h, context,
                       cfg=cfg, ref_mode=ref_mode, bank=bank)
    h = _resnet(mid["resnets"]["1"], h, temb, groups=cfg.norm_num_groups)

    for i in range(cfg.num_levels):
        block = params["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            h = _resnet(block["resnets"][str(j)],
                        jnp.concatenate([h, skip], axis=-1), temb,
                        groups=cfg.norm_num_groups)
            if cfg.level_has_attn_up(i):
                h = _transformer2d(
                    block["attentions"][str(j)], h, context,
                    cfg=cfg, ref_mode=ref_mode, bank=bank,
                )
        if i < cfg.num_levels - 1:
            h = F.upsample_nearest_2x(h)
            h = F.conv2d(block["upsamplers"]["0"]["conv"], h)

    h = F.silu(F.group_norm(params["conv_norm_out"], h, num_groups=cfg.norm_num_groups))
    out = F.conv2d(params["conv_out"], h)
    if ref_mode == "write":
        return out, bank
    return out


# ---------------------------------------------------------------------------
# Initializer (checkpoint import overwrites; used for tests/from-scratch)
# ---------------------------------------------------------------------------

def _init_resnet(rng, c_in, c_out, temb_dim):
    ks = jax.random.split(rng, 4)
    p = {
        "norm1": F.init_norm(c_in),
        "conv1": F.init_conv(ks[0], (3, 3), c_in, c_out),
        "time_emb_proj": F.init_linear(ks[1], temb_dim, c_out),
        "norm2": F.init_norm(c_out),
        "conv2": F.init_conv(ks[2], (3, 3), c_out, c_out),
    }
    if c_in != c_out:
        p["conv_shortcut"] = F.init_conv(ks[3], (1, 1), c_in, c_out)
    return p


def _init_transformer2d(rng, cfg: SDUNetConfig, ch):
    heads = cfg.heads(ch)
    ks = jax.random.split(rng, cfg.transformer_depth + 2)
    blocks = {}
    for d in range(cfg.transformer_depth):
        b1, b2, b3 = jax.random.split(ks[d], 3)
        blocks[str(d)] = {
            "norm1": F.init_norm(ch),
            "attn1": init_cross_attention(b1, ch, heads=heads, dim_head=ch // heads),
            "norm2": F.init_norm(ch),
            "attn2": init_cross_attention(
                b2, ch, context_dim=cfg.cross_attention_dim,
                heads=heads, dim_head=ch // heads,
            ),
            "norm3": F.init_norm(ch),
            "ff": init_feed_forward(b3, ch),
        }
    return {
        "norm": F.init_norm(ch),
        "proj_in": F.init_linear(ks[-2], ch, ch),
        "transformer_blocks": blocks,
        "proj_out": F.init_linear(ks[-1], ch, ch),
    }


def init(rng, cfg: SDUNetConfig):
    """Random init of the full pytree with diffusers naming."""
    temb_dim = cfg.block_out_channels[0] * 4
    keys = iter(jax.random.split(rng, 256))
    p: dict = {
        "conv_in": F.init_conv(next(keys), (3, 3), cfg.in_channels,
                               cfg.block_out_channels[0]),
        "time_embedding": {
            "linear_1": F.init_linear(next(keys), cfg.block_out_channels[0], temb_dim),
            "linear_2": F.init_linear(next(keys), temb_dim, temb_dim),
        },
        "down_blocks": {},
        "mid_block": {},
        "up_blocks": {},
        "conv_norm_out": F.init_norm(cfg.block_out_channels[0]),
        "conv_out": F.init_conv(next(keys), (3, 3), cfg.block_out_channels[0],
                                cfg.out_channels),
    }
    ch = cfg.block_out_channels[0]
    for i, c_out in enumerate(cfg.block_out_channels):
        blk: dict = {"resnets": {}}
        if cfg.level_has_attn_down(i):
            blk["attentions"] = {}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = _init_resnet(next(keys), ch if j == 0 else c_out,
                                                  c_out, temb_dim)
            if cfg.level_has_attn_down(i):
                blk["attentions"][str(j)] = _init_transformer2d(next(keys), cfg, c_out)
        if i < cfg.num_levels - 1:
            blk["downsamplers"] = {"0": {"conv": F.init_conv(next(keys), (3, 3),
                                                             c_out, c_out)}}
        p["down_blocks"][str(i)] = blk
        ch = c_out

    c_mid = cfg.block_out_channels[-1]
    p["mid_block"] = {
        "resnets": {
            "0": _init_resnet(next(keys), c_mid, c_mid, temb_dim),
            "1": _init_resnet(next(keys), c_mid, c_mid, temb_dim),
        },
        "attentions": {"0": _init_transformer2d(next(keys), cfg, c_mid)},
    }

    rev = list(reversed(cfg.block_out_channels))
    for i, c_out in enumerate(rev):
        c_skip_base = rev[min(i + 1, cfg.num_levels - 1)]
        blk = {"resnets": {}}
        if cfg.level_has_attn_up(i):
            blk["attentions"] = {}
        prev = rev[max(i - 1, 0)] if i > 0 else c_mid
        for j in range(cfg.layers_per_block + 1):
            # skip channels: the down path pushed layers_per_block states at
            # c_out plus one at the next-coarser level's width
            c_skip = c_out if j < cfg.layers_per_block else c_skip_base
            c_in = (prev if j == 0 else c_out) + c_skip
            blk["resnets"][str(j)] = _init_resnet(next(keys), c_in, c_out, temb_dim)
            if cfg.level_has_attn_up(i):
                blk["attentions"][str(j)] = _init_transformer2d(next(keys), cfg, c_out)
        if i < cfg.num_levels - 1:
            blk["upsamplers"] = {"0": {"conv": F.init_conv(next(keys), (3, 3),
                                                           c_out, c_out)}}
        p["up_blocks"][str(i)] = blk
    return p
