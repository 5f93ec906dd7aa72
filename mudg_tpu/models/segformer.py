"""SegFormer (MiT encoder + all-MLP decode head) in JAX — semantic stage model.

The reference pipeline runs SegFormer-B3 (cityscapes, 19 classes) over every
camera frame (`data_process/pipeline_segment.py:19-122`). This is a
TPU-native functional implementation whose param pytree mirrors the
HuggingFace `SegformerForSemanticSegmentation` state_dict (the standard
distribution of the cityscapes checkpoints), so weights import through
`train/checkpoint.py:state_dict_to_pytree` with zero name mapping.

Inference-only semantics: dropout/drop-path are identity, batch norm uses
running statistics. Activations channels-last; attention uses the shared
`nn.attention.attend` primitive (fp32 softmax).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..nn import functional as F
from ..nn.attention import attend


@dataclasses.dataclass(frozen=True)
class SegFormerConfig:
    """Defaults = SegFormer-B3 cityscapes (nvidia/segformer-b3-finetuned-
    cityscapes-1024-1024)."""
    hidden_sizes: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 4, 18, 3)
    num_attention_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    mlp_ratio: int = 4
    decoder_hidden_size: int = 768
    num_labels: int = 19
    layer_norm_eps: float = 1e-6

    @classmethod
    def b0(cls, **kw):
        return cls(hidden_sizes=(32, 64, 160, 256), depths=(2, 2, 2, 2),
                   decoder_hidden_size=256, **kw)


def _resize_bilinear(x, hw):
    """torch F.interpolate(..., mode='bilinear', align_corners=False)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, *hw, c), method="bilinear")


def _efficient_attention(p, x, hw, *, heads, sr_ratio, eps):
    """SegformerEfficientSelfAttention + output dense. x: (B, L, C)."""
    b, l, c = x.shape
    q = F.linear(p["attention"]["self"]["query"], x)
    kv_in = x
    if sr_ratio > 1:
        s = x.reshape(b, *hw, c)
        s = F.conv2d(p["attention"]["self"]["sr"], s, stride=sr_ratio,
                     padding="VALID")
        s = s.reshape(b, -1, c)
        kv_in = F.layer_norm(p["attention"]["self"]["layer_norm"], s, eps=eps)
    k = F.linear(p["attention"]["self"]["key"], kv_in)
    v = F.linear(p["attention"]["self"]["value"], kv_in)

    def split(z):
        return z.reshape(b, z.shape[1], heads, c // heads)

    out = attend(split(q), split(k), split(v), impl="xla")
    out = out.reshape(b, l, c)
    return F.linear(p["attention"]["output"]["dense"], out)


def _mix_ffn(p, x, hw):
    """dense1 -> 3x3 depthwise conv -> GELU -> dense2 (SegformerMixFFN)."""
    b, l, c = x.shape
    h = F.linear(p["dense1"], x)
    hidden = h.shape[-1]
    h = h.reshape(b, *hw, hidden)
    h = F.conv2d(p["dwconv"]["dwconv"], h, groups=hidden)
    h = F.gelu(h.reshape(b, l, hidden))
    return F.linear(p["dense2"], h)


def encoder_apply(p, cfg: SegFormerConfig, x):
    """x: (B, H, W, 3) -> list of 4 stage features (B, Hi, Wi, Ci)."""
    eps = cfg.layer_norm_eps
    feats = []
    h = x
    for i in range(len(cfg.hidden_sizes)):
        pe = p["patch_embeddings"][str(i)]
        pad = cfg.patch_sizes[i] // 2
        h = F.conv2d(pe["proj"], h, stride=cfg.strides[i],
                     padding=((pad, pad), (pad, pad)))
        b, hh, ww, c = h.shape
        h = h.reshape(b, hh * ww, c)
        h = F.layer_norm(pe["layer_norm"], h, eps=eps)
        for j in range(cfg.depths[i]):
            blk = p["block"][str(i)][str(j)]
            h = h + _efficient_attention(
                blk, F.layer_norm(blk["layer_norm_1"], h, eps=eps), (hh, ww),
                heads=cfg.num_attention_heads[i], sr_ratio=cfg.sr_ratios[i],
                eps=eps)
            h = h + _mix_ffn(
                blk["mlp"], F.layer_norm(blk["layer_norm_2"], h, eps=eps),
                (hh, ww))
        h = F.layer_norm(p["layer_norm"][str(i)], h, eps=eps)
        h = h.reshape(b, hh, ww, c)
        feats.append(h)
    return feats


def decode_head_apply(p, cfg: SegFormerConfig, feats):
    """All-MLP head (SegformerDecodeHead): per-stage linear -> upsample to
    1/4 -> concat reversed -> 1x1 fuse + BN + ReLU -> classifier."""
    target_hw = feats[0].shape[1:3]
    ups = []
    for i, f in enumerate(feats):
        b, hh, ww, c = f.shape
        z = F.linear(p["linear_c"][str(i)]["proj"], f.reshape(b, hh * ww, c))
        z = z.reshape(b, hh, ww, -1)
        if (hh, ww) != target_hw:
            z = _resize_bilinear(z, target_hw)
        ups.append(z)
    h = jnp.concatenate(ups[::-1], axis=-1)
    h = F.conv2d({"weight": p["linear_fuse"]["weight"]}, h)
    h = jax.nn.relu(F.batch_norm(p["batch_norm"], h))
    return F.conv2d(p["classifier"], h)  # (B, H/4, W/4, num_labels)


def segformer_apply(params, cfg: SegFormerConfig, x):
    """Full model: (B, H, W, 3) normalized image -> (B, H/4, W/4, classes)."""
    feats = encoder_apply(params["encoder"], cfg, x)
    return decode_head_apply(params["decode_head"], cfg, feats)


def segment(params, cfg: SegFormerConfig, image_01, *, batch=None):
    """image_01: (H, W, 3) float [0,1] -> (H, W) int32 class ids.

    Applies the standard imagenet normalization and upsamples logits back to
    the input size (pipeline_segment.py semantics via mmseg/HF processors).
    """
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (image_01 - mean) / std
    logits = segformer_apply(params, cfg, x[None].astype(jnp.float32))
    logits = _resize_bilinear(logits, image_01.shape[:2])
    return jnp.argmax(logits[0], axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# weight import / init
# ---------------------------------------------------------------------------

def import_hf_state_dict(sd) -> dict:
    """HF SegformerForSemanticSegmentation state_dict -> param pytree
    {'encoder': ..., 'decode_head': ...} via the shared layout transform."""
    from ..train.checkpoint import state_dict_to_pytree

    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    tree = state_dict_to_pytree(sd, skip_buffers=False)
    enc = tree["segformer"]["encoder"] if "segformer" in tree else tree["encoder"]
    return {"encoder": enc, "decode_head": tree["decode_head"]}


def init_segformer(rng, cfg: SegFormerConfig):
    """Random init with the exact pytree structure of the HF checkpoint."""
    keys = iter(jax.random.split(rng, 4096))

    def lin(i, o, bias=True):
        return F.init_linear(next(keys), i, o, bias=bias)

    def conv(k, i, o, bias=True):
        return F.init_conv(next(keys), (k, k), i, o, bias=bias)

    enc: dict = {"patch_embeddings": {}, "block": {}, "layer_norm": {}}
    in_ch = 3
    for i, c in enumerate(cfg.hidden_sizes):
        enc["patch_embeddings"][str(i)] = {
            "proj": conv(cfg.patch_sizes[i], in_ch, c),
            "layer_norm": F.init_norm(c),
        }
        in_ch = c
        blocks = {}
        for j in range(cfg.depths[i]):
            att_self = {
                "query": lin(c, c), "key": lin(c, c), "value": lin(c, c),
            }
            if cfg.sr_ratios[i] > 1:
                att_self["sr"] = conv(cfg.sr_ratios[i], c, c)
                att_self["layer_norm"] = F.init_norm(c)
            hidden = cfg.mlp_ratio * c
            blocks[str(j)] = {
                "layer_norm_1": F.init_norm(c),
                "attention": {"self": att_self,
                              "output": {"dense": lin(c, c)}},
                "layer_norm_2": F.init_norm(c),
                "mlp": {
                    "dense1": lin(c, hidden),
                    "dwconv": {"dwconv": {
                        "weight": jax.random.normal(
                            next(keys), (3, 3, 1, hidden)) * 0.02,
                        "bias": jnp.zeros((hidden,)),
                    }},
                    "dense2": lin(hidden, c),
                },
            }
        enc["block"][str(i)] = blocks
        enc["layer_norm"][str(i)] = F.init_norm(c)

    d = cfg.decoder_hidden_size
    head = {
        "linear_c": {str(i): {"proj": lin(c, d)}
                     for i, c in enumerate(cfg.hidden_sizes)},
        "linear_fuse": {"weight": jax.random.normal(
            next(keys), (1, 1, 4 * d, d)) * 0.02},
        "batch_norm": {
            "weight": jnp.ones((d,)), "bias": jnp.zeros((d,)),
            "running_mean": jnp.zeros((d,)), "running_var": jnp.ones((d,)),
        },
        "classifier": conv(1, d, cfg.num_labels),
    }
    return {"encoder": enc, "decode_head": head}
