"""OpenCLIP ViT-H-14 text and vision towers (frozen conditioning encoders).

Functional rebuild of `lvdm/modules/encoders/condition.py`:
  * FrozenOpenCLIPEmbedder (:174-234): text transformer, causal mask, stop at
    the *penultimate* block (layer_idx=1), then ln_final -> (B, 77, 1024),
  * FrozenOpenCLIPImageEmbedderV2 (:295-372): ViT-H visual tower returning the
    full token sequence after the transformer — no ln_post, no projection —
    (B, 257, 1280); preprocess = bicubic 224 resize of [-1,1] input + CLIP
    mean/std normalization (:322-330).

Param pytrees mirror the open_clip state_dict (token_embedding,
positional_embedding, transformer.resblocks.N.{ln_1,attn,ln_2,mlp}, ...), so
the published checkpoints (which embed both towers) import mechanically. The
fused in_proj of torch.nn.MultiheadAttention stays fused (one (W, 3W) matmul,
better for the MXU) and is split per-head at apply time.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn import functional as F
from ..nn.attention import attend

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class TextConfig:
    """open_clip ViT-H-14 text tower."""
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    skip_last_layers: int = 1  # 'penultimate' (condition.py:199-200)


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """open_clip ViT-H-14 visual tower."""
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    heads: int = 16
    layers: int = 32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def tokens(self) -> int:
        return self.grid * self.grid + 1


def _mha(p, x, heads, *, causal=False):
    """torch.nn.MultiheadAttention with fused in_proj; x: (B, L, W)."""
    b, l, w = x.shape
    qkv = x @ p["in_proj_weight"].astype(x.dtype) + p["in_proj_bias"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda z: z.reshape(b, l, heads, w // heads)
    out = attend(split(q), split(k), split(v), causal=causal, impl="xla")
    return F.linear(p["out_proj"], out.reshape(b, l, w))


def _resblock(p, x, heads, *, causal=False):
    """open_clip ResidualAttentionBlock: pre-LN attn + MLP (c_fc/gelu/c_proj)."""
    x = x + _mha(p["attn"], F.layer_norm(p["ln_1"], x), heads, causal=causal)
    h = F.linear(p["mlp"]["c_fc"], F.layer_norm(p["ln_2"], x))
    x = x + F.linear(p["mlp"]["c_proj"], F.gelu(h))
    return x


def text_tower_apply(params, cfg: TextConfig, tokens):
    """encode_with_transformer (condition.py:214-231): embeds tokens, runs
    layers-skip_last_layers causal blocks, ln_final. tokens: (B, 77) int32."""
    x = params["token_embedding"]["weight"][tokens]
    x = x + params["positional_embedding"].astype(x.dtype)
    n_blocks = cfg.layers - cfg.skip_last_layers
    for i in range(n_blocks):
        x = _resblock(params["transformer"]["resblocks"][str(i)], x, cfg.heads,
                      causal=True)
    return F.layer_norm(params["ln_final"], x)


def preprocess_image(x):
    """condition.py:322-330: [-1,1] (B,H,W,3) -> bicubic 224 resize,
    CLIP-normalized."""
    b = x.shape[0]
    x = jax.image.resize(x, (b, 224, 224, 3), method="bicubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


def vision_tower_apply(params, cfg: VisionConfig, images, *, preprocess=True):
    """encode_with_vision_transformer (condition.py:342-372): patchify, class
    token + pos embed, ln_pre, transformer; returns the FULL token sequence
    (B, 257, 1280) — no ln_post / projection."""
    if preprocess:
        images = preprocess_image(images)
    b = images.shape[0]
    x = F.conv2d(params["conv1"], images, stride=cfg.patch_size, padding="VALID")
    x = x.reshape(b, cfg.grid * cfg.grid, cfg.width)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(x.dtype)
    x = F.layer_norm(params["ln_pre"], x)
    for i in range(cfg.layers):
        x = _resblock(params["transformer"]["resblocks"][str(i)], x, cfg.heads)
    return x


# ---------------------------------------------------------------------------
# Init (for tests / training without the published checkpoint)
# ---------------------------------------------------------------------------

def _init_resblock(rng, width):
    ks = jax.random.split(rng, 4)
    return {
        "ln_1": F.init_norm(width),
        "attn": {
            "in_proj_weight": F.init_linear(ks[0], width, 3 * width, bias=False)["weight"],
            "in_proj_bias": jnp.zeros((3 * width,)),
            "out_proj": F.init_linear(ks[1], width, width),
        },
        "ln_2": F.init_norm(width),
        "mlp": {
            "c_fc": F.init_linear(ks[2], width, 4 * width),
            "c_proj": F.init_linear(ks[3], 4 * width, width),
        },
    }


def init_text_tower(rng, cfg: TextConfig):
    ks = jax.random.split(rng, cfg.layers + 2)
    return {
        "token_embedding": {
            "weight": jax.random.normal(ks[0], (cfg.vocab_size, cfg.width)) * 0.02
        },
        "positional_embedding": jax.random.normal(ks[1], (cfg.context_length, cfg.width)) * 0.01,
        "transformer": {
            "resblocks": {
                str(i): _init_resblock(ks[2 + i], cfg.width) for i in range(cfg.layers)
            }
        },
        "ln_final": F.init_norm(cfg.width),
    }


def init_vision_tower(rng, cfg: VisionConfig):
    ks = jax.random.split(rng, cfg.layers + 3)
    return {
        "conv1": {"weight": F.init_conv(ks[0], (cfg.patch_size, cfg.patch_size), 3, cfg.width, bias=False)["weight"]},
        "class_embedding": jax.random.normal(ks[1], (cfg.width,)) * 0.02,
        "positional_embedding": jax.random.normal(ks[2], (cfg.tokens, cfg.width)) * 0.01,
        "ln_pre": F.init_norm(cfg.width),
        "transformer": {
            "resblocks": {
                str(i): _init_resblock(ks[3 + i], cfg.width) for i in range(cfg.layers)
            }
        },
    }
