"""Perceiver-style image-context Resampler (IP-Adapter lineage).

Functional rebuild of `lvdm/modules/encoders/resampler.py:48-145`: learned
latent queries (num_queries per frame x video_length -> e.g. 16*16=256 tokens)
cross-attend to CLIP image tokens through `depth` [PerceiverAttention, FF]
blocks, then project 1280 -> 1024 for the UNet's image cross-attention.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from . import functional as F


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    """configs/stage1.../config.yaml:101-111."""
    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 1024
    ff_mult: int = 4
    video_length: int | None = 16

    @property
    def total_queries(self) -> int:
        return self.num_queries * (self.video_length or 1)


def perceiver_attention(p, x, latents, *, heads, dim_head):
    """PerceiverAttention (resampler.py:48-93): queries=latents, keys/values
    over concat(x, latents); double-sqrt scaling, fp32 softmax."""
    x = F.layer_norm(p["norm1"], x)
    latents = F.layer_norm(p["norm2"], latents)
    b, l, _ = latents.shape

    q = F.linear(p["to_q"], latents)
    kv_in = jnp.concatenate([x, latents], axis=-2)
    k, v = jnp.split(F.linear(p["to_kv"], kv_in), 2, axis=-1)

    def heads_split(z):
        return z.reshape(b, z.shape[1], heads, dim_head)

    q, k, v = map(heads_split, (q, k, v))
    scale = 1.0 / math.sqrt(math.sqrt(dim_head))
    w = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale,
                   preferred_element_type=jnp.float32)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, l, heads * dim_head)
    return F.linear(p["to_out"], out)


def _ff(p, x):
    """FeedForward (resampler.py:27-34): LN -> Linear -> GELU -> Linear, no bias."""
    h = F.layer_norm(p["0"], x)
    h = F.gelu(F.linear(p["1"], h))
    return F.linear(p["3"], h)


def resampler_apply(params, cfg: ResamplerConfig, x):
    """Resampler.forward (resampler.py:134-144). x: (B, L_img, embedding_dim)
    -> (B, total_queries, output_dim)."""
    lat = jnp.broadcast_to(
        params["latents"].astype(x.dtype),
        (x.shape[0], *params["latents"].shape[1:]),
    )
    x = F.linear(params["proj_in"], x)
    for i in range(cfg.depth):
        layer = params["layers"][str(i)]
        lat = perceiver_attention(layer["0"], x, lat, heads=cfg.heads,
                                  dim_head=cfg.dim_head) + lat
        lat = _ff(layer["1"], lat) + lat
    lat = F.linear(params["proj_out"], lat)
    return F.layer_norm(params["norm_out"], lat)


def init_resampler(rng, cfg: ResamplerConfig):
    inner = cfg.dim_head * cfg.heads
    keys = iter(jax.random.split(rng, 4 + 6 * cfg.depth))
    p = {
        "latents": jax.random.normal(next(keys), (1, cfg.total_queries, cfg.dim))
        / cfg.dim**0.5,
        "proj_in": F.init_linear(next(keys), cfg.embedding_dim, cfg.dim),
        "proj_out": F.init_linear(next(keys), cfg.dim, cfg.output_dim),
        "norm_out": F.init_norm(cfg.output_dim),
        "layers": {},
    }
    for i in range(cfg.depth):
        p["layers"][str(i)] = {
            "0": {
                "norm1": F.init_norm(cfg.dim),
                "norm2": F.init_norm(cfg.dim),
                "to_q": F.init_linear(next(keys), cfg.dim, inner, bias=False),
                "to_kv": F.init_linear(next(keys), cfg.dim, inner * 2, bias=False),
                "to_out": F.init_linear(next(keys), inner, cfg.dim, bias=False),
            },
            "1": {
                "0": F.init_norm(cfg.dim),
                "1": F.init_linear(next(keys), cfg.dim, cfg.dim * cfg.ff_mult, bias=False),
                "3": F.init_linear(next(keys), cfg.dim * cfg.ff_mult, cfg.dim, bias=False),
            },
        }
    return p
