"""SD-style KL autoencoder (f=8, z=4), the frozen first stage.

Functional rebuild of `lvdm/models/autoencoder.py` (AutoencoderKL) and
`lvdm/modules/networks/ae_modules.py` (Encoder:364-463, Decoder:466-578,
ResnetBlock:151-210, AttnBlock:26-78). Channels-last activations; param
pytrees mirror the torch state_dict under 'encoder.', 'decoder.',
'quant_conv', 'post_quant_conv'.

Video handling: the reference loops frames in python when perframe_ae=True
(lvdm/models/ddpm3d.py:629-644). Here frames are a leading batch dim folded as
(B*T, H, W, C); `encode_video`/`decode_video` optionally `lax.scan` over frame
chunks so peak activation memory stays at one chunk while XLA still pipelines.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from . import functional as F
from .attention import attend
from ..core.distributions import DiagonalGaussian


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """ddconfig of the first stage (configs/stage1.../config.yaml:71-84)."""
    ch: int = 128
    out_ch: int = 3
    in_channels: int = 3
    z_channels: int = 4
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    double_z: bool = True
    embed_dim: int = 4
    scale_factor: float = 0.18215


def _resnet_block(p, x):
    """AE ResnetBlock without temb (ae_modules.py:151-210)."""
    h = F.conv2d(p["conv1"], F.silu(F.group_norm(p["norm1"], x, eps=1e-6)))
    h = F.conv2d(p["conv2"], F.silu(F.group_norm(p["norm2"], h, eps=1e-6)))
    if "nin_shortcut" in p:
        x = F.conv2d(p["nin_shortcut"], x)
    return x + h


def _attn_block(p, x):
    """Single-head self-attention over H*W with 1x1-conv projections
    (ae_modules.py:26-78); fp32 softmax."""
    n, h, w, c = x.shape
    hn = F.group_norm(p["norm"], x, eps=1e-6)
    q = F.conv2d(p["q"], hn).reshape(n, h * w, 1, c)
    k = F.conv2d(p["k"], hn).reshape(n, h * w, 1, c)
    v = F.conv2d(p["v"], hn).reshape(n, h * w, 1, c)
    out = attend(q, k, v, impl="xla").reshape(n, h, w, c)
    return x + F.conv2d(p["proj_out"], out)


def _downsample(p, x):
    # torch pads (0,1,0,1) then VALID stride-2 conv (ae_modules.py:90-109)
    return F.conv2d(p["conv"], x, stride=2, padding=((0, 1), (0, 1)))


def _upsample(p, x):
    return F.conv2d(p["conv"], F.upsample_nearest_2x(x))


def encoder_apply(p, cfg: VAEConfig, x):
    """Encoder.forward (ae_modules.py:430-463). x: (N, H, W, 3) -> moments
    (N, H/8, W/8, 2*z)."""
    h = F.conv2d(p["conv_in"], x)
    n_res = len(cfg.ch_mult)
    for i in range(n_res):
        for j in range(cfg.num_res_blocks):
            h = _resnet_block(p["down"][str(i)]["block"][str(j)], h)
        if i != n_res - 1:
            h = _downsample(p["down"][str(i)]["downsample"], h)
    h = _resnet_block(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet_block(p["mid"]["block_2"], h)
    h = F.silu(F.group_norm(p["norm_out"], h, eps=1e-6))
    return F.conv2d(p["conv_out"], h)


def decoder_apply(p, cfg: VAEConfig, z):
    """Decoder.forward (ae_modules.py:539-578). z: (N, h, w, z) -> (N, 8h, 8w, 3)."""
    h = F.conv2d(p["conv_in"], z)
    h = _resnet_block(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet_block(p["mid"]["block_2"], h)
    for i in reversed(range(len(cfg.ch_mult))):
        for j in range(cfg.num_res_blocks + 1):
            h = _resnet_block(p["up"][str(i)]["block"][str(j)], h)
        if i != 0:
            h = _upsample(p["up"][str(i)]["upsample"], h)
    h = F.silu(F.group_norm(p["norm_out"], h, eps=1e-6))
    return F.conv2d(p["conv_out"], h)


def encode_moments(params, cfg: VAEConfig, x) -> DiagonalGaussian:
    """AutoencoderKL.encode (lvdm/models/autoencoder.py:97-102)."""
    moments = F.conv2d(params["quant_conv"], encoder_apply(params["encoder"], cfg, x))
    return DiagonalGaussian.from_moments(moments)


def encode(params, cfg: VAEConfig, x, rng=None):
    """Encode to scaled latents: sample posterior if rng given, else its mode,
    times scale_factor (ddpm3d.py:611-618)."""
    post = encode_moments(params, cfg, x)
    z = post.sample(rng) if rng is not None else post.mode()
    return cfg.scale_factor * z


def decode(params, cfg: VAEConfig, z):
    """AutoencoderKL.decode with 1/scale_factor pre-scale (ddpm3d.py:654-656)."""
    z = z / cfg.scale_factor
    return decoder_apply(params["decoder"], cfg, F.conv2d(params["post_quant_conv"], z))


def _chunked(fn, x, chunk: int):
    """Apply fn over the leading dim in `chunk`-sized pieces via lax.scan
    (replaces the python per-frame loop of perframe_ae, ddpm3d.py:633-639)."""
    n = x.shape[0]
    if chunk <= 0 or n <= chunk:
        return fn(x)
    assert n % chunk == 0, f"leading dim {n} not divisible by chunk {chunk}"
    xs = x.reshape(n // chunk, chunk, *x.shape[1:])
    _, ys = jax.lax.scan(lambda c, xc: (c, fn(xc)), None, xs)
    return ys.reshape(n, *ys.shape[2:])


def encode_moments_video(params, cfg: VAEConfig, x, chunk: int = 1):
    """x: (B, T, H, W, 3) -> (B, T, H/8, W/8, 2z) raw posterior moments
    (mean ++ logvar, including quant_conv) — the cacheable half of encoding
    for precomputed-latent training (data/latents.py). sample_scaled is the
    train-time half; encode_video == sample_scaled(encode_moments_video)."""
    b, t = x.shape[:2]
    flat = x.reshape(b * t, *x.shape[2:])
    m = _chunked(
        lambda xc: F.conv2d(params["quant_conv"], encoder_apply(params["encoder"], cfg, xc)),
        flat, chunk)
    return m.reshape(b, t, *m.shape[1:])


def sample_scaled(cfg: VAEConfig, moments, rng=None):
    """moments (..., 2z) -> scaled latent (..., z): posterior sample (or mode
    when rng is None) times scale_factor — identical distribution to
    encode()'s output given the same moments (ddpm3d.py:611-618)."""
    post = DiagonalGaussian.from_moments(moments)
    z = post.sample(rng) if rng is not None else post.mode()
    return cfg.scale_factor * z


def encode_video(params, cfg: VAEConfig, x, rng=None, chunk: int = 1):
    """x: (B, T, H, W, 3) -> (B, T, H/8, W/8, z). chunk = frames per scan step."""
    b, t = x.shape[:2]
    flat = x.reshape(b * t, *x.shape[2:])
    z = _chunked(lambda xc: encode(params, cfg, xc, rng=rng), flat, chunk)
    return z.reshape(b, t, *z.shape[1:])


def decode_video(params, cfg: VAEConfig, z, chunk: int = 1):
    """z: (B, T, h, w, zc) -> (B, T, 8h, 8w, 3)."""
    b, t = z.shape[:2]
    flat = z.reshape(b * t, *z.shape[2:])
    x = _chunked(lambda zc: decode(params, cfg, zc), flat, chunk)
    return x.reshape(b, t, *x.shape[1:])


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_resnet(rng, c_in, c_out):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = {
        "norm1": F.init_norm(c_in),
        "conv1": F.init_conv(k1, (3, 3), c_in, c_out),
        "norm2": F.init_norm(c_out),
        "conv2": F.init_conv(k2, (3, 3), c_out, c_out),
    }
    if c_in != c_out:
        p["nin_shortcut"] = F.init_conv(k3, (1, 1), c_in, c_out)
    return p


def _init_attn(rng, c):
    ks = jax.random.split(rng, 4)
    return {
        "norm": F.init_norm(c),
        "q": F.init_conv(ks[0], (1, 1), c, c),
        "k": F.init_conv(ks[1], (1, 1), c, c),
        "v": F.init_conv(ks[2], (1, 1), c, c),
        "proj_out": F.init_conv(ks[3], (1, 1), c, c),
    }


def init_encoder(rng, cfg: VAEConfig):
    keys = iter(jax.random.split(rng, 64))
    ch = cfg.ch
    in_mult = (1,) + tuple(cfg.ch_mult)
    p = {"conv_in": F.init_conv(next(keys), (3, 3), cfg.in_channels, ch), "down": {}}
    block_in = ch
    for i in range(len(cfg.ch_mult)):
        block_in = ch * in_mult[i]
        block_out = ch * cfg.ch_mult[i]
        level = {"block": {}}
        for j in range(cfg.num_res_blocks):
            level["block"][str(j)] = _init_resnet(next(keys), block_in, block_out)
            block_in = block_out
        if i != len(cfg.ch_mult) - 1:
            level["downsample"] = {"conv": F.init_conv(next(keys), (3, 3), block_in, block_in)}
        p["down"][str(i)] = level
    p["mid"] = {
        "block_1": _init_resnet(next(keys), block_in, block_in),
        "attn_1": _init_attn(next(keys), block_in),
        "block_2": _init_resnet(next(keys), block_in, block_in),
    }
    p["norm_out"] = F.init_norm(block_in)
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    p["conv_out"] = F.init_conv(next(keys), (3, 3), block_in, zc)
    return p


def init_decoder(rng, cfg: VAEConfig):
    keys = iter(jax.random.split(rng, 64))
    ch = cfg.ch
    block_in = ch * cfg.ch_mult[-1]
    p = {
        "conv_in": F.init_conv(next(keys), (3, 3), cfg.z_channels, block_in),
        "mid": {},
        "up": {},
    }
    p["mid"] = {
        "block_1": _init_resnet(next(keys), block_in, block_in),
        "attn_1": _init_attn(next(keys), block_in),
        "block_2": _init_resnet(next(keys), block_in, block_in),
    }
    for i in reversed(range(len(cfg.ch_mult))):
        block_out = ch * cfg.ch_mult[i]
        level = {"block": {}}
        for j in range(cfg.num_res_blocks + 1):
            level["block"][str(j)] = _init_resnet(next(keys), block_in, block_out)
            block_in = block_out
        if i != 0:
            level["upsample"] = {"conv": F.init_conv(next(keys), (3, 3), block_in, block_in)}
        p["up"][str(i)] = level
    p["norm_out"] = F.init_norm(block_in)
    p["conv_out"] = F.init_conv(next(keys), (3, 3), block_in, cfg.out_ch)
    return p


def init_vae(rng, cfg: VAEConfig):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    return {
        "encoder": init_encoder(k1, cfg),
        "decoder": init_decoder(k2, cfg),
        "quant_conv": F.init_conv(k3, (1, 1), zc, 2 * cfg.embed_dim),
        "post_quant_conv": F.init_conv(k4, (1, 1), cfg.embed_dim, cfg.z_channels),
    }
