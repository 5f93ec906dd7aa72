"""DepthLab: diffusion depth inpainting (learned depth densification).

TPU rebuild of the model the reference drives in
`/root/reference/data_process/depthlab_tools.py:446-490`: a Marigold
(SD2-based) latent diffusion stack with TWO `UNet2DConditionModel`s —
a `reference_unet` (in_channels=4) that encodes the RGB latent once and a
`denoising_unet` (in_channels=12) that denoises the depth latent while
reading the reference UNet's self-attention states (ReferenceNet /
mutual-self-attention, the AnimateAnyone mechanism DepthLab builds on) —
plus a CLIP image encoder whose projected embedding is mapped into the
cross-attention context by a small `mapping_layer` (`My_proj`,
depthlab_tools.py:461-466).

The DepthLab submodule is not vendored in the reference
(`data_process/third_party/DepthLab` is an empty gitmodule), so the exact
wiring below follows the published DepthLab/AnimateAnyone design and is
explicitly documented where it is an assumption:
  * denoising UNet input (12ch) = [noisy depth latent (4) | masked-known
    depth latent (4) | latent-resolution known-mask broadcast to 4],
  * the reference UNet runs once at t=0; its attention bank is reused for
    every denoising step (the bank is t-independent),
  * context = mapping_layer(CLIP image_embeds) as a single token, used by
    both UNets,
  * prediction_type is configurable ("eps" default, "v" supported) since the
    scheduler config ships with the external checkpoint.

Weights: `denoising_unet.pth` / `reference_unet.pth` / `mapping_layer.pth`
(diffusers UNet2DConditionModel naming) import through
`train/checkpoint.state_dict_to_pytree`; the Marigold VAE (diffusers
AutoencoderKL naming) imports through `diffusers_vae_to_pytree` below, which
renames to the CompVis layout `nn/vae.py` uses.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import schedules as S
from ..nn import functional as F
from ..nn import vae as VAE
from ..train import checkpoint as CKPT
from . import sd_unet2d


@dataclasses.dataclass(frozen=True)
class DepthLabConfig:
    unet: sd_unet2d.SDUNetConfig = dataclasses.field(
        default_factory=lambda: sd_unet2d.SDUNetConfig(in_channels=12))
    ref_unet: sd_unet2d.SDUNetConfig = dataclasses.field(
        default_factory=lambda: sd_unet2d.SDUNetConfig(in_channels=4))
    vae: VAE.VAEConfig = dataclasses.field(default_factory=VAE.VAEConfig)
    image_embed_dim: int = 1024       # CLIPVisionModelWithProjection (ViT-H)
    prediction_type: str = "eps"      # scheduler prediction_type
    num_train_timesteps: int = 1000
    linear_start: float = 0.00085     # SD "scaled_linear" betas
    linear_end: float = 0.012
    scale_factor: float = 0.18215


def make_schedule(cfg: DepthLabConfig) -> S.DiffusionSchedule:
    # plain SD2 schedule: no ZTSNR rescale, no dynamic rescale (those are
    # MDM-specific); "linear" here is lvdm/diffusers "scaled_linear"
    return S.DiffusionSchedule.create(
        timesteps=cfg.num_train_timesteps,
        beta_schedule="linear",
        linear_start=cfg.linear_start,
        linear_end=cfg.linear_end,
        rescale_betas_zero_snr=False,
        parameterization=cfg.prediction_type if cfg.prediction_type != "eps" else "eps",
        use_dynamic_rescale=False,
    )


def init(rng, cfg: DepthLabConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "denoising_unet": sd_unet2d.init(k1, cfg.unet),
        "reference_unet": sd_unet2d.init(k2, cfg.ref_unet),
        "mapping_layer": F.init_linear(
            k3, cfg.image_embed_dim, cfg.unet.cross_attention_dim),
    }


def mapping_apply(p, image_embeds):
    """`My_proj` (depthlab_tools.py:461-466): project the CLIP image embedding
    into the UNet cross-attention space, one context token per image."""
    return F.linear(p, image_embeds)[:, None, :]


# ---------------------------------------------------------------------------
# Diffusers-format VAE import (Marigold ships an SD2 AutoencoderKL)
# ---------------------------------------------------------------------------

def _rename_diffusers_vae_key(key: str, num_levels: int = 4) -> str:
    """diffusers AutoencoderKL state_dict key -> CompVis (nn/vae.py) key."""
    k = key
    k = k.replace("conv_norm_out", "norm_out")
    k = k.replace("mid_block.resnets.0", "mid.block_1")
    k = k.replace("mid_block.resnets.1", "mid.block_2")
    k = k.replace("mid_block.attentions.0", "mid.attn_1")
    k = k.replace(".group_norm.", ".norm.")
    k = k.replace(".to_q.", ".q.").replace(".to_k.", ".k.").replace(".to_v.", ".v.")
    k = k.replace(".to_out.0.", ".proj_out.")
    k = k.replace(".conv_shortcut.", ".nin_shortcut.")
    if ".down_blocks." in k:
        k = k.replace(".down_blocks.", ".down.").replace(".resnets.", ".block.")
        k = k.replace(".downsamplers.0.conv.", ".downsample.conv.")
    if ".up_blocks." in k:
        # diffusers decoder up_blocks run coarse->fine; CompVis indexes
        # fine->coarse and iterates reversed (ae_modules.py Decoder).
        parts = k.split(".")
        i = parts.index("up_blocks")
        parts[i] = "up"
        parts[i + 1] = str(num_levels - 1 - int(parts[i + 1]))
        k = ".".join(parts).replace(".resnets.", ".block.")
        k = k.replace(".upsamplers.0.conv.", ".upsample.conv.")
    return k


def diffusers_vae_to_pytree(sd, dtype=None, num_levels: int = 4):
    """Flat diffusers AutoencoderKL state_dict -> nn/vae.py pytree.

    The attention q/k/v/out projections are Linear in diffusers but 1x1 convs
    in the CompVis layout; they are reshaped before the generic rank-based
    layout transform.
    """
    renamed = {}
    for key, val in sd.items():
        val = np.asarray(val)
        new = _rename_diffusers_vae_key(key, num_levels)
        if ".attn_1." in new and new.endswith(".weight") and val.ndim == 2:
            val = val.reshape(*val.shape, 1, 1)   # Linear (out,in) -> Conv2d
        renamed[new] = val
    return CKPT.state_dict_to_pytree(renamed, dtype=dtype)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def _ddim_depth_loop(params, cfg: DepthLabConfig, sched, z_rgb, z_depth, mask_lat,
                     context, rng, *, steps: int, strength: float, blend: bool):
    """The jittable denoise: reference pass + DDIM scan over the depth latent.

    z_rgb/z_depth: (B, h, w, 4) scaled latents; mask_lat: (B, h, w, 1) with 1
    where depth is KNOWN. Returns the final depth latent (B, h, w, 4).
    """
    b = z_rgb.shape[0]
    consts = S_ddim_constants(sched, steps)
    n_run = max(1, min(steps, int(round(steps * strength))))

    _, bank = sd_unet2d.apply(
        params["reference_unet"], cfg.ref_unet, z_rgb,
        jnp.zeros((b,), jnp.int32), context, ref_mode="write")
    bank = [h.astype(z_rgb.dtype) for h in bank]

    mask4 = jnp.broadcast_to(mask_lat, z_depth.shape).astype(z_depth.dtype)
    start = steps - n_run
    rng, k0 = jax.random.split(rng)
    # strength<1: begin from a noised version of the known/filled depth latent
    # (img2img-style partial denoise, depthlab strength=0.8)
    noise0 = jax.random.normal(k0, z_depth.shape, z_depth.dtype)
    a0 = consts.alphas[start]
    x = jnp.sqrt(a0) * z_depth + jnp.sqrt(1.0 - a0) * noise0

    sqrt_ac = jnp.asarray(sched.sqrt_alphas_cumprod)
    sqrt_omac = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def body(carry, const):
        x, rng = carry
        rng, kq = jax.random.split(rng)
        if blend:
            # re-impose the known depth in the known region at this noise
            # level (latent blending, depthlab_tools.py generate_depth_map
            # blend=True)
            nq = jax.random.normal(kq, x.shape, x.dtype)
            x_known = sqrt_ac[const.ts] * z_depth + sqrt_omac[const.ts] * nq
            x = mask4 * x_known + (1.0 - mask4) * x
        t_b = jnp.broadcast_to(const.ts, (b,))
        inp = jnp.concatenate([x, z_depth, mask4], axis=-1)
        out = sd_unet2d.apply(params["denoising_unet"], cfg.unet, inp, t_b,
                              context, ref_mode="read", ref_bank=bank)
        xf = x.astype(jnp.float32)
        of = out.astype(jnp.float32)
        a_t, a_prev = const.alphas, const.alphas_prev
        if cfg.prediction_type == "v":
            e_t = jnp.sqrt(a_t) * of + jnp.sqrt(1 - a_t) * xf
            x0 = jnp.sqrt(a_t) * xf - jnp.sqrt(1 - a_t) * of
        else:
            e_t = of
            x0 = (xf - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
        x_prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * e_t
        return (x_prev.astype(x.dtype), rng), None

    run = jax.tree_util.tree_map(lambda a: a[start:], consts)
    (x, _), _ = jax.lax.scan(body, (x, rng), run)
    if blend:
        x = mask4 * z_depth + (1.0 - mask4) * x
    return x


def S_ddim_constants(sched, steps):
    from ..diffusion.ddim import make_ddim_constants
    # trailing spacing is exact for any step count ("uniform" requires
    # steps | 1000 and is off-by-one otherwise, like the lvdm original)
    return make_ddim_constants(sched, steps, timestep_spacing="uniform_trailing", eta=0.0)


def predict_depth(params, cfg: DepthLabConfig, vae_params, image, sparse_depth,
                  *, rng=None, steps: int = 50, strength: float = 0.8,
                  blend: bool = True, context=None, dtype=jnp.float32):
    """generate_depth_map (depthlab_tools.py:317-344) device path.

    image: (H, W, 3) in [0, 255] or [0, 1]; sparse_depth: (H, W) metric with
    0 at holes; H, W must be multiples of 8. `context` is the mapped CLIP
    image embedding (B, 1, ctx) — pass None for a zero context (weights
    absent). Returns relative depth (H, W) float32 in [0, 1]; metric
    alignment is `data/depth_tools.align_depth`, exactly like the reference
    pipeline.
    """
    from ..data.depth_tools import densify_classical

    if rng is None:
        rng = jax.random.PRNGKey(0)
    h, w = sparse_depth.shape
    f = 2 ** (len(cfg.vae.ch_mult) - 1)   # VAE spatial stride (f=8 for SD)
    assert h % f == 0 and w % f == 0, (h, w, f)

    img = np.asarray(image, np.float32)
    if img.max() > 2.0:
        img = img / 255.0
    img = img * 2.0 - 1.0

    known = (np.asarray(sparse_depth) > 0).astype(np.float32)
    # fill holes so the VAE sees a dense map (get_filled_for_latents analog,
    # depthlab_tools.py:322-324)
    filled = densify_classical(np.asarray(sparse_depth, np.float32))
    valid = np.asarray(sparse_depth)[known > 0]
    if valid.size >= 2:
        lo, hi = np.percentile(valid, 2.0), np.percentile(valid, 98.0)
    else:
        lo, hi = 0.0, 1.0
    hi = max(hi, lo + 1e-6)
    dn = np.clip((filled - lo) / (hi - lo), 0.0, 1.0) * 2.0 - 1.0

    sched = make_schedule(cfg)
    x_img = jnp.asarray(img, dtype)[None]
    x_dep = jnp.asarray(np.repeat(dn[..., None], 3, axis=-1), dtype)[None]
    z_rgb = VAE.encode_moments(vae_params, cfg.vae, x_img).mode() * cfg.scale_factor
    z_dep = VAE.encode_moments(vae_params, cfg.vae, x_dep).mode() * cfg.scale_factor
    # latent-resolution known mask: a latent pixel counts as known when any
    # of its fxf footprint pixels carries lidar
    mask_lat = jnp.asarray(
        known.reshape(h // f, f, w // f, f).max(axis=(1, 3)), dtype
    )[None, ..., None]
    if context is None:
        context = jnp.zeros((1, 1, cfg.unet.cross_attention_dim), dtype)

    z = _ddim_depth_loop(params, cfg, sched, z_rgb.astype(dtype),
                         z_dep.astype(dtype), mask_lat, context, rng,
                         steps=steps, strength=strength, blend=blend)
    dec = VAE.decode(vae_params, cfg.vae, z / cfg.scale_factor)
    rel = (jnp.mean(dec[0], axis=-1) + 1.0) / 2.0   # eval_tools-style mean
    rel = np.asarray(jnp.clip(rel, 0.0, 1.0), np.float32)
    # back to the sparse map's scale; metric fit happens in align_depth
    return rel * (hi - lo) + lo


def _find_linear(tree):
    """Locate the projection Linear inside an imported `My_proj` pytree
    (exact module layout ships with the external checkpoint)."""
    if isinstance(tree, dict):
        w = tree.get("weight")
        if w is not None and getattr(w, "ndim", 0) == 2:
            return tree
        for v in tree.values():
            found = _find_linear(v)
            if found is not None:
                return found
    return None


def load_depthlab_dir(root: str, cfg: DepthLabConfig | None = None,
                      dtype=None):
    """Assemble DepthLab params from a checkpoint directory laid out like the
    reference expects (depthlab_tools.py:467-476 + Marigold pretrained dir):
        denoising_unet.pth / reference_unet.pth / mapping_layer.pth
        vae/diffusion_pytorch_model.{safetensors|bin}
    Returns (params, cfg, vae_params)."""
    import os

    cfg = cfg or DepthLabConfig()
    d = lambda *p: os.path.join(root, *p)
    params = {
        "denoising_unet": CKPT.state_dict_to_pytree(
            CKPT.load_torch_state_dict(d("denoising_unet.pth")), dtype=dtype),
        "reference_unet": CKPT.state_dict_to_pytree(
            CKPT.load_torch_state_dict(d("reference_unet.pth")), dtype=dtype),
    }
    mp = CKPT.state_dict_to_pytree(
        CKPT.load_torch_state_dict(d("mapping_layer.pth")), dtype=dtype)
    lin = _find_linear(mp)
    params["mapping_layer"] = lin if lin is not None else mp
    vae_params = None
    for cand in ("vae/diffusion_pytorch_model.safetensors",
                 "vae/diffusion_pytorch_model.bin"):
        if os.path.exists(d(cand)):
            vae_params = diffusers_vae_to_pytree(
                CKPT.load_torch_state_dict(d(cand)), dtype=dtype,
                num_levels=len(cfg.vae.ch_mult))
            break
    return params, cfg, vae_params


class DepthLabPredictor:
    """`densify_depth_map(..., predictor=...)` adapter holding the models.

    Call signature matches the classical fallback: predictor(sparse, image)
    -> relative depth; `data/depth_tools.densify_depth_map` lstsq-aligns and
    sky-fills the result (depthlab_tools.py:317-344,480-549).
    """

    def __init__(self, params, cfg: DepthLabConfig, vae_params, *, steps=50,
                 strength=0.8, blend=True, dtype=jnp.float32):
        self.params, self.cfg, self.vae_params = params, cfg, vae_params
        self.steps, self.strength, self.blend = steps, strength, blend
        self.dtype = dtype

    def __call__(self, sparse, image=None):
        if image is None:
            image = np.zeros((*sparse.shape, 3), np.float32)
        return predict_depth(
            self.params, self.cfg, self.vae_params, image, sparse,
            steps=self.steps, strength=self.strength, blend=self.blend,
            dtype=self.dtype)
