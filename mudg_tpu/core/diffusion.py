"""Pure diffusion algebra: q-sampling, v/eps/x0 conversions, CFG combiners.

Functional equivalents of the methods on the reference DDPM class
(`lvdm/models/ddpm3d.py:239-314`) and the CFG/rescale arithmetic
(`lvdm/models/utils_diffusion.py:147-158`,
`lvdm/models/samplers/ddim_multiplecond.py:226-236`). All functions are
shape-polymorphic and jittable; per-timestep schedule constants are gathered
with `extract` (the `extract_into_tensor` analog).
"""
from __future__ import annotations

import jax.numpy as jnp


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather a[t] per batch element and reshape to broadcast over `ndim` dims.

    Analog of lvdm/common.py:25-29 (extract_into_tensor).
    """
    out = a[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def q_sample(x_start, t, noise, sqrt_ac, sqrt_omac):
    """Forward diffusion q(x_t | x_0); lvdm/models/ddpm3d.py:305-308."""
    nd = x_start.ndim
    return extract(sqrt_ac, t, nd) * x_start + extract(sqrt_omac, t, nd) * noise


def get_v(x, noise, t, sqrt_ac, sqrt_omac):
    """v-parameterization target; lvdm/models/ddpm3d.py:310-314."""
    nd = x.ndim
    return extract(sqrt_ac, t, nd) * noise - extract(sqrt_omac, t, nd) * x


def predict_start_from_z_and_v(x_t, t, v, sqrt_ac, sqrt_omac):
    """x0 from (x_t, v); lvdm/models/ddpm3d.py:239-245."""
    nd = x_t.ndim
    return extract(sqrt_ac, t, nd) * x_t - extract(sqrt_omac, t, nd) * v


def predict_eps_from_z_and_v(x_t, t, v, sqrt_ac, sqrt_omac):
    """eps from (x_t, v); lvdm/models/ddpm3d.py:247-251."""
    nd = x_t.ndim
    return extract(sqrt_ac, t, nd) * v + extract(sqrt_omac, t, nd) * x_t


def predict_start_from_noise(x_t, t, noise, sqrt_recip_ac, sqrt_recipm1_ac):
    """x0 from (x_t, eps); lvdm/models/ddpm3d.py:233-237."""
    nd = x_t.ndim
    return extract(sqrt_recip_ac, t, nd) * x_t - extract(sqrt_recipm1_ac, t, nd) * noise


def cfg_combine(e_uncond, e_cond, guidance_scale):
    """2-point classifier-free guidance; lvdm/models/samplers/ddim.py:226."""
    return e_uncond + guidance_scale * (e_cond - e_uncond)


def cfg_combine_multicond(e_uncond, e_uncond_img, e_cond, guidance_scale, cfg_img=None):
    """3-point CFG over (fully uncond, image-only, full) conditioning.

    Matches lvdm/models/samplers/ddim_multiplecond.py:220-234:
        e_uc + cfg_img * (e_uc_img - e_uc) + s * (e_c - e_uc_img)
    with cfg_img defaulting to the text guidance scale.
    """
    if cfg_img is None:
        cfg_img = guidance_scale
    return (
        e_uncond
        + cfg_img * (e_uncond_img - e_uncond)
        + guidance_scale * (e_cond - e_uncond_img)
    )


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale=0.0):
    """Guidance rescale (arXiv 2305.08891 §3.4); lvdm utils_diffusion.py:147-158.

    Rescales the guided prediction toward the std of the conditional branch
    to fix CFG overexposure, mixing by `guidance_rescale`.
    """
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    # eps guards the degenerate all-zero prediction (untrained nets in tests);
    # for any real model std_cfg is O(1) and this is exact
    rescaled = noise_cfg * (std_text / jnp.maximum(std_cfg, 1e-12))
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg
