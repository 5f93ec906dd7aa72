"""DDIM sampling compiled as a single `lax.scan`.

TPU-first rebuild of `lvdm/models/samplers/ddim.py` (and the 3-point-CFG
variant `ddim_multiplecond.py`): all per-step constants (alphas, sigmas,
dynamic-rescale ratios, timesteps) are gathered on host into stacked arrays
(exactly what make_schedule builds, ddim.py:24-57), then the 25/50-step loop
is one scan whose body calls the denoiser once. Classifier-free guidance is
composed *inside* the caller's `model_fn` (by batching the condition variants
into one UNet call — a TPU win over the reference's sequential apply_model
calls, ddim.py:221-226 / ddim_multiplecond.py:230-234).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import schedules as S


class DDIMConstants(NamedTuple):
    """Per-step constants in *sampling order* (index 0 = highest timestep)."""
    ts: jnp.ndarray            # (S,) int32 ddpm timesteps
    alphas: jnp.ndarray        # (S,) a_t
    alphas_prev: jnp.ndarray   # (S,)
    sqrt_one_minus: jnp.ndarray
    sigmas: jnp.ndarray
    scale: jnp.ndarray         # dynamic rescale at t (ones if disabled)
    scale_prev: jnp.ndarray


def make_ddim_constants(
    sched: S.DiffusionSchedule,
    num_steps: int,
    *,
    timestep_spacing: str = "uniform_trailing",
    eta: float = 1.0,
) -> DDIMConstants:
    """Equivalent of DDIMSampler.make_schedule (ddim.py:24-57), as data."""
    steps = S.make_ddim_timesteps(timestep_spacing, num_steps, sched.num_timesteps)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    sigmas, alphas, alphas_prev = S.make_ddim_sampling_parameters(ac, steps, eta)
    if sched.scale_arr is not None:
        scale = sched.scale_arr[steps]
        scale_prev = np.concatenate([scale[0:1], scale[:-1]])
    else:
        scale = np.ones_like(alphas)
        scale_prev = np.ones_like(alphas)
    # reverse into sampling order (high t -> low t), matching np.flip at
    # ddim.py:159
    rev = lambda x: jnp.asarray(np.ascontiguousarray(x[::-1]), dtype=jnp.float32)
    return DDIMConstants(
        ts=jnp.asarray(np.ascontiguousarray(steps[::-1]), dtype=jnp.int32),
        alphas=rev(alphas),
        alphas_prev=rev(alphas_prev),
        sqrt_one_minus=rev(np.sqrt(1.0 - alphas)),
        sigmas=rev(sigmas),
        scale=rev(scale),
        scale_prev=rev(scale_prev),
    )


def ddim_step(x, v, const, noise, *, temperature=1.0):
    """One p_sample_ddim update for a v-parameterized model
    (ddim.py:231-279): v -> (eps, x0), dynamic rescale of x0, DDIM update.

    x: (B, ...) latents; v: model output (CFG already applied); const: a
    pytree slice of DDIMConstants for this step; noise: same shape as x.
    """
    nd = (1,) * (x.ndim - 1)
    dtype = x.dtype
    # sampler algebra in fp32 (cheap relative to the UNet; avoids bf16 drift
    # across 25-50 sequential updates), carry dtype preserved for the scan
    xf = x.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    a_t = const.alphas.reshape(-1, *nd)
    a_prev = const.alphas_prev.reshape(-1, *nd)
    soma = const.sqrt_one_minus.reshape(-1, *nd)
    sigma = const.sigmas.reshape(-1, *nd)
    sa = jnp.sqrt(a_t)

    e_t = sa * vf + soma * xf
    pred_x0 = sa * xf - soma * vf
    pred_x0 = pred_x0 * (const.scale_prev / const.scale).reshape(-1, *nd)

    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * e_t
    x_prev = (
        jnp.sqrt(a_prev) * pred_x0 + dir_xt
        + sigma * noise.astype(jnp.float32) * temperature
    )
    return x_prev.astype(dtype), pred_x0.astype(dtype)


def ddim_sample(
    model_fn: Callable,
    rng: jax.Array,
    shape,
    consts: DDIMConstants,
    *,
    x_T=None,
    temperature: float = 1.0,
    mask=None,
    x0=None,
    sched: S.DiffusionSchedule | None = None,
    dtype=jnp.float32,
):
    """DDIM sampling loop (ddim.py:134-203) as lax.scan.

    model_fn(x, t) -> v prediction with guidance already combined; t is (B,).
    Optional mask/x0 latent blending per step (ddim.py:174-180, clean_cond
    False semantics: blend against q_sample(x0, t)).
    Returns (x_final, pred_x0_final).
    """
    b = shape[0]
    rng, k0 = jax.random.split(rng)
    x = jax.random.normal(k0, shape, dtype) if x_T is None else x_T

    if mask is not None:
        assert x0 is not None and sched is not None
        sqrt_ac = jnp.asarray(sched.sqrt_alphas_cumprod)
        sqrt_omac = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def body(carry, const):
        x, rng = carry
        rng, kn, kq = jax.random.split(rng, 3)
        if mask is not None:
            noise_q = jax.random.normal(kq, x.shape, x.dtype)
            nd = (1,) * (x.ndim - 1)
            img_orig = (
                sqrt_ac[const.ts].reshape(-1, *nd) * x0
                + sqrt_omac[const.ts].reshape(-1, *nd) * noise_q
            )
            x = img_orig * mask + (1.0 - mask) * x
        t_b = jnp.broadcast_to(const.ts, (b,))
        v = model_fn(x, t_b)
        noise = jax.random.normal(kn, x.shape, x.dtype)
        x_prev, pred_x0 = ddim_step(
            x, v,
            const._replace(
                alphas=jnp.broadcast_to(const.alphas, (b,)),
                alphas_prev=jnp.broadcast_to(const.alphas_prev, (b,)),
                sqrt_one_minus=jnp.broadcast_to(const.sqrt_one_minus, (b,)),
                sigmas=jnp.broadcast_to(const.sigmas, (b,)),
                scale=jnp.broadcast_to(const.scale, (b,)),
                scale_prev=jnp.broadcast_to(const.scale_prev, (b,)),
            ),
            noise,
            temperature=temperature,
        )
        return (x_prev, rng), None

    (x, _), _ = jax.lax.scan(body, (x, rng), consts)
    # final pred_x0 equals x at the last step when a_prev -> 1 (ZTSNR +
    # trailing spacing ends at t=19); return x as the sample like the
    # reference does (ddim.py:195-203 returns img).
    return x


def stochastic_encode(x0, index, consts: DDIMConstants, noise):
    """DDIMSampler.stochastic_encode (ddim.py:303-317) against DDIM alphas."""
    nd = (1,) * (x0.ndim - 1)
    sa = jnp.sqrt(consts.alphas[index]).reshape(-1, *nd)
    soma = consts.sqrt_one_minus[index].reshape(-1, *nd)
    return sa * x0 + soma * noise


def ddpm_sample(
    model_fn: Callable,
    rng: jax.Array,
    shape,
    sched: S.DiffusionSchedule,
    *,
    parameterization: str = "v",
    clip_denoised: bool = False,
    dtype=jnp.float32,
):
    """Full ancestral DDPM sampling (DDPM.p_sample_loop, ddpm3d.py:274-296)
    as one lax.scan over all T timesteps. model_fn(x, t) returns the model
    output in the given parameterization.

    Provided for capability parity with the reference base class; production
    inference uses the DDIM path.
    """
    b = shape[0]
    sa = jnp.asarray(sched.sqrt_alphas_cumprod)
    soma = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)
    sra = jnp.asarray(np.sqrt(1.0 / np.maximum(sched.alphas_cumprod, 1e-20)))
    sram1 = jnp.asarray(np.sqrt(np.maximum(1.0 / np.maximum(sched.alphas_cumprod, 1e-20) - 1.0, 0.0)))
    pm1 = jnp.asarray(sched.posterior_mean_coef1)
    pm2 = jnp.asarray(sched.posterior_mean_coef2)
    plv = jnp.asarray(sched.posterior_log_variance_clipped)

    rng, k0 = jax.random.split(rng)
    x = jax.random.normal(k0, shape, dtype)

    def body(carry, tstep):
        x, rng = carry
        rng, kn = jax.random.split(rng)
        t_b = jnp.full((b,), tstep, jnp.int32)
        out = model_fn(x, t_b)
        nd = (1,) * (x.ndim - 1)
        if parameterization == "v":
            x0 = sa[tstep].reshape(*nd) * x - soma[tstep].reshape(*nd) * out
        elif parameterization == "eps":
            x0 = sra[tstep].reshape(*nd) * x - sram1[tstep].reshape(*nd) * out
        else:  # x0
            x0 = out
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = pm1[tstep].reshape(*nd) * x0 + pm2[tstep].reshape(*nd) * x
        noise = jax.random.normal(kn, x.shape, x.dtype)
        nonzero = (tstep > 0).astype(x.dtype)
        x_prev = mean + nonzero * jnp.exp(0.5 * plv[tstep]).reshape(*nd) * noise
        return (x_prev, rng), None

    steps = jnp.arange(sched.num_timesteps - 1, -1, -1)
    (x, _), _ = jax.lax.scan(body, (x, rng), steps)
    return x
