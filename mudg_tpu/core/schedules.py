"""Diffusion noise schedules as precomputed numpy/JAX arrays.

Pure-function equivalents of the reference schedule machinery
(`lvdm/models/utils_diffusion.py:31-144`, `lvdm/models/ddpm3d.py:123-186`,
`lvdm/models/ddpm3d.py:522-527`): everything is computed once on host in
float64/float32 and handed to jitted code as constant arrays. No buffers,
no in-place mutation.
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule (float64), matching lvdm/models/utils_diffusion.py:31-53."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown")
    return betas


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Zero-terminal-SNR rescaling (arXiv 2305.08891, Algorithm 1).

    Matches lvdm/models/utils_diffusion.py:112-144.
    """
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    abar_sqrt = np.sqrt(alphas_cumprod)

    abar_sqrt_0 = abar_sqrt[0].copy()
    abar_sqrt_T = abar_sqrt[-1].copy()
    abar_sqrt = abar_sqrt - abar_sqrt_T
    abar_sqrt = abar_sqrt * abar_sqrt_0 / (abar_sqrt_0 - abar_sqrt_T)

    abar = abar_sqrt**2
    alphas = abar[1:] / abar[:-1]
    alphas = np.concatenate([abar[0:1], alphas])
    return 1 - alphas


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """DDIM timestep selection, matching lvdm/models/utils_diffusion.py:56-76.

    `uniform_trailing` is the ZTSNR-correct spacing that starts from the last
    DDPM step.
    """
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        steps = np.asarray(list(range(0, num_ddpm_timesteps, c))) + 1
    elif ddim_discr_method == "uniform_trailing":
        c = num_ddpm_timesteps / num_ddim_timesteps
        steps = np.flip(np.round(np.arange(num_ddpm_timesteps, 0, -c))).astype(np.int64) - 1
    elif ddim_discr_method == "quad":
        steps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int) + 1
    else:
        raise NotImplementedError(f"unknown ddim discretization '{ddim_discr_method}'")
    return steps


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """Per-DDIM-step (sigma, alpha, alpha_prev); lvdm utils_diffusion.py:79-91."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


def make_dynamic_rescale_arr(
    num_timesteps: int, base_scale: float, turning_step: int = 400
) -> np.ndarray:
    """Dynamic latent rescale array (lvdm/models/ddpm3d.py:522-527): linearly
    decays 1.0 -> base_scale over `turning_step` steps, constant after.
    Only the first `num_timesteps` entries are ever indexed."""
    arr1 = np.linspace(1.0, base_scale, turning_step)
    arr2 = np.full(num_timesteps, base_scale)
    return np.concatenate([arr1, arr2])[:num_timesteps].astype(np.float32)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-DDPM-timestep constants, precomputed on host.

    Equivalent to the buffers registered in DDPM.register_schedule
    (lvdm/models/ddpm3d.py:123-186), as immutable numpy arrays.
    """

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    lvlb_weights: np.ndarray
    scale_arr: np.ndarray | None  # dynamic rescale, or None

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @staticmethod
    def create(
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 0.00085,
        linear_end: float = 0.012,
        cosine_s: float = 8e-3,
        given_betas: np.ndarray | None = None,
        rescale_betas_zero_snr: bool = True,
        parameterization: str = "v",
        v_posterior: float = 0.0,
        use_dynamic_rescale: bool = True,
        base_scale: float = 0.7,
        turning_step: int = 400,
    ) -> "DiffusionSchedule":
        if given_betas is not None:
            betas = np.asarray(given_betas, dtype=np.float64)
        else:
            betas = make_beta_schedule(
                beta_schedule, timesteps, linear_start=linear_start,
                linear_end=linear_end, cosine_s=cosine_s,
            )
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)

        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (
            (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            + v_posterior * betas
        )
        if parameterization == "eps":
            lvlb = betas**2 / (2 * posterior_variance * alphas * (1 - alphas_cumprod))
        elif parameterization == "x0":
            lvlb = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
        elif parameterization == "v":
            lvlb = np.ones_like(betas)
        else:
            raise NotImplementedError(parameterization)
        lvlb = lvlb.copy()
        lvlb[0] = lvlb[1]

        f32 = lambda x: np.asarray(x, dtype=np.float32)
        return DiffusionSchedule(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            lvlb_weights=f32(lvlb),
            scale_arr=(
                make_dynamic_rescale_arr(timesteps, base_scale, turning_step)
                if use_dynamic_rescale
                else None
            ),
        )


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal embedding, [cos | sin] order (lvdm utils_diffusion.py:8-28).

    `timesteps` is a 1-D (possibly fractional) array; returns (N, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding
