"""Closed-form checks of the diffusion schedule machinery against the exact
values the reference computes (lvdm/models/utils_diffusion.py, ddpm3d.py)."""
import numpy as np
import pytest

from mudg_tpu.core import schedules as S


def test_linear_betas_endpoints():
    betas = S.make_beta_schedule("linear", 1000, linear_start=0.00085, linear_end=0.012)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    # midpoint of sqrt-space linspace, squared
    mid = ((0.00085**0.5 + 0.012**0.5) / 2) ** 2
    np.testing.assert_allclose(betas[499:501].mean(), mid, rtol=1e-5)


def test_ztsnr_terminal_snr_is_zero():
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    rb = S.rescale_zero_terminal_snr(betas)
    ac = np.cumprod(1 - rb)
    assert abs(ac[-1]) < 1e-12  # terminal alpha_bar == 0 => SNR == 0
    # first-step alpha_bar preserved
    np.testing.assert_allclose(ac[0], 1 - betas[0], rtol=1e-10)


def test_ddim_uniform_trailing_steps():
    # 1000 ddpm steps, 50 ddim steps: trailing spacing ends at 999
    steps = S.make_ddim_timesteps("uniform_trailing", 50, 1000)
    assert steps[-1] == 999
    assert steps[0] == 19
    assert len(steps) == 50
    assert np.all(np.diff(steps) == 20)
    # uniform spacing starts at 1
    steps_u = S.make_ddim_timesteps("uniform", 50, 1000)
    assert steps_u[0] == 1 and len(steps_u) == 50


def test_ddim_sigmas_eta_zero_and_one():
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    ac = np.cumprod(1 - betas)
    steps = S.make_ddim_timesteps("uniform", 25, 1000)
    sig0, a, ap = S.make_ddim_sampling_parameters(ac, steps, eta=0.0)
    assert np.all(sig0 == 0)
    sig1, a, ap = S.make_ddim_sampling_parameters(ac, steps, eta=1.0)
    expected = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(sig1, expected)
    np.testing.assert_allclose(a, ac[steps])
    np.testing.assert_allclose(ap[1:], ac[steps[:-1]])
    np.testing.assert_allclose(ap[0], ac[0])


def test_dynamic_rescale_arr():
    arr = S.make_dynamic_rescale_arr(1000, base_scale=0.7, turning_step=400)
    assert arr.shape == (1000,)
    np.testing.assert_allclose(arr[0], 1.0)
    np.testing.assert_allclose(arr[399], 0.7, rtol=1e-6)
    np.testing.assert_allclose(arr[400:], 0.7, rtol=1e-6)


def test_schedule_create_v_param():
    sched = S.DiffusionSchedule.create()
    assert sched.num_timesteps == 1000
    # v-parameterization: lvlb weights are ones with [0]=[1]
    np.testing.assert_allclose(sched.lvlb_weights, np.ones(1000))
    # ZTSNR: last sqrt_alphas_cumprod is 0
    assert sched.sqrt_alphas_cumprod[-1] == 0.0
    assert sched.scale_arr is not None


def test_timestep_embedding_cos_sin_order():
    import jax.numpy as jnp

    emb = S.timestep_embedding(jnp.array([0.0, 1.0]), 8)
    assert emb.shape == (2, 8)
    # t=0: cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(emb[0, :4], 1.0)
    np.testing.assert_allclose(emb[0, 4:], 0.0)
    # t=1, freq_0 = 1: cos(1), sin(1)
    np.testing.assert_allclose(float(emb[1, 0]), np.cos(1.0), rtol=1e-6)
    np.testing.assert_allclose(float(emb[1, 4]), np.sin(1.0), rtol=1e-6)
