"""v/eps/x0 algebra and CFG arithmetic: identity round-trips + closed forms."""
import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.core import diffusion as D
from mudg_tpu.core import schedules as S


def _sched():
    return S.DiffusionSchedule.create(rescale_betas_zero_snr=False)


def test_v_roundtrip():
    sched = _sched()
    sa = jnp.asarray(sched.sqrt_alphas_cumprod)
    so = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 3, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([17, 530])

    xt = D.q_sample(x0, t, noise, sa, so)
    v = D.get_v(x0, noise, t, sa, so)
    # predict_start_from_z_and_v inverts q_sample given the true v
    x0_hat = D.predict_start_from_z_and_v(xt, t, v, sa, so)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-5)
    eps_hat = D.predict_eps_from_z_and_v(xt, t, v, sa, so)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(noise), atol=1e-5)


def test_cfg_combiners():
    e_uc = jnp.zeros((1, 4))
    e_c = jnp.ones((1, 4))
    out = D.cfg_combine(e_uc, e_c, 7.5)
    np.testing.assert_allclose(np.asarray(out), 7.5)

    e_uc_img = jnp.full((1, 4), 0.5)
    out3 = D.cfg_combine_multicond(e_uc, e_uc_img, e_c, 7.5)
    # e_uc + 7.5*(0.5-0) + 7.5*(1-0.5) = 7.5
    np.testing.assert_allclose(np.asarray(out3), 7.5)
    out3b = D.cfg_combine_multicond(e_uc, e_uc_img, e_c, 7.5, cfg_img=1.0)
    np.testing.assert_allclose(np.asarray(out3b), 0.5 + 7.5 * 0.5)


def test_rescale_noise_cfg():
    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (2, 4, 8, 8))
    cfg = text * 3.0  # overexposed
    # full rescale restores text std
    out = D.rescale_noise_cfg(cfg, text, guidance_rescale=1.0)
    np.testing.assert_allclose(
        np.asarray(jnp.std(out, axis=(1, 2, 3))),
        np.asarray(jnp.std(text, axis=(1, 2, 3))),
        rtol=1e-5,
    )
    # zero rescale is a no-op
    out0 = D.rescale_noise_cfg(cfg, text, guidance_rescale=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(cfg), rtol=1e-6)


def test_diagonal_gaussian():
    from mudg_tpu.core.distributions import DiagonalGaussian

    rng = jax.random.PRNGKey(0)
    moments = jax.random.normal(rng, (2, 8, 8, 8))
    dist = DiagonalGaussian.from_moments(moments)
    assert dist.mean.shape == (2, 8, 8, 4)
    s = dist.sample(jax.random.PRNGKey(1))
    assert s.shape == dist.mean.shape
    kl = dist.kl()
    assert kl.shape == (2,)
    assert np.all(np.asarray(kl) >= 0)
