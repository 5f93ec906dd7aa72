"""DDIM sampler: constants vs reference formulas, oracle-model convergence."""
import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.core import schedules as S
from mudg_tpu.diffusion import ddim as D


def _sched(**kw):
    base = dict(rescale_betas_zero_snr=True, use_dynamic_rescale=False)
    base.update(kw)
    return S.DiffusionSchedule.create(**base)


def test_constants_ordering_and_values():
    sched = _sched()
    c = D.make_ddim_constants(sched, 50, timestep_spacing="uniform_trailing", eta=1.0)
    # sampling order: first element is the terminal timestep 999
    assert int(c.ts[0]) == 999 and int(c.ts[-1]) == 19
    np.testing.assert_allclose(
        np.asarray(c.alphas), np.asarray(sched.alphas_cumprod)[np.asarray(c.ts)],
        rtol=1e-5,
    )
    # ZTSNR: alpha at terminal step is ~0
    assert float(c.alphas[0]) < 1e-6
    np.testing.assert_allclose(
        np.asarray(c.sqrt_one_minus), np.sqrt(1 - np.asarray(c.alphas)), rtol=1e-5
    )


def test_dynamic_rescale_constants():
    sched = _sched(use_dynamic_rescale=True, base_scale=0.7)
    c = D.make_ddim_constants(sched, 50)
    # highest timestep uses base_scale; in sampling order scale_prev[i] is the
    # scale of the *next* (lower-t) step, matching ddim.py:33 after the flip
    np.testing.assert_allclose(float(c.scale[0]), 0.7, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c.scale_prev[:-1]), np.asarray(c.scale[1:]), rtol=1e-6
    )
    # at the lowest step, prev == itself (ddim_scale_arr[0:1] duplication)
    np.testing.assert_allclose(float(c.scale_prev[-1]), float(c.scale[-1]), rtol=1e-6)


def test_ddim_step_oracle_pred_x0():
    """With the exact v for a known x0, pred_x0 must recover x0."""
    sched = _sched()
    c = D.make_ddim_constants(sched, 25, eta=0.0)
    i = 10
    x0 = jnp.full((2, 3, 4, 4, 1), 0.5)
    eps = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    sa = jnp.sqrt(c.alphas[i])
    soma = c.sqrt_one_minus[i]
    xt = sa * x0 + soma * eps
    v = sa * eps - soma * x0

    const = jax.tree.map(lambda a: jnp.broadcast_to(a[i], (2,)), c)
    x_prev, pred_x0 = D.ddim_step(xt, v, const, jnp.zeros_like(xt))
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), atol=1e-5)


def test_full_sampling_converges_to_point_mass():
    """An oracle v-model for a point-mass data distribution: DDIM (eta=0)
    must land on x0."""
    sched = _sched()
    c = D.make_ddim_constants(sched, 25, eta=0.0)
    x0_true = jnp.asarray(
        np.linspace(-1, 1, 2 * 4 * 4).reshape(1, 4, 4, 2), jnp.float32
    )
    sa_arr = jnp.asarray(sched.sqrt_alphas_cumprod)
    soma_arr = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def model_fn(x, t):
        sa = sa_arr[t].reshape(-1, 1, 1, 1)
        soma = soma_arr[t].reshape(-1, 1, 1, 1)
        eps = (x - sa * x0_true) / jnp.maximum(soma, 1e-8)
        return sa * eps - soma * x0_true

    out = D.ddim_sample(model_fn, jax.random.PRNGKey(0), x0_true.shape, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=0.1)


def test_mask_blending_keeps_masked_region():
    """mask=1 regions must stay at (noised) x0; with the oracle model the
    final output equals x0 everywhere."""
    sched = _sched()
    c = D.make_ddim_constants(sched, 10, eta=0.0)
    x0 = jnp.ones((1, 4, 4, 1))
    mask = jnp.zeros_like(x0).at[:, :2].set(1.0)
    sa_arr = jnp.asarray(sched.sqrt_alphas_cumprod)
    soma_arr = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def model_fn(x, t):
        sa = sa_arr[t].reshape(-1, 1, 1, 1)
        soma = soma_arr[t].reshape(-1, 1, 1, 1)
        eps = (x - sa * x0) / jnp.maximum(soma, 1e-8)
        return sa * eps - soma * x0

    out = D.ddim_sample(
        model_fn, jax.random.PRNGKey(1), x0.shape, c, mask=mask, x0=x0, sched=sched
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.15)


def test_stochastic_encode():
    sched = _sched()
    c = D.make_ddim_constants(sched, 25)
    x0 = jnp.ones((2, 3, 3, 1))
    noise = jnp.zeros_like(x0)
    z = D.stochastic_encode(x0, jnp.array([5, 5]), c, noise)
    np.testing.assert_allclose(
        np.asarray(z), float(jnp.sqrt(c.alphas[5])), rtol=1e-5
    )


def test_resampler_shapes():
    from mudg_tpu.nn import resampler as R

    cfg = R.ResamplerConfig(dim=64, depth=2, dim_head=16, heads=4, num_queries=4,
                            embedding_dim=48, output_dim=32, video_length=4)
    p = R.init_resampler(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 48))
    out = R.resampler_apply(p, cfg, x)
    assert out.shape == (3, 16, 32)  # 4 queries * 4 frames
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddpm_ancestral_sampler_converges():
    """Oracle v-model point-mass: full ancestral chain lands near x0."""
    sched = _sched()
    x0_true = jnp.full((1, 4, 4, 1), 0.25)
    sa = jnp.asarray(sched.sqrt_alphas_cumprod)
    soma = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def model_fn(x, t):
        s = sa[t].reshape(-1, 1, 1, 1)
        o = soma[t].reshape(-1, 1, 1, 1)
        eps = (x - s * x0_true) / jnp.maximum(o, 1e-8)
        return s * eps - o * x0_true

    out = D.ddpm_sample(model_fn, jax.random.PRNGKey(0), x0_true.shape, sched)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=0.2)
