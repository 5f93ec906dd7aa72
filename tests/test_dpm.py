"""DPM-Solver++(2M) sampler: coefficient sanity, oracle convergence, and the
fewer-steps-beats-DDIM property that justifies its existence (net-new over
the reference's DDIM-only sampler stack)."""
import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.core import schedules as S
from mudg_tpu.diffusion import ddim as D
from mudg_tpu.diffusion import dpm as P


def _sched(**kw):
    base = dict(rescale_betas_zero_snr=True, use_dynamic_rescale=False)
    base.update(kw)
    return S.DiffusionSchedule.create(**base)


def test_constants_finite_and_degenerate_ends():
    sched = _sched()
    c = P.make_dpmpp_constants(sched, 20)
    for leaf in c:
        assert np.isfinite(np.asarray(leaf)).all()
    # first step from the ZTSNR terminal (ac=0): e^-h = 0 -> c_x = sigma_t,
    # c_d = alpha_t, and no second-order term (no previous prediction)
    assert float(c.g1[0]) == 0.0
    ac = np.asarray(sched.alphas_cumprod)
    t1 = int(c.ts[1])
    np.testing.assert_allclose(float(c.c_x[0]), np.sqrt(1 - ac[t1]), rtol=1e-5)
    np.testing.assert_allclose(float(c.c_d[0]), np.sqrt(ac[t1]), rtol=1e-5)
    # final update is first-order (lower_order_final)
    assert float(c.g1[-1]) == 0.0
    # interior steps do carry the 2M correction
    assert float(np.max(np.asarray(c.g1))) > 0.1


def _point_mass_model(sched, x0_true, ndim):
    sa_arr = jnp.asarray(sched.sqrt_alphas_cumprod)
    soma_arr = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)
    nd = (1,) * ndim

    def model_fn(x, t):
        sa = sa_arr[t].reshape(-1, *nd)
        soma = soma_arr[t].reshape(-1, *nd)
        eps = (x - sa * x0_true) / jnp.maximum(soma, 1e-8)
        return sa * eps - soma * x0_true

    return model_fn


def test_full_sampling_converges_to_point_mass():
    sched = _sched()
    c = P.make_dpmpp_constants(sched, 20)
    x0_true = jnp.asarray(
        np.linspace(-1, 1, 2 * 4 * 4).reshape(1, 4, 4, 2), jnp.float32)
    model_fn = _point_mass_model(sched, x0_true, 3)
    out = P.dpmpp_sample(model_fn, jax.random.PRNGKey(0), x0_true.shape, c)
    # residual is the sigma(t=0) noise floor (~0.03*|eps|), same as the DDIM
    # convergence test's tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=0.1)


def test_beats_ddim_at_equal_steps():
    """Exact two-point-mixture posterior (data = {+-c} under VP noising) —
    trajectories curve hard near the basin boundary, the classic testbed
    where a 2nd-order solver must beat DDIM at equal step count. Measured
    here (max err vs a 400-step reference): dpmpp-25 0.23 vs ddim-25 0.44,
    dpmpp-50 0.015 vs ddim-50 0.029."""
    sched = _sched()
    sa_arr = jnp.asarray(sched.sqrt_alphas_cumprod)
    soma_arr = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)
    cc = 0.8

    def model_fn(x, t):
        sa = sa_arr[t].reshape(-1, 1, 1, 1)
        soma = jnp.maximum(soma_arr[t], 1e-4).reshape(-1, 1, 1, 1)
        x0 = cc * jnp.tanh(sa * cc * x / (soma ** 2))
        eps = (x - sa * x0) / soma
        return sa * eps - soma * x0

    key = jax.random.PRNGKey(3)
    shape = (1, 8, 8, 1)
    ref = D.ddim_sample(model_fn, key, shape,
                        D.make_ddim_constants(sched, 400, eta=0.0))
    for n, factor in ((25, 0.75), (50, 0.75)):
        got_dpm = P.dpmpp_sample(model_fn, key, shape,
                                 P.make_dpmpp_constants(sched, n))
        got_ddim = D.ddim_sample(model_fn, key, shape,
                                 D.make_ddim_constants(sched, n, eta=0.0))
        e_dpm = float(jnp.abs(got_dpm - ref).max())
        e_ddim = float(jnp.abs(got_ddim - ref).max())
        assert e_dpm < e_ddim * factor, (n, e_dpm, e_ddim)


def test_many_steps_matches_ddim_limit():
    """At high step counts both solvers discretize the same probability-flow
    ODE: 100-step dpmpp and 100-step DDIM(eta=0) agree closely."""
    sched = _sched()
    x0_true = jnp.asarray(
        np.linspace(-0.5, 0.5, 4 * 4).reshape(1, 4, 4, 1), jnp.float32)
    model_fn = _point_mass_model(sched, x0_true, 3)
    key = jax.random.PRNGKey(1)
    shape = x0_true.shape
    a = D.ddim_sample(model_fn, key, shape,
                      D.make_ddim_constants(sched, 100, eta=0.0))
    b = P.dpmpp_sample(model_fn, key, shape,
                       P.make_dpmpp_constants(sched, 100))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_dynamic_rescale_ratio_applied():
    sched = _sched(use_dynamic_rescale=True, base_scale=0.7)
    c = P.make_dpmpp_constants(sched, 25)
    r = np.asarray(c.scale_ratio)
    assert (r != 1.0).any()
    dc = D.make_ddim_constants(sched, 25)
    np.testing.assert_allclose(
        r, np.asarray(dc.scale_prev) / np.asarray(dc.scale), rtol=1e-5)


def test_mask_blend_matches_ddim_semantics():
    """The frame-splice blend must mirror ddim_sample's: masked region pinned
    to q_sample(x0) -> the fixed frames survive in the output."""
    sched = _sched()
    x0_true = jnp.zeros((1, 4, 4, 1), jnp.float32)
    model_fn = _point_mass_model(sched, x0_true, 3)
    fixed = jnp.full((1, 4, 4, 1), 0.25)
    mask = jnp.zeros((1, 4, 4, 1)).at[:, :2].set(1.0)
    out = P.dpmpp_sample(model_fn, jax.random.PRNGKey(0), fixed.shape,
                         P.make_dpmpp_constants(sched, 20),
                         mask=mask, x0=fixed, sched=sched)
    # unmasked half converges to the model's point mass (0); masked half is
    # blended toward `fixed` during sampling but the FINAL update's model
    # call still sees it — the reference semantics return the solver output
    # (virtual_pose_render re-splices pixels afterwards), so just check
    # finiteness + the unmasked target
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out[:, 2:]),
                               np.zeros((1, 2, 4, 1)), atol=0.1)
