"""Fused Pallas norm kernels: parity vs the fp32-island reference (interpret
mode on CPU) including gradients via the custom-vjp fallback."""
import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.kernels import norms as NK


def test_fused_group_norm_matches_reference():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 8, 8, 64), jnp.float32) * 2 + 1
    w = jax.random.normal(jax.random.PRNGKey(1), (64,)) + 1
    b = jax.random.normal(jax.random.PRNGKey(2), (64,))
    out = NK.fused_group_norm(x, w, b, 8, 1e-5)
    ref = NK._gn_reference(x, w, b, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_group_norm_bf16():
    x = (jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 32)) * 3).astype(jnp.bfloat16)
    w = jnp.ones((32,))
    b = jnp.zeros((32,))
    out = NK.fused_group_norm(x, w, b, 4, 1e-5)
    ref = NK._gn_reference(x, w, b, 4, 1e-5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_fused_group_norm_video_rank():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 4, 4, 32))
    w = jnp.ones((32,)); b = jnp.zeros((32,))
    out = NK.fused_group_norm(x, w, b, 4, 1e-5)
    ref = NK._gn_reference(x, w, b, 4, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_group_norm_grads():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 4, 16))
    w = jnp.ones((16,)); b = jnp.zeros((16,))

    gf = jax.grad(lambda x, w, b: jnp.sum(jnp.sin(NK.fused_group_norm(x, w, b, 4, 1e-5))),
                  argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lambda x, w, b: jnp.sum(jnp.sin(NK._gn_reference(x, w, b, 4, 1e-5))),
                  argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


def test_fused_layer_norm_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 64, 96)) * 2
    w = jax.random.normal(jax.random.PRNGKey(7), (96,)) + 1
    b = jax.random.normal(jax.random.PRNGKey(8), (96,))
    out = NK.fused_layer_norm(x, w, b, 1e-5)
    ref = NK._ln_reference(x, w, b, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_layer_norm_grads():
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 32))
    w = jnp.ones((32,)); b = jnp.zeros((32,))
    gf = jax.grad(lambda x: jnp.sum(NK.fused_layer_norm(x, w, b, 1e-5) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(NK._ln_reference(x, w, b, 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4)


def test_fits_predicates():
    assert NK.group_norm_fits(jnp.zeros((2, 40, 64, 320), jnp.bfloat16))
    assert not NK.group_norm_fits(jnp.zeros((1, 320, 512, 128), jnp.float32))  # VAE-sized
    assert NK.layer_norm_fits(jnp.zeros((32, 2560, 320), jnp.bfloat16))
    assert not NK.layer_norm_fits(jnp.zeros((2, 7, 320)))  # 7 rows: no 8-divisor
