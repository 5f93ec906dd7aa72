"""KL VAE: shapes (f=8 spatial reduction), round-trip, chunked video scan."""
import jax
import jax.numpy as jnp
import numpy as np

from mudg_tpu.nn import vae as V


def tiny_cfg():
    return V.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)


def test_encode_decode_shapes():
    cfg = tiny_cfg()
    params = V.init_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    post = V.encode_moments(params, cfg, x)
    # ch_mult of len 2 => f=2 downsampling
    assert post.mean.shape == (2, 8, 8, 4)
    z = V.encode(params, cfg, x)
    y = V.decode(params, cfg, z)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_full_cfg_is_f8():
    cfg = V.VAEConfig(ch=32, num_res_blocks=1)  # full ch_mult (1,2,4,4)
    params = V.init_vae(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 32, 32, 3))
    z = V.encode(params, cfg, x)
    assert z.shape == (1, 4, 4, 4)  # 32/8


def test_video_chunked_matches_full():
    cfg = tiny_cfg()
    params = V.init_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16, 16, 3))
    z1 = V.encode_video(params, cfg, x, chunk=1)
    z4 = V.encode_video(params, cfg, x, chunk=4)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z4), atol=1e-5)
    y1 = V.decode_video(params, cfg, z1, chunk=1)
    y2 = V.decode_video(params, cfg, z1, chunk=2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    assert y1.shape == x.shape


def test_scale_factor_applied():
    cfg = tiny_cfg()
    params = V.init_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 3))
    post = V.encode_moments(params, cfg, x)
    z = V.encode(params, cfg, x)  # deterministic => mode * scale
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(post.mode() * cfg.scale_factor), atol=1e-6
    )
