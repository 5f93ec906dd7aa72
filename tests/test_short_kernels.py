"""Correctness tests for the short-attention and fused-GEGLU Pallas kernels
(interpret mode on CPU; the TPU path compiles the same kernel bodies)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mudg_tpu.kernels.mlp import fused_geglu_ff, geglu_ff_eligible, _ff_math
from mudg_tpu.kernels.short_attention import (
    packed_short_attention,
    packed_short_attention_eligible,
    short_kv_attention,
    short_kv_attention_eligible,
)


def _dense(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("b,t,h,d", [(16, 16, 2, 64), (8, 4, 4, 64), (4, 8, 4, 128)])
def test_packed_short_attention_matches_dense(b, t, h, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, h, d), jnp.float32)
    assert packed_short_attention_eligible(q)
    out = packed_short_attention(q, k, v)
    ref = _dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_short_attention_grad_matches_dense():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (8, 16, 1, 64), jnp.float32)
    k = jax.random.normal(ks[1], (8, 16, 1, 64), jnp.float32)
    v = jax.random.normal(ks[2], (8, 16, 1, 64), jnp.float32)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) ** 2)

    g1 = jax.grad(lambda *a: loss(packed_short_attention, *a), (0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: loss(_dense, *a), (0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


@pytest.mark.parametrize("lq,lk", [(512, 93), (256, 16), (512, 128), (256, 640)])
def test_short_kv_attention_matches_dense(lq, lk):
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    b, h, d = 3, 2, 64
    q = jax.random.normal(ks[0], (b, lq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h, d), jnp.float32)
    assert short_kv_attention_eligible(q, k)
    out = short_kv_attention(q, k, v)
    ref = _dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_eligibility_gates():
    q = jnp.zeros((4, 16, 2, 64))
    assert packed_short_attention_eligible(q)
    assert not packed_short_attention_eligible(jnp.zeros((4, 13, 2, 64)))
    assert not packed_short_attention_eligible(jnp.zeros((4, 16, 2, 80)))
    assert not short_kv_attention_eligible(jnp.zeros((1, 300, 2, 64)),
                                           jnp.zeros((1, 93, 2, 64)))
    assert short_kv_attention_eligible(jnp.zeros((1, 512, 2, 64)),
                                       jnp.zeros((1, 93, 2, 64)))


@pytest.mark.parametrize("m,c", [(512, 320), (256, 64)])
def test_fused_geglu_matches_math(m, c):
    inner = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    x = jax.random.normal(ks[0], (2, m // 2, c), jnp.float32) * 0.5
    w1 = jax.random.normal(ks[1], (c, 2 * inner), jnp.float32) * (c ** -0.5)
    b1 = jax.random.normal(ks[2], (2 * inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (inner, c), jnp.float32) * (inner ** -0.5)
    b2 = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1
    # production eligibility is bf16-only (VMEM envelope); the kernel body
    # itself is dtype-generic, so numerics are checked in f32
    assert geglu_ff_eligible(x.astype(jnp.bfloat16), w1)
    assert not geglu_ff_eligible(x, w1)
    out = fused_geglu_ff(x, w1, b1, w2, b2)
    ref = _ff_math(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=2e-5)


def test_fused_geglu_grad_matches_math():
    m, c = 256, 64
    inner = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(4), 5)
    args = [
        jax.random.normal(ks[0], (m, c), jnp.float32) * 0.5,
        jax.random.normal(ks[1], (c, 2 * inner), jnp.float32) * (c ** -0.5),
        jax.random.normal(ks[2], (2 * inner,), jnp.float32) * 0.1,
        jax.random.normal(ks[3], (inner, c), jnp.float32) * (inner ** -0.5),
        jax.random.normal(ks[4], (c,), jnp.float32) * 0.1,
    ]

    g1 = jax.grad(lambda *a: jnp.sum(fused_geglu_ff(*a) ** 2), tuple(range(5)))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(_ff_math(*a) ** 2), tuple(range(5)))(*args)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


def test_blockdiag_small_attend_matches_dense():
    """XLA block-diagonal packed tiny-T attention (attention.py) is exactly
    the per-sequence softmax."""
    from mudg_tpu.nn.attention import _blockdiag_small_attend

    for b, t, h, d in [(16, 16, 2, 64), (8, 4, 4, 32)]:
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
        k = jax.random.normal(ks[1], (b, t, h, d), jnp.float32)
        v = jax.random.normal(ks[2], (b, t, h, d), jnp.float32)
        out = _blockdiag_small_attend(q, k, v, d ** -0.5)
        ref = _dense(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
