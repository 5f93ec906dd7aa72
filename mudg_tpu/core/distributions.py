"""Diagonal Gaussian posterior used by the KL VAE.

Functional analog of lvdm/distributions.py:24-95. The posterior is just a
(mean, logvar) pair; sampling/KL/NLL are pure functions so they compose with
jit/vmap/scan without object state.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray  # clamped to [-30, 20] like the reference

    @staticmethod
    def from_moments(moments: jnp.ndarray) -> "DiagonalGaussian":
        """Split a 2C-channel (last axis) moments tensor into mean/logvar."""
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None) -> jnp.ndarray:
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean**2 + self.var - 1.0 - self.logvar, axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        logtwopi = jnp.log(2.0 * jnp.pi)
        axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var, axis=axes
        )
