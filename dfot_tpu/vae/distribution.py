"""Diagonal Gaussian posterior for KL autoencoders (channel-last).

Functional port of the reference's DiagonalGaussianDistribution
(algorithms/vae/common/distribution.py): parameters are (mean | logvar)
concatenated along the channel (last) axis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DiagonalGaussian"]


class DiagonalGaussian(NamedTuple):
    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_parameters(cls, parameters: jax.Array) -> "DiagonalGaussian":
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        return cls(mean, jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jax.Array:
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> jax.Array:
        """KL divergence, summed over all non-batch axes -> (B,)."""
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var, axis=axes
        )

    @classmethod
    def cat(cls, dists, axis: int = 0) -> "DiagonalGaussian":
        return cls(
            jnp.concatenate([d.mean for d in dists], axis=axis),
            jnp.concatenate([d.logvar for d in dists], axis=axis),
        )
