"""Minimal batched distribution layer for non-Gaussian likelihoods.

The reference leans on Distributions.jl for the LatentGP likelihood map
(src/latent_gp.jl:11-15: ``lik`` maps a latent sample to an observation
Distribution). Here a "distribution" is a small pytree with vectorised
``logpdf(y) -> per-element logpdf array`` and ``sample(key)``; products over
independent elements are just sums of the per-element logpdfs (the
``product_distribution`` pattern in test/ppl/turing.jl:3).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "Normal",
    "MvNormal",
    "Poisson",
    "Bernoulli",
    "Exponential",
    "Gamma",
    "LogNormal",
    "ProductDistribution",
    "product_distribution",
]

_LOG_2PI = math.log(2.0 * math.pi)


def _pytree(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree
@dataclasses.dataclass(frozen=True)
class Normal:
    loc: jax.Array
    scale: jax.Array

    def logpdf(self, y):
        z = (y - self.loc) / self.scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale)

    def sample(self, key):
        shape = jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))
        return self.loc + self.scale * jax.random.normal(key, shape)


@_pytree
@dataclasses.dataclass(frozen=True)
class MvNormal:
    """Multivariate normal over a Cholesky factor.

    ``FiniteGP.to_mvnormal()`` is the analogue of the reference's
    ``convert(MvNormal, fx)`` (src/finite_gp_projection.jl:24-28): a plain
    distribution object decoupled from the GP that produced it.
    """

    loc: jax.Array        # (N,)
    scale_tril: jax.Array  # (N, N) lower Cholesky of the covariance

    def logpdf(self, y):
        """Log density of a vector y, or of each column of a matrix Y —
        the same contract as ``FiniteGP.logpdf``."""
        from .ops.pallas_chol import _logpdf_from_chol

        delta = y - (self.loc if y.ndim == 1 else self.loc[:, None])
        return _logpdf_from_chol(self.scale_tril, delta)

    def sample(self, key, num_samples: int | None = None):
        n = self.loc.shape[0]
        cols = 1 if num_samples is None else num_samples
        xi = jax.random.normal(key, (n, cols), dtype=self.loc.dtype)
        out = self.loc[:, None] + self.scale_tril @ xi
        return out[:, 0] if num_samples is None else out


@_pytree
@dataclasses.dataclass(frozen=True)
class Poisson:
    rate: jax.Array

    def logpdf(self, y):
        return y * jnp.log(self.rate) - self.rate - jax.lax.lgamma(y + 1.0)

    def sample(self, key):
        return jax.random.poisson(key, self.rate).astype(jnp.result_type(self.rate))


@_pytree
@dataclasses.dataclass(frozen=True)
class Bernoulli:
    """Parameterised by logits for numerical stability."""

    logits: jax.Array

    def logpdf(self, y):
        # y log p + (1-y) log(1-p), computed stably from logits
        return y * self.logits - jnp.logaddexp(0.0, self.logits)

    def sample(self, key):
        return jax.random.bernoulli(key, jax.nn.sigmoid(self.logits)).astype(
            jnp.result_type(self.logits)
        )


@_pytree
@dataclasses.dataclass(frozen=True)
class Exponential:
    rate: jax.Array

    def logpdf(self, y):
        return jnp.log(self.rate) - self.rate * y

    def sample(self, key):
        return jax.random.exponential(key, jnp.shape(self.rate)) / self.rate


@_pytree
@dataclasses.dataclass(frozen=True)
class Gamma:
    concentration: jax.Array
    rate: jax.Array

    def logpdf(self, y):
        a, b = self.concentration, self.rate
        return a * jnp.log(b) + (a - 1.0) * jnp.log(y) - b * y - jax.lax.lgamma(a)

    def sample(self, key):
        # draw at the BROADCAST shape of (concentration, rate): a scalar
        # concentration with a vector rate must give independent draws,
        # not one gamma variate rescaled per component
        shape = jnp.broadcast_shapes(jnp.shape(self.concentration),
                                     jnp.shape(self.rate))
        return jax.random.gamma(key, self.concentration, shape) / self.rate


@_pytree
@dataclasses.dataclass(frozen=True)
class LogNormal:
    loc: jax.Array
    scale: jax.Array

    def logpdf(self, y):
        ly = jnp.log(y)
        z = (ly - self.loc) / self.scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale) - ly

    def sample(self, key):
        shape = jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, shape))


@_pytree
@dataclasses.dataclass(frozen=True)
class ProductDistribution:
    """Product of independent scalar distributions → one joint distribution.

    The analogue of Distributions.jl's ``product_distribution`` as used in
    the reference PPL certification (test/ppl/turing.jl:3,37:
    ``y ~ product_distribution([Poisson(λ_i) for λ_i in λ])``). TPU-native
    form: instead of a list of scalar distributions, wrap ONE distribution
    whose parameters are batched arrays (the vectorised layout every
    distribution in this module already supports) — the joint ``logpdf``
    is the sum of the per-element logpdfs and ``sample`` draws the whole
    batch with a single vectorised primitive.
    """

    components: object  # any distribution in this module, batched params

    def logpdf(self, y):
        return jnp.sum(self.components.logpdf(y))

    def sample(self, key):
        return self.components.sample(key)


def product_distribution(components) -> ProductDistribution:
    """``product_distribution(Poisson(rate=λ_vec))`` — joint distribution of
    independent elements (reference: test/ppl/turing.jl:3)."""
    return ProductDistribution(components)
