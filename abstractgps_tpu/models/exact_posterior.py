"""Exact GP-regression posterior with O(n²) sequential (online) updates.

Reference: src/exact_gpr_posterior.jl:1-91. ``posterior(fx, y)`` caches
``(α = C⁻¹δ, L = chol(K + Σy), x, δ = y − m)``; conditioning a posterior on
new data extends the cached Cholesky via the block ``update_chol`` instead of
refactorising (src/exact_gpr_posterior.jl:46-56). The posterior is itself an
AbstractGP, so projection/sampling/logpdf compose recursively.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import covmat
from ..ops.noise import noise_block_diag
from ..ops.precision import precise
from .finite_gp import FiniteGP
from .gp import AbstractGP

__all__ = ["PosteriorGP", "posterior", "ExactInference", "approx_log_evidence_exact"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["alpha", "L", "x", "delta", "noise"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _ExactCache:
    alpha: jax.Array  # C⁻¹ δ, (N,)
    L: jax.Array      # chol(K + Σy), (N, N) lower
    x: jax.Array      # training inputs, (N, D)
    delta: jax.Array  # y − m, (N,)
    noise: object = None  # the Σy noise object (pathwise sampling needs ε ~ N(0, Σy))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["prior", "data"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PosteriorGP(AbstractGP):
    """Exact posterior process (src/exact_gpr_posterior.jl:1-4)."""

    prior: AbstractGP
    data: _ExactCache

    # Internal AbstractGPs API (src/exact_gpr_posterior.jl:58-90)

    @precise
    def mean(self, x):
        # m(x*) + K(x*, X) α  (:60-62)
        return self.prior.mean(x) + self.prior.cov(x, self.data.x) @ self.data.alpha

    @precise
    def cov(self, x, z=None):
        if z is None:
            # K** − Xt_invA_X(C, K(X, x*))  (:64-66)
            K_Xx = self.prior.cov(self.data.x, x)
            return self.prior.cov(x) - covmat.Xt_invA_X(self.data.L, K_Xx)
        # cross-covariance (:72-76)
        K_Xx = self.prior.cov(self.data.x, x)
        K_Xz = self.prior.cov(self.data.x, z)
        return self.prior.cov(x, z) - covmat.Xt_invA_Y(K_Xx, self.data.L, K_Xz)

    @precise
    def var(self, x):
        # diagonal only (:68-70); clamped at 0 against f32 cancellation
        K_Xx = self.prior.cov(self.data.x, x)
        v = self.prior.var(x) - covmat.diag_Xt_invA_X(self.data.L, K_Xx)
        return jnp.maximum(v, 0.0)

    @precise
    def mean_and_cov(self, x):
        # fused: one cross-gram shared between mean and cov (:78-83)
        K_Xx = self.prior.cov(self.data.x, x)
        m = self.prior.mean(x) + K_Xx.T @ self.data.alpha
        C = self.prior.cov(x) - covmat.Xt_invA_X(self.data.L, K_Xx)
        return m, C

    @precise
    def mean_and_var(self, x):
        # fused diagonal variant (:85-90)
        K_Xx = self.prior.cov(self.data.x, x)
        m = self.prior.mean(x) + K_Xx.T @ self.data.alpha
        v = self.prior.var(x) - covmat.diag_Xt_invA_X(self.data.L, K_Xx)
        return m, jnp.maximum(v, 0.0)


@precise
def posterior(fx: FiniteGP, y: jax.Array) -> PosteriorGP:
    """Exact conditioning: ``posterior(fx, y)``.

    Batch path (src/exact_gpr_posterior.jl:29-35); if ``fx.f`` is itself a
    PosteriorGP, the sequential path extends the cached Cholesky via
    ``update_chol`` (src/exact_gpr_posterior.jl:46-56) — identical result to
    batch conditioning on the concatenated data (the reference's tested
    invariant, test/exact_gpr_posterior.jl:29-43).
    """
    if isinstance(fx.f, PosteriorGP):
        return _sequential_posterior(fx, y)
    # routes through the fused gram→Cholesky sweep at TPU scale
    m, L = fx._chol()
    delta = y - m
    alpha = covmat.chol_solve(L, delta)
    return PosteriorGP(fx.f, _ExactCache(alpha, L, fx.x, delta, fx.noise))


@precise
def _sequential_posterior(fx: FiniteGP, y: jax.Array) -> PosteriorGP:
    post: PosteriorGP = fx.f
    prior = post.prior
    x_new = fx.x
    m2 = prior.mean(x_new)
    delta2 = y - m2
    C12 = prior.cov(post.data.x, x_new)
    C22 = fx.noise.add_to(prior.cov(x_new))
    L = covmat.update_chol(post.data.L, C12, C22)
    delta = jnp.concatenate([post.data.delta, delta2])
    alpha = covmat.chol_solve(L, delta)
    x = jnp.concatenate([post.data.x, x_new], axis=0)
    # noise record: exact block-diagonal composition (ops.noise), so the
    # cache keeps pathwise_sample support for every noise type — DenseNoise
    # blocks survive as a block-diagonal DenseNoise rather than being
    # degraded to None. Old caches restored without a noise field stay None.
    noise = (None if post.data.noise is None
             else noise_block_diag(post.data.noise, fx.noise))
    return PosteriorGP(prior, _ExactCache(alpha, L, x, delta, noise))


@dataclasses.dataclass(frozen=True)
class ExactInference:
    """Marker making exact regression a degenerate 'approximation'
    (src/exact_gpr_posterior.jl:6-12): ``posterior(ExactInference(), fx, y)``
    = ``posterior(fx, y)`` and its ``approx_log_evidence`` = ``logpdf``."""

    def posterior(self, fx: FiniteGP, y: jax.Array) -> PosteriorGP:
        return posterior(fx, y)

    def approx_log_evidence(self, fx: FiniteGP, y: jax.Array) -> jax.Array:
        return fx.logpdf(y)


def approx_log_evidence_exact(fx: FiniteGP, y: jax.Array) -> jax.Array:
    return fx.logpdf(y)
