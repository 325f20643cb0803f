"""FiniteGP — the finite-dimensional projection of a GP (L3).

Reference: src/finite_gp_projection.jl:1-339. A FiniteGP is the multivariate
normal ``f(x) + ε``, ``ε ~ N(0, Σy)``; it implements the Primary Public API
(rand / logpdf / marginals / mean / var / posterior) and the Secondary API
(cov / mean_and_cov) exactly as the reference's three-tier contract
(docs/src/api.md:49-133).

Everything here is pure-functional and jit-safe: sampling takes an explicit
``jax.random`` key; the Cholesky factorisation of ``cov(fx)`` is the single
O(N³) hot spot (src/finite_gp_projection.jl:308) and routes through
``ops.covmat.cholesky_lower`` → ``lax.linalg.cholesky`` or the Pallas blocked
factorisation.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import covmat
from ..ops.noise import Noise, as_noise
from ..ops.precision import precise
from .gp import AbstractGP

__all__ = [
    "FiniteGP",
    "rand",
    "logpdf",
    "loglikelihood",
    "marginals",
    "sqmahal",
    "gradlogpdf",
]

_LOG_2PI = math.log(2.0 * math.pi)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["f", "x", "noise"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class FiniteGP:
    """``FiniteGP(f, x, Σy)`` (src/finite_gp_projection.jl:7-11)."""

    f: AbstractGP
    x: jax.Array  # (N, D)
    noise: Noise

    @staticmethod
    def create(f: AbstractGP, x: jax.Array, noise=None) -> "FiniteGP":
        """Normalising constructor: scalar/vector/matrix/None noise
        (src/finite_gp_projection.jl:13-21; default σ² = 1e-18)."""
        return FiniteGP(f, x, as_noise(noise, x.shape[0]))

    def __len__(self) -> int:
        return self.x.shape[0]

    # -- moments (src/finite_gp_projection.jl:53-158) ----------------------

    def mean(self) -> jax.Array:
        return self.f.mean(self.x)

    @precise
    def cov(self, other: "FiniteGP | None" = None) -> jax.Array:
        if other is not None:
            # cross-covariance between two projections of the same process
            # (src/finite_gp_projection.jl:177-180)
            return self.f.cov(self.x, other.x)
        return self.noise.add_to(self.f.cov(self.x))

    @precise
    def var(self) -> jax.Array:
        return self.f.var(self.x) + self.noise.diag()

    @precise
    def mean_and_cov(self):
        m, C = self.f.mean_and_cov(self.x)
        return m, self.noise.add_to(C)

    @precise
    def mean_and_var(self):
        m, v = self.f.mean_and_var(self.x)
        return m, v + self.noise.diag()

    def marginals(self):
        """Per-point Normal marginals as (means, stds) — never forms the
        off-diagonal (src/finite_gp_projection.jl:203-206)."""
        m, v = self.mean_and_var()
        return m, jnp.sqrt(v)

    # -- internals ----------------------------------------------------------

    def _fused_gram_args(self):
        """The single gate for the TPU fused gram→Cholesky paths.

        Returns ``(kernel, nd)`` when this projection qualifies (kernel-based
        GP prior, diagonal-structured noise, TPU + f32 + large N), else None.
        Both ``_chol`` and ``logpdf`` route through this so the policy cannot
        drift between them.
        """
        from ..ops import pallas_chol
        from ..ops.noise import DenseNoise
        from .gp import GP

        if isinstance(self.f, GP) and not isinstance(self.noise, DenseNoise):
            nd = self.noise.diag().astype(self.x.dtype)
            if pallas_chol.should_use_fused_gram(self.x, nd):
                return self.f.kernel, nd
        return None

    @precise
    def _chol(self):
        """(mean, chol(cov)) — the O(N³) hot spot.

        For a kernel-based prior with diagonal-structured noise at TPU
        scale, this routes through the fused gram→Cholesky sweep
        (ops/pallas_chol.cholesky_gram): the N×N covariance is built
        panel-by-panel inside the factorization and never written to HBM.
        """
        from ..ops import pallas_chol

        fused = self._fused_gram_args()
        if fused is not None:
            kernel, nd = fused
            m = self.f.mean(self.x)
            return m, pallas_chol.cholesky_gram(kernel, self.x, nd)
        m, C = self.mean_and_cov()
        return m, covmat.cholesky_lower(C)

    # -- sampling (src/finite_gp_projection.jl:233-277) ---------------------

    @precise
    def rand(self, key: jax.Array, num_samples: int | None = None) -> jax.Array:
        """Joint samples. ``None`` → (N,) vector; int n → (N, n) matrix,
        matching ``rand(rng, fx[, N])``. Uses ``m + L·ξ`` (the reference's
        ``m .+ C.U' * randn`` with U' = L)."""
        m, L = self._chol()
        n = m.shape[0]
        cols = 1 if num_samples is None else num_samples
        xi = jax.random.normal(key, (n, cols), dtype=m.dtype)
        out = m[:, None] + L @ xi
        return out[:, 0] if num_samples is None else out

    # -- densities (src/finite_gp_projection.jl:302-339) --------------------

    @precise
    def logpdf(self, y: jax.Array) -> jax.Array:
        """Log density of a vector y, or of each column of a matrix Y
        (src/finite_gp_projection.jl:306-311).

        On the TPU fused path this is a single custom-VJP op
        (ops/pallas_chol.gram_logpdf_core): forward = gram→Cholesky sweep
        with K never hitting HBM; backward = the closed-form
        ``∂logpdf/∂K = ½(ααᵀ − K⁻¹)`` instead of the generic Cholesky
        pullback — the hot rule under hyperparameter MCMC/MLE (§3.5).
        """
        from ..ops import pallas_chol

        fused = self._fused_gram_args()
        if fused is not None:
            kernel, nd = fused
            m = self.f.mean(self.x)
            delta = y - (m if y.ndim == 1 else m[:, None])
            return pallas_chol.gram_logpdf_core(kernel, self.x, nd, delta)
        m, L = self._chol()
        n = y.shape[0]
        quad = _sqmahal(m, L, y)
        return -0.5 * ((n * _LOG_2PI + covmat.logdet_from_chol(L)) + quad)

    @precise
    def loglikelihood(self, Y: jax.Array) -> jax.Array:
        """Sum of per-column logpdfs (src/finite_gp_projection.jl:304)."""
        return jnp.sum(self.logpdf(Y))

    @precise
    def logdetcov(self) -> jax.Array:
        _, L = self._chol()
        return covmat.logdet_from_chol(L)

    @precise
    def sqmahal(self, y: jax.Array) -> jax.Array:
        """Squared Mahalanobis distance (src/finite_gp_projection.jl:315-326)."""
        m, L = self._chol()
        return _sqmahal(m, L, y)

    @precise
    def gradlogpdf(self, y: jax.Array) -> jax.Array:
        """∇_y log p(y) = Σ⁻¹(m − y) (src/finite_gp_projection.jl:332-337)."""
        m, L = self._chol()
        return covmat.chol_solve(L, m - y)

    @precise
    def invcov(self) -> jax.Array:
        """Precision matrix (src/finite_gp_projection.jl:98)."""
        _, L = self._chol()
        n = L.shape[0]
        return covmat.chol_solve(L, jnp.eye(n, dtype=L.dtype))

    def params(self):
        """(f, x, Σy) (src/finite_gp_projection.jl:339)."""
        return self.f, self.x, self.noise

    @precise
    def to_mvnormal(self):
        """Decouple into a plain MvNormal distribution — the reference's
        ``convert(MvNormal, fx)`` (src/finite_gp_projection.jl:24-28)."""
        from ..distributions import MvNormal

        m, L = self._chol()
        return MvNormal(m, L)

    # -- inference ----------------------------------------------------------

    def posterior(self, y: jax.Array):
        from .exact_posterior import posterior

        return posterior(self, y)


def _sqmahal(m: jax.Array, L: jax.Array, y: jax.Array) -> jax.Array:
    """tr/diag Xt_invA_X dispatch on vector vs. matrix y
    (src/finite_gp_projection.jl:325-326)."""
    if y.ndim == 1:
        return covmat.tr_Xt_invA_X(L, y - m)
    return covmat.diag_Xt_invA_X(L, y - m[:, None])


# ---------------------------------------------------------------------------
# Reference-named free functions
# ---------------------------------------------------------------------------


def rand(key: jax.Array, fx: FiniteGP, num_samples: int | None = None) -> jax.Array:
    return fx.rand(key, num_samples)


def logpdf(fx: FiniteGP, y: jax.Array) -> jax.Array:
    return fx.logpdf(y)


def loglikelihood(fx: FiniteGP, Y: jax.Array) -> jax.Array:
    return fx.loglikelihood(Y)


def marginals(fx: FiniteGP):
    return fx.marginals()


def sqmahal(fx: FiniteGP, y: jax.Array) -> jax.Array:
    return fx.sqmahal(y)


def gradlogpdf(fx: FiniteGP, y: jax.Array) -> jax.Array:
    return fx.gradlogpdf(y)
