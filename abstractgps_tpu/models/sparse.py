"""Sparse approximations: Titsias VFE and Seeger DTC (L4).

Reference: src/sparse_approximations.jl:1-313. The whitened cache
``(m_ε, Λ_ε, U, α, b_y, B_εf, x, Σy)`` (reference :58-75) is kept with lower
Cholesky factors (``U ↦ L_z``, ``Λ_ε.U ↦ L_Λ``); every solve below is the
lower-triangular counterpart of the reference's upper-triangular op
(``U' \\ X ↦ L⁻¹X``, ``U \\ X ↦ L⁻ᵀX``).

Online updates are supported for both new observations (rank-k update of
Λ_ε; reference :87-119) and new pseudo-points (two block Cholesky
extensions; reference :130-176).

One deliberate divergence: when appending pseudo-points the reference forms
``C22 = cov(prior, z)`` *without* the inducing jitter (:138), which breaks
the update≡batch invariant for non-negligible jitter; we include
``fz.noise`` so the invariant holds exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import covmat
from ..ops.noise import Noise, noise_block_diag
from ..ops.precision import precise
from .finite_gp import FiniteGP, _LOG_2PI
from .gp import AbstractGP

__all__ = [
    "VFE",
    "DTC",
    "ApproxPosteriorGP",
    "posterior_vfe",
    "update_posterior",
    "elbo",
    "approx_log_evidence",
    "inducing_points",
]


@partial(jax.tree_util.register_dataclass, data_fields=["fz"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class VFE:
    """Variational Free Energy approximation (Titsias 2009);
    src/sparse_approximations.jl:12-14. ``fz`` is the inducing-point
    projection ``f(z, jitter)``."""

    fz: FiniteGP

    def posterior(self, fx: FiniteGP, y: jax.Array) -> "ApproxPosteriorGP":
        return posterior_vfe(self, fx, y)

    def approx_log_evidence(self, fx: FiniteGP, y: jax.Array) -> jax.Array:
        return elbo(self, fx, y)


@partial(jax.tree_util.register_dataclass, data_fields=["fz"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class DTC:
    """Deterministic Training Conditional (Seeger 2003);
    src/sparse_approximations.jl:17-23. Same posterior as VFE, different
    ``approx_log_evidence``."""

    fz: FiniteGP

    def posterior(self, fx: FiniteGP, y: jax.Array) -> "ApproxPosteriorGP":
        return posterior_vfe(self, fx, y)

    def approx_log_evidence(self, fx: FiniteGP, y: jax.Array) -> jax.Array:
        dtc_objective, _ = _compute_intermediates(fx, y, self.fz)
        return dtc_objective


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["m_eps", "L_Lambda", "L_z", "alpha", "b_y", "B_ef", "x", "Sigma_y"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _SparseCache:
    m_eps: jax.Array     # (m,)   whitened posterior mean
    L_Lambda: jax.Array  # (m, m) chol(B B' + I), lower
    L_z: jax.Array       # (m, m) chol(Kzz + jitter), lower
    alpha: jax.Array     # (m,)   L_z⁻ᵀ m_ε
    b_y: jax.Array       # (N,)   noise-whitened residual
    B_ef: jax.Array      # (m, N) whitened cross-covariance
    x: jax.Array         # (N, D) training inputs
    Sigma_y: Noise


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["approx", "prior", "data"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ApproxPosteriorGP(AbstractGP):
    """Approximate posterior process (src/sparse_approximations.jl:25-29)."""

    approx: VFE | DTC
    prior: AbstractGP
    data: _SparseCache

    def _A(self, x):
        """``A = L_z⁻¹ K(z, x*)`` — the shared whitened cross-gram
        (reference ``f.data.U' \\ cov(prior, z, x)``)."""
        return covmat.solve_lower(
            self.data.L_z, self.prior.cov(inducing_points(self), x)
        )

    # Internal AbstractGPs API (src/sparse_approximations.jl:183-217)

    @precise
    def mean(self, x):
        return self.prior.mean(x) + self.prior.cov(x, inducing_points(self)) @ self.data.alpha

    @precise
    def cov(self, x, z=None):
        if z is None:
            A = self._A(x)
            return (
                self.prior.cov(x)
                - covmat.At_A(A)
                + covmat.Xt_invA_X(self.data.L_Lambda, A)
            )
        A_zx = self._A(x)
        A_zy = self._A(z)
        return (
            self.prior.cov(x, z)
            - A_zx.T @ A_zy
            + covmat.Xt_invA_Y(A_zx, self.data.L_Lambda, A_zy)
        )

    @precise
    def var(self, x):
        A = self._A(x)
        v = (
            self.prior.var(x)
            - covmat.diag_At_A(A)
            + covmat.diag_Xt_invA_X(self.data.L_Lambda, A)
        )
        # clamped at 0 against f32 cancellation
        return jnp.maximum(v, 0.0)

    @precise
    def mean_and_cov(self, x):
        A = self._A(x)
        m = self.prior.mean(x) + A.T @ self.data.m_eps
        C = self.prior.cov(x) - covmat.At_A(A) + covmat.Xt_invA_X(self.data.L_Lambda, A)
        return m, C

    @precise
    def mean_and_var(self, x):
        A = self._A(x)
        m = self.prior.mean(x) + A.T @ self.data.m_eps
        v = (
            self.prior.var(x)
            - covmat.diag_At_A(A)
            + covmat.diag_Xt_invA_X(self.data.L_Lambda, A)
        )
        return m, jnp.maximum(v, 0.0)


def inducing_points(f: ApproxPosteriorGP) -> jax.Array:
    """src/sparse_approximations.jl:219."""
    return f.approx.fz.x


@precise
def posterior_vfe(approx: VFE | DTC, fx: FiniteGP, y: jax.Array) -> ApproxPosteriorGP:
    """Optimal approximate posterior (src/sparse_approximations.jl:58-75)."""
    fz = approx.fz
    L_z = covmat.cholesky_lower(fz.cov())           # chol(Kzz + jitter)
    Kxz = fx.cov(fz)                                # (N, m)
    B_ef = covmat.solve_lower(L_z, fx.noise.solve_sqrt(Kxz).T)  # (m, N)
    b_y = fx.noise.solve_sqrt(y - fx.mean())        # (N,)
    m = B_ef.shape[0]
    D = B_ef @ B_ef.T + jnp.eye(m, dtype=B_ef.dtype)
    L_Lambda = covmat.cholesky_lower(D)
    m_eps = covmat.chol_solve(L_Lambda, B_ef @ b_y)
    alpha = covmat.solve_upper(L_z, m_eps)
    cache = _SparseCache(m_eps, L_Lambda, L_z, alpha, b_y, B_ef, fx.x, fx.noise)
    return ApproxPosteriorGP(approx, fx.f, cache)


@precise
def update_posterior(f_post: ApproxPosteriorGP, fx_or_fz: FiniteGP, y=None) -> ApproxPosteriorGP:
    """Online update of a sparse posterior.

    - ``update_posterior(post, fx, y)``: append new observations, keeping
      the pseudo-points (src/sparse_approximations.jl:87-119).
    - ``update_posterior(post, fz)``: append new pseudo-points
      (src/sparse_approximations.jl:130-176).
    """
    if y is None:
        return _update_posterior_pseudopoints(f_post, fx_or_fz)
    return _update_posterior_observations(f_post, fx_or_fz, y)


def _update_posterior_observations(
    f_post: ApproxPosteriorGP, fx: FiniteGP, y: jax.Array
) -> ApproxPosteriorGP:
    data = f_post.data
    z = inducing_points(f_post)

    Sigma_y = noise_block_diag(data.Sigma_y, fx.noise)
    b_y = jnp.concatenate([data.b_y, fx.noise.solve_sqrt(y - fx.mean())])

    Kxz_new = f_post.prior.cov(fx.x, z)             # (N2, m)
    B2 = covmat.solve_lower(data.L_z, fx.noise.solve_sqrt(Kxz_new).T)  # (m, N2)
    B_ef = jnp.concatenate([data.B_ef, B2], axis=1)

    # Rank-N2 update of Λ_ε (reference loops lowrankupdate! per column, :109-111)
    L_Lambda = covmat.lowrank_update_chol(data.L_Lambda, B2)

    m_eps = covmat.chol_solve(L_Lambda, B_ef @ b_y)
    alpha = covmat.solve_upper(data.L_z, m_eps)
    x = jnp.concatenate([data.x, fx.x], axis=0)

    cache = _SparseCache(m_eps, L_Lambda, data.L_z, alpha, b_y, B_ef, x, Sigma_y)
    return ApproxPosteriorGP(f_post.approx, f_post.prior, cache)


def _update_posterior_pseudopoints(
    f_post: ApproxPosteriorGP, fz: FiniteGP
) -> ApproxPosteriorGP:
    data = f_post.data
    prior = f_post.prior
    z_old = inducing_points(f_post)
    z = fz.x
    m2 = z.shape[0]

    C12 = prior.cov(z_old, z)
    C22 = fz.noise.add_to(prior.cov(z))  # reference omits the jitter here (:138)
    L_z = covmat.update_chol(data.L_z, C12, C22)
    L21 = L_z[-m2:, :-m2]   # = U12'
    L22 = L_z[-m2:, -m2:]   # = U22'

    B1 = data.B_ef
    Cu2f = prior.cov(z, data.x)          # (m2, N)
    # Cu2f · U_y⁻¹ = (L_y⁻¹ Cu2f')'
    Cu2f_w = data.Sigma_y.solve_sqrt(Cu2f.T).T
    B2 = covmat.solve_lower(L22, Cu2f_w - L21 @ B1)  # (m2, N)
    B_ef = jnp.concatenate([B1, B2], axis=0)

    L_Lambda = covmat.update_chol(
        data.L_Lambda, B1 @ B2.T, B2 @ B2.T + jnp.eye(m2, dtype=B2.dtype)
    )

    m_eps = covmat.chol_solve(L_Lambda, B_ef @ data.b_y)
    alpha = covmat.solve_upper(L_z, m_eps)

    z_new = jnp.concatenate([z_old, z], axis=0)
    fz_new = FiniteGP.create(
        f_post.approx.fz.f, z_new, noise_block_diag(f_post.approx.fz.noise, fz.noise)
    )
    approx_new = type(f_post.approx)(fz_new)

    cache = _SparseCache(
        m_eps, L_Lambda, L_z, alpha, data.b_y, B_ef, data.x, data.Sigma_y
    )
    return ApproxPosteriorGP(approx_new, prior, cache)


# ---------------------------------------------------------------------------
# Objectives (src/sparse_approximations.jl:248-313)
# ---------------------------------------------------------------------------


@precise
def _compute_intermediates(fx: FiniteGP, y: jax.Array, fz: FiniteGP):
    """Shared DTC-objective assembly (src/sparse_approximations.jl:289-305)."""
    n = y.shape[0]
    Kxz = fx.cov(fz)                                 # (N, m)
    L_z = covmat.cholesky_lower(fz.cov())
    A = covmat.solve_lower(L_z, fx.noise.solve_sqrt(Kxz).T)   # (m, N)
    m = A.shape[0]
    L_Lambda = covmat.cholesky_lower(A @ A.T + jnp.eye(m, dtype=A.dtype))
    delta = fx.noise.solve_sqrt(y - fx.mean())

    tmp = (
        fx.noise.logdet()
        + covmat.logdet_from_chol(L_Lambda)
        + jnp.sum(jnp.square(delta))
        - jnp.sum(jnp.square(covmat.solve_lower(L_Lambda, A @ delta)))
    )
    dtc_objective = -0.5 * (n * _LOG_2PI + tmp)
    return dtc_objective, A


def approx_log_evidence(approx, fx: FiniteGP, y: jax.Array) -> jax.Array:
    """Dispatch on approximation type (VFE ELBO / DTC objective /
    ExactInference → logpdf)."""
    return approx.approx_log_evidence(fx, y)


@precise
def elbo(vfe: VFE, fx: FiniteGP, y: jax.Array) -> jax.Array:
    """Titsias ELBO (src/sparse_approximations.jl:248-254):
    ``dtc_objective − (tr(Cf Σy⁻¹) − ‖A‖²_F) / 2``."""
    dtc_objective, A = _compute_intermediates(fx, y, vfe.fz)
    trace_term = fx.noise.tr_solve(fx.f.var(fx.x)) - jnp.sum(jnp.square(A))
    return dtc_objective - 0.5 * trace_term
