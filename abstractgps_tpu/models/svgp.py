"""Stochastic variational GP — minibatched inducing-point ELBO (SVGP).

The reference's VFE bound is *collapsed* (optimal q(u) eliminated
analytically, src/sparse_approximations.jl:248-305), so every ELBO
evaluation touches all N points. This module adds the uncollapsed bound
(Hensman et al. 2013) the TPU-scale configs need (SURVEY §2.2 "VI / ELBO
optimizer — minibatched stochastic ELBO for the 50k-point config"): an
explicit whitened variational distribution

    ε = L_zz⁻¹ u,   q(ε) = N(m, C Cᵀ)          (C lower-triangular)

whose ELBO decomposes over data points, so a minibatch gives an unbiased
estimator at O(B·M² + M³) per step regardless of N. Everything is one
jitted scan step: gram slices, whitening solves and the KL all ride the MXU.

Link back to the reference (the oracle test): for Gaussian likelihood the
optimal (m, C) are closed-form — ``optimal_variational_params`` — and
plugging them into ``svgp_elbo`` on the full batch recovers the collapsed
VFE bound ``elbo(VFE(fz), fx, y)`` (src/sparse_approximations.jl:248-254)
exactly. Predictions from ``SVGPPosterior`` with those parameters match
``posterior(VFE(fz), fx, y)``.

Non-Gaussian likelihoods (the LatentGP analogue, src/latent_gp.jl:11-50)
use Gauss–Hermite quadrature over the per-point marginals
(``svgp_elbo_quadrature``) — the standard SVGP classification/count setup.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.base import Kernel
from ..means import as_mean, mean_vector
from ..ops import covmat
from ..ops.distance import as_inputs
from ..ops.noise import as_noise
from ..ops.precision import precise
from .gp import AbstractGP

__all__ = [
    "SVGP",
    "SVGPPosterior",
    "svgp_init",
    "svgp_elbo",
    "svgp_elbo_quadrature",
    "svgp_posterior",
    "optimal_variational_params",
    "set_variational",
    "gauss_hermite_expectation",
    "fit_svgp",
    "natgrad_step",
    "fit_svgp_natgrad",
]

DEFAULT_INDUCING_JITTER = 1e-6


def _tril_from_raw(C_raw: jax.Array) -> jax.Array:
    """Lower-triangular with softplus-positive diagonal (so chol-like C is
    unconstrained-optimizable; same bijector family as params.positive)."""
    lower = jnp.tril(C_raw, -1)
    diag = jax.nn.softplus(jnp.diagonal(C_raw))
    return lower + jnp.diag(diag)


def _raw_from_tril(C: jax.Array) -> jax.Array:
    """Inverse of ``_tril_from_raw`` for a C with strictly positive diag."""
    d = jnp.diagonal(C)
    inv_sp = d + jnp.log(-jnp.expm1(-d))
    return jnp.tril(C, -1) + jnp.diag(inv_sp)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["mean_fn", "kernel", "z", "m", "C_raw", "jitter"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class SVGP:
    """Whitened stochastic variational GP state (one trainable pytree).

    Fields: prior mean function + kernel, inducing locations ``z`` (M, D),
    whitened variational mean ``m`` (M,) and raw lower factor ``C_raw``
    (M, M); ``jitter`` stabilises chol(Kzz) (reference inducing projections
    carry explicit jitter, e.g. examples/0-intro-1d/script.jl:382).
    All fields are data → optax trains hyperparameters, inducing locations
    and variational parameters jointly in one step.
    """

    mean_fn: object
    kernel: Kernel
    z: jax.Array
    m: jax.Array
    C_raw: jax.Array
    jitter: jax.Array

    @property
    def num_inducing(self) -> int:
        return self.z.shape[0]

    @property
    def C(self) -> jax.Array:
        return _tril_from_raw(self.C_raw)

    # -- whitened projection pieces ----------------------------------------

    def _Lz(self):
        Kzz = covmat.add_jitter(self.kernel.gram(self.z), self.jitter)
        return covmat.cholesky_lower(Kzz)

    def _A(self, Lz, x):
        """``A = L_zz⁻¹ K(z, x)`` — (M, B) whitened cross-gram."""
        return covmat.solve_lower(Lz, self.kernel.cross(self.z, x))

    @precise
    def predict(self, x, full_cov: bool = False):
        """Marginal posterior q(f(x)) = N(μ, Σ) under the current q(ε)."""
        x = as_inputs(x)
        Lz = self._Lz()
        A = self._A(Lz, x)
        mu = mean_vector(self.mean_fn, x) + A.T @ self.m
        CtA = self.C.T @ A
        if full_cov:
            K = self.kernel.gram(x)
            cov = K - A.T @ A + CtA.T @ CtA
            return mu, covmat.symmetrize(cov)
        kdiag = self.kernel.diag(x)
        var = kdiag - jnp.sum(jnp.square(A), axis=0) + jnp.sum(jnp.square(CtA), axis=0)
        return mu, jnp.maximum(var, 0.0)

    @precise
    def kl(self) -> jax.Array:
        """KL(q(ε) ‖ N(0, I)) — the whitened prior, so no Kzz solves."""
        C = self.C
        M = self.m.shape[0]
        logdet_S = 2.0 * jnp.sum(jnp.log(jnp.diagonal(C)))
        tr_S = jnp.sum(jnp.square(C))
        return 0.5 * (tr_S + jnp.dot(self.m, self.m) - M - logdet_S)


def svgp_init(kernel: Kernel, z, mean_fn=None, jitter=DEFAULT_INDUCING_JITTER) -> SVGP:
    """Fresh SVGP with q(ε) = N(0, I) (i.e. q(f) = prior at the start)."""
    z = as_inputs(z)
    M = z.shape[0]
    dt = jnp.result_type(z.dtype, jnp.float32)
    return SVGP(
        mean_fn=as_mean(mean_fn),
        kernel=kernel,
        z=z,
        m=jnp.zeros((M,), dt),
        C_raw=_raw_from_tril(jnp.eye(M, dtype=dt)),
        jitter=jnp.asarray(jitter, dt),
    )


def set_variational(svgp: SVGP, m: jax.Array, C: jax.Array) -> SVGP:
    """Return a copy with whitened variational params (m, C); C must be
    lower-triangular with positive diagonal."""
    return dataclasses.replace(svgp, m=m, C_raw=_raw_from_tril(C))


# ---------------------------------------------------------------------------
# ELBOs
# ---------------------------------------------------------------------------


@precise
def svgp_elbo(svgp: SVGP, x, y: jax.Array, noise, n_total: int | None = None):
    """Uncollapsed ELBO, Gaussian likelihood, closed-form expectations.

    ``noise`` is scalar/vector/Noise as in FiniteGP. With ``n_total`` given
    and ``len(x) == B < n_total``, the data term is scaled by ``n_total/B``
    — the unbiased minibatch estimator (the batch must be uniformly drawn).
    """
    x = as_inputs(x)
    B = x.shape[0]
    sig2 = as_noise(noise, B).diag()
    mu, var_f = svgp.predict(x)
    resid = y - mu
    # E_q log N(y | f, σ²) = log N(y | μ, σ²) − var_f / (2σ²)
    ell = -0.5 * (jnp.log(2.0 * jnp.pi * sig2) + jnp.square(resid) / sig2) - var_f / (
        2.0 * sig2
    )
    scale = 1.0 if n_total is None else n_total / B
    return scale * jnp.sum(ell) - svgp.kl()


def gauss_hermite_expectation(log_lik, mu, var, y, num_points: int = 20):
    """``E_{f ~ N(mu, var)}[log_lik(f, y)]`` per point by Gauss–Hermite.

    ``log_lik(f, y)`` must broadcast elementwise. Nodes/weights are baked at
    trace time (static ``num_points``), so the whole expectation is a fixed
    (Q, B) elementwise block — VPU-friendly, no data-dependent control flow.
    """
    t, w = np.polynomial.hermite.hermgauss(num_points)
    t = jnp.asarray(t, mu.dtype)  # (Q,)
    w = jnp.asarray(w / math.sqrt(math.pi), mu.dtype)
    f = mu[None, :] + jnp.sqrt(2.0 * jnp.maximum(var, 0.0))[None, :] * t[:, None]
    vals = log_lik(f, y[None, :])
    return w @ vals  # (B,)


@precise
def svgp_elbo_quadrature(
    svgp: SVGP,
    x,
    y: jax.Array,
    log_lik,
    n_total: int | None = None,
    num_points: int = 20,
):
    """Uncollapsed ELBO for a non-Gaussian likelihood ``log_lik(f, y)``
    (e.g. Poisson: ``y * f - exp(f) - gammaln(y + 1)``), expectations by
    Gauss–Hermite quadrature. The SVGP analogue of LatentGP inference
    (src/latent_gp.jl:48-50 supplies the same pointwise log-density)."""
    x = as_inputs(x)
    B = x.shape[0]
    mu, var_f = svgp.predict(x)
    ell = gauss_hermite_expectation(log_lik, mu, var_f, y, num_points)
    scale = 1.0 if n_total is None else n_total / B
    return scale * jnp.sum(ell) - svgp.kl()


# ---------------------------------------------------------------------------
# Posterior-as-GP wrapper + the collapsed-bound oracle
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["svgp"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class SVGPPosterior(AbstractGP):
    """The variational posterior process as an AbstractGP, so the standard
    projection machinery (FiniteGP, rand, logpdf, plotting) composes with
    it — posteriors-are-GPs, the reference's key architectural idea
    (src/exact_gpr_posterior.jl:1-3)."""

    svgp: SVGP

    def mean(self, x):
        mu, _ = self.svgp.predict(x)
        return mu

    @precise
    def cov(self, x, z=None):
        if z is None:
            _, S = self.svgp.predict(x, full_cov=True)
            return S
        sv = self.svgp
        Lz = sv._Lz()
        Ax, Az = sv._A(Lz, as_inputs(x)), sv._A(Lz, as_inputs(z))
        CtAx, CtAz = sv.C.T @ Ax, sv.C.T @ Az
        return sv.kernel.cross(as_inputs(x), as_inputs(z)) - Ax.T @ Az + CtAx.T @ CtAz

    def var(self, x):
        _, v = self.svgp.predict(x)
        return v

    def mean_and_var(self, x):
        # one predict call = one chol(Kzz) + one cross-gram solve (the
        # AbstractGP default would pay both twice)
        return self.svgp.predict(x)

    def mean_and_cov(self, x):
        return self.svgp.predict(x, full_cov=True)


def svgp_posterior(svgp: SVGP) -> SVGPPosterior:
    return SVGPPosterior(svgp)


@precise
def optimal_variational_params(svgp: SVGP, x, y: jax.Array, noise):
    """Closed-form optimal whitened (m, C) for Gaussian likelihood.

    With ``Ā = A · diag(1/σ)`` and ``ỹ = (y − prior_mean)/σ``:
    ``S* = (I + Ā Āᵀ)⁻¹``, ``m* = S* Ā ỹ``. Substituting collapses the
    bound onto the reference's VFE elbo
    (src/sparse_approximations.jl:289-305: Λ_ε = chol(ĀĀᵀ + I) is the same
    matrix) — used as the oracle test tying SVGP to the reference.
    """
    x = as_inputs(x)
    n = x.shape[0]
    sig = jnp.sqrt(as_noise(noise, n).diag())
    Lz = svgp._Lz()
    A = svgp._A(Lz, x) / sig[None, :]
    yt = (y - mean_vector(svgp.mean_fn, x)) / sig
    M = A.shape[0]
    Lam = covmat.cholesky_lower(A @ A.T + jnp.eye(M, dtype=A.dtype))
    # S* = Λ⁻ᵀ Λ⁻¹  ⇒  C* = L(S*) ; m* = S* A ỹ
    inv_Lam = covmat.solve_lower(Lam, jnp.eye(M, dtype=A.dtype))
    S = inv_Lam.T @ inv_Lam
    m = S @ (A @ yt)
    C = covmat.cholesky_lower(covmat.symmetrize(S))
    return m, C


# ---------------------------------------------------------------------------
# Natural gradients on the variational distribution
# ---------------------------------------------------------------------------


def _elbo_mS(svgp: SVGP, m, S, x, y, noise, n_total, log_lik, num_points):
    """The ELBO as an explicit function of the whitened moments (m, S) —
    the parameterization the natural-gradient step differentiates. Mirrors
    ``svgp_elbo``/``svgp_elbo_quadrature`` exactly (S enters only through
    ``diag(Aᵀ S A)``, ``tr S`` and ``logdet S``)."""
    x = as_inputs(x)
    B = x.shape[0]
    Lz = svgp._Lz()
    A = svgp._A(Lz, x)
    mu = mean_vector(svgp.mean_fn, x) + A.T @ m
    var_f = jnp.maximum(
        svgp.kernel.diag(x)
        - jnp.sum(jnp.square(A), axis=0)
        + jnp.sum(A * (S @ A), axis=0),
        0.0,
    )
    if log_lik is None:
        sig2 = as_noise(noise, B).diag()
        ell = (
            -0.5 * (jnp.log(2.0 * jnp.pi * sig2) + jnp.square(y - mu) / sig2)
            - var_f / (2.0 * sig2)
        )
    else:
        ell = gauss_hermite_expectation(log_lik, mu, var_f, y, num_points)
    Mi = m.shape[0]
    L_S = covmat.cholesky_lower(covmat.symmetrize(S))
    kl = 0.5 * (
        jnp.trace(S)
        + jnp.dot(m, m)
        - Mi
        - 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_S)))
    )
    scale = 1.0 if n_total is None else n_total / B
    return scale * jnp.sum(ell) - kl


@precise
def natgrad_step(
    svgp: SVGP,
    x,
    y: jax.Array,
    noise=None,
    *,
    lr: float = 0.1,
    n_total: int | None = None,
    log_lik=None,
    num_points: int = 20,
) -> SVGP:
    """One natural-gradient ascent step on the variational distribution.

    Natural gradients (Amari; Salimbeni et al. 2018 for SVGP) follow the
    ELBO's gradient in the exponential-family natural parameters
    ``θ₁ = S⁻¹m, θ₂ = −½S⁻¹``, which equals the ordinary gradient taken
    with respect to the expectation parameters ``ξ₁ = m, ξ₂ = S + mmᵀ``:

        dL/dξ₁ = dL/dm − 2 (dL/dS) m,   dL/dξ₂ = dL/dS
        θ ← θ + lr · dL/dξ ;  recover  S = −½ θ₂⁻¹,  m = S θ₁

    For Gaussian likelihood on the full batch the ELBO is quadratic in ξ,
    so ``lr=1`` jumps to the exact optimum in ONE step (the closed form of
    ``optimal_variational_params``) — the oracle test. In general use
    lr≈0.01–0.1 alternated with Adam on hyperparameters/inducing points;
    convergence is typically far faster than Adam on ``C_raw``. All the
    extra linear algebra is M×M (chol + solves) — MXU-bound.
    """
    m0, C0 = svgp.m, svgp.C
    S0 = covmat.symmetrize(C0 @ C0.T)
    dt = m0.dtype

    gm, gS = jax.grad(
        lambda m, S: _elbo_mS(svgp, m, S, x, y, noise, n_total, log_lik, num_points),
        argnums=(0, 1),
    )(m0, S0)
    gS = covmat.symmetrize(gS)

    dxi1 = gm - 2.0 * gS @ m0
    dxi2 = gS

    eye = jnp.eye(m0.shape[0], dtype=dt)
    theta1 = covmat.chol_solve(C0, m0)          # S⁻¹ m
    inv_S = covmat.chol_solve(C0, eye)
    theta2 = -0.5 * inv_S

    theta1 = theta1 + lr * dxi1
    theta2 = theta2 + lr * dxi2

    # recover moments; P = −2θ₂ must stay SPD (guaranteed at small lr, and
    # exactly for lr<=1 with Gaussian likelihood); a failed chol surfaces as
    # NaN — the library-wide failure policy (SURVEY §5)
    P = covmat.symmetrize(-2.0 * theta2)
    L_P = covmat.cholesky_lower(P)
    S_new = covmat.chol_solve(L_P, eye)
    m_new = covmat.chol_solve(L_P, theta1)
    C_new = covmat.cholesky_lower(covmat.symmetrize(S_new))
    return set_variational(svgp, m_new, C_new)


def fit_svgp_natgrad(
    key: jax.Array,
    svgp: SVGP,
    x,
    y: jax.Array,
    noise=None,
    *,
    batch_size: int,
    steps: int,
    natgrad_lr: float = 0.1,
    hyper_lr: float = 1e-2,
    log_lik=None,
    num_points: int = 20,
    train_inducing: bool = True,
):
    """Alternating trainer: natural-gradient step on (m, C), Adam step on
    the inducing locations — the standard fast SVGP recipe. Whole loop is
    one jitted ``lax.scan``; returns ``(fitted_svgp, elbo_trace)``.

    Kernel/mean hyperparameters are frozen for the same sign-safety reason
    as ``fit_svgp``; wrap in a constrained parameter pytree for joint MLE.
    """
    import optax
    from jax import lax

    x = as_inputs(x)
    n = x.shape[0]
    opt = optax.adam(hyper_lr)
    jitter0, z0 = svgp.jitter, svgp.z
    noise_vec = (jnp.asarray(noise).ndim == 1) if noise is not None else False

    def hyper_loss(sv, xb, yb, nb):
        if log_lik is None:
            return -svgp_elbo(sv, xb, yb, nb, n_total=n)
        return -svgp_elbo_quadrature(
            sv, xb, yb, log_lik, n_total=n, num_points=num_points
        )

    def step(carry, k):
        sv, opt_state = carry
        idx = jax.random.randint(k, (batch_size,), 0, n)
        xb, yb = x[idx], y[idx]
        # per-point (heteroscedastic) noise must be sliced WITH the batch
        nb = jnp.asarray(noise)[idx] if noise_vec else noise
        sv = natgrad_step(
            sv, xb, yb, nb,
            lr=natgrad_lr, n_total=n, log_lik=log_lik, num_points=num_points,
        )
        l, g = jax.value_and_grad(hyper_loss)(sv, xb, yb, nb)
        updates, opt_state = opt.update(g, opt_state)
        new = optax.apply_updates(sv, updates)
        new = dataclasses.replace(
            new,
            jitter=jitter0,
            z=new.z if train_inducing else z0,
            kernel=sv.kernel,
            mean_fn=sv.mean_fn,
            m=sv.m,
            C_raw=sv.C_raw,  # variational params owned by the natgrad step
        )
        return (new, opt_state), -l

    @jax.jit
    def run(sv, keys):
        (sv, _), trace = lax.scan(step, (sv, opt.init(sv)), keys)
        return sv, trace

    return run(svgp, jax.random.split(key, steps))


# ---------------------------------------------------------------------------
# Minibatch training loop
# ---------------------------------------------------------------------------


def fit_svgp(
    key: jax.Array,
    svgp: SVGP,
    x,
    y: jax.Array,
    noise,
    *,
    batch_size: int,
    steps: int,
    learning_rate: float = 1e-2,
    log_lik=None,
    num_points: int = 20,
    train_inducing: bool = True,
    train_hyper: bool = False,
):
    """Adam on the negative stochastic ELBO; whole loop is ONE jitted scan.

    Trains the variational parameters (m, C) and, with ``train_inducing``,
    the inducing locations. Minibatches are drawn uniformly with replacement
    inside the compiled step — no host round-trips. ``noise`` is held fixed.

    Kernel/mean hyperparameters are frozen by default: kernel pytrees store
    their parameters in model space, where a raw Adam step can cross zero
    (negative variance → NaN Cholesky). Pass ``train_hyper=True`` only with
    a sign-safe parameterization (e.g. hyperparameters produced from
    ``params.positive`` raw leaves inside a FunctionTransform/custom kernel);
    for general joint MLE-II + VI, optimise a tagged parameter pytree that
    rebuilds the SVGP, as the examples do (the ParameterHandling.jl pattern,
    examples/1-mauna-loa/script.jl:70-97).

    For non-Gaussian observations pass ``log_lik(f, y)`` (quadrature path).
    Returns ``(fitted_svgp, elbo_trace)`` with the per-step minibatch ELBO.
    """
    import optax
    from jax import lax

    x = as_inputs(x)
    n = x.shape[0]
    opt = optax.adam(learning_rate)
    jitter0, z0 = svgp.jitter, svgp.z

    noise_vec = (jnp.asarray(noise).ndim == 1) if noise is not None else False

    def loss(sv, xb, yb, nb):
        if log_lik is None:
            return -svgp_elbo(sv, xb, yb, nb, n_total=n)
        return -svgp_elbo_quadrature(
            sv, xb, yb, log_lik, n_total=n, num_points=num_points
        )

    def step(carry, k):
        sv, opt_state = carry
        idx = jax.random.randint(k, (batch_size,), 0, n)
        # per-point (heteroscedastic) noise must be sliced WITH the batch
        nb = jnp.asarray(noise)[idx] if noise_vec else noise
        l, g = jax.value_and_grad(loss)(sv, x[idx], y[idx], nb)
        updates, opt_state = opt.update(g, opt_state)
        new = optax.apply_updates(sv, updates)
        # jitter is a stabiliser, never a trainable; z/hyper only if requested
        new = dataclasses.replace(
            new,
            jitter=jitter0,
            z=new.z if train_inducing else z0,
            kernel=new.kernel if train_hyper else sv.kernel,
            mean_fn=new.mean_fn if train_hyper else sv.mean_fn,
        )
        return (new, opt_state), -l

    @jax.jit
    def run(sv, keys):
        (sv, _), trace = lax.scan(step, (sv, opt.init(sv)), keys)
        return sv, trace

    return run(svgp, jax.random.split(key, steps))
