"""Iterative (CG/SLQ) backend vs the dense Cholesky oracle.

Mirrors the reference's equivalence-oracle test style (SURVEY §4.4): every
matrix-free quantity is checked against the dense path on sizes where the
dense path is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import abstractgps_tpu as agp
from abstractgps_tpu.models.iterative import CGInference, cg_logpdf, mbcg
from abstractgps_tpu.ops.matvec import gram_matvec, make_gram_matvec


def _setup(rng, n=192, d=3, noise=0.25):
    x = jnp.asarray(rng.uniform(size=(n, d)))
    f = agp.GP(0.4, 1.7 * agp.with_lengthscale(agp.Matern52Kernel(), 0.9))
    fx = f(x, noise)
    y = jnp.asarray(rng.normal(size=(n,)))
    return f, fx, x, y


def test_gram_matvec_matches_dense(rng):
    f, fx, x, y = _setup(rng, n=150)
    nd = fx.noise.diag()
    K = fx.cov()
    V = jnp.asarray(rng.normal(size=(150, 4)))
    out = gram_matvec(f.kernel, x, nd, V, panel=64)
    np.testing.assert_allclose(out, K @ V, rtol=1e-10, atol=1e-10)
    # vector form + transformed kernel path
    v = V[:, 0]
    np.testing.assert_allclose(
        gram_matvec(f.kernel, x, nd, v, panel=64), K @ v, rtol=1e-10, atol=1e-10
    )


@pytest.mark.slow
def test_mbcg_solves_and_freezes(rng):
    f, fx, x, y = _setup(rng)
    nd = fx.noise.diag()
    mv = make_gram_matvec(f.kernel, x, nd)
    B = jnp.stack([y, jnp.zeros_like(y)], axis=1)  # zero column must stay zero
    X, (alphas, betas, actives) = mbcg(mv, B, max_iters=400, tol=1e-12)
    K = fx.cov()
    np.testing.assert_allclose(X[:, 0], jnp.linalg.solve(K, y), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(X[:, 1], 0.0, atol=0.0)
    assert not bool(actives[0, 1])  # zero rhs never activates
    assert bool(actives[0, 0])


@pytest.mark.slow
def test_cg_logpdf_matches_dense(rng, key):
    f, fx, x, y = _setup(rng)
    exact = float(fx.logpdf(y))
    est = float(
        cg_logpdf(fx, y, key, num_probes=64, max_iters=220, tol=1e-12)
    )
    # solves are exact; only the SLQ logdet is stochastic
    assert abs(est - exact) / abs(exact) < 2e-2
    # quadratic + mean parts exact: compare after removing logdet from both
    K = fx.cov()
    sign, ld = jnp.linalg.slogdet(K)
    quad_exact = exact + 0.5 * float(ld)
    # re-derive the estimator's quad the same way using its own logdet is
    # circular; instead check a matrix-Y column-wise call for shape/agreement
    Y = jnp.stack([y, 0.5 * y], axis=1)
    out = cg_logpdf(fx, Y, key, num_probes=32, max_iters=220, tol=1e-12)
    assert out.shape == (2,)
    dense_cols = fx.logpdf(Y)
    np.testing.assert_allclose(out[0] - out[1], dense_cols[0] - dense_cols[1],
                               rtol=1e-6)  # logdet cancels in the difference


@pytest.mark.slow
def test_cg_logpdf_gradients_match_dense(rng, key):
    """BBMM low-rank backward vs AD through the dense path.

    The quad-term gradient is deterministic (exact up to CG tol); the
    trace-term gradient is Hutchinson-estimated, so compare with a
    statistical tolerance at high probe count."""
    f, fx, x, y = _setup(rng, n=160)

    def dense_loss(log_ell, log_s2, y):
        k = jnp.exp(log_s2) * agp.with_lengthscale(
            agp.Matern52Kernel(), jnp.exp(log_ell))
        return agp.GP(0.4, k)(x, 0.25).logpdf(y)

    def cg_loss(log_ell, log_s2, y):
        k = jnp.exp(log_s2) * agp.with_lengthscale(
            agp.Matern52Kernel(), jnp.exp(log_ell))
        return cg_logpdf(agp.GP(0.4, k)(x, 0.25), y, key,
                         num_probes=256, max_iters=200, tol=1e-12)

    g_d = jax.grad(dense_loss, argnums=(0, 1, 2))(0.1, 0.3, y)
    g_c = jax.grad(cg_loss, argnums=(0, 1, 2))(0.1, 0.3, y)
    # δ-gradient is exact (no stochastic part)
    np.testing.assert_allclose(g_c[2], g_d[2], rtol=1e-6, atol=1e-8)
    for a, b in zip(g_c[:2], g_d[:2]):
        assert abs(a - b) < 0.05 * max(1.0, abs(b))


@pytest.mark.slow
def test_cg_posterior_matches_exact_posterior(rng, key):
    f, fx, x, y = _setup(rng, n=128)
    xs = jnp.asarray(rng.uniform(size=(17, 3)))
    zs = jnp.asarray(rng.uniform(size=(9, 3)))
    p_exact = agp.posterior(fx, y)
    inf = CGInference(max_iters=300, tol=1e-13)
    p_cg = agp.posterior(inf, fx, y)
    np.testing.assert_allclose(p_cg.mean(xs), p_exact.mean(xs),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(p_cg.var(xs), p_exact.var(xs),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(p_cg.cov(xs, zs), p_exact.cov(xs, zs),
                               rtol=1e-6, atol=1e-8)
    m1, c1 = p_cg.mean_and_cov(xs)
    np.testing.assert_allclose(c1, p_exact.cov(xs), rtol=1e-6, atol=1e-8)
    m2, v2 = p_cg.mean_and_var(xs)
    np.testing.assert_allclose(m1, m2, rtol=1e-12)
    np.testing.assert_allclose(v2, jnp.diagonal(c1), rtol=1e-8, atol=1e-10)
    # approx_log_evidence dispatch
    ev = agp.approx_log_evidence(inf, fx, y)
    assert abs(float(ev) - float(fx.logpdf(y))) / abs(float(fx.logpdf(y))) < 3e-2


@pytest.mark.slow
def test_cg_posterior_collapses_onto_observations(rng):
    # test/exact_gpr_posterior.jl:21-22 analogue. At noise 1e-9 the system
    # has κ ~ 1e9 — unpreconditioned CG cannot converge; the pivoted-
    # Cholesky/Woodbury preconditioner is what makes this solvable.
    f, fx, x, y = _setup(rng, n=96, noise=1e-9)
    p = CGInference(max_iters=400, tol=1e-14, precond_rank=96).posterior(fx, y)
    # vs the dense-Cholesky oracle: PCG solves to machine-level accuracy
    p_dense = agp.posterior(fx, y)
    np.testing.assert_allclose(p.mean(x), p_dense.mean(x), atol=1e-6)
    # collapse onto observations, up to the intrinsic σ²·α smoothing
    np.testing.assert_allclose(p.mean(x), y, atol=5e-3)
    assert float(jnp.max(jnp.abs(p.var(x)))) < 1e-4
    # unpreconditioned CG demonstrably CANNOT solve this system
    p_nopc = CGInference(max_iters=400, tol=1e-14, precond_rank=0).posterior(fx, y)
    assert float(jnp.max(jnp.abs(p_nopc.mean(x) - p_dense.mean(x)))) > 1e-5


@pytest.mark.slow
def test_pivoted_cholesky_and_preconditioner(rng):
    from abstractgps_tpu.ops.pivchol import (
        pivoted_cholesky,
        woodbury_preconditioner,
    )

    f, fx, x, y = _setup(rng, n=120)
    K = f.kernel.gram(x)
    # full-rank pivoted Cholesky reproduces K exactly
    Lfull = pivoted_cholesky(f.kernel, x, 120)
    np.testing.assert_allclose(Lfull @ Lfull.T, K, rtol=1e-8, atol=1e-9)
    # truncated factor: monotone trace-norm approximation, PSD residual diag
    L32 = pivoted_cholesky(f.kernel, x, 32)
    resid = jnp.diagonal(K - L32 @ L32.T)
    assert float(jnp.min(resid)) > -1e-10
    assert float(jnp.sum(resid)) < 0.2 * float(jnp.trace(K))
    # Woodbury solve + logdet vs dense
    nd = fx.noise.diag()
    P = L32 @ L32.T + jnp.diag(nd)
    solve, logdet_P, sample = woodbury_preconditioner(L32, nd)
    V = jnp.asarray(rng.normal(size=(120, 3)))
    np.testing.assert_allclose(solve(V), jnp.linalg.solve(P, V),
                               rtol=1e-8, atol=1e-9)
    sign, ld = jnp.linalg.slogdet(P)
    np.testing.assert_allclose(logdet_P, ld, rtol=1e-10)
    # sampler covariance → P (statistical)
    Z = sample(jax.random.PRNGKey(0), 4096)
    emp = Z @ Z.T / Z.shape[1]
    assert float(jnp.max(jnp.abs(emp - P))) < 0.35


@pytest.mark.slow
def test_cg_logpdf_preconditioned_matches_dense(rng, key):
    f, fx, x, y = _setup(rng, n=192, noise=0.01)
    exact = float(fx.logpdf(y))
    est = float(cg_logpdf(fx, y, key, num_probes=64, max_iters=200,
                          tol=1e-12, precond_rank=64))
    assert abs(est - exact) / abs(exact) < 2e-2
    # gradient path compiles and δ-gradient stays exact under preconditioning
    gd = jax.grad(lambda yy: fx.logpdf(yy))(y)
    gc = jax.grad(lambda yy: cg_logpdf(fx, yy, key, num_probes=32,
                                       max_iters=200, tol=1e-12,
                                       precond_rank=64))(y)
    np.testing.assert_allclose(gc, gd, rtol=1e-5, atol=1e-7)


def test_cg_rejects_dense_noise_and_non_gp_prior(rng):
    f, fx, x, y = _setup(rng, n=32)
    S = jnp.eye(32) * 0.3 + 0.01
    fx_dense = f(x, S)
    with pytest.raises(NotImplementedError):
        cg_logpdf(fx_dense, y)
    p = agp.posterior(fx, y)  # PosteriorGP prior, not a kernel GP
    with pytest.raises(NotImplementedError):
        cg_logpdf(p(x, 0.1), y)


@pytest.mark.slow
def test_cg_conformance_internal_interface(rng, key):
    """The CGPosteriorGP passes the same internal-API conformance suite as
    every other AbstractGP (reference src/util/TestUtils.jl:133-218)."""
    from abstractgps_tpu.utils import test_utils as tu

    f, fx, x, y = _setup(rng, n=64)
    p = CGInference(max_iters=200, tol=1e-14).posterior(fx, y)
    z = jnp.asarray(rng.uniform(size=(11, 3)))
    tu.test_internal_abstractgps_interface(key, p, x[:13], z, atol=1e-5)
