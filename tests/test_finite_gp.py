"""FiniteGP tests — mirrors test/finite_gp_projection.jl patterns."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

import abstractgps_tpu as agp
import pytest


def _fx(rng, n=11, noise=0.1, mean=None):
    x = jnp.asarray(rng.standard_normal(n))
    f = agp.GP(mean, agp.SqExponentialKernel()) if mean is not None else agp.GP(
        agp.SqExponentialKernel()
    )
    return f(x, noise), x


def test_moments_against_kernelmatrix(rng):
    fx, x = _fx(rng)
    K = agp.kernelmatrix(agp.SqExponentialKernel(), x)
    assert np.allclose(fx.mean(), np.zeros(11))
    assert np.allclose(fx.cov(), K + 0.1 * np.eye(11), atol=1e-12)
    assert np.allclose(fx.var(), np.diag(K) + 0.1, atol=1e-12)
    m, C = fx.mean_and_cov()
    assert np.allclose(m, fx.mean())
    assert np.allclose(C, fx.cov())
    m, v = fx.mean_and_var()
    assert np.allclose(v, fx.var())


def test_noise_forms(rng):
    x = jnp.asarray(rng.standard_normal(5))
    f = agp.GP(agp.Matern52Kernel())
    K = np.asarray(agp.kernelmatrix(agp.Matern52Kernel(), x))
    # isotropic
    assert np.allclose(f(x, 0.3).cov(), K + 0.3 * np.eye(5), atol=1e-12)
    # heteroscedastic vector
    s = rng.random(5)
    assert np.allclose(f(x, jnp.asarray(s)).cov(), K + np.diag(s), atol=1e-12)
    # dense correlated
    A = rng.standard_normal((5, 5))
    S = A @ A.T
    assert np.allclose(f(x, jnp.asarray(S)).cov(), K + S, atol=1e-12)
    # default jitter
    assert np.allclose(f(x).cov(), K + 1e-18 * np.eye(5), atol=1e-20)


def test_logpdf_vs_scipy(rng):
    fx, _ = _fx(rng, mean=1.5)
    y = jnp.asarray(rng.standard_normal(11))
    m, C = fx.mean_and_cov()
    ref = scipy.stats.multivariate_normal(np.asarray(m), np.asarray(C)).logpdf(
        np.asarray(y)
    )
    assert np.allclose(fx.logpdf(y), ref, rtol=1e-10)


def test_logpdf_matrix_columns(rng):
    fx, _ = _fx(rng)
    Y = jnp.asarray(rng.standard_normal((11, 3)))
    lps = fx.logpdf(Y)
    assert lps.shape == (3,)
    for j in range(3):
        assert np.allclose(lps[j], fx.logpdf(Y[:, j]), rtol=1e-10)
    assert np.allclose(fx.loglikelihood(Y), np.sum(lps), rtol=1e-10)


def test_marginals(rng):
    fx, _ = _fx(rng)
    m, s = fx.marginals()
    assert np.allclose(m, fx.mean())
    assert np.allclose(s, np.sqrt(fx.var()))


def test_rand_shapes(key, rng):
    fx, _ = _fx(rng)
    assert fx.rand(key).shape == (11,)
    assert fx.rand(key, 3).shape == (11, 3)


def test_rand_statistics(key, rng):
    # sample moments → analytic (test/finite_gp_projection.jl:84-104)
    fx, _ = _fx(rng, n=4, noise=0.5)
    S = fx.rand(key, 100_000)
    m_emp = np.mean(np.asarray(S), axis=1)
    C_emp = np.cov(np.asarray(S))
    assert np.allclose(m_emp, fx.mean(), atol=1e-2)
    assert np.allclose(C_emp, fx.cov(), atol=2e-2)


def test_sqmahal_and_gradlogpdf(rng):
    fx, _ = _fx(rng)
    y = jnp.asarray(rng.standard_normal(11))
    m, C = fx.mean_and_cov()
    Cinv = np.linalg.inv(np.asarray(C))
    d = np.asarray(y - m)
    assert np.allclose(fx.sqmahal(y), d @ Cinv @ d, rtol=1e-8)
    assert np.allclose(fx.gradlogpdf(y), Cinv @ (np.asarray(m) - np.asarray(y)), rtol=1e-6, atol=1e-8)
    assert np.allclose(fx.invcov(), Cinv, rtol=1e-6, atol=1e-8)
    assert np.allclose(fx.logdetcov(), np.linalg.slogdet(np.asarray(C))[1], rtol=1e-10)
    # gradlogpdf consistency with jax.grad of logpdf
    g = jax.grad(lambda y_: fx.logpdf(y_))(y)
    assert np.allclose(g, fx.gradlogpdf(y), rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_logpdf_gradients_finite_diff(rng):
    # AD correctness vs central differences (test/finite_gp_projection.jl:152-178)
    x = jnp.asarray(rng.standard_normal(7))
    y = jnp.asarray(rng.standard_normal(7))

    def lp(xv, yv, s2):
        return agp.GP(agp.SqExponentialKernel())(xv, s2).logpdf(yv)

    for argnum in range(3):
        args = [x, y, jnp.array(0.33)]
        g = jax.grad(lp, argnums=argnum)(*args)
        eps = 1e-6
        flat = np.atleast_1d(np.asarray(args[argnum], dtype=np.float64))
        g_flat = np.atleast_1d(np.asarray(g))
        for i in range(flat.size):
            ap = [np.asarray(a, dtype=np.float64).copy() for a in args]
            am = [np.asarray(a, dtype=np.float64).copy() for a in args]
            np.reshape(ap[argnum], -1)[i] += eps
            np.reshape(am[argnum], -1)[i] -= eps
            fd = (lp(*[jnp.asarray(a) for a in ap]) - lp(*[jnp.asarray(a) for a in am])) / (2 * eps)
            assert np.allclose(g_flat.reshape(-1)[i], fd, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_rand_gradients_finite_diff(rng):
    """Gradients THROUGH sampling: AD of a scalar functional of
    ``fx.rand(key)`` wrt inputs and hyperparameters vs central differences
    (test/finite_gp_projection.jl:105-127 FD-checks the rand pullback).
    With the key fixed, rand is the deterministic reparameterized map
    θ, x → m(x) + L(θ, x)·ξ — the path VI-through-sampling and pathwise
    training differentiate."""
    key = jax.random.PRNGKey(7)
    x = jnp.asarray(rng.standard_normal((6, 2)))
    xi_probe = jnp.asarray(rng.standard_normal(6))  # fixed contraction

    def draw(xv, ell, s2, noise):
        k = s2 * agp.with_lengthscale(agp.SqExponentialKernel(), ell)
        fx = agp.GP(k)(xv, noise)
        # nonlinear functional so FD probes L's full pullback, not a sum
        return jnp.sum(jnp.cos(fx.rand(key)) * xi_probe)

    args = [x, jnp.array(0.8), jnp.array(1.3), jnp.array(0.2)]
    for argnum in range(4):
        g = np.atleast_1d(np.asarray(jax.grad(draw, argnums=argnum)(*args)))
        flat = np.atleast_1d(np.asarray(args[argnum], np.float64))
        eps = 1e-6
        for i in range(flat.size):
            ap = [np.asarray(a, np.float64).copy() for a in args]
            am = [np.asarray(a, np.float64).copy() for a in args]
            np.reshape(ap[argnum], -1)[i] += eps
            np.reshape(am[argnum], -1)[i] -= eps
            fd = (draw(*[jnp.asarray(a) for a in ap])
                  - draw(*[jnp.asarray(a) for a in am])) / (2 * eps)
            np.testing.assert_allclose(g.reshape(-1)[i], fd,
                                       rtol=1e-4, atol=1e-6)


def test_zero_gradient_at_mean(rng):
    # grad of logpdf wrt y is zero at y = mean (test/finite_gp_projection.jl:170-178)
    x = jnp.asarray(rng.standard_normal(7))
    fx = agp.GP(2.0, agp.SqExponentialKernel())(x, 0.5)
    g = jax.grad(lambda y: fx.logpdf(y))(fx.mean())
    assert np.allclose(g, 0.0, atol=1e-10)


@pytest.mark.slow
def test_dtype_stability(rng):
    # Float32 and Float64 parametric tests (test/finite_gp_projection.jl:180-191)
    for dt in (jnp.float32, jnp.float64):
        x = jnp.asarray(rng.standard_normal(6), dtype=dt)
        y = jnp.asarray(rng.standard_normal(6), dtype=dt)
        fx = agp.GP(agp.SqExponentialKernel())(x, dt(0.1))
        assert fx.logpdf(y).dtype == dt
        assert fx.rand(jax.random.PRNGKey(0)).dtype == dt
        assert fx.mean_and_var()[1].dtype == dt


def test_jit_logpdf(rng):
    fx, x = _fx(rng)
    y = jnp.asarray(rng.standard_normal(11))
    fast = jax.jit(lambda fx_, y_: fx_.logpdf(y_))
    assert np.allclose(fast(fx, y), fx.logpdf(y), rtol=1e-12)


def test_cross_cov(rng):
    x1 = jnp.asarray(rng.standard_normal(5))
    x2 = jnp.asarray(rng.standard_normal(8))
    f = agp.GP(agp.Matern32Kernel())
    expected = agp.kernelmatrix(agp.Matern32Kernel(), x1, x2)
    assert np.allclose(f(x1).cov(f(x2)), expected, atol=1e-12)


@pytest.mark.slow
def test_to_mvnormal(rng):
    # convert(MvNormal, fx) parity (src/finite_gp_projection.jl:24-28)
    x = jnp.asarray(rng.standard_normal(9))
    y = jnp.asarray(rng.standard_normal(9))
    fx = agp.GP(0.3, agp.Matern52Kernel())(x, 0.2)
    mvn = fx.to_mvnormal()
    assert np.allclose(float(mvn.logpdf(y)), float(fx.logpdf(y)), rtol=1e-10)
    Y = jnp.asarray(rng.standard_normal((9, 4)))
    assert np.allclose(
        np.asarray(mvn.logpdf(Y)), np.asarray(fx.logpdf(Y)), rtol=1e-10
    )
    s = mvn.sample(jax.random.PRNGKey(0))
    assert s.shape == (9,)
    S = mvn.sample(jax.random.PRNGKey(0), 4)
    assert S.shape == (9, 4)


@pytest.mark.slow
def test_to_mvnormal_million_sample_battery(key):
    # The reference runs Distributions.jl's full MvNormal conformance with
    # 10^6 samples (test/finite_gp_projection.jl:202); this is the
    # equivalent statistical battery on to_mvnormal(): moments, marginal
    # quantiles, and logpdf consistency, all at 10^6 draws.
    from scipy.stats import norm as scipy_norm

    n, S = 12, 1_000_000
    x = jnp.linspace(0.0, 3.0, n)
    f = agp.GP(0.5, 1.3 * agp.with_lengthscale(agp.Matern52Kernel(), 0.8))
    fx = f(x, 0.2)
    d = fx.to_mvnormal()

    mu = np.asarray(fx.mean())
    C = np.asarray(fx.cov())
    sd = np.sqrt(np.diag(C))

    Y = np.asarray(d.sample(key, S))  # (n, S)
    assert Y.shape == (n, S)

    # --- moments: sample mean within 6 mc-sigma, covariance elementwise ---
    se_mean = sd / np.sqrt(S)
    np.testing.assert_array_less(np.abs(Y.mean(axis=1) - mu), 6 * se_mean)
    Cs = np.cov(Y)
    # var(s_ij) ~ (C_ii C_jj + C_ij^2)/S — bound all entries at 6 sigma
    se_cov = np.sqrt((np.outer(np.diag(C), np.diag(C)) + C**2) / S)
    np.testing.assert_array_less(np.abs(Cs - C), 6 * se_cov)

    # --- marginal quantiles at 2.5/50/97.5% for three coordinates ---
    for i in (0, n // 2, n - 1):
        for q in (0.025, 0.5, 0.975):
            emp = np.quantile(Y[i], q)
            want = scipy_norm.ppf(q, loc=mu[i], scale=sd[i])
            # quantile standard error: sqrt(q(1-q)/S)/pdf(want)
            se = np.sqrt(q * (1 - q) / S) / scipy_norm.pdf(
                want, loc=mu[i], scale=sd[i]
            )
            assert abs(emp - want) < 6 * se, (i, q, emp, want)

    # --- logpdf consistency: E[logpdf(Y)] = -(H = entropy) -----------------
    L = np.linalg.cholesky(C)
    entropy = 0.5 * (n * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(L)))
                     + n)
    lps = np.asarray(d.logpdf(jnp.asarray(Y)))
    assert lps.shape == (S,)
    # var(logpdf) = var(0.5 chi2_n)/... = n/2
    se_lp = np.sqrt(n / 2.0 / S)
    assert abs(lps.mean() + entropy) < 6 * se_lp, (lps.mean(), -entropy)
    # and the library logpdf agrees with scipy on a handful of draws
    from scipy.stats import multivariate_normal

    ref = multivariate_normal(mean=mu, cov=C).logpdf(Y[:, :5].T)
    np.testing.assert_allclose(lps[:5], ref, rtol=1e-9)
