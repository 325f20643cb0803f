"""Exact posterior tests — mirrors test/exact_gpr_posterior.jl oracles."""

import jax
import jax.numpy as jnp
import numpy as np

import abstractgps_tpu as agp
import pytest


def _setup(rng, n=10, noise=1e-8):
    x = jnp.asarray(np.sort(rng.standard_normal(n)))
    y = jnp.asarray(np.sin(np.asarray(x)))
    f = agp.GP(agp.Matern32Kernel())
    fx = f(x, noise)
    return f, fx, x, y


def test_posterior_collapses_onto_observations(rng):
    # mean(f_post, x) ≈ y, var ≈ 0 (test/exact_gpr_posterior.jl:21-22)
    f, fx, x, y = _setup(rng)
    p = agp.posterior(fx, y)
    assert np.allclose(p.mean(x), y, atol=1e-5)
    assert np.allclose(p.var(x), 0.0, atol=1e-5)


def test_posterior_closed_form(rng):
    # posterior mean/cov vs the textbook formulas
    f, fx, x, y = _setup(rng, noise=0.1)
    p = agp.posterior(fx, y)
    xt = jnp.linspace(-2.0, 2.0, 7)
    K = np.asarray(f.cov(x)) + 0.1 * np.eye(10)
    Ks = np.asarray(f.cov(x, xt))
    Kss = np.asarray(f.cov(xt))
    Kinv = np.linalg.inv(K)
    m_ref = Ks.T @ Kinv @ np.asarray(y)
    C_ref = Kss - Ks.T @ Kinv @ Ks
    assert np.allclose(p.mean(xt), m_ref, atol=1e-8)
    assert np.allclose(p.cov(xt), C_ref, atol=1e-8)
    assert np.allclose(p.var(xt), np.diag(C_ref), atol=1e-8)
    m, C = p.mean_and_cov(xt)
    assert np.allclose(m, m_ref, atol=1e-8) and np.allclose(C, C_ref, atol=1e-8)
    m, v = p.mean_and_var(xt)
    assert np.allclose(v, np.diag(C_ref), atol=1e-8)
    # cross-covariance
    zt = jnp.linspace(-1.0, 1.5, 5)
    Kz = np.asarray(f.cov(x, zt))
    Cxz_ref = np.asarray(f.cov(xt, zt)) - Ks.T @ Kinv @ Kz
    assert np.allclose(p.cov(xt, zt), Cxz_ref, atol=1e-8)


@pytest.mark.slow
def test_sequential_equals_batch(rng):
    # sequential conditioning ≡ batch, field by field
    # (test/exact_gpr_posterior.jl:29-43)
    f = agp.GP(0.5, agp.SqExponentialKernel())
    x1 = jnp.asarray(rng.standard_normal(6))
    x2 = jnp.asarray(rng.standard_normal(4))
    y1 = jnp.asarray(rng.standard_normal(6))
    y2 = jnp.asarray(rng.standard_normal(4))

    p1 = agp.posterior(f(x1, 0.1), y1)
    p_seq = agp.posterior(p1(x2, 0.2), y2)

    x_all = jnp.concatenate([x1, x2])
    noise_all = jnp.concatenate([jnp.full(6, 0.1), jnp.full(4, 0.2)])
    y_all = jnp.concatenate([y1, y2])
    p_batch = agp.posterior(f(x_all, noise_all), y_all)

    assert np.allclose(p_seq.data.alpha, p_batch.data.alpha, atol=1e-8)
    assert np.allclose(p_seq.data.L, p_batch.data.L, atol=1e-8)
    assert np.allclose(p_seq.data.delta, p_batch.data.delta, atol=1e-10)
    xt = jnp.linspace(-2, 2, 9)
    assert np.allclose(p_seq.mean(xt), p_batch.mean(xt), atol=1e-8)
    assert np.allclose(p_seq.cov(xt), p_batch.cov(xt), atol=1e-8)


def test_posterior_is_abstract_gp(rng, key):
    # posterior-as-GP composition: project, sample, logpdf, re-condition
    f, fx, x, y = _setup(rng, noise=0.1)
    p = agp.posterior(fx, y)
    xt = jnp.linspace(-1, 1, 5)
    pfx = p(xt, 0.01)
    s = pfx.rand(key)
    assert s.shape == (5,)
    lp = pfx.logpdf(s)
    assert np.isfinite(lp)
    p2 = agp.posterior(pfx, s)
    assert isinstance(p2, agp.PosteriorGP)


def test_exact_inference_marker(rng):
    f, fx, x, y = _setup(rng, noise=0.1)
    ei = agp.ExactInference()
    p = agp.posterior(ei, fx, y)
    assert isinstance(p, agp.PosteriorGP)
    assert np.allclose(
        agp.approx_log_evidence(ei, fx, y), fx.logpdf(y), rtol=1e-12
    )


@pytest.mark.slow
def test_posterior_differentiable_hyperparams(rng):
    f, fx, x, y = _setup(rng, noise=0.1)
    xt = jnp.linspace(-1, 1, 5)

    def loss(ell):
        k = agp.with_lengthscale(agp.Matern32Kernel(), ell)
        p = agp.posterior(agp.GP(k)(x, 0.1), y)
        m, v = p.mean_and_var(xt)
        return jnp.sum(m) + jnp.sum(v)

    g = jax.grad(loss)(jnp.array(1.0))
    fd = (loss(jnp.array(1.0 + 1e-6)) - loss(jnp.array(1.0 - 1e-6))) / 2e-6
    assert np.allclose(g, fd, rtol=1e-4)
