"""Sparse VFE/DTC tests — mirrors test/sparse_approximations.jl oracles."""

import jax
import jax.numpy as jnp
import numpy as np

import abstractgps_tpu as agp
import pytest

JITTER = 1e-12


def _setup(rng, n=30, m=10, noise=0.1):
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, n)))
    z = jnp.linspace(-3.0, 3.0, m)
    f = agp.GP(agp.SqExponentialKernel())
    fx = f(x, noise)
    y = jnp.asarray(np.sin(np.asarray(x)) + 0.1 * rng.standard_normal(n))
    return f, fx, x, y, z


def test_sparse_with_inducing_eq_data_matches_exact(rng):
    # (test/sparse_approximations.jl:20-25)
    f, fx, x, y, _ = _setup(rng)
    vfe = agp.VFE(f(x, JITTER))
    p_sparse = agp.posterior(vfe, fx, y)
    p_exact = agp.posterior(fx, y)
    xt = jnp.linspace(-2.5, 2.5, 13)
    assert np.allclose(p_sparse.mean(xt), p_exact.mean(xt), atol=1e-5)
    assert np.allclose(p_sparse.cov(xt), p_exact.cov(xt), atol=1e-5)
    assert np.allclose(p_sparse.var(xt), p_exact.var(xt), atol=1e-5)


def test_elbo_bounds_logpdf(rng):
    # ELBO ≤ logpdf; equality at inducing = data (rtol 1e-5)
    # (test/sparse_approximations.jl:86-101, src/util/TestUtils.jl:213-217)
    f, fx, x, y, z = _setup(rng)
    lp = fx.logpdf(y)
    e_sub = agp.elbo(agp.VFE(f(z, JITTER)), fx, y)
    assert e_sub <= lp + 1e-10
    e_full = agp.elbo(agp.VFE(f(x, JITTER)), fx, y)
    assert np.allclose(e_full, lp, rtol=1e-5, atol=1e-5)


def test_dtc_equals_logpdf_at_inducing_eq_data(rng):
    # (test/sparse_approximations.jl:93-94; atol 1e-6)
    f, fx, x, y, _ = _setup(rng)
    d = agp.DTC(f(x, JITTER))
    assert np.allclose(agp.approx_log_evidence(d, fx, y), fx.logpdf(y), atol=1e-6, rtol=1e-6)


def test_posterior_consistency(rng):
    f, fx, x, y, z = _setup(rng)
    vfe = agp.VFE(f(z, JITTER))
    p = agp.posterior(vfe, fx, y)
    xt = jnp.linspace(-2, 2, 7)
    m, C = p.mean_and_cov(xt)
    assert np.allclose(m, p.mean(xt), atol=1e-10)
    assert np.allclose(C, p.cov(xt), atol=1e-10)
    m2, v = p.mean_and_var(xt)
    assert np.allclose(v, np.diag(np.asarray(C)), atol=1e-8)
    assert np.allclose(v, p.var(xt), atol=1e-10)
    # cross-cov consistency and symmetry
    zt = jnp.linspace(-1, 1, 5)
    assert np.allclose(p.cov(xt, zt), np.asarray(p.cov(zt, xt)).T, atol=1e-10)
    assert np.allclose(p.cov(xt, xt), p.cov(xt), atol=1e-8)
    # PSD
    ev = np.linalg.eigvalsh(np.asarray(p.cov(xt)))
    assert ev.min() > -1e-8
    assert np.allclose(agp.inducing_points(p), agp.as_inputs(z))


def test_update_posterior_new_observations(rng):
    # online ≡ batch for the new-observations path
    # (test/sparse_approximations.jl:32-55)
    f = agp.GP(agp.SqExponentialKernel())
    z = jnp.linspace(-3.0, 3.0, 8)
    x1 = jnp.asarray(np.sort(rng.uniform(-3, 3, 12)))
    x2 = jnp.asarray(np.sort(rng.uniform(-3, 3, 7)))
    y1 = jnp.asarray(rng.standard_normal(12))
    y2 = jnp.asarray(rng.standard_normal(7))

    vfe = agp.VFE(f(z, JITTER))
    p1 = agp.posterior(vfe, f(x1, 0.1), y1)
    p_online = agp.update_posterior(p1, f(x2, 0.1), y2)

    x_all = jnp.concatenate([x1, x2])
    y_all = jnp.concatenate([y1, y2])
    p_batch = agp.posterior(vfe, f(x_all, 0.1), y_all)

    xt = jnp.linspace(-2, 2, 9)
    assert np.allclose(p_online.mean(xt), p_batch.mean(xt), atol=1e-6)
    assert np.allclose(p_online.cov(xt), p_batch.cov(xt), atol=1e-6)
    assert np.allclose(p_online.data.m_eps, p_batch.data.m_eps, atol=1e-6)


@pytest.mark.slow
def test_update_posterior_new_pseudopoints(rng):
    # online ≡ batch for the add-pseudo-points path
    # (test/sparse_approximations.jl:57-84)
    f = agp.GP(agp.SqExponentialKernel())
    z1 = jnp.linspace(-3.0, 3.0, 6)
    z2 = jnp.asarray([-2.2, 0.3, 1.7])
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, 15)))
    y = jnp.asarray(rng.standard_normal(15))

    p1 = agp.posterior(agp.VFE(f(z1, JITTER)), f(x, 0.1), y)
    p_online = agp.update_posterior(p1, f(z2, JITTER))

    z_all = jnp.concatenate([z1, z2])
    p_batch = agp.posterior(agp.VFE(f(z_all, JITTER)), f(x, 0.1), y)

    xt = jnp.linspace(-2, 2, 9)
    assert np.allclose(p_online.mean(xt), p_batch.mean(xt), atol=1e-5)
    assert np.allclose(p_online.cov(xt), p_batch.cov(xt), atol=1e-5)


@pytest.mark.slow
def test_elbo_differentiable(rng):
    f, fx, x, y, z = _setup(rng)

    def neg_elbo(params):
        ell, s2, noise = params
        k = agp.with_lengthscale(agp.SqExponentialKernel(), ell) * s2
        g = agp.GP(k)
        return -agp.elbo(agp.VFE(g(z, JITTER)), g(x, noise), y)

    p0 = jnp.array([1.0, 1.0, 0.1])
    g = jax.grad(neg_elbo)(p0)
    assert np.all(np.isfinite(g))
    for i in range(3):
        e = 1e-6
        pp, pm = p0.at[i].add(e), p0.at[i].add(-e)
        fd = (neg_elbo(pp) - neg_elbo(pm)) / (2 * e)
        assert np.allclose(g[i], fd, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_elbo_dtype_stability(rng):
    # (test/sparse_approximations.jl:103-118)
    for dt in (jnp.float32, jnp.float64):
        x = jnp.asarray(rng.standard_normal(10), dtype=dt)
        y = jnp.asarray(rng.standard_normal(10), dtype=dt)
        z = jnp.asarray(rng.standard_normal(4), dtype=dt)
        f = agp.GP(agp.SqExponentialKernel())
        e = agp.elbo(agp.VFE(f(z, dt(1e-6))), f(x, dt(0.1)), y)
        assert e.dtype == dt
