"""SVGP (uncollapsed minibatch ELBO) vs the reference-anchored collapsed VFE.

The key oracle: with the closed-form optimal whitened variational
parameters, the uncollapsed bound equals the collapsed VFE elbo
(src/sparse_approximations.jl:248-254) and the SVGP posterior equals the
VFE posterior — the same equivalence style the reference tests use
(test/sparse_approximations.jl:20-25, src/util/TestUtils.jl:213-217).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import gammaln

import abstractgps_tpu as agp
from abstractgps_tpu.models.svgp import (
    gauss_hermite_expectation,
    optimal_variational_params,
    set_variational,
    svgp_elbo,
    svgp_elbo_quadrature,
    svgp_init,
    svgp_posterior,
    fit_svgp,
    fit_svgp_natgrad,
)


@pytest.fixture()
def setup(rng):
    n, m, d = 60, 12, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    z = jnp.asarray(rng.uniform(size=(m, d)))
    y = jnp.asarray(rng.normal(size=(n,)))
    kern = 1.3 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.5)
    return x, z, y, kern


@pytest.mark.slow
def test_optimal_params_recover_collapsed_vfe(setup):
    x, z, y, kern = setup
    noise = 0.25
    sv = svgp_init(kern, z, jitter=1e-10)
    m_opt, C_opt = optimal_variational_params(sv, x, y, noise)
    sv_opt = set_variational(sv, m_opt, C_opt)
    got = svgp_elbo(sv_opt, x, y, noise)

    f = agp.GP(kern)
    want = agp.elbo(agp.VFE(f(z, 1e-10)), f(x, noise), y)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-8)


def test_optimal_posterior_matches_vfe_posterior(setup, rng):
    x, z, y, kern = setup
    noise = 0.3
    sv = svgp_init(kern, z, jitter=1e-10)
    sv = set_variational(sv, *optimal_variational_params(sv, x, y, noise))
    post = svgp_posterior(sv)

    f = agp.GP(kern)
    vfe_post = agp.posterior(agp.VFE(f(z, 1e-10)), f(x, noise), y)
    xs = jnp.asarray(rng.uniform(size=(20, x.shape[1])))
    np.testing.assert_allclose(
        np.asarray(post.mean(xs)), np.asarray(vfe_post.mean(xs)), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(post.var(xs)), np.asarray(vfe_post.var(xs)), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(post.cov(xs)), np.asarray(vfe_post.cov(xs)), rtol=1e-5, atol=1e-8
    )


def test_elbo_lower_bounds_logpdf(setup):
    x, z, y, kern = setup
    noise = 0.2
    sv = svgp_init(kern, z)
    fx = agp.GP(kern)(x, noise)
    assert float(svgp_elbo(sv, x, y, noise)) <= float(fx.logpdf(y))
    sv_opt = set_variational(sv, *optimal_variational_params(sv, x, y, noise))
    assert float(svgp_elbo(sv_opt, x, y, noise)) <= float(fx.logpdf(y)) + 1e-8


def test_minibatch_estimator_is_unbiased_over_partition(setup):
    x, z, y, kern = setup
    noise = 0.25
    sv = svgp_init(kern, z)
    n = x.shape[0]
    full = float(svgp_elbo(sv, x, y, noise))
    halves = [
        float(svgp_elbo(sv, x[: n // 2], y[: n // 2], noise, n_total=n)),
        float(svgp_elbo(sv, x[n // 2 :], y[n // 2 :], noise, n_total=n)),
    ]
    np.testing.assert_allclose(sum(halves) / 2.0, full, rtol=1e-10)


def test_quadrature_matches_gaussian_closed_form(setup):
    x, z, y, kern = setup
    noise = 0.4
    sv = svgp_init(kern, z)
    sv = set_variational(sv, *optimal_variational_params(sv, x, y, noise))

    def gauss_loglik(f, yy):
        return -0.5 * (jnp.log(2.0 * jnp.pi * noise) + jnp.square(yy - f) / noise)

    got = svgp_elbo_quadrature(sv, x, y, gauss_loglik, num_points=30)
    want = svgp_elbo(sv, x, y, noise)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-7)


def test_gauss_hermite_linear_and_quadratic_exact(rng):
    mu = jnp.asarray(rng.normal(size=(7,)))
    var = jnp.asarray(rng.uniform(0.1, 2.0, size=(7,)))
    y = jnp.zeros((7,))
    lin = gauss_hermite_expectation(lambda f, y: f, mu, var, y, num_points=10)
    np.testing.assert_allclose(np.asarray(lin), np.asarray(mu), rtol=1e-6)
    quad = gauss_hermite_expectation(lambda f, y: f * f, mu, var, y, num_points=10)
    np.testing.assert_allclose(np.asarray(quad), np.asarray(mu**2 + var), rtol=1e-6)


def test_fit_svgp_improves_elbo_and_is_jittable(setup):
    x, z, y, kern = setup
    noise = 0.25
    sv0 = svgp_init(kern, z)
    before = float(svgp_elbo(sv0, x, y, noise))
    sv, trace = fit_svgp(
        jax.random.PRNGKey(0), sv0, x, y, noise,
        batch_size=16, steps=200, learning_rate=5e-2,
    )
    after = float(svgp_elbo(sv, x, y, noise))
    assert after > before
    assert np.isfinite(np.asarray(trace)).all()
    # the fitted bound must lie below the optimal collapsed bound (the
    # exact maximum over (m, C) at these inducing points) but within
    # striking distance of it after training
    f = agp.GP(kern)
    opt = float(agp.elbo(agp.VFE(f(z, float(sv0.jitter))), f(x, noise), y))
    assert after <= opt + 1e-6
    assert after > opt - 0.25 * abs(opt)


@pytest.mark.slow
def test_fit_svgp_poisson_quadrature(rng):
    n, m = 80, 10
    x = jnp.asarray(np.linspace(0, 6, n)[:, None])
    z = jnp.asarray(np.linspace(0, 6, m)[:, None])
    f_true = np.sin(np.asarray(x[:, 0])) + 0.5
    y = jnp.asarray(rng.poisson(np.exp(f_true)), jnp.float32)

    def poisson_loglik(f, yy):
        return yy * f - jnp.exp(f) - gammaln(yy + 1.0)

    sv0 = svgp_init(agp.with_lengthscale(agp.SqExponentialKernel(), 1.0), z)
    before = float(svgp_elbo_quadrature(sv0, x, y, poisson_loglik))
    sv, _ = fit_svgp(
        jax.random.PRNGKey(1), sv0, x, y, None,
        batch_size=20, steps=300, learning_rate=5e-2, log_lik=poisson_loglik,
    )
    after = float(svgp_elbo_quadrature(sv, x, y, poisson_loglik))
    assert after > before
    mu, var = sv.predict(x)
    assert np.isfinite(np.asarray(mu)).all() and (np.asarray(var) >= 0).all()


def test_svgp_posterior_composes_with_finite_gp(setup, rng):
    # posteriors-are-GPs: project, sample, take logpdf
    x, z, y, kern = setup
    sv = svgp_init(kern, z)
    sv = set_variational(sv, *optimal_variational_params(sv, x, y, 0.3))
    post = svgp_posterior(sv)
    xs = jnp.asarray(rng.uniform(size=(9, x.shape[1])))
    fx = post(xs, 1e-6)
    s = fx.rand(jax.random.PRNGKey(2))
    assert s.shape == (9,)
    assert np.isfinite(float(fx.logpdf(s)))


@pytest.mark.slow
def test_svgp_float32_stability(setup):
    x, z, y, _ = setup
    x32, z32, y32 = (jnp.asarray(a, jnp.float32) for a in (x, z, y))
    kern32 = jnp.float32(1.3) * agp.with_lengthscale(
        agp.SqExponentialKernel(), jnp.float32(0.5)
    )
    sv = svgp_init(kern32, z32)
    val = svgp_elbo(sv, x32, y32, jnp.float32(0.2))
    assert val.dtype == jnp.float32 and np.isfinite(float(val))


@pytest.mark.slow
def test_natgrad_step_lr1_lands_on_optimum(setup):
    # Gaussian likelihood + full batch: the ELBO is quadratic in the
    # expectation parameters, so ONE natural-gradient step with lr=1 from
    # ANY start equals the closed-form optimal variational parameters
    # (Salimbeni et al. 2018).
    from abstractgps_tpu.models.svgp import natgrad_step

    x, z, y, kern = setup
    sv = svgp_init(kern, z)
    # start far from the optimum
    key = jax.random.PRNGKey(3)
    m0 = 2.0 * jax.random.normal(key, sv.m.shape, sv.m.dtype)
    sv = set_variational(sv, m0, 0.3 * jnp.eye(sv.num_inducing, dtype=sv.m.dtype))

    stepped = natgrad_step(sv, x, y, 0.1, lr=1.0)
    m_star, C_star = optimal_variational_params(sv, x, y, 0.1)
    S_star = C_star @ C_star.T
    S_step = stepped.C @ stepped.C.T
    np.testing.assert_allclose(np.asarray(stepped.m), np.asarray(m_star),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(S_step), np.asarray(S_star),
                               rtol=1e-8, atol=1e-8)
    # ELBO at the stepped point == collapsed VFE bound
    got = float(svgp_elbo(stepped, x, y, 0.1))
    f = agp.GP(kern)
    want = float(agp.elbo(agp.VFE(f(z, float(sv.jitter))), f(x, 0.1), y))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_natgrad_step_quadrature_improves_elbo(setup, rng):
    from abstractgps_tpu.models.svgp import natgrad_step

    x, z, _, kern = setup
    rate = jnp.exp(jnp.asarray(rng.normal(size=(x.shape[0],))) * 0.3)
    y = jnp.asarray(rng.poisson(np.asarray(rate)), jnp.float64)

    def log_lik(f, yy):
        return yy * f - jnp.exp(f) - gammaln(yy + 1.0)

    sv = svgp_init(kern, z)
    e0 = float(svgp_elbo_quadrature(sv, x, y, log_lik))
    for _ in range(5):
        sv = natgrad_step(sv, x, y, lr=0.2, log_lik=log_lik)
    e1 = float(svgp_elbo_quadrature(sv, x, y, log_lik))
    assert np.isfinite(e1) and e1 > e0


def test_fit_svgp_natgrad_jits_and_improves(setup):
    from abstractgps_tpu.models.svgp import fit_svgp_natgrad

    x, z, y, kern = setup
    sv = svgp_init(kern, z)
    e0 = float(svgp_elbo(sv, x, y, 0.1))
    fitted, trace = fit_svgp_natgrad(
        jax.random.PRNGKey(0), sv, x, y, 0.1,
        batch_size=30, steps=40, natgrad_lr=0.5, hyper_lr=5e-3,
    )
    e1 = float(svgp_elbo(fitted, x, y, 0.1))
    assert np.isfinite(e1) and e1 > e0
    assert trace.shape == (40,)
    # variational params actually moved
    assert float(jnp.max(jnp.abs(fitted.m))) > 1e-3


def test_fit_svgp_heteroscedastic_noise(key):
    # regression (r4 review): per-point noise vectors must be sliced with
    # the minibatch — previously fit_svgp passed the full-length vector
    # into a size-B batch and raised at the first step
    k1, k2, k3 = jax.random.split(key, 3)
    n = 32
    x = jax.random.uniform(k1, (n, 1)) * 3.0
    y = jnp.sin(x[:, 0]) + 0.05 * jax.random.normal(k2, (n,))
    noise = jnp.full((n,), 0.1)
    sv = agp.svgp_init(agp.Matern32Kernel(), x[::4], jitter=1e-6)
    fitted, trace = fit_svgp(k3, sv, x, y, noise=noise, batch_size=8,
                             steps=5, learning_rate=1e-2)
    assert bool(jnp.isfinite(jnp.asarray(trace)).all())
    fitted2, trace2 = fit_svgp_natgrad(k3, sv, x, y, noise=noise,
                                       batch_size=8, steps=3)
    assert bool(jnp.isfinite(jnp.asarray(trace2)).all())
