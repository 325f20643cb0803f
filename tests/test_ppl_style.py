"""PPL-style certification: FiniteGP as a sampling statement in a joint model.

The reference certifies FiniteGP as a genuine AbstractMvNormal by running
Turing models that use ``y ~ f(X, σ²)`` directly inside a probabilistic
program (test/ppl/turing.jl:8-27) and a latent-GP Poisson regression under
NUTS (test/ppl/turing.jl:29-46). The TPU-native equivalent: the same joint
densities written as plain JAX logdensity functions — priors over hypers +
the GP marginal likelihood in ONE scalar — sampled end-to-end with the
library's own NUTS engine, recovering the generating hyperparameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import abstractgps_tpu as agp
from abstractgps_tpu.distributions import LogNormal, Poisson, product_distribution
from abstractgps_tpu.inference.mcmc import init_chain_positions, run_mcmc
from abstractgps_tpu.inference.mcmc.diagnostics import rhat


def _make_kernel(alpha, rho):
    # α * (SqExponentialKernel ∘ ScaleTransform(1/ρ)) — turing.jl:15
    return alpha * agp.with_lengthscale(agp.SEKernel(), rho)


@pytest.mark.slow
def test_joint_gp_regression_recovers_hypers(key):
    """turing.jl:8-27 pattern at recovery scale: α, ρ, σ² ~ LogNormal
    priors, y ~ f(X, σ²), NUTS over the joint; posterior must cover the
    generating values."""
    true_alpha, true_rho, true_s2 = 1.5, 0.6, 0.1
    n = 80
    kx, kf, krun = jax.random.split(key, 3)
    X = jax.random.uniform(kx, (n, 1), minval=-2.0, maxval=2.0)
    f0 = agp.GP(_make_kernel(true_alpha, true_rho))
    y = f0(X, true_s2).rand(kf)

    a_prior = LogNormal(jnp.asarray(0.0), jnp.asarray(1.0))
    r_prior = LogNormal(jnp.asarray(0.0), jnp.asarray(1.0))
    s_prior = LogNormal(jnp.asarray(0.0), jnp.asarray(1.0))

    def logjoint(q):
        # q holds unconstrained log-parameters; LogNormal prior density on
        # the constrained value + log-Jacobian of exp = Normal on log-value
        alpha, rho, s2 = jnp.exp(q["la"]), jnp.exp(q["lr"]), jnp.exp(q["ls"])
        lp = (a_prior.logpdf(alpha) + q["la"]
              + r_prior.logpdf(rho) + q["lr"]
              + s_prior.logpdf(s2) + q["ls"])
        fx = agp.GP(_make_kernel(alpha, rho))(X, s2)
        return lp + fx.logpdf(y)  # y ~ f(X, σ²)

    q0 = {"la": jnp.zeros(()), "lr": jnp.zeros(()), "ls": jnp.zeros(())}
    init = init_chain_positions(krun, q0, num_chains=4, jitter=0.5)
    res = run_mcmc(logjoint, init, krun, num_chains=4,
                   num_samples=250, num_warmup=300, max_depth=8)

    la = np.asarray(res.positions["la"])  # (chains, draws)
    lr = np.asarray(res.positions["lr"])
    ls = np.asarray(res.positions["ls"])
    assert np.isfinite(la).all() and np.isfinite(lr).all()
    # chains mixed
    assert float(rhat(la)) < 1.1
    # posterior covers the generating values (log-scale, generous ±3 sd)
    for draws, truth in [(la, true_alpha), (lr, true_rho), (ls, true_s2)]:
        mu, sd = draws.mean(), draws.std()
        assert abs(mu - np.log(truth)) < 3.0 * sd + 0.75, (
            mu, np.log(truth), sd)


def test_joint_model_matrix_and_colvecs_inputs(key):
    """The reference runs the same model for matrix (RowVecs) and
    vector-of-vectors inputs (turing.jl:22-27); ours: (n,d) array and
    ColVecs-transposed array must give identical joint densities."""
    kx, kf = jax.random.split(key)
    X = jax.random.normal(kx, (3, 1))
    y = jax.random.normal(kf, (3,))

    def logjoint(q, x, obsdim=None):
        alpha = jnp.exp(q)
        xx = agp.as_inputs(x, obsdim=obsdim)
        fx = agp.GP(_make_kernel(alpha, 1.0))(xx, 0.5)
        return LogNormal(jnp.asarray(0.0), jnp.asarray(0.1)).logpdf(alpha) + q + fx.logpdf(y)

    q = jnp.asarray(0.3)
    a = logjoint(q, X)
    b = logjoint(q, X.T, obsdim=2)  # ColVecs layout
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    # and it is NUTS-sampleable (smoke, 5 draws, as the reference asserts
    # `length(sample(m, HMC(...), 5)) == 5`)
    init = init_chain_positions(key, q, num_chains=2, jitter=0.1)
    res = run_mcmc(lambda qq: logjoint(qq, X), init, key, num_chains=2,
                   num_samples=5, num_warmup=20, algorithm="hmc",
                   num_integration_steps=5)
    assert res.positions.shape == (2, 5)


@pytest.mark.slow
def test_latent_poisson_nuts(key):
    """turing.jl:29-46: u ~ f(X), y ~ product_distribution(Poisson.(exp u)),
    sampled with NUTS (whitened parameterization) — the posterior latent
    rate must track the observed counts."""
    n = 40
    kx, kgen, krun = jax.random.split(key, 3)
    X = jnp.linspace(-2.0, 2.0, n)[:, None]
    # constant mean 2 → rates ~e² ≈ 7: counts informative enough for a
    # recovery oracle (also exercises ConstMean through the PPL pattern)
    f = agp.GP(2.0, agp.Matern32Kernel())
    lgp = agp.LatentGP(f, lambda u: product_distribution(Poisson(jnp.exp(u))),
                       1e-9)
    fy = lgp(X).rand(kgen)
    y, u_true = fy["y"], fy["f"]

    # non-centered: u = L v, v ~ N(0, I); joint = N(v;0,I) + lik
    L = np.linalg.cholesky(np.asarray(f.cov(X)) + 1e-9 * np.eye(n))
    L = jnp.asarray(L)

    def logjoint(v):
        u = 2.0 + L @ v
        lik = lgp.lik(u)
        return -0.5 * jnp.sum(v * v) + lik.logpdf(y)

    init = init_chain_positions(krun, jnp.zeros((n,)), num_chains=4,
                                jitter=0.1)
    res = run_mcmc(logjoint, init, krun, num_chains=4,
                   num_samples=200, num_warmup=200, max_depth=8)
    v_draws = np.asarray(res.positions)            # (4, 250, n)
    assert np.isfinite(v_draws).all()
    u_mean = 2.0 + (v_draws.reshape(-1, n) @ np.asarray(L).T).mean(axis=0)
    # the posterior latent must track the TRUE generating latent much
    # better than the prior mean (zero) does — Poisson noise makes raw
    # count correlation too loose an oracle at these rates
    u_true = np.asarray(u_true)
    corr = np.corrcoef(u_mean, u_true)[0, 1]
    rmse_post = np.sqrt(np.mean((u_mean - u_true) ** 2))
    rmse_prior = np.sqrt(np.mean((u_true - 2.0) ** 2))
    assert corr > 0.5, corr
    assert rmse_post < 0.8 * rmse_prior, (rmse_post, rmse_prior)


def test_latent_gp_joint_logpdf_matches_product():
    """LatentFiniteGP.logpdf (src/latent_gp.jl:48-50) == FiniteGP logpdf +
    product-distribution logpdf, and ProductDistribution sums exactly."""
    n = 7
    X = jnp.linspace(0.0, 1.0, n)[:, None]
    u = jnp.sin(3.0 * X[:, 0])
    y = jnp.round(jnp.exp(u))
    f = agp.GP(agp.SEKernel())
    lgp = agp.LatentGP(f, lambda uu: product_distribution(Poisson(jnp.exp(uu))),
                       1e-6)
    joint = lgp(X).logpdf({"f": u, "y": y})
    expect = f(X, 1e-6).logpdf(u) + jnp.sum(Poisson(jnp.exp(u)).logpdf(y))
    np.testing.assert_allclose(np.asarray(joint), np.asarray(expect),
                               rtol=1e-12)
    pd = product_distribution(Poisson(jnp.exp(u)))
    np.testing.assert_allclose(
        np.asarray(pd.logpdf(y)),
        np.asarray(jnp.sum(Poisson(jnp.exp(u)).logpdf(y))), rtol=1e-12)
    s = pd.sample(jax.random.PRNGKey(0))
    assert s.shape == (n,)
