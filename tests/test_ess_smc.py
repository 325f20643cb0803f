"""ESS + SMC correctness on analytic targets.

ESS anchor: Gaussian prior + Gaussian likelihood has a closed-form
posterior; ESS samples must match its moments (reference example:
examples/0-intro-1d/script.jl:305-357). SMC additionally estimates the
log evidence, which is analytic for conjugate Gaussians.
"""

import jax
import jax.numpy as jnp
import numpy as np

import abstractgps_tpu as agp
from abstractgps_tpu.inference.mcmc.ess import run_ess
from abstractgps_tpu.inference.mcmc.smc import run_smc, systematic_resample


def test_systematic_resample_unbiased(key):
    log_w = jnp.log(jnp.array([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for i in range(200):
        idx = systematic_resample(jax.random.fold_in(key, i), log_w)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_ess_conjugate_gaussian(key):
    # prior N(0, K), likelihood y ~ N(q, s2 I) → posterior analytic
    dim = 5
    k1, k2, k3 = jax.random.split(key, 3)
    K = agp.kernelmatrix(agp.SEKernel(), jnp.linspace(0, 2, dim)) + 1e-8 * jnp.eye(dim)
    L = jnp.linalg.cholesky(K)
    s2 = 0.3
    y = jax.random.normal(k1, (dim,))

    def loglik(q):
        return -0.5 * jnp.sum(jnp.square(q - y)) / s2

    def sample_prior(key):
        return L @ jax.random.normal(key, (dim,))

    qs, _ = run_ess(
        loglik, sample_prior, jnp.zeros((dim,)), k2,
        num_samples=4000, num_burnin=500, num_chains=4,
    )
    qs = np.asarray(qs).reshape(-1, dim)

    post_cov = np.linalg.inv(np.linalg.inv(K) + np.eye(dim) / s2)
    post_mean = post_cov @ (np.asarray(y) / s2)
    np.testing.assert_allclose(qs.mean(0), post_mean, atol=0.08)
    np.testing.assert_allclose(np.cov(qs.T), post_cov, atol=0.08)


def test_smc_conjugate_gaussian(key):
    # prior N(0, I), lik N(y|q, s2 I): posterior + evidence analytic
    dim = 3
    s2 = 0.5
    k1, k2, k3 = jax.random.split(key, 3)
    y = jax.random.normal(k1, (dim,))

    def logprior(q):
        return -0.5 * jnp.sum(q * q) - 0.5 * dim * jnp.log(2 * jnp.pi)

    def loglik(q):
        return (
            -0.5 * jnp.sum(jnp.square(q - y)) / s2
            - 0.5 * dim * jnp.log(2 * jnp.pi * s2)
        )

    particles0 = jax.random.normal(k2, (2048, dim))
    res = run_smc(logprior, loglik, particles0, k3)

    post_var = 1.0 / (1.0 + 1.0 / s2)
    post_mean = post_var * np.asarray(y) / s2
    qs = np.asarray(res.particles)
    np.testing.assert_allclose(qs.mean(0), post_mean, atol=0.08)
    np.testing.assert_allclose(qs.var(0), post_var * np.ones(dim), atol=0.08)

    # evidence: y ~ N(0, (1+s2) I)
    log_Z = float(
        -0.5 * np.sum(np.asarray(y) ** 2) / (1 + s2)
        - 0.5 * dim * np.log(2 * np.pi * (1 + s2))
    )
    np.testing.assert_allclose(float(res.log_evidence), log_Z, atol=0.15)
    assert int(res.num_stages) >= 2


def test_ess_latent_gp_poisson(key):
    # LatentGP-Poisson workflow smoke test (test/ppl/turing.jl:29-46):
    # sample latents u ~ N(0,K) under Poisson(exp(u)) likelihood with ESS
    k1, k2, k3 = jax.random.split(key, 3)
    x = jnp.linspace(0.0, 3.0, 12)
    K = agp.kernelmatrix(agp.with_lengthscale(agp.SEKernel(), 1.0), x)
    L = jnp.linalg.cholesky(K + 1e-8 * jnp.eye(12))
    u_true = L @ jax.random.normal(k1, (12,))
    counts = jax.random.poisson(k2, jnp.exp(u_true))

    def loglik(u):
        return jnp.sum(counts * u - jnp.exp(u))

    def sample_prior(key):
        return L @ jax.random.normal(key, (12,))

    qs, lls = run_ess(loglik, sample_prior, jnp.zeros((12,)), k3,
                      num_samples=2000, num_burnin=200, num_chains=2)
    assert np.isfinite(np.asarray(lls)).all()
    u_hat = np.asarray(qs).reshape(-1, 12).mean(0)
    # posterior mean of the latent rate should correlate with the truth
    corr = np.corrcoef(u_hat, np.asarray(u_true))[0, 1]
    assert corr > 0.5
