"""Pathwise (decoupled) sampling: RFF prior accuracy + posterior moments.

Oracle style follows the reference's statistical tests
(test/finite_gp_projection.jl:84-104): empirical moments of many samples
against analytic values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import abstractgps_tpu as agp
from abstractgps_tpu.models.pathwise import (
    pathwise_sample,
    prior_function_sample,
    sample_fourier_features,
)


@pytest.mark.parametrize(
    "kernel",
    [
        agp.SqExponentialKernel(),
        agp.Matern32Kernel(),
        agp.Matern52Kernel(),
        agp.ExponentialKernel(),
        agp.RationalQuadraticKernel(alpha=1.5),
        2.0 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.7),
        agp.with_lengthscale(agp.SqExponentialKernel(), 0.5)
        * agp.with_lengthscale(agp.Matern32Kernel(), 2.0),
        0.5 * agp.SqExponentialKernel() + 1.5 * agp.with_lengthscale(
            agp.Matern52Kernel(), 2.0
        ),
    ],
    ids=["se", "m32", "m52", "m12", "rq", "scaled", "product", "sum"],
)
def test_rff_gram_approximates_kernel(kernel):
    """E[φ(x)φ(z)ᵀ] → k(x, z) as m → ∞ (MC error ~ 1/√m)."""
    key = jax.random.PRNGKey(0)
    x = jnp.linspace(-2.0, 2.0, 9)[:, None]
    K = agp.kernelmatrix(kernel, x)
    phi = sample_fourier_features(kernel, key, 60_000, 1)
    F = phi(x)
    K_hat = F @ F.T
    assert np.max(np.abs(np.asarray(K_hat - K))) < 0.05 * float(K.max())


def test_prior_function_sample_moments():
    f = agp.GP(0.5, 1.3 * agp.with_lengthscale(agp.Matern32Kernel(), 0.8))
    x = jnp.linspace(0.0, 1.0, 6)[:, None]
    h = prior_function_sample(f, jax.random.PRNGKey(1), 4096, 1,
                              num_samples=4096)
    S = np.asarray(h(x))  # (6, 4096)
    m_emp, C_emp = S.mean(axis=1), np.cov(S)
    assert np.max(np.abs(m_emp - 0.5)) < 0.1
    K = np.asarray(agp.kernelmatrix(f.kernel, x))
    assert np.max(np.abs(C_emp - K)) < 0.12


@pytest.mark.slow
def test_pathwise_posterior_moments_match_exact():
    """Pathwise sample paths reproduce the exact posterior's mean/cov."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sort(rng.uniform(0, 3, size=24))[:, None])
    f = agp.GP(0.2, 1.1 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.6))
    fx = f(x, 0.05)
    y = fx.rand(jax.random.PRNGKey(7))
    post = agp.posterior(fx, y)

    xs = jnp.linspace(-0.3, 3.3, 15)[:, None]
    m_exact, C_exact = post.mean_and_cov(xs)

    g = pathwise_sample(post, jax.random.PRNGKey(11), num_features=8192,
                        num_samples=6000)
    S = np.asarray(g(xs))  # (15, 6000)
    m_emp, C_emp = S.mean(axis=1), np.cov(S)
    assert np.max(np.abs(m_emp - np.asarray(m_exact))) < 0.06
    assert np.max(np.abs(C_emp - np.asarray(C_exact))) < 0.08


def test_pathwise_single_sample_shape_and_interpolation():
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.sort(rng.uniform(0, 2, size=16))[:, None])
    f = agp.GP(agp.Matern52Kernel())
    fx = f(x, 1e-4)
    y = fx.rand(jax.random.PRNGKey(2))
    post = agp.posterior(fx, y)
    g = pathwise_sample(post, jax.random.PRNGKey(3), num_features=4096)
    out = g(x)
    assert out.shape == (16,)
    # with tiny noise, every path nearly interpolates the data
    assert np.max(np.abs(np.asarray(out - y))) < 0.15


def test_pathwise_jits_and_vmaps():
    x = jnp.linspace(0, 1, 12)[:, None]
    f = agp.GP(agp.SqExponentialKernel())
    fx = f(x, 0.01)
    y = fx.rand(jax.random.PRNGKey(0))
    post = agp.posterior(fx, y)
    xs = jnp.linspace(0, 1, 7)[:, None]

    @jax.jit
    def draw(key):
        return pathwise_sample(post, key, num_features=256)(xs)

    out = jax.vmap(draw)(jax.random.split(jax.random.PRNGKey(1), 4))
    assert out.shape == (4, 7)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_pathwise_dense_noise_moments():
    """Correlated DenseNoise: ε is drawn from the full Σy."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(np.sort(rng.uniform(0, 2, size=10))[:, None])
    f = agp.GP(agp.SqExponentialKernel())
    A = rng.normal(size=(10, 10)) * 0.05
    S = jnp.asarray(A @ A.T + 0.05 * np.eye(10))
    fx = f(x, agp.DenseNoise(S))
    y = fx.rand(jax.random.PRNGKey(0))
    post = agp.posterior(fx, y)
    xs = jnp.linspace(0, 2, 8)[:, None]
    m_exact, C_exact = post.mean_and_cov(xs)
    g = pathwise_sample(post, jax.random.PRNGKey(1), num_features=8192,
                        num_samples=6000)
    S_emp = np.asarray(g(xs))
    assert np.max(np.abs(S_emp.mean(axis=1) - np.asarray(m_exact))) < 0.06
    assert np.max(np.abs(np.cov(S_emp) - np.asarray(C_exact))) < 0.08


def test_unsupported_kernel_raises():
    with pytest.raises(NotImplementedError, match="spectral"):
        sample_fourier_features(agp.PeriodicKernel(), jax.random.PRNGKey(0), 8, 1)
