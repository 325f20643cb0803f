"""Conformance-suite fixtures: every concrete GP type self-certifies
against the same suites (the reference's pattern: TestUtils invoked on
prior / exact posterior / VFE / DTC posteriors — test/base_gp.jl:13,
test/exact_gpr_posterior.jl:27, test/sparse_approximations.jl:30)."""

import jax
import jax.numpy as jnp
import pytest

import abstractgps_tpu as agp
from abstractgps_tpu.utils.test_utils import (
    test_internal_abstractgps_interface as check_internal,
)


@pytest.fixture
def data(key):
    kx, kz, ky = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (17, 2)) * 3.0
    z = jax.random.uniform(kz, (11, 2)) * 3.0
    return x, z, ky


def test_prior_conformance(data):
    x, z, key = data
    f = agp.GP(0.5, 1.3 * agp.with_lengthscale(agp.Matern52Kernel(), 0.8))
    check_internal(key, f, x, z)


def test_exact_posterior_conformance(data):
    x, z, key = data
    k1, k2 = jax.random.split(key)
    f = agp.GP(agp.with_lengthscale(agp.SEKernel(), 0.9))
    y = f(x, 0.1).rand(k1)
    post = agp.posterior(f(x, 0.1), y)
    check_internal(k2, post, x, z)


@pytest.mark.parametrize("approx_cls", [agp.VFE, agp.DTC])
def test_sparse_posterior_conformance(data, approx_cls):
    x, z, key = data
    k1, k2 = jax.random.split(key)
    f = agp.GP(agp.Matern32Kernel())
    y = f(x, 0.1).rand(k1)
    approx = approx_cls(f(z, 1e-6))
    post = agp.posterior(approx, f(x, 0.1), y)
    check_internal(k2, post, x, z)


def test_svgp_posterior_conformance(data):
    # the SVGP variational posterior is an AbstractGP too (posteriors-are-GPs)
    x, z, key = data
    k1, k2 = jax.random.split(key)
    f = agp.GP(agp.Matern32Kernel())
    y = f(x, 0.1).rand(k1)
    from abstractgps_tpu.models.svgp import (
        optimal_variational_params,
        set_variational,
    )

    sv = agp.svgp_init(agp.Matern32Kernel(), z, jitter=1e-8)
    sv = set_variational(sv, *optimal_variational_params(sv, x, y, 0.1))
    check_internal(k2, agp.svgp_posterior(sv), x, z)


def test_composite_kernel_prior_conformance(data):
    x, z, key = data
    k = (
        1.2 * agp.with_lengthscale(agp.SEKernel(), 1.5)
        + 0.4 * agp.with_lengthscale(agp.RationalQuadraticKernel(alpha=1.5), 0.7)
        + 0.1 * agp.LinearKernel(c=0.5)
    )
    check_internal(key, agp.GP(k), x, z)


def test_cg_posterior_conformance(data):
    # matrix-free backend #1 (VERDICT r3 §Missing-1): the CG/BBMM posterior
    # self-certifies through the same internal suite as the dense types
    x, z, key = data
    k1, k2 = jax.random.split(key)
    f = agp.GP(agp.with_lengthscale(agp.Matern52Kernel(), 0.9))
    y = f(x, 0.1).rand(k1)
    post = agp.CGInference(max_iters=64).posterior(f(x, 0.1), y)
    check_internal(k2, post, x, z)


@pytest.mark.slow
def test_markov_posterior_conformance(key):
    # matrix-free backend #2: the state-space posterior (an AbstractGP via
    # smoother-gain cross-covariances) on a 1-D Matern problem
    k1, k2, k3 = jax.random.split(key, 3)
    x = jnp.sort(jax.random.uniform(k1, (17,)) * 3.0)[:, None]
    z = (jax.random.uniform(k2, (11,)) * 3.0)[:, None]
    f = agp.GP(1.3 * agp.with_lengthscale(agp.Matern32Kernel(), 0.8))
    y = f(x, 0.1).rand(k1)
    post = agp.markov_posterior(f(x, 0.1), y)
    check_internal(k3, post, x, z)


def test_markov_posterior_matches_dense(key):
    # oracle: every surface of MarkovPosteriorGP == the dense exact posterior
    k1, k2 = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(k1, (23,)) * 4.0)[:, None]
    z = (jax.random.uniform(k2, (9,)) * 4.0)[:, None]
    f = agp.GP(0.7 * agp.with_lengthscale(agp.Matern52Kernel(), 1.1))
    y = f(x, 0.3).rand(k1)
    dense = agp.posterior(f(x, 0.3), y)
    mk = agp.markov_posterior(f(x, 0.3), y)
    import numpy as np

    np.testing.assert_allclose(mk.mean(z), dense.mean(z), atol=1e-8)
    np.testing.assert_allclose(mk.var(z), dense.var(z), atol=1e-8)
    np.testing.assert_allclose(mk.cov(z), dense.cov(z), atol=1e-8)
    np.testing.assert_allclose(mk.cov(z, x), dense.cov(z, x), atol=1e-8)
    m1, C1 = mk.mean_and_cov(z)
    m2, C2 = dense.mean_and_cov(z)
    np.testing.assert_allclose(m1, m2, atol=1e-8)
    np.testing.assert_allclose(C1, C2, atol=1e-8)
