"""Markov (state-space) backend: exactness vs the dense Cholesky path.

The state-space formulation is mathematically identical to the dense GP for
Matérn kernels in 1-D (Hartikainen & Särkkä 2010), so every test is an
equality oracle in f64: logpdf and posterior marginals must match the dense
FiniteGP/PosteriorGP results to ~1e-8, for every supported kernel shape,
with the parallel (associative-scan) filter agreeing with the sequential
one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import abstractgps_tpu as agp
from abstractgps_tpu.models.markov import (
    is_markov_kernel,
    markov_logpdf,
    markov_mean_and_var,
    sde_coefficients,
)

KERNELS = [
    agp.ExponentialKernel(),
    agp.Matern32Kernel(),
    agp.Matern52Kernel(),
    2.3 * agp.Matern32Kernel(),
    agp.with_lengthscale(agp.Matern52Kernel(), 0.35),
    1.7 * agp.with_lengthscale(agp.ExponentialKernel(), 2.0),
    agp.Matern32Kernel() + 0.5 * agp.with_lengthscale(agp.Matern52Kernel(), 0.6),
]


@pytest.fixture()
def data(rng):
    n = 80
    x = jnp.asarray(np.sort(rng.uniform(0.0, 6.0, size=n)))
    y = jnp.asarray(rng.normal(size=n))
    return x, y


@pytest.mark.parametrize("kern", KERNELS)
@pytest.mark.parametrize("parallel", [False, True])
@pytest.mark.slow
def test_markov_logpdf_matches_dense(data, kern, parallel):
    x, y = data
    fx = agp.GP(kern)(x, 0.1)
    got = float(markov_logpdf(fx, y, parallel=parallel))
    want = float(fx.logpdf(y))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_markov_logpdf_unsorted_heteroscedastic_const_mean(rng):
    n = 64
    x = jnp.asarray(rng.uniform(0.0, 5.0, size=n))  # deliberately unsorted
    y = jnp.asarray(rng.normal(size=n))
    noise = jnp.asarray(rng.uniform(0.05, 0.3, size=n))
    fx = agp.GP(0.7, agp.Matern32Kernel())(x, noise)
    for parallel in (False, True):
        got = float(markov_logpdf(fx, y, parallel=parallel))
        np.testing.assert_allclose(got, float(fx.logpdf(y)), rtol=1e-8)


@pytest.mark.parametrize("parallel", [False, True])
@pytest.mark.slow
def test_markov_posterior_marginals_match_dense(data, parallel, rng):
    x, y = data
    kern = 1.4 * agp.with_lengthscale(agp.Matern52Kernel(), 0.7)
    fx = agp.GP(0.3, kern)(x, 0.1)
    x_test = jnp.asarray(rng.uniform(-0.5, 6.5, size=40))
    mu, var = markov_mean_and_var(fx, y, x_test, parallel=parallel)
    post = fx.posterior(y)
    mu_d, var_d = post.mean_and_var(x_test)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_d),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_d),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_markov_gradients_match_dense(data):
    x, y = data

    def nlml_markov(p):
        k = p["s2"] * agp.with_lengthscale(agp.Matern32Kernel(), p["ell"])
        return -markov_logpdf(agp.GP(k)(x, p["noise"]), y)

    def nlml_dense(p):
        k = p["s2"] * agp.with_lengthscale(agp.Matern32Kernel(), p["ell"])
        return -agp.GP(k)(x, p["noise"]).logpdf(y)

    p = {"s2": jnp.float64(1.2), "ell": jnp.float64(0.6),
         "noise": jnp.float64(0.15)}
    g_m = jax.grad(nlml_markov)(p)
    g_d = jax.grad(nlml_dense)(p)
    for k_ in p:
        np.testing.assert_allclose(float(g_m[k_]), float(g_d[k_]),
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_markov_jits_and_scales(rng):
    n = 2000
    x = jnp.asarray(np.sort(rng.uniform(0, 50.0, size=n)))
    y = jnp.asarray(rng.normal(size=n))
    fx = agp.GP(agp.Matern52Kernel())(x, 0.1)
    ll = jax.jit(lambda y: markov_logpdf(fx, y, parallel=True))(y)
    assert np.isfinite(float(ll))


def test_chunked_par_filter_matches_flat(rng):
    """The chunked associative scan (n > _PAR_CHUNK) is exact vs the
    sequential filter, including a non-chunk-multiple n (zero padding)."""
    from abstractgps_tpu.models import markov as mk

    old = mk._PAR_CHUNK
    mk._PAR_CHUNK = 64  # force the chunked path at test sizes
    try:
        for n in (250, 256):
            x = jnp.asarray(np.sort(rng.uniform(0.0, 6.0, size=n)))
            y = jnp.asarray(rng.normal(size=n))
            fx = agp.GP(agp.Matern32Kernel() + agp.Matern52Kernel())(x, 0.1)
            got = float(markov_logpdf(fx, y, parallel=True))
            want = float(markov_logpdf(fx, y))
            np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)
    finally:
        mk._PAR_CHUNK = old


@pytest.mark.slow
def test_f32_accuracy_dense_sampling(rng):
    """f32 logpdf error in the small-λdt cancellation regime stays bounded.

    The stable incomplete-gamma Q (``_stable_Q``) fixed a 0.9% f32 logpdf
    error at densely sampled inputs (n=5000 over 60 lengthscales) down to
    ~1.5e-4; this pins that budget so a Q-construction regression trips.
    Sum kernels with redundant components remain ~1e-2 at f32 (filter
    conditioning, not Q — documented limitation; use f64 there).
    """
    n = 4000
    x64 = np.sort(rng.uniform(0.0, 30.0, size=n))
    y64 = rng.normal(size=n)
    for kern in (1.0 * agp.with_lengthscale(agp.Matern32Kernel(), 0.5),
                 0.8 * agp.with_lengthscale(agp.Matern52Kernel(), 0.4)):
        fx64 = agp.GP(kern)(jnp.asarray(x64), 0.1)
        want = float(markov_logpdf(fx64, jnp.asarray(y64)))
        fx32 = agp.GP(kern)(jnp.asarray(x64, jnp.float32), np.float32(0.1))
        for parallel in (False, True):
            got = float(markov_logpdf(fx32, jnp.asarray(y64, jnp.float32),
                                      parallel=parallel))
            assert abs(got - want) / abs(want) < 1e-3, (kern, parallel, got, want)


def test_unsupported_kernels_raise():
    assert not is_markov_kernel(agp.SqExponentialKernel())
    assert not is_markov_kernel(agp.Matern32Kernel() * agp.Matern52Kernel())
    with pytest.raises(TypeError):
        sde_coefficients(agp.PeriodicKernel())
    x = jnp.linspace(0, 1, 8)
    fx = agp.GP(agp.SqExponentialKernel())(x, 0.1)
    with pytest.raises(TypeError):
        markov_logpdf(fx, jnp.zeros(8))
    # 2-D inputs rejected
    fx2 = agp.GP(agp.Matern32Kernel())(jnp.zeros((8, 2)), 0.1)
    with pytest.raises(TypeError):
        markov_logpdf(fx2, jnp.zeros(8))


@pytest.mark.parametrize("parallel", [False, True])
@pytest.mark.slow
def test_markov_rand_moments_match_dense_posterior(data, rng, parallel):
    # FFBS joint samples: empirical mean/cov at test points vs the dense
    # posterior (statistical oracle, 6000 draws)
    x, y = data
    kern = 1.2 * agp.with_lengthscale(agp.Matern32Kernel(), 0.8)
    fx = agp.GP(kern)(x, 0.1)
    x_test = jnp.asarray(np.sort(rng.uniform(0.5, 5.5, size=10)))
    from abstractgps_tpu.models.markov import markov_rand

    S = markov_rand(fx, y, x_test, jax.random.PRNGKey(0), 6000,
                    parallel=parallel)
    assert S.shape == (10, 6000)
    post = fx.posterior(y)
    mu_d = np.asarray(post.mean(x_test))
    cov_d = np.asarray(post.cov(x_test))
    emp_mu = np.mean(np.asarray(S), axis=1)
    emp_cov = np.cov(np.asarray(S))
    np.testing.assert_allclose(emp_mu, mu_d, atol=4.5 * np.sqrt(
        np.diagonal(cov_d).max() / 6000) + 1e-3)
    np.testing.assert_allclose(emp_cov, cov_d, atol=0.05 * cov_d.max() + 5e-3)


def test_markov_rand_single_sample_shape(data):
    x, y = data
    fx = agp.GP(agp.Matern52Kernel())(x, 0.1)
    from abstractgps_tpu.models.markov import markov_rand

    s = markov_rand(fx, y, jnp.linspace(0, 6, 17), jax.random.PRNGKey(1))
    assert s.shape == (17,)
    assert bool(jnp.isfinite(s).all())


@pytest.mark.parametrize("parallel", [False, True])
@pytest.mark.slow
def test_markov_logpdf_matrix_y(data, rng, parallel):
    x, _ = data
    Y = jnp.asarray(rng.normal(size=(x.shape[0], 3)))
    fx = agp.GP(0.2, agp.Matern32Kernel())(x, 0.1)
    got = markov_logpdf(fx, Y, parallel=parallel)
    want = fx.logpdf(Y)
    assert got.shape == (3,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_markov_posterior_cov_scales_past_training_size(key):
    # regression (r4 review): cov between M query points must be O(M^2),
    # never O((N+M)^2) over the merged timeline — at N=20k training points
    # the old full-table path would allocate a 3.2 GB pairwise matrix
    import numpy as np

    n, m = 20_000, 12
    k1, k2 = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(k1, (n,)) * 100.0)[:, None]
    y = jnp.sin(x[:, 0]) + 0.1 * jax.random.normal(k2, (n,))
    f = agp.GP(agp.with_lengthscale(agp.Matern32Kernel(), 2.0))
    post = agp.markov_posterior(f(x, 0.01), y)
    z = jnp.linspace(0.0, 100.0, m)[:, None]
    mu, C = post.mean_and_cov(z)
    assert C.shape == (m, m)
    assert bool(jnp.isfinite(C).all())
    # diagonal must match the O(N) marginal path
    _, v = post.mean_and_var(z)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(C)), np.asarray(v),
                               rtol=1e-6, atol=1e-9)


def test_markov_posterior_empty_query(key):
    # regression: M=0 query sets must return (0,)/(0,0), not crash the
    # segment-product scan
    k1, k2 = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(k1, (12,)) * 3.0)[:, None]
    y = jax.random.normal(k2, (12,))
    post = agp.markov_posterior(
        agp.GP(agp.Matern32Kernel())(x, 0.1), y)
    mu, C = post.mean_and_cov(jnp.zeros((0, 1)))
    assert mu.shape == (0,) and C.shape == (0, 0)
