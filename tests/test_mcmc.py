"""MCMC correctness: posterior moments on analytic targets (reference
strategy: MCMC posterior moments must match within Monte-Carlo error,
BASELINE.json north star; statistical-test pattern of
test/finite_gp_projection.jl:84-104).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import abstractgps_tpu as agp
from abstractgps_tpu.inference.mcmc import (
    init_chain_positions,
    run_mcmc,
    window_schedule,
)


def test_window_schedule_covers_warmup():
    is_win, is_end = window_schedule(1000)
    assert is_win.shape == (1000,)
    # windows live strictly between the buffers
    assert not bool(is_win[:75].any())
    assert not bool(is_win[950:].any())
    assert bool(is_win[75:950].all())
    # last window closes at step 949
    assert bool(is_end[949])
    assert int(is_end.sum()) >= 3


@pytest.mark.parametrize("algorithm", ["nuts", "hmc"])
def test_standard_normal_moments(key, algorithm):
    dim = 4

    def logdens(q):
        return -0.5 * jnp.sum(jnp.square(q))

    k1, k2 = jax.random.split(key)
    init = init_chain_positions(k1, jnp.zeros((dim,)), num_chains=4)
    res = run_mcmc(
        logdens, init, k2,
        num_samples=1000, num_warmup=500, num_chains=4, algorithm=algorithm,
    )
    qs = res.positions.reshape(-1, dim)
    assert qs.shape[0] == 4000
    np.testing.assert_allclose(qs.mean(0), np.zeros(dim), atol=0.1)
    np.testing.assert_allclose(qs.var(0), np.ones(dim), atol=0.15)
    assert float(res.accept_prob.mean()) > 0.6


def test_correlated_gaussian_moments(key):
    # N(mu, Sigma) with strong correlation — exercises mass adaptation
    mu = jnp.array([1.0, -2.0, 0.5])
    A = jnp.array([[2.0, 0.0, 0.0], [1.5, 0.5, 0.0], [-1.0, 0.3, 0.2]])
    Sigma = A @ A.T
    Sigma_inv = jnp.linalg.inv(Sigma)

    def logdens(q):
        d = q - mu
        return -0.5 * d @ Sigma_inv @ d

    k1, k2 = jax.random.split(key)
    init = init_chain_positions(k1, jnp.zeros((3,)), num_chains=4)
    res = run_mcmc(logdens, init, k2, num_samples=2000, num_warmup=1000,
                   num_chains=4)
    qs = res.positions.reshape(-1, 3)
    np.testing.assert_allclose(qs.mean(0), mu, atol=0.15)
    emp_cov = np.cov(np.asarray(qs).T)
    np.testing.assert_allclose(emp_cov, Sigma, atol=0.5, rtol=0.25)
    assert float(res.diverging.mean()) < 0.05


@pytest.mark.slow
def test_nuts_gp_hyperparameter_posterior(key):
    # smoke: NUTS over (log-lengthscale, log-variance, log-noise) of a GP
    # marginal likelihood + weak prior; checks finiteness and movement
    kx, ky, kc, ks = jax.random.split(key, 4)
    x = jnp.sort(jax.random.uniform(kx, (30,)) * 5.0)
    f = agp.GP(1.2 * agp.with_lengthscale(agp.Matern32Kernel(), 0.7))
    y = f(x, 0.05).rand(ky)

    def logdens(theta):
        ell, s2, n2 = (jnp.exp(theta["log_ell"]), jnp.exp(theta["log_s2"]),
                       jnp.exp(theta["log_n2"]))
        k = s2 * agp.with_lengthscale(agp.Matern32Kernel(), ell)
        lml = agp.GP(k)(x, n2).logpdf(y)
        logprior = -0.5 * (
            theta["log_ell"] ** 2 + theta["log_s2"] ** 2
            + (theta["log_n2"] + 3.0) ** 2
        )
        return lml + logprior

    theta0 = {"log_ell": jnp.array(0.0), "log_s2": jnp.array(0.0),
              "log_n2": jnp.array(-3.0)}
    init = init_chain_positions(kc, theta0, num_chains=2, jitter=0.5)
    res = run_mcmc(logdens, init, ks, num_samples=300, num_warmup=300,
                   num_chains=2)
    ells = np.exp(np.asarray(res.positions["log_ell"]).ravel())
    assert np.isfinite(res.logdens).all()
    # posterior over lengthscale should concentrate near truth (loose check)
    assert 0.2 < np.median(ells) < 3.0
    # chains actually move
    assert np.std(ells) > 1e-3


def test_segmented_run_bit_identical(key):
    """segment_size cuts the run into multiple device executions; the scan
    recurrence is unchanged, so draws must be BIT-identical to the
    unsegmented run (the long-execution-window escape hatch)."""
    def logdens(q):
        return -0.5 * jnp.sum(q * q / jnp.array([1.0, 4.0]))

    init = init_chain_positions(key, jnp.zeros((2,)), num_chains=4)
    a = run_mcmc(logdens, init, key, num_chains=4, num_samples=30,
                 num_warmup=40, max_depth=6)
    b = run_mcmc(logdens, init, key, num_chains=4, num_samples=30,
                 num_warmup=40, max_depth=6, segment_size=16)
    np.testing.assert_array_equal(np.asarray(a.positions),
                                  np.asarray(b.positions))
    np.testing.assert_array_equal(np.asarray(a.logdens),
                                  np.asarray(b.logdens))
    np.testing.assert_array_equal(np.asarray(a.step_size),
                                  np.asarray(b.step_size))


def test_program_cache_rejects_config_mismatch(key):
    from abstractgps_tpu.inference.mcmc import init_chain_positions, run_mcmc

    def ld_a(q):
        return -0.5 * jnp.sum(q * q)

    def ld_b(q):
        return -0.5 * jnp.sum((q - 1.0) ** 2)

    init = init_chain_positions(key, jnp.zeros((2,)), num_chains=2)
    cache = {}
    run_mcmc(ld_a, init, key, num_chains=2, num_samples=4, num_warmup=4,
             segment_size=2, program_cache=cache)
    # same config + same logdensity reuses fine
    run_mcmc(ld_a, init, key, num_chains=2, num_samples=4, num_warmup=4,
             segment_size=2, program_cache=cache)
    # a different model with the same shapes must be refused, not
    # silently sampled from the cached (wrong) programs
    with pytest.raises(ValueError, match="different configuration"):
        run_mcmc(ld_b, init, key, num_chains=2, num_samples=4,
                 num_warmup=4, segment_size=2, program_cache=cache)


def test_program_cache_pins_logdensity_against_id_reuse(key):
    """CPython recycles object ids after GC: a rebuilt-per-call closure can
    draw the SAME id as the dead one the cache was fingerprinted with,
    silently sampling the first call's model. The cache must therefore hold
    a strong reference to the original logdensity (so its id stays taken)
    and refuse a rebuilt — even semantically identical — closure."""
    import gc

    from abstractgps_tpu.inference.mcmc import init_chain_positions, run_mcmc

    init = init_chain_positions(key, jnp.zeros((2,)), num_chains=2)
    cache = {}

    def make_ld():
        def ld(q):
            return -0.5 * jnp.sum(q * q)
        return ld

    first = make_ld()
    run_mcmc(first, init, key, num_chains=2, num_samples=4, num_warmup=4,
             segment_size=2, program_cache=cache)
    # the cache itself must keep the closure alive (the fingerprint's id
    # must never be reusable while the cache lives)
    assert cache["_logdensity"] is first
    del first
    gc.collect()
    assert cache["_config"][0] == id(cache["_logdensity"])
    # a rebuilt closure — whatever id it lands on — must be refused
    with pytest.raises(ValueError, match="different configuration"):
        run_mcmc(make_ld(), init, key, num_chains=2, num_samples=4,
                 num_warmup=4, segment_size=2, program_cache=cache)
