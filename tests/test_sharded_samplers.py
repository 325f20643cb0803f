"""Chain/particle sharding over the 8-virtual-CPU mesh: sharded sampler
runs must execute and match unsharded statistics (same keys → identical
draws, since chain math is chip-local)."""

import jax
import jax.numpy as jnp
import numpy as np

from abstractgps_tpu.inference.mcmc import init_chain_positions, run_mcmc
from abstractgps_tpu.inference.mcmc.smc import run_smc
from abstractgps_tpu.parallel import make_mesh
import pytest


def _logdens(q):
    return -0.5 * jnp.sum(jnp.square(q))


@pytest.mark.slow
def test_sharded_nuts_matches_unsharded(key):
    k1, k2 = jax.random.split(key)
    init = init_chain_positions(k1, jnp.zeros((3,)), num_chains=8)
    kwargs = dict(num_samples=100, num_warmup=100, num_chains=8)
    res0 = run_mcmc(_logdens, init, k2, **kwargs)
    mesh = make_mesh(8)
    res1 = run_mcmc(_logdens, init, k2, mesh=mesh, **kwargs)
    # sharded compilation reorders fusions → tiny numeric drift that chaotic
    # trajectories amplify; the chains must stay statistically identical
    q0 = np.asarray(res0.positions).reshape(-1, 3)
    q1 = np.asarray(res1.positions).reshape(-1, 3)
    np.testing.assert_allclose(q1.mean(0), q0.mean(0), atol=0.15)
    np.testing.assert_allclose(q1.var(0), q0.var(0), atol=0.3)
    np.testing.assert_allclose(
        np.asarray(res1.step_size), np.asarray(res0.step_size), rtol=1e-2
    )


def test_sharded_smc_runs(key):
    k1, k2 = jax.random.split(key)
    y = jnp.array([0.5, -0.3])

    def logprior(q):
        return -0.5 * jnp.sum(q * q)

    def loglik(q):
        return -0.5 * jnp.sum(jnp.square(q - y)) / 0.5

    particles0 = jax.random.normal(k1, (1024, 2))
    mesh = make_mesh(8)
    res = run_smc(logprior, loglik, particles0, k2, mesh=mesh)
    qs = np.asarray(res.particles)
    post_var = 1.0 / (1.0 + 2.0)
    post_mean = post_var * np.asarray(y) / 0.5
    np.testing.assert_allclose(qs.mean(0), post_mean, atol=0.1)
    np.testing.assert_allclose(qs.var(0), post_var, atol=0.1)
