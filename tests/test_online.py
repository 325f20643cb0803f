"""Online (streaming) conditioning: padded static-shape updates must equal
batch conditioning exactly (the reference's sequential≡batch invariant,
test/exact_gpr_posterior.jl:29-43, under jit-stable shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

import abstractgps_tpu as agp
import pytest

from abstractgps_tpu.models.online import (
    online_extend,
    online_init,
    online_mean_and_var,
)


@pytest.mark.slow
def test_online_matches_batch(key):
    k1, k2, k3 = jax.random.split(key, 3)
    n, b, d = 32, 8, 2
    x = jax.random.uniform(k1, (n, d))
    f = agp.GP(agp.Matern52Kernel())
    y = f(x, 0.1).rand(k2)
    x_test = jax.random.uniform(k3, (10, d))

    state = online_init(f, capacity=64, input_dim=d, dtype=x.dtype)
    for i in range(0, n, b):
        state = online_extend(state, x[i:i + b], y[i:i + b], 0.1)
    mu_o, var_o = online_mean_and_var(state, x_test)

    post = agp.posterior(f(x, 0.1), y)
    mu_b, var_b = post.mean_and_var(x_test)

    np.testing.assert_allclose(mu_o, mu_b, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(var_o, var_b, rtol=1e-7, atol=1e-8)
    assert int(state.count) == n


def test_online_compiles_once_under_scan(key):
    # the whole streaming loop is one compiled program
    k1, k2 = jax.random.split(key)
    n, b, d = 48, 8, 1
    x = jnp.sort(jax.random.uniform(k1, (n,)))[:, None]
    f = agp.GP(agp.SEKernel())
    y = f(x, 0.05).rand(k2)

    state0 = online_init(f, capacity=n, input_dim=d, dtype=x.dtype)
    blocks = (x.reshape(n // b, b, d), y.reshape(n // b, b))

    @jax.jit
    def stream(state, blocks):
        def step(s, xy):
            xb, yb = xy
            s = online_extend(s, xb, yb, 0.05)
            m, v = online_mean_and_var(s, x[:4])
            return s, (m, v)

        return jax.lax.scan(step, state, blocks)

    state, (ms, vs) = stream(state0, blocks)
    post = agp.posterior(f(x, 0.05), y)
    mu_b, var_b = post.mean_and_var(x[:4])
    np.testing.assert_allclose(ms[-1], mu_b, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(vs[-1], var_b, rtol=1e-6, atol=1e-8)
    # intermediate predictions must be finite and variances shrink over time
    assert np.isfinite(np.asarray(ms)).all()
    assert float(vs[0].mean()) >= float(vs[-1].mean()) - 1e-9


def test_online_extend_past_capacity_poisons(key):
    # overflow must NOT silently clamp-overwrite valid rows: the cache
    # NaN-poisons so downstream predictions are visibly invalid
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (12, 1))
    y = jnp.sin(x[:, 0])
    f = agp.GP(agp.Matern32Kernel())
    st = online_init(f, capacity=8, input_dim=1, dtype=jnp.float64)
    st = online_extend(st, x[:8], y[:8], 0.1)
    m0, _ = online_mean_and_var(st, x[:2])
    assert bool(jnp.isfinite(m0).all())
    st = online_extend(st, x[8:], y[8:], 0.1)  # 12 > capacity 8
    m1, v1 = online_mean_and_var(st, x[:2])
    assert bool(jnp.isnan(m1).all()), m1


def test_online_prior_is_traced_not_static(key):
    # prior hyperparameters are pytree DATA: two different variances reuse
    # one compiled program (meta/static registration would retrace, and a
    # jax.Array in a static field is unhashable)
    import numpy as np

    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (6, 1))
    y = jnp.sin(x[:, 0])

    traces = []

    @jax.jit
    def step(st):
        traces.append(1)
        return online_extend(st, x, y, 0.1)

    for s2 in (1.0, 2.5):
        f = agp.GP(jnp.float64(s2) * agp.Matern32Kernel())
        st = online_init(f, capacity=8, input_dim=1, dtype=jnp.float64)
        st2 = step(st)
        m, _ = online_mean_and_var(st2, x[:2])
        assert bool(jnp.isfinite(m).all())
    assert len(traces) == 1, "prior hyperparameters retraced the program"
