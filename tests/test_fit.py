"""Training-loop tests: MLE-II via Adam and L-BFGS, sparse VI via ELBO.

Mirrors the reference's example workflows (examples/0-intro-1d/script.jl:
369-426: L-BFGS over (lengthscale-free) kernel + noise hyperparameters).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import abstractgps_tpu as agp
from abstractgps_tpu import params as P
from abstractgps_tpu.inference import training as F


def _make_data(key, n=40, ell=0.8, sigma=1.3, noise=0.05):
    kx, ky = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(kx, (n,)) * 6.0)
    k = sigma**2 * agp.with_lengthscale(agp.Matern52Kernel(), ell)
    f = agp.GP(k)
    y = f(x, noise**2).rand(ky)
    return x, y


def _build_fx(theta, x):
    k = theta["sigma2"] * agp.with_lengthscale(agp.Matern52Kernel(), theta["ell"])
    return agp.GP(k)(x, theta["noise2"])


def _theta0():
    return {
        "ell": P.positive(1.0),
        "sigma2": P.positive(1.0),
        "noise2": P.positive(0.1),
    }


@pytest.mark.slow
def test_fit_adam_improves_nlml(key):
    x, y = _make_data(key)
    loss = F.nlml(_build_fx, x, y)
    res = F.fit(loss, _theta0(), num_steps=200, learning_rate=5e-2)
    assert res.history[-1] < res.history[0] - 1.0
    assert jnp.isfinite(res.history).all()


@pytest.mark.slow
def test_fit_lbfgs_matches_adam(key):
    x, y = _make_data(key)
    loss = F.nlml(_build_fx, x, y)
    res_adam = F.fit(loss, _theta0(), num_steps=800, learning_rate=5e-2)
    res_lb = F.fit_lbfgs(loss, _theta0(), num_steps=200)
    # both should find (roughly) the same optimum
    np.testing.assert_allclose(
        loss(res_lb.params), res_adam.history[-1], rtol=1e-2, atol=1e-2
    )
    # L-BFGS should be at a stationary point
    g = jax.grad(loss)(res_lb.params)
    gflat, _ = jax.flatten_util.ravel_pytree(g)
    assert jnp.linalg.norm(gflat) < 1e-3


@pytest.mark.slow
def test_fit_elbo_sparse(key):
    x, y = _make_data(key, n=120)
    z0 = jnp.linspace(0.0, 6.0, 16)

    def build_parts(theta, x):
        k = theta["sigma2"] * agp.with_lengthscale(
            agp.Matern52Kernel(), theta["ell"]
        )
        f = agp.GP(k)
        fz = f(theta["z"], 1e-6)
        return agp.VFE(fz), f(x, theta["noise2"])

    theta0 = {**_theta0(), "z": P.real(z0)}
    loss = F.neg_elbo(build_parts, x, y)
    res = F.fit(loss, theta0, num_steps=300, learning_rate=5e-2)
    assert res.history[-1] < res.history[0] - 1.0

    # ELBO after training is a lower bound on the exact NLML at the same θ
    c = P.constrain(res.params)
    fx = _build_fx(c, x)
    assert -res.history[-1] <= fx.logpdf(y) + 1e-6
