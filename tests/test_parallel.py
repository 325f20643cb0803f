"""SPMD tests on the 8-virtual-CPU mesh (conftest sets
xla_force_host_platform_device_count=8): sharded results must equal
single-device results exactly (same math, XLA-inserted collectives)."""

import jax
import jax.numpy as jnp
import numpy as np

import abstractgps_tpu as agp
from abstractgps_tpu import params as P_
from abstractgps_tpu.parallel import fit_sharded, make_mesh, shard_along
import pytest


def _data(key, n=256):
    kx, ky = jax.random.split(key)
    x = jax.random.uniform(kx, (n, 2)) * 4.0
    k = agp.with_lengthscale(agp.SEKernel(), 0.7)
    y = agp.GP(k)(x, 0.05).rand(ky)
    return x, y


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"dp": 8}
    mesh2 = make_mesh(8, ("dp", "tp"), (4, 2))
    assert mesh2.shape == {"dp": 4, "tp": 2}


@pytest.mark.slow
def test_sharded_elbo_matches_unsharded(key):
    x, y = _data(key)
    z = x[::16]
    kern = agp.with_lengthscale(agp.SEKernel(), 0.7)
    f = agp.GP(kern)

    def elbo_fn(x_, y_):
        fz = f(z, 1e-6)
        return agp.elbo(agp.VFE(fz), f(x_, 0.05), y_)

    expect = elbo_fn(x, y)

    mesh = make_mesh(8)
    xs = shard_along(x, mesh)
    ys = shard_along(y, mesh)
    got = jax.jit(elbo_fn)(xs, ys)
    np.testing.assert_allclose(got, expect, rtol=1e-10)

    # gradients wrt replicated hyperparameters also agree
    def loss(ell, x_, y_):
        kern_ = agp.with_lengthscale(agp.SEKernel(), ell)
        f_ = agp.GP(kern_)
        return -agp.elbo(agp.VFE(f_(z, 1e-6)), f_(x_, 0.05), y_)

    g0 = jax.grad(loss)(0.7, x, y)
    g1 = jax.jit(jax.grad(loss))(0.7, xs, ys)
    np.testing.assert_allclose(g1, g0, rtol=1e-8)


def test_sharded_logpdf_matches(key):
    # exact logpdf with data sharded: XLA gathers for the dense Cholesky,
    # but the result must be identical
    x, y = _data(key, n=64)
    f = agp.GP(agp.Matern32Kernel())

    def lp(x_, y_):
        return f(x_, 0.1).logpdf(y_)

    expect = lp(x, y)
    mesh = make_mesh(8)
    got = jax.jit(lp)(shard_along(x, mesh), shard_along(y, mesh))
    np.testing.assert_allclose(got, expect, rtol=1e-10)


@pytest.mark.slow
def test_fit_sharded_runs_and_improves(key):
    x, y = _data(key)
    z0 = x[::16]
    mesh = make_mesh(8)

    def loss(theta, data):
        x_, y_ = data
        kern = theta["sigma2"] * agp.with_lengthscale(
            agp.SEKernel(), theta["ell"]
        )
        f = agp.GP(kern)
        fz = f(theta["z"], 1e-6)
        return -agp.elbo(agp.VFE(fz), f(x_, theta["noise2"]), y_)

    raw = {
        "ell": P_.positive(1.0),
        "sigma2": P_.positive(1.0),
        "noise2": P_.positive(0.1),
        "z": P_.real(z0),
    }

    def loss_raw(rt, data):
        return loss(P_.constrain(rt), data)

    res = fit_sharded(loss_raw, raw, (x, y), mesh, num_steps=60, learning_rate=5e-2)
    assert res.history[-1] < res.history[0]
    assert jnp.isfinite(res.history).all()
