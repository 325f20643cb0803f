"""Constrained-parameter handling tests (the ParameterHandling.jl analogue).

Reference patterns: nested NamedTuples with positive/fixed constraints and
value_flatten (examples/1-mauna-loa/script.jl:70-97,224).
"""

import jax
import jax.numpy as jnp
import numpy as np

from abstractgps_tpu import params as P


def test_softplus_roundtrip():
    v = jnp.array([0.01, 1.0, 5.0, 50.0])
    np.testing.assert_allclose(P.softplus(P.inv_softplus(v)), v, rtol=1e-12)


def test_positive_roundtrip():
    p = P.positive(2.5)
    np.testing.assert_allclose(P.constrain(p), 2.5, rtol=1e-12)


def test_bounded_roundtrip():
    p = P.bounded(0.3, 0.0, 1.0)
    np.testing.assert_allclose(P.constrain(p), 0.3, rtol=1e-10)
    p2 = P.bounded(-2.0, -5.0, 5.0)
    np.testing.assert_allclose(P.constrain(p2), -2.0, rtol=1e-10)


def test_constrain_nested_tree():
    theta = {
        "kernel": {"ell": P.positive(1.5), "sigma": P.positive(0.5)},
        "noise": P.positive(0.1),
        "mean": P.real(3.0),
    }
    c = P.constrain(theta)
    np.testing.assert_allclose(c["kernel"]["ell"], 1.5, rtol=1e-10)
    np.testing.assert_allclose(c["noise"], 0.1, rtol=1e-10)
    np.testing.assert_allclose(c["mean"], 3.0)


def test_grad_flows_through_positive():
    theta = {"ell": P.positive(2.0)}

    def loss(t):
        c = P.constrain(t)
        return jnp.square(c["ell"] - 1.0)

    g = jax.grad(loss)(theta)
    # d/draw (softplus(raw) - 1)^2 = 2(softplus(raw)-1)*sigmoid(raw)
    raw = theta["ell"].raw
    expect = 2.0 * (P.softplus(raw) - 1.0) * jax.nn.sigmoid(raw)
    np.testing.assert_allclose(g["ell"].raw, expect, rtol=1e-10)


def test_ravel_unravel():
    theta = {"a": P.positive(1.0), "b": P.real(jnp.array([1.0, 2.0]))}
    flat, unravel = P.ravel(theta)
    assert flat.ndim == 1
    back = unravel(flat)
    np.testing.assert_allclose(
        P.constrain(back)["a"], P.constrain(theta)["a"], rtol=1e-12
    )
    np.testing.assert_allclose(back["b"], theta["b"])


def test_fixed_has_no_leaves():
    theta = {"a": P.positive(1.0), "b": P.fixed(7.0)}
    leaves = jax.tree_util.tree_leaves(theta)
    # Fixed contributes no differentiable leaves
    assert len(leaves) == 1
    np.testing.assert_allclose(P.constrain(theta)["b"], 7.0)
