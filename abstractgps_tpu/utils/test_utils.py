"""Conformance suites for GP implementations (downstream self-certification).

Reference: src/util/TestUtils.jl:1-220 exports three nested suites matching
the three API tiers (docs/src/api.md:49-133):

- ``test_finitegp_primary_public_interface`` (:24-71)
- ``test_finitegp_primary_and_secondary_interface`` (:87-106)
- ``test_internal_abstractgps_interface`` (:133-218), including the
  analytic invariant ``elbo(VFE(f(x, jitter)), fx, y) ≈ logpdf(fx, y)``
  when inducing points = data points (:213-217).

Plain-assert style (no pytest dependency) so any downstream GP type can
self-certify: pass a projection/process and the suite raises on the first
violated contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "test_finitegp_primary_public_interface",
    "test_finitegp_primary_and_secondary_interface",
    "test_internal_abstractgps_interface",
]

# pytest must not collect the suite functions themselves
__test__ = False


def test_finitegp_primary_public_interface(key, fx, atol=1e-6):
    """Primary Public API conformance (src/util/TestUtils.jl:24-71)."""
    __tracebackhide__ = True
    n = len(fx)

    m = fx.mean()
    v = fx.var()
    assert m.shape == (n,), f"mean shape {m.shape} != ({n},)"
    assert v.shape == (n,), f"var shape {v.shape} != ({n},)"
    assert bool(jnp.all(v >= -atol)), "negative marginal variance"

    mm, vv = fx.mean_and_var()
    np.testing.assert_allclose(mm, m, atol=atol)
    np.testing.assert_allclose(vv, v, atol=atol)

    means, stds = fx.marginals()
    np.testing.assert_allclose(means, m, atol=atol)
    np.testing.assert_allclose(np.asarray(stds) ** 2, v, atol=10 * atol)

    k1, k2 = jax.random.split(key)
    s1 = fx.rand(k1)
    assert s1.shape == (n,), "single sample shape"
    s3 = fx.rand(k1, 3)
    assert s3.shape == (n, 3), "batch sample shape"

    lp = fx.logpdf(s1)
    assert lp.shape == (), "logpdf of vector must be scalar"
    assert bool(jnp.isfinite(lp)), "non-finite logpdf"
    lps = fx.logpdf(s3)
    assert lps.shape == (3,), "column-wise logpdf shape"
    # column-wise logpdf ≡ per-column vector logpdf
    np.testing.assert_allclose(
        lps[0], fx.logpdf(s3[:, 0]), rtol=1e-5, atol=atol
    )

    y = fx.rand(k2)
    post = fx.posterior(y)
    pm = post.mean(fx.x)
    assert pm.shape == (n,), "posterior mean shape"


def test_finitegp_primary_and_secondary_interface(key, fx, atol=1e-6):
    """Adds the Secondary API: explicit covariance consistency + PSD
    (src/util/TestUtils.jl:87-106)."""
    __tracebackhide__ = True
    test_finitegp_primary_public_interface(key, fx, atol=atol)
    n = len(fx)
    C = fx.cov()
    assert C.shape == (n, n), "cov shape"
    np.testing.assert_allclose(C, C.T, atol=atol)
    np.testing.assert_allclose(jnp.diagonal(C), fx.var(), atol=10 * atol)
    m2, C2 = fx.mean_and_cov()
    np.testing.assert_allclose(m2, fx.mean(), atol=atol)
    np.testing.assert_allclose(C2, C, atol=atol)
    eigmin = float(jnp.linalg.eigvalsh(C)[0])
    assert eigmin > -1e-6, f"cov not PSD: eigmin={eigmin}"


def test_internal_abstractgps_interface(key, f, x, z, atol=1e-6):
    """Internal AbstractGPs API conformance (src/util/TestUtils.jl:133-218).

    ``f`` is any AbstractGP; ``x`` (N,D) and ``z`` (M,D) are distinct
    input sets.
    """
    __tracebackhide__ = True
    n, m_ = x.shape[0], z.shape[0]

    m = f.mean(x)
    v = f.var(x)
    C = f.cov(x)
    Cxz = f.cov(x, z)
    assert m.shape == (n,)
    assert v.shape == (n,)
    assert C.shape == (n, n)
    assert Cxz.shape == (n, m_)

    # symmetry + consistency (TestUtils :164, :172-183)
    np.testing.assert_allclose(C, C.T, atol=atol)
    np.testing.assert_allclose(jnp.diagonal(C), v, atol=10 * atol)
    np.testing.assert_allclose(Cxz, f.cov(z, x).T, atol=atol)
    np.testing.assert_allclose(f.cov(x, x), C, atol=10 * atol)

    eigmin = float(jnp.linalg.eigvalsh(C)[0])
    assert eigmin > -1e-6, f"cov not PSD: eigmin={eigmin}"

    # fused ops consistency (TestUtils :185-199)
    mc_m, mc_C = f.mean_and_cov(x)
    mv_m, mv_v = f.mean_and_var(x)
    np.testing.assert_allclose(mc_m, m, atol=atol)
    np.testing.assert_allclose(mc_C, C, atol=atol)
    np.testing.assert_allclose(mv_m, m, atol=atol)
    np.testing.assert_allclose(mv_v, v, atol=10 * atol)

    # projection round-trip (the FiniteGP suite on f(x))
    fx = f(x, 1e-3)
    test_finitegp_primary_and_secondary_interface(key, fx, atol=1e-4)

    # the analytic sparse-collapse invariant (TestUtils :213-217):
    # elbo with inducing = data equals the exact lml to rtol 1e-5
    from ..models.sparse import VFE, elbo

    y = fx.rand(key)
    lml = fx.logpdf(y)
    el = elbo(VFE(f(x, 1e-9)), fx, y)
    np.testing.assert_allclose(el, lml, rtol=1e-5, atol=1e-5)
