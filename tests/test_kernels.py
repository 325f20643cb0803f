"""Kernel layer tests: values vs closed forms, algebra, transforms, AD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import abstractgps_tpu as agp
from abstractgps_tpu.kernels import (
    ConstantKernel,
    CosineKernel,
    ExponentialKernel,
    ExponentiatedKernel,
    GammaExponentialKernel,
    LinearKernel,
    Matern32Kernel,
    Matern52Kernel,
    MaternKernel,
    PeriodicKernel,
    PolynomialKernel,
    RationalQuadraticKernel,
    SqExponentialKernel,
    WhiteKernel,
    ZeroKernel,
)
from abstractgps_tpu.kernels.base import kernelmatrix, kernelmatrix_diag, with_lengthscale

ALL_KERNELS = [
    SqExponentialKernel(),
    ExponentialKernel(),
    Matern32Kernel(),
    Matern52Kernel(),
    RationalQuadraticKernel(2.0),
    GammaExponentialKernel(1.5),
    CosineKernel(),
    PeriodicKernel(1.3),
    WhiteKernel(),
    ConstantKernel(2.5),
    ZeroKernel(),
    LinearKernel(0.5),
    PolynomialKernel(2, 1.0),
    ExponentiatedKernel(),
]


@pytest.mark.parametrize("k", ALL_KERNELS, ids=lambda k: type(k).__name__)
@pytest.mark.parametrize("d", [1, 3])
def test_gram_consistency(k, d, rng):
    x = jnp.asarray(rng.standard_normal((7, d)))
    z = jnp.asarray(rng.standard_normal((5, d)))
    K = kernelmatrix(k, x)
    # symmetry + diag consistency + cross consistency
    assert K.shape == (7, 7)
    assert np.allclose(K, K.T, atol=1e-12)
    assert np.allclose(np.diag(K), kernelmatrix_diag(k, x), atol=1e-10)
    assert np.allclose(K, kernelmatrix(k, x, x), atol=1e-10)
    Kxz = kernelmatrix(k, x, z)
    assert Kxz.shape == (7, 5)
    assert np.allclose(Kxz, kernelmatrix(k, z, x).T, atol=1e-12)
    # PSD (up to round-off); the cosine kernel is only PSD on R¹
    if not (isinstance(k, CosineKernel) and d > 1):
        ev = np.linalg.eigvalsh(np.asarray(K, dtype=np.float64))
        assert ev.min() > -1e-8


def test_closed_forms(rng):
    x = jnp.asarray(rng.standard_normal((6, 2)))
    z = jnp.asarray(rng.standard_normal((4, 2)))
    d = np.linalg.norm(np.asarray(x)[:, None, :] - np.asarray(z)[None, :, :], axis=-1)
    checks = [
        (SqExponentialKernel(), np.exp(-0.5 * d**2)),
        (ExponentialKernel(), np.exp(-d)),
        (Matern32Kernel(), (1 + np.sqrt(3) * d) * np.exp(-np.sqrt(3) * d)),
        (Matern52Kernel(), (1 + np.sqrt(5) * d + 5 * d**2 / 3) * np.exp(-np.sqrt(5) * d)),
        (RationalQuadraticKernel(2.0), (1 + d**2 / 4) ** (-2.0)),
        (CosineKernel(), np.cos(np.pi * d)),
    ]
    for k, expected in checks:
        assert np.allclose(kernelmatrix(k, x, z), expected, atol=1e-10), type(k).__name__


def test_matern_dispatch():
    assert isinstance(MaternKernel(0.5), ExponentialKernel)
    assert isinstance(MaternKernel(1.5), Matern32Kernel)
    assert isinstance(MaternKernel(2.5), Matern52Kernel)
    with pytest.raises(NotImplementedError):
        MaternKernel(1.0)


def test_white_kernel(rng):
    x = jnp.asarray(rng.standard_normal((5, 1)))
    assert np.allclose(kernelmatrix(WhiteKernel(), x), np.eye(5))
    assert np.allclose(kernelmatrix_diag(WhiteKernel(), x), np.ones(5))


def test_algebra(rng):
    x = jnp.asarray(rng.standard_normal((6, 1)))
    k1, k2 = SqExponentialKernel(), Matern32Kernel()
    K1, K2 = kernelmatrix(k1, x), kernelmatrix(k2, x)
    assert np.allclose(kernelmatrix(k1 + k2, x), K1 + K2, atol=1e-12)
    assert np.allclose(kernelmatrix(k1 * k2, x), K1 * K2, atol=1e-12)
    assert np.allclose(kernelmatrix(3.0 * k1, x), 3.0 * K1, atol=1e-12)
    assert np.allclose(kernelmatrix(k1 * 3.0, x), 3.0 * K1, atol=1e-12)
    # n-ary flattening
    ks = k1 + k2 + k1
    assert len(ks.kernels) == 3
    assert np.allclose(kernelmatrix(ks, x), 2 * K1 + K2, atol=1e-12)
    # diag paths
    assert np.allclose(
        kernelmatrix_diag(k1 + 2.0 * k2, x), np.diag(K1 + 2 * K2), atol=1e-12
    )


def test_lengthscale(rng):
    x = jnp.asarray(rng.standard_normal((6, 1)))
    k = with_lengthscale(SqExponentialKernel(), 2.0)
    expected = kernelmatrix(SqExponentialKernel(), x / 2.0)
    assert np.allclose(kernelmatrix(k, x), expected, atol=1e-12)
    # ARD
    x2 = jnp.asarray(rng.standard_normal((6, 3)))
    ell = jnp.array([0.5, 1.0, 2.0])
    k_ard = with_lengthscale(SqExponentialKernel(), ell)
    expected = kernelmatrix(SqExponentialKernel(), x2 / ell[None, :])
    assert np.allclose(kernelmatrix(k_ard, x2), expected, atol=1e-12)


def test_function_transform(rng):
    # deep-kernel path: feature map inside the kernel
    x = jnp.asarray(rng.standard_normal((6, 2)))
    W = jnp.asarray(rng.standard_normal((3, 2)))

    def feat(params, xb):
        return jnp.tanh(xb @ params.T)

    k = agp.compose(SqExponentialKernel(), agp.FunctionTransform(W, feat))
    expected = kernelmatrix(SqExponentialKernel(), jnp.tanh(x @ W.T))
    assert np.allclose(kernelmatrix(k, x), expected, atol=1e-12)
    # gradient flows into the feature-map params
    g = jax.grad(lambda W_: jnp.sum(
        kernelmatrix(agp.compose(SqExponentialKernel(), agp.FunctionTransform(W_, feat)), x)
    ))(W)
    assert np.all(np.isfinite(g)) and np.any(np.abs(g) > 0)


def test_kernel_params_differentiable(rng):
    x = jnp.asarray(rng.standard_normal((8, 1)))

    def obj(ell, sigma2, alpha):
        k = sigma2 * with_lengthscale(RationalQuadraticKernel(alpha), ell)
        return jnp.sum(kernelmatrix(k, x))

    g = jax.grad(obj, argnums=(0, 1, 2))(jnp.array(0.7), jnp.array(1.3), jnp.array(2.0))
    eps = 1e-6
    for i, (name, val) in enumerate([("ell", 0.7), ("sigma2", 1.3), ("alpha", 2.0)]):
        args_p = [jnp.array(0.7), jnp.array(1.3), jnp.array(2.0)]
        args_m = [jnp.array(0.7), jnp.array(1.3), jnp.array(2.0)]
        args_p[i] = args_p[i] + eps
        args_m[i] = args_m[i] - eps
        fd = (obj(*args_p) - obj(*args_m)) / (2 * eps)
        assert np.allclose(g[i], fd, rtol=1e-4), name


def test_grad_at_zero_distance_finite(rng):
    # safe_sqrt: Matern gradients on the gram diagonal must be finite
    x = jnp.asarray(rng.standard_normal((5, 1)))
    for k_fn in [ExponentialKernel, Matern32Kernel, Matern52Kernel]:
        g = jax.grad(lambda x_: jnp.sum(kernelmatrix(k_fn(), x_)))(x)
        assert np.all(np.isfinite(g)), k_fn.__name__


def test_scalar_call():
    k = SqExponentialKernel()
    v = k(0.0, 1.0)
    assert np.allclose(v, np.exp(-0.5))


def test_input_containers(rng):
    # ColVecs/RowVecs equivalents (reference src/AbstractGPs.jl:15,35)
    X = rng.standard_normal((3, 6))  # 3 dims, 6 observations (columns)
    xc = agp.col_vecs(X)
    xr = agp.row_vecs(X.T)
    assert xc.shape == (6, 3)
    assert np.allclose(xc, xr)
    assert np.allclose(agp.as_inputs(jnp.asarray(X), obsdim=2), xc)


def test_invalid_string_param_raises_at_construction():
    # coerce_float must not swallow genuinely invalid (str) parameters —
    # they should fail at construction, not at an obscure later trace site
    import abstractgps_tpu as agp
    from abstractgps_tpu.means import ConstMean

    with pytest.raises(TypeError, match="numeric"):
        agp.RationalQuadraticKernel(alpha="not-a-number")
    with pytest.raises(TypeError, match="numeric"):
        ConstMean("oops")


def test_white_kernel_gram_cross_consistent_with_duplicates():
    # gram(x) must equal cross(x, x) even when x contains duplicate rows
    x = jnp.asarray([[0.0], [1.0], [1.0], [2.0]])
    k = WhiteKernel()
    np.testing.assert_array_equal(
        np.asarray(kernelmatrix(k, x)), np.asarray(kernelmatrix(k, x, x))
    )
    assert float(kernelmatrix(k, x)[1, 2]) == 1.0  # coincident pair


def test_gamma_sample_independent_components(key):
    from abstractgps_tpu.distributions import Gamma

    d = Gamma(concentration=2.0, rate=jnp.ones(5))
    s = d.sample(key)
    assert s.shape == (5,)
    assert len(np.unique(np.asarray(s))) == 5, s  # not rank-1 correlated
