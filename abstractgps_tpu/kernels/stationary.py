"""Concrete kernels: stationary (isotropic) + dot-product + periodic families.

Covers the KernelFunctions.jl surface exercised by the reference's tests and
examples (SURVEY §2.1 footnote): SqExponential, Matern-1/2, 3/2, 5/2,
RationalQuadratic, Periodic, White, Constant, plus the dot-product family
(Linear / Polynomial) and GammaExponential / Cosine.

Isotropic kernels share one TPU-native path: a blocked MXU squared-distance
gram (``ops.distance.pairwise_sqdist`` or the fused Pallas kernel in
``ops.pallas_gram``) followed by an elementwise map ``_apply_sqdist`` that
XLA/Pallas fuses into the distance tiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import pallas_gram
from ..ops.distance import as_inputs, pairwise_sqdist, safe_sqrt
from .base import coerce_float, Kernel, kernel_pytree

__all__ = [
    "IsotropicKernel",
    "SqExponentialKernel",
    "SEKernel",
    "RBFKernel",
    "GaussianKernel",
    "ExponentialKernel",
    "Matern12Kernel",
    "LaplacianKernel",
    "Matern32Kernel",
    "Matern52Kernel",
    "MaternKernel",
    "RationalQuadraticKernel",
    "GammaExponentialKernel",
    "CosineKernel",
    "PeriodicKernel",
    "WhiteKernel",
    "ConstantKernel",
    "ZeroKernel",
    "LinearKernel",
    "PolynomialKernel",
    "ExponentiatedKernel",
]


class IsotropicKernel(Kernel):
    """Kernel of the form k(x, z) = g(‖x − z‖²)."""

    def _apply_sqdist(self, d2: jax.Array) -> jax.Array:
        raise NotImplementedError

    def cross(self, x, z):
        x, z = as_inputs(x), as_inputs(z)
        if pallas_gram.should_use_pallas(x, z):
            return pallas_gram.fused_isotropic_gram(self._apply_sqdist, x, z)
        return self._apply_sqdist(pairwise_sqdist(x, z))

    def gram(self, x):
        x = as_inputs(x)
        if pallas_gram.should_use_pallas(x, x):
            return pallas_gram.fused_isotropic_gram(
                self._apply_sqdist, x, x, symmetric=True
            )
        return self._apply_sqdist(pairwise_sqdist(x))

    def diag(self, x):
        n = as_inputs(x).shape[0]
        dtype = jnp.result_type(as_inputs(x).dtype, float)
        return self._apply_sqdist(jnp.zeros((n,), dtype=dtype))


@kernel_pytree()
class SqExponentialKernel(IsotropicKernel):
    """Squared-exponential (RBF): ``exp(−d²/2)``."""

    def _apply_sqdist(self, d2):
        return jnp.exp(-0.5 * d2)


SEKernel = SqExponentialKernel
RBFKernel = SqExponentialKernel
GaussianKernel = SqExponentialKernel


@kernel_pytree()
class ExponentialKernel(IsotropicKernel):
    """Exponential / Matern-1/2: ``exp(−d)``."""

    def _apply_sqdist(self, d2):
        return jnp.exp(-safe_sqrt(d2))


Matern12Kernel = ExponentialKernel
LaplacianKernel = ExponentialKernel


@kernel_pytree()
class Matern32Kernel(IsotropicKernel):
    """Matern-3/2: ``(1 + √3 d)·exp(−√3 d)``."""

    def _apply_sqdist(self, d2):
        t = jnp.sqrt(3.0) * safe_sqrt(d2)
        return (1.0 + t) * jnp.exp(-t)


@kernel_pytree()
class Matern52Kernel(IsotropicKernel):
    """Matern-5/2: ``(1 + √5 d + 5d²/3)·exp(−√5 d)``."""

    def _apply_sqdist(self, d2):
        t = jnp.sqrt(5.0) * safe_sqrt(d2)
        return (1.0 + t + t * t / 3.0) * jnp.exp(-t)


def MaternKernel(nu: float = 1.5) -> IsotropicKernel:
    """Matern kernel for half-integer ν ∈ {0.5, 1.5, 2.5}.

    General real ν needs modified Bessel functions (poor fit for the VPU and
    unused by the reference's tests/examples); the half-integer cases cover
    the full reference surface.
    """
    if nu == 0.5:
        return ExponentialKernel()
    if nu == 1.5:
        return Matern32Kernel()
    if nu == 2.5:
        return Matern52Kernel()
    raise NotImplementedError(
        f"MaternKernel only supports nu in (0.5, 1.5, 2.5); got {nu}"
    )


@kernel_pytree(data=("alpha",))
class RationalQuadraticKernel(IsotropicKernel):
    """Rational quadratic: ``(1 + d²/(2α))^(−α)``."""

    alpha: jax.Array = 2.0

    def __post_init__(self):
        object.__setattr__(self, "alpha", coerce_float(self.alpha))

    def _apply_sqdist(self, d2):
        return jnp.power(1.0 + d2 / (2.0 * self.alpha), -self.alpha)


@kernel_pytree(data=("gamma",))
class GammaExponentialKernel(IsotropicKernel):
    """γ-exponential: ``exp(−d^γ)`` for γ ∈ (0, 2]."""

    gamma: jax.Array = 1.0

    def __post_init__(self):
        object.__setattr__(self, "gamma", coerce_float(self.gamma))

    def _apply_sqdist(self, d2):
        # d^γ = (d²)^(γ/2); guard the 0^γ gradient like safe_sqrt.
        safe = jnp.where(d2 > 0.0, d2, 1.0)
        p = jnp.where(d2 > 0.0, jnp.power(safe, 0.5 * self.gamma), 0.0)
        return jnp.exp(-p)


@kernel_pytree()
class CosineKernel(IsotropicKernel):
    """Cosine kernel: ``cos(π d)``."""

    def _apply_sqdist(self, d2):
        return jnp.cos(jnp.pi * safe_sqrt(d2))


@kernel_pytree()
class WhiteKernel(Kernel):
    """White noise kernel: 1 where inputs coincide (exact elementwise
    equality, as in KernelFunctions' δ), else 0."""

    def cross(self, x, z):
        x, z = as_inputs(x), as_inputs(z)
        eq = jnp.all(x[:, None, :] == z[None, :, :], axis=-1)
        return eq.astype(jnp.result_type(x.dtype, float))

    def gram(self, x):
        # elementwise-equality semantics, consistent with cross(x, x):
        # duplicate rows in x produce 1 at coincident PAIRS, matching the
        # documented δ(x, z) definition (a hard identity here would make
        # gram(x) != cross(x, x) whenever x carries duplicates).
        # Cost note: this is an O(n²·d) broadcast-compare-reduce (one XLA
        # fusion, no O(n²·d) HBM intermediate, but d× the arithmetic of an
        # identity). Callers that can GUARANTEE distinct rows and need the
        # cheaper form can use ``jnp.eye(n)`` directly — the library keeps
        # the equality semantics because silently returning I on duplicated
        # inputs is the worse failure mode.
        return self.cross(x, x)

    def diag(self, x):
        x = as_inputs(x)
        return jnp.ones((x.shape[0],), dtype=jnp.result_type(x.dtype, float))


@kernel_pytree(data=("c",))
class ConstantKernel(Kernel):
    """Constant kernel: k(x, z) = c."""

    c: jax.Array = 1.0

    def __post_init__(self):
        object.__setattr__(self, "c", coerce_float(self.c))

    def cross(self, x, z):
        x, z = as_inputs(x), as_inputs(z)
        return jnp.full((x.shape[0], z.shape[0]), self.c)

    def diag(self, x):
        return jnp.full((as_inputs(x).shape[0],), self.c)


@kernel_pytree()
class ZeroKernel(Kernel):
    """Identically-zero kernel."""

    def cross(self, x, z):
        x, z = as_inputs(x), as_inputs(z)
        dt = jnp.result_type(x.dtype, float)
        return jnp.zeros((x.shape[0], z.shape[0]), dtype=dt)

    def diag(self, x):
        x = as_inputs(x)
        return jnp.zeros((x.shape[0],), dtype=jnp.result_type(x.dtype, float))


@kernel_pytree(data=("period",))
class PeriodicKernel(Kernel):
    """Periodic kernel (KernelFunctions parameterisation):

    ``k(x, z) = exp(−0.5 Σ_d sin²(π (x_d − z_d)) / r_d²)``

    with per-dimension inverse "roughness" r (``period`` here names r to
    match KernelFunctions' ``r`` kwarg semantics). Not isotropic — needs
    per-dimension differences, computed as a (N, M, D) broadcast (D is small
    in practice).
    """

    period: jax.Array = 1.0

    def __post_init__(self):
        p_ = coerce_float(self.period)
        if isinstance(p_, jax.Array):
            p_ = jnp.atleast_1d(p_)
        object.__setattr__(self, "period", p_)

    def cross(self, x, z):
        x, z = as_inputs(x), as_inputs(z)
        diff = x[:, None, :] - z[None, :, :]  # (N, M, D)
        s = jnp.sin(jnp.pi * diff) / self.period
        return jnp.exp(-0.5 * jnp.sum(jnp.square(s), axis=-1))

    def diag(self, x):
        x = as_inputs(x)
        return jnp.ones((x.shape[0],), dtype=jnp.result_type(x.dtype, float))


@kernel_pytree(data=("c",))
class LinearKernel(Kernel):
    """Linear kernel: ``k(x, z) = x·z + c``."""

    c: jax.Array = 0.0

    def __post_init__(self):
        object.__setattr__(self, "c", coerce_float(self.c))

    def cross(self, x, z):
        x, z = as_inputs(x), as_inputs(z)
        return x @ z.T + self.c

    def diag(self, x):
        x = as_inputs(x)
        return jnp.sum(jnp.square(x), axis=-1) + self.c


@kernel_pytree(data=("c",), meta=("degree",))
class PolynomialKernel(Kernel):
    """Polynomial kernel: ``k(x, z) = (x·z + c)^degree``."""

    degree: int = 2
    c: jax.Array = 0.0

    def __post_init__(self):
        object.__setattr__(self, "c", coerce_float(self.c))

    def cross(self, x, z):
        x, z = as_inputs(x), as_inputs(z)
        return jnp.power(x @ z.T + self.c, self.degree)

    def diag(self, x):
        x = as_inputs(x)
        return jnp.power(jnp.sum(jnp.square(x), axis=-1) + self.c, self.degree)


@kernel_pytree()
class ExponentiatedKernel(Kernel):
    """Exponentiated dot-product kernel: ``k(x, z) = exp(x·z)``."""

    def cross(self, x, z):
        x, z = as_inputs(x), as_inputs(z)
        return jnp.exp(x @ z.T)

    def diag(self, x):
        x = as_inputs(x)
        return jnp.exp(jnp.sum(jnp.square(x), axis=-1))
