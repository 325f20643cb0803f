"""Kernel layer (L1) — base interface, algebra, and input transforms.

The reference re-exports KernelFunctions.jl wholesale (src/AbstractGPs.jl:8)
and builds gram matrices via ``kernelmatrix`` / ``kernelmatrix_diag``
(src/base_gp.jl:70-74). Here kernels are parameter pytrees: hyperparameters
(lengthscales, variances, ...) are pytree *leaves*, so ``jax.grad`` flows
through them directly — no parameter-rebuild step as in the reference's
examples (examples/0-intro-1d/script.jl:112-113).

Every kernel implements three array-level ops (the TPU-native contract —
whole gram tiles, never scalar pair loops):

- ``cross(x, z) -> (N, M)``   cross-covariance matrix
- ``gram(x) -> (N, N)``       symmetric gram matrix
- ``diag(x) -> (N,)``         gram diagonal, never forming the off-diagonal

matching ``kernelmatrix(k, x, z)``, ``kernelmatrix(k, x)`` and
``kernelmatrix_diag(k, x)`` in the reference surface.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.distance import as_inputs
from ..ops.precision import precise

__all__ = [
    "Kernel",
    "kernel_pytree",
    "KernelSum",
    "KernelProduct",
    "ScaledKernel",
    "TransformedKernel",
    "ScaleTransform",
    "ARDTransform",
    "LinearTransform",
    "FunctionTransform",
    "with_lengthscale",
    "kernelmatrix",
    "kernelmatrix_diag",
]


def coerce_float(v):
    """``jnp.asarray(v, float)`` tolerant of non-numeric placeholders.

    ``register_dataclass`` unflattening re-runs ``__init__`` (and so
    ``__post_init__``); several jax internals (while_loop/AD machinery)
    probe pytree structure by unflattening with SENTINEL objects, which
    must pass through a dtype coercion untouched instead of raising.

    Genuinely invalid user input (str/bytes) is NOT a sentinel — those
    re-raise here so the error points at construction, not at a later
    trace site.
    """
    if isinstance(v, (str, bytes)):
        raise TypeError(
            f"kernel/mean parameter must be numeric, got {type(v).__name__}: {v!r}"
        )
    try:
        return jnp.asarray(v, dtype=float)
    except (TypeError, ValueError):
        return v


def kernel_pytree(*, data=(), meta=()):
    """Class decorator: frozen dataclass registered as a JAX pytree.

    ``data`` fields are differentiable leaves/children; ``meta`` fields are
    static (hashable) structure.
    """

    def wrap(cls):
        cls = dataclasses.dataclass(frozen=True)(cls)
        return jax.tree_util.register_dataclass(
            cls, data_fields=list(data), meta_fields=list(meta)
        )

    return wrap


class Kernel:
    """Base class for all kernels. Subclasses implement ``cross``/``diag``."""

    # -- core interface ----------------------------------------------------

    def cross(self, x: jax.Array, z: jax.Array) -> jax.Array:
        raise NotImplementedError

    def gram(self, x: jax.Array) -> jax.Array:
        # Default: cross(x, x). Stationary kernels override with the
        # symmetric fast path.
        x = as_inputs(x)
        return self.cross(x, x)

    def diag(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def __call__(self, x, z) -> jax.Array:
        """Scalar kernel evaluation k(x, z) for single inputs."""
        xa = jnp.atleast_1d(jnp.asarray(x, dtype=jnp.result_type(x, float)))
        za = jnp.atleast_1d(jnp.asarray(z, dtype=jnp.result_type(z, float)))
        return self.cross(xa[None, :], za[None, :])[0, 0]

    # -- algebra (KernelFunctions `+`, `*`, scalar scaling) ----------------

    def __add__(self, other):
        if isinstance(other, Kernel):
            parts = []
            for k in (self, other):
                parts.extend(k.kernels if isinstance(k, KernelSum) else (k,))
            return KernelSum(tuple(parts))
        return NotImplemented

    def __mul__(self, other):
        if isinstance(other, Kernel):
            parts = []
            for k in (self, other):
                parts.extend(k.kernels if isinstance(k, KernelProduct) else (k,))
            return KernelProduct(tuple(parts))
        # scalar σ² * k (reference: ScaledKernel)
        return ScaledKernel(self, jnp.asarray(other, dtype=jnp.result_type(other, float)))

    def __rmul__(self, other):
        return self.__mul__(other)


# ---------------------------------------------------------------------------
# Algebra
# ---------------------------------------------------------------------------


@kernel_pytree(data=("kernels",))
class KernelSum(Kernel):
    """Sum of kernels: ``(k₁ + k₂)(x, z) = k₁(x, z) + k₂(x, z)``."""

    kernels: tuple

    def cross(self, x, z):
        mats = [k.cross(x, z) for k in self.kernels]
        return sum(mats[1:], start=mats[0])

    def gram(self, x):
        mats = [k.gram(x) for k in self.kernels]
        return sum(mats[1:], start=mats[0])

    def diag(self, x):
        vecs = [k.diag(x) for k in self.kernels]
        return sum(vecs[1:], start=vecs[0])


@kernel_pytree(data=("kernels",))
class KernelProduct(Kernel):
    """Product of kernels: ``(k₁ k₂)(x, z) = k₁(x, z) · k₂(x, z)``."""

    kernels: tuple

    def cross(self, x, z):
        out = self.kernels[0].cross(x, z)
        for k in self.kernels[1:]:
            out = out * k.cross(x, z)
        return out

    def gram(self, x):
        out = self.kernels[0].gram(x)
        for k in self.kernels[1:]:
            out = out * k.gram(x)
        return out

    def diag(self, x):
        out = self.kernels[0].diag(x)
        for k in self.kernels[1:]:
            out = out * k.diag(x)
        return out


@kernel_pytree(data=("kernel", "variance"))
class ScaledKernel(Kernel):
    """``σ² · k`` — premultiplied variance (KernelFunctions ScaledKernel)."""

    kernel: Kernel
    variance: jax.Array

    def cross(self, x, z):
        return self.variance * self.kernel.cross(x, z)

    def gram(self, x):
        return self.variance * self.kernel.gram(x)

    def diag(self, x):
        return self.variance * self.kernel.diag(x)


# ---------------------------------------------------------------------------
# Input transforms (KernelFunctions ∘ Transform)
# ---------------------------------------------------------------------------


@kernel_pytree(data=("s",))
class ScaleTransform:
    """x → s·x. ``k ∘ ScaleTransform(1/ℓ)`` is a lengthscale-ℓ kernel
    (examples/1-mauna-loa/script.jl:102-115)."""

    s: jax.Array

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.s * x


@kernel_pytree(data=("v",))
class ARDTransform:
    """x → v ⊙ x with per-dimension scales v (ARD lengthscales)."""

    v: jax.Array

    def __call__(self, x: jax.Array) -> jax.Array:
        return x * self.v[None, :]


@kernel_pytree(data=("A",))
class LinearTransform:
    """x → A·x (rows transformed by A: (N, D) → (N, D'))."""

    A: jax.Array

    def __call__(self, x: jax.Array) -> jax.Array:
        return x @ self.A.T


@kernel_pytree(data=("params",), meta=("fn",))
class FunctionTransform:
    """x → fn(params, x) for an arbitrary batched feature map.

    ``fn`` must be a pure, jit-traceable function mapping an (N, D) batch to
    an (N, D') batch (the deep-kernel-learning path,
    examples/2-deep-kernel-learning/script.jl:59). ``params`` is its
    differentiable parameter pytree (possibly ``None``).
    """

    params: object
    fn: object

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.fn(self.params, x)


@kernel_pytree(data=("kernel", "transform"))
class TransformedKernel(Kernel):
    """``k ∘ t``: evaluate k on transformed inputs."""

    kernel: Kernel
    transform: object

    def _t(self, x):
        return self.transform(as_inputs(x))

    def cross(self, x, z):
        return self.kernel.cross(self._t(x), self._t(z))

    def gram(self, x):
        return self.kernel.gram(self._t(x))

    def diag(self, x):
        return self.kernel.diag(self._t(x))


def compose(kernel: Kernel, transform) -> TransformedKernel:
    """``k ∘ t`` (Julia's ``∘`` composition)."""
    return TransformedKernel(kernel, transform)


def with_lengthscale(kernel: Kernel, lengthscale) -> TransformedKernel:
    """Kernel with lengthscale ℓ: inputs scaled by 1/ℓ (KernelFunctions
    ``with_lengthscale``). Scalar ℓ → isotropic; vector ℓ → ARD."""
    ell = jnp.asarray(lengthscale, dtype=jnp.result_type(lengthscale, float))
    if ell.ndim == 0:
        return TransformedKernel(kernel, ScaleTransform(1.0 / ell))
    return TransformedKernel(kernel, ARDTransform(1.0 / ell))


# ---------------------------------------------------------------------------
# Reference-named free functions
# ---------------------------------------------------------------------------


@precise
def kernelmatrix(k: Kernel, x, z=None) -> jax.Array:
    """``kernelmatrix(k, x[, z])`` — gram or cross-gram matrix."""
    x = as_inputs(x)
    if z is None:
        return k.gram(x)
    return k.cross(x, as_inputs(z))


@precise
def kernelmatrix_diag(k: Kernel, x) -> jax.Array:
    """``kernelmatrix_diag(k, x)`` — diagonal of the gram matrix."""
    return k.diag(as_inputs(x))
