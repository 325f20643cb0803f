"""AbstractGP interface + the concrete GP prior (L2).

Reference: src/abstract_gp.jl (interface) and src/base_gp.jl (GP prior).

The Internal AbstractGPs API contract (docs/src/api.md:99-133) is preserved:
every GP type implements ``mean(x)``, ``cov(x)``, ``cov(x, z)``, ``var(x)``,
with fused ``mean_and_cov`` / ``mean_and_var`` defaulting to the pair
(src/abstract_gp.jl:56,64). ``var`` is always implemented directly, never as
``diag(cov)`` (docs/src/api.md:133). Projection ``f(x, σ²)`` returns a
FiniteGP; posteriors are themselves AbstractGPs so the whole machinery
composes recursively (the reference's key architectural idea).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax

from ..kernels.base import Kernel
from ..means import as_mean, mean_vector
from ..ops.precision import precise
from ..ops.distance import as_inputs

__all__ = ["AbstractGP", "GP", "mean", "cov", "var", "mean_and_cov", "mean_and_var"]


class AbstractGP:
    """Base for all GP types (reference src/abstract_gp.jl:12)."""

    def mean(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def cov(self, x: jax.Array, z: jax.Array | None = None) -> jax.Array:
        raise NotImplementedError

    def var(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def mean_and_cov(self, x: jax.Array):
        # default: the tuple (src/abstract_gp.jl:56)
        return self.mean(x), self.cov(x)

    def mean_and_var(self, x: jax.Array):
        # default: the tuple (src/abstract_gp.jl:64)
        return self.mean(x), self.var(x)

    def __call__(self, x, noise=None, obsdim: int | None = None):
        """Project onto finite inputs: ``f(x, σ²)`` → FiniteGP
        (src/finite_gp_projection.jl:32-37)."""
        from .finite_gp import FiniteGP

        return FiniteGP.create(self, as_inputs(x, obsdim=obsdim), noise)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["mean_fn", "kernel"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class GP(AbstractGP):
    """GP prior = mean function + kernel (reference src/base_gp.jl:57-60).

    Constructor sugar matches src/base_gp.jl:62-64:
    ``GP(kernel)`` (zero mean), ``GP(c, kernel)`` (constant mean),
    ``GP(fn, kernel)`` (custom mean).
    """

    mean_fn: object
    kernel: Kernel

    def __init__(self, mean_fn=None, kernel: Kernel | None = None):
        # Supports GP(kernel), GP(mean, kernel), and the pytree-unflatten
        # call GP(mean_fn=..., kernel=...).
        if kernel is None:
            if not isinstance(mean_fn, Kernel):
                raise TypeError("GP(kernel) requires a Kernel")
            object.__setattr__(self, "mean_fn", as_mean(None))
            object.__setattr__(self, "kernel", mean_fn)
        else:
            object.__setattr__(self, "mean_fn", as_mean(mean_fn))
            object.__setattr__(self, "kernel", kernel)

    # Internal AbstractGPs API (src/base_gp.jl:68-74)
    @precise
    def mean(self, x):
        return mean_vector(self.mean_fn, x)

    @precise
    def cov(self, x, z=None):
        if z is None:
            return self.kernel.gram(as_inputs(x))
        return self.kernel.cross(as_inputs(x), as_inputs(z))

    @precise
    def var(self, x):
        return self.kernel.diag(as_inputs(x))


# ---------------------------------------------------------------------------
# Reference-named free functions over (f, x) pairs
# ---------------------------------------------------------------------------


def mean(f: AbstractGP, x) -> jax.Array:
    return f.mean(x)


def cov(f: AbstractGP, x, z=None) -> jax.Array:
    return f.cov(x, z)


def var(f: AbstractGP, x) -> jax.Array:
    return f.var(x)


def mean_and_cov(f: AbstractGP, x):
    return f.mean_and_cov(x)


def mean_and_var(f: AbstractGP, x):
    return f.mean_and_var(x)
