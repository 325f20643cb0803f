"""Constrained-parameter handling (the ParameterHandling.jl analogue).

The reference handles hyperparameters *outside* the library via nested
NamedTuples with ``positive``/``bounded``/``fixed`` constraints and
``value_flatten`` to a flat optimizer vector
(examples/1-mauna-loa/script.jl:70-97,224;
examples/0-intro-1d/script.jl:113,390 use softplus by hand). Here the same
idea is native JAX: parameter pytrees whose leaves are tagged with
bijectors; ``unconstrain``/``constrain`` map between the unconstrained
optimisation space and the model space, and ``ravel``/``unravel`` give the
flat vector view for L-BFGS/NUTS.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = [
    "positive",
    "bounded",
    "fixed",
    "real",
    "constrain",
    "unconstrain",
    "ravel",
    "softplus",
    "inv_softplus",
]


def softplus(x):
    """Numerically stable log(1 + exp(x))."""
    return jnp.logaddexp(x, 0.0)


def inv_softplus(y):
    """Inverse of softplus: log(exp(y) − 1), stable for large y."""
    return y + jnp.log(-jnp.expm1(-y))


class _Param:
    """Base tag: a leaf value + its bijector to/from unconstrained space."""


@partial(jax.tree_util.register_dataclass, data_fields=["raw"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class Positive(_Param):
    """Positive-constrained parameter, stored unconstrained (softplus)."""

    raw: jax.Array

    @property
    def value(self):
        return softplus(self.raw)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["raw"],
    meta_fields=["lo", "hi"],
)
@dataclasses.dataclass(frozen=True)
class Bounded(_Param):
    """(lo, hi)-bounded parameter via a scaled logistic."""

    raw: jax.Array
    lo: float
    hi: float

    @property
    def value(self):
        return self.lo + (self.hi - self.lo) * jax.nn.sigmoid(self.raw)


@partial(jax.tree_util.register_dataclass, data_fields=[], meta_fields=["val"])
@dataclasses.dataclass(frozen=True)
class Fixed(_Param):
    """Non-trainable constant: contributes no leaves to the flat vector.

    The held value must be hashable metadata; wrap arrays as tuples or keep
    them outside the parameter tree.
    """

    val: object

    @property
    def value(self):
        return jnp.asarray(self.val)


def positive(value) -> Positive:
    """Tag a positive value; round-trips exactly: constrain(positive(v)) == v."""
    v = jnp.asarray(value, dtype=jnp.result_type(value, float))
    return Positive(inv_softplus(v))


def bounded(value, lo: float, hi: float) -> Bounded:
    v = jnp.asarray(value, dtype=jnp.result_type(value, float))
    p = (v - lo) / (hi - lo)
    return Bounded(jnp.log(p) - jnp.log1p(-p), lo, hi)


def fixed(value) -> Fixed:
    return Fixed(value)


def real(value) -> jax.Array:
    """Unconstrained parameter — just the array itself."""
    return jnp.asarray(value, dtype=jnp.result_type(value, float))


def constrain(tree):
    """Replace every tagged leaf by its constrained value.

    The result is a plain pytree of arrays ready to build kernels/GPs.
    """
    return jax.tree_util.tree_map(
        lambda p: p.value if isinstance(p, _Param) else p,
        tree,
        is_leaf=lambda p: isinstance(p, _Param),
    )


def unconstrain(tree):
    """The optimisation-space pytree: tagged leaves expose their raw arrays,
    Fixed leaves vanish (no gradient flows into them)."""
    return tree


def ravel(tree):
    """Flatten a (possibly tagged) parameter pytree to a flat vector +
    unravel closure (the ``value_flatten`` pattern,
    examples/1-mauna-loa/script.jl:224)."""
    flat, unravel = ravel_pytree(tree)
    return flat, unravel
