"""Mean functions (reference: src/mean_function.jl:1-55).

``mean_vector(m, x)`` evaluates a mean function over a batch of inputs
(shape (N,) or (N, D)) and returns an (N,) vector. ZeroMean/ConstMean avoid
per-point evaluation entirely (the reference's lazy Zeros/Fill become plain
broadcasts — free under XLA fusion).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .ops.distance import as_inputs

__all__ = ["ZeroMean", "ConstMean", "CustomMean", "mean_vector", "as_mean"]


@partial(jax.tree_util.register_dataclass, data_fields=[], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ZeroMean:
    """Zero everywhere (src/mean_function.jl:27)."""

    def __call__(self, x: jax.Array) -> jax.Array:
        n = as_inputs(x).shape[0]
        return jnp.zeros((n,), dtype=jnp.result_type(as_inputs(x).dtype, float))


@partial(jax.tree_util.register_dataclass, data_fields=["c"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ConstMean:
    """Constant c everywhere (src/mean_function.jl:40)."""

    c: jax.Array

    def __post_init__(self):
        if isinstance(self.c, (str, bytes)):
            raise TypeError(
                f"ConstMean value must be numeric, got {type(self.c).__name__}: "
                f"{self.c!r}"
            )
        try:
            c = jnp.asarray(self.c, dtype=jnp.result_type(self.c, float))
        except (TypeError, ValueError):
            c = self.c  # pytree-unflatten sentinel probe: pass through
        object.__setattr__(self, "c", c)

    def __call__(self, x: jax.Array) -> jax.Array:
        n = as_inputs(x).shape[0]
        return jnp.broadcast_to(self.c, (n,))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["params"],
    meta_fields=["fn", "batched"],
)
@dataclasses.dataclass(frozen=True)
class CustomMean:
    """Arbitrary mean function (src/mean_function.jl:52-55).

    ``fn`` is a pure jit-traceable callable. By default it is treated as a
    per-point function of a single input (scalar for 1-D inputs, a (D,)
    vector otherwise) and is ``vmap``-ed over the batch — the analogue of the
    reference's ``map`` over ColVecs/RowVecs columns/rows. Set
    ``batched=True`` if ``fn`` already maps an (N, D) batch to (N,).
    ``params`` is an optional differentiable parameter pytree, passed as
    ``fn(params, x)`` when not None; parameterless functions take ``fn(x)``.
    """

    fn: object
    params: object = None
    batched: bool = False

    def _eval(self, x_point_or_batch):
        if self.params is None:
            return self.fn(x_point_or_batch)
        return self.fn(self.params, x_point_or_batch)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.asarray(x)
        if self.batched:
            out = self._eval(x)
        elif x.ndim <= 1:
            out = jax.vmap(self._eval)(x)
        else:
            out = jax.vmap(self._eval)(as_inputs(x))
        return jnp.reshape(out, (-1,))


def mean_vector(m, x) -> jax.Array:
    """Evaluate a mean function over inputs (reference ``mean_vector``)."""
    return m(x)


def as_mean(m):
    """Normalise constructor sugar (reference src/base_gp.jl:62-64):
    ``None``→ZeroMean, real→ConstMean, callable→CustomMean, or pass through."""
    if m is None:
        return ZeroMean()
    if isinstance(m, (ZeroMean, ConstMean, CustomMean)):
        return m
    if callable(m) and not isinstance(m, (int, float)):
        return CustomMean(m)
    return ConstMean(jnp.asarray(m, dtype=float))
