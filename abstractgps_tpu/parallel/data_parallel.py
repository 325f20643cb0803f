"""Data-parallel sharded objectives and training steps.

SPMD over a ``Mesh``: training data is sharded along the ``"dp"`` axis,
hyperparameters are replicated, and XLA inserts the ICI collectives
(`psum` for the cross-shard contractions) from the sharding annotations —
the scaling-book recipe, not hand-written NCCL (SURVEY §5 "distributed
communication backend").

The collapsed Titsias ELBO (src/sparse_approximations.jl:289-305)
distributes cleanly over data shards: with ``A = L_z⁻¹ Kzx Σy^{-1/2}``
sharded over columns (data), the global reductions are

    A·A' = Σ_shards A_s A_s'      (psum of m×m)
    A·δ  = Σ_shards A_s δ_s       (psum of m)
    ‖δ‖² = Σ_shards ‖δ_s‖²        (psum of scalar)

so per-step communication is O(m²), independent of N — ideal ICI traffic.
All of that falls out of `jit` given sharded inputs; nothing here needs
`shard_map`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import optax
from jax.sharding import Mesh

from .mesh import replicate, shard_along

__all__ = ["fit_sharded", "ShardedFitResult"]


class ShardedFitResult(NamedTuple):
    params: object
    history: jax.Array


def fit_sharded(
    loss: Callable,
    theta0,
    data,
    mesh: Mesh,
    *,
    axis: str = "dp",
    optimizer: optax.GradientTransformation | None = None,
    num_steps: int = 500,
    learning_rate: float = 1e-2,
) -> ShardedFitResult:
    """Minimise ``loss(raw_theta, data)`` with data sharded over ``axis``.

    ``data`` is a pytree of arrays whose leading dimension is the data
    dimension; each leaf is sharded along ``axis`` (leading dim must divide
    the mesh-axis size). ``theta0`` is replicated. The scan-of-steps runs
    as a single SPMD program over the mesh.
    """
    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    data = jax.tree_util.tree_map(lambda a: shard_along(a, mesh, axis), data)
    theta0 = replicate(theta0, mesh)
    opt_state = replicate(optimizer.init(theta0), mesh)

    def run(theta, opt_state, data):
        # data enters as a jit ARGUMENT, never a closure constant — a
        # multi-host sharded array cannot be baked into the program
        # (non-addressable shards), and passing it also keeps the compiled
        # program reusable across datasets of the same shape.
        def step(carry, _):
            theta, opt_state = carry
            val, grads = jax.value_and_grad(loss)(theta, data)
            updates, opt_state = optimizer.update(grads, opt_state, theta)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state), val

        return jax.lax.scan(step, (theta, opt_state), None, length=num_steps)

    (theta, _), history = jax.jit(run)(theta0, opt_state, data)
    return ShardedFitResult(theta, history)
