"""Device-mesh utilities for SPMD GP inference.

The reference is single-process (SURVEY §5: no distributed backend exists
in AbstractGPs.jl); multi-chip execution is a new, TPU-first capability.
The design follows the standard JAX recipe: pick a
``jax.sharding.Mesh``, annotate array shardings, and let XLA insert the
ICI collectives. Axes used across the framework:

- ``"dp"``  — data parallel: training points for sharded ELBO/logpdf,
  chains for NUTS/HMC, particles for SMC.
- ``"tp"``  — tensor parallel: block-sharded gram/Cholesky linear algebra
  for N beyond one chip's HBM (optional second axis).

There is no sequence/pipeline axis in GP inference (SURVEY §5
"long-context: N/A"); dp×tp covers the domain.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_along", "replicate", "P", "NamedSharding"]


def make_mesh(
    n_devices: int | None = None,
    axis_names: tuple[str, ...] = ("dp",),
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """Build a Mesh over the first ``n_devices`` devices.

    ``shape`` splits devices over multiple named axes, e.g.
    ``make_mesh(8, ("dp", "tp"), (4, 2))``; default is one axis holding all
    requested devices.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,)
    if len(shape) != len(axis_names):
        raise ValueError(f"shape {shape} does not match axis_names {axis_names}")
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"shape {shape} does not use exactly {n_devices} devices")
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def shard_along(x: jax.Array, mesh: Mesh, axis: str = "dp", dim: int = 0) -> jax.Array:
    """Place ``x`` on the mesh, sharded over ``axis`` along array dim ``dim``.

    The leading dim must divide the mesh-axis size (static shapes: pad at
    the call site if needed).
    """
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(tree, mesh: Mesh):
    """Fully replicate every array leaf of a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
