"""Checkpoint/resume: orbax serialization of posterior caches and sampler
state.

The reference has no serialization; its incremental-state story is the
updatable posterior cache (SURVEY §5 "checkpoint/resume": ``(α, C, x, δ)``
at src/exact_gpr_posterior.jl:34, the whitened sparse cache at
src/sparse_approximations.jl:73). Here those caches — and optimizer/sampler
state (step size, mass matrix, rng keys, chain positions) — are pytrees,
so checkpointing is a single orbax round-trip. Multi-host runs restart
from the last checkpoint (pod slices are fixed-shape; no elastic
membership).
"""

from __future__ import annotations

import os

import jax

__all__ = ["save", "restore"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save(path: str, tree) -> None:
    """Serialize a pytree of arrays (posterior cache, MCMCResult, optimizer
    state, parameter trees) to ``path`` (a directory)."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()


def restore(path: str, like):
    """Restore a pytree saved with :func:`save`.

    ``like`` is a pytree with the same structure (its array leaves supply
    shape/dtype/sharding — e.g. the freshly-initialised state you would
    otherwise start from).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = _checkpointer()
    targets = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
    return ckpt.restore(path, targets)
