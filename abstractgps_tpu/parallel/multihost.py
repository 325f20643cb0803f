"""Multi-host (multi-process) runtime: jax.distributed wiring + pod meshes.

The reference has no distributed runtime at all (SURVEY §1: pure-Julia,
single process); the BASELINE north star makes "1 chip / 1 host / N≥2
hosts" a first-class axis of THIS framework with a ≥70% N-host scaling
target for sharded NUTS. The design is the standard JAX/SPMD recipe
(SURVEY §5 "Distributed communication backend"):

- one process per host, ``jax.distributed.initialize`` builds the global
  runtime (XLA owns transport: ICI within a slice, DCN/Gloo across hosts —
  no NCCL/MPI in user code);
- a **host-aware mesh**: the ``dp`` axis (chains / minibatches /
  particles — the embarrassingly-parallel dimension) maps ACROSS
  processes so its rare collectives (cross-chain diagnostics, grad psums)
  ride DCN, while ``tp`` (block-cyclic sharded linear algebra — per-panel
  psums/gathers every step) stays WITHIN a host's ICI domain;
- every array that crosses a pjit boundary is globally sharded via
  ``NamedSharding``; host-local data enters with
  ``make_array_from_process_local_data``.

All entry points degrade to single-process no-ops, so the same script runs
unmodified on one host; the 2-process CPU integration test
(tests/test_multihost.py) drives sharded training and sharded NUTS across
real OS processes over a Gloo backend — the mechanism XLA swaps for
ICI/DCN on a pod.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "is_distributed",
    "make_pod_mesh",
    "host_local_array",
    "process_index",
    "num_processes",
]

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Join the multi-process runtime (idempotent; no-op single-process).

    On TPU pods the three arguments are auto-detected from the metadata
    server, so bare ``initialize_distributed()`` is correct; on CPU/GPU
    fleets pass them explicitly or via ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` (the env-var spelling lets
    one launcher script serve every rank).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # single-process run (the degenerate pod); nothing to join
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def num_processes() -> int:
    return jax.process_count()


def make_pod_mesh(
    axis_names: tuple[str, ...] = ("dp", "tp"),
    tp: int | None = None,
) -> Mesh:
    """Host-aware 2-D mesh: ``dp`` across processes (DCN), ``tp`` within.

    ``tp`` defaults to the per-process device count, which puts every
    panel-wise linear-algebra collective on intra-host links and only the
    embarrassingly-parallel chain/batch reductions on the cross-host
    network — the layout the ≥70% scaling target needs. Pass a smaller
    ``tp`` (dividing the local device count) to split hosts into several
    dp rows. With one axis name, all devices flatten onto it
    (process-major order, so contiguous dp shards stay host-local).

    Device ORDER within the mesh is delegated to
    ``jax.experimental.mesh_utils`` (not a raw ``jax.devices()`` reshape):
    on a real slice, logical device ids are not guaranteed to enumerate in
    torus order, so a naive reshape can place a ``tp`` row on
    non-neighboring chips and push its per-panel collectives through
    multi-hop ICI routes. ``create_hybrid_device_mesh`` assigns the DCN
    (cross-process) axis to process granules and lays each granule's ICI
    axes along physical torus coordinates; single-process TPU falls to
    ``create_device_mesh`` (same torus-aware ordering, e.g. the v5e 4x2
    tray enumerates as a ring); non-TPU backends keep the process-major
    reshape, where "topology" does not exist. See
    docs/performance.md ("Pod mesh topology") for the v5e ordering note.
    """
    devs = jax.devices()
    n = len(devs)
    nproc = jax.process_count()
    local = n // nproc
    if len(axis_names) == 1:
        return Mesh(np.asarray(devs), axis_names)
    if tp is None:
        tp = local
    if local % tp != 0:
        raise ValueError(
            f"tp={tp} must divide the per-process device count {local} "
            "so tensor-parallel collectives never cross hosts"
        )
    dp = n // tp
    if devs[0].platform == "tpu":
        from jax.experimental import mesh_utils

        try:
            if nproc > 1:
                # per-process (ICI) block: (local//tp, tp); DCN axis: dp
                # spread over the process granules
                arr = mesh_utils.create_hybrid_device_mesh(
                    (local // tp, tp), (nproc, 1), devices=devs,
                    process_is_granule=True,
                ).reshape(dp, tp)
            else:
                arr = mesh_utils.create_device_mesh((dp, tp), devices=devs)
            return Mesh(arr, axis_names)
        except (ValueError, AssertionError, NotImplementedError):
            pass  # unusual topology/device-count: process-major fallback
    # CPU/GPU (or topology-helper failure): process-major reshape keeps each
    # tp row inside one process's device block
    return Mesh(np.asarray(devs).reshape(dp, tp), axis_names)


def host_local_array(global_shape, mesh: Mesh, spec: P, local_data) -> jax.Array:
    """Assemble a globally-sharded array from per-process local shards.

    Thin wrapper over ``jax.make_array_from_process_local_data`` — the
    entry path for data loading on pods (each host reads only its rows).
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_data), global_shape
    )
