"""Multi-chip SPMD execution: mesh utilities, data-parallel objectives,
chain-parallel samplers. New TPU-first capability with no counterpart in
the reference (SURVEY §2.2, §5)."""

from .data_parallel import ShardedFitResult, fit_sharded
from .mesh import NamedSharding, P, make_mesh, replicate, shard_along
from .multihost import (
    host_local_array,
    initialize_distributed,
    is_distributed,
    make_pod_mesh,
)
from .sharded_linalg import (
    distributed_cholesky,
    sharded_gram,
    sharded_logpdf,
    sharded_mean_and_var,
)

__all__ = [
    "make_mesh",
    "shard_along",
    "replicate",
    "P",
    "NamedSharding",
    "fit_sharded",
    "ShardedFitResult",
    "distributed_cholesky",
    "sharded_gram",
    "sharded_logpdf",
    "sharded_mean_and_var",
    "initialize_distributed",
    "is_distributed",
    "make_pod_mesh",
    "host_local_array",
]
