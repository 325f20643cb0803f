"""Pairwise-distance primitives (the gram-matrix inner loop).

The reference delegates gram construction to KernelFunctions.jl's
``kernelmatrix`` (used at src/base_gp.jl:70-74). On TPU the hot path is the
MXU-friendly expansion ``‖x‖² + ‖z‖² − 2·x·zᵀ`` — one big matmul plus rank-1
broadcasts, which XLA fuses with the downstream elementwise kernel map.

Inputs are canonicalised to shape (N, D): a 1-D array of N scalars becomes
(N, 1). This subsumes the reference's ColVecs/RowVecs input wrappers
(src/AbstractGPs.jl:15): ``as_inputs(X, obsdim=...)`` converts a raw matrix
the same way ``KernelFunctions.vec_of_vecs`` does at
src/finite_gp_projection.jl:33-37.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["as_inputs", "col_vecs", "row_vecs", "pairwise_sqdist", "sq_norms", "safe_sqrt"]


def as_inputs(x, obsdim: int | None = None) -> jax.Array:
    """Canonicalise inputs to a (N, D) array.

    - 1-D array of N scalars → (N, 1)
    - 2-D array: rows are observations by default (``obsdim=1``-style /
      RowVecs). Pass ``obsdim=2`` (Julia convention: observations along
      columns / ColVecs, KernelFunctions' default) to transpose.
    """
    x = jnp.asarray(x)
    if x.ndim == 0:
        return x.reshape(1, 1)
    if x.ndim == 1:
        return x[:, None]
    if x.ndim == 2:
        if obsdim == 2:
            return x.T
        return x
    raise ValueError(f"inputs must be 1-D or 2-D, got ndim={x.ndim}")


def col_vecs(X) -> jax.Array:
    """ColVecs(X): observations are the *columns* of X → (N, D) array."""
    return jnp.asarray(X).T


def row_vecs(X) -> jax.Array:
    """RowVecs(X): observations are the *rows* of X → (N, D) array."""
    return jnp.asarray(X)


def sq_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared norms of an (N, D) array."""
    return jnp.sum(jnp.square(x), axis=-1)


def _dist_precision():
    """MXU precision for the distance matmul: ALWAYS HIGHEST (bf16x6),
    independent of the ambient context and of the library-wide policy.

    The ``‖x‖² + ‖z‖² − 2·x·zᵀ`` expansion is cancellation-prone: one
    single-pass bf16 matmul (TPU DEFAULT) gives ~1e-2 absolute gram error,
    which silently corrupts Cholesky pivots, and even HIGH (bf16x3) gives
    ~6.5e-5 absolute gram error — measured on TPU v5e to push the smallest
    eigenvalue of a 64-point Matern-5/2 gram to −1.4e-4, past any jitter
    ≤1e-4 (NaN factor). HIGHEST brings the gram to ~4.6e-6 (f32-quality,
    mineig −3e-6). Cost is irrelevant: the distance matmul is O(N²·D)
    against the factorization's O(N³/3) — <1% of the hot path at N=8192,
    D=8 — so unlike the Cholesky panel GEMMs (floored at HIGH for speed)
    this primitive always takes the accurate path.
    """
    return jax.lax.Precision.HIGHEST


def pairwise_sqdist(x: jax.Array, z: jax.Array | None = None) -> jax.Array:
    """Pairwise squared Euclidean distances between rows of x and z.

    Uses the MXU expansion; clamps tiny negatives from cancellation to 0.
    For the symmetric case (z is None) the diagonal is exactly zero.
    """
    x = as_inputs(x)
    prec = _dist_precision() if x.dtype == jnp.float32 else None
    if z is None:
        g = jnp.matmul(x, x.T, precision=prec)
        nx = jnp.diagonal(g)
        d2 = nx[:, None] + nx[None, :] - 2.0 * g
        d2 = jnp.maximum(d2, 0.0)
        n = x.shape[0]
        return d2 * (1.0 - jnp.eye(n, dtype=d2.dtype))
    z = as_inputs(z)
    d2 = (
        sq_norms(x)[:, None]
        + sq_norms(z)[None, :]
        - 2.0 * jnp.matmul(x, z.T, precision=prec)
    )
    return jnp.maximum(d2, 0.0)


def safe_sqrt(d2: jax.Array) -> jax.Array:
    """sqrt with a finite gradient at 0.

    ``d/dx sqrt(x) → ∞`` as x→0, which poisons Matern/Exponential kernel
    gradients on the gram diagonal. The where-trick keeps both primal and
    tangent finite (the primal at the masked points is exactly 0).
    """
    safe = jnp.where(d2 > 0.0, d2, 1.0)
    return jnp.where(d2 > 0.0, jnp.sqrt(safe), 0.0)
