"""Structured observation-noise covariance Σy.

The reference stores Σy as one of ``Fill(σ², n)`` (isotropic),
``Diagonal(σ²vec)`` (heteroscedastic), or a dense matrix
(src/finite_gp_projection.jl:13-21). Dispatch on those types drives several
O(N) vs O(N³) fast paths (e.g. the sparse ELBO trace term,
src/sparse_approximations.jl:307-313). We reproduce the same structure as
three pytree dataclasses with a common interface; all are static-shape and
jit-safe.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import covmat

DEFAULT_NOISE_VARIANCE = 1e-18  # reference default_σ², src/finite_gp_projection.jl:17


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["variance"],
    meta_fields=["n"],
)
@dataclasses.dataclass(frozen=True)
class IsotropicNoise:
    """``σ² I_n`` — reference ``Fill(σ², n)`` (src/finite_gp_projection.jl:19-21)."""

    variance: jax.Array  # scalar
    n: int

    def add_to(self, K: jax.Array) -> jax.Array:
        return K + self.variance * jnp.eye(self.n, dtype=K.dtype)

    def diag(self) -> jax.Array:
        return jnp.broadcast_to(jnp.asarray(self.variance), (self.n,))

    def dense(self, dtype=None) -> jax.Array:
        return self.variance * jnp.eye(self.n, dtype=dtype)

    def chol_diag(self) -> jax.Array:
        """Diagonal of chol(Σy) (Σy is diagonal so chol is diagonal)."""
        return jnp.sqrt(self.diag())

    def logdet(self) -> jax.Array:
        return self.n * jnp.log(self.variance)

    def solve_sqrt(self, B: jax.Array) -> jax.Array:
        """``chol(Σy)⁻¹ B`` (whitening by the noise)."""
        s = jnp.sqrt(self.variance)
        return B / s

    def tr_solve(self, diag_Cf: jax.Array) -> jax.Array:
        """``tr(Cf Σy⁻¹)`` given diag(Cf) — src/sparse_approximations.jl:311-313."""
        return jnp.sum(diag_Cf) / self.variance


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["variances"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class DiagonalNoise:
    """``Diagonal(σ²vec)`` — reference src/finite_gp_projection.jl:13-15."""

    variances: jax.Array  # (n,)

    @property
    def n(self) -> int:
        return self.variances.shape[0]

    def add_to(self, K: jax.Array) -> jax.Array:
        return K + jnp.diag(self.variances.astype(K.dtype))

    def diag(self) -> jax.Array:
        return self.variances

    def dense(self, dtype=None) -> jax.Array:
        return jnp.diag(self.variances.astype(dtype) if dtype else self.variances)

    def chol_diag(self) -> jax.Array:
        return jnp.sqrt(self.variances)

    def logdet(self) -> jax.Array:
        return jnp.sum(jnp.log(self.variances))

    def solve_sqrt(self, B: jax.Array) -> jax.Array:
        s = jnp.sqrt(self.variances)
        return B / (s if B.ndim == 1 else s[:, None])

    def tr_solve(self, diag_Cf: jax.Array) -> jax.Array:
        """src/sparse_approximations.jl:307-309."""
        return jnp.sum(diag_Cf / self.variances)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cov"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class DenseNoise:
    """Full correlated noise covariance matrix (src/finite_gp_projection.jl:7-11)."""

    cov: jax.Array  # (n, n)

    @property
    def n(self) -> int:
        return self.cov.shape[0]

    def add_to(self, K: jax.Array) -> jax.Array:
        return K + self.cov

    def diag(self) -> jax.Array:
        return jnp.diagonal(self.cov)

    def dense(self, dtype=None) -> jax.Array:
        return self.cov.astype(dtype) if dtype else self.cov

    def _chol(self) -> jax.Array:
        return covmat.cholesky_lower(self.cov)

    def chol_diag(self) -> jax.Array:
        return jnp.diagonal(self._chol())

    def logdet(self) -> jax.Array:
        return covmat.logdet_from_chol(self._chol())

    def solve_sqrt(self, B: jax.Array) -> jax.Array:
        return covmat.solve_lower(self._chol(), B)

    def tr_solve(self, diag_Cf: jax.Array) -> jax.Array:
        raise NotImplementedError(
            "tr(Cf Σy⁻¹) with dense Σy is unsupported, matching the reference "
            "(sparse approximations require Diagonal/Isotropic noise; "
            "test/sparse_approximations.jl:127)."
        )


Noise = IsotropicNoise | DiagonalNoise | DenseNoise


def noise_block_diag(a: Noise, b: Noise) -> Noise:
    """Block-diagonal concatenation of two noise covariances.

    Used when appending observations to a sparse posterior cache
    (reference assembles ``[Σy_old 0; 0 Σy_new]`` at
    src/sparse_approximations.jl:99-100). Structure is preserved where
    possible (diag ⊕ diag → diag).
    """
    if isinstance(a, DenseNoise) or isinstance(b, DenseNoise):
        da, db = a.dense(), b.dense()
        na, nb = da.shape[0], db.shape[0]
        top = jnp.concatenate([da, jnp.zeros((na, nb), da.dtype)], axis=1)
        bot = jnp.concatenate([jnp.zeros((nb, na), db.dtype), db], axis=1)
        return DenseNoise(jnp.concatenate([top, bot], axis=0))
    return DiagonalNoise(jnp.concatenate([a.diag(), b.diag()]))


def as_noise(sigma2, n: int) -> Noise:
    """Normalise user noise input to a Noise pytree.

    Accepts ``None`` (reference default jitter 1e-18), a scalar, an (n,)
    vector, an (n, n) matrix, or an existing Noise object — mirroring the
    FiniteGP constructors at src/finite_gp_projection.jl:13-21.
    """
    if sigma2 is None:
        return IsotropicNoise(jnp.asarray(DEFAULT_NOISE_VARIANCE), n)
    if isinstance(sigma2, (IsotropicNoise, DiagonalNoise, DenseNoise)):
        return sigma2
    arr = jnp.asarray(sigma2)
    if arr.ndim == 0:
        return IsotropicNoise(arr, n)
    if arr.ndim == 1:
        if arr.shape[0] != n:
            raise ValueError(f"noise vector length {arr.shape[0]} != n ({n})")
        return DiagonalNoise(arr)
    if arr.ndim == 2:
        if arr.shape != (n, n):
            raise ValueError(f"noise matrix shape {arr.shape} != ({n}, {n})")
        return DenseNoise(arr)
    raise ValueError(f"cannot interpret noise of ndim {arr.ndim}")
