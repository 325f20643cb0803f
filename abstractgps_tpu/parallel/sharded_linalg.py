"""Tensor-parallel (TP) sharded gram + distributed blocked Cholesky.

The reference is single-process dense LAPACK (SURVEY §1 L0;
src/util/common_covmat_ops.jl delegates to Julia `LinearAlgebra`), so exact
GP regression dies at one machine's memory. This module is the TP axis of
the new framework (SURVEY §2.2 "Parallelism strategies", §5 "long-context"):
the N×N gram matrix is **block-cyclically row-sharded** over a mesh axis and
factorized in place by a right-looking distributed Cholesky, so exact
inference scales past one chip's HBM.

Layout. With D devices on axis ``tp``, panel width B, and padded size
``Np = nb·B`` (``nb % D == 0``), global row-block ``g`` lives on device
``g % D`` at local slot ``g // D`` — classic 1-D block-cyclic, which keeps
the trailing-update FLOPs balanced as the factorization shrinks.

Per panel ``k`` (all static Python loop → one traced XLA program):

1. owner's updated diagonal block → ``psum``-broadcast (B×B over ICI),
   every device factorizes the tiny block redundantly (cheaper than a
   second collective for ``L_kk``);
2. each device forms its local panel rows ``L21 = A[:, k] · L_kk^{-T}``
   (GEMM, MXU) — masked to rows strictly below the panel;
3. ``all_gather`` of the panel column (Np×B over ICI) — the only O(N)
   collective; total traffic over the factorization is ~Np² words,
   i.e. reading the matrix once over ICI;
4. local trailing SYRK update ``A[:, k+1:] -= L21 · P[k+1:, :]ᵀ`` (GEMM).

``sharded_logpdf`` fuses the log-marginal-likelihood (reference §3.1,
src/finite_gp_projection.jl:306-311) into the same sweep: the residual
``δ = y − m`` rides along as one extra RHS column, forward-substituted
panel-by-panel, so ``logdet`` and the Mahalanobis term come out of the
factorization with zero extra passes and O(B) extra communication per
panel. The gram slab itself is built on-device from the (replicated,
small) inputs — the N×N matrix never exists on fewer than D chips.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.base import Kernel, kernelmatrix

__all__ = ["sharded_gram", "distributed_cholesky", "sharded_logpdf"]

_LOG_2PI = math.log(2.0 * math.pi)


def _hi(x):
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def _mm(a, b):
    return jnp.matmul(a, b, precision=_hi(a))


def _inv_lower(L):
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)


def _padded_size(n: int, block: int, ndev: int) -> int:
    chunk = block * ndev
    return ((n + chunk - 1) // chunk) * chunk


def sharded_gram(kernel: Kernel, x: jax.Array, mesh: Mesh, axis: str = "tp"):
    """K(x, x) computed and left row-sharded over ``axis`` (never gathered).

    Semantics of ``kernelmatrix(k, x)`` (src/base_gp.jl:70); each device
    computes its contiguous row slab ``k(x_d, x)`` — O(N²d/D) per device.
    """
    sharding = NamedSharding(mesh, P(axis, None))
    fn = jax.jit(lambda xx: kernelmatrix(kernel, xx), out_shardings=sharding)
    return fn(x)


# ---------------------------------------------------------------------------
# Distributed block-cyclic right-looking Cholesky (the shard_map body).
# ---------------------------------------------------------------------------


def _local_rows(nb_local: int, block: int, ndev: int, d):
    """Global row indices held by device ``d`` (block-cyclic)."""
    blk = jnp.arange(nb_local, dtype=jnp.int32) * ndev  # + d below
    base = (blk[:, None] + d) * block + jnp.arange(block, dtype=jnp.int32)[None, :]
    return base.reshape(-1)  # (nb_local * block,)


def _reorder_gather(parts: jax.Array, nb_local: int, block: int, ndev: int):
    """(D, S, B) all_gather output → (Np, B) in global row order."""
    npad = ndev * nb_local * block
    return (
        parts.reshape(ndev, nb_local, block, block)
        .transpose(1, 0, 2, 3)
        .reshape(npad, block)
    )


def _factorize_slab(A_loc, delta_loc, *, nb, block, ndev, axis, with_rhs):
    """Shared in-shard factorization sweep.

    ``A_loc``: (nb_local·B, Np) block-cyclic row slab of the padded SPD
    matrix; returns the slab overwritten with rows of L (junk above the
    diagonal — callers mask), plus (logdet, sqmahal, z-blocks) when
    ``with_rhs``.
    """
    d = lax.axis_index(axis)
    S = A_loc.shape[0]
    npad = A_loc.shape[1]
    nb_local = nb // ndev
    rows_g = _local_rows(nb_local, block, ndev, d)  # (S,)

    logdet = jnp.zeros((), A_loc.dtype)
    sqmahal = jnp.zeros((), A_loc.dtype)
    zs = []

    for k in range(nb):
        owner = k % ndev
        lk = k // ndev
        c0, c1 = k * block, (k + 1) * block
        mine = (d == owner)

        # 1. replicated diagonal block (psum of the owner's candidate)
        cand = A_loc[lk * block:(lk + 1) * block, c0:c1]
        diag = lax.psum(jnp.where(mine, cand, jnp.zeros_like(cand)), axis)
        Lkk = lax.linalg.cholesky(diag)
        invT = _inv_lower(Lkk).T

        # 2. local panel rows below the diagonal block
        below = (rows_g >= c1)[:, None]
        L21 = jnp.where(below, _mm(A_loc[:, c0:c1], invT), 0.0)

        # 3. full panel column in global row order (the one O(N) collective)
        panel = _reorder_gather(lax.all_gather(L21, axis), nb_local, block, ndev)

        # 4. trailing SYRK update + finalize this panel's columns
        if c1 < npad:
            A_loc = A_loc.at[:, c1:].add(-_mm(L21, panel[c1:, :].T))
        own_rows = jnp.zeros((S, block), A_loc.dtype)
        own_rows = own_rows.at[lk * block:(lk + 1) * block, :].set(Lkk)
        final = L21 + jnp.where(mine, own_rows, jnp.zeros_like(own_rows))
        A_loc = A_loc.at[:, c0:c1].set(final)

        if with_rhs:
            # forward-substitute δ through this panel (replicated z_k)
            dcand = delta_loc[lk * block:(lk + 1) * block]
            dk = lax.psum(jnp.where(mine, dcand, jnp.zeros_like(dcand)), axis)
            zk = lax.linalg.triangular_solve(
                Lkk, dk[:, None], left_side=True, lower=True
            )[:, 0]
            delta_loc = delta_loc - _mm(L21, zk[:, None])[:, 0]
            logdet = logdet + jnp.sum(jnp.log(jnp.diagonal(Lkk)))
            sqmahal = sqmahal + jnp.dot(zk, zk, precision=_hi(zk))
            zs.append(zk)

    if with_rhs:
        return A_loc, logdet, sqmahal, jnp.concatenate(zs)
    return A_loc


def distributed_cholesky(
    A: jax.Array, mesh: Mesh, axis: str = "tp", block: int = 256
) -> jax.Array:
    """Lower Cholesky factor of SPD ``A`` via the distributed sweep.

    Matches ``cholesky(_symmetric(A)).L`` (src/util/common_covmat_ops.jl:
    12-15) on a D-device mesh axis. ``A`` may be any (n, n) array; it is
    padded to a block-cyclic layout internally. The result is returned in
    natural order (row-sharded over ``axis``), so tests can compare against
    a single-device factorization directly.
    """
    n = A.shape[-1]
    ndev = mesh.shape[axis]
    npad = _padded_size(n, block, ndev)
    nb = npad // block
    nb_local = nb // ndev
    S = nb_local * block

    if npad != n:
        A = jnp.pad(A, ((0, npad - n), (0, npad - n)))
        A = A + jnp.diag(
            jnp.concatenate([jnp.zeros((n,), A.dtype), jnp.ones((npad - n,), A.dtype)])
        )

    # block-cyclic row permutation: device-major gather order
    perm = (
        jnp.arange(nb, dtype=jnp.int32)
        .reshape(nb_local, ndev).T.reshape(-1)  # blocks in device order
    )
    row_perm = (perm[:, None] * block + jnp.arange(block, dtype=jnp.int32)[None, :]).reshape(-1)
    A_cyc = jnp.take(A, row_perm, axis=0)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
    )
    def run(A_loc):
        return _factorize_slab(
            A_loc, None, nb=nb, block=block, ndev=ndev, axis=axis, with_rhs=False
        )

    L_cyc = jax.jit(run)(A_cyc)
    inv_perm = jnp.argsort(row_perm)
    L = jnp.take(L_cyc, inv_perm, axis=0)
    rows = jnp.arange(npad)[:, None]
    cols = jnp.arange(npad)[None, :]
    return jnp.where(rows >= cols, L, 0.0)[:n, :n]


def sharded_logpdf(
    fx,
    y: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    block: int = 256,
) -> jax.Array:
    """Exact log marginal likelihood with the N×N gram sharded over ``axis``.

    Semantics of ``logpdf(fx, y)`` (src/finite_gp_projection.jl:306-311) for
    a ``GP``-prior FiniteGP with isotropic/diagonal noise, at scale: each
    device builds only its block-cyclic row slab of ``K + Σy`` from the
    replicated inputs, the distributed sweep factorizes it, and ``δ = y − m``
    forward-substitutes through the same sweep. Peak per-device memory is
    ~2·Np²/D floats; nothing N×N is ever replicated.
    """
    prior = fx.f
    x = fx.x
    noise_diag = fx.noise.diag()  # (N,)
    n = x.shape[0]
    ndev = mesh.shape[axis]
    npad = _padded_size(n, block, ndev)
    nb = npad // block
    nb_local = nb // ndev

    m = prior.mean(x)
    delta = y - m
    kern = prior.kernel

    if npad != n:
        xp = jnp.pad(x, ((0, npad - n),) + ((0, 0),) * (x.ndim - 1))
        delta = jnp.pad(delta, (0, npad - n))
        noise_diag = jnp.pad(noise_diag, (0, npad - n))
    else:
        xp = x

    dtype = delta.dtype

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
    )
    def run(xp_rep, delta_rep, noise_rep):
        d = lax.axis_index(axis)
        rows_g = _local_rows(nb_local, block, ndev, d)
        x_loc = jnp.take(xp_rep, rows_g, axis=0)
        # local gram slab in the padded/identity-extended form: real block
        # k(x_loc, x) + Σy on the diagonal; padded rows/cols → identity so
        # they contribute log(1)=0 and z=0.
        K_loc = kernelmatrix(kern, x_loc, xp_rep).astype(dtype)
        cols_g = jnp.arange(npad, dtype=jnp.int32)[None, :]
        on_diag = rows_g[:, None] == cols_g
        K_loc = K_loc + jnp.where(on_diag, noise_rep[None, :], 0.0).astype(K_loc.dtype)
        pad_r = (rows_g[:, None] >= n) | (cols_g >= n)
        K_loc = jnp.where(pad_r, jnp.where(on_diag, 1.0, 0.0), K_loc)

        delta_loc = jnp.take(delta_rep, rows_g)
        _, logdet, sq, _ = _factorize_slab(
            K_loc, delta_loc, nb=nb, block=block, ndev=ndev, axis=axis, with_rhs=True
        )
        return logdet, sq

    logdet, sq = jax.jit(run)(xp, delta, noise_diag.astype(dtype))
    return -0.5 * (n * _LOG_2PI + 2.0 * logdet + sq)
