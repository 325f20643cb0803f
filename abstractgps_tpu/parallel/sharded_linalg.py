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

Per panel ``k`` (a ``lax.fori_loop`` with fixed-shape masked updates, so the
traced program and compile time are O(1) in the number of panels — thousands
of panels compile to one loop body):

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

__all__ = [
    "sharded_gram",
    "distributed_cholesky",
    "sharded_logpdf",
    "sharded_mean_and_var",
]

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
    """Shared in-shard factorization sweep (one ``lax.fori_loop`` over panels).

    ``A_loc``: (nb_local·B, Np) block-cyclic row slab of the padded SPD
    matrix; returns the slab overwritten with rows of L (junk above the
    diagonal — callers mask), plus (logdet, sqmahal (q,), z (Np, q)) when
    ``with_rhs`` (``delta_loc`` is a (nb_local·B, q) multi-RHS slab).

    All per-panel slices use ``lax.dynamic_slice`` / masked full-width GEMMs
    so every iteration has identical shapes: the trailing update multiplies
    against the full-width panel with rows above the diagonal zeroed, which
    touches exactly the columns the shrinking-update formulation would.
    Compile time is therefore O(1) in ``nb`` (the advisor's round-1 O(nb²)
    trace-growth finding), at the cost of ~2× the triangular FLOP count —
    the right trade at the beyond-one-chip scales this module targets.
    """
    d = lax.axis_index(axis)
    S = A_loc.shape[0]
    npad = A_loc.shape[1]
    nb_local = nb // ndev
    rows_g = _local_rows(nb_local, block, ndev, d)  # (S,)
    cols_g = jnp.arange(npad, dtype=jnp.int32)
    q = 0 if not with_rhs else delta_loc.shape[1]

    def body(k, carry):
        A_loc, delta_loc, logdet, sqmahal, z = carry
        owner = k % ndev
        lk = k // ndev
        c0 = k * block
        mine = d == owner

        # 1. replicated diagonal block (psum of the owner's candidate)
        cand = lax.dynamic_slice(A_loc, (lk * block, c0), (block, block))
        diag = lax.psum(jnp.where(mine, cand, jnp.zeros_like(cand)), axis)
        Lkk = lax.linalg.cholesky(diag)
        invT = _inv_lower(Lkk).T

        # 2. local panel rows strictly below the diagonal block
        below = (rows_g >= c0 + block)[:, None]
        pan_cols = lax.dynamic_slice(A_loc, (0, c0), (S, block))
        L21 = jnp.where(below, _mm(pan_cols, invT), 0.0)

        # 3. full panel column in global row order (the one O(N) collective)
        panel = _reorder_gather(lax.all_gather(L21, axis), nb_local, block, ndev)

        # 4. trailing SYRK update: full-width GEMM against the panel with
        # rows ≤ diagonal zeroed — updates exactly the columns > panel.
        panel_m = jnp.where((cols_g >= c0 + block)[:, None], panel, 0.0)
        A_loc = A_loc - _mm(L21, panel_m.T)

        # finalize this panel's columns (L21 below, Lkk on the owner's row)
        own_rows = lax.dynamic_update_slice(
            jnp.zeros((S, block), A_loc.dtype), Lkk, (lk * block, 0)
        )
        final = L21 + jnp.where(mine, own_rows, jnp.zeros_like(own_rows))
        A_loc = lax.dynamic_update_slice(A_loc, final, (0, c0))

        if with_rhs:
            # forward-substitute δ through this panel (replicated z_k)
            dcand = lax.dynamic_slice(delta_loc, (lk * block, 0), (block, q))
            dk = lax.psum(jnp.where(mine, dcand, jnp.zeros_like(dcand)), axis)
            zk = lax.linalg.triangular_solve(Lkk, dk, left_side=True, lower=True)
            delta_loc = delta_loc - _mm(L21, zk)
            logdet = logdet + jnp.sum(jnp.log(jnp.diagonal(Lkk)))
            sqmahal = sqmahal + jnp.sum(jnp.square(zk), axis=0)
            z = lax.dynamic_update_slice(z, zk, (c0, 0))
        return (A_loc, delta_loc, logdet, sqmahal, z)

    if not with_rhs:
        delta_loc = jnp.zeros((S, 0), A_loc.dtype)
    init = (
        A_loc,
        delta_loc,
        jnp.zeros((), A_loc.dtype),
        jnp.zeros((q,), A_loc.dtype),
        jnp.zeros((npad, q), A_loc.dtype),
    )
    A_loc, _, logdet, sqmahal, z = lax.fori_loop(0, nb, body, init)
    if with_rhs:
        return A_loc, logdet, sqmahal, z
    return A_loc


def distributed_cholesky(
    A: jax.Array, mesh: Mesh, axis: str = "tp", block: int = 256
) -> jax.Array:
    """Lower Cholesky factor of SPD ``A`` via the distributed sweep.

    Matches ``cholesky(_symmetric(A)).L`` (src/util/common_covmat_ops.jl:
    12-15) on a D-device mesh axis.

    **Scope**: this entry point is a test/oracle wrapper around the scalable
    ``_factorize_slab`` sweep — it takes a fully materialised (n, n) array,
    permutes it into block-cyclic layout on the host side of the shard_map,
    and returns the factor in natural order, so tests can compare against a
    single-device factorization directly. It therefore does NOT itself scale
    past one chip's HBM; the scalable production path is ``sharded_logpdf``,
    which builds each device's gram slab on-device and never materialises
    anything N×N on fewer than D chips.
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
        check_vma=False,  # pallas_call outputs carry no vma annotation
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

    ``y`` may be a vector (n,) → scalar, or a matrix (n, q) → (q,) of
    column-wise log-densities (reference matrix-logpdf,
    src/finite_gp_projection.jl:306-311); the extra columns ride through the
    same sweep as additional RHS.

    Correlated (dense) noise is rejected: the sweep consumes only the noise
    diagonal, so silently accepting a DenseNoise would drop its
    off-diagonals.
    """
    from ..ops.noise import DenseNoise

    if isinstance(fx.noise, DenseNoise):
        raise NotImplementedError(
            "sharded_logpdf supports isotropic/diagonal noise only; a dense "
            "(correlated) noise covariance would be silently truncated to its "
            "diagonal. Use fx.logpdf(y) for DenseNoise."
        )
    prior = fx.f
    x = fx.x
    noise_diag = fx.noise.diag()  # (N,)
    n = x.shape[0]
    ndev = mesh.shape[axis]
    npad = _padded_size(n, block, ndev)
    nb = npad // block
    nb_local = nb // ndev

    y = jnp.asarray(y)
    if y.ndim not in (1, 2) or y.shape[0] != n:
        raise ValueError(
            f"y must be (n,) or (n, q) with n={n}; got shape {y.shape}"
        )
    y_vec = y.ndim == 1
    Y = y[:, None] if y_vec else y

    m = prior.mean(x)
    delta = Y - m[:, None]
    kern = prior.kernel

    if npad != n:
        xp = jnp.pad(x, ((0, npad - n),) + ((0, 0),) * (x.ndim - 1))
        delta = jnp.pad(delta, ((0, npad - n), (0, 0)))
        noise_diag = jnp.pad(noise_diag, (0, npad - n))
    else:
        xp = x

    dtype = delta.dtype

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,  # the Pallas gram kernel's outputs carry no vma
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

        delta_loc = jnp.take(delta_rep, rows_g, axis=0)
        _, logdet, sq, _ = _factorize_slab(
            K_loc, delta_loc, nb=nb, block=block, ndev=ndev, axis=axis, with_rhs=True
        )
        return logdet, sq

    logdet, sq = jax.jit(run)(xp, delta, noise_diag.astype(dtype))
    out = -0.5 * (n * _LOG_2PI + 2.0 * logdet + sq)  # (q,)
    return out[0] if y_vec else out


def sharded_mean_and_var(
    fx,
    y: jax.Array,
    x_test,
    mesh: Mesh,
    axis: str = "tp",
    block: int = 256,
    test_chunk: int = 4096,
):
    """Exact posterior-predictive marginals with the train gram sharded.

    Semantics of ``posterior(fx, y).mean_and_var(x_test)`` (reference §3.3,
    src/exact_gpr_posterior.jl:85-90) at TP scale, via whitened prediction:
    ride the same distributed Cholesky sweep with RHS ``[δ, K(X, x*)]`` —
    forward substitution gives ``z_δ = L⁻¹δ`` and ``Z = L⁻¹K(X, x*)``, so

        mean = m(x*) + Zᵀ z_δ,     var = k**_diag − colsums(Z²)

    with NO backward solve and no N×N or N×M replication: each device
    builds only its row slab of the train gram AND of ``K(X_rows, x*)``.
    Per-panel communication is one (B, q+M) psum on top of the sweep's own
    collectives.

    ``y`` may be (n,) or (n, q) — columns are independent datasets sharing
    the same inputs (the reference's matrix-logpdf layout,
    src/finite_gp_projection.jl:306-311); mean is then (M, q).

    Test sets larger than ``test_chunk`` are chunked internally; each chunk
    re-runs the sweep (the fused design never stores the distributed
    factor), so cost is one O(N³/P) factorization per ceil(M/test_chunk)
    chunks — raise ``test_chunk`` if HBM allows (per-device RHS slab is
    (npad/ndev)·(q+test_chunk) floats).

    Same noise restriction as ``sharded_logpdf`` (diagonal-structured only).
    """
    from ..ops.noise import DenseNoise

    if isinstance(fx.noise, DenseNoise):
        raise NotImplementedError(
            "sharded_mean_and_var supports isotropic/diagonal noise only; "
            "use posterior(fx, y).mean_and_var(x_test) for DenseNoise."
        )
    prior = fx.f
    x = fx.x
    xt_all = jnp.asarray(x_test)
    if xt_all.shape[0] > test_chunk:
        means, vars_ = [], []
        for s in range(0, xt_all.shape[0], test_chunk):
            mc, vc = sharded_mean_and_var(
                fx, y, xt_all[s:s + test_chunk], mesh,
                axis=axis, block=block, test_chunk=test_chunk,
            )
            means.append(mc)
            vars_.append(vc)
        return jnp.concatenate(means, axis=0), jnp.concatenate(vars_, axis=0)
    xt = xt_all
    noise_diag = fx.noise.diag()
    n = x.shape[0]
    m_test = xt.shape[0]
    ndev = mesh.shape[axis]
    npad = _padded_size(n, block, ndev)
    nb = npad // block
    nb_local = nb // ndev

    y = jnp.asarray(y)
    y_vec = y.ndim == 1
    if y.shape[0] != n or y.ndim > 2:
        raise ValueError(f"y must be (n,) or (n, q) with n={n}; got {y.shape}")
    q = 1 if y_vec else y.shape[1]

    m = prior.mean(x)
    delta = (y - m)[:, None] if y_vec else y - m[:, None]
    kern = prior.kernel

    if npad != n:
        xp = jnp.pad(x, ((0, npad - n),) + ((0, 0),) * (x.ndim - 1))
        delta = jnp.pad(delta, ((0, npad - n), (0, 0)))
        noise_diag = jnp.pad(noise_diag, (0, npad - n))
    else:
        xp = x

    dtype = delta.dtype

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(xp_rep, xt_rep, delta_rep, noise_rep):
        d = lax.axis_index(axis)
        rows_g = _local_rows(nb_local, block, ndev, d)
        x_loc = jnp.take(xp_rep, rows_g, axis=0)
        K_loc = kernelmatrix(kern, x_loc, xp_rep).astype(dtype)
        cols_g = jnp.arange(npad, dtype=jnp.int32)[None, :]
        on_diag = rows_g[:, None] == cols_g
        K_loc = K_loc + jnp.where(on_diag, noise_rep[None, :], 0.0).astype(K_loc.dtype)
        pad_r = (rows_g[:, None] >= n) | (cols_g >= n)
        K_loc = jnp.where(pad_r, jnp.where(on_diag, 1.0, 0.0), K_loc)

        # RHS slab: [δ rows | K(x_rows, x_test)], padded rows zeroed
        Kt_loc = kernelmatrix(kern, x_loc, xt_rep).astype(dtype)
        Kt_loc = jnp.where(rows_g[:, None] >= n, 0.0, Kt_loc)
        rhs_loc = jnp.concatenate([jnp.take(delta_rep, rows_g, axis=0), Kt_loc], axis=1)

        _, _, _, z = _factorize_slab(
            K_loc, rhs_loc, nb=nb, block=block, ndev=ndev, axis=axis, with_rhs=True
        )
        z_d = z[:, :q]         # L⁻¹ δ   (npad, q)
        Z = z[:, q:]           # L⁻¹ K*  (npad, M)
        mean_c = Z.T @ z_d     # (M, q)
        var_red = jnp.sum(jnp.square(Z), axis=0)  # (M,)
        return mean_c, var_red

    mean_c, var_red = jax.jit(run)(xp, xt, delta, noise_diag.astype(dtype))
    mt = prior.mean(xt)
    mean = (mt + mean_c[:, 0]) if y_vec else (mt[:, None] + mean_c)
    var = jnp.maximum(prior.var(xt) - var_red, 0.0)
    return mean, var
