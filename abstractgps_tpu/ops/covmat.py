"""PSD / Cholesky utility kernel (L0 math core).

TPU-native re-design of the reference's covariance-matrix utility layer
(reference: src/util/common_covmat_ops.jl:1-111). The reference works with
upper-triangular Cholesky factors ``U`` (``U'U = A``); we standardise on
lower-triangular factors ``L`` (``L L' = A``, ``L = U'``) because that is the
native output of ``jax.lax.linalg.cholesky`` on TPU. Every identity below is
the exact algebraic counterpart of the reference op:

    reference (U = chol(A).U)          here (L = chol(A), L = U')
    ---------------------------------  -------------------------------
    U' \\ X                            solve(L, X)          (lower solve)
    U \\ X                             solve(L', X)         (upper solve)
    Xt_invA_X(A, X) = (U'\\X)'(U'\\X)  V = solve(L, X); V'V

All functions are pure, jit-safe, dtype-polymorphic, and differentiable via
XLA's built-in Cholesky/triangular-solve JVP rules.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "symmetrize",
    "add_jitter",
    "cholesky_lower",
    "substitution_solves",
    "solve_lower",
    "solve_upper",
    "chol_solve",
    "logdet_from_chol",
    "update_chol",
    "lowrank_update_chol",
    "Xt_A_X",
    "Xt_A_Y",
    "Xt_invA_X",
    "Xt_invA_Y",
    "At_A",
    "diag_At_A",
    "diag_At_B",
    "tr_At_A",
    "diag_Xt_A_X",
    "diag_Xt_A_Y",
    "diag_Xt_invA_X",
    "diag_Xt_invA_Y",
    "tr_Xt_invA_X",
    "Xtinv_A_Xinv",
]


def symmetrize(A: jax.Array) -> jax.Array:
    """Numerically symmetrise a square matrix: ``(A + A') / 2``.

    Counterpart of the reference's ``_symmetric`` wrap
    (src/util/common_covmat_ops.jl:5-8): Julia's ``Symmetric`` view reads one
    triangle; under XLA we realise the same guarantee by averaging.
    """
    return 0.5 * (A + A.T)


def add_jitter(A: jax.Array, jitter) -> jax.Array:
    """Add ``jitter`` to the diagonal of a square matrix."""
    n = A.shape[-1]
    return A + jitter * jnp.eye(n, dtype=A.dtype)


def cholesky_lower(A: jax.Array) -> jax.Array:
    """Lower-triangular Cholesky of a symmetric PSD matrix.

    Reference always factorises ``_symmetric(A)`` — i.e. reads one triangle
    (src/finite_gp_projection.jl:308, src/util/common_covmat_ops.jl:5-8).
    Returns L with ``L L' = A``.

    Large f32 matrices on TPU dispatch to the Pallas blocked factorization
    (ops/pallas_chol.py), whose left-looking sweep reads ONLY the lower
    triangle — the ``Symmetric`` guarantee with zero extra HBM passes.
    Everything else symmetrises by averaging and uses XLA's Cholesky.
    """
    from . import pallas_chol

    if pallas_chol.should_use_pallas(A):
        return pallas_chol.pallas_cholesky(A)
    return lax.linalg.cholesky(symmetrize(A))


_WIDE_SOLVES = True  # scoped by substitution_solves(); not thread-local


@contextlib.contextmanager
def substitution_solves():
    """Scoped opt-out of the explicit-inverse (trtri+TRMM) wide solves.

    Inside this context, ``solve_lower``/``solve_upper``/``chol_solve``
    always use XLA's backward-stable triangular substitution, even on the
    TPU fat-RHS path. Use it when the factorised matrix is ill-conditioned
    (tiny noise/jitter; see the accuracy contract in ``solve_lower``) and
    the extra accuracy of substitution is worth the ~4× throughput loss.
    Unlike ``pallas_chol.set_enabled`` this is scoped (restored on exit)
    and only affects the solve routing, not the Cholesky/gram kernels.
    """
    global _WIDE_SOLVES
    prev = _WIDE_SOLVES
    _WIDE_SOLVES = False
    try:
        yield
    finally:
        _WIDE_SOLVES = prev


def solve_lower(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``L X = B`` for lower-triangular L (reference ``U' \\ B``).

    Fat right-hand sides at TPU scale route to the trtri+GEMM path
    (``pallas_chol.solve_lower_wide`` — the posterior-prediction whitening
    solve, 4× the XLA substitution's throughput); everything else uses
    XLA's triangular solve.

    Accuracy contract for the wide path: explicit-inverse-then-multiply is
    not backward-stable — its forward error grows ~linearly with κ(L)
    instead of substitution's κ(L)·(unit roundoff of the residual). For
    Cholesky factors of noisy grams this is benign: κ(L) = √κ(K) ≤
    √(σ²_max(K)/noise), so even noise = 1e-6 against unit signal keeps
    κ(L) ≲ 1e3 and the extra f32 error ≲ 1e-4 relative (validated at
    κ(K) ≈ 1e8 in tests/test_covmat_ops.py::test_wide_solve_ill_conditioned).
    For factors of *jitter-only* grams (κ(K) ≫ 1e8 in f32) wrap the call in
    ``covmat.substitution_solves()`` to force substitution.
    """
    from . import pallas_chol

    b_vec = B.ndim == 1
    Bm = B[:, None] if b_vec else B
    if _WIDE_SOLVES and pallas_chol.should_use_wide_solve(L, Bm):
        X = pallas_chol.solve_lower_wide(L, Bm)
    else:
        X = lax.linalg.triangular_solve(
            L, Bm, left_side=True, lower=True, transpose_a=False
        )
    return X[:, 0] if b_vec else X


def solve_upper(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``L' X = B`` (upper-triangular solve; reference ``U \\ B``).

    Wide-RHS accuracy contract as for ``solve_lower``; scoped opt-out via
    ``substitution_solves()``.
    """
    from . import pallas_chol

    b_vec = B.ndim == 1
    Bm = B[:, None] if b_vec else B
    if _WIDE_SOLVES and pallas_chol.should_use_wide_solve(L, Bm):
        X = pallas_chol.solve_upper_wide(L, Bm)
    else:
        X = lax.linalg.triangular_solve(
            L, Bm, left_side=True, lower=True, transpose_a=True
        )
    return X[:, 0] if b_vec else X


def chol_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``A X = B`` given ``L = chol(A)`` (reference ``C \\ B``).

    Fat RHS at TPU scale shares ONE triangular inverse between the two
    solves (``pallas_chol.chol_solve_wide``) — the two-wide-solve
    composition would pay the ~N³/3 trtri twice.
    """
    from . import pallas_chol

    # (a 1-D B can never satisfy the wide-RHS gate, so no reshaping here)
    if _WIDE_SOLVES and B.ndim == 2 and pallas_chol.should_use_wide_solve(L, B):
        return pallas_chol.chol_solve_wide(L, B)
    return solve_upper(L, solve_lower(L, B))


def logdet_from_chol(L: jax.Array) -> jax.Array:
    """``logdet(A)`` from its Cholesky factor: ``2 sum(log(diag L))``.

    Reference: logdet(C) at src/finite_gp_projection.jl:310.
    """
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def update_chol(L11: jax.Array, C12: jax.Array, C22: jax.Array) -> jax.Array:
    """Block-extend a Cholesky factor without refactorising.

    Given ``L11 = chol(C11)`` and new blocks so that::

        C = [C11 C12;     L = [L11  0 ;
             C12' C22]         L21 L22]

    computes ``L21 = (L11 \\ C12)'`` and ``L22 = chol(C22 - L21 L21')``.
    The enabling primitive for all online/sequential conditioning
    (reference: update_chol at src/util/common_covmat_ops.jl:38-42).
    """
    L21 = solve_lower(L11, C12).T  # (n_new, n_old)
    S = C22 - L21 @ L21.T
    L22 = cholesky_lower(S)
    n_old, n_new = L11.shape[0], C22.shape[0]
    top = jnp.concatenate([L11, jnp.zeros((n_old, n_new), L11.dtype)], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def lowrank_update_chol(L: jax.Array, V: jax.Array,
                        block: int = 256) -> jax.Array:
    """Rank-k Cholesky update: returns ``chol(L L' + V V')`` in O(m²k).

    Counterpart of the reference's ``lowrankupdate!`` loop over columns
    (src/sparse_approximations.jl:109-111). The reference's sequential
    scalar-rotation recurrence is O(m²k) but hostile to the MXU (m
    dependent scalar steps); the TPU-native form is the blocked
    **orthogonal panel-LQ** algorithm:

    sweep column panels of width b. For panel i, an orthogonal
    G_i ((b+k)×(b+k)) restores triangularity of the panel row-block:
    ``[L_ii  V_i] G_i = [L̃_ii  0]`` (G_i = full Q of the QR of
    ``[L_ii V_i]ᵀ``, sign-fixed); applying the SAME G_i to the rows below,
    ``[L_below,i  V_below] G_i = [L̃_below,i  Ṽ_below]``, preserves the
    row gram (G orthogonal) and leaves a rank-k carry Ṽ for the trailing
    panels. Per panel: one small (b+k)×b QR + ONE trailing GEMM of shape
    (m−r)×(b+k)×(b+k) — total ≈ m²(b+k)²/b FLOPs ≈ O(m²k) for b ≈ k, all
    MXU work, numerically stable (orthogonal transformations only; no
    hyperbolic rotations, which an update — unlike a downdate — never
    needs).

    For small problems (m ≤ b) this degenerates to a single QR, which is
    still cheaper than assembling ``LLᵀ + VVᵀ`` and refactorising.
    """
    if V.ndim == 1:
        V = V[:, None]
    m = L.shape[0]
    k = V.shape[1]
    b = min(block, m)
    out_cols = []
    Lcur, Vcur = L, V
    for r0 in range(0, m, b):
        bb = min(b, m - r0)
        panel = jnp.concatenate(
            [Lcur[:bb, r0:r0 + bb], Vcur[:bb]], axis=1
        )  # (bb, bb+k) — rows r0.. of [L_panel V]
        Q = jnp.linalg.qr(panel.T, mode="complete")[0]       # (bb+k, bb+k)
        rot = panel @ Q                                      # (bb, bb+k)
        # sign-fix so the new diagonal is positive
        sgn = jnp.sign(jnp.diagonal(rot[:, :bb]))
        sgn = jnp.where(sgn == 0, 1.0, sgn)
        Q = Q * jnp.concatenate([sgn, jnp.ones((k,), L.dtype)])[None, :]
        new_diag = panel @ Q                                 # (bb, bb+k)
        below = jnp.concatenate(
            [Lcur[bb:, r0:r0 + bb], Vcur[bb:]], axis=1
        ) @ Q                                                # trailing GEMM
        col = jnp.concatenate(
            [jnp.tril(new_diag[:, :bb]), below[:, :bb]], axis=0
        )
        out_cols.append(jnp.pad(col, ((r0, 0), (0, 0))))
        Lcur = Lcur[bb:]
        Vcur = below[:, bb:]
    return jnp.concatenate(out_cols, axis=1)


# ---------------------------------------------------------------------------
# Quadratic-form zoo (reference: src/util/common_covmat_ops.jl:46-111).
# `L` always denotes a lower Cholesky factor of A.
# ---------------------------------------------------------------------------


def Xt_A_X(L: jax.Array, X: jax.Array) -> jax.Array:
    """``X' A X`` via ``V = L' X`` → ``V' V`` (src/util/common_covmat_ops.jl:46-50)."""
    V = L.T @ (X[:, None] if X.ndim == 1 else X)
    out = V.T @ V
    return out[0, 0] if X.ndim == 1 else symmetrize(out)


def Xt_A_Y(X: jax.Array, L: jax.Array, Y: jax.Array) -> jax.Array:
    """``X' A Y`` = ``(L'X)' (L'Y)`` (src/util/common_covmat_ops.jl:52)."""
    return (L.T @ X).T @ (L.T @ Y)


def Xt_invA_X(L: jax.Array, X: jax.Array) -> jax.Array:
    """``X' A⁻¹ X`` via whitening (src/util/common_covmat_ops.jl:54-58).

    Vector input returns the scalar ``sum(abs2, L⁻¹ x)``.
    """
    V = solve_lower(L, X)
    if X.ndim == 1:
        return jnp.sum(jnp.square(V))
    return symmetrize(V.T @ V)


def Xt_invA_Y(X: jax.Array, L: jax.Array, Y: jax.Array) -> jax.Array:
    """``X' A⁻¹ Y`` (src/util/common_covmat_ops.jl:60)."""
    return solve_lower(L, X).T @ solve_lower(L, Y)


def At_A(A: jax.Array) -> jax.Array:
    """``A' A`` (src/util/common_covmat_ops.jl:62)."""
    return A.T @ A


def diag_At_A(A: jax.Array) -> jax.Array:
    """Column-wise squared norms = ``diag(A'A)`` (src/util/common_covmat_ops.jl:64-65)."""
    if A.ndim == 1:
        return jnp.sum(jnp.square(A))[None]
    return jnp.sum(jnp.square(A), axis=0)


def diag_At_B(A: jax.Array, B: jax.Array) -> jax.Array:
    """``diag(A'B)`` without forming A'B (src/util/common_covmat_ops.jl:69-77)."""
    if A.ndim == 1:
        return jnp.dot(A, B)[None]
    return jnp.sum(A * B, axis=0)


def tr_At_A(A: jax.Array) -> jax.Array:
    """``tr(A'A) = ‖A‖_F²`` (src/util/common_covmat_ops.jl:67)."""
    return jnp.sum(jnp.square(A))


def diag_Xt_A_X(L: jax.Array, X: jax.Array) -> jax.Array:
    """``diag(X' A X)`` (src/util/common_covmat_ops.jl:79)."""
    return diag_At_A(L.T @ X)


def diag_Xt_A_Y(X: jax.Array, L: jax.Array, Y: jax.Array) -> jax.Array:
    """``diag(X' A Y)`` (src/util/common_covmat_ops.jl:81-88)."""
    return diag_At_B(L.T @ X, L.T @ Y)


def diag_Xt_invA_X(L: jax.Array, X: jax.Array) -> jax.Array:
    """``diag(X' A⁻¹ X)`` — the posterior-variance hot path
    (src/util/common_covmat_ops.jl:90)."""
    return diag_At_A(solve_lower(L, X))


def diag_Xt_invA_Y(X: jax.Array, L: jax.Array, Y: jax.Array) -> jax.Array:
    """``diag(X' A⁻¹ Y)`` (src/util/common_covmat_ops.jl:92-99)."""
    return diag_At_B(solve_lower(L, X), solve_lower(L, Y))


def tr_Xt_invA_X(L: jax.Array, X: jax.Array) -> jax.Array:
    """``tr(X' A⁻¹ X)`` — the Mahalanobis hot path
    (src/util/common_covmat_ops.jl:101)."""
    return tr_At_A(solve_lower(L, X))


def Xtinv_A_Xinv(L_A: jax.Array, L_X: jax.Array) -> jax.Array:
    """``X⁻¹ A X⁻'`` for Cholesky-factored A and X
    (src/util/common_covmat_ops.jl:103-111).

    Reference computes ``C = A.U \\ (X.U' \\ A.U')`` then ``Symmetric(C C')``.
    With lower factors (``U = L'``) this is ``C = (L_A')⁻¹ L_X⁻¹ L_A``.
    """
    C = solve_upper(L_A, solve_lower(L_X, L_A))
    return symmetrize(C @ C.T)
