"""Pallas blocked Cholesky / TRSM kernels (the factorization hot path).

Reference semantics: every ``cholesky(_symmetric(...))`` call site —
src/finite_gp_projection.jl:235,273,308, src/exact_gpr_posterior.jl:31,
src/sparse_approximations.jl:61-69,296-305. The reference delegates to
LAPACK ``dpotrf``; the TPU-native design is a right-looking blocked
factorization

    for each panel k:
        L_kk = chol(A_kk)                (Pallas VMEM kernel, serial part)
        L_21 = A_21 · L_kk^{-T}          (GEMM on the MXU)
        A_22 -= L_21 · L_21'             (SYRK, GEMM on the MXU)

where the O(B³) *serial* diagonal-block factorization — the part XLA's
CholeskyExpander emits as a long dependent HLO chain — is a single Pallas
kernel doing B rank-1 VPU updates entirely in VMEM, and everything O(N²·B)
and above is a plain MXU matmul that XLA schedules optimally. The B×B
triangular inverse used to turn the panel TRSM into a GEMM costs O(B³)
once per panel and is numerically safe here: diagonal blocks of a jittered
PSD matrix are themselves well-conditioned.

Differentiation is a ``custom_jvp`` implementing the Cholesky differential
(Murray 2016): with ``X = L⁻¹ Ȧ L⁻ᵀ``, ``L̇ = L·φ(X)``, ``φ`` = strict lower
triangle plus half the diagonal. The rule is linear in the tangent, so JAX
derives the reverse mode by transposition — no refactorization and no
fallback to ``lax.linalg`` on the backward pass.

``solve_lower_wide`` / ``solve_upper_wide`` handle large fat-RHS
triangular solves (reference ``U' \\ B`` sites) as trtri + one GEMM —
substitution-style solves re-read the running RHS once per panel and
measured 7-10× off the GEMM roofline at N=8192, M=4096.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

_INTERPRET = False  # set True in tests to run the kernels on CPU
_ENABLED = True
_MIN_N = 1024       # below this XLA's expander is already fine
_BLOCK = 128        # panel width (128 = MXU tile; measured fastest at N=8192)


def set_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = flag


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def should_use_pallas(A: jax.Array) -> bool:
    if not _ENABLED:
        return False
    if not _INTERPRET and jax.default_backend() != "tpu":
        return False
    if A.ndim != 2 or A.dtype != jnp.float32:
        return False
    return A.shape[-1] >= _MIN_N


# ---------------------------------------------------------------------------
# Fused diagonal-block factorization + inverse: one Pallas kernel.
# ---------------------------------------------------------------------------


_GROUP = 8  # columns factored per M/W read-modify-write cycle


def _chol_inv_block_body(a_ref, lt_ref, w_ref, m_scr):
    """Factor one VMEM-resident SPD block AND invert its factor, in
    B/_GROUP statically-unrolled group steps.

    Writes ``lt_ref = Lᵀ`` (row j = column j of L — rows are the cheap
    static-store dimension on TPU; the caller transposes once) and
    ``w_ref = L⁻¹``.

    Group formulation (replaces the round-2 per-column masked-reduction
    kernel at 105 µs/block + the separate XLA ``_inv_lower`` at
    69 µs/block — together ~90% of the factorization wall time): _GROUP
    columns are produced per cycle from one static (R,B)/(B,R) row/column
    read of the symmetric trailing matrix (in-group corrections are
    (1,B)/(B,1) vector ops), and the trailing update is ONE (B,R)·(R,B)
    MXU outer product with a single M read-modify-write — cutting the
    dominant VMEM traffic R-fold vs per-column rank-1 updates. The
    inverse accumulates in the same pass: with c_j = column j of L and
    s = √pivot, L = Π_j(I + (c_j − e_j)e_jᵀ), so the group applies
    W ← W − V·(rows of W), V_t = (c_t − e_t)/s_t, again one MXU outer
    product + one W read-modify-write. Everything is statically unrolled
    (j0 indices are Python constants), so Mosaic schedules across steps.

    Non-PSD inputs propagate NaN via rsqrt of a negative pivot — the
    library's failure-detection contract (SURVEY §5).
    """
    B = a_ref.shape[0]
    R = _GROUP
    HI = lax.Precision.HIGHEST

    lane = lax.broadcasted_iota(jnp.int32, (1, B), 1)       # (1,B)
    row_ids = lax.broadcasted_iota(jnp.int32, (B, 1), 0)    # (B,1)
    eye = (row_ids == lane.reshape(1, B)).astype(a_ref.dtype)  # (B,B)

    # Honour the lower-triangle-only contract (covmat.cholesky_lower /
    # reference Symmetric view): mirror tril(A) into scratch so garbage in
    # A's upper triangle never enters the factorization. The group loop
    # below reads ROWS of m_scr (the upper triangle of the symmetrised
    # trailing matrix), which is only valid because this entry write makes
    # m_scr exactly symmetric.
    a = a_ref[:]
    a_low = jnp.where(row_ids >= lane, a, 0.0)
    m_scr[:] = a_low + jnp.where(row_ids > lane, a, 0.0).T
    w_ref[:] = eye

    for g in range(B // R):
        j0 = g * R
        G = m_scr[j0:j0 + R, :]          # (R,B) rows of current M
        C = m_scr[:, j0:j0 + R]          # (B,R) cols (M symmetric)
        crows, ccols = [], []
        for t in range(R):
            gt = G[t:t + 1, :]
            ct = C[:, t:t + 1]
            for i in range(t):           # in-group corrections
                coef = ccols[i][j0 + t, 0]
                gt = gt - coef * crows[i]
                ct = ct - coef * ccols[i]
            piv = gt[0, j0 + t]
            s_inv = lax.rsqrt(piv)
            crows.append(jnp.where(lane >= j0 + t, gt * s_inv, 0.0))
            ccols.append(jnp.where(row_ids >= j0 + t, ct * s_inv, 0.0))
        CrowM = jnp.concatenate(crows, axis=0)      # (R,B)
        CcolM = jnp.concatenate(ccols, axis=1)      # (B,R)
        lt_ref[j0:j0 + R, :] = CrowM
        m_scr[:] = m_scr[:] - jnp.dot(CcolM, CrowM, precision=HI,
                                      preferred_element_type=jnp.float32)
        # inverse accumulation for the group: with c_j = column j of L and
        # s = √pivot, L = Π_j(I + (c_j − e_j)e_jᵀ), so the group applies
        # W ← W − V·(rows of W), V_t = (c_t − e_t)·s_inv_t — one MXU outer
        # product + one W read-modify-write. (A 7-step Newton-from-diagonal
        # alternative — pure MXU — measured SLOWER in context: 9.10 vs
        # 8.90 ms/eval at N=8192.)
        Wg = w_ref[j0:j0 + R, :]                    # (R,B)
        wrows, vcols = [], []
        for t in range(R):
            onehot = (row_ids == (j0 + t)).astype(a_ref.dtype)
            ct = ccols[t]
            ltt = jnp.sum(jnp.where(row_ids == (j0 + t), ct, 0.0))
            v = (ct - onehot) / ltt                 # (c_t − e_t)/l_tt
            wt = Wg[t:t + 1, :]
            for i in range(t):
                wt = wt - vcols[i][j0 + t, 0] * wrows[i]
            wrows.append(wt)
            vcols.append(v)
        WrowM = jnp.concatenate(wrows, axis=0)      # (R,B)
        VM = jnp.concatenate(vcols, axis=1)         # (B,R)
        w_ref[:] = w_ref[:] - jnp.dot(VM, WrowM, precision=HI,
                                      preferred_element_type=jnp.float32)

    # One Newton step W ← W(2I − L W) (two MXU matmuls): the elementary-
    # factor accumulation above carries a small CORRELATED rounding bias
    # (measured ~8e-3 relative on downstream variance gradients); the
    # residual-driven correction removes it, leaving fresh ~eps rounding.
    W = w_ref[:]
    # (L W)[a,b] = Σ_i Lt[i,a] W[i,b] — contract Lt's sublane dim
    Rm = lax.dot_general(lt_ref[:], W, (((0,), (0,)), ((), ())),
                         precision=HI, preferred_element_type=jnp.float32)
    corr = jnp.dot(W, Rm, precision=HI, preferred_element_type=jnp.float32)
    lower = row_ids >= lane  # (B,B) keep the exact triangular structure
    w_ref[:] = jnp.where(lower, 2.0 * W - corr, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_inv_block(A: jax.Array, interpret: bool = False):
    """``(Lᵀ, L⁻¹)`` of one (B, B) VMEM-resident SPD block."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = A.shape[0]
    # static-config contract: the group loop factors (B//_GROUP)*_GROUP
    # columns, so a non-multiple block would silently skip columns.
    assert B % _GROUP == 0, f"block size {B} must be a multiple of {_GROUP}"
    return pl.pallas_call(
        _chol_inv_block_body,
        out_shape=(
            jax.ShapeDtypeStruct((B, B), A.dtype),
            jax.ShapeDtypeStruct((B, B), A.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((B, B), A.dtype)],
        interpret=interpret,
    )(A)


# ---------------------------------------------------------------------------
# Slab mega-kernel: factor a whole (_OUTER, _OUTER) diagonal block in ONE
# Pallas launch (round 5).
# ---------------------------------------------------------------------------


def _sdot(a, b, dn, interpret: bool):
    """bf16 hi/lo split dot at DEFAULT precision — the round-4-validated
    primitive (34.6 TF/s in-kernel vs 22.5 at HIGHEST, 4.4e-6 rel err vs
    HIGH's 1.3e-5). Mosaic rejects Precision.HIGH in-kernel, so this is the
    only way to bf16x3-class throughput inside a kernel. Interpreter mode
    uses a single HIGHEST f32 dot instead: XLA:CPU accumulates bf16 dots in
    bf16 (measured 4.9e-4 error on the slab factor vs 1.0e-6 compiled), so
    the split emulation is NOT faithful to the TPU there."""
    if interpret:
        return lax.dot_general(a, b, dn, precision=lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def f(x, y):
        return lax.dot_general(x, y, dn, precision=lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)

    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _factor_invert_values(M):
    """(Lt, W=L⁻¹) of one symmetric (B, B) VMEM-resident block, value-based.

    Same group-step algorithm as ``_chol_inv_block_body`` (8-column groups,
    interleaved inverse accumulation, Newton polish) but carrying M/W as
    SSA values instead of scratch refs, so it can be instantiated several
    times inside the slab kernel. Measured 134 µs for a full 8-block slab
    (vs 8 × 29.5 µs + XLA glue for the per-block path): Mosaic overlaps
    these VPU chains with the slab's MXU trailing updates."""
    B = M.shape[0]
    R = _GROUP
    HI = lax.Precision.HIGHEST
    laneB = lax.broadcasted_iota(jnp.int32, (1, B), 1)
    rowB = lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    eyeB = (rowB == laneB).astype(M.dtype)

    Wacc = eyeB
    rows_out = []
    Mk = M
    for g in range(B // R):
        q0 = g * R
        G = Mk[q0:q0 + R, :]
        C = Mk[:, q0:q0 + R]
        crows, ccols = [], []
        for t in range(R):
            gt = G[t:t + 1, :]
            ct = C[:, t:t + 1]
            for i in range(t):
                coef = ccols[i][q0 + t, 0]
                gt = gt - coef * crows[i]
                ct = ct - coef * ccols[i]
            piv = gt[0, q0 + t]
            s_inv = lax.rsqrt(piv)
            crows.append(jnp.where(laneB >= q0 + t, gt * s_inv, 0.0))
            ccols.append(jnp.where(rowB >= q0 + t, ct * s_inv, 0.0))
        CrowM = jnp.concatenate(crows, axis=0)
        CcolM = jnp.concatenate(ccols, axis=1)
        rows_out.append(CrowM)
        Mk = Mk - jnp.dot(CcolM, CrowM, precision=HI,
                          preferred_element_type=jnp.float32)
        Wg = Wacc[q0:q0 + R, :]
        wrows, vcols = [], []
        for t in range(R):
            onehot = (rowB == (q0 + t)).astype(M.dtype)
            ct = ccols[t]
            ltt = jnp.sum(jnp.where(rowB == (q0 + t), ct, 0.0))
            v = (ct - onehot) / ltt
            wt = Wg[t:t + 1, :]
            for i in range(t):
                wt = wt - vcols[i][q0 + t, 0] * wrows[i]
            wrows.append(wt)
            vcols.append(v)
        WrowM = jnp.concatenate(wrows, axis=0)
        VM = jnp.concatenate(vcols, axis=1)
        Wacc = Wacc - jnp.dot(VM, WrowM, precision=HI,
                              preferred_element_type=jnp.float32)

    Lt = jnp.concatenate(rows_out, axis=0)
    Rm = lax.dot_general(Lt, Wacc, (((0,), (0,)), ((), ())),
                         precision=HI, preferred_element_type=jnp.float32)
    corr = jnp.dot(Wacc, Rm, precision=HI, preferred_element_type=jnp.float32)
    Wacc = jnp.where(rowB >= laneB, 2.0 * Wacc - corr, 0.0)
    return Lt, Wacc


def _slab_body(interpret, s_ref, lt_ref, w_ref, m_scr):
    """Factor one (W, W) SPD slab-diagonal block: for each of W/B
    sub-blocks, factor+invert in VMEM, then TRSM the slab-local panel and
    apply the trailing update with split-dot GEMMs — all in one launch.

    Invariant: only m_scr's LOWER triangle is maintained; diagonal blocks
    re-symmetrize locally (a B×B transpose), panels read the lower part,
    and trailing updates write full squares whose upper-garbage is never
    read. All products are dot_general contractions — no (rest, B) or
    (W, W) transposes (Mosaic lane/sublane shuffles made a transpose-ful
    first cut 13× slower). Outputs: ``lt_ref`` row j = column j of the slab
    factor; ``w_ref[k]`` = L_kk⁻¹ for each diagonal sub-block.
    """
    W = s_ref.shape[0]
    B = _BLOCK
    rowB = lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    laneB = lax.broadcasted_iota(jnp.int32, (1, B), 1)

    m_scr[:] = s_ref[:]
    lt_ref[:] = jnp.zeros((W, W), s_ref.dtype)

    for k in range(W // B):
        r0 = k * B
        Mk_raw = m_scr[r0:r0 + B, r0:r0 + B]
        Mk_low = jnp.where(rowB >= laneB, Mk_raw, 0.0)
        Mk = Mk_low + jnp.where(rowB > laneB, Mk_raw, 0.0).T
        Lt_k, W_k = _factor_invert_values(Mk)
        w_ref[k] = W_k
        lt_ref[r0:r0 + B, r0:r0 + B] = Lt_k
        if r0 + B < W:
            P = m_scr[r0 + B:, r0:r0 + B]
            # L21ᵀ = W_k Pᵀ: contract dim1×dim1 → (B, rest)
            L21T = _sdot(W_k, P, (((1,), (1,)), ((), ())), interpret)
            lt_ref[r0:r0 + B, r0 + B:] = L21T
            # trailing −= L21 L21ᵀ: contract dim0×dim0 of L21T → (rest, rest)
            m_scr[r0 + B:, r0 + B:] = (
                m_scr[r0 + B:, r0 + B:]
                - _sdot(L21T, L21T, (((0,), (0,)), ((), ())), interpret))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _slab_factor(S: jax.Array, interpret: bool = False):
    """``(Ltᵀ-layout slab factor, (W/B, B, B) diag-block inverses)`` of one
    (W, W) SPD slab-diagonal block (lower triangle read)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = S.shape[0]
    assert W % _BLOCK == 0, W
    return pl.pallas_call(
        functools.partial(_slab_body, interpret),
        out_shape=(
            jax.ShapeDtypeStruct((W, W), S.dtype),
            jax.ShapeDtypeStruct((W // _BLOCK, _BLOCK, _BLOCK), S.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((W, W), S.dtype)],
        interpret=interpret,
    )(S)


# ---------------------------------------------------------------------------
# Triangular-inverse block kernel (same elementary-factor loop, L given).
# ---------------------------------------------------------------------------


def _tri_inv_block_body(l_ref, w_ref):
    """``W = L⁻¹`` of one lower-triangular block (plain-lower layout).

    Same accumulation as ``_chol_inv_block_body`` but reading the
    elementary factors off an existing factor: L = Π_j (I + u_j e_jᵀ) with
    u_j = l_j − e_j (cross terms vanish by triangularity), so
    W ← W − (u_j/l_jj)(e_jᵀW) for j = 0..B−1 yields L⁻¹. Column l_j comes
    from one MXU contraction against a one-hot vector — no lane-dynamic
    extraction. Used by the logpdf backward pass to invert the cached
    diagonal blocks without the XLA triangular-solve expander
    (69 µs/block → one fused VMEM loop).
    """
    B = l_ref.shape[0]
    HI = lax.Precision.HIGHEST

    lane = lax.broadcasted_iota(jnp.int32, (1, B), 1)
    row_ids = lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    eye = (row_ids == lane.reshape(1, B)).astype(l_ref.dtype)
    lower = row_ids >= lane

    # Newton from the exact inverse diagonal: the error term is nilpotent,
    # its strictly-lower degree doubles per step, so ceil(log2(B)) steps
    # are EXACT for a B-wide triangular factor — all MXU. Derived from B so
    # changing _BLOCK cannot silently truncate the iteration.
    n_steps = max(1, math.ceil(math.log2(B)))
    diag_row = jnp.sum(jnp.where(eye > 0, l_ref[:], 0.0),
                       axis=0, keepdims=True)
    W = jnp.where(eye > 0, 1.0 / diag_row, 0.0)
    for _ in range(n_steps):
        Rm = jnp.dot(l_ref[:], W, precision=HI,
                     preferred_element_type=jnp.float32)
        W = jnp.where(lower, 2.0 * W - jnp.dot(
            W, Rm, precision=HI, preferred_element_type=jnp.float32), 0.0)
    w_ref[:] = W


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tri_inv_block(L: jax.Array, interpret: bool = False) -> jax.Array:
    """Inverse of a lower-triangular (B, B) block (plain-lower in/out)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = L.shape[0]
    return pl.pallas_call(
        _tri_inv_block_body,
        out_shape=jax.ShapeDtypeStruct((B, B), L.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(L)


# ---------------------------------------------------------------------------
# Legacy diagonal-block factorization (kept for the sharded slab sweep).
# ---------------------------------------------------------------------------


def _chol_block_body(a_ref, l_ref):
    # Masked-vector formulation: no dynamic slicing (Mosaic-safe) — column j
    # is extracted and written back with broadcasted-iota masks, and the
    # trailing matrix gets a rank-1 VPU update per step.
    B = a_ref.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = lax.broadcasted_iota(jnp.int32, (B, B), 1)
    rows1 = rows[:, :1]  # (B, 1)

    def step(j, carry):
        M, L = carry
        colmask = cols == j
        # pivot = M[j, j] after all previous rank-1 updates
        piv = jnp.sum(jnp.where((rows == j) & colmask, M, 0.0))
        inv_piv = lax.rsqrt(piv)
        col = jnp.sum(jnp.where(colmask, M, 0.0), axis=1, keepdims=True)
        col = jnp.where(rows1 >= j, col * inv_piv, 0.0)  # (B, 1)
        # rank-1 trailing update; col is zero above row j so only the
        # lower-right submatrix is touched
        M = M - col * col.T
        L = jnp.where(colmask, col, L)
        return M, L

    M0 = a_ref[:]
    L0 = jnp.zeros_like(M0)
    _, L = lax.fori_loop(0, B, step, (M0, L0))
    l_ref[:] = L


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_block(A: jax.Array, interpret: bool = False) -> jax.Array:
    """Unblocked Cholesky of one (B, B) VMEM-resident block."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _chol_block_body,
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A)


def _inv_lower(L: jax.Array) -> jax.Array:
    """Dense inverse of a small lower-triangular block (for TRSM→GEMM)."""
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True, transpose_a=False
    )


def _mm(a, b):
    """Panel GEMM at the library precision policy, floored at bf16x3.

    Measured on TPU v5e at N=8192: HIGH (bf16x3) factorizes in 9.8 ms with
    max rel err 1.1e-6 vs f64 (logdet err 1.3e-7) — f32-quality at ~1.3×
    the speed of HIGHEST (bf16x6). Single-pass bf16 (DEFAULT) is NOT offered
    here: ~8e-3 relative gram error destroys factorization stability, so a
    "default" policy still runs the factorization at HIGH.
    """
    from .precision import floored_precision

    prec = floored_precision()
    return jnp.matmul(a, b, precision=prec if a.dtype == jnp.float32 else None)


# ---------------------------------------------------------------------------
# Blocked right-looking driver (static Python loop — shapes fixed at trace).
# ---------------------------------------------------------------------------


_OUTER = 1024  # outer panel width for the two-level sweep
_SLAB = True   # use the slab mega-kernel for full-width diagonal blocks


def _left_looking_sweep(npad: int, block: int, panel_fn, dtype, rhs=None):
    """Two-level left-looking factorization driver behind both the
    read-from-A and build-from-kernel sweeps.

    Level 1 (outer, width ``_OUTER``): each outer slab is updated against
    all finished columns with ONE fat GEMM — output 1024 wide, contraction
    r0 deep, full MXU efficiency, and total strided-slice traffic over L of
    only ~N³/(6·1024) words (≈360 MB at N=8192) instead of the
    ~N³/(6·128) ≈ 2.9 GB (plus equal-size slice copies) that a flat
    128-panel sweep re-reads — measured to dominate the round-2 sweep.

    Level 2 (inner, width ``block``): the classic left-looking sweep runs
    INSIDE the (rows × W) slab: inner update GEMMs read only slab slices,
    the diagonal block factors+inverts in the fused Pallas kernel
    (``_chol_inv_block``), and the panel TRSM is the W-GEMM
    ``P · (L_kk⁻¹)ᵀ``.

    ``panel_fn(r0, w)`` returns the (npad − r0, w) lower gram slab starting
    at diagonal offset r0. The Python loops are statically unrolled
    (npad/block inner iterations total — same trace size as the flat
    sweep), which compile-scales to ~16k rows (~128 panels). Beyond that,
    the supported path is ``parallel.sharded_linalg.sharded_logpdf`` /
    ``sharded_mean_and_var`` — their ``lax.fori_loop`` slab sweep is
    O(1)-compile and runs fine on a 1-device mesh (a degenerate ``tp``
    axis), trading ~2x triangular FLOPs for unbounded N.

    ``rhs`` (optional, (npad, q)): the forward substitution ``Z = L⁻¹ rhs``
    rides the sweep — each panel's ``z_k = L_kk⁻¹(…)`` reuses the Pallas
    inverse and the propagation re-reads the just-written panel column
    once (~0.2 ms at N=8192) — replacing the post-hoc XLA single-RHS
    triangular solve, whose InvertDiagonalBlocks expansion was measured at
    ~1.3 ms/eval. Returns ``(L, Z)`` in that case.

    All buffer writes are ``lax.dynamic_update_slice`` — XLA lowers DUS
    in-place, where the equivalent ``.at[].set`` was observed to lower to
    pad+select fusions re-materialising the full N×N buffer every outer
    panel (~1.3 ms/eval).
    """
    slabs, zs = _sweep_slabs(npad, block, panel_fn, dtype, rhs)
    L = _assemble_slabs(npad, slabs, dtype)
    if rhs is not None:
        return L, jnp.concatenate(zs, axis=0)
    return L


def _sweep_slabs(npad: int, block: int, panel_fn, dtype, rhs=None):
    """The two-level sweep, returning the factored outer slabs as a LIST
    ``[(r0_j, Sf_j)]`` (Sf_j is (npad − r0_j, w_j)) instead of an
    assembled N×N factor — the logpdf path reads logdet and the carried
    solve straight off the slabs and never materialises L (the N×N
    assembly + strided re-reads measured ~0.9 ms/eval). The outer update
    against finished columns becomes one fat GEMM PER FINISHED SLAB
    (identical FLOPs, contraction width w_j each, contiguous row slices —
    no strided-slice copies of a big L)."""
    dus = lax.dynamic_update_slice
    slabs = []  # (r0_j, Sf_j)
    R = rhs
    zs = []
    r0 = 0
    while r0 < npad:
        w = min(_OUTER, npad - r0)
        S = panel_fn(r0, w)  # (npad - r0, w)
        for b_j, Sf_j in slabs:
            o = r0 - b_j
            S = S - _mm(Sf_j[o:], Sf_j[o:o + w].T)
        rows = npad - r0
        Sf = jnp.zeros((rows, w), dtype)
        if _SLAB and w == _OUTER:
            # slab mega-kernel path: the whole (w, w) diagonal block —
            # 8 diag factorizations, slab-local TRSMs, trailing updates —
            # in ONE Pallas launch (134 µs/slab vs 8×29.5 µs + XLA glue
            # for the per-block path; forward 128.5 → see performance.md)
            Lt_slab, Ws = _slab_factor(S[:w], interpret=_INTERPRET)
            Sf = dus(Sf, Lt_slab.T, (0, 0))
            zs_slab = []
            if R is not None:
                # blocked forward substitution within the slab, reusing
                # the in-kernel diag inverses; one fat below-slab update
                for j in range(w // block):
                    jb = j * block
                    rj = R[r0 + jb:r0 + jb + block]
                    if j:
                        zcat = jnp.concatenate(zs_slab, axis=0)
                        # L[jb:, :jb] = Lt_slab[:jb, jb:jb+B]ᵀ
                        rj = rj - lax.dot_general(
                            Lt_slab[:jb, jb:jb + block], zcat,
                            (((0,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST)
                    zs_slab.append(_mm(Ws[j], rj))
                zs.extend(zs_slab)
            if rows > w:
                for j in range(w // block):
                    jb = j * block
                    P = S[w:, jb:jb + block]
                    if j:
                        P = P - _mm(Sf[w:, :jb], Lt_slab[:jb, jb:jb + block])
                    L21 = _mm(P, Ws[j].T)
                    Sf = dus(Sf, L21, (w, jb))
            if R is not None and r0 + w < npad:
                z_slab = jnp.concatenate(zs_slab, axis=0)   # (w, q)
                R = dus(R, R[r0 + w:] - _mm(Sf[w:, :], z_slab), (r0 + w, 0))
            slabs.append((r0, Sf))
            r0 += w
            continue
        for rr in range(0, w, block):
            P = S[rr:, rr:rr + block]
            if rr:
                P = P - _mm(Sf[rr:, :rr], Sf[rr:rr + block, :rr].T)
            Lt, W = _chol_inv_block(P[:block], interpret=_INTERPRET)
            Lkk = Lt.T
            if rr + block < rows:
                L21 = _mm(P[block:], W.T)             # (rest, B) GEMM
                col = jnp.concatenate([Lkk, L21], axis=0)
            else:
                col = Lkk
            Sf = dus(Sf, col, (rr, rr))
            if R is not None:
                g0 = r0 + rr
                z_k = _mm(W, R[g0:g0 + block])        # L_kk⁻¹ · rhs panel
                zs.append(z_k)
                if g0 + block < npad:
                    R = dus(R, R[g0 + block:] - _mm(col[block:], z_k),
                            (g0 + block, 0))
        slabs.append((r0, Sf))
        r0 += w
    return slabs, zs


def _assemble_slabs(npad: int, slabs, dtype) -> jax.Array:
    """Materialise the N×N lower factor from the slab list."""
    L = jnp.zeros((npad, npad), dtype)
    for r0, Sf in slabs:
        L = lax.dynamic_update_slice(L, Sf, (r0, r0))
    return L


def _slabs_logdet(slabs) -> jax.Array:
    """Σ log diag(L) read directly off the slab diagonals."""
    out = 0.0
    for _, Sf in slabs:
        w = Sf.shape[1]
        out = out + jnp.sum(jnp.log(jnp.diagonal(Sf[:w])))
    return out


def _blocked_cholesky_impl(A: jax.Array, block: int) -> jax.Array:
    """Left-looking blocked Cholesky; reads ONLY the lower triangle of A."""
    n = A.shape[-1]
    pad = (-n) % block
    if pad:
        # keep the padded trailing corner SPD: identity diagonal
        A = jnp.pad(A, ((0, pad), (0, pad)))
        A = A + jnp.diag(jnp.concatenate(
            [jnp.zeros((n,), A.dtype), jnp.ones((pad,), A.dtype)]
        ))
    np_ = n + pad

    L = _left_looking_sweep(
        np_, block, lambda r0, w: A[r0:, r0:r0 + w], A.dtype
    )
    return L[:n, :n] if pad else L


@jax.custom_jvp
def pallas_cholesky(A: jax.Array) -> jax.Array:
    """Blocked Pallas Cholesky of a symmetric PSD matrix (lower factor).

    Non-PSD inputs propagate NaNs (rsqrt of a negative pivot), matching the
    inf-logpdf → MCMC-rejection failure policy (SURVEY §5 failure detection).
    """
    return _blocked_cholesky_impl(A, _BLOCK)


@pallas_cholesky.defjvp
def _pallas_cholesky_jvp(primals, tangents):
    (A,), (Adot,) = primals, tangents
    L = pallas_cholesky(A)
    # X = L⁻¹ sym(Ȧ) L⁻ᵀ ;  L̇ = L φ(X),  φ = tril strict + ½·diag
    S = 0.5 * (Adot + Adot.T)
    W = lax.linalg.triangular_solve(L, S, left_side=True, lower=True)
    X = lax.linalg.triangular_solve(
        L, W.T, left_side=True, lower=True
    ).T
    phi = jnp.tril(X, -1) + 0.5 * jnp.diag(jnp.diagonal(X))
    return L, _mm(L, phi)


# ---------------------------------------------------------------------------
# Fused gram → Cholesky: K + diag(σ²) is never materialised in HBM.
# ---------------------------------------------------------------------------


def should_use_fused_gram(x: jax.Array, noise_diag: jax.Array) -> bool:
    """Gate for ``cholesky_gram``: TPU, f32, large N (same policy as
    ``should_use_pallas``)."""
    if not _ENABLED:
        return False
    if not _INTERPRET and jax.default_backend() != "tpu":
        return False
    if x.dtype != jnp.float32 or noise_diag.dtype != jnp.float32:
        return False
    return x.shape[0] >= _MIN_N


def _peel_transforms(kernel, x):
    """Apply input transforms once up front (they are pointwise in the
    inputs), so the per-panel cross-gram doesn't re-run them nb times.
    Matters for FunctionTransform feature maps (deep kernels).

    Inputs are canonicalized to (N, D) first, exactly as
    ``TransformedKernel._t`` does — transforms (ARD/Linear/Function) assume
    a 2-D batch and silently mis-broadcast on 1-D input otherwise.
    """
    from ..kernels.base import TransformedKernel
    from .distance import as_inputs

    x = as_inputs(x)
    while isinstance(kernel, TransformedKernel):
        x = kernel.transform(x)
        kernel = kernel.kernel
    return kernel, x


def _gram_sweep_slabs(kernel, x, noise_diag, block, rhs=None):
    """Factored slabs of ``chol(K(x,x)+diag(noise))`` with the gram panels
    BUILT inside the sweep (K never exists in HBM). Returns
    ``(slabs, zs, n, npad)``."""
    kernel, x = _peel_transforms(kernel, x)
    n = x.shape[0]
    pad = (-n) % block
    npad = n + pad
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        noise_diag = jnp.pad(noise_diag, (0, pad))
        if rhs is not None:
            rhs = jnp.pad(rhs, ((0, pad), (0, 0)))

    def panel_fn(r0, w):
        xb = x[r0:r0 + w]
        P = kernel.cross(x[r0:], xb).astype(jnp.float32)  # (npad-r0, w)
        rows = r0 + jnp.arange(npad - r0, dtype=jnp.int32)[:, None]
        cols = r0 + jnp.arange(w, dtype=jnp.int32)[None, :]
        on_diag = rows == cols
        P = P + jnp.where(on_diag, noise_diag[r0:, None], 0.0)
        if pad:
            # padded rows/cols → identity block (log 1 = 0, zero fill-in)
            is_pad = (rows >= n) | (cols >= n)
            P = jnp.where(is_pad, jnp.where(on_diag, 1.0, 0.0), P)
        return P

    slabs, zs = _sweep_slabs(npad, block, panel_fn, jnp.float32, rhs)
    return slabs, zs, n, npad


def _cholesky_gram_impl(kernel, x, noise_diag, block, rhs=None):
    """Left-looking sweep whose panels are BUILT, not read: panel k is
    ``k(x[kB:], x[kB:(k+1)B]) + diag-noise block``, so the N×N gram matrix
    never exists in HBM (peak memory = L + one panel, vs 2·N² for
    build-then-factorize). Total gram FLOPs are unchanged — they just run
    panel-by-panel ahead of each TRSM. With ``rhs`` (n, q), the forward
    substitution rides the sweep and ``(L, L⁻¹rhs)`` is returned."""
    slabs, zs, n, npad = _gram_sweep_slabs(kernel, x, noise_diag, block, rhs)
    L = _assemble_slabs(npad, slabs, jnp.float32)
    if rhs is not None:
        Z = jnp.concatenate(zs, axis=0)
        return (L[:n, :n], Z[:n]) if npad != n else (L, Z)
    return L[:n, :n] if npad != n else L


def _build_gram(kernel, x, noise_diag):
    """The XLA-visible definition whose VJP backs ``cholesky_gram``."""
    K = kernel.gram(x)
    return K + jnp.diag(noise_diag.astype(K.dtype))


@jax.custom_vjp
def cholesky_gram(kernel, x, noise_diag):
    """``chol(K(x, x) + diag(noise_diag))`` without materialising K.

    Semantics of ``cholesky(_symmetric(cov(fx)))``
    (src/finite_gp_projection.jl:308) for a kernel-based prior with
    diagonal-structured noise. Reverse-mode differentiable via the Cholesky
    pullback (Murray 2016) chained into the gram builder's VJP; forward
    mode is unsupported (as for the Pallas gram kernel itself).
    """
    return _cholesky_gram_impl(kernel, x, noise_diag, _BLOCK)


def _cholesky_gram_fwd(kernel, x, noise_diag):
    L = cholesky_gram(kernel, x, noise_diag)
    return L, (kernel, x, noise_diag, L)


def _cholesky_gram_bwd(res, Lbar):
    kernel, x, noise_diag, L = res
    Lbar = jnp.tril(Lbar)
    # Ā = L⁻ᵀ Φ(Lᵀ L̄) L⁻¹,  Φ = strict lower + ½·diag  (Murray 2016)
    M = _mm(L.T, Lbar)
    P = jnp.tril(M, -1) + 0.5 * jnp.diag(jnp.diagonal(M))
    Y = lax.linalg.triangular_solve(L, P, left_side=True, lower=True,
                                    transpose_a=True)
    Abar = lax.linalg.triangular_solve(L, Y.T, left_side=True, lower=True,
                                       transpose_a=True).T
    Abar = 0.5 * (Abar + Abar.T)  # builder output is symmetric
    _, vjp = jax.vjp(_build_gram, kernel, x, noise_diag)
    return vjp(Abar)


cholesky_gram.defvjp(_cholesky_gram_fwd, _cholesky_gram_bwd)


# ---------------------------------------------------------------------------
# Fused gram → Cholesky → logpdf core with the logpdf-specific pullback.
# ---------------------------------------------------------------------------


def _pallas_diag_inv(Lii: jax.Array) -> jax.Array:
    """Diagonal-block triangular inverse: the Pallas VMEM kernel on the
    production path, the XLA expander otherwise (CPU f64 oracles)."""
    if (_INTERPRET or jax.default_backend() == "tpu") and Lii.dtype == jnp.float32:
        return _tri_inv_block(Lii, interpret=_INTERPRET)
    return _inv_lower(Lii)


def _batched_diag_inv(L: jax.Array, block: int) -> jax.Array:
    """(nb, B, B) inverses of L's diagonal blocks — ONE vmapped Pallas
    launch (grid-batched) on the production path.

    Extraction is nb static slices + one stack: the previous
    reshape-and-advanced-index formulation lowered to THREE full-N²
    transpose copies plus a gather (~3.2 ms at N=8192 — measured r4
    profile); the slice loop touches only the nb·B² block bytes."""
    n = L.shape[-1]
    nb = n // block
    blocks = jnp.stack([
        lax.dynamic_slice(L, (i * block, i * block), (block, block))
        for i in range(nb)
    ])  # (nb, B, B)
    if (_INTERPRET or jax.default_backend() == "tpu") and L.dtype == jnp.float32:
        return jax.vmap(lambda b: _tri_inv_block(b, interpret=_INTERPRET))(
            blocks
        )
    return jax.vmap(_inv_lower)(blocks)


def _inv_lower_blocked(L: jax.Array, block: int) -> jax.Array:
    """``W = L⁻¹`` (lower triangular) by doubling merges.

    Diagonal blocks invert in one batched Pallas launch; then log2(nb)
    merge levels assemble growing triangles:
    ``W = [[W11, 0], [−W22·L21·W11, W22]]`` — two GEMMs per pair, fat at
    the late levels. Total ~2N³/3 GEMM FLOPs like the row-panel forward
    substitution this replaces, but strided-slice traffic drops from
    Σ r0² ≈ N³/(3B) words (~5.7 GB at N=8192 — measured to dominate the
    backward) to Σ_levels 3N·s ≈ 0.8 GB. Requires N a power-of-two
    multiple of ``block`` after padding (callers pad to _BLOCK; the sweep
    pads to 128-multiples — non-power-of-two multiples fall back to the
    row-panel scheme).
    """
    n = L.shape[-1]
    nb = n // block
    if nb & (nb - 1):  # not a power of two → row-panel fallback
        return _inv_lower_blocked_rowpanel(L, block)
    Winv = _batched_diag_inv(L, block)  # (nb, B, B)
    W = jnp.zeros((n, n), L.dtype)
    for i in range(nb):
        W = lax.dynamic_update_slice(W, Winv[i], (i * block, i * block))
    s = block
    while s < n:
        for base in range(0, n, 2 * s):
            W11 = W[base:base + s, base:base + s]
            W22 = W[base + s:base + 2 * s, base + s:base + 2 * s]
            L21 = L[base + s:base + 2 * s, base:base + s]
            W21 = -_trmm_ll(W22, _trmm_lr(L21, W11))
            W = lax.dynamic_update_slice(W, W21, (base + s, base))
        s *= 2
    return W


_TRMM_SPLIT = 2048  # split dense x triangular products at/above this size


def _trmm_lr(X, Wtri):
    """``X @ Wtri`` with Wtri LOWER-triangular: one split level drops the
    zero upper-right quarter (3 half-GEMMs instead of 4 — the classic TRMM
    saving; ~25% of the doubling-merge FLOPs at the top levels, measured
    ~1.4 ms of the N=8192 backward)."""
    s = Wtri.shape[0]
    if s < _TRMM_SPLIT:
        return _mm(X, Wtri)
    h = s // 2
    A, C, D = Wtri[:h, :h], Wtri[h:, :h], Wtri[h:, h:]
    left = _trmm_lr(X[:, :h], A) + _mm(X[:, h:], C)
    right = _trmm_lr(X[:, h:], D)
    return jnp.concatenate([left, right], axis=1)


def _trmm_ll(Wtri, X):
    """``Wtri @ X`` with Wtri LOWER-triangular (same split as ``_trmm_lr``)."""
    s = Wtri.shape[0]
    if s < _TRMM_SPLIT:
        return _mm(Wtri, X)
    h = s // 2
    E, F, G = Wtri[:h, :h], Wtri[h:, :h], Wtri[h:, h:]
    top = _trmm_ll(E, X[:h])
    bot = _mm(F, X[:h]) + _trmm_ll(G, X[h:])
    return jnp.concatenate([top, bot], axis=0)


def _trmm_ul(Wtri, X):
    """``Wtriᵀ @ X`` with Wtri LOWER-triangular (upper-left TRMM; the
    transposed operand rides the GEMM's dimension numbers — no copy)."""
    s = Wtri.shape[0]
    if s < _TRMM_SPLIT:
        return _mm(Wtri.T, X)
    h = s // 2
    E, F, G = Wtri[:h, :h], Wtri[h:, :h], Wtri[h:, h:]
    top = _trmm_ul(E, X[:h]) + _mm(F.T, X[h:])
    bot = _trmm_ul(G, X[h:])
    return jnp.concatenate([top, bot], axis=0)


def _inv_lower_blocked_rowpanel(L: jax.Array, block: int) -> jax.Array:
    """Row-panel forward-substitution trtri (non-power-of-two fallback)."""
    n = L.shape[-1]
    nb = n // block
    W = jnp.zeros((n, n), L.dtype)
    for i in range(nb):
        r0 = i * block
        Lii_inv = _pallas_diag_inv(L[r0:r0 + block, r0:r0 + block])
        if i == 0:
            W = lax.dynamic_update_slice(W, Lii_inv, (0, 0))
            continue
        rhs = -_mm(L[r0:r0 + block, :r0], W[:r0, :r0])  # (B, r0)
        Wi = jnp.concatenate([_mm(Lii_inv, rhs), Lii_inv], axis=1)
        W = lax.dynamic_update_slice(W, Wi, (r0, 0))
    return W


def _spd_inv_from_chol(L: jax.Array, block: int) -> jax.Array:
    """``K⁻¹ = L⁻ᵀL⁻¹`` via doubling trtri + triangularity-aware lauum.

    The lauum stage computes only the lower-triangular column panels
    ``(WᵀW)[r0:, r0:r0+P] = W[r0:, r0:]ᵀ W[r0:, r0:r0+P]`` (W's leading
    zero rows drop out) at OUTER panel width (1024), then symmetrises —
    ~2N³/3 GEMM FLOPs instead of the 2N³ dense ``WᵀW`` this replaces
    (the round-2 backward's dominant term; LAPACK ``dpotri`` structure),
    and ~8 strided reads of W instead of 64. Assumes N divisible by
    ``block``.
    """
    T = _spd_inv_lower_from_chol(L, block)
    return T + T.T - jnp.diag(jnp.diagonal(T))


def _spd_inv_lower_from_chol(L: jax.Array, block: int) -> jax.Array:
    """Lower triangle of ``K⁻¹`` (see ``_spd_inv_from_chol``) WITHOUT the
    symmetrisation — callers contracting against a symmetric ∂K fold the
    cotangent onto the lower triangle instead, skipping a full N×N
    transpose copy (measured ~0.8 ms at N=8192)."""
    T, _ = _spd_inv_lower_and_trtri(L, block)
    return T


def _spd_inv_lower_and_trtri(L: jax.Array, block: int):
    """``(tril(K⁻¹), L⁻¹)`` — the lauum exposes its trtri intermediate so
    the logpdf backward can form ``α = L⁻ᵀ z = Wᵀ z`` with ONE thin GEMM
    over the W it already paid for, instead of the XLA single-RHS
    triangular solve (InvertDiagBlocks + sequential while: ~1.5 ms/eval
    measured in the r4 grad profile)."""
    n = L.shape[-1]
    W = _inv_lower_blocked(L, block)
    # lauum by OUTPUT TILES with per-tile contraction start: the output
    # block T[a:a+P, b:b+P] (a ≥ b) only needs rows k ≥ a of W (rows above
    # a are zero in W's columns a:a+P) — the column-panel formulation this
    # replaces contracted every deep row block from k = b, wasting ~40% of
    # the lauum FLOPs (measured ~2 ms at N=8192).
    pw = 512 if n % 512 == 0 else block
    T = jnp.zeros((n, n), L.dtype)
    for b in range(0, n, pw):
        for a in range(b, n, pw):
            blk = _mm(W[a:, a:a + pw].T, W[a:, b:b + pw])  # (P, P)
            T = lax.dynamic_update_slice(T, blk, (a, b))
    return jnp.tril(T), W


@jax.custom_vjp
def gram_logpdf_core(kernel, x, noise_diag, delta):
    """``-0.5 (n log2π + logdet(K+Σ) + δᵀ(K+Σ)⁻¹δ)`` per column of δ,
    without materialising K (forward = ``cholesky_gram`` sweep + one
    triangular solve).

    The backward pass uses the logpdf-specific identity
    ``∂logpdf/∂K = ½(α αᵀ − K⁻¹)``, α = K⁻¹δ — one blocked triangular
    inverse + one GEMM — instead of the generic Cholesky pullback
    (which needs a 2N³ matmul plus two full-RHS TRSMs). This is the hot
    rule under hyperparameter MCMC/MLE (reference call stack §3.5:
    ∇θ logpdf per leapfrog step).

    ``delta`` is (n,) or (n, q); returns a scalar or (q,).
    """
    out, _ = _fused_logpdf(kernel, x, noise_diag, delta)
    return out


def _fused_logpdf(kernel, x, noise_diag, delta):
    """(logpdf, slabs, z, n, npad): whitening solve + logdet ride the
    sweep; the N×N factor is NEVER assembled on this (primal) path —
    logdet comes from the slab diagonals (padded rows contribute log 1 =
    0) and the padded z rows are exactly zero."""
    vec = delta.ndim == 1
    D = delta[:, None] if vec else delta
    slabs, zs, n, npad = _gram_sweep_slabs(kernel, x, noise_diag, _BLOCK,
                                           rhs=D)
    logdet = 2.0 * _slabs_logdet(slabs)
    z = jnp.concatenate(zs, axis=0)            # (npad, q)
    quad = jnp.sum(jnp.square(z), axis=0)
    out = -0.5 * (n * math.log(2.0 * math.pi) + logdet + quad)
    return (out[0] if vec else out), (slabs, zs, n, npad)


def _logpdf_from_chol(L, delta):
    out, _ = _logpdf_and_z_from_chol(L, delta)
    return out


def _logpdf_and_z_from_chol(L, delta):
    n = L.shape[0]
    vec = delta.ndim == 1
    D = delta[:, None] if vec else delta
    z = lax.linalg.triangular_solve(L, D, left_side=True, lower=True)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    quad = jnp.sum(jnp.square(z), axis=0)
    out = -0.5 * (n * math.log(2.0 * math.pi) + logdet + quad)
    return (out[0] if vec else out), z


def _gram_logpdf_fwd(kernel, x, noise_diag, delta):
    out, (slabs, zs, n, npad) = _fused_logpdf(kernel, x, noise_diag, delta)
    # the backward needs the assembled factor (potri); primal path doesn't.
    # α = L⁻ᵀ z is DEFERRED to the backward, which gets L⁻¹ for free from
    # the potri's trtri stage.
    L = _assemble_slabs(npad, slabs, jnp.float32)[:n, :n]
    z = jnp.concatenate(zs, axis=0)[:n]
    vec = delta.ndim == 1
    return out, (kernel, x, noise_diag, L, z, vec)


def _gram_logpdf_bwd(res, gbar):
    kernel, x, noise_diag, L, z, vec = res
    g = jnp.reshape(gbar, (1,)) if vec else gbar  # (q,)
    n = L.shape[0]
    pad = (-n) % _BLOCK
    Lp = L
    zp = z
    if pad:
        Lp = jnp.pad(L, ((0, pad), (0, pad))) + jnp.diag(jnp.concatenate(
            [jnp.zeros((n,), L.dtype), jnp.ones((pad,), L.dtype)]
        ))
        zp = jnp.pad(z, ((0, pad), (0, 0)))
    T, W = _spd_inv_lower_and_trtri(Lp, _BLOCK)
    alpha = _mm(W.T, zp)[:n]  # α = L⁻ᵀ z = (K+Σ)⁻¹ δ, one thin GEMM
    T = T[:n, :n]  # tril(K⁻¹)
    gsum = jnp.sum(g)
    fused = _try_fused_contraction(kernel, x, noise_diag, alpha, g, T, gsum)
    if fused is not None:
        kbar, xbar, ndbar = fused
    else:
        # Ā = ½ Σ_j ḡ_j α_j α_jᵀ − ½ (Σ ḡ) K⁻¹ is symmetric, and so is
        # ∂K_ij/∂θ as a function (K_ij ≡ k(x_i, x_j) = k(x_j, x_i)), so the
        # contraction ⟨Ā, ∂K⟩ may be computed with the cotangent FOLDED onto
        # the lower triangle: C = 2·strict-tril(Ā) + diag(Ā). This skips the
        # explicit K⁻¹ symmetrisation (a full N×N transpose copy) and, with
        # the contraction phrased as one scalar jax.grad, lets XLA fuse the
        # assembly into the kernel-derivative chain (the separate
        # assemble→vjp pipeline measured ~10 full-N² passes).
        A_low = 0.5 * (_mm(alpha * g[None, :], alpha.T) - gsum * T)
        C = jnp.tril(A_low, -1) * 2.0 + jnp.diag(jnp.diagonal(A_low))

        def contraction(kernel_, x_, nd_):
            return jnp.vdot(_build_gram(kernel_, x_, nd_), C)

        kbar, xbar, ndbar = jax.grad(contraction, argnums=(0, 1, 2))(
            kernel, x, noise_diag
        )
    # ∂/∂δ_j = −ḡ_j α_j
    dbar = -(alpha * g[None, :])
    dbar = dbar[:, 0] if vec else dbar
    return kbar, xbar, ndbar, dbar


def _try_fused_contraction(kernel, x, noise_diag, alpha, g, T, gsum):
    """Dispatch the logpdf-backward contraction to the single-sweep Pallas
    kernel (``pallas_gram.logpdf_contraction``) when the kernel peels to a
    Scale/Transform chain over an isotropic base — the production
    hyperparameter-MCMC/MLE family. Returns ``(kbar, xbar, ndbar)`` or
    ``None`` (generic assemble-then-grad fallback: sums, products,
    periodic, linear, ...). The Scale/Transform algebra itself is
    differentiated by ``jax.vjp`` around the peel, so arbitrary transform
    stacks (ARD, Linear, Function) keep exact cotangents."""
    from ..kernels.base import ScaledKernel, TransformedKernel
    from ..kernels.stationary import IsotropicKernel
    from . import pallas_gram
    from .distance import as_inputs

    k = kernel
    while isinstance(k, (ScaledKernel, TransformedKernel)):
        k = k.kernel
    if not isinstance(k, IsotropicKernel):
        return None
    n = T.shape[0]
    if not (pallas_gram._INTERPRET or jax.default_backend() == "tpu"):
        return None
    if T.dtype != jnp.float32 or n < _MIN_N:
        return None

    def peel(kernel_, x_):
        s2 = jnp.asarray(1.0, jnp.float32)
        kk = kernel_
        xx = as_inputs(x_)
        while isinstance(kk, (ScaledKernel, TransformedKernel)):
            if isinstance(kk, ScaledKernel):
                s2 = s2 * kk.variance
                kk = kk.kernel
            else:
                xx = kk.transform(xx)
                kk = kk.kernel
        return s2.astype(jnp.float32), xx.astype(jnp.float32), kk

    (s2, xprime, base_k), pull = jax.vjp(peel, kernel, x)
    ag = (alpha * g[None, :]).astype(jnp.float32)
    s2bar, base_bar, xpbar = pallas_gram.logpdf_contraction(
        base_k, xprime, s2, ag, alpha.astype(jnp.float32), gsum, T
    )
    base_bar = jax.tree_util.tree_map(
        lambda b, p: jnp.asarray(b, p.dtype), base_bar, base_k
    )
    kbar, xbar = pull((jnp.asarray(s2bar, s2.dtype), xpbar, base_bar))
    ndbar = 0.5 * (jnp.sum(alpha * alpha * g[None, :], axis=1)
                   - gsum * jnp.diagonal(T)).astype(noise_diag.dtype)
    return kbar, xbar, ndbar


gram_logpdf_core.defvjp(_gram_logpdf_fwd, _gram_logpdf_bwd)


# ---------------------------------------------------------------------------
# Wide TRSM: invert-then-multiply (trtri + one GEMM).
# ---------------------------------------------------------------------------


_WIDE_RHS = 256  # trtri amortizes over this many RHS columns


def should_use_wide_solve(L: jax.Array, B: jax.Array) -> bool:
    """Gate for ``solve_lower_wide``: TPU, f32, large N, FAT rhs.

    Measured at N=8192, M=4096 (the posterior-prediction whitening solve):
    XLA's triangular solve takes 40.8 ms and a block-forward-substitution
    variant 30.8 ms — both ~7-10× off the 4.4 ms GEMM roofline, dominated
    by re-reading/writing the (N, M) running RHS once per panel. Inverting
    L first (the doubling trtri already at roofline from the logpdf
    backward, ~4-5 ms) turns the whole solve into ONE MXU GEMM; total
    ~10 ms, 4× faster. Thin RHS (q < {wide}) keeps the XLA substitution —
    there the trtri cost dominates.
    """
    if not _ENABLED:
        return False
    if not _INTERPRET and jax.default_backend() != "tpu":
        return False
    if L.ndim != 2 or L.dtype != jnp.float32 or B.dtype != jnp.float32:
        return False
    q = 1 if B.ndim == 1 else B.shape[-1]
    return L.shape[-1] >= _MIN_N and q >= _WIDE_RHS


if should_use_wide_solve.__doc__:  # absent under python -OO
    should_use_wide_solve.__doc__ = should_use_wide_solve.__doc__.format(
        wide=_WIDE_RHS
    )


def _padded_tri(L: jax.Array, block: int):
    n = L.shape[-1]
    pad = (-n) % block
    if pad:
        L = jnp.pad(L, ((0, pad), (0, pad))) + jnp.diag(jnp.concatenate(
            [jnp.zeros((n,), L.dtype), jnp.ones((pad,), L.dtype)]
        ))
    return L, n


@jax.custom_vjp
def solve_lower_wide(L: jax.Array, B: jax.Array) -> jax.Array:
    """``L⁻¹ B`` for a fat RHS via trtri + GEMM (see
    ``should_use_wide_solve``). Reference semantics ``U' \\ B``
    (src/util/common_covmat_ops.jl:54-60) at TPU scale."""
    Lp, n = _padded_tri(L, _BLOCK)
    W = _inv_lower_blocked(Lp, _BLOCK)[:n, :n]
    return _trmm_ll(W, B)


@jax.custom_vjp
def solve_upper_wide(L: jax.Array, B: jax.Array) -> jax.Array:
    """``L⁻ᵀ B`` for a fat RHS via trtri + GEMM (reference ``U \\ B``)."""
    Lp, n = _padded_tri(L, _BLOCK)
    W = _inv_lower_blocked(Lp, _BLOCK)[:n, :n]
    return _trmm_ul(W, B)


@jax.custom_vjp
def chol_solve_wide(L: jax.Array, B: jax.Array) -> jax.Array:
    """``(L Lᵀ)⁻¹ B`` for a fat RHS: ONE doubling trtri + two triangular
    TRMMs (``X = L⁻ᵀ(L⁻¹B)``). The naive ``solve_upper(L, solve_lower(L,
    B))`` composition would run the ~N³/3 trtri twice (once per wide
    solve); ``FiniteGP.invcov`` / ``covmat.chol_solve`` route here at
    TPU scale instead."""
    Lp, n = _padded_tri(L, _BLOCK)
    W = _inv_lower_blocked(Lp, _BLOCK)[:n, :n]
    return _trmm_ul(W, _trmm_ll(W, B))


def _chol_solve_wide_fwd(L, B):
    X = chol_solve_wide(L, B)
    return X, (L, X)


def _chol_solve_wide_bwd(res, Xbar):
    # X = K⁻¹B, K = LLᵀ: B̄ = K⁻¹X̄; L̄ = −tril((S Xᵀ + X Sᵀ) L), S = B̄
    L, X = res
    S = chol_solve_wide(L, Xbar)
    M = _mm(S, X.T)
    Lbar = -jnp.tril(_mm(M + M.T, L))
    return Lbar, S


chol_solve_wide.defvjp(_chol_solve_wide_fwd, _chol_solve_wide_bwd)


def _solve_upper_wide_fwd(L, B):
    X = solve_upper_wide(L, B)
    return X, (L, X)


def _solve_upper_wide_bwd(res, Xbar):
    # adjoint of X = L⁻ᵀB: B̄ = L⁻¹ X̄, L̄ = −tril(X B̄ᵀ)
    L, X = res
    Bbar = solve_lower_wide(L, Xbar)
    Lbar = -jnp.tril(_mm(X, Bbar.T))
    return Lbar, Bbar


solve_upper_wide.defvjp(_solve_upper_wide_fwd, _solve_upper_wide_bwd)


def _solve_lower_wide_fwd(L, B):
    X = solve_lower_wide(L, B)
    return X, (L, X)


def _solve_lower_wide_bwd(res, Xbar):
    # standard triangular-solve adjoint: B̄ = L⁻ᵀ X̄, L̄ = −tril(B̄ Xᵀ)
    L, X = res
    Bbar = solve_upper_wide(L, Xbar)
    Lbar = -jnp.tril(_mm(Bbar, X.T))
    return Lbar, Bbar


solve_lower_wide.defvjp(_solve_lower_wide_fwd, _solve_lower_wide_bwd)
