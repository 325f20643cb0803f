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

``blocked_solve_lower`` applies the same invert-diagonal-block + GEMM
strategy to large triangular solves (reference ``U' \\ B`` sites).
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
# Diagonal-block factorization: one Pallas kernel, B rank-1 updates in VMEM.
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


def _left_looking_sweep(npad: int, block: int, panel_fn, dtype) -> jax.Array:
    """The single left-looking factorization driver behind both the
    read-from-A and build-from-kernel sweeps.

    Right-looking rewrites the whole trailing matrix every panel —
    O(N³/B) words of HBM traffic (≈5.7 GB at N=8192, B=256). Left-looking
    instead updates each panel once against the already-computed columns:

        P_k  = panel_fn(k) − L[kB:, :kB] · L[kB:(k+1)B, :kB]ᵀ
        L_kk = chol(P_k top block)          (Pallas VMEM kernel)
        L_21 = P_k rest · L_kk⁻ᵀ            (GEMM)

    Total traffic ≈ N³/(6B) words and every GEMM has a fat contraction
    dimension kB — MXU-efficient — at identical FLOP count. The L buffer is
    updated with .at[].set panel writes, which XLA elides to in-place.

    ``panel_fn(k, r0)`` returns the (npad − r0, block) lower panel of the
    (pre-padded) SPD matrix. The Python loop is statically unrolled, so
    trace/compile size grows with nb = npad/block — fine to ~16k rows
    (~128 panels); beyond that use the sharded ``_factorize_slab`` sweep,
    whose ``lax.fori_loop`` is O(1)-compile at ~2× the triangular FLOPs.
    """
    nb = npad // block
    L = jnp.zeros((npad, npad), dtype)
    for k in range(nb):
        r0 = k * block
        P = panel_fn(k, r0)
        if k:
            # subtract contributions of finished columns (one fat GEMM)
            P = P - _mm(L[r0:, :r0], L[r0:r0 + block, :r0].T)
        Lkk = _chol_block(P[:block], interpret=_INTERPRET)
        if r0 + block < npad:
            L21 = _mm(P[block:], _inv_lower(Lkk).T)   # (rest, B) GEMM
            col = jnp.concatenate([Lkk, L21], axis=0)
        else:
            col = Lkk
        L = L.at[r0:, r0:r0 + block].set(col)
    return L


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
        np_, block, lambda k, r0: A[r0:, r0:r0 + block], A.dtype
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


def _cholesky_gram_impl(kernel, x, noise_diag, block):
    """Left-looking sweep whose panels are BUILT, not read: panel k is
    ``k(x[kB:], x[kB:(k+1)B]) + diag-noise block``, so the N×N gram matrix
    never exists in HBM (peak memory = L + one panel, vs 2·N² for
    build-then-factorize). Total gram FLOPs are unchanged — they just run
    panel-by-panel ahead of each TRSM."""
    kernel, x = _peel_transforms(kernel, x)
    n = x.shape[0]
    pad = (-n) % block
    npad = n + pad
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        noise_diag = jnp.pad(noise_diag, (0, pad))

    def panel_fn(k, r0):
        xb = x[r0:r0 + block]
        P = kernel.cross(x[r0:], xb).astype(jnp.float32)  # (npad-r0, B)
        rows = r0 + jnp.arange(npad - r0, dtype=jnp.int32)[:, None]
        cols = r0 + jnp.arange(block, dtype=jnp.int32)[None, :]
        on_diag = rows == cols
        P = P + jnp.where(on_diag, noise_diag[r0:, None], 0.0)
        if pad:
            # padded rows/cols → identity block (log 1 = 0, zero fill-in)
            is_pad = (rows >= n) | (cols >= n)
            P = jnp.where(is_pad, jnp.where(on_diag, 1.0, 0.0), P)
        return P

    L = _left_looking_sweep(npad, block, panel_fn, jnp.float32)
    return L[:n, :n] if pad else L


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


def _inv_lower_blocked(L: jax.Array, block: int) -> jax.Array:
    """``W = L⁻¹`` (lower triangular) by row-panel forward substitution.

    One fat GEMM per panel: ``W[i] = L_ii⁻¹ (E_i − L[i, :iB] W[:iB, :iB])``,
    where the product is restricted to W's nonzero columns — ~2N³/3 FLOPs
    (the dense-RHS TRSM would be N³) and nb GEMMs total (compile-friendly).
    Assumes N divisible by ``block`` (callers pad).
    """
    n = L.shape[-1]
    nb = n // block
    W = jnp.zeros((n, n), L.dtype)
    for i in range(nb):
        r0 = i * block
        Lii_inv = _inv_lower(L[r0:r0 + block, r0:r0 + block])
        if i == 0:
            Wi = Lii_inv
            W = W.at[:block, :block].set(Wi)
            continue
        rhs = -_mm(L[r0:r0 + block, :r0], W[:r0, :r0])  # (B, r0)
        Wi = jnp.concatenate([_mm(Lii_inv, rhs), Lii_inv], axis=1)  # (B, r0+B)
        W = W.at[r0:r0 + block, :r0 + block].set(Wi)
    return W


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
    L = cholesky_gram(kernel, x, noise_diag)
    return _logpdf_from_chol(L, delta)


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
    L = cholesky_gram(kernel, x, noise_diag)
    out, z = _logpdf_and_z_from_chol(L, delta)
    vec = delta.ndim == 1
    alpha = lax.linalg.triangular_solve(
        L, z, left_side=True, lower=True, transpose_a=True
    )  # (n, q) = (K+Σ)⁻¹ δ
    return out, (kernel, x, noise_diag, L, alpha, vec)


def _gram_logpdf_bwd(res, gbar):
    kernel, x, noise_diag, L, alpha, vec = res
    g = jnp.reshape(gbar, (1,)) if vec else gbar  # (q,)
    n = L.shape[0]
    pad = (-n) % _BLOCK
    Lp = L
    if pad:
        Lp = jnp.pad(L, ((0, pad), (0, pad))) + jnp.diag(jnp.concatenate(
            [jnp.zeros((n,), L.dtype), jnp.ones((pad,), L.dtype)]
        ))
    W = _inv_lower_blocked(Lp, _BLOCK)[:n, :n]
    Kinv = _mm(W.T, W)
    gsum = jnp.sum(g)
    # Ā = ½ Σ_j ḡ_j α_j α_jᵀ − ½ (Σ ḡ) K⁻¹
    Abar = 0.5 * (_mm(alpha * g[None, :], alpha.T) - gsum * Kinv)
    _, vjp = jax.vjp(_build_gram, kernel, x, noise_diag)
    kbar, xbar, ndbar = vjp(Abar)
    # ∂/∂δ_j = −ḡ_j α_j
    dbar = -(alpha * g[None, :])
    dbar = dbar[:, 0] if vec else dbar
    return kbar, xbar, ndbar, dbar


gram_logpdf_core.defvjp(_gram_logpdf_fwd, _gram_logpdf_bwd)


# ---------------------------------------------------------------------------
# Blocked TRSM: solve L X = B with diagonal-block inverses + GEMMs.
# ---------------------------------------------------------------------------


def blocked_solve_lower(L: jax.Array, B: jax.Array, block: int = _BLOCK):
    """Solve ``L X = B`` (L lower-triangular) by block forward substitution.

    Each diagonal block is inverted once (O(B³)); off-diagonal updates are
    GEMMs, so the whole solve is MXU-bound. Used for the O(N²·M) posterior
    whitening solves (reference ``C.U' \\ C_xcond_x``, §3.3).
    """
    n = L.shape[-1]
    b_vec = B.ndim == 1
    Bm = B[:, None] if b_vec else B
    pad = (-n) % block
    if pad:
        L = jnp.pad(L, ((0, pad), (0, pad))) + jnp.diag(
            jnp.concatenate([jnp.zeros((n,), L.dtype), jnp.ones((pad,), L.dtype)])
        )
        Bm = jnp.pad(Bm, ((0, pad), (0, 0)))
    np_ = n + pad
    nb = np_ // block

    xs = []
    R = Bm  # remaining rhs rows, shrinks by one block per step
    for k in range(nb):
        Lkk = L[k * block:(k + 1) * block, k * block:(k + 1) * block]
        Xk = _mm(_inv_lower(Lkk), R[:block])
        rest = R.shape[0] - block
        if rest > 0:
            L_below = L[(k + 1) * block:, k * block:(k + 1) * block]
            R = R[block:] - _mm(L_below, Xk)
        xs.append(Xk)
    X = jnp.concatenate(xs, axis=0)[:n]
    return X[:, 0] if b_vec else X
