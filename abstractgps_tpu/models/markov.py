"""Markov (state-space) GP backend — linear-time exact inference in 1-D.

The reference's README positions TemporalGPs.jl as the downstream package
that implements the AbstractGP API with state-space methods
(reference: README.md:60-66); the three-tier API contract exists precisely
so such matrix-free backends can provide the Primary API without ever
forming a covariance matrix (reference: docs/src/api.md:77-84). This module
is that backend, built TPU-first:

Matérn kernels in 1-D are exactly the covariance functions of linear
time-invariant SDEs (Hartikainen & Särkkä 2010), so for sorted inputs the
GP is a Gauss–Markov chain and

- ``markov_logpdf``     ≡ ``fx.logpdf(y)``                    in O(N·p³)
- ``markov_mean_and_var`` ≡ exact-posterior ``mean_and_var``  in O(N·p³)

with state dimension p ∈ {1, 2, 3}. Two execution strategies:

- sequential Kalman filter / RTS smoother as ``lax.scan`` (O(N) depth);
- **parallel-in-time** filter as ``lax.associative_scan`` (Särkkä &
  García-Fernández 2020): O(log N) depth, the natural fit for TPU where
  a long sequential scan leaves the MXU idle. ``parallel=True`` selects it.

Supported kernels: ExponentialKernel/Matern12 (p=1), Matern32 (p=2),
Matern52 (p=3), scaled (``σ² * k``) and lengthscale
(``with_lengthscale`` / ``ScaleTransform``) versions, and sums of these
(block-diagonal state augmentation). Anything else raises ``TypeError``.

Discretization uses the exact matrix exponential: the Matérn companion
matrix ``F`` has a single eigenvalue ``−λ``, so ``N = F + λI`` is nilpotent
of degree p and ``expm(F·dt) = e^{−λ·dt} (I + N·dt + (N·dt)²/2)`` exactly —
no iterative expm, no Padé, just fused VPU math. Process noise is computed
in cancellation-free incomplete-gamma closed form (``_stable_Q``) rather
than as ``P∞ − A P∞ Aᵀ``.

f32 accuracy contract (f64 is exact to ~1e-9 everywhere): single Matérn
components hold ~1e-4 relative logpdf error even at densely sampled inputs
(λ·dt ≈ 0.02, n=5000 — measured vs f64 oracle). Kernel SUMS degrade with
component redundancy — two identical components measured 1.8e-2 (the
near-unobservable difference mode ill-conditions the covariance filter;
Joseph form + symmetrization don't recover it) — a square-root
(Cholesky-factor) filter is the known fix and future work; use f64 on CPU
when summed-kernel logpdf accuracy below 1e-2 matters.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels.base import (
    Kernel,
    KernelSum,
    ScaledKernel,
    ScaleTransform,
    TransformedKernel,
)
from ..kernels.stationary import ExponentialKernel, Matern32Kernel, Matern52Kernel
from ..means import mean_vector
from .gp import AbstractGP
from ..ops.distance import as_inputs
from ..ops.noise import DenseNoise, as_noise

__all__ = [
    "sde_coefficients",
    "markov_logpdf",
    "markov_mean_and_var",
    "markov_rand",
    "markov_posterior",
    "MarkovPosteriorGP",
    "is_markov_kernel",
]

_LOG_2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# Kernel → SDE coefficients
# ---------------------------------------------------------------------------


def _base_order(kernel) -> int | None:
    if isinstance(kernel, ExponentialKernel):
        return 1
    if isinstance(kernel, Matern32Kernel):
        return 2
    if isinstance(kernel, Matern52Kernel):
        return 3
    return None


def sde_coefficients(kernel: Kernel, dtype=jnp.float64):
    """Flatten a Markov-representable kernel into per-component (λ, p, σ²).

    Components come from summands; scaling multiplies σ²; a ScaleTransform s
    (lengthscale ℓ = 1/s) multiplies λ. Returns a list of
    ``(lam, order, variance)`` with lam/variance as traced scalars.
    Raises TypeError for kernels with no exact state-space form.
    """
    out = []

    def visit(k, var_scale, len_scale):
        if isinstance(k, KernelSum):
            for kk in k.kernels:
                visit(kk, var_scale, len_scale)
            return
        if isinstance(k, ScaledKernel):
            visit(k.kernel, var_scale * k.variance, len_scale)
            return
        if isinstance(k, TransformedKernel):
            if not isinstance(k.transform, ScaleTransform):
                raise TypeError(
                    "markov backend supports only ScaleTransform (lengthscale) "
                    f"input transforms, got {type(k.transform).__name__}"
                )
            visit(k.kernel, var_scale, len_scale * k.transform.s)
            return
        p = _base_order(k)
        if p is None:
            raise TypeError(
                f"kernel {type(k).__name__} has no exact 1-D state-space form; "
                "supported: Exponential/Matern12, Matern32, Matern52, their "
                "scaled/lengthscale versions, and sums thereof"
            )
        root = {1: 1.0, 2: math.sqrt(3.0), 3: math.sqrt(5.0)}[p]
        lam = jnp.asarray(root, dtype) * jnp.asarray(len_scale, dtype)
        out.append((lam, p, jnp.asarray(var_scale, dtype)))

    visit(kernel, 1.0, 1.0)
    return out


def is_markov_kernel(kernel: Kernel) -> bool:
    """True if ``sde_coefficients`` accepts this kernel."""
    try:
        sde_coefficients(kernel)
        return True
    except TypeError:
        return False


def _component_matrices(lam, p: int, var, dtype):
    """(F+λI nilpotent N, P∞, H-row) for one Matérn component."""
    if p == 1:
        N = jnp.zeros((1, 1), dtype)
        P = var * jnp.ones((1, 1), dtype)
    elif p == 2:
        z = jnp.zeros_like(lam)
        N = jnp.stack(
            [jnp.stack([lam, 1.0 + z]), jnp.stack([-(lam**2), -lam])]
        ).astype(dtype)
        P = var * jnp.diag(jnp.stack([jnp.ones_like(lam), lam**2]))
    elif p == 3:
        z = jnp.zeros_like(lam)
        N = jnp.stack(
            [
                jnp.stack([lam, 1.0 + z, z]),
                jnp.stack([z, lam, 1.0 + z]),
                jnp.stack([-(lam**3), -3.0 * lam**2, -2.0 * lam]),
            ]
        ).astype(dtype)
        k2 = lam**2 / 3.0
        P = var * jnp.stack(
            [
                jnp.stack([1.0 + z, z, -k2]),
                jnp.stack([z, k2, z]),
                jnp.stack([-k2, z, lam**4]),
            ]
        ).astype(dtype)
    else:  # pragma: no cover
        raise ValueError(p)
    H = jnp.zeros((p,), dtype).at[0].set(1.0)
    return N, P, H


def _stable_Q(lam, p: int, var, dts, dtype):
    """Process noise Q(dt) in cancellation-free closed form, (n, p, p).

    ``Q = P∞ − A P∞ Aᵀ`` is exact algebra but catastrophic numerics at
    small λ·dt: Q₁₁ ~ (λdt)^(2p−1) computed as a difference of O(1)
    terms — at f32 with densely sampled inputs (λdt ≈ 0.02) that is ~1%
    relative error in Q and was measured as 0.9% error in the n=5000
    logpdf (f64 oracle). Instead integrate the white-noise forcing
    directly: with v(s) = e^{λs}·(e^{Fs}L) a degree-(p−1) POLYNOMIAL
    (F+λI is nilpotent), every entry is

        Q_ij = q ∫₀^dt v_i v_j e^{−2λs} ds = q Σ_k c_k · I_k,
        I_k  = k!/(2λ)^{k+1} · P(k+1, 2λdt),

    with P the regularized lower incomplete gamma (``gammainc``) — each
    I_k evaluated positively and stably for all dt. The c_k sums below
    are pre-reduced per Matérn order; every coefficient set was checked
    against the stationary limit Q(∞) = P∞ entrywise. Q₁₁ = σ²P(2p−1,
    2λdt) exactly.
    """
    from jax.scipy.special import gammainc

    x = (2.0 * lam * dts).astype(dtype)
    one = jnp.ones_like(x)
    if p == 1:
        q11 = var * gammainc(1.0 * one, x)
        return q11[:, None, None]
    if p == 2:
        P2, P3 = gammainc(2.0 * one, x), gammainc(3.0 * one, x)
        q11 = var * P3
        q12 = var * lam * (P2 - P3)
        q22 = var * lam**2 * (2.0 * gammainc(1.0 * one, x) - 2.0 * P2 + P3)
        row1 = jnp.stack([q11, q12], axis=-1)
        row2 = jnp.stack([q12, q22], axis=-1)
        return jnp.stack([row1, row2], axis=-2)
    if p == 3:
        P1 = gammainc(1.0 * one, x)
        P2 = gammainc(2.0 * one, x)
        P3 = gammainc(3.0 * one, x)
        P4 = gammainc(4.0 * one, x)
        P5 = gammainc(5.0 * one, x)
        l2 = lam * lam
        q11 = var * P5
        q12 = var * lam * (P4 - P5)
        q13 = var * l2 / 3.0 * (2.0 * P3 - 6.0 * P4 + 3.0 * P5)
        q22 = var * l2 / 3.0 * (4.0 * P3 - 6.0 * P4 + 3.0 * P5)
        q23 = var * lam * l2 / 3.0 * (4.0 * P2 - 10.0 * P3 + 9.0 * P4 - 3.0 * P5)
        q33 = var * l2 * l2 / 3.0 * (
            8.0 * P1 - 16.0 * P2 + 20.0 * P3 - 12.0 * P4 + 3.0 * P5)
        row1 = jnp.stack([q11, q12, q13], axis=-1)
        row2 = jnp.stack([q12, q22, q23], axis=-1)
        row3 = jnp.stack([q13, q23, q33], axis=-1)
        return jnp.stack([row1, row2, row3], axis=-2)
    raise ValueError(p)  # pragma: no cover


def _build_ssm(kernel, x_sorted, dtype):
    """Batched discrete-time model over the sorted timeline.

    Returns (A, Q, H, Pinf) with A/Q shaped (n, D, D); step 0 encodes the
    stationary prior via A=0, Q=P∞ so the filter needs no special casing.
    """
    comps = sde_coefficients(kernel, dtype)
    dts = jnp.diff(x_sorted)  # (n-1,)

    blocks_A, blocks_Q, Hs, Ps, lams = [], [], [], [], []
    for lam, p, var in comps:
        N, P, H = _component_matrices(lam, p, var, dtype)
        eye = jnp.eye(p, dtype=dtype)

        def A_of(dt, N=N, p=p, lam=lam, eye=eye):
            Ndt = N * dt
            series = eye + Ndt
            if p == 3:
                series = series + 0.5 * (Ndt @ Ndt)
            return jnp.exp(-lam * dt) * series

        A = jax.vmap(A_of)(dts)  # (n-1, p, p)
        Q = _stable_Q(lam, p, var, dts, dtype)
        blocks_A.append(A)
        blocks_Q.append(Q)
        Hs.append(H)
        Ps.append(P)
        lams.append(lam)

    D = sum(b.shape[-1] for b in blocks_A)
    n = x_sorted.shape[0]

    def blkdiag(mats):
        out = jnp.zeros((mats[0].shape[0], D, D), dtype)
        o = 0
        for m in mats:
            pp = m.shape[-1]
            out = out.at[:, o:o + pp, o:o + pp].set(m)
            o += pp
        return out

    A_steps = blkdiag(blocks_A)  # (n-1, D, D)
    Q_steps = blkdiag(blocks_Q)
    Pinf = jnp.zeros((D, D), dtype)
    o = 0
    for P in Ps:
        pp = P.shape[-1]
        Pinf = Pinf.at[o:o + pp, o:o + pp].set(P)
        o += pp
    H = jnp.concatenate(Hs)  # (D,)

    A = jnp.concatenate([jnp.zeros((1, D, D), dtype), A_steps], axis=0)
    Q = jnp.concatenate([Pinf[None], Q_steps], axis=0)
    return A, Q, H, Pinf


# ---------------------------------------------------------------------------
# Filtering
# ---------------------------------------------------------------------------


def _seq_filter(A, Q, H, y, r, obs_mask):
    """Sequential Kalman filter (lax.scan). Returns per-step filtered
    (m, P), one-step predictions (m_pred, P_pred), and the total loglik of
    observed steps. ``r`` is per-step observation noise variance."""
    D = H.shape[0]
    dtype = H.dtype

    def step(carry, inp):
        m, P = carry
        Ak, Qk, yk, rk, ok = inp
        m_pred = Ak @ m
        P_pred = Ak @ P @ Ak.T + Qk
        v = yk - H @ m_pred
        S = H @ P_pred @ H + rk
        K = (P_pred @ H) / S
        ll = -0.5 * (_LOG_2PI + jnp.log(S) + v * v / S)
        Km = jnp.where(ok, K, jnp.zeros_like(K))
        m_new = m_pred + Km * v
        IKH = jnp.eye(D, dtype=dtype) - jnp.outer(Km, H)
        P_new = IKH @ P_pred @ IKH.T + rk * jnp.outer(Km, Km)  # Joseph form
        ll = jnp.where(ok, ll, 0.0)
        return (m_new, P_new), (m_new, P_new, m_pred, P_pred, ll)

    init = (jnp.zeros((D,), dtype), jnp.zeros((D, D), dtype))
    _, (m_f, P_f, m_p, P_p, lls) = lax.scan(step, init, (A, Q, y, r, obs_mask))
    return m_f, P_f, m_p, P_p, jnp.sum(lls)


def _inv_posdef_small(M):
    """Batched inverse of (n, D, D) matrices, closed-form for D ≤ 3.

    The parallel-filter combine inverts ``I + C J`` (positive-definite
    products of covariance-like factors) at every scan level.
    ``jnp.linalg.solve`` there was measured to make XLA compile time scale
    LINEARLY with n (~3 ms/point on CPU: ~25 s at n=8k, extrapolating to
    ~1 h at n=10⁶) and lowers to batched LU — absurd for the p ∈ {1,2,3}
    Matérn state dims. Adjugate/determinant closed forms are branch-free
    VPU math; D > 3 (big kernel sums) falls back to ``linalg.solve``.
    """
    D = M.shape[-1]
    if D == 1:
        return 1.0 / M
    if D == 2:
        a, b = M[..., 0, 0], M[..., 0, 1]
        c, d = M[..., 1, 0], M[..., 1, 1]
        det = a * d - b * c
        return jnp.stack([
            jnp.stack([d, -b], axis=-1),
            jnp.stack([-c, a], axis=-1),
        ], axis=-2) / det[..., None, None]
    if D == 3:
        a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
        g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
        A_ = e * i - f * h
        B_ = -(d * i - f * g)
        C_ = d * h - e * g
        det = a * A_ + b * B_ + c * C_
        adjT = jnp.stack([
            jnp.stack([A_, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B_, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C_, -(a * h - b * g), a * e - b * d], axis=-1),
        ], axis=-2)
        return adjT / det[..., None, None]
    eye = jnp.eye(D, dtype=M.dtype)
    return jnp.linalg.solve(M, jnp.broadcast_to(eye, M.shape))


_PAR_CHUNK = 4096  # inner associative-scan width for the chunked filter


def _chunked_associative_scan(combine, elems, identity, chunk=None):
    """Inclusive associative scan with O(chunk) compile cost.

    A flat ``lax.associative_scan`` at n = 10⁵–10⁶ was measured to compile
    in minutes-to-an-hour (XLA time grows with every level's full-length
    slice set). Standard blocked decomposition instead: reshape to
    (n/chunk, chunk) chunks, run ONE ``lax.scan`` over chunks whose body
    does the within-chunk associative scan (fixed width → fixed compile
    cost) and composes the running cross-chunk prefix into each element.
    The carried aggregate makes the scan body's data dependency the chunk
    AGGREGATE only; within-chunk work stays parallel (log₂ chunk depth on
    the VPU), so device utilization matches the flat scan while compile
    time is O(chunk + 1) regardless of n.

    ``identity`` is the monoid's left identity (combine(identity, x) == x),
    used as the initial cross-chunk carry. The tail is padded with all-zero
    elements and the padded outputs sliced off — ``combine`` must be
    well-defined (no NaN/inf) on zero elements. ``combine`` must accept
    leading-batch pytrees (the same batched combine the flat scan uses).
    """
    if chunk is None:
        chunk = _PAR_CHUNK  # late-bound so tests/tuning can override
    n = jax.tree.leaves(elems)[0].shape[0]
    if n <= chunk:
        return lax.associative_scan(combine, elems)
    pad = (-n) % chunk
    nc = (n + pad) // chunk

    def pad_reshape(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        return x.reshape((nc, chunk) + x.shape[1:])

    elems_c = jax.tree.map(pad_reshape, elems)

    def body(carry, chunk_elems):
        within = lax.associative_scan(combine, chunk_elems)
        # compose the running cross-chunk prefix into every element
        carry_b = jax.tree.map(
            lambda c: jnp.broadcast_to(c[None], (chunk,) + c.shape), carry
        )
        out = combine(carry_b, within)
        new_carry = jax.tree.map(lambda o: o[-1], out)
        return new_carry, out

    # the left-identity carry lets ONE scan cover every chunk (a separate
    # unrolled first chunk would compile a second associative-scan
    # instance for nothing)
    _, out = lax.scan(body, identity, elems_c)
    return jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[2:])[:n], out
    )


def _par_filter(A, Q, H, y, r, obs_mask):
    """Parallel-in-time Kalman filter via associative scan
    (Särkkä & García-Fernández 2020, filtering elements). O(log chunk)
    depth within chunks (``_chunked_associative_scan``).

    Unobserved steps degenerate to pure prediction elements (K = 0, η = 0,
    J = 0). Step 0's A=0/Q=P∞ encodes the stationary prior exactly as in
    the sequential filter. The marginal likelihood is reassembled afterwards
    from the filtered means/covs shifted by one step (vectorized, no extra
    scan).

    Padding note: ``_chunked_associative_scan`` pads the tail with
    all-zeros elements. A zero element (A=0, b=0, C=0, η=0, J=0) is
    ABSORBING on the left-argument side (combine(x, zero) keeps only
    zero's prediction through x — not identity), but padded outputs are
    sliced off before use and zero J/C keep every inverse well-posed, so
    the first n outputs are exact.
    """
    D = H.shape[0]
    dtype = H.dtype
    eye = jnp.eye(D, dtype=dtype)

    # fusion fence: letting XLA fuse the (n,D,D) model construction
    # (_build_ssm's expm/blkdiag expressions) into the scan consumer was
    # measured to blow CPU compile up 14x (179 s vs 12.8 s at n=10k,
    # identical output); the barrier materializes A/Q once and keeps the
    # scan body self-contained
    A, Q, y, r = lax.optimization_barrier((A, Q, y, r))

    S = jnp.einsum("i,nij,j->n", H, Q, H) + r                      # (n,)
    K = jnp.where(obs_mask[:, None], (Q @ H) / S[:, None], 0.0)    # (n, D)
    IKH = eye[None] - K[:, :, None] * H[None, None, :]             # (n, D, D)
    A_el = IKH @ A
    b_el = K * y[:, None]
    C_el = IKH @ Q
    HS = jnp.where(obs_mask[:, None], H[None, :] / S[:, None], 0.0)  # (n, D)
    AtHS = jnp.einsum("nji,nj->ni", A, HS)                         # Aᵀ H / S
    eta_el = AtHS * y[:, None]
    J_el = AtHS[:, :, None] * jnp.einsum("nij,i->nj", A, H)[:, None, :]

    def combine(e1, e2):
        A1, b1, C1, e1t, J1 = e1
        A2, b2, C2, e2t, J2 = e2
        T = _inv_posdef_small(jnp.broadcast_to(eye, C1.shape) + C1 @ J2)
        AT = A2 @ T
        Anew = AT @ A1
        bnew = jnp.einsum("nij,nj->ni", AT, b1 + jnp.einsum("nij,nj->ni", C1, e2t)) + b2
        Cnew = AT @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
        Tt = _inv_posdef_small(jnp.broadcast_to(eye, C1.shape) + J2 @ C1)
        A1T = jnp.swapaxes(A1, -1, -2) @ Tt
        enew = jnp.einsum(
            "nij,nj->ni", A1T, e2t - jnp.einsum("nij,nj->ni", J2, b1)
        ) + e1t
        Jnew = A1T @ J2 @ A1 + J1
        return (Anew, bnew, Cnew, enew, Jnew)

    # identity of the filtering-element monoid: combine(id, x) == x
    identity = (eye, jnp.zeros((D,), dtype), jnp.zeros((D, D), dtype),
                jnp.zeros((D,), dtype), jnp.zeros((D, D), dtype))
    _, b_f, C_f, _, _ = _chunked_associative_scan(
        combine, (A_el, b_el, C_el, eta_el, J_el), identity
    )
    m_f, P_f = b_f, C_f  # filtered moments

    # predictions: m_pred_k = A_k m_{k-1}, P_pred_k = A_k P_{k-1} A_kᵀ + Q_k
    m_prev = jnp.concatenate([jnp.zeros((1, D), dtype), m_f[:-1]], axis=0)
    P_prev = jnp.concatenate([jnp.zeros((1, D, D), dtype), P_f[:-1]], axis=0)
    m_p = jnp.einsum("nij,nj->ni", A, m_prev)
    P_p = A @ P_prev @ jnp.swapaxes(A, -1, -2) + Q

    v = y - m_p @ H
    Sp = jnp.einsum("i,nij,j->n", H, P_p, H) + r
    lls = jnp.where(obs_mask, -0.5 * (_LOG_2PI + jnp.log(Sp) + v * v / Sp), 0.0)
    return m_f, P_f, m_p, P_p, jnp.sum(lls)


def _rts_smoother(A, m_f, P_f, m_p, P_p):
    """Sequential RTS smoother (reverse lax.scan) over the filtered pass."""
    ms, Ps, _ = _rts_smoother_gains(A, m_f, P_f, m_p, P_p)
    return ms, Ps


def _rts_smoother_gains(A, m_f, P_f, m_p, P_p):
    """RTS smoother that also returns the gains ``G_k`` (k = 0..n−2).

    ``G_k = P_k^f A_{k+1}ᵀ (P_{k+1}^p)⁻¹`` links state k to k+1; the gains
    are what turn the smoother into a JOINT posterior over the whole
    timeline: ``Cov(s_i, s_j) = G_i G_{i+1} … G_{j−1} P_j^s`` for i < j
    (the smoothed chain is itself Gauss–Markov — Särkkä, *Bayesian
    Filtering and Smoothing*, Thm 8.2), which is how the Markov backend
    serves full posterior cross-covariances without any N×N solve.
    """
    n, D = m_f.shape

    def step(carry, inp):
        ms_next, Ps_next = carry
        mk, Pk, mp_next, Pp_next, A_next = inp
        G = jnp.linalg.solve(Pp_next.T, (Pk @ A_next.T).T).T
        ms = mk + G @ (ms_next - mp_next)
        Ps = Pk + G @ (Ps_next - Pp_next) @ G.T
        return (ms, Ps), (ms, Ps, G)

    init = (m_f[-1], P_f[-1])
    inps = (m_f[:-1], P_f[:-1], m_p[1:], P_p[1:], A[1:])
    _, (ms, Ps, Gs) = lax.scan(step, init, inps, reverse=True)
    ms = jnp.concatenate([ms, m_f[-1:]], axis=0)
    Ps = jnp.concatenate([Ps, P_f[-1:]], axis=0)
    return ms, Ps, Gs


def _pairwise_fcov(H, Gs, Ps):
    """Full pairwise posterior covariance of ``f = Hᵀs`` over the timeline.

    ``F[i, j] = Hᵀ (G_i … G_{j−1} P_j^s) H`` (i ≤ j), symmetrised. One
    ``lax.scan`` over columns with a carried (n, D, D) product table —
    O(n²·p³) work for an inherently O(n²) output. ``_posterior_joint``
    pre-collapses the training timeline into between-QUERY segment
    products, so n here is the number of query points, never the
    training size (marginals stay O(n·p³) via ``markov_mean_and_var``).
    """
    n, D = Ps.shape[0], Ps.shape[1]
    eye = jnp.eye(D, dtype=Ps.dtype)
    idx = jnp.arange(n)
    U0 = jnp.broadcast_to(eye, (n, D, D))
    Gpad = jnp.concatenate([Gs, jnp.broadcast_to(eye, (1, D, D))], axis=0)

    def step(U, inp):
        j, Pj, Gj = inp
        col = jnp.einsum("a,nab,bc,c->n", H, U, Pj, H)
        col = jnp.where(idx <= j, col, 0.0)
        U_new = U @ Gj
        U_new = jnp.where((idx == j + 1)[:, None, None], eye, U_new)
        return U_new, col

    _, cols = lax.scan(step, U0, (idx, Ps, Gpad))
    F_ut = cols.T  # (i, j) upper triangle (i ≤ j)
    return F_ut + F_ut.T - jnp.diag(jnp.diagonal(F_ut))


# ---------------------------------------------------------------------------
# Public API (drop-ins for the dense tier-P operations)
# ---------------------------------------------------------------------------


def _prep(fx, y):
    x = as_inputs(fx.x)
    if x.shape[1] != 1:
        raise TypeError("markov backend requires 1-D inputs")
    if isinstance(fx.noise, DenseNoise):
        raise TypeError("markov backend requires diagonal-structured noise")
    t = x[:, 0]
    dtype = t.dtype
    order = jnp.argsort(t)
    r = as_noise(fx.noise, t.shape[0]).diag().astype(dtype)
    return t[order], y[order].astype(dtype), r[order], order, dtype


def markov_logpdf(fx, y: jax.Array, parallel: bool = False) -> jax.Array:
    """``fx.logpdf(y)`` in O(N) time / memory for Markov kernels on 1-D x.

    Exact (tested against the dense Cholesky path to 1e-8 in f64); inputs
    need not be pre-sorted. ``y`` may be a vector (n,) → scalar, or a
    matrix (n, q) → (q,) of column-wise log densities (the FiniteGP
    contract; columns are vmapped through the same filter).
    ``parallel=True`` uses the associative-scan filter (O(log N) depth
    on TPU).
    """
    ts, ys, rs, _, dtype = _prep(fx, y)
    m = mean_vector(fx.f.mean_fn, ts[:, None]).astype(dtype)
    A, Q, H, _ = _build_ssm(fx.f.kernel, ts, dtype)
    obs = jnp.ones(ts.shape, bool)
    run = _par_filter if parallel else _seq_filter
    if ys.ndim == 1:
        *_, ll = run(A, Q, H, ys - m, rs, obs)
        return ll
    return jax.vmap(lambda col: run(A, Q, H, col - m, rs, obs)[-1],
                    in_axes=1)(ys)


def _merged_timeline(fx, y, x_test):
    """Sorted union of train/test timepoints with observation mask; returns
    everything needed to filter, plus the slice info to recover test points."""
    xt = as_inputs(x_test)
    if xt.shape[1] != 1:
        raise TypeError("markov backend requires 1-D inputs")
    ts, ys, rs, _, dtype = _prep(fx, y)
    tt = xt[:, 0].astype(dtype)

    t_all = jnp.concatenate([ts, tt])
    y_all = jnp.concatenate([ys, jnp.zeros_like(tt)])
    r_all = jnp.concatenate([rs, jnp.ones_like(tt)])  # dummy; masked out
    obs_all = jnp.concatenate(
        [jnp.ones(ts.shape, bool), jnp.zeros(tt.shape, bool)]
    )
    order = jnp.argsort(t_all)
    t_s, y_s, r_s, o_s = t_all[order], y_all[order], r_all[order], obs_all[order]
    prior_mean_s = mean_vector(fx.f.mean_fn, t_s[:, None]).astype(dtype)
    return t_s, y_s - prior_mean_s, r_s, o_s, prior_mean_s, order, ts.shape[0], dtype


def markov_rand(
    fx,
    y: jax.Array,
    x_test,
    key: jax.Array,
    num_samples: int | None = None,
    parallel: bool = False,
):
    """Joint posterior samples of the latent f at ``x_test`` in O(N+M) —
    the Markov drop-in for ``posterior(fx, y)(x_test, 0).rand(key[, S])``.

    Forward-filter backward-sample (FFBS): one shared filtering pass over
    the merged timeline, then a reverse scan drawing
    ``x_k | x_{k+1} ~ N(m_k + G_k(x_{k+1} − m̂_{k+1}), P_k − G_k P̂_{k+1} G_kᵀ)``
    with all samples vmapped through the same scan.
    """
    t_s, y_s, r_s, o_s, prior_mean_s, order, n_train, dtype = _merged_timeline(
        fx, y, x_test
    )
    A, Q, H, _ = _build_ssm(fx.f.kernel, t_s, dtype)
    run = _par_filter if parallel else _seq_filter
    m_f, P_f, m_p, P_p, _ = run(A, Q, H, y_s, r_s, o_s)

    S = 1 if num_samples is None else num_samples
    D = H.shape[0]
    n_all = t_s.shape[0]
    eps = jax.random.normal(key, (n_all, S, D), dtype)

    def safe_chol(M):
        # P can be exactly singular (e.g. duplicated timepoints); jitter
        # proportional to the trace AND the dtype's resolution keeps the
        # draw well-defined in f32 too (a fixed 1e-12 is below f32 eps).
        jit = 100.0 * jnp.finfo(dtype).eps * (jnp.trace(M) + 1.0)
        return jnp.linalg.cholesky(M + jit * jnp.eye(D, dtype=dtype))

    x_last = m_f[-1][None, :] + eps[-1] @ safe_chol(P_f[-1]).T  # (S, D)

    def step(carry, inp):
        x_next = carry  # (S, D)
        mk, Pk, mp_next, Pp_next, A_next, ek = inp
        G = jnp.linalg.solve(Pp_next.T, (Pk @ A_next.T).T).T
        cond_mean = mk[None, :] + (x_next - mp_next[None, :]) @ G.T
        cond_cov = Pk - G @ Pp_next @ G.T
        Lc = safe_chol(0.5 * (cond_cov + cond_cov.T))
        x_k = cond_mean + ek @ Lc.T
        return x_k, x_k

    inps = (m_f[:-1], P_f[:-1], m_p[1:], P_p[1:], A[1:], eps[:-1])
    _, xs = lax.scan(step, x_last, inps, reverse=True)
    xs = jnp.concatenate([xs, x_last[None]], axis=0)  # (n_all, S, D)

    f_s = xs @ H + prior_mean_s[:, None]  # (n_all, S)
    inv = jnp.argsort(order)
    f_test = f_s[inv][n_train:]  # (M, S)
    return f_test[:, 0] if num_samples is None else f_test


def markov_mean_and_var(fx, y: jax.Array, x_test, parallel: bool = False):
    """Posterior-predictive marginals ``posterior(fx, y)(x_test)`` —
    latent mean and variance at ``x_test`` — in O((N+M)·p³).

    Runs filter + RTS smoother over the merged train/test timeline with
    test points carried as unobserved steps.
    """
    t_s, y_s, r_s, o_s, prior_mean_s, order, n_train, dtype = _merged_timeline(
        fx, y, x_test
    )
    A, Q, H, _ = _build_ssm(fx.f.kernel, t_s, dtype)
    run = _par_filter if parallel else _seq_filter
    m_f, P_f, m_p, P_p, _ = run(A, Q, H, y_s, r_s, o_s)
    ms, Ps = _rts_smoother(A, m_f, P_f, m_p, P_p)

    mean_s = ms @ H + prior_mean_s
    var_s = jnp.maximum(jnp.einsum("i,nij,j->n", H, Ps, H), 0.0)

    # scatter back to the merged order, then slice out the test entries
    inv = jnp.argsort(order)
    return mean_s[inv][n_train:], var_s[inv][n_train:]


def _posterior_joint(fx, y, x_test, parallel: bool = False):
    """Posterior mean AND full covariance of f at ``x_test`` — one
    filter+smoother pass plus pairwise gain products over the QUERY
    points only.

    The pairwise table is O(M²) in the M query points, never in the
    training size: one O(n·p³) scan over the merged timeline collapses
    each between-query gain chain into a single segment product
    ``S_a = G_{q_a} … G_{q_{a+1}−1}`` (resetting the running product at
    every query position), and ``_pairwise_fcov`` then runs over the M
    segment products — total O((N+M)·p³ + M²·p³), honouring the class
    contract that nothing N×N over the training set is ever formed.
    """
    t_s, y_s, r_s, o_s, prior_mean_s, order, n_train, dtype = _merged_timeline(
        fx, y, x_test
    )
    A, Q, H, _ = _build_ssm(fx.f.kernel, t_s, dtype)
    run = _par_filter if parallel else _seq_filter
    m_f, P_f, m_p, P_p, _ = run(A, Q, H, y_s, r_s, o_s)
    ms, Ps, Gs = _rts_smoother_gains(A, m_f, P_f, m_p, P_p)
    mean_s = ms @ H + prior_mean_s

    sel = jnp.argsort(order)[n_train:]   # merged positions, USER order
    if sel.shape[0] == 0:  # empty query set: (0,) mean, (0, 0) covariance
        return mean_s[sel], jnp.zeros((0, 0), mean_s.dtype)
    ord_q = jnp.argsort(sel)             # queries sorted by timeline position
    qpos = sel[ord_q]
    n_all = t_s.shape[0]
    D = Ps.shape[-1]
    eye = jnp.eye(D, dtype=Ps.dtype)
    Gpad = jnp.concatenate([Gs, eye[None]], axis=0)  # G_k links k → k+1
    is_q = jnp.zeros((n_all,), bool).at[qpos].set(True)

    def step(U, inp):
        Gk, qk = inp
        out = U  # ∏_{t=lastq(k)}^{k−1} G_t (carry at entrance of step k)
        U_new = jnp.where(qk, Gk, U @ Gk)  # reset the chain at queries
        return U_new, out

    _, prods = lax.scan(step, eye, (Gpad, is_q))
    segs = prods[qpos][1:]               # (M−1, D, D) between-query products
    Fq = _pairwise_fcov(H, segs, Ps[qpos])
    inv_q = jnp.argsort(ord_q)
    return mean_s[sel], Fq[inv_q][:, inv_q]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fx", "y"],
    meta_fields=["parallel"],
)
@dataclasses.dataclass(frozen=True)
class MarkovPosteriorGP(AbstractGP):
    """Exact GPR posterior served by the state-space backend.

    Same semantics as the dense ``posterior(fx, y)``
    (src/exact_gpr_posterior.jl:25-35) for Markov kernels on 1-D inputs,
    but nothing N×N over the TRAINING set is ever formed: marginals come
    from the O(N·p³) filter/smoother, and cross-covariances between query
    points from the smoother gains (the smoothed chain is Gauss–Markov, so
    ``Cov(f(t_i), f(t_j)) = Hᵀ G_i … G_{j−1} P_j^s H``). Being an
    ``AbstractGP``, it composes with the whole machinery — projection,
    further conditioning, conformance suites (posteriors-are-GPs,
    src/posterior_gp.jl pattern). ``cov`` between M query points costs
    O((N+M)·p³ + M²·p³): the training chain collapses into between-query
    gain products in one scan, and only the M×M query table is dense.
    """

    fx: object
    y: jax.Array
    parallel: bool = False

    def mean(self, xs):
        return markov_mean_and_var(self.fx, self.y, xs, self.parallel)[0]

    def var(self, xs):
        return markov_mean_and_var(self.fx, self.y, xs, self.parallel)[1]

    def mean_and_var(self, xs):
        return markov_mean_and_var(self.fx, self.y, xs, self.parallel)

    def cov(self, xs, zs=None):
        if zs is None:
            return _posterior_joint(self.fx, self.y, xs, self.parallel)[1]
        # cross-cov via the joint (nx+nz)² query table, slicing the cross
        # block: ~4× the pairwise-table work of a dedicated cross-only
        # sweep and the nx² / nz² quadrants are discarded. Fine for the
        # small-M query sets this serves (the training-set scan — the O(N)
        # part — is shared either way); a cross-only product sweep is the
        # upgrade if large cross-covariance tables become a real workload.
        xq, zq = as_inputs(xs), as_inputs(zs)
        nx = xq.shape[0]
        tq = jnp.concatenate([xq, zq], axis=0)
        F = _posterior_joint(self.fx, self.y, tq, self.parallel)[1]
        return F[:nx, nx:]

    def mean_and_cov(self, xs):
        return _posterior_joint(self.fx, self.y, xs, self.parallel)

    def rand(self, key, xs, num_samples=None):
        """Joint posterior samples at ``xs`` via the O(N) backward sampler
        (``markov_rand``), not the dense covariance."""
        return markov_rand(self.fx, self.y, xs, key, num_samples=num_samples,
                           parallel=self.parallel)


def markov_posterior(fx, y: jax.Array, parallel: bool = False) -> MarkovPosteriorGP:
    """``posterior(fx, y)`` on the state-space path: an ``AbstractGP`` with
    O(N·p³) training cost (see ``MarkovPosteriorGP``)."""
    if not is_markov_kernel(fx.f.kernel):
        raise TypeError(
            f"kernel {type(fx.f.kernel).__name__} has no state-space form; "
            "markov_posterior supports Matern-family kernels (and sums) on "
            "1-D inputs"
        )
    return MarkovPosteriorGP(fx=fx, y=jnp.asarray(y), parallel=parallel)
