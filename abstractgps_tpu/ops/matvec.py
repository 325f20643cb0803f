"""Matrix-free gram matvec: ``(K(x,x) + diag(σ²)) @ V`` in row panels.

The iterative (CG/Lanczos) inference backend never materialises the N×N
gram matrix — the reference's Primary-Public-API-without-cov design exists
precisely so matrix-free backends can implement it
(reference docs/src/api.md:77-84; SURVEY §7 "matrix-free ethos"). Each
row panel ``K[pB:(p+1)B, :]`` is built from the kernel on the fly and
immediately contracted against V, so peak memory is O(panel·N) and every
FLOP is an MXU matmul (the pairwise-distance expansion plus the panel
GEMM). This is the TPU-native analogue of GPyTorch's partitioned MVM
(BBMM, Gardner et al. 2018).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .pallas_chol import _peel_transforms
from .precision import floored_precision

__all__ = ["gram_matvec", "make_gram_matvec"]

_PANEL = 1024


def _pad_rows(a: jax.Array, m: int) -> jax.Array:
    pad = (-a.shape[0]) % m
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a


@partial(jax.jit, static_argnames=("panel",))
def gram_matvec(kernel, x, noise_diag, V, *, panel: int = _PANEL):
    """``(K(x, x) + diag(noise_diag)) @ V`` without forming K.

    ``V`` is (N,) or (N, q). Semantics match
    ``cov(fx) * V`` for a kernel-prior FiniteGP with diagonal-structured
    noise (src/finite_gp_projection.jl:96: ``cov = kernelmatrix + Σy``).
    Row panels are built inside a ``lax.fori_loop`` (O(1) compile size in N).
    """
    kernel, xt = _peel_transforms(kernel, x)
    n = x.shape[0]
    vec = V.ndim == 1
    Vm = V[:, None] if vec else V

    xp = _pad_rows(xt, panel)
    npad = xp.shape[0]
    nb = npad // panel
    # zero-padded V rows null out the spurious kernel columns of padded x
    Vp = _pad_rows(Vm, panel)
    ndp = _pad_rows(noise_diag, panel)

    prec = floored_precision() if Vp.dtype == jnp.float32 else None

    def body(p, out):
        r0 = p * panel
        xb = lax.dynamic_slice_in_dim(xp, r0, panel)
        Kp = kernel.cross(xb, xp).astype(Vp.dtype)  # (panel, npad)
        vb = lax.dynamic_slice_in_dim(Vp, r0, panel)
        nb_ = lax.dynamic_slice_in_dim(ndp, r0, panel)
        row = jnp.matmul(Kp, Vp, precision=prec) + nb_[:, None] * vb
        return lax.dynamic_update_slice_in_dim(out, row, r0, axis=0)

    out = lax.fori_loop(0, nb, body, jnp.zeros_like(Vp))
    out = out[:n]
    return out[:, 0] if vec else out


def make_gram_matvec(kernel, x, noise_diag, *, panel: int = _PANEL,
                     max_dense_n: int = 8192):
    """Closure ``V ↦ (K+Σ)V``; materialises K once when it fits in HBM.

    For N ≤ ``max_dense_n`` the dense gram is built a single time and every
    CG iteration is one HBM-bound GEMM; past that, panels are rebuilt per
    matvec (compute-bound, O(panel·N) memory).
    """
    n = x.shape[0]
    if n <= max_dense_n:
        K = kernel.gram(x)
        K = K + jnp.diag(noise_diag.astype(K.dtype))
        prec = floored_precision() if K.dtype == jnp.float32 else None

        def mv_dense(V):
            return jnp.matmul(K, V, precision=prec)

        return mv_dense

    def mv_panel(V):
        return gram_matvec(kernel, x, noise_diag, V, panel=panel)

    return mv_panel
