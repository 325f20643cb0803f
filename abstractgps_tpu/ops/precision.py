"""Matmul precision policy for TPU numerical stability.

On TPU, XLA's *default* f32 matmul precision feeds the MXU bfloat16
inputs (~8e-3 relative error). For GP linear algebra that is fatal: the
posterior-variance cancellation ``k(x,x) − ‖L⁻¹K_Xx‖²`` then goes
negative by O(1e-2) (observed −0.04 on the N=256 Matern-5/2 verify
model). The reference implicitly relies on f64 LAPACK (SURVEY §7 "hard
parts"); our TPU-native answer is the bf16x3 ("high") precision mode —
f32-equivalent accuracy at ~MXU speed — applied to every accuracy-critical
op via the ``@precise`` decorator.

``set_matmul_precision`` lets users trade accuracy for speed globally.
Note: the cancellation-prone primitives (pairwise distances, Cholesky
panel GEMMs) floor themselves at "high" even under the "default" policy —
single-pass bf16 there does not just lose accuracy, it corrupts pivots
(NaN factors); "default" only relaxes the remaining matmuls.
"""

from __future__ import annotations

import functools

import jax

_PRECISION = "high"

__all__ = [
    "precise",
    "set_matmul_precision",
    "get_matmul_precision",
    "floored_precision",
]


def floored_precision():
    """`lax.Precision` for accuracy-critical matmuls: the library policy
    floored at HIGH (bf16x3). Single source of the mapping used by the
    distance expansion and the Cholesky panel GEMMs."""
    return (
        jax.lax.Precision.HIGHEST
        if _PRECISION == "highest"
        else jax.lax.Precision.HIGH
    )


def set_matmul_precision(precision: str) -> None:
    """Set the library-wide matmul precision: "default" | "high" | "highest"."""
    global _PRECISION
    if precision not in ("default", "high", "highest"):
        raise ValueError(f"unknown precision {precision!r}")
    _PRECISION = precision


def get_matmul_precision() -> str:
    return _PRECISION


def precise(fn):
    """Run ``fn`` under the library's matmul-precision context."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if _PRECISION == "default":
            return fn(*args, **kwargs)
        with jax.default_matmul_precision(_PRECISION):
            return fn(*args, **kwargs)

    return wrapped
