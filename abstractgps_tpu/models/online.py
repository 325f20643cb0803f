"""Streaming (online) exact GP conditioning with static shapes.

The reference's sequential conditioning (src/exact_gpr_posterior.jl:46-56)
grows the cache arrays on every update — fine in Julia, hostile to XLA
(every new shape is a recompile; SURVEY §7 "update_chol under jit").
TPU-native answer: a fixed-``capacity`` cache padded with an identity
Cholesky block and zeroed α/δ, plus a fill-level ``count``. Each
``extend`` writes one static-size block via dynamic-update-slice, so the
whole streaming loop — including prediction between updates — compiles
once and runs under ``lax.scan``/``while_loop``.

Why padding is exact (not approximate): rows ≥ count of ``L`` hold the
identity, and the corresponding rows of every cross-covariance/rhs are
zero, so triangular solves return exact zeros there; α is zero-padded, so
predictions only see the active prefix.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import covmat
from ..ops.precision import precise
from .gp import AbstractGP

__all__ = ["OnlineGP", "online_init", "online_extend", "online_mean_and_var"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["prior", "L", "alpha", "delta", "x", "count"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class OnlineGP:
    """Fixed-capacity exact posterior cache (padded analogue of
    PosteriorGP's ``(α, C, x, δ)``)."""

    prior: AbstractGP  # data field: hyperparameters stay traced, so a
                       # tuned prior does NOT retrace the streaming program
    L: jax.Array       # (cap, cap) lower chol; identity beyond count
    alpha: jax.Array   # (cap,) zero beyond count
    delta: jax.Array   # (cap,) zero beyond count
    x: jax.Array       # (cap, D) arbitrary beyond count
    count: jax.Array   # () int32 fill level


def online_init(prior: AbstractGP, capacity: int, input_dim: int,
                dtype=jnp.float32) -> OnlineGP:
    return OnlineGP(
        prior=prior,
        L=jnp.eye(capacity, dtype=dtype),
        alpha=jnp.zeros((capacity,), dtype),
        delta=jnp.zeros((capacity,), dtype),
        x=jnp.zeros((capacity, input_dim), dtype),
        count=jnp.asarray(0, jnp.int32),
    )


def _active_mask(state: OnlineGP) -> jax.Array:
    cap = state.L.shape[0]
    return (jnp.arange(cap) < state.count).astype(state.L.dtype)


@precise
def online_extend(state: OnlineGP, x_new: jax.Array, y_new: jax.Array,
                  noise_var) -> OnlineGP:
    """Condition on a new block of ``b`` observations (static b).

    Exact counterpart of ``posterior(fx::FiniteGP{<:PosteriorGP}, y)``:
    block-extends the Cholesky (update_chol) and refreshes α by two
    triangular solves against the extended factor.
    """
    cap = state.L.shape[0]
    b = x_new.shape[0]
    dtype = state.L.dtype
    mask = _active_mask(state)

    # cross-covariance against the active prefix only (padded rows zeroed)
    C12 = state.prior.cov(state.x, x_new) * mask[:, None]        # (cap, b)
    C22 = state.prior.cov(x_new) + noise_var * jnp.eye(b, dtype=dtype)

    # L21 = (L⁻¹ C12)': identity padding ⇒ exact zeros in padded columns
    L21 = covmat.solve_lower(state.L, C12).T                      # (b, cap)
    S = C22 - L21 @ L21.T
    L22 = covmat.cholesky_lower(S)

    # new block rows = [L21 with L22 spliced in at columns count:count+b];
    # L21 is already exactly zero in those columns (identity padding), so a
    # dynamic-slice write is exact
    zero = jnp.zeros_like(state.count)
    new_rows = jax.lax.dynamic_update_slice(L21, L22, (zero, state.count))
    L = jax.lax.dynamic_update_slice(state.L, new_rows, (state.count, zero))

    delta_new = y_new - state.prior.mean(x_new)
    delta = jax.lax.dynamic_update_slice(state.delta, delta_new.astype(dtype),
                                         (state.count,))
    x = jax.lax.dynamic_update_slice(state.x, x_new.astype(state.x.dtype),
                                     (state.count, zero))
    count = state.count + b

    # capacity overflow poisons the cache with NaN instead of silently
    # clamping the write (which would overwrite valid factor rows and
    # return finite-but-wrong predictions) — the library's NaN-propagation
    # failure contract (SURVEY §5): every downstream mean/var goes NaN
    L = jnp.where(count > cap, jnp.asarray(jnp.nan, dtype), 1.0) * L

    # refresh α against the extended factor; padded δ rows are zero so the
    # padded α rows come out exactly zero
    alpha = covmat.chol_solve(L, delta)
    return OnlineGP(state.prior, L, alpha, delta, x, count)


@precise
def online_mean_and_var(state: OnlineGP, x_test: jax.Array):
    """Posterior predictive mean/var from the padded cache (exact for the
    active prefix)."""
    mask = _active_mask(state)
    K_Xx = state.prior.cov(state.x, x_test) * mask[:, None]  # (cap, M)
    m = state.prior.mean(x_test) + K_Xx.T @ state.alpha
    V = covmat.solve_lower(state.L, K_Xx)
    v = state.prior.var(x_test) - jnp.sum(jnp.square(V), axis=0)
    return m, jnp.maximum(v, 0.0)
