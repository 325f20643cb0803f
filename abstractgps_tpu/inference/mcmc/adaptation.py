"""Warmup adaptation: dual-averaging step size + diagonal mass matrix.

Reference anchor: the reference's examples run AdvancedHMC's NUTS with
``StanHMCAdaptor(MassMatrixAdaptor(metric), StepSizeAdaptor(0.8, ...))``
(examples/0-intro-1d/script.jl:194-203) — i.e. Stan's windowed warmup:
Nesterov dual averaging toward a target acceptance statistic, and a
Welford estimator of the posterior's diagonal covariance used as the
inverse mass matrix, updated over doubling adaptation windows.

Everything is a pure pytree-state + update function so it vmaps over
chains and runs inside one jitted ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "DualAveragingState",
    "da_init",
    "da_update",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_variance",
    "window_schedule",
]


class DualAveragingState(NamedTuple):
    """Nesterov dual averaging (Hoffman & Gelman 2014, eqs. 6-7)."""

    log_step: jax.Array      # current log ε
    log_step_avg: jax.Array  # averaged log ε (used after warmup)
    gradient_avg: jax.Array  # running average of (δ − accept_stat)
    t: jax.Array             # iteration counter
    mu: jax.Array            # shrinkage target log(10·ε₀)


def da_init(step_size: jax.Array) -> DualAveragingState:
    log_step = jnp.log(step_size)
    zero = jnp.zeros_like(log_step)
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=zero,
        gradient_avg=zero,
        t=jnp.zeros_like(log_step),
        mu=jnp.log(10.0) + log_step,
    )


def da_update(
    state: DualAveragingState,
    accept_prob: jax.Array,
    target: float = 0.8,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    t = state.t + 1.0
    eta = 1.0 / (t + t0)
    g_avg = (1.0 - eta) * state.gradient_avg + eta * (target - accept_prob)
    log_step = state.mu - (jnp.sqrt(t) / gamma) * g_avg
    x_eta = t ** (-kappa)
    log_step_avg = x_eta * log_step + (1.0 - x_eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, g_avg, t, state.mu)


class WelfordState(NamedTuple):
    """Running mean/variance estimator for the diagonal mass matrix."""

    mean: jax.Array
    m2: jax.Array
    count: jax.Array


def welford_init(dim: int, dtype=jnp.float32) -> WelfordState:
    return WelfordState(
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
        count=jnp.zeros((), dtype),
    )


def welford_update(state: WelfordState, x: jax.Array) -> WelfordState:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_variance(state: WelfordState, regularize: bool = True) -> jax.Array:
    """Sample variance with Stan's shrinkage toward unity
    (var ← n/(n+5)·var + 1e-3·5/(n+5))."""
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


def window_schedule(
    num_warmup: int,
    init_buffer: int = 75,
    term_buffer: int = 50,
    base_window: int = 25,
):
    """Stan's three-phase warmup schedule.

    Returns (is_window: (num_warmup,) bool, is_window_end: (num_warmup,)
    bool) numpy-style static arrays: whether step i sits inside a
    mass-matrix adaptation window, and whether it closes one (mass matrix
    is refreshed and the Welford state reset at window ends).
    """
    import numpy as np

    is_window = np.zeros(num_warmup, dtype=bool)
    is_end = np.zeros(num_warmup, dtype=bool)
    if num_warmup < init_buffer + term_buffer + base_window:
        # degenerate: single window covering the middle
        lo = min(init_buffer, num_warmup // 3)
        hi = max(lo + 1, num_warmup - min(term_buffer, num_warmup // 3))
        is_window[lo:hi] = True
        if hi - 1 >= 0 and hi - 1 < num_warmup:
            is_end[hi - 1] = True
        return jnp.asarray(is_window), jnp.asarray(is_end)

    start = init_buffer
    end = num_warmup - term_buffer
    w = base_window
    pos = start
    while pos < end:
        next_pos = pos + w
        if next_pos + 2 * w > end:  # absorb the remainder into the last window
            next_pos = end
        is_window[pos:next_pos] = True
        is_end[next_pos - 1] = True
        pos = next_pos
        w *= 2
    return jnp.asarray(is_window), jnp.asarray(is_end)
