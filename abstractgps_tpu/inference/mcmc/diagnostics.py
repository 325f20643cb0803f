"""MCMC diagnostics: split-R̂ and effective sample size.

The reference delegates diagnostics to MCMCChains.jl in its examples; the
BASELINE observability plan (SURVEY §5 metrics/logging) calls for native
ESS/R̂. Implementations follow Vehtari et al. 2021 ("Rank-normalization,
folding, and localization: An improved R̂"): split-chain R̂ and the
autocorrelation-based bulk ESS via Geyer's initial monotone sequence.

All functions take draws shaped (num_chains, num_samples) — or a pytree of
such arrays via the *_tree variants — and are plain numpy at the end of a
run (diagnostics are host-side, not hot-path).
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["rhat", "ess", "rhat_tree", "ess_tree", "summary"]


def _split_chains(x: np.ndarray) -> np.ndarray:
    c, n = x.shape
    half = n // 2
    return np.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)


def rhat(draws) -> float:
    """Split-chain potential scale reduction factor R̂."""
    x = _split_chains(np.asarray(draws, dtype=np.float64))
    m, n = x.shape
    chain_means = x.mean(axis=1)
    B = n * chain_means.var(ddof=1)
    W = x.var(axis=1, ddof=1).mean()
    var_plus = (n - 1) / n * W + B / n
    return float(np.sqrt(var_plus / W))


def _autocov(x: np.ndarray) -> np.ndarray:
    """Per-chain autocovariance via FFT, shape (chains, n)."""
    m, n = x.shape
    xc = x - x.mean(axis=1, keepdims=True)
    size = 2 ** int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, size, axis=1)
    acov = np.fft.irfft(f * np.conj(f), size, axis=1)[:, :n].real
    return acov / n


def ess(draws) -> float:
    """Bulk effective sample size (Geyer initial positive monotone sequence).

    ``τ = −1 + 2·Σ_k P_k`` over pair sums ``P_k = ρ_{2k} + ρ_{2k+1}``,
    truncated at the first non-positive pair and forced monotone
    non-increasing; ESS = m·n/τ.
    """
    x = _split_chains(np.asarray(draws, dtype=np.float64))
    m, n = x.shape
    acov = _autocov(x)
    chain_var = acov[:, 0] * n / (n - 1.0)
    W = chain_var.mean()
    var_plus = W * (n - 1.0) / n + x.mean(axis=1).var(ddof=1)
    if var_plus <= 0:
        return float(m * n)

    rho = 1.0 - (W - acov.mean(axis=0)) / var_plus
    rho[0] = 1.0

    tau = -1.0
    prev = np.inf
    for k in range(n // 2):
        pair = rho[2 * k] + rho[2 * k + 1]
        if pair <= 0:
            break
        pair = min(pair, prev)
        tau += 2.0 * pair
        prev = pair
    return float(m * n / max(tau, 1e-12))


def rhat_tree(positions):
    """R̂ for every scalar component of a positions pytree
    (leaves shaped (chains, samples, ...))."""
    return jax.tree_util.tree_map(lambda a: _per_component(a, rhat), positions)


def ess_tree(positions):
    return jax.tree_util.tree_map(lambda a: _per_component(a, ess), positions)


def _per_component(a, fn):
    a = np.asarray(a)
    if a.ndim == 2:
        return fn(a)
    flat = a.reshape(a.shape[0], a.shape[1], -1)
    return np.array([fn(flat[:, :, i]) for i in range(flat.shape[2])]).reshape(
        a.shape[2:]
    )


def summary(result) -> dict:
    """Compact diagnostics for an MCMCResult: per-leaf R̂/ESS plus sampler
    health (acceptance, divergences, step sizes)."""
    return {
        "rhat": rhat_tree(result.positions),
        "ess": ess_tree(result.positions),
        "accept_prob": float(np.asarray(result.accept_prob).mean()),
        "divergence_rate": float(np.asarray(result.diverging).mean()),
        "step_size": np.asarray(result.step_size),
    }
