"""Sequential Monte Carlo sampler with adaptive likelihood tempering.

Required by the BASELINE north star ("inference ... via vectorized
NUTS/HMC, stochastic VI ..., and SMC, with chains/particles sharded across
a multi-host TPU pod slice and resampling ... done via collectives").
The reference itself has no SMC; its semantics anchor is simply "samples
from the same posterior as NUTS" (MCMC-moment equivalence).

Algorithm (Del Moral, Doucet & Jasra 2006; pymc-style adaptive tempering):
tempered targets ``π_β ∝ prior · lik^β``; β advances adaptively so the
incremental-weight effective sample size stays at ``ess_target·N``
(bisection inside the jitted loop); systematic resampling; rejuvenation by
``num_moves`` per-dimension-std-preconditioned random-walk Metropolis steps at
the current temperature. Particles are a leading axis: vmapped on one
chip, shardable over the mesh ``"dp"`` axis (resampling is a gather —
under pjit it lowers to XLA collectives; SURVEY §5).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["SMCResult", "run_smc", "systematic_resample"]


class SMCResult(NamedTuple):
    particles: jax.Array        # (N, dim) final equal-weight particles
    log_evidence: jax.Array     # SMC estimate of log ∫ prior·lik
    num_stages: jax.Array       # tempering stages taken
    acceptance: jax.Array       # mean rejuvenation acceptance at the end


def systematic_resample(key, log_weights: jax.Array) -> jax.Array:
    """Systematic resampling: returns (N,) int32 ancestor indices."""
    n = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), w.dtype)
    pts = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    # f32 rounding can leave cum[-1] slightly below pts[-1]; clip so the
    # ancestor index is well-defined rather than relying on gather-clamp
    return jnp.clip(jnp.searchsorted(cum, pts), 0, n - 1).astype(jnp.int32)


def _ess_fraction(log_w: jax.Array) -> jax.Array:
    lw = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw)) / log_w.shape[0]


def run_smc(
    logprior: Callable,
    loglik: Callable,
    particles0: jax.Array,
    key,
    *,
    ess_target: float = 0.5,
    num_moves: int = 8,
    max_stages: int = 50,
    proposal_scale: float | None = None,
    mesh=None,
    mesh_axis: str = "dp",
    _program_only: bool = False,
) -> SMCResult:
    """Temper from the prior to the posterior.

    ``particles0``: (N, dim) draws from the prior. ``logprior``/``loglik``
    map (dim,) → scalar. The whole run is one jitted ``while_loop``.

    ``mesh``: optional Mesh — particles shard over ``mesh_axis``. Particle
    propagation/weighting stay chip-local; the resampling gather and the
    weight/ESS reductions lower to XLA collectives (the "resampling via
    collectives" requirement of the BASELINE north star).
    """
    n, dim = particles0.shape
    dtype = particles0.dtype
    scale = (
        2.38 / jnp.sqrt(jnp.asarray(dim, dtype))
        if proposal_scale is None
        else jnp.asarray(proposal_scale, dtype)
    )

    v_logprior = jax.vmap(logprior)
    v_loglik = jax.vmap(loglik)

    class _C(NamedTuple):
        key: jax.Array
        particles: jax.Array
        loglik: jax.Array   # (N,)
        beta: jax.Array
        log_Z: jax.Array
        stage: jax.Array
        accept: jax.Array

    def next_beta(beta, ll):
        """Largest Δβ (≤ 1−β) with ESS(Δβ·ll) ≥ ess_target, by bisection."""

        def ess_at(b_new):
            return _ess_fraction((b_new - beta) * ll)

        full = ess_at(jnp.asarray(1.0, dtype))

        def bisect(_):
            def body(state):
                lo, hi = state
                mid = 0.5 * (lo + hi)
                ok = ess_at(mid) >= ess_target
                return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

            lo, hi = jax.lax.fori_loop(
                0, 26, lambda i, s: body(s), (beta, jnp.asarray(1.0, dtype))
            )
            return lo

        return jnp.where(full >= ess_target, jnp.asarray(1.0, dtype),
                         bisect(None))

    def rejuvenate(key, particles, ll, lp, beta):
        """num_moves per-dimension-std-preconditioned RWM steps at temperature β."""
        std = jnp.std(particles, axis=0) + 1e-8

        def move(carry, key):
            particles, ll, lp, acc = carry
            key_prop, key_acc = jax.random.split(key)
            prop = particles + scale * std * jax.random.normal(
                key_prop, particles.shape, dtype
            )
            ll_p = v_loglik(prop)
            lp_p = v_logprior(prop)
            log_ratio = (lp_p + beta * ll_p) - (lp + beta * ll)
            log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
            u = jnp.log(jax.random.uniform(key_acc, (n,), dtype))
            take = u < log_ratio
            particles = jnp.where(take[:, None], prop, particles)
            ll = jnp.where(take, ll_p, ll)
            lp = jnp.where(take, lp_p, lp)
            return (particles, ll, lp, acc + jnp.mean(take.astype(dtype))), None

        keys = jax.random.split(key, num_moves)
        (particles, ll, lp, acc), _ = jax.lax.scan(
            move, (particles, ll, lp, jnp.asarray(0.0, dtype)), keys
        )
        return particles, ll, lp, acc / num_moves

    def cond(c: _C):
        return jnp.logical_and(c.beta < 1.0, c.stage < max_stages)

    def body(c: _C):
        key, key_rs, key_mv = jax.random.split(c.key, 3)
        beta_new = next_beta(c.beta, c.loglik)
        log_w = (beta_new - c.beta) * c.loglik
        log_Z = c.log_Z + jax.scipy.special.logsumexp(log_w) - jnp.log(
            jnp.asarray(n, dtype)
        )
        idx = systematic_resample(key_rs, log_w)
        particles = c.particles[idx]
        ll = c.loglik[idx]
        lp = v_logprior(particles)
        particles, ll, lp, acc = rejuvenate(key_mv, particles, ll, lp, beta_new)
        return _C(key, particles, ll, beta_new, log_Z, c.stage + 1, acc)

    @jax.jit
    def run(key, particles0):
        ll0 = v_loglik(particles0)
        init = _C(
            key, particles0, ll0,
            jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(1.0, dtype),
        )
        out = jax.lax.while_loop(cond, body, init)
        return out

    if mesh is not None:
        from ...parallel.mesh import shard_along

        particles0 = shard_along(particles0, mesh, mesh_axis)
    if _program_only:
        # structure-test / retrace-free-benchmark hook (see run_mcmc)
        return run, (key, particles0)
    out = run(key, particles0)
    return SMCResult(out.particles, out.log_Z, out.stage, out.accept)
