"""Elliptical slice sampling (Murray, Adams & MacKay 2010).

Reference anchor: the reference's example samples GP hyperparameters with
EllipticalSliceSampling.jl (examples/0-intro-1d/script.jl:305-357) under a
Gaussian prior; the classic use is sampling latent GP function values
``u ~ N(0, K)`` under an arbitrary likelihood (the LatentGP workflow,
src/latent_gp.jl:48-50).

TPU-native formulation: the angle-shrinking loop is a bounded
``lax.while_loop`` (slice shrinkage terminates in ~log₂(2π/ε) iterations),
states are flat vectors, and the kernel vmaps over chains.

``ess_kernel`` targets densities of the form
``p(q) ∝ N(q; mean, Σ) · exp(loglik(q))``: the Gaussian-prior factor is
handled exactly by the ellipse, only ``loglik`` is evaluated in the loop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ESSState", "ess_init", "ess_kernel", "run_ess"]


class ESSState(NamedTuple):
    q: jax.Array
    loglik: jax.Array


def ess_init(loglik: Callable, q0: jax.Array) -> ESSState:
    return ESSState(q0, loglik(q0))


def ess_kernel(loglik: Callable, sample_prior: Callable, max_shrink: int = 64):
    """One elliptical-slice transition.

    ``sample_prior(key) -> draw`` must sample from the zero-mean Gaussian
    prior (e.g. ``L @ normal`` for a GP prior with ``L = chol(K)``); a
    nonzero prior mean is handled by passing ``q − mean`` through the
    ellipse at the call site.
    Returns ``step(key, state) -> (state, num_evals)``.
    """

    def step(key, state: ESSState):
        key_nu, key_u, key_theta = jax.random.split(key, 3)
        nu = sample_prior(key_nu)
        log_u = jnp.log(jax.random.uniform(key_u, (), state.q.dtype))
        threshold = state.loglik + log_u

        theta = jax.random.uniform(
            key_theta, (), state.q.dtype, 0.0, 2.0 * jnp.pi
        )
        lo, hi = theta - 2.0 * jnp.pi, theta

        def propose(theta):
            q = state.q * jnp.cos(theta) + nu * jnp.sin(theta)
            return q, loglik(q)

        q0, ll0 = propose(theta)

        class _C(NamedTuple):
            key: jax.Array
            theta: jax.Array
            lo: jax.Array
            hi: jax.Array
            q: jax.Array
            ll: jax.Array
            n: jax.Array
            done: jax.Array

        init = _C(key, theta, lo, hi, q0, ll0,
                  jnp.asarray(1, jnp.int32), ll0 > threshold)

        def cond(c: _C):
            return jnp.logical_and(jnp.logical_not(c.done), c.n < max_shrink)

        def body(c: _C):
            # shrink the bracket toward 0 and redraw
            lo = jnp.where(c.theta < 0.0, c.theta, c.lo)
            hi = jnp.where(c.theta < 0.0, c.hi, c.theta)
            key, key_t = jax.random.split(c.key)
            theta = jax.random.uniform(key_t, (), c.theta.dtype, lo, hi)
            q, ll = propose(theta)
            return _C(key, theta, lo, hi, q, ll, c.n + 1, ll > threshold)

        out = jax.lax.while_loop(cond, body, init)
        # max_shrink exhausted without acceptance → keep the current state
        q = jnp.where(out.done, out.q, state.q)
        ll = jnp.where(out.done, out.ll, state.loglik)
        return ESSState(q, ll), out.n

    return step


def run_ess(
    loglik: Callable,
    sample_prior: Callable,
    q0: jax.Array,
    key,
    *,
    num_samples: int = 1000,
    num_burnin: int = 100,
    num_chains: int | None = None,
    mesh=None,
    mesh_axis: str = "dp",
    _program_only: bool = False,
):
    """Run ESS; ``q0`` is (dim,) or (num_chains, dim). Returns
    (samples (chains, draws, dim), logliks (chains, draws)).

    ``mesh``: optional Mesh — chains shard over ``mesh_axis`` via
    ``shard_map`` (per-device local loops), exactly like ``run_mcmc``'s
    chain sharding: ESS chains are embarrassingly parallel, so the
    compiled program carries ZERO cross-device collectives (asserted in
    tests/test_scaling_structure.py). ``num_chains`` must divide by the
    mesh axis size. ``_program_only=True`` returns ``(run, (keys, q0))``
    — the jitted program + example args — for structure tests and
    retrace-free benchmarking (run_mcmc's measurement hook).
    """
    kernel = ess_kernel(loglik, sample_prior)
    if num_chains is None:
        q0 = q0[None, :]
        num_chains = 1
    elif q0.ndim == 1:
        q0 = jnp.broadcast_to(q0, (num_chains,) + q0.shape)

    def one_chain(key, q0):
        state = ess_init(loglik, q0)

        def step(carry, _):
            key, state = carry
            key, key_s = jax.random.split(key)
            state, _ = kernel(key_s, state)
            return (key, state), (state.q, state.loglik)

        (key, state), _ = jax.lax.scan(
            step, (key, state), None, length=num_burnin
        )
        _, (qs, lls) = jax.lax.scan(step, (key, state), None, length=num_samples)
        return qs, lls

    run_core = jax.vmap(one_chain)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        spec = P(mesh_axis)
        run_core = jax.shard_map(run_core, mesh=mesh, in_specs=(spec, spec),
                                 out_specs=spec, check_vma=False)
    run = jax.jit(run_core)
    keys = jax.random.split(key, num_chains)
    if _program_only:
        return run, (keys, q0)
    return run(keys, q0)
