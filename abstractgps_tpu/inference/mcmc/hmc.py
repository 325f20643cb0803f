"""Hamiltonian Monte Carlo: leapfrog integrator + fixed-length HMC kernel.

Reference anchor: the reference's PPL tests run HMC/NUTS over GP
hyperparameters and latents through Turing/AdvancedHMC
(test/ppl/turing.jl:8-46, examples/0-intro-1d/script.jl:142-254). Here the
sampler is native JAX: states are flat vectors (ravel_pytree at the API
layer), the integrator is pure, and the per-step logdensity gradient is
the §3.1 logpdf stack under ``jax.grad`` — one fused XLA program per
chain step, vmapped over chains.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["IntegratorState", "leapfrog", "HMCState", "hmc_init", "hmc_kernel"]


class IntegratorState(NamedTuple):
    q: jax.Array          # position
    p: jax.Array          # momentum
    logdens: jax.Array    # log density at q
    grad: jax.Array       # ∇ log density at q


def leapfrog(
    logdensity_and_grad: Callable,
    state: IntegratorState,
    step_size: jax.Array,
    inv_mass: jax.Array,
    num_steps: int | jax.Array,
) -> IntegratorState:
    """``num_steps`` leapfrog steps with diagonal (inverse) mass matrix."""

    def one_step(_, s: IntegratorState) -> IntegratorState:
        p_half = s.p + 0.5 * step_size * s.grad
        q = s.q + step_size * inv_mass * p_half
        logdens, grad = logdensity_and_grad(q)
        p = p_half + 0.5 * step_size * grad
        return IntegratorState(q, p, logdens, grad)

    return jax.lax.fori_loop(0, num_steps, one_step, state)


def kinetic_energy(p: jax.Array, inv_mass: jax.Array) -> jax.Array:
    return 0.5 * jnp.sum(jnp.square(p) * inv_mass)


class HMCState(NamedTuple):
    q: jax.Array
    logdens: jax.Array
    grad: jax.Array


def hmc_init(logdensity_and_grad: Callable, q0: jax.Array) -> HMCState:
    ld, g = logdensity_and_grad(q0)
    return HMCState(q0, ld, g)


def hmc_kernel(
    logdensity_and_grad: Callable,
    num_integration_steps: int = 32,
    jitter_steps: bool = True,
):
    """One Metropolis-corrected HMC transition.

    ``jitter_steps`` draws the trajectory length uniformly from
    [1, num_integration_steps] per transition — the standard guard against
    resonant (periodic) trajectories on near-Gaussian targets.

    Returns ``step(key, state, step_size, inv_mass) -> (state, info)``
    where info = (accept_prob, accepted, energy).
    """

    def step(key, state: HMCState, step_size, inv_mass):
        key_mom, key_acc, key_len = jax.random.split(key, 3)
        if jitter_steps:
            n_steps = jax.random.randint(
                key_len, (), 1, num_integration_steps + 1
            )
        else:
            n_steps = num_integration_steps
        # momentum ~ N(0, M) with M = 1/inv_mass (diagonal)
        p0 = jax.random.normal(key_mom, state.q.shape, state.q.dtype) / jnp.sqrt(
            inv_mass
        )
        h0 = -state.logdens + kinetic_energy(p0, inv_mass)

        istate = IntegratorState(state.q, p0, state.logdens, state.grad)
        iend = leapfrog(
            logdensity_and_grad, istate, step_size, inv_mass, n_steps
        )
        h1 = -iend.logdens + kinetic_energy(iend.p, inv_mass)

        delta_h = h0 - h1
        delta_h = jnp.where(jnp.isnan(delta_h), -jnp.inf, delta_h)
        accept_prob = jnp.minimum(1.0, jnp.exp(delta_h))
        accept = jax.random.uniform(key_acc, (), state.q.dtype) < accept_prob

        new_state = HMCState(
            jnp.where(accept, iend.q, state.q),
            jnp.where(accept, iend.logdens, state.logdens),
            jnp.where(accept, iend.grad, state.grad),
        )
        return new_state, (accept_prob, accept, h1)

    return step
