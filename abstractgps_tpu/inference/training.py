"""Hyperparameter training loops: MLE-II and sparse VI (ELBO) with optax.

The reference trains hyperparameters outside the library with Optim.jl
L-BFGS (examples/0-intro-1d/script.jl:369-426,
examples/1-mauna-loa/script.jl:210-230) and Flux/Adam for stochastic ELBOs
(examples/2-deep-kernel-learning/script.jl:91-115). Here the same loops are
native JAX: the parameter pytree is tagged with bijectors
(``abstractgps_tpu.params``), the loss is ``-logpdf`` or ``-elbo`` built
from the constrained tree, and the whole optimisation runs as one jitted
``lax.scan`` — no host round-trips between steps.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
from jax.flatten_util import ravel_pytree
import jax.numpy as jnp
import optax

from .. import params as P

__all__ = [
    "FitResult",
    "fit",
    "fit_lbfgs",
    "nlml",
    "neg_elbo",
]


class FitResult(NamedTuple):
    """Optimised (still-tagged) parameter tree + per-step loss history."""

    params: object
    history: jax.Array


def nlml(build_fx: Callable, x, y) -> Callable:
    """Negative log marginal likelihood objective for MLE-II.

    ``build_fx(theta, x)`` must return a FiniteGP for a *constrained*
    parameter tree theta (the reference's rebuild-kernel-from-θ pattern,
    examples/0-intro-1d/script.jl:111-117). Returns ``loss(raw_theta)``.
    """

    def loss(raw_theta):
        fx = build_fx(P.constrain(raw_theta), x)
        return -fx.logpdf(y)

    return loss


def neg_elbo(build_parts: Callable, x, y) -> Callable:
    """Negative Titsias ELBO objective for sparse VI.

    ``build_parts(theta, x)`` must return ``(vfe, fx)`` — the VFE wrapper
    around the inducing projection and the data projection — for a
    constrained theta (reference loop: examples/0-intro-1d/script.jl:384-402).
    """
    from ..models.sparse import elbo

    def loss(raw_theta):
        vfe, fx = build_parts(P.constrain(raw_theta), x)
        return -elbo(vfe, fx, y)

    return loss


def fit(
    loss: Callable,
    theta0,
    *,
    optimizer: optax.GradientTransformation | None = None,
    num_steps: int = 500,
    learning_rate: float = 1e-2,
    unroll: int = 1,
) -> FitResult:
    """Minimise ``loss(raw_theta)`` with a first-order optax optimizer.

    The full loop is one jitted ``lax.scan``: per-step cost is one fused
    XLA program (gram + Cholesky + solves + grads + Adam update) with zero
    host synchronisation — the TPU-native replacement for the reference's
    Optim.jl/Flux training loops.
    """
    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(theta0)

    def step(carry, _):
        theta, opt_state = carry
        val, grads = jax.value_and_grad(loss)(theta)
        updates, opt_state = optimizer.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return (theta, opt_state), val

    # NOTE: no inner jit — lax.scan traces its body exactly once; wrapping
    # it in jax.jit only adds a closed-call trace layer
    (theta, _), history = jax.lax.scan(
        step, (theta0, opt_state), None, length=num_steps, unroll=unroll
    )
    return FitResult(theta, history)


def fit_lbfgs(
    loss: Callable,
    theta0,
    *,
    num_steps: int = 100,
    memory_size: int = 20,
    tol: float = 1e-8,
) -> FitResult:
    """Minimise ``loss(raw_theta)`` with L-BFGS + zoom linesearch.

    Mirrors the reference's Optim.jl ``LBFGS()`` usage
    (examples/0-intro-1d/script.jl:421-426,
    examples/1-mauna-loa/script.jl:227-230). Runs as a bounded
    ``while_loop`` with a gradient-norm stopping rule, fully on device.

    ``FitResult.history`` is the per-iteration loss trace of length
    ``num_steps`` (since round 4; earlier versions packed
    ``[final_loss, n_iter, gnorm]`` — a breaking shape change). Entries at
    indices >= the converged iteration count are backfilled with the final
    loss; a genuine mid-run NaN loss stays visible as NaN in the trace.
    """
    optimizer = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(loss)

    def cond(carry):
        theta, opt_state, it, gnorm = carry
        return jnp.logical_and(it < num_steps, gnorm > tol)

    def body(carry):
        theta, opt_state, it, _, trace = carry
        val, grad = value_and_grad(theta, state=opt_state)
        updates, opt_state = optimizer.update(
            grad, opt_state, theta, value=val, grad=grad, value_fn=loss
        )
        theta = optax.apply_updates(theta, updates)
        gflat, _ = ravel_pytree(grad)
        trace = trace.at[it].set(val)
        return theta, opt_state, it + 1, jnp.linalg.norm(gflat), trace

    opt_state = optimizer.init(theta0)
    f0 = loss(theta0)
    # honest per-iteration loss history (the FitResult contract shared with
    # ``fit``): unvisited tail entries stay at the final achieved loss
    trace0 = jnp.full((num_steps,), jnp.nan, dtype=f0.dtype)
    theta, opt_state, n_iter, gnorm, trace = jax.lax.while_loop(
        lambda c: cond(c[:4]), body,
        (theta0, opt_state, jnp.asarray(0), jnp.asarray(jnp.inf), trace0),
    )
    final = loss(theta)
    # backfill ONLY the unvisited tail (indices >= n_iter): a genuine NaN
    # loss hit during the run must stay visible, not be painted over
    trace = jnp.where(jnp.arange(num_steps) >= n_iter, final, trace)
    return FitResult(theta, trace)
