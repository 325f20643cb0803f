"""Top-level MCMC driver: windowed warmup + sampling, vmapped over chains.

The reference drives AdvancedHMC by hand (examples/0-intro-1d/script.jl:
194-203: ``NUTS`` + ``StanHMCAdaptor``, 2000 draws / 1000 warmup). Here the
whole run — warmup with Stan's three-phase schedule and the sampling phase
— is two jitted ``lax.scan``s, vmapped over the chain axis. Chains are an
embarrassingly-parallel leading dimension: shard it over a mesh ``"dp"``
axis (``parallel.chains``) and XLA keeps everything chip-local.

Parameters are flat vectors internally; the public API accepts a pytree
initial position and returns samples with the same pytree structure
(leading dims: (num_chains, num_samples)).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from .adaptation import (
    da_init,
    da_update,
    welford_init,
    welford_update,
    welford_variance,
    window_schedule,
)
from .hmc import HMCState, hmc_init, hmc_kernel
from .nuts import NUTSInfo, nuts_kernel

__all__ = ["MCMCResult", "run_mcmc", "init_chain_positions"]


class MCMCResult(NamedTuple):
    positions: object        # pytree; leaves (num_chains, num_samples, ...)
    logdens: jax.Array       # (num_chains, num_samples)
    accept_prob: jax.Array   # (num_chains, num_samples)
    num_steps: jax.Array     # (num_chains, num_samples) leapfrog steps/draw
    diverging: jax.Array     # (num_chains, num_samples)
    step_size: jax.Array     # (num_chains,) adapted ε
    inv_mass: jax.Array      # (num_chains, dim) adapted M⁻¹ diagonal


def init_chain_positions(key, position, num_chains: int, jitter: float = 1.0):
    """Broadcast one pytree position to ``num_chains`` jittered copies
    (uniform(-jitter, jitter) in flat space, Stan's default init style)."""
    flat, unravel = ravel_pytree(position)
    noise = jax.random.uniform(
        key, (num_chains, flat.shape[0]), flat.dtype, -jitter, jitter
    )
    return jax.vmap(unravel)(flat[None, :] + noise)


def run_mcmc(
    logdensity: Callable,
    init_position,
    key,
    *,
    num_samples: int = 1000,
    num_warmup: int = 1000,
    num_chains: int | None = None,
    algorithm: str = "nuts",
    max_depth: int = 10,
    num_integration_steps: int = 32,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    thin: int = 1,
    mesh=None,
    mesh_axis: str = "dp",
    segment_size: int | None = None,
    program_cache: dict | None = None,
    _program_only: bool = False,
) -> MCMCResult:
    """Run NUTS (or fixed-length HMC) over ``logdensity``.

    ``init_position`` is a pytree whose leaves carry a leading chain axis
    (build one with ``init_chain_positions``); pass a chain-free pytree for
    a single chain. ``logdensity`` maps the (chain-free) pytree to a scalar.

    ``mesh``: optional ``jax.sharding.Mesh`` — the chain axis is sharded
    over ``mesh_axis`` (chains are embarrassingly parallel, so warmup and
    sampling run with zero cross-chip traffic; SURVEY §5). ``num_chains``
    must divide the mesh-axis size.

    ``segment_size``: optional cap on the number of warmup/sampling
    iterations per DEVICE EXECUTION. By default the whole run is one jitted
    program — fastest, but a single execution longer than the runtime's
    window fails (observed as an UNAVAILABLE device error at ~500×64-chain
    NUTS on a tunneled chip; preemptible pods have the same constraint).
    With ``segment_size`` set, warmup and sampling run as a Python loop of
    identical jitted segments carrying (rng, state, adaptation) between
    executions — results are BIT-IDENTICAL to the unsegmented run (same
    scan recurrence, merely cut at segment boundaries; tested), at the
    cost of one host round-trip per segment.

    ``program_cache``: optional dict the segmented path stores its jitted
    segment programs in. Pass the SAME dict to repeated calls with an
    identical configuration (same logdensity/shapes/settings) to skip
    re-tracing the sampler each call — tracing a large-N NUTS program
    costs seconds, which otherwise dominates repeated short runs.
    """
    if _program_only and segment_size is not None:
        raise ValueError(
            "_program_only exposes the fused one-program path; it cannot "
            "be combined with segment_size (the segmented path is a host "
            "loop of separate programs)"
        )
    flat0, unravel = _flatten_chains(init_position, num_chains)
    n_chains = flat0.shape[0]
    dtype = flat0.dtype

    def logdens_flat(q):
        return logdensity(unravel(q))

    ld_and_grad = jax.value_and_grad(logdens_flat)

    def ld_and_grad_safe(q):
        ld, g = ld_and_grad(q)
        ld = jnp.where(jnp.isnan(ld), -jnp.inf, ld)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return ld, g

    if algorithm == "nuts":
        kernel = nuts_kernel(ld_and_grad_safe, max_depth=max_depth)
    elif algorithm == "hmc":
        kernel = hmc_kernel(
            ld_and_grad_safe, num_integration_steps=num_integration_steps
        )
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")

    dim = flat0.shape[1]
    is_window, is_window_end = window_schedule(num_warmup)

    def warmup_init(key, q0):
        return (key, hmc_init(ld_and_grad_safe, q0),
                da_init(jnp.asarray(initial_step_size, dtype)),
                welford_init(dim, dtype), jnp.ones((dim,), dtype))

    def warmup_scan(carry, xs):
        def step(carry, x):
            key, state, da, wf, inv_mass = carry
            in_window, window_end = x
            key, key_step = jax.random.split(key)
            step_size = jnp.exp(da.log_step)
            state, info = kernel(key_step, state, step_size, inv_mass)
            accept_prob = (
                info.accept_prob if isinstance(info, NUTSInfo) else info[0]
            )
            da = da_update(da, accept_prob, target=target_accept)
            wf = jax.lax.cond(
                in_window, lambda w: welford_update(w, state.q), lambda w: w, wf
            )

            def close_window(args):
                da, wf, _ = args
                new_inv_mass = welford_variance(wf)
                # re-init dual averaging around the current step size
                new_da = da_init(jnp.exp(da.log_step))
                return new_da, welford_init(dim, dtype), new_inv_mass

            da, wf, inv_mass = jax.lax.cond(
                window_end, close_window, lambda a: a, (da, wf, inv_mass)
            )
            return (key, state, da, wf, inv_mass), None

        carry, _ = jax.lax.scan(step, carry, xs)
        return carry

    def sample_scan(carry, length):
        def step(carry, _):
            key, state = carry
            key, key_step = jax.random.split(key)
            state, info = kernel(key_step, state, step_size_c, inv_mass_c)
            if isinstance(info, NUTSInfo):
                accept_prob = info.accept_prob
                n_steps = info.num_steps
                div = info.diverging
            else:  # hmc: (accept_prob, accepted, energy)
                accept_prob, _, _ = info
                n_steps = jnp.asarray(num_integration_steps, jnp.int32)
                div = jnp.asarray(False)
            out = (state.q, state.logdens, accept_prob, n_steps, div)
            return (key, state), out

        def thinned(carry, _):
            carry, outs = jax.lax.scan(step, carry, None, length=thin)
            last = jax.tree_util.tree_map(lambda a: a[-1], outs)
            return carry, last

        (key, state), step_size_c, inv_mass_c = carry
        carry2, outs = jax.lax.scan((lambda c, x: thinned(c, x)),
                                    (key, state), None, length=length)
        return (carry2, step_size_c, inv_mass_c), outs

    def _chunks(total, size):
        if size is None or size >= total:
            return [total] if total else []
        out = [size] * (total // size)
        if total % size:
            out.append(total % size)
        return out

    chain_keys = jax.random.split(key, n_chains * 2).reshape(n_chains, 2, -1)
    if mesh is not None:
        from ...parallel.mesh import shard_along

        chain_keys = shard_along(chain_keys, mesh, mesh_axis)
        flat0 = shard_along(flat0, mesh, mesh_axis)

    def _shard_chains(fn, in_specs, out_specs):
        """Chain-sharding via ``shard_map``, NOT sharded-input GSPMD.

        Chains are embarrassingly parallel, but letting the SPMD
        partitioner slice a vmapped ``while_loop`` inserts a pred[]
        all-reduce per tree/trajectory iteration (the batched loop
        condition must agree across devices) and locksteps every device
        to the globally slowest chain. ``shard_map`` gives each device
        its own local-chain loop: ZERO collectives in the compiled
        program (asserted by tests/test_scaling_structure.py) and
        per-device progress independent of other hosts — the property
        the ≥70% N-host scaling target rests on.
        """
        if mesh is None:
            return fn
        from jax.sharding import PartitionSpec as P

        spec = P(mesh_axis)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=jax.tree_util.tree_map(
                lambda rep: P() if rep else spec, in_specs),
            out_specs=spec if out_specs is None else out_specs,
            check_vma=False,
        )

    if segment_size is None:
        # fast path: warmup + sampling fused into ONE device execution
        # (splitting into separate programs measured ~25% slower at the
        # 64-chain bench config — program-boundary pipeline breaks)
        def run_core(keys, q0s):
            carry = jax.vmap(warmup_init)(keys[:, 0], q0s)
            carry = jax.vmap(warmup_scan, in_axes=(0, None))(
                carry, (is_window, is_window_end)
            )
            _, states, da, _, inv_masses = carry
            step_sizes = jnp.exp(da.log_step_avg)
            scarry = ((keys[:, 1], states), step_sizes, inv_masses)
            _, outs = jax.vmap(
                functools.partial(sample_scan, length=num_samples)
            )(scarry)
            return outs, step_sizes, inv_masses

        run = jax.jit(_shard_chains(run_core, (False, False), None))

        if _program_only:
            # structure-testing hook: hand back the fused program + its
            # example args so tests can AOT-lower it and assert on the
            # optimized HLO (collective counts — tests/test_scaling_structure)
            return run, (chain_keys, flat0)

        (qs, lds, aps, nss, divs), step_sizes, inv_masses = run(
            chain_keys, flat0
        )
    else:
        # segmented path: bounded device executions (see docstring)
        cache = program_cache if program_cache is not None else {}
        # cached programs close over logdensity and every config knob; a
        # cache shared across DIFFERENT configs would silently sample the
        # first call's model — fingerprint the config and refuse reuse.
        # The cache holds a STRONG reference to logdensity ("_logdensity")
        # so its id() can never be recycled by a later closure while the
        # cache lives: without it, a user who rebuilds the closure per call
        # could draw a GC'd-and-reused id that matches the stale
        # fingerprint and silently sample the first call's model.
        fingerprint = (
            id(logdensity), algorithm, num_warmup, max_depth,
            num_integration_steps, float(initial_step_size),
            float(target_accept), thin, mesh, mesh_axis, n_chains, dim,
        )
        cache.setdefault("_logdensity", logdensity)
        if cache.setdefault("_config", fingerprint) != fingerprint:
            raise ValueError(
                "program_cache was built by a run_mcmc call with a "
                "different configuration (logdensity/warmup/depth/... "
                "differ); pass a fresh dict per configuration"
            )

        def _cached(key_, build):
            if key_ not in cache:
                cache[key_] = build()
            return cache[key_]

        carry = _cached("warmup_init", lambda: jax.jit(
            _shard_chains(jax.vmap(warmup_init), (False, False), None)
        ))(chain_keys[:, 0], flat0)
        warm_seg = _cached("warmup_scan", lambda: jax.jit(_shard_chains(
            jax.vmap(warmup_scan, in_axes=(0, None)), (False, True), None
        )))
        pos = 0
        for seg in _chunks(num_warmup, segment_size):
            xs = (is_window[pos:pos + seg], is_window_end[pos:pos + seg])
            carry = warm_seg(carry, xs)
            pos += seg
        _, states, da, _, inv_masses = carry
        step_sizes = jnp.exp(da.log_step_avg)

        scarry = ((chain_keys[:, 1], states), step_sizes, inv_masses)
        seg_outs = []
        compiled = cache  # one compiled program per distinct segment length
        for seg in _chunks(num_samples, segment_size):
            if seg not in compiled:
                compiled[seg] = jax.jit(_shard_chains(
                    jax.vmap(functools.partial(sample_scan, length=seg)),
                    (False,), None,
                ))
            scarry, outs = compiled[seg](scarry)
            seg_outs.append(outs)
        if len(seg_outs) == 1:
            (qs, lds, aps, nss, divs) = seg_outs[0]
        else:
            (qs, lds, aps, nss, divs) = jax.tree_util.tree_map(
                lambda *a: jnp.concatenate(a, axis=1), *seg_outs
            )

    positions = jax.vmap(jax.vmap(unravel))(qs)
    return MCMCResult(
        positions=positions,
        logdens=lds,
        accept_prob=aps,
        num_steps=nss,
        diverging=divs,
        step_size=step_sizes,
        inv_mass=inv_masses,
    )


def _flatten_chains(init_position, num_chains):
    """Flatten the init pytree to (n_chains, dim).

    ``num_chains=None`` → the pytree is a single (chain-free) position;
    otherwise every leaf must carry a leading ``num_chains`` axis (as built
    by ``init_chain_positions``).
    """
    if num_chains is None:
        flat, unravel = ravel_pytree(init_position)
        return flat[None, :], unravel
    one = jax.tree_util.tree_map(lambda l: l[0], init_position)
    _, unravel = ravel_pytree(one)
    flat0 = jax.vmap(lambda p: ravel_pytree(p)[0])(init_position)
    if flat0.shape[0] != num_chains:
        raise ValueError(
            f"init_position has leading dim {flat0.shape[0]}, expected "
            f"num_chains={num_chains}"
        )
    return flat0, unravel
