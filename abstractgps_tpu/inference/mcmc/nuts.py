"""NUTS: iterative multinomial No-U-Turn sampler (TPU/SPMD-native).

Reference anchor: the reference's hyperparameter/latent inference runs
AdvancedHMC's NUTS (multinomial sampling, generalized no-U-turn
criterion; examples/0-intro-1d/script.jl:194-203, test/ppl/turing.jl:29-46).

TPU-first design decisions (SURVEY §7 "NUTS in SPMD"):
- *Iterative* tree building with the trailing-bit checkpoint scheme
  (Phan & Pradhan's formulation, as in numpyro/blackjax) — a fixed
  ``(max_depth, dim)`` checkpoint buffer instead of recursion, so the
  whole transition is two nested ``lax.while_loop``s with static shapes.
- Multinomial progressive sampling within subtrees + biased progressive
  sampling across doublings (Betancourt 2017, App. A.3.2).
- Generalized U-turn criterion on the momentum sum
  ``⟨ρ, M⁻¹p_left⟩ ≤ 0 or ⟨ρ, M⁻¹p_right⟩ ≤ 0``.
- Everything vmaps over the chain axis; variable-length trajectories
  become masked iteration under vmap (chains that stop early wait).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .hmc import HMCState, IntegratorState, kinetic_energy

__all__ = ["NUTSInfo", "nuts_kernel"]


class NUTSInfo(NamedTuple):
    accept_prob: jax.Array   # mean acceptance statistic (for dual averaging)
    num_steps: jax.Array     # leapfrog steps taken this transition
    depth: jax.Array         # tree depth reached
    diverging: jax.Array     # bool: transition ended in divergence
    energy: jax.Array        # -logdens + kinetic at the initial point


def _is_turning(p_left, p_right, p_sum, inv_mass):
    """Generalized no-U-turn criterion on a (sub)trajectory."""
    rho = p_sum
    return jnp.logical_or(
        jnp.dot(rho, inv_mass * p_left) <= 0.0,
        jnp.dot(rho, inv_mass * p_right) <= 0.0,
    )


def _leaf_to_ckpt_idxs(n):
    """Checkpoint range covered by odd leaf ``n`` (trailing-bit trick).

    idx_max = number of set bits in n >> 1; idx_min = idx_max − (number of
    trailing set bits of n) + 1.
    """

    def count_bits(c):
        def body(state):
            x, acc = state
            return x >> 1, acc + (x & 1)

        _, total = jax.lax.while_loop(lambda s: s[0] > 0, body, (c, 0))
        return total

    def count_trailing_ones(c):
        def body(state):
            x, acc = state
            return x >> 1, acc + 1

        _, total = jax.lax.while_loop(lambda s: (s[0] & 1) != 0, body, (c, 0))
        return total

    idx_max = count_bits(n >> 1)
    idx_min = idx_max - count_trailing_ones(n) + 1
    return idx_min, idx_max


def _iterative_turning_check(
    p_ckpts, psum_ckpts, p_leaf, p_sum, inv_mass, idx_min, idx_max
):
    """Check U-turns between the current (odd) leaf and every checkpointed
    subtree start in [idx_min, idx_max].

    ``psum_ckpts[i]`` holds the subtree momentum sum *inclusive* of
    checkpoint leaf i, so the span-sum over leaves [ckpt..current] is
    ``p_sum − psum_ckpts[i] + p_ckpts[i]``.
    """

    def body(state):
        i, _ = state
        subtree_psum = p_sum - psum_ckpts[i] + p_ckpts[i]
        turning = _is_turning(p_ckpts[i], p_leaf, subtree_psum, inv_mass)
        return i - 1, turning

    def cond(state):
        i, turning = state
        return jnp.logical_and(i >= idx_min, jnp.logical_not(turning))

    _, turning = jax.lax.while_loop(cond, body, (idx_max, False))
    return turning


class _SubtreeState(NamedTuple):
    z: IntegratorState       # current end of the subtree
    prop_z: IntegratorState  # multinomial proposal within the subtree
    log_sum_w: jax.Array
    p_sum: jax.Array
    accept_sum: jax.Array
    leaf: jax.Array          # leaf counter
    turning: jax.Array
    diverging: jax.Array
    key: jax.Array
    p_ckpts: jax.Array       # (max_depth, dim) momentum at even (start) leaves
    psum_ckpts: jax.Array    # (max_depth, dim) subtree p_sum incl. ckpt leaf


def nuts_kernel(
    logdensity_and_grad: Callable,
    max_depth: int = 10,
    divergence_threshold: float = 1000.0,
):
    """One multinomial-NUTS transition.

    Returns ``step(key, state, step_size, inv_mass) -> (HMCState, NUTSInfo)``.
    """

    def step(key, state: HMCState, step_size, inv_mass):
        dtype = state.q.dtype
        dim = state.q.shape[0]

        def leapfrog_one(z: IntegratorState, eps) -> IntegratorState:
            p_half = z.p + 0.5 * eps * z.grad
            q = z.q + eps * inv_mass * p_half
            ld, g = logdensity_and_grad(q)
            p = p_half + 0.5 * eps * g
            return IntegratorState(q, p, ld, g)

        def energy(z: IntegratorState):
            return -z.logdens + kinetic_energy(z.p, inv_mass)

        def build_subtree(key, z_start: IntegratorState, direction, depth, h0):
            """Integrate ``2^depth`` leaves from z_start in ``direction``;
            early-exit on internal U-turn or divergence."""
            num_leaves = jnp.asarray(1, jnp.int32) << depth
            eps = direction * step_size

            zeros_ckpt = jnp.zeros((max_depth, dim), dtype)
            init = _SubtreeState(
                z=z_start,
                prop_z=z_start,
                log_sum_w=jnp.asarray(-jnp.inf, dtype),
                p_sum=jnp.zeros((dim,), dtype),
                accept_sum=jnp.asarray(0.0, dtype),
                leaf=jnp.asarray(0, jnp.int32),
                turning=jnp.asarray(False),
                diverging=jnp.asarray(False),
                key=key,
                p_ckpts=zeros_ckpt,
                psum_ckpts=zeros_ckpt,
            )

            def cond(s: _SubtreeState):
                return jnp.logical_and(
                    s.leaf < num_leaves,
                    jnp.logical_not(jnp.logical_or(s.turning, s.diverging)),
                )

            def body(s: _SubtreeState):
                key, key_mn = jax.random.split(s.key)
                z = leapfrog_one(s.z, eps)
                delta_h = h0 - energy(z)  # log weight of this leaf
                delta_h = jnp.where(jnp.isnan(delta_h), -jnp.inf, delta_h)
                diverging = delta_h < -divergence_threshold

                log_sum_w = jnp.logaddexp(s.log_sum_w, delta_h)
                # progressive multinomial sampling within the subtree
                take = (
                    jnp.log(jax.random.uniform(key_mn, (), dtype))
                    < delta_h - log_sum_w
                )
                prop_z = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(take, new, old), z, s.prop_z
                )

                accept_sum = s.accept_sum + jnp.minimum(
                    1.0, jnp.exp(delta_h)
                )
                p_sum = s.p_sum + z.p

                # trailing-bit checkpoint bookkeeping
                idx_min, idx_max = _leaf_to_ckpt_idxs(s.leaf)
                is_even = (s.leaf % 2) == 0

                p_ckpts = jnp.where(
                    is_even,
                    s.p_ckpts.at[idx_max].set(z.p),
                    s.p_ckpts,
                )
                psum_ckpts = jnp.where(
                    is_even,
                    s.psum_ckpts.at[idx_max].set(p_sum),
                    s.psum_ckpts,
                )
                turning = jnp.where(
                    is_even,
                    False,
                    _iterative_turning_check(
                        p_ckpts, psum_ckpts, z.p, p_sum,
                        inv_mass, idx_min, idx_max,
                    ),
                )

                return _SubtreeState(
                    z=z,
                    prop_z=prop_z,
                    log_sum_w=log_sum_w,
                    p_sum=p_sum,
                    accept_sum=accept_sum,
                    leaf=s.leaf + 1,
                    turning=turning,
                    diverging=diverging,
                    key=key,
                    p_ckpts=p_ckpts,
                    psum_ckpts=psum_ckpts,
                )

            out = jax.lax.while_loop(cond, body, init)
            return out

        # ---------------- main doubling loop ----------------
        key, key_mom = jax.random.split(key)
        p0 = jax.random.normal(key_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
        z0 = IntegratorState(state.q, p0, state.logdens, state.grad)
        h0 = energy(z0)

        class _Carry(NamedTuple):
            key: jax.Array
            z_left: IntegratorState
            z_right: IntegratorState
            prop_z: IntegratorState
            log_sum_w: jax.Array
            p_sum: jax.Array
            depth: jax.Array
            turning: jax.Array
            diverging: jax.Array
            accept_sum: jax.Array
            num_steps: jax.Array

        init = _Carry(
            key=key,
            z_left=z0,
            z_right=z0,
            prop_z=z0,
            log_sum_w=jnp.asarray(0.0, dtype),  # log w(z0) = h0 - h0 = 0
            p_sum=p0,
            depth=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            accept_sum=jnp.asarray(0.0, dtype),
            num_steps=jnp.asarray(0, jnp.int32),
        )

        def cond(c: _Carry):
            return jnp.logical_and(
                c.depth < max_depth,
                jnp.logical_not(jnp.logical_or(c.turning, c.diverging)),
            )

        def body(c: _Carry):
            key, key_dir, key_sub, key_bias = jax.random.split(c.key, 4)
            going_right = jax.random.bernoulli(key_dir)
            direction = jnp.where(going_right, 1.0, -1.0).astype(dtype)
            z_start = jax.tree_util.tree_map(
                lambda r, l: jnp.where(going_right, r, l), c.z_right, c.z_left
            )

            sub = build_subtree(key_sub, z_start, direction, c.depth, h0)
            sub_ok = jnp.logical_not(jnp.logical_or(sub.turning, sub.diverging))

            # biased progressive sampling across doublings
            take_new = jnp.logical_and(
                sub_ok,
                jnp.log(jax.random.uniform(key_bias, (), dtype))
                < sub.log_sum_w - c.log_sum_w,
            )
            prop_z = jax.tree_util.tree_map(
                lambda new, old: jnp.where(take_new, new, old),
                sub.prop_z,
                c.prop_z,
            )

            # merge trajectory stats (only when the subtree completed)
            log_sum_w = jnp.where(
                sub_ok, jnp.logaddexp(c.log_sum_w, sub.log_sum_w), c.log_sum_w
            )
            p_sum = jnp.where(sub_ok, c.p_sum + sub.p_sum, c.p_sum)
            z_right = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.logical_and(sub_ok, going_right), new, old
                ),
                sub.z, c.z_right,
            )
            z_left = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.logical_and(sub_ok, jnp.logical_not(going_right)),
                    new, old,
                ),
                sub.z, c.z_left,
            )

            global_turning = jnp.where(
                sub_ok,
                _is_turning(z_left.p, z_right.p, p_sum, inv_mass),
                True,  # incomplete subtree terminates the trajectory
            )
            turning = jnp.logical_or(sub.turning, global_turning)

            return _Carry(
                key=key,
                z_left=z_left,
                z_right=z_right,
                prop_z=prop_z,
                log_sum_w=log_sum_w,
                p_sum=p_sum,
                depth=c.depth + 1,
                turning=turning,
                diverging=sub.diverging,
                accept_sum=c.accept_sum + sub.accept_sum,
                num_steps=c.num_steps + sub.leaf,
            )

        out = jax.lax.while_loop(cond, body, init)

        new_state = HMCState(out.prop_z.q, out.prop_z.logdens, out.prop_z.grad)
        accept_prob = out.accept_sum / jnp.maximum(
            out.num_steps.astype(dtype), 1.0
        )
        info = NUTSInfo(
            accept_prob=accept_prob,
            num_steps=out.num_steps,
            depth=out.depth,
            diverging=out.diverging,
            energy=h0,
        )
        return new_state, info

    return step
