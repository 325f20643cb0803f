"""Fused Pallas gram-matrix kernel for isotropic kernels.

Reference semantics: ``kernelmatrix(k, x, z)`` (src/base_gp.jl:70-74). The
TPU-native design computes each (TN, TM) gram tile as

    d² = ‖x_i‖² + ‖z_j‖² − 2·x_i·z_jᵀ      (one MXU matmul + rank-1 adds)
    K  = g(d²)                              (elementwise VPU map, fused)

entirely in VMEM — the distance matrix is never materialised in HBM, halving
HBM traffic vs. the unfused XLA path for the memory-bound small-D regime.

The elementwise map ``g`` is the kernel pytree's ``_apply_sqdist`` method;
its hyperparameter leaves (lengthscale-free isotropic kernels keep them
scalar) are passed through SMEM so the kernel stays jit-traceable when
hyperparameters are traced (e.g. under ``jax.grad``). The backward pass is a
``custom_vjp`` that differentiates the equivalent XLA formulation — exact
same math, so gradients are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INTERPRET = False  # set True in tests to run the kernel on CPU
_ENABLED = True
_MIN_SIZE = 512 * 512  # below this, XLA fusion is already optimal

_TILE_N = 256
_TILE_M = 256


def set_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = flag


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def should_use_pallas(x: jax.Array, z: jax.Array) -> bool:
    if not _ENABLED:
        return False
    if not _INTERPRET and jax.default_backend() != "tpu":
        return False
    if x.dtype not in (jnp.float32,) or z.dtype not in (jnp.float32,):
        return False
    return x.shape[0] * z.shape[0] >= _MIN_SIZE


def _pad_rows(a: jax.Array, tile: int) -> jax.Array:
    n = a.shape[0]
    pad = (-n) % tile
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
    return a


def _xla_isotropic_gram(kernel, x, z, symmetric):
    """Reference XLA formulation (used for the VJP and as fallback)."""
    from .distance import pairwise_sqdist

    d2 = pairwise_sqdist(x, None if symmetric else z)
    return kernel._apply_sqdist(d2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(symmetric, kernel, x, z):
    return _fused_fwd_impl(symmetric, kernel, x, z)


def _fused_fwd_impl(symmetric, kernel, x, z):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    m = z.shape[0]
    xp = _pad_rows(x, _TILE_N)
    zp = _pad_rows(z, _TILE_M)
    np_, mp_ = xp.shape[0], zp.shape[0]

    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    # hyperparameters ride through SMEM as (1, 1) scalars
    smem_leaves = [jnp.reshape(p.astype(jnp.float32), (1, 1)) for p in leaves]

    def body(*refs):
        param_refs = refs[:len(smem_leaves)]
        x_ref, z_ref, o_ref = refs[len(smem_leaves):]
        i = pl.program_id(0)
        j = pl.program_id(1)
        xt = x_ref[:]  # (TN, D)
        zt = z_ref[:]  # (TM, D)
        # Pin the dot precision: Mosaic rejects the ambient HIGH set by the
        # library-wide precision context (ops.precision), and DEFAULT would
        # run bf16 passes (~1e-2 gram error — fatal for Cholesky stability).
        # HIGHEST = exact f32 MXU passes; measured max err 2e-6 vs the
        # XLA-highest formulation at N=1024.
        g = jax.lax.dot_general(
            xt, zt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        nx = jnp.sum(xt * xt, axis=1, keepdims=True)      # (TN, 1)
        nz = jnp.sum(zt * zt, axis=1, keepdims=True).T    # (1, TM)
        d2 = jnp.maximum(nx + nz - 2.0 * g, 0.0)
        if symmetric:
            # exact zeros on the global diagonal
            rows = i * _TILE_N + jax.lax.broadcasted_iota(
                jnp.int32, (_TILE_N, _TILE_M), 0
            )
            cols = j * _TILE_M + jax.lax.broadcasted_iota(
                jnp.int32, (_TILE_N, _TILE_M), 1
            )
            d2 = jnp.where(rows == cols, 0.0, d2)
        k_obj = jax.tree_util.tree_unflatten(
            treedef, [r[0, 0] for r in param_refs]
        )
        o_ref[:] = k_obj._apply_sqdist(d2)

    grid = (np_ // _TILE_N, mp_ // _TILE_M)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            *[
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
                for _ in smem_leaves
            ],
            pl.BlockSpec((_TILE_N, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_M, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_N, _TILE_M), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        interpret=_INTERPRET,
    )(*smem_leaves, xp, zp)
    return out[:n, :m]


def _fused_vjp_fwd(symmetric, kernel, x, z):
    out = _fused_fwd_impl(symmetric, kernel, x, z)
    return out, (kernel, x, z)


def _fused_vjp_bwd(symmetric, res, g):
    kernel, x, z = res
    _, vjp = jax.vjp(
        lambda k_, x_, z_: _xla_isotropic_gram(k_, x_, z_, symmetric), kernel, x, z
    )
    return vjp(g)


_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_isotropic_gram(apply_fn, x, z, symmetric: bool = False):
    """Fused gram for an isotropic kernel.

    ``apply_fn`` must be the bound ``_apply_sqdist`` of a kernel pytree; the
    pytree itself is recovered from ``apply_fn.__self__`` so its
    hyperparameter leaves flow through the kernel as SMEM inputs and through
    the VJP as differentiable arguments.
    """
    kernel = apply_fn.__self__
    return _fused(symmetric, kernel, x, z)
