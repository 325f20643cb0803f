"""Pathwise (decoupled) posterior sampling via random Fourier features.

Wilson et al. 2020, "Efficiently Sampling Functions from Gaussian Process
Posteriors" (arXiv:2002.09309): a posterior *function* sample is a prior
function sample plus a data-dependent update,

    f_post(·) = f_prior(·) + K(·, X) (K + Σ)⁻¹ (y − f_prior(X) − ε),
    ε ~ N(0, Σ),

where ``f_prior`` is an approximate prior path built from m random Fourier
features (Rahimi & Recht 2007). After one O(N³) setup (the same Cholesky the
``PosteriorGP`` already caches, reference src/exact_gpr_posterior.jl:29-35),
every sample is a *continuous function* evaluable anywhere at
O(m + N) per point — unlike ``FiniteGP.rand`` (reference
src/finite_gp_projection.jl:233-240), which draws one jointly-correct
finite-dimensional sample per O(n_test³) factorization and cannot be
re-queried at new points consistently.

TPU-first design: the feature map is one (nx, m) GEMM + elementwise cos —
pure MXU work; sampling s paths is a batched (m, s) GEMM, no per-sample
control flow; everything jits and vmaps.

Spectral samplers (all for the unit-lengthscale forms in
``kernels/stationary.py``; lengthscales/ARD enter through the peeled input
transforms, amplitudes through ``ScaledKernel``):

- SqExponential: ω ~ N(0, I)
- Matern-ν (ν = 1/2, 3/2, 5/2): ω ~ t_{2ν}(0, I), sampled as
  ω = z·sqrt(2ν / w), w ~ χ²_{2ν}  (spectral density ∝ (2ν + ‖ω‖²)^{−(ν+D/2)})
- RationalQuadratic(α): gamma mixture of SEs — τ ~ Gamma(α, rate α),
  ω ~ N(0, τ I)  (∫Gamma(τ;α,α) e^{−τd²/2} dτ = (1 + d²/2α)^{−α})
- KernelSum: features concatenated, one block per addend
- KernelProduct of stationary factors: spectra convolve → ω = Σ_j ω_j
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..kernels.base import (
    Kernel,
    KernelProduct,
    KernelSum,
    ScaledKernel,
    TransformedKernel,
)
from ..kernels.stationary import (
    ExponentialKernel,
    Matern32Kernel,
    Matern52Kernel,
    RationalQuadraticKernel,
    SqExponentialKernel,
)
from ..ops import covmat
from ..ops.distance import as_inputs
from ..ops.precision import precise
from .exact_posterior import PosteriorGP
from .gp import GP

__all__ = [
    "FourierFeatures",
    "sample_fourier_features",
    "prior_function_sample",
    "pathwise_sample",
]


# ---------------------------------------------------------------------------
# Spectral samplers: ω-draws for the unit-lengthscale stationary families.
# ---------------------------------------------------------------------------


def _spectral_sample(kernel: Kernel, key: jax.Array, m: int, d: int):
    """Draw m frequency vectors ω ∈ R^d (raw-input space) from the kernel's
    spectral density. Returns ``(omega, variance)`` where ``variance`` is the
    scalar amplitude accumulated from ScaledKernel wrappers.

    Linear input transforms (Scale/ARD/Linear) are folded into the
    frequencies — ωᵀ(Ax) = (Aᵀω)ᵀx — so products of per-factor-lengthscaled
    kernels work; nonlinear FunctionTransforms cannot be folded and raise.
    """
    from ..kernels.base import ARDTransform, LinearTransform, ScaleTransform

    if isinstance(kernel, ScaledKernel):
        omega, v = _spectral_sample(kernel.kernel, key, m, d)
        return omega, v * kernel.variance
    if isinstance(kernel, TransformedKernel):
        t = kernel.transform
        if isinstance(t, ScaleTransform):
            omega, v = _spectral_sample(kernel.kernel, key, m, d)
            return t.s * omega, v
        if isinstance(t, ARDTransform):
            omega, v = _spectral_sample(kernel.kernel, key, m, d)
            return omega * t.v[None, :], v
        if isinstance(t, LinearTransform):
            omega, v = _spectral_sample(
                kernel.kernel, key, m, t.A.shape[0]
            )
            return omega @ t.A, v
        raise NotImplementedError(
            "cannot fold a nonlinear input transform into frequency space "
            "inside a kernel product; apply FunctionTransforms at the "
            "outermost level instead"
        )
    if isinstance(kernel, SqExponentialKernel):
        return jax.random.normal(key, (m, d)), 1.0
    if isinstance(kernel, ExponentialKernel):
        return _matern_omega(key, m, d, nu=0.5), 1.0
    if isinstance(kernel, Matern32Kernel):
        return _matern_omega(key, m, d, nu=1.5), 1.0
    if isinstance(kernel, Matern52Kernel):
        return _matern_omega(key, m, d, nu=2.5), 1.0
    if isinstance(kernel, RationalQuadraticKernel):
        k1, k2 = jax.random.split(key)
        tau = jax.random.gamma(k1, kernel.alpha, (m, 1)) / kernel.alpha
        return jax.random.normal(k2, (m, d)) * jnp.sqrt(tau), 1.0
    if isinstance(kernel, KernelProduct):
        # stationary product ⇒ spectral densities convolve ⇒ ω = Σ_j ω_j
        keys = jax.random.split(key, len(kernel.kernels))
        omega = jnp.zeros((m, d))
        var = 1.0
        for k, kk in zip(kernel.kernels, keys):
            o, v = _spectral_sample(k, kk, m, d)
            omega, var = omega + o, var * v
        return omega, var
    raise NotImplementedError(
        f"no spectral sampler for {type(kernel).__name__}; pathwise sampling "
        "supports SE/Matern/RationalQuadratic kernels and their "
        "scale/lengthscale/sum/product algebra"
    )


def _matern_omega(key: jax.Array, m: int, d: int, nu: float) -> jax.Array:
    """ω ~ multivariate-t with 2ν dof: z·sqrt(2ν/w), w ~ χ²_{2ν}."""
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (m, d))
    w = 2.0 * jax.random.gamma(k2, nu, (m, 1))  # χ²_{2ν} = Gamma(ν, scale 2)
    return z * jnp.sqrt(2.0 * nu / w)


# ---------------------------------------------------------------------------
# Feature map
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["omega", "bias", "weights", "transforms"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class FourierFeatures:
    """φ(x) = weights ⊙ cos(t(x)·ωᵀ + b) with E[φ(x)ᵀφ(z)] ≈ k(x, z).

    ``transforms`` is the peeled input-transform chain (outermost first),
    applied before the frequency GEMM — lengthscale/ARD/linear/deep feature
    maps all live here.
    """

    omega: jax.Array       # (m, D') frequencies
    bias: jax.Array        # (m,) phases ~ U(0, 2π)
    weights: jax.Array     # (m,) per-feature amplitudes √(2σ²/m_block)
    transforms: tuple      # input transforms, applied in order

    @property
    def num_features(self) -> int:
        return self.omega.shape[0]

    @precise
    def __call__(self, x) -> jax.Array:
        # @precise: this runs inside user closures AFTER pathwise_sample's
        # own @precise context has exited — the x@ωᵀ GEMM must still obey
        # the library's floored-precision policy (ops/precision.py).
        x = as_inputs(x)
        for t in self.transforms:
            x = t(x)
        proj = x @ self.omega.T + self.bias[None, :]
        return jnp.cos(proj) * self.weights[None, :]  # (N, m)


def _peel(kernel: Kernel):
    """Split k = σ² · (base ∘ t₁ ∘ t₂ …) into (base, transforms, variance)."""
    variance = 1.0
    transforms = []
    while True:
        if isinstance(kernel, ScaledKernel):
            variance = variance * kernel.variance
            kernel = kernel.kernel
        elif isinstance(kernel, TransformedKernel):
            transforms.append(kernel.transform)
            kernel = kernel.kernel
        else:
            return kernel, tuple(transforms), variance


def sample_fourier_features(
    kernel: Kernel, key: jax.Array, num_features: int, input_dim: int
) -> FourierFeatures:
    """Draw an m-feature random Fourier expansion of ``kernel``.

    ``input_dim`` is the raw input dimension D (1 for scalar inputs). Sums
    allocate ``num_features`` features per addend (concatenated), so the
    estimator stays unbiased for composite kernels like the Mauna-Loa one.
    """
    base, transforms, variance = _peel(kernel)

    if isinstance(base, KernelSum):
        # One feature block per addend (each addend may carry its own
        # lengthscale/transform chain, which the recursive call peels).
        sub_dim = input_dim
        for t in transforms:
            sub_dim = t(jnp.zeros((1, sub_dim))).shape[-1]
        blocks = []
        for k, kk in zip(base.kernels, jax.random.split(key, len(base.kernels))):
            ff = sample_fourier_features(k, kk, num_features, sub_dim)
            blocks.append(_scale_weights(ff, jnp.sqrt(variance)))
        if any(isinstance(b, _ConcatFeatures) or b.transforms for b in blocks):
            # heterogeneous per-addend transforms: keep blocks separate
            return _ConcatFeatures(tuple(blocks), tuple(transforms))
        return FourierFeatures(
            jnp.concatenate([b.omega for b in blocks], axis=0),
            jnp.concatenate([b.bias for b in blocks], axis=0),
            jnp.concatenate([b.weights for b in blocks], axis=0),
            tuple(transforms),
        )

    # transformed input dimension: run a probe through the chain
    d_eff = input_dim
    for t in transforms:
        d_eff = t(jnp.zeros((1, d_eff))).shape[-1]

    k_w, k_b = jax.random.split(key)
    omega, v_inner = _spectral_sample(base, k_w, num_features, d_eff)
    bias = jax.random.uniform(k_b, (num_features,), maxval=2.0 * jnp.pi)
    w = jnp.full((num_features,), jnp.sqrt(2.0 / num_features))
    return FourierFeatures(
        omega, bias, jnp.sqrt(variance * v_inner) * w, tuple(transforms)
    )


def _scale_weights(ff, s):
    if isinstance(ff, _ConcatFeatures):
        return _ConcatFeatures(
            tuple(_scale_weights(b, s) for b in ff.blocks), ff.transforms
        )
    return dataclasses.replace(ff, weights=s * ff.weights)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "transforms"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _ConcatFeatures:
    """Concatenation of per-addend feature maps with an outer transform
    chain (sum kernels whose addends carry their own transforms)."""

    blocks: tuple
    transforms: tuple

    @property
    def num_features(self) -> int:
        return sum(b.num_features for b in self.blocks)

    @precise
    def __call__(self, x) -> jax.Array:
        # @precise for the same reason as FourierFeatures.__call__: the
        # feature map escapes into user closures after the constructor's
        # precision context has exited, and transform chains may GEMM
        x = as_inputs(x)
        for t in self.transforms:
            x = t(x)
        return jnp.concatenate([b(x) for b in self.blocks], axis=-1)


# ---------------------------------------------------------------------------
# Prior and posterior path samplers
# ---------------------------------------------------------------------------


def prior_function_sample(
    f: GP, key: jax.Array, num_features: int, input_dim: int,
    num_samples: int | None = None,
):
    """Approximate prior path(s): h(x) = m(x) + φ(x)·w, w ~ N(0, I_m).

    Returns a pure callable ``h`` with ``h(x) -> (nx,)`` (or ``(nx, s)``
    when ``num_samples`` is given). The callable is jit/vmap-safe — it
    closes over arrays only.
    """
    k_feat, k_w = jax.random.split(key)
    phi = sample_fourier_features(f.kernel, k_feat, num_features, input_dim)
    s = 1 if num_samples is None else num_samples
    w = jax.random.normal(k_w, (phi.num_features, s))

    @precise
    def h(x):
        # @precise: executes after this constructor returns, outside any
        # ambient precision context — keep the φ(x)@w GEMM floored.
        x = as_inputs(x)
        out = phi(x) @ w + f.mean(x)[:, None]
        return out[:, 0] if num_samples is None else out

    return h


@precise
def pathwise_sample(
    post: PosteriorGP, key: jax.Array, num_features: int = 1024,
    num_samples: int | None = None,
):
    """Posterior function sample(s) from an exact ``PosteriorGP``.

    Returns a callable ``g`` with ``g(x) -> (nx,)`` (or ``(nx, s)``):

        g(·) = m(·) + φ(·)w + K(·, X)·v,
        v = (K + Σ)⁻¹ (δ − φ(X)w − ε),   ε ~ N(0, Σ),

    using the posterior's cached Cholesky (no extra O(N³) work). Matches
    ``post(x).rand`` in distribution up to the O(1/√m) RFF truncation of
    the prior term.
    """
    cache = post.data
    x_train, L, delta = cache.x, cache.L, cache.delta
    prior = post.prior
    d = as_inputs(x_train).shape[-1]
    s = 1 if num_samples is None else num_samples

    k_feat, k_w, k_eps = jax.random.split(key, 3)
    phi = sample_fourier_features(prior.kernel, k_feat, num_features, d)
    w = jax.random.normal(k_w, (phi.num_features, s))

    # ε ~ N(0, Σy), from the projection noise recorded on the cache
    from ..ops.noise import DenseNoise

    if cache.noise is None:
        raise NotImplementedError(
            "pathwise_sample needs the posterior's observation-noise record; "
            "this cache has none (e.g. a sequentially-extended posterior "
            "with correlated DenseNoise, or one restored without its noise "
            "field)."
        )
    z_eps = jax.random.normal(k_eps, (delta.shape[0], s))
    if isinstance(cache.noise, DenseNoise):
        eps = cache.noise._chol() @ z_eps
    else:
        eps = jnp.sqrt(cache.noise.diag())[:, None] * z_eps

    resid = delta[:, None] - phi(x_train) @ w - eps      # (N, s)
    # covmat.chol_solve: wide RHS routes to the single-trtri TPU path
    v = covmat.chol_solve(L, resid)                      # (N, s)

    @precise
    def g(xs):
        # @precise: the sampler closure outlives pathwise_sample's own
        # precision context; its GEMMs (φ(x)@w, cross@v) must re-enter it.
        xs_in = as_inputs(xs)
        cross = prior.kernel.cross(xs_in, x_train)        # (nx, N)
        out = prior.mean(xs_in)[:, None] + phi(xs_in) @ w + cross @ v
        return out[:, 0] if num_samples is None else out

    return g
