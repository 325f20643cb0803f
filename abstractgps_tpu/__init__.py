"""abstractgps_tpu — a TPU-native Gaussian-process inference engine.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
AbstractGPs.jl (reference layout: src/AbstractGPs.jl:1-68; exports at
:19-35): GP priors, FiniteGP projections, exact GPR posteriors with
sequential conditioning, sparse VFE/DTC approximations with online updates,
LatentGPs, plus TPU-first additions — Pallas gram/Cholesky kernels,
vectorised NUTS/HMC/ESS/SMC samplers, optax VI/MLE training loops, and
mesh-sharded multi-chip execution.
"""

from . import distributions, kernels
from .kernels import *  # noqa: F401,F403 — kernel zoo re-export (reference @reexport KernelFunctions)
from .kernels.base import (
    kernelmatrix,
    kernelmatrix_diag,
    with_lengthscale,
    compose,
    ScaleTransform,
    ARDTransform,
    LinearTransform,
    FunctionTransform,
)
from .means import ConstMean, CustomMean, ZeroMean, mean_vector
from .models.exact_posterior import ExactInference, PosteriorGP
from .models.finite_gp import (
    FiniteGP,
    gradlogpdf,
    loglikelihood,
    logpdf,
    marginals,
    rand,
    sqmahal,
)
from .models.gp import GP, cov, mean, mean_and_cov, mean_and_var, var
from .models.latent_gp import LatentFiniteGP, LatentGP
from .models.sparse import (
    DTC,
    VFE,
    ApproxPosteriorGP,
    elbo,
    inducing_points,
    update_posterior,
)
from .models.svgp import (
    SVGP,
    SVGPPosterior,
    fit_svgp,
    fit_svgp_natgrad,
    natgrad_step,
    svgp_elbo,
    svgp_elbo_quadrature,
    svgp_init,
    svgp_posterior,
)
from .models.iterative import (
    CGInference,
    CGPosteriorGP,
    cg_logpdf,
    mbcg,
    slq_logdet,
)
from .models.pathwise import (
    FourierFeatures,
    pathwise_sample,
    prior_function_sample,
    sample_fourier_features,
)
from .models.markov import (
    MarkovPosteriorGP,
    is_markov_kernel,
    markov_logpdf,
    markov_mean_and_var,
    markov_posterior,
    markov_rand,
)
from .models import exact_posterior as _exact
from .models import sparse as _sparse
from .ops.distance import as_inputs, col_vecs, row_vecs
from .ops.noise import (
    DEFAULT_NOISE_VARIANCE,
    DenseNoise,
    DiagonalNoise,
    IsotropicNoise,
)
from .ops.precision import get_matmul_precision, set_matmul_precision

__version__ = "0.1.0"


def posterior(*args):
    """``posterior(fx, y)`` → exact PosteriorGP (src/exact_gpr_posterior.jl:29);
    ``posterior(approx, fx, y)`` → ApproxPosteriorGP or exact, dispatching on
    the approximation (src/abstract_gp.jl:98-114)."""
    if len(args) == 2:
        fx, y = args
        return _exact.posterior(fx, y)
    if len(args) == 3:
        approx, fx, y = args
        return approx.posterior(fx, y)
    raise TypeError(f"posterior takes 2 or 3 arguments, got {len(args)}")


def approx_log_evidence(approx, fx, y):
    """Approximate log marginal likelihood under ``approx``
    (src/abstract_gp.jl:88-96)."""
    return approx.approx_log_evidence(fx, y)


def dtc(d: DTC, fx, y):
    """Deprecated alias for ``approx_log_evidence(DTC(...), fx, y)``
    (src/deprecations.jl:9)."""
    import warnings

    warnings.warn("dtc is deprecated; use approx_log_evidence", DeprecationWarning)
    return d.approx_log_evidence(fx, y)


def std(fx: FiniteGP):
    """Marginal standard deviations of a projection."""
    import jax.numpy as jnp

    return jnp.sqrt(fx.var())
