from .gp import GP, AbstractGP  # noqa: F401
from .finite_gp import FiniteGP  # noqa: F401
from .exact_posterior import PosteriorGP, posterior, ExactInference  # noqa: F401
from .sparse import VFE, DTC, ApproxPosteriorGP, elbo, update_posterior  # noqa: F401
from .latent_gp import LatentGP, LatentFiniteGP  # noqa: F401
from .svgp import (  # noqa: F401
    SVGP,
    SVGPPosterior,
    fit_svgp,
    svgp_elbo,
    svgp_elbo_quadrature,
    svgp_init,
    svgp_posterior,
)
