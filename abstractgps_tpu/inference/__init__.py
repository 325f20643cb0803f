"""Inference engines: training loops (MLE-II / sparse VI) and samplers
(NUTS, HMC, ESS, SMC)."""

from . import mcmc
from . import training
from .training import FitResult, fit, fit_lbfgs, neg_elbo, nlml

__all__ = ["fit", "fit_lbfgs", "nlml", "neg_elbo", "FitResult", "mcmc", "training"]
