"""MCMC samplers: NUTS, HMC, elliptical slice sampling, SMC.

Replaces the reference's external AdvancedHMC/Turing/EllipticalSliceSampling
dependencies (examples/0-intro-1d/script.jl, test/ppl/turing.jl) with
TPU-native vectorised implementations.
"""

from .adaptation import (
    da_init,
    da_update,
    welford_init,
    welford_update,
    welford_variance,
    window_schedule,
)
from . import diagnostics
from .ess import ESSState, ess_init, ess_kernel, run_ess
from .hmc import HMCState, hmc_init, hmc_kernel, leapfrog
from .nuts import NUTSInfo, nuts_kernel
from .sample import MCMCResult, init_chain_positions, run_mcmc
from .smc import SMCResult, run_smc, systematic_resample

__all__ = [
    "run_mcmc",
    "MCMCResult",
    "init_chain_positions",
    "nuts_kernel",
    "NUTSInfo",
    "hmc_kernel",
    "hmc_init",
    "HMCState",
    "leapfrog",
    "da_init",
    "da_update",
    "welford_init",
    "welford_update",
    "welford_variance",
    "window_schedule",
    "run_ess",
    "ess_kernel",
    "ess_init",
    "ESSState",
    "run_smc",
    "SMCResult",
    "systematic_resample",
    "diagnostics",
]
