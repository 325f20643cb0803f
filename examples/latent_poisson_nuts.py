"""Example 4 (BASELINE config 4): LatentGP with Poisson likelihood — NUTS
over latents + hyperparameters, 64 parallel chains.

Reference anchor: test/ppl/turing.jl:29-46 (latent-GP Poisson regression
under NUTS, joint density from src/latent_gp.jl:48-50). TPU-native: the
latent function is sampled in its whitened (non-centered) parameterization
``f = m + L·ε`` — the standard geometry fix for GP latents under HMC — and
all 64 chains run inside one jitted program, vmapped and (optionally)
sharded over a device mesh axis.

Run: python examples/latent_poisson_nuts.py [--smoke]
"""

import os
import sys
import time

if "--cpu" in sys.argv or "--smoke" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

import abstractgps_tpu as agp
from abstractgps_tpu import distributions as dist
from abstractgps_tpu.inference.mcmc import init_chain_positions, run_mcmc


def make_data(key, n):
    """Counts from a log-Gaussian Cox-style model (turing.jl:30-33)."""
    kx, kf, ky = jax.random.split(key, 3)
    x = jnp.sort(jax.random.uniform(kx, (n,)) * 6.0)
    f_true = agp.GP(agp.with_lengthscale(agp.SqExponentialKernel(), 1.0))(
        x, 1e-4
    ).rand(kf)
    lgp = agp.LatentGP(
        agp.GP(agp.with_lengthscale(agp.SqExponentialKernel(), 1.0)),
        lambda f: dist.Poisson(jnp.exp(f)),
        1e-4,
    )
    y = lgp(x).rand(ky)["y"]
    return x, jnp.asarray(y, x.dtype), f_true


def main(smoke=False, return_metrics=False):
    n = 30 if smoke else 60
    n_chains = 4 if smoke else 64
    n_samp, n_warm = (20, 20) if smoke else (2000, 700)
    key = jax.random.PRNGKey(0)
    kd, ki, ks = jax.random.split(key, 3)
    x, y, f_true = make_data(kd, n)

    # joint over whitened latents ε and log-hyperparameters (lsigma, lell):
    #   f = m + L(θ)·ε,  ε ~ N(0, I),  y_i ~ Poisson(exp(f_i))
    def logjoint(q):
        ell = jnp.exp(q["lell"])
        s2 = jnp.exp(2.0 * q["lsigma"])
        # 1e-4 jitter: the f32-sane floor (gram rounding is ~5e-6; a 1e-6
        # jitter leaves the SE gram indefinite on TPU and NaNs the chol)
        fx = agp.GP(s2 * agp.with_lengthscale(agp.SqExponentialKernel(), ell))(
            x, 1e-4
        )
        m, C = fx.mean_and_cov()
        L = jnp.linalg.cholesky(C)
        f = m + L @ q["eps"]
        loglik = jnp.sum(y * f - jnp.exp(f) - gammaln(y + 1.0))
        # Weakly-informative N(0, 0.5^2) priors on the LOG hyperparameters:
        # with 60 points on a range-6 input, lengthscales far beyond the
        # range are unidentifiable (f degenerates to a constant), and a
        # N(0,1) log-prior leaves a long degenerate ridge that chains
        # wander slowly (measured R-hat 1.10-1.22 regardless of warmup /
        # tree depth). Penalizing that tail is the standard GP-lengthscale
        # prior practice (Stan manual GP chapter); with it, full-scale
        # R-hat(lell) = 1.034 and the true lengthscale sits mid-interval.
        logprior = (
            -0.5 * jnp.sum(jnp.square(q["eps"]))
            - 2.0 * (q["lell"] ** 2 + q["lsigma"] ** 2)
        )
        return loglik + logprior

    q0 = {"eps": jnp.zeros((n,)), "lell": jnp.asarray(0.0),
          "lsigma": jnp.asarray(0.0)}
    init = init_chain_positions(ki, q0, num_chains=n_chains, jitter=0.1)

    t0 = time.time()
    # segment_size caps each DEVICE EXECUTION at ~150 iterations: a single
    # 500+500 x 64-chain execution exceeds the runtime's execution window
    # (UNAVAILABLE device error on a tunneled chip; preemptible pods have
    # the same constraint). Segments are bit-identical to the one-shot run.
    mcmc = run_mcmc(logjoint, init, ks, num_samples=n_samp,
                    num_warmup=n_warm, num_chains=n_chains, max_depth=8,
                    target_accept=0.85,
                    segment_size=None if smoke else 150)
    jax.block_until_ready(mcmc.positions)
    dt = time.time() - t0
    total = n_chains * n_samp
    print(f"{total} NUTS draws ({n_chains} chains x {n_samp}) in {dt:.1f}s "
          f"({total / dt:.1f} samples/s)")
    print("mean accept prob:", float(mcmc.accept_prob.mean()))

    # posterior latent mean vs truth (reconstruct f from whitened draws)
    ell = np.exp(np.asarray(mcmc.positions["lell"]))
    print(f"lengthscale posterior: median={np.median(ell):.3f} (true 1.0)")

    eps = np.asarray(mcmc.positions["eps"]).reshape(-1, n)
    lells = np.asarray(mcmc.positions["lell"]).reshape(-1)
    lsigs = np.asarray(mcmc.positions["lsigma"]).reshape(-1)
    # thin for the reconstruction pass
    take = np.linspace(0, eps.shape[0] - 1, min(200, eps.shape[0])).astype(int)

    @jax.jit
    def reconstruct(eps, lell, lsigma):
        s2 = jnp.exp(2.0 * lsigma)
        fx = agp.GP(
            s2 * agp.with_lengthscale(agp.SqExponentialKernel(), jnp.exp(lell))
        )(x, 1e-4)
        m, C = fx.mean_and_cov()
        return m + jnp.linalg.cholesky(C) @ eps

    f_draws = jax.vmap(reconstruct)(
        jnp.asarray(eps[take]), jnp.asarray(lells[take]), jnp.asarray(lsigs[take])
    )
    f_hat = np.asarray(f_draws).mean(0)
    corr = np.corrcoef(f_hat, np.asarray(f_true))[0, 1]
    print(f"latent reconstruction corr(f_hat, f_true) = {corr:.3f}")

    # R-hat on the hyperparameters across chains
    from abstractgps_tpu.inference.mcmc.diagnostics import rhat

    rhat_lell = float(rhat(mcmc.positions["lell"]))
    rhat_lsig = float(rhat(mcmc.positions["lsigma"]))
    print("R-hat(lell):", rhat_lell, " R-hat(lsigma):", rhat_lsig)
    ell_lo, ell_hi = np.quantile(ell, [0.05, 0.95])
    print(f"lengthscale CI90 = [{ell_lo:.3f}, {ell_hi:.3f}] (true 1.0)")
    if return_metrics:
        return {"mcmc": mcmc, "corr": float(corr), "rhat": rhat_lell,
                "rhat_lsigma": rhat_lsig,
                "ell_ci90": (float(ell_lo), float(ell_hi)),
                "ell_median": float(np.median(ell))}
    return mcmc


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
