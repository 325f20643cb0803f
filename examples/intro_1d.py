"""Example 0: 1-D GP regression end to end (reference:
examples/0-intro-1d/script.jl).

Covers the same workflow: prior + projection, exact posterior, log marginal
likelihood, MLE-II hyperparameter fit (L-BFGS), fully-Bayesian NUTS over
hyperparameters, and elliptical slice sampling — all TPU-native (each phase
is one jitted program).

Run: python examples/intro_1d.py [--smoke]
"""

import os
import sys

if "--cpu" in sys.argv or "--smoke" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

import abstractgps_tpu as agp
from abstractgps_tpu import params as P
from abstractgps_tpu.inference import training as T
from abstractgps_tpu.inference.mcmc import init_chain_positions, run_mcmc


def make_data(key, n=50):
    kx, ky = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(kx, (n,)) * 10.0)
    f_true = agp.GP(1.5 * agp.with_lengthscale(agp.Matern52Kernel(), 1.2))
    y = f_true(x, 0.1).rand(ky)
    return x, y


def build_fx(theta, x):
    kernel = theta["s2"] * agp.with_lengthscale(agp.Matern52Kernel(), theta["ell"])
    return agp.GP(kernel)(x, theta["noise2"])


def main(smoke=False):
    key = jax.random.PRNGKey(0)
    kd, kn, ke = jax.random.split(key, 3)
    x, y = make_data(kd, n=20 if smoke else 50)

    # -- exact inference at fixed hyperparameters ---------------------------
    theta_fixed = {"s2": jnp.asarray(1.0), "ell": jnp.asarray(1.0),
                   "noise2": jnp.asarray(0.1)}
    fx = build_fx(theta_fixed, x)
    print("logpdf at init:", float(fx.logpdf(y)))

    # -- MLE-II via L-BFGS (script.jl:369-426) -------------------------------
    theta0 = {"s2": P.positive(1.0), "ell": P.positive(1.0),
              "noise2": P.positive(0.1)}
    loss = T.nlml(build_fx, x, y)
    res = T.fit_lbfgs(loss, theta0, num_steps=20 if smoke else 200)
    theta_mle = P.constrain(res.params)
    print("MLE-II theta:", {k: float(v) for k, v in theta_mle.items()})
    print("logpdf at MLE:", float(build_fx(theta_mle, x).logpdf(y)))

    # -- posterior prediction -------------------------------------------------
    post = build_fx(theta_mle, x).posterior(y)
    x_test = jnp.linspace(-2.0, 12.0, 10 if smoke else 200)
    mu, var = post.mean_and_var(x_test)
    print("posterior mean range:", float(mu.min()), float(mu.max()))

    # -- fully Bayesian: NUTS over log-hyperparameters (script.jl:142-254) ---
    def logjoint(th):
        c = {"s2": jnp.exp(th["ls2"]), "ell": jnp.exp(th["lell"]),
             "noise2": jnp.exp(th["lnoise2"])}
        lml = build_fx(c, x).logpdf(y)
        logprior = -0.5 * (th["lell"] ** 2 + th["ls2"] ** 2
                           + (th["lnoise2"] + 2.0) ** 2)
        return lml + logprior

    th0 = {"lell": jnp.asarray(0.0), "ls2": jnp.asarray(0.0),
           "lnoise2": jnp.asarray(-2.0)}
    n_chains, n_samp, n_warm = (2, 20, 20) if smoke else (4, 1000, 1000)
    init = init_chain_positions(kn, th0, num_chains=n_chains, jitter=0.3)
    mcmc = run_mcmc(logjoint, init, ke, num_samples=n_samp,
                    num_warmup=n_warm, num_chains=n_chains)
    ell_post = np.exp(np.asarray(mcmc.positions["lell"]).ravel())
    print(f"NUTS lengthscale posterior: median={np.median(ell_post):.3f} "
          f"(MLE {float(theta_mle['ell']):.3f}), "
          f"accept={float(mcmc.accept_prob.mean()):.2f}")

    # -- elliptical slice sampling over hyperparameters (script.jl:305-357) --
    # The reference samples kernel parameters with EllipticalSliceSampling.jl
    # under a Gaussian prior; here the SAME posterior as the NUTS phase —
    # prior N(mean, I) on log-hyperparameters — is sampled by run_ess. ESS
    # handles the Gaussian-prior factor exactly on the ellipse, so only the
    # log marginal likelihood is evaluated in the slice loop (gradient-free:
    # one gram+Cholesky per evaluation, no AD sweep).
    from abstractgps_tpu.inference.mcmc import run_ess

    prior_mean = jnp.asarray([0.0, 0.0, -2.0])  # (lell, ls2, lnoise2)

    def loglik_ess(v):
        th = v + prior_mean  # ellipse is zero-mean; shift at the call site
        c = {"ell": jnp.exp(th[0]), "s2": jnp.exp(th[1]),
             "noise2": jnp.exp(th[2])}
        return build_fx(c, x).logpdf(y)

    n_ess, n_ess_burn = (20, 10) if smoke else (2000, 200)
    qs, lls = run_ess(
        loglik_ess, lambda k: jax.random.normal(k, (3,)),
        jnp.zeros((3,)), jax.random.PRNGKey(7),
        num_samples=n_ess, num_burnin=n_ess_burn, num_chains=2,
    )
    ell_ess = np.exp(np.asarray(qs[..., 0] + prior_mean[0]).ravel())
    print(f"ESS lengthscale posterior: median={np.median(ell_ess):.3f} "
          f"(NUTS {np.median(ell_post):.3f}); "
          f"{n_ess} draws x 2 chains, gradient-free")
    if not smoke:
        # the two samplers target the SAME posterior — medians must agree
        assert abs(np.log(np.median(ell_ess) / np.median(ell_post))) < 0.5, (
            np.median(ell_ess), np.median(ell_post))

    if not smoke:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from abstractgps_tpu.utils import plot_gp, sampleplot

        fig, ax = plt.subplots(figsize=(9, 5))
        plot_gp(post(x_test, 1e-9), ax=ax, ribbon_scale=2.0, label="posterior")
        sampleplot(post(x_test, 1e-9), key=key, samples=5, ax=ax)
        ax.plot(np.asarray(x), np.asarray(y), "kx", label="data")
        ax.legend()
        fig.savefig("examples/intro_1d.png", dpi=120)
        print("wrote examples/intro_1d.png")
    return theta_mle


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
