"""Example 1: Mauna Loa CO₂ — composite-kernel exact GPR with MLE-II fit
(reference: examples/1-mauna-loa/script.jl; kernel structure per Rasmussen
& Williams ch. 5: long-term SE + seasonal Periodic×SE + medium-term RQ +
short-term SE + white noise, :102-117).

Loads the reference's CO2_data.csv at runtime if available (read-only
mount); otherwise generates a synthetic trend+seasonal series with the
same shape.

Run: python examples/mauna_loa.py [--smoke]
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

CSV = "/root/reference/examples/1-mauna-loa/CO2_data.csv"


def load_data(smoke=False):
    if os.path.exists(CSV):
        raw = np.loadtxt(CSV, delimiter=",")
        t, co2 = raw[:, 0], raw[:, 1]
    else:
        t = 1958.0 + np.arange(680) / 12.0
        co2 = (
            315.0 + 0.8 * (t - 1958.0) + 0.012 * (t - 1958.0) ** 2
            + 3.0 * np.sin(2 * np.pi * t) + 0.3 * np.random.default_rng(0).normal(size=t.shape)
        )
    if smoke:
        t, co2 = t[::8], co2[::8]
    # split: train on pre-2004, test on the rest (script.jl:33-41)
    train = t < 2004.0
    return (jnp.asarray(t[train]), jnp.asarray(co2[train]),
            jnp.asarray(t[~train]), jnp.asarray(co2[~train]))


def theta_init(ystd=1.0):
    # initial values at script.jl:70-97 (log-space constants); amplitude-type
    # parameters are divided by ystd because the data is standardised (the
    # reference fits raw ppm in f64 — see main()); lengthscales unchanged.
    e = np.exp
    s = ystd
    return {
        "se_long": {"sigma": P.positive(e(4.0) / s), "ell": P.positive(e(4.0))},
        "seasonal": {
            "per_ell": P.positive(e(0.0)),   # relative to the (fixed) 1y period
            "se_sigma": P.positive(e(1.0) / s),
            "se_ell": P.positive(e(4.0)),
        },
        "rq": {"sigma": P.positive(e(0.0) / s), "ell": P.positive(e(0.0)),
               "alpha": P.positive(e(-1.0))},
        "se_short": {"sigma": P.positive(e(-2.0) / s), "ell": P.positive(e(-2.0))},
        "noise_scale": P.positive(max(e(-2.0) / s, 2e-2)),
    }


def build_gp_prior(t):
    """Composite kernel (script.jl:102-117)."""
    def SE(p):
        return p["sigma"] ** 2 * agp.with_lengthscale(agp.SEKernel(), p["ell"])

    k_trend = SE(t["se_long"])
    k_seasonal = agp.compose(
        agp.PeriodicKernel(period=t["seasonal"]["per_ell"] / 2.0),
        agp.ScaleTransform(1.0),  # period fixed at 1 year
    ) * SE({"sigma": t["seasonal"]["se_sigma"], "ell": t["seasonal"]["se_ell"]})
    k_rq = t["rq"]["sigma"] ** 2 * agp.with_lengthscale(
        agp.RationalQuadraticKernel(alpha=t["rq"]["alpha"]), t["rq"]["ell"]
    )
    k_short = SE(t["se_short"]) + t["noise_scale"] ** 2 * agp.WhiteKernel()
    return agp.GP(k_trend + k_seasonal + k_rq + k_short)


def main(smoke=False):
    xtrain, ytrain, xtest, ytest = load_data(smoke)
    # Center time at the train mean: stationary kernels are shift-invariant,
    # and raw years (~2e3) are fatal for the f32 distance expansion on TPU —
    # ||x||^2 ~ 4e6 makes the d2 cancellation error ~0.5 absolute (vs
    # seasonal lengthscales of ~1), which NaNs the factorization. Centering
    # is mathematically a no-op and restores f32 accuracy.
    t0 = xtrain.mean()
    xtrain, xtest = xtrain - t0, xtest - t0
    ymean = ytrain.mean()
    # Standardise y as well: the reference fits raw ppm under f64, where
    # σ² inits of e⁸ ≈ 3000 are harmless; at f32 the gram's relative
    # rounding (~5e-6) at that scale is 0.015 ABSOLUTE — above the
    # initial noise floor, so the factorization NaNs. Unit-variance y
    # puts the rounding ~4 orders below the fitted noise. Predictions
    # are un-standardised before scoring, so the ppm RMSE is unchanged
    # semantics.
    ystd = ytrain.std()
    ytrain_c, ytest_c = (ytrain - ymean) / ystd, (ytest - ymean) / ystd
    print(f"train {xtrain.shape[0]} pts, test {xtest.shape[0]} pts")

    def build_fx(theta, x):
        # 1e-5 jitter: f32-sane floor for unit-variance data (the
        # reference's f64 default is 1e-18; script.jl:127 uses f(xtrain))
        return build_gp_prior(theta)(x, 1e-5)

    loss = T.nlml(build_fx, xtrain, ytrain_c)
    theta0 = theta_init(float(ystd))
    print("initial -lml:", float(loss(theta0)))
    res = T.fit_lbfgs(loss, theta0, num_steps=10 if smoke else 250)
    print("final -lml:", float(loss(res.params)))

    theta = P.constrain(res.params)
    post = build_fx(theta, xtrain).posterior(ytrain_c)
    mu, var = post.mean_and_var(xtest)
    rmse = float(jnp.sqrt(jnp.mean((mu - ytest_c) ** 2))) * float(ystd)
    print(f"extrapolation RMSE on {xtest.shape[0]} held-out points: {rmse:.3f} ppm")

    if not smoke:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from abstractgps_tpu.utils import plot_gp

        fig, ax = plt.subplots(figsize=(10, 5))
        grid = jnp.linspace(float(xtrain.min()), float(xtest.max()) + 2, 600)
        plot_gp(post(grid, 1e-9), ax=ax, ribbon_scale=2.0)
        ax.plot(np.asarray(xtrain), np.asarray(ytrain_c), "k.", ms=2)
        ax.plot(np.asarray(xtest), np.asarray(ytest_c), "r.", ms=2)
        fig.savefig("examples/mauna_loa.png", dpi=120)
        print("wrote examples/mauna_loa.png")
    return rmse


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
