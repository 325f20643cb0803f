"""Example 3: Parametric heteroscedastic noise — observation variance is an
input-dependent quadratic with one learned scale, fit by MLE-II L-BFGS
(reference: examples/3-parametric-heteroscedastic/script.jl;
``observation_variance(θ, x) = Diagonal(0.01 + θ.σ²·x²)`` at :25,
``GP(0, θ.s · with_lengthscale(SEKernel(), θ.l))(x, Σ)`` at :26-29).

Run: python examples/parametric_heteroscedastic.py [--smoke]
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


def observation_variance(theta, x):
    # Diagonal(0.01 .+ θ.σ² .* x.^2)  (script.jl:25)
    return 0.01 + theta["sigma2"] * x**2


def build_fx(theta, x):
    kernel = theta["s"] * agp.with_lengthscale(agp.SEKernel(), theta["l"])
    return agp.GP(0.0, kernel)(x, observation_variance(theta, x))


def main(smoke=False):
    # generating parameters (script.jl:33): s=1, l=3, σ²=0.1
    theta_true = {"s": jnp.asarray(1.0), "l": jnp.asarray(3.0),
                  "sigma2": jnp.asarray(0.1)}
    x = jnp.arange(0.0, 10.05, 0.5 if smoke else 0.1)
    y = build_fx(theta_true, x).rand(jax.random.PRNGKey(42))

    theta0 = {"s": P.positive(1.0), "l": P.positive(3.0),
              "sigma2": P.positive(0.1)}
    # jitter the init like the reference (flat_θ + 0.01 randn, :69)
    flat, unravel = P.ravel(theta0)
    flat = flat + 0.01 * jax.random.normal(jax.random.PRNGKey(7), flat.shape)
    theta0 = unravel(flat)

    loss = T.nlml(build_fx, x, y)
    res = T.fit_lbfgs(loss, theta0, num_steps=10 if smoke else 100)
    theta = P.constrain(res.params)
    print("fitted:", {k: round(float(v), 4) for k, v in theta.items()},
          "| true:", {k: float(v) for k, v in theta_true.items()})

    post = build_fx(theta, x).posterior(y)
    mu, var_lat = post.mean_and_var(x)
    # posterior + noise band (script.jl:97-101)
    var_obs = var_lat + observation_variance(theta, x)
    inside = jnp.mean(
        (jnp.abs(y - mu) <= 3.0 * jnp.sqrt(var_obs)).astype(jnp.float32)
    )
    print(f"fraction of data inside 3σ posterior+noise band: {float(inside):.3f}")

    if not smoke:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(9, 5))
        xs = np.asarray(x)
        ax.plot(xs, np.asarray(y), "k.", label="y")
        ax.plot(xs, np.asarray(mu), "C0", label="posterior mean")
        for v, c, lbl in [(var_obs, "C1", "posterior + noise"),
                          (var_lat, "C0", "posterior")]:
            s = 3 * np.sqrt(np.asarray(v))
            ax.fill_between(xs, np.asarray(mu) - s, np.asarray(mu) + s,
                            color=c, alpha=0.25, label=lbl)
        ax.legend()
        fig.savefig("examples/parametric_heteroscedastic.png", dpi=120)
        print("wrote examples/parametric_heteroscedastic.png")
    return float(inside)


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
