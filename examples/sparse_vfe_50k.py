"""Example 3 (BASELINE config 3): sparse variational GP at scale —
50k points, 512 inducing points, SE-ARD kernel, stochastic ELBO training.

The reference's collapsed VFE bound (src/sparse_approximations.jl:248-305)
touches all N points per evaluation; here the uncollapsed minibatch ELBO
(models/svgp.py) trains hyperparameters (SE-ARD lengthscales, variance,
noise), inducing locations and the variational distribution jointly, with
the whole optimisation loop as one jitted ``lax.scan`` — no host
round-trips. At the end the collapsed VFE bound on the full data (the
reference's objective) scores the fit.

Run: python examples/sparse_vfe_50k.py [--smoke]
"""

import dataclasses
import os
import sys
import time

if "--cpu" in sys.argv or "--smoke" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np
import optax

import abstractgps_tpu as agp
from abstractgps_tpu import params as P


def make_data(key, n, d):
    """Synthetic additive nonlinearity with per-dim relevance decay (so the
    fitted ARD lengthscales have structure to find)."""
    kx, kn = jax.random.split(key)
    x = jax.random.uniform(kx, (n, d)) * 4.0
    weights = jnp.exp(-jnp.arange(d) / 2.0)
    f = jnp.sin(x) @ weights + 0.3 * jnp.cos(2.0 * x[:, 0])
    y = f + 0.2 * jax.random.normal(kn, (n,))
    return x, y


def build_svgp(c, template):
    kern = c["s2"] * agp.compose(
        agp.SqExponentialKernel(), agp.ARDTransform(1.0 / c["ard"])
    )
    return dataclasses.replace(
        template, kernel=kern, z=c["z"], m=c["m"], C_raw=c["C_raw"]
    )


def main(smoke=False):
    n, d, m = (2000, 3, 32) if smoke else (50_000, 8, 512)
    batch, steps = (128, 100) if smoke else (2048, 2000)
    key = jax.random.PRNGKey(0)
    kd, kz, kf = jax.random.split(key, 3)
    x, y = make_data(kd, n, d)

    # inducing init: random data subset (standard); jitter per reference
    z0 = x[jax.random.choice(kz, n, (m,), replace=False)]
    template = agp.svgp_init(agp.SqExponentialKernel(), z0)

    theta0 = {
        "s2": P.positive(1.0),
        "ard": P.positive(jnp.ones((d,))),
        "noise2": P.positive(0.1),
        "z": z0,
        "m": template.m,
        "C_raw": template.C_raw,
    }

    opt = optax.adam(3e-2)

    def loss(theta, xb, yb):
        c = P.constrain(theta)
        sv = build_svgp(c, template)
        return -agp.svgp_elbo(sv, xb, yb, c["noise2"], n_total=n)

    @jax.jit
    def run(theta, keys):
        def step(carry, k):
            th, opt_state = carry
            idx = jax.random.randint(k, (batch,), 0, n)
            l, g = jax.value_and_grad(loss)(th, x[idx], y[idx])
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(th, updates), opt_state), -l

        (theta, _), trace = jax.lax.scan(step, (theta, opt.init(theta)), keys)
        return theta, trace

    t0 = time.time()
    theta, trace = run(theta0, jax.random.split(kf, steps))
    jax.block_until_ready(trace)
    dt = time.time() - t0
    print(f"{steps} stochastic-ELBO steps (batch {batch}) in {dt:.1f}s "
          f"({steps / dt:.1f} steps/s)")
    print("minibatch ELBO: first", float(trace[0]), "last", float(trace[-1]))

    c = P.constrain(theta)
    sv = build_svgp(c, template)
    print("fitted noise2:", float(c["noise2"]))
    print("fitted ARD lengthscales:", np.round(np.asarray(c["ard"]), 3))

    # reference objective on the full data: collapsed VFE bound
    f_prior = agp.GP(sv.kernel)
    full_elbo = float(agp.elbo(agp.VFE(f_prior(sv.z, 1e-6)),
                               f_prior(x, c["noise2"]), y))
    print("collapsed VFE elbo (full data):", full_elbo)

    # predictive check on held-out grid
    mu, var = sv.predict(x[:1000])
    rmse = float(jnp.sqrt(jnp.mean(jnp.square(mu - y[:1000]))))
    print("train-subset RMSE:", rmse, "(noise std:", float(jnp.sqrt(c["noise2"])), ")")
    return sv, trace


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
