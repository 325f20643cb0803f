"""Example 2: Deep kernel learning — MLP feature extractor composed with an
SE kernel, trained jointly by Adam on the exact log marginal likelihood
(reference: examples/2-deep-kernel-learning/script.jl; kernel at :59 is
``FunctionTransform(nn)`` ∘ SE scaled kernel, optimizer loop at :91-115).

TPU-native: the MLP is a plain parameter pytree inside a
``FunctionTransform``; gradients flow through the gram build into the MLP
weights in the same jitted step.

Run: python examples/deep_kernel_learning.py [--smoke]
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


def mlp_init(key, sizes=(1, 16, 16, 2)):
    params = []
    for kin, kout in zip(sizes[:-1], sizes[1:]):
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (kin, kout)) * jnp.sqrt(2.0 / kin)
        params.append({"w": w, "b": jnp.zeros((kout,))})
    return params


def mlp_apply(params, x):
    h = x
    for layer in params[:-1]:
        h = jnp.tanh(h @ layer["w"] + layer["b"])
    last = params[-1]
    return h @ last["w"] + last["b"]


def make_data(key, n=100):
    # the reference uses a noisy sinc-like 1-D target
    kx, ky = jax.random.split(key)
    x = jnp.sort(jax.random.uniform(kx, (n,)) * 10.0 - 5.0)
    y = jnp.sinc(x) + 0.1 * jax.random.normal(ky, (n,))
    return x[:, None], y


def build_fx(theta, x):
    # deep kernel: SE ∘ FunctionTransform(mlp)  (script.jl:59)
    deep = agp.compose(
        agp.with_lengthscale(agp.SEKernel(), theta["ell"]),
        agp.FunctionTransform(theta["mlp"], mlp_apply),
    )
    kernel = theta["s2"] * deep
    return agp.GP(kernel)(x, theta["noise2"])


def main(smoke=False):
    key = jax.random.PRNGKey(3)
    kd, km = jax.random.split(key)
    x, y = make_data(kd, n=30 if smoke else 100)

    theta0 = {
        "mlp": mlp_init(km),
        "ell": P.positive(1.0),
        "s2": P.positive(1.0),
        "noise2": P.positive(0.05),
    }
    loss = T.nlml(build_fx, x, y)
    print("initial -lml:", float(loss(theta0)))
    res = T.fit(loss, theta0, num_steps=30 if smoke else 1500,
                learning_rate=1e-2)
    print("final -lml:", float(res.history[-1]))
    assert res.history[-1] < res.history[0]

    theta = P.constrain(res.params)
    post = build_fx(theta, x).posterior(y)
    xg = jnp.linspace(-5.0, 5.0, 20 if smoke else 300)[:, None]
    mu, var = post.mean_and_var(xg)
    rmse = float(jnp.sqrt(jnp.mean((mu - jnp.sinc(xg[:, 0])) ** 2)))
    print(f"RMSE vs true sinc on grid: {rmse:.4f}")

    if not smoke:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(9, 5))
        ax.plot(np.asarray(x[:, 0]), np.asarray(y), "kx")
        ax.plot(np.asarray(xg[:, 0]), np.asarray(mu), "C0")
        s = np.sqrt(np.asarray(var))
        ax.fill_between(np.asarray(xg[:, 0]), np.asarray(mu) - 2 * s,
                        np.asarray(mu) + 2 * s, alpha=0.3)
        fig.savefig("examples/deep_kernel_learning.png", dpi=120)
        print("wrote examples/deep_kernel_learning.png")
    return rmse


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
