"""LatentGP tests — mirrors test/latent_gp.jl."""

import jax
import jax.numpy as jnp
import numpy as np

import abstractgps_tpu as agp
from abstractgps_tpu import distributions as dist
import pytest


@pytest.mark.slow
def test_latent_gp_poisson(key, rng):
    x = jnp.asarray(np.sort(rng.uniform(0, 5, 15)))
    f = agp.GP(agp.Matern32Kernel())
    lgp = agp.LatentGP(f, lambda f_: dist.Poisson(jnp.exp(f_)), 1e-8)
    lfx = lgp(x)
    assert len(lfx) == 15

    s = lfx.rand(key)
    assert s["f"].shape == (15,)
    assert s["y"].shape == (15,)
    assert np.all(np.asarray(s["y"]) >= 0)

    # joint density = gaussian logpdf of latents + likelihood logpdf of obs
    lp = lfx.logpdf(s)
    expected = lfx.fx.logpdf(s["f"]) + jnp.sum(
        dist.Poisson(jnp.exp(s["f"])).logpdf(s["y"])
    )
    assert np.allclose(lp, expected, rtol=1e-12)


def test_latent_gp_gaussian_consistency(key, rng):
    # with a Gaussian likelihood, joint logpdf decomposes correctly
    x = jnp.asarray(rng.standard_normal(8))
    f = agp.GP(agp.SqExponentialKernel())
    sigma = 0.3
    lgp = agp.LatentGP(f, lambda f_: dist.Normal(f_, sigma), 1e-10)
    lfx = lgp(x)
    fv = jnp.asarray(rng.standard_normal(8))
    yv = jnp.asarray(rng.standard_normal(8))
    lp = lfx.logpdf({"f": fv, "y": yv})
    import scipy.stats

    ref_f = lfx.fx.logpdf(fv)
    ref_y = np.sum(scipy.stats.norm(np.asarray(fv), sigma).logpdf(np.asarray(yv)))
    assert np.allclose(lp, ref_f + ref_y, rtol=1e-10)


def test_latent_logpdf_differentiable(rng):
    x = jnp.asarray(rng.standard_normal(8))
    y = jnp.asarray(rng.poisson(2.0, 8).astype(np.float64))
    f = agp.GP(agp.Matern52Kernel())
    lgp = agp.LatentGP(f, lambda f_: dist.Poisson(jnp.exp(f_)), 1e-8)

    def joint(fv):
        return lgp(x).logpdf({"f": fv, "y": y})

    fv = jnp.asarray(rng.standard_normal(8))
    g = jax.grad(joint)(fv)
    assert np.all(np.isfinite(g))


def test_distributions_logpdfs(rng):
    import scipy.stats as st

    y = jnp.asarray(rng.uniform(0.5, 2.0, 6))
    n = dist.Normal(jnp.asarray(0.3), jnp.asarray(1.2))
    assert np.allclose(n.logpdf(y), st.norm(0.3, 1.2).logpdf(np.asarray(y)), rtol=1e-10)
    p = dist.Poisson(jnp.asarray(2.5))
    ky = jnp.asarray([0.0, 1.0, 3.0])
    assert np.allclose(p.logpdf(ky), st.poisson(2.5).logpmf(np.asarray(ky)), rtol=1e-10)
    b = dist.Bernoulli(jnp.asarray(0.7))
    prob = 1 / (1 + np.exp(-0.7))
    assert np.allclose(b.logpdf(jnp.asarray(1.0)), np.log(prob), rtol=1e-10)
    assert np.allclose(b.logpdf(jnp.asarray(0.0)), np.log(1 - prob), rtol=1e-10)
    e = dist.Exponential(jnp.asarray(1.7))
    assert np.allclose(e.logpdf(y), st.expon(scale=1 / 1.7).logpdf(np.asarray(y)), rtol=1e-10)
    g = dist.Gamma(jnp.asarray(2.0), jnp.asarray(1.5))
    assert np.allclose(
        g.logpdf(y), st.gamma(2.0, scale=1 / 1.5).logpdf(np.asarray(y)), rtol=1e-10
    )
    ln = dist.LogNormal(jnp.asarray(0.1), jnp.asarray(0.9))
    assert np.allclose(
        ln.logpdf(y),
        st.lognorm(0.9, scale=np.exp(0.1)).logpdf(np.asarray(y)),
        rtol=1e-10,
    )
