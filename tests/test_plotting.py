"""Plotting parity tests (reference: test/util/plotting.jl — recipe output
shapes/behaviour, incl. ribbon_scale validation and NaN-separated samples)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import abstractgps_tpu as agp
from abstractgps_tpu.utils.plotting import plot_gp, sampleplot


@pytest.fixture
def fx(key):
    x = jnp.linspace(0.0, 5.0, 30)
    return agp.GP(agp.Matern32Kernel())(x, 0.1)


def test_plot_gp_draws_mean_and_ribbon(fx):
    fig, ax = plt.subplots()
    plot_gp(fx, ax=ax, ribbon_scale=2.0)
    assert len(ax.lines) == 1
    assert len(ax.collections) == 1  # the ribbon
    line_y = ax.lines[0].get_ydata()
    np.testing.assert_allclose(line_y, np.asarray(fx.mean()), atol=1e-6)
    plt.close(fig)


def test_plot_gp_rejects_negative_ribbon(fx):
    with pytest.raises(ValueError):
        plot_gp(fx, ribbon_scale=-1.0)


def test_plot_bare_gp_requires_x():
    f = agp.GP(agp.SEKernel())
    with pytest.raises(ValueError):
        plot_gp(f)
    fig, ax = plt.subplots()
    plot_gp(f, jnp.linspace(0, 1, 5), ax=ax)  # with x: ok (1e-9 jitter)
    plt.close(fig)


def test_sampleplot_nan_separated(fx, key):
    fig, ax = plt.subplots()
    sampleplot(fx, key=key, samples=4, ax=ax)
    y = ax.lines[0].get_ydata()
    # one NaN separator per sample, 30 points each
    assert y.shape[0] == 4 * 31
    assert np.isnan(y[30]) and np.isnan(y[-1])
    assert np.isfinite(y[:30]).all()
    plt.close(fig)
