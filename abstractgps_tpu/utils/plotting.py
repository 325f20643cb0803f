"""Plotting parity layer (matplotlib).

Reference: Plots.jl recipes at src/util/plotting.jl:1-132 —
``plot(x, fx)`` draws the posterior mean with a ``ribbon_scale``·std ribbon
computed from ``mean_and_var`` (:3-16); ``sampleplot`` draws N joint
samples flattened into one NaN-separated series (:104-132, with 1e-9
jitter for bare AbstractGPs at :118). Matplotlib is imported lazily so the
core library stays import-light on TPU workers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["plot_gp", "sampleplot"]


def _project(fx_or_f, x):
    """Accept a FiniteGP or a bare (AbstractGP, x) pair like the recipes."""
    from ..models.finite_gp import FiniteGP
    from ..models.gp import AbstractGP

    if isinstance(fx_or_f, FiniteGP):
        return fx_or_f
    if isinstance(fx_or_f, AbstractGP):
        if x is None:
            raise ValueError("plotting a bare GP requires x")
        # bare AbstractGP gets 1e-9 jitter (src/util/plotting.jl:118)
        return fx_or_f(x, 1e-9)
    raise TypeError(f"cannot plot {type(fx_or_f)!r}")


def plot_gp(fx, x=None, *, ax=None, ribbon_scale: float = 1.0, color="C0",
            label=None, **line_kwargs):
    """Posterior mean ± ``ribbon_scale``·std ribbon (src/util/plotting.jl:3-16).

    ``fx`` is a FiniteGP (or a bare GP with explicit ``x``). Plots against
    the first input dimension.
    """
    import matplotlib.pyplot as plt

    if ribbon_scale < 0:
        raise ValueError("ribbon_scale must be non-negative")
    fx = _project(fx, x)
    xs = np.asarray(fx.x)[:, 0]
    order = np.argsort(xs)
    m, v = (np.asarray(a) for a in fx.marginals())
    if ax is None:
        ax = plt.gca()
    ax.plot(xs[order], m[order], color=color, label=label, **line_kwargs)
    ax.fill_between(
        xs[order],
        (m - ribbon_scale * v)[order],
        (m + ribbon_scale * v)[order],
        color=color,
        alpha=0.3,
        linewidth=0,
    )
    return ax


def sampleplot(fx, x=None, *, key=None, samples: int = 1, ax=None,
               color="C0", alpha=0.35, **line_kwargs):
    """N joint samples as one NaN-separated line (src/util/plotting.jl:104-132)."""
    import matplotlib.pyplot as plt

    fx = _project(fx, x)
    if key is None:
        key = jax.random.PRNGKey(0)
    xs = np.asarray(fx.x)[:, 0]
    order = np.argsort(xs)
    S = np.asarray(fx.rand(key, samples))  # (N, samples)
    n = xs.shape[0]
    # flatten to a single NaN-separated series, as the reference recipe does
    x_flat = np.concatenate(
        [np.concatenate([xs[order], [np.nan]]) for _ in range(samples)]
    )
    y_flat = np.concatenate(
        [np.concatenate([S[order, j], [np.nan]]) for j in range(samples)]
    )
    if ax is None:
        ax = plt.gca()
    ax.plot(x_flat, y_flat, color=color, alpha=alpha, **line_kwargs)
    return ax
