"""Sanitizer wiring (SURVEY §5): jax_debug_nans fixture + checkify guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import abstractgps_tpu as agp
from abstractgps_tpu.utils.debug import checked, debug_mode


def test_clean_flow_passes_under_sanitizer(sanitize, rng):
    """The standard logpdf→posterior→predict flow must be NaN-free under
    jax_debug_nans (regression net for silent NaN producers)."""
    x = jnp.asarray(rng.uniform(size=(32, 2)))
    y = jnp.asarray(rng.normal(size=(32,)))
    fx = agp.GP(agp.Matern52Kernel())(x, 0.1)
    lp = fx.logpdf(y)
    post = agp.posterior(fx, y)
    mu, var = post.mean_and_var(x[:8])
    assert np.isfinite(float(lp))
    assert np.isfinite(np.asarray(mu)).all()


def test_debug_mode_traps_nan():
    with debug_mode():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda a: jnp.log(a) * 0.0 + jnp.sqrt(a))(
                jnp.asarray(-1.0)
            ).block_until_ready()
    # and it restores the config afterwards
    assert not jax.config.jax_debug_nans


def test_checked_logpdf_raises_on_nonfinite_input(rng):
    x = jnp.asarray(rng.uniform(size=(16, 1)))
    y = jnp.asarray(rng.normal(size=(16,))).at[3].set(jnp.nan)

    def logpdf(yy):
        return agp.GP(agp.SEKernel())(x, 0.1).logpdf(yy)

    with pytest.raises(Exception) as ei:
        checked(logpdf)(y)
    assert "nan" in str(ei.value).lower()
    # clean input passes through with the same value
    y2 = jnp.asarray(rng.normal(size=(16,)))
    np.testing.assert_allclose(float(checked(logpdf)(y2)),
                               float(logpdf(y2)), rtol=1e-12)
