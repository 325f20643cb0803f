"""Test configuration: 8 virtual CPU devices + float64 for golden accuracy.

Mirrors the reference's test strategy (SURVEY §4): correctness oracles run in
double precision (the reference leans on Float64 LAPACK); TPU production runs
are f32/bf16. The 8-device CPU mesh is the multi-chip stand-in for
collective-path tests (xla_force_host_platform_device_count).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# The container env pins JAX_PLATFORMS=axon (the real-TPU tunnel); tests must
# run on the virtual CPU mesh, so override unconditionally before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)


@pytest.fixture
def sanitize():
    """Opt-in sanitizer fixture (SURVEY §5): run the test body under
    jax_debug_nans + jax_enable_checks so any NaN produced inside jit
    raises at the producing primitive instead of propagating."""
    from abstractgps_tpu.utils.debug import debug_mode

    with debug_mode():
        yield
