"""Diagnostics tests: R̂/ESS on targets with known behaviour."""

import numpy as np

from abstractgps_tpu.inference.mcmc.diagnostics import ess, rhat


def test_rhat_iid_near_one():
    rng = np.random.default_rng(0)
    draws = rng.normal(size=(4, 2000))
    r = rhat(draws)
    assert 0.99 < r < 1.01, r


def test_rhat_detects_nonconvergence():
    rng = np.random.default_rng(1)
    draws = rng.normal(size=(4, 1000))
    draws[0] += 5.0  # one chain stuck elsewhere
    assert rhat(draws) > 1.5


def test_ess_iid_near_total():
    rng = np.random.default_rng(2)
    m, n = 4, 4000
    draws = rng.normal(size=(m, n))
    e = ess(draws)
    assert 0.7 * m * n < e < 1.3 * m * n, e


def test_ess_ar1_matches_theory():
    # AR(1) with coefficient φ: τ = (1+φ)/(1−φ)
    rng = np.random.default_rng(3)
    phi = 0.9
    m, n = 4, 20000
    draws = np.zeros((m, n))
    eps = rng.normal(size=(m, n)) * np.sqrt(1 - phi**2)
    for t in range(1, n):
        draws[:, t] = phi * draws[:, t - 1] + eps[:, t]
    tau_true = (1 + phi) / (1 - phi)  # = 19
    e = ess(draws)
    np.testing.assert_allclose(m * n / e, tau_true, rtol=0.3)
