"""Example smoke tests: every example workflow runs end to end in smoke
mode (the reference runs its examples as documentation builds on CI)."""

import sys

import pytest


@pytest.fixture(autouse=True)
def _examples_on_path(monkeypatch):
    monkeypatch.syspath_prepend("examples")
    monkeypatch.setattr(sys, "argv", ["test"])


@pytest.mark.slow
def test_intro_1d_smoke():
    import intro_1d

    theta = intro_1d.main(smoke=True)
    assert float(theta["ell"]) > 0


@pytest.mark.slow
def test_mauna_loa_smoke():
    import mauna_loa

    rmse = mauna_loa.main(smoke=True)
    assert rmse < 50.0  # loose: smoke mode subsamples heavily


@pytest.mark.slow
def test_deep_kernel_learning_smoke():
    import deep_kernel_learning

    rmse = deep_kernel_learning.main(smoke=True)
    assert rmse < 2.0


@pytest.mark.slow
def test_parametric_heteroscedastic_smoke():
    import parametric_heteroscedastic

    inside = parametric_heteroscedastic.main(smoke=True)
    assert inside > 0.9


@pytest.mark.slow
def test_sparse_vfe_50k_smoke():
    import sparse_vfe_50k

    sv, trace = sparse_vfe_50k.main(smoke=True)
    import numpy as np

    assert np.isfinite(np.asarray(trace)).all()
    assert float(trace[-1]) > float(trace[0])


@pytest.mark.slow
def test_latent_poisson_nuts_smoke():
    import latent_poisson_nuts

    mcmc = latent_poisson_nuts.main(smoke=True)
    assert float(mcmc.accept_prob.mean()) > 0.2
