"""Utilities: plotting parity layer and downstream conformance suites."""

from . import test_utils
from .plotting import plot_gp, sampleplot

__all__ = ["plot_gp", "sampleplot", "test_utils"]
