"""Utilities: plotting, conformance suites, checkpointing, profiling."""

from . import checkpoint, debug, profiling, test_utils
from .plotting import plot_gp, sampleplot

__all__ = ["plot_gp", "sampleplot", "test_utils", "checkpoint", "profiling", "debug"]
