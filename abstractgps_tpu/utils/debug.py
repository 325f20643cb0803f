"""Test-mode sanitizers: NaN trapping and checkify guards (SURVEY §5).

The reference's only sanitizer analogues are Julia bounds checking and the
PSD guards in its TestUtils (``eigmin(cov) > −atol``,
src/util/TestUtils.jl:104,164). The TPU-native plan (SURVEY §5 "race
detection / sanitizers") adds two runtime modes on top of the library's
always-on guards (PSD jitter policy, NaN→-inf logpdf rejection):

- ``debug_mode()``: a context manager enabling ``jax_debug_nans`` and
  ``jax_enable_checks`` — any NaN produced inside a jitted region re-runs
  op-by-op and raises at the producing primitive. Wired into the test
  suite as the ``sanitize`` fixture (tests/conftest.py).
- ``checked(fn)``: a checkify wrapper over a public entry point that adds
  float (NaN/inf) and index OOB checks and raises ``JaxRuntimeError`` with
  the failing check's location instead of silently propagating NaN. Use in
  integration smoke tests and when debugging user models.
"""

from __future__ import annotations

import contextlib
import functools

import jax
from jax.experimental import checkify

__all__ = ["debug_mode", "checked"]


@contextlib.contextmanager
def debug_mode(nans: bool = True, checks: bool = True):
    """Enable JAX's NaN debugger / internal checks for the enclosed scope.

    NaN trapping changes compilation (disables some fusions) — test/debug
    only, never in benchmarks.
    """
    old_nans = jax.config.jax_debug_nans
    old_checks = jax.config.jax_enable_checks
    try:
        if nans:
            jax.config.update("jax_debug_nans", True)
        if checks:
            jax.config.update("jax_enable_checks", True)
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_enable_checks", old_checks)


def checked(fn, *, errors=checkify.float_checks | checkify.index_checks):
    """Wrap ``fn`` so non-finite intermediates / OOB indexing raise.

    Returns a function with ``fn``'s signature that runs under
    ``checkify.checkify`` and calls ``.throw()`` on the captured error —
    the functional error value becomes an exception at the call boundary,
    which is the right surface for a user-facing sanitizer.
    """
    cfn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapped
