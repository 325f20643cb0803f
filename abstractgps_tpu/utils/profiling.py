"""Tracing + roofline accounting (SURVEY §5 "tracing/profiling").

The reference has no profiler hooks; the BASELINE plan calls for
``jax.profiler`` traces plus per-kernel roofline accounting against
speed-of-light FLOPs. ``trace`` wraps the JAX profiler (view with
TensorBoard/XProf); ``roofline`` turns a measured wall time into achieved
FLOP/s and fraction-of-peak for the two GP hot ops.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax

__all__ = ["trace", "timed", "roofline", "gram_flops", "cholesky_flops",
           "TPU_V5E_PEAK_F32"]

# v5e MXU: ~197 TFLOP/s bf16; exact-f32 (HIGHEST / bf16x6) ≈ 1/4 of that,
# bf16x3 ("high") ≈ 1/2. We account against the f32-exact roof by default.
TPU_V5E_PEAK_F32 = 49e12


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace("/tmp/jax-trace"): ...`` → profile for TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(out: dict, key: str = "seconds"):
    """Measure a block's wall time with a device sync at the end."""
    t0 = time.perf_counter()
    yield
    # sync whatever is outstanding on the default device
    jax.device_put(0.0).block_until_ready()
    out[key] = time.perf_counter() - t0


def gram_flops(n: int, m: int, d: int) -> float:
    """FLOPs for an (n×m) gram tile over d dims: the 2·n·m·d MXU matmul
    dominates (norms/elementwise are O(n·m))."""
    return 2.0 * n * m * d


def cholesky_flops(n: int) -> float:
    """N³/3 multiply-adds → 2·N³/6 = N³/3 FLOPs (standard convention)."""
    return n**3 / 3.0


@dataclass
class Roofline:
    seconds: float
    flops: float
    achieved: float       # FLOP/s
    peak: float
    fraction_of_peak: float

    def __str__(self):
        return (f"{self.achieved/1e12:.2f} TFLOP/s "
                f"({100*self.fraction_of_peak:.1f}% of "
                f"{self.peak/1e12:.0f} TFLOP/s roof)")


def roofline(flops: float, seconds: float, peak: float = TPU_V5E_PEAK_F32) -> Roofline:
    achieved = flops / seconds
    return Roofline(seconds, flops, achieved, peak, achieved / peak)
