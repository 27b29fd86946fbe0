"""Profiling helpers: JAX profiler traces + slope-based microbenchmarks.

The reference has no tracing subsystem (its only timing is std::chrono in
bench.cpp; SURVEY.md section 5). On TPU the equivalents are (a) JAX
profiler traces viewable in XProf/TensorBoard and (b) the on-device
scan-slope timer this repo's benchmarks use — per-call wall clock on a
tunneled runtime is dominated by a multi-ms RPC floor, so an op's cost is
measured as the slope of one jitted lax.scan between two loop lengths
(methodology notes: benchmarks/NOTES.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "op_seconds", "measure_samples_per_s"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/chowdsp_fft_tpu_trace"):
    """Context manager capturing a JAX profiler trace (XProf format).

    Example::

        with profiling.trace("/tmp/tr"):
            jax.block_until_ready(jax.jit(cf.rfft_packed)(x))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def op_seconds(
    body: Callable,
    init,
    iters_pair: tuple[int, int] = (16, 272),
    repeats: int = 3,
) -> float:
    """Per-iteration seconds of ``body`` (a carry -> carry function whose
    output depends on the op under test), measured as the scan-slope
    between two on-device loop lengths, min-of-``repeats``.

    Carry-construction pitfalls that have produced fictional numbers
    (benchmarks/NOTES.md):
    - a carry that consumes only ``out[0]`` lets XLA dead-code-eliminate
      most of a conv/elementwise body — feed the FULL output back
      (``carry + out * 1e-30``, padding if shapes differ);
    - a ``(B, 1) -> (B, N)`` broadcast in the carry costs ~1ms/iter on
      wide rows (N >= 2^19) and swamps the op under test."""

    ts = []
    for iters in iters_pair:

        @jax.jit
        def loop(v):
            def step(c, _):
                return body(c), None

            c, _ = jax.lax.scan(step, v, None, length=iters)
            return jax.tree_util.tree_map(lambda a: a.sum(), c)

        jax.tree_util.tree_map(float, loop(init))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(float, loop(init))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    lo, hi = iters_pair
    return (ts[1] - ts[0]) / (hi - lo)


def measure_samples_per_s(body: Callable, init, samples_per_iter: int, **kw) -> float:
    """Throughput wrapper over :func:`op_seconds`."""
    return samples_per_iter / op_seconds(body, init, **kw)
