"""Profiling / tracing hooks (SURVEY §5: the reference has none; this is
the promised small harness around `jax.profiler`).

Usage:

    from dprast.utils import profiling

    with profiling.trace("/tmp/dprast-trace"):      # open in XProf/TensorBoard
        out = dprast.raster(grid, pts, rot, tr)

    with profiling.annotate("fit-step"):            # named trace region
        loss, grads = step(...)

    ms = profiling.time_fn(lambda c: raster_step(c), iters=8)
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in XProf / TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(step_fn, iters: int = 8, warmup: int = 1) -> float:
    """Milliseconds per iteration of `step_fn(carry) -> carry`-shaped work.

    Chains data-dependent dispatches and linear-fits two iteration counts,
    which stays truthful on remote-tunnelled devices where
    `block_until_ready` can acknowledge at enqueue time (see bench.py).
    """
    f = jax.jit(step_fn)

    def chained(k):
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(k):
            c = f(c)
        float(jnp.ravel(c)[0])
        return time.perf_counter() - t0

    for _ in range(warmup):
        float(jnp.ravel(f(jnp.float32(0)))[0])
    k1, k2 = max(1, iters // 4), iters
    b1 = min(chained(k1) for _ in range(2))
    b2 = min(chained(k2) for _ in range(2))
    return max((b2 - b1) / (k2 - k1), 0.0) * 1e3
