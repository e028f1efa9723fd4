"""Shared tunnel-safe timing harness.

On remote-tunnelled devices `block_until_ready` can ack at enqueue time
and a result fetch pays seconds of transfer latency, so neither times the
device truthfully.  Instead run K *data-dependent* chained iterations
inside ONE jit (`lax.fori_loop` — a Python loop would unroll into a
compile payload that overflows the remote-compile tunnel, HTTP 413),
fetch one scalar, and linear-fit two K values to cancel the constant
dispatch+fetch overhead.

`step(c, *extra) -> c'` must thread the scalar `c` through the measured
computation (e.g. `tr + c * 1e-30`) so XLA cannot hoist iterations.
Large operands MUST ride `extra`: closure-captured arrays are embedded in
the compile payload.
"""

from __future__ import annotations

import time


def chained_time(step, extra, k, reps=3):
    """Best-of-`reps` wall time of k chained `step` iterations in one jit."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(c0, *e):
        return lax.fori_loop(0, k, lambda i, c: step(c, *e), c0)

    float(run(jnp.float32(0), *extra))  # warm (compile + first exec)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(jnp.float32(0), *extra))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(step, *extra, k1=2, k2=6):
    """Per-iteration seconds of `step`, linear-fitted over two K values.

    Sub-millisecond steps drown in dispatch/fetch noise at the default
    K's (the fit can even go to zero); when the measured delta is under
    ~10 ms the K's are scaled up so the delta spans >= ~30 ms."""
    t1 = chained_time(step, extra, k1)
    t2 = chained_time(step, extra, k2)
    if t2 - t1 < 10e-3:
        per = max((t2 - t1) / (k2 - k1), 20e-6)
        scale = min(max(int(30e-3 / (per * (k2 - k1))), 2), 64)
        k1b, k2b = k1 * scale, k2 * scale
        t1 = chained_time(step, extra, k1b)
        t2 = chained_time(step, extra, k2b)
        return max((t2 - t1) / (k2b - k1b), 1e-9)
    return max((t2 - t1) / (k2 - k1), 1e-9)
