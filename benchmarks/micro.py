"""Microbenchmarks that drive kernel-scheme decisions (TPU v5e).

Timing uses the chained-iteration trick from bench.py: K data-dependent
iterations inside one jit, scalar fetch, linear fit over two K values to
cancel dispatch+fetch constants (the remote tunnel acks enqueue, so
block_until_ready alone is not trustworthy).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


from benchmarks.timing import per_iter as _shared_per_iter


def per_iter(step, args, k1=2, k2=8):
    return _shared_per_iter(step, *args, k1=k1, k2=k2)


def bench_sort(b=64, p=100_000, n_payload=3):
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 257, (b, p)), jnp.int32)
    pays = [jnp.asarray(rng.standard_normal((b, p)), jnp.float32)
            for _ in range(n_payload)]

    def step(c, keys, *pays):
        k2 = keys + (c.astype(jnp.int32) % 2)
        out = lax.sort((k2,) + pays, dimension=1, num_keys=1)
        return c + out[1][0, 0]

    t = per_iter(step, (keys, *pays))
    print(f"sort    b={b} p={p} payloads={n_payload}: {t*1e3:8.2f} ms")
    return t


def bench_gather(b=64, p=100_000, w=4):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.permutation(np.tile(np.arange(p), (b, 1)),
                                      axis=1), jnp.int32)
    val = jnp.asarray(rng.standard_normal((b, p, w)), jnp.float32)

    def step(c, idx, val):
        i2 = jnp.abs(idx - (c.astype(jnp.int32) % 2))
        out = jnp.take_along_axis(val, i2[..., None], axis=1)
        return c + out[0, 0, 0]

    t = per_iter(step, (idx, val))
    print(f"gather  b={b} p={p} width={w}: {t*1e3:8.2f} ms")
    return t


def bench_scatter_add(b=64, p=100_000, w=4):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.permutation(np.tile(np.arange(p), (b, 1)),
                                      axis=1), jnp.int32)
    val = jnp.asarray(rng.standard_normal((b, p, w)), jnp.float32)

    def step(c, idx, val):
        i2 = jnp.abs(idx - (c.astype(jnp.int32) % 2))
        out = jnp.zeros_like(val).at[
            jnp.arange(b)[:, None], i2, :].add(val)
        return c + out[0, 0, 0]

    t = per_iter(step, (idx, val))
    print(f"scatter b={b} p={p} width={w}: {t*1e3:8.2f} ms")
    return t


def bench_dot(m=2048, k=2048, n=2048, dtype="bf16", reps=8):
    rng = np.random.default_rng(0)
    if dtype == "int8":
        a = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        bm = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        pref = jnp.int32
        prec = None
    else:
        dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        a = jnp.asarray(rng.standard_normal((m, k)), dt)
        bm = jnp.asarray(rng.standard_normal((k, n)), dt)
        pref = jnp.float32
        prec = (lax.Precision.HIGHEST if dtype == "f32_highest"
                else lax.Precision.DEFAULT)

    def step(c, a, bm):
        if dtype == "int8":
            a2 = a + (c * 1e-30).astype(jnp.int8)
            out = lax.dot_general(a2, bm, (((1,), (0,)), ((), ())),
                                  preferred_element_type=pref)
            return c + out[0, 0].astype(jnp.float32)
        a2 = a + (c * 1e-30).astype(a.dtype)
        out = lax.dot_general(a2, bm, (((1,), (0,)), ((), ())),
                              precision=prec, preferred_element_type=pref)
        return c + out[0, 0].astype(jnp.float32)

    t = per_iter(step, (a, bm), k1=8, k2=32)
    flops = 2 * m * k * n
    print(f"dot {dtype:12s} {m}x{k}x{n}: {t*1e6:8.1f} us  "
          f"{flops/t/1e12:7.1f} TFLOP/s")
    return t


print = functools.partial(print, flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("platform:", jax.default_backend())
    if which in ("all", "dot"):
        for dt in ("bf16", "f32_highest", "int8"):
            bench_dot(dtype=dt)
        # small-K shapes resembling the splat factor matmuls (H,2C)@(2C,W)
        for dt in ("bf16", "int8"):
            bench_dot(m=128, k=1024, n=128, dtype=dt)
    if which in ("all", "sort"):
        for np_ in (1, 3, 5):
            bench_sort(n_payload=np_)
    if which in ("all", "move"):
        bench_gather()
        bench_gather(w=8)
        bench_scatter_add()
