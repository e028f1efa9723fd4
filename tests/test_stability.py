"""Trace/compile stability — the analogue of the reference's
`@inferred` type-stability and allocation testitems (`src/raster.jl:313-381`,
`src/raster_pullback.jl:256-268`): repeated same-shape calls must hit the
jit cache (one trace), and static dims must specialise separately."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dprast
from dprast.utils.testing import fixtures


def _traced_counter():
    count = {"n": 0}

    def fn(grid, *args):
        count["n"] += 1
        return dprast.raster(grid, *args)

    return fn, count


def test_no_retrace_same_shapes():
    fx = fixtures(seed=0, n_points=16, batch_size=3, n_in=3, n_out=2)
    args = tuple(jnp.asarray(v, jnp.float32) for v in fx.values())
    traced, count = _traced_counter()
    f = jax.jit(traced, static_argnums=0)
    for _ in range(3):
        f((8, 8), *args).block_until_ready()
    assert count["n"] == 1, "same-shape calls must not retrace"


def test_dims_specialise_separately():
    fx2 = fixtures(seed=0, n_points=16, batch_size=3, n_in=2, n_out=2)
    fx3 = fixtures(seed=0, n_points=16, batch_size=3, n_in=3, n_out=3)
    out2 = dprast.raster((8, 8), *fx2.values())
    out3 = dprast.raster((8, 8, 8), *fx3.values())
    assert out2.shape == (3, 8, 8)
    assert out3.shape == (3, 8, 8, 8)


def test_1d_grid_full_pipeline():
    """N_out = 1 (the reference supports any dims >= 1): forward golden
    value + all six gradients against the xla oracle."""
    pts = jnp.asarray([[0.0], [0.5]], jnp.float32)  # centers: u=2.0, 3.25
    out = dprast.raster((5,), pts, jnp.eye(1), jnp.zeros(1), backend="xla")
    np.testing.assert_allclose(np.asarray(out), [0, 0, 1.0, 0.75, 0.25],
                               atol=1e-6)
    out_m = dprast.raster((5,), pts, jnp.eye(1), jnp.zeros(1),
                          backend="matmul")
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out),
                               atol=1e-6)
    g = jnp.asarray(np.random.default_rng(0).standard_normal(5))
    pb_x = dprast.raster_pullback(g, pts, jnp.eye(1), jnp.zeros(1),
                                  backend="xla")
    pb_m = dprast.raster_pullback(g, pts, jnp.eye(1), jnp.zeros(1),
                                  backend="matmul")
    for a, b in zip(pb_x, pb_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_jit_second_call_fast():
    """The compiled path must be reusable (AOT-style): lower+compile once,
    call many times."""
    fx = fixtures(seed=1, n_points=32, batch_size=2, n_in=3, n_out=2)
    args = tuple(jnp.asarray(v, jnp.float32) for v in fx.values())
    f = jax.jit(lambda *a: dprast.raster((16, 16), *a))
    lowered = f.lower(*args)
    compiled = lowered.compile()
    r1 = compiled(*args)
    r2 = compiled(*args)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))


def test_composes_with_remat_and_scan():
    """raster must compose with jax.checkpoint and lax.scan — the
    building blocks of production training loops."""
    fx = fixtures(seed=3, n_points=20, batch_size=2, n_in=3, n_out=2)
    args = tuple(jnp.asarray(v, jnp.float32) for v in fx.values())

    @jax.checkpoint
    def render(pts):
        return dprast.raster((8, 8), pts, *args[1:])

    def loss(pts):
        return jnp.sum(render(pts) ** 2)

    g = jax.grad(loss)(args[0])
    g_ref = jax.grad(lambda p: jnp.sum(
        dprast.raster((8, 8), p, *args[1:]) ** 2))(args[0])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-6)

    def step(pts, _):
        val, gr = jax.value_and_grad(loss)(pts)
        return pts - 1e-3 * gr, val

    pts_final, losses = jax.lax.scan(step, args[0], None, length=5)
    assert losses.shape == (5,)
    assert float(losses[-1]) <= float(losses[0])
