"""Tile-binned large-grid backend vs the oracle, through the Pallas
interpreter on CPU.  Exercises the parts the small-grid kernels never see:
tile-straddling stencils, candidate dedup, empty tiles, segment padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dprast
from dprast.ops import core, splat_tiled
from dprast.utils.testing import fixtures

GRID = (256, 256)


def _check(args, grid=GRID, chunk=128, seed=7):
    args = tuple(jnp.asarray(v, jnp.float32) for v in args)
    out_t = splat_tiled.raster_fwd(grid, *args, chunk=chunk)
    out_x = core.raster_fwd(grid, *args)
    scale = max(float(jnp.max(jnp.abs(out_x))), 1.0)
    np.testing.assert_allclose(np.asarray(out_t) / scale,
                               np.asarray(out_x) / scale, atol=1e-5)
    g = jnp.asarray(np.random.default_rng(seed).standard_normal(
        out_x.shape), jnp.float32)
    pb_t = splat_tiled.raster_pullback(grid, *args, g, chunk=chunk)
    pb_x = core.raster_pullback(grid, *args, g)
    for name, a, b in zip(pb_t._fields, pb_t, pb_x):
        # 2e-5: the bf16-split error (~2^-18/term) random-walks over
        # many-point sums; dense single-tile cases sit just above 1e-5.
        sc = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   atol=2e-5, err_msg=f"grad {name}")


def test_random_cloud():
    fx = fixtures(seed=3, n_points=400, batch_size=3, n_in=3, n_out=2)
    _check(tuple(fx.values()))


def test_tile_straddling_stencils():
    """Points whose 2x2 stencil crosses a 128-tile boundary (in y, in x,
    and in both) must sum their split contributions exactly."""
    h, w = GRID
    # u = (q+1)*n/2 - 1/2; pick u just below tile boundaries 127.x, 128.x
    us = np.array([
        [127.3, 64.0],   # y-straddle
        [64.0, 127.7],   # x-straddle
        [127.5, 127.5],  # corner straddle (4 tiles)
        [127.9999, 127.0001],
        [0.2, 0.2],      # grid-edge partial drop
        [254.8, 254.8],  # far corner partial drop
    ])
    q = (us + 0.5) / (np.asarray(GRID) / 2) - 1.0
    b = 2
    args = (q, np.tile(np.eye(2), (b, 1, 1)), np.zeros((b, 2)),
            np.zeros(b), np.full(b, 2.0), np.arange(1.0, 7.0))
    _check(args)


def test_empty_and_dense_tiles():
    """All points concentrated in one tile; every other tile empty."""
    rng = np.random.default_rng(0)
    q = rng.uniform(-0.05, 0.05, (300, 2))  # all in the central tiles
    args = (q, np.eye(2)[None], np.zeros((1, 2)), np.full(1, 0.3),
            np.ones(1), rng.uniform(0.5, 2.0, 300))
    _check(args)


def test_all_points_out_of_grid():
    q = np.full((50, 2), 7.5)
    args = (q, np.eye(2)[None], np.zeros((1, 2)), np.zeros(1),
            np.ones(1), np.ones(50))
    args = tuple(jnp.asarray(v, jnp.float32) for v in args)
    out = splat_tiled.raster_fwd(GRID, *args, chunk=128)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_via_public_api():
    fx = fixtures(seed=9, n_points=100, batch_size=2, n_in=2, n_out=2)
    args = tuple(jnp.asarray(v, jnp.float32) for v in fx.values())
    out = dprast.raster(GRID, *args, backend="tiled")
    ref = dprast.raster(GRID, *args, backend="xla")
    sc = max(float(jnp.max(jnp.abs(ref))), 1.0)
    np.testing.assert_allclose(np.asarray(out) / sc, np.asarray(ref) / sc,
                               atol=2e-5)

    def loss(pts):
        return jnp.sum(jnp.sin(dprast.raster(GRID, pts, *args[1:],
                                             backend="tiled")))

    g_t = jax.grad(loss)(args[0])
    assert np.all(np.isfinite(np.asarray(g_t)))


def test_3d_volume():
    """3D->3D tiled rasterisation vs oracle, incl. all six grads."""
    fx = fixtures(seed=5, n_points=150, batch_size=2, n_in=3, n_out=3)
    grid = (16, 32, 128)
    _check(tuple(fx.values()), grid=grid, chunk=64)


def test_3d_tile_straddle():
    """Stencils crossing z/y tile boundaries (tile (8,16,128))."""
    us = np.array([
        [7.5, 8.0, 64.0],    # z-straddle
        [4.0, 15.5, 64.0],   # y-straddle
        [7.5, 15.5, 64.0],   # zy-corner straddle
        [0.1, 0.1, 0.1],     # grid-edge partial drop
    ])
    grid = (16, 32, 128)
    q = (us + 0.5) / (np.asarray(grid) / 2) - 1.0
    args = (q, np.eye(3)[None], np.zeros((1, 3)), np.zeros(1),
            np.ones(1), np.arange(1.0, 5.0))
    _check(args, grid=grid, chunk=64)


def test_rejects_unaligned_grid():
    fx = fixtures(seed=1, n_points=10, batch_size=2, n_in=2, n_out=2)
    with pytest.raises(ValueError, match="tiled"):
        dprast.raster((96, 96), *fx.values(), backend="tiled")


def test_supported_rejects_untileable_3d_without_crashing():
    # tz = gz > 128 with gy underflow used to ZeroDivisionError through
    # dispatch.resolve (ADVICE r1); must cleanly report unsupported.
    assert not splat_tiled.supported(3, (130, 128, 128))
    assert not splat_tiled.supported(3, (150, 150, 150))
    from dprast.ops import dispatch
    assert dispatch.resolve("auto", 3, (130, 128, 128)) in ("xla", "matmul")
