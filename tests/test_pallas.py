"""Pallas-kernel-vs-oracle agreement (the `cuda_cpu_agree` analogue,
reference `test/util.jl:1-34`, `test/cuda.jl:2-74`), run through the Pallas
interpreter on CPU so it is exercised in every environment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dprast
from dprast.ops import pallas_splat, splat_matmul
from dprast.utils.testing import fixtures

GRID = (16, 16)


def _fx(n_points=300, batch=5, n_in=3, seed=7):
    fx = fixtures(seed=seed, n_points=n_points, batch_size=batch, n_in=n_in,
                  n_out=2)
    return {k: jnp.asarray(v, jnp.float32) for k, v in fx.items()}


@pytest.mark.parametrize("n_in", [2, 3])
@pytest.mark.parametrize("n_points,chunk", [(300, 128), (64, 128), (128, 64)])
def test_pallas_fwd_bwd_agree_with_matmul(n_in, n_points, chunk):
    """Uneven + exact chunking, same-dim + projection."""
    fx = _fx(n_points=n_points, n_in=n_in)
    args = tuple(fx.values())
    out_p = pallas_splat.raster_fwd(GRID, *args, chunk=chunk)
    out_m = splat_matmul.raster_fwd(GRID, *args)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_m),
                               rtol=1e-5, atol=1e-4)
    g = jnp.asarray(
        np.random.default_rng(1).standard_normal(out_m.shape), jnp.float32)
    pb_p = pallas_splat.raster_pullback(GRID, *args, g, chunk=chunk)
    pb_m = splat_matmul.raster_pullback(GRID, *args, g)
    for name, a, b in zip(pb_p._fields, pb_p, pb_m):
        # tolerance = the 1e-5 parity contract (split mode sits at ~4e-6)
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=1e-5, err_msg=f"grad {name}")


def test_pallas_via_public_api_grad():
    fx = _fx()
    args = tuple(fx.values())

    def loss(*a):
        return jnp.sum(jnp.sin(dprast.raster(GRID, *a, backend="pallas")))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(dprast.raster(GRID, *a, backend="matmul")))

    g_p = jax.grad(loss, argnums=(0, 1, 2))(*args)
    g_m = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b in zip(g_p, g_m):
        # pallas computes in f32 while the conftest runs the reference in
        # f64 — compare at f32-roundoff scale, normalised per array.
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-4)


def test_pallas_rejects_3d():
    fx = _fx()
    with pytest.raises(ValueError, match="pallas"):
        dprast.raster((8, 8, 8), fx["points"], jnp.eye(3), jnp.zeros(3),
                      backend="pallas")
