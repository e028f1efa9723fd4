"""Every jax backend must agree with the independent numpy float64 oracle
(forward + all six gradients).  This is the repo's strongest statement of
the reference-parity contract: the oracle is a direct loop transcription of
the reference semantics (`src/raster.jl:36-108`,
`src/raster_pullback.jl:39-81`) sharing no code with the jax paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from dprast.ops import core, dispatch
from dprast.utils.testing import (fixtures, raster_numpy,
                                  raster_pullback_numpy)


@pytest.mark.parametrize("backend", ["xla", "matmul", "binned"])
@pytest.mark.parametrize("n_in,n_out", [(2, 2), (3, 2), (3, 3)])
def test_fwd_matches_numpy_oracle(backend, n_in, n_out):
    fx = fixtures(seed=11, n_points=200, batch_size=4, n_in=n_in,
                  n_out=n_out)
    grid = (12,) * n_out
    want = raster_numpy(grid, *fx.values())
    args = tuple(jnp.asarray(v, jnp.float64) for v in fx.values())
    got = np.asarray(dispatch.fwd_fn(backend)(grid, *args))
    # normalise: kernels compute in f32, so absolute tolerance must sit at
    # f32-roundoff relative to the image scale (still well under 1e-5).
    scale = max(np.max(np.abs(want)), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-5)


@pytest.mark.parametrize("backend", ["xla", "matmul", "binned"])
@pytest.mark.parametrize("n_in,n_out", [(3, 2), (3, 3)])
def test_bwd_matches_numpy_oracle(backend, n_in, n_out):
    fx = fixtures(seed=12, n_points=150, batch_size=4, n_in=n_in,
                  n_out=n_out)
    grid = (10,) * n_out
    g = np.random.default_rng(3).standard_normal((4,) + grid)
    want = raster_pullback_numpy(grid, *fx.values(), g)
    args = tuple(jnp.asarray(v, jnp.float64) for v in fx.values())
    got = dispatch.bwd_fn(backend)(grid, *args, jnp.asarray(g))
    for name in want:
        w = want[name]
        scale = max(np.max(np.abs(w)), 1.0)
        np.testing.assert_allclose(np.asarray(getattr(got, name)) / scale,
                                   w / scale, rtol=1e-5, atol=1e-5,
                                   err_msg=f"grad {name}")
