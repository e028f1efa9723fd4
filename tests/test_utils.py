"""Utility-layer tests: profiling hooks, backend registry hygiene, and
public API surface (the Aqua QA analogue, reference `test/runtests.jl:3-6`)."""

import jax.numpy as jnp
import numpy as np

import dprast
from dprast.ops import dispatch, geometry
from dprast.utils import profiling
from dprast.utils.testing import fixtures


def test_public_api_surface():
    for name in dprast.__all__:
        assert hasattr(dprast, name), name
    assert set(dprast.available_backends()) >= {"xla", "matmul",
                                                "binned"}
    assert dprast.default_backend() == "auto"


def test_resolve_pair():
    """Explicit names apply to both directions; 'auto' yields a pair of
    registered names (the pair rule may upgrade both directions — e.g.
    binned+binned at single-tile 2D grids on TPU; on CPU they
    coincide with resolve())."""
    f, b = dispatch.resolve_pair("matmul", 2, (128, 128), 1000)
    assert (f, b) == ("matmul", "matmul")
    f, b = dispatch.resolve_pair("auto", 2, (128, 128), 100_000)
    assert f in dispatch.available_backends()
    assert b in dispatch.available_backends()
    # mixing only ever happens for 'auto' at single-tile 2D grids
    f2, b2 = dispatch.resolve_pair("auto", 3, (1024, 1024, 1024), 100_000)
    assert f2 == b2


def test_resolve_consistency():
    """Every registered backend that claims support must actually run the
    canonical small case."""
    fx = fixtures(seed=0, n_points=8, batch_size=2, n_in=2, n_out=2)
    for name in dispatch.available_backends():
        if not dispatch._REGISTRY[name][2](2, (8, 8)):
            continue
        out = dispatch.fwd_fn(name)(
            (8, 8), *(jnp.asarray(v, jnp.float32) for v in fx.values()))
        assert out.shape == (2, 8, 8), name
        assert np.all(np.isfinite(np.asarray(out))), name


def test_time_fn_runs():
    ms = profiling.time_fn(lambda c: c + 1.0, iters=4)
    assert ms >= 0.0


def test_annotate_and_trace(tmp_path):
    with profiling.annotate("unit-test"):
        x = jnp.ones((4,)) * 2
    assert float(x.sum()) == 8.0


def test_compensated_coords_match_f64():
    """grid_coords_2f must beat plain-f32 coordinate error by >100x at 1024
    (plain f32 is ~3e-5 absolute there — above the parity target alone)."""
    import numpy as np
    rng = np.random.default_rng(0)
    grid = (1024, 1024)
    pts = rng.standard_normal((500, 3)).astype(np.float32) * 0.5
    rot = rng.standard_normal((4, 2, 3)).astype(np.float32)
    tr = (rng.standard_normal((4, 2)) * 0.1).astype(np.float32)
    r0, dl = geometry.pose_voxel_and_deltas(
        jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(tr), grid)
    q64 = np.einsum("boi,pi->bpo", rot.astype(np.float64),
                    pts.astype(np.float64)) + tr.astype(np.float64)[:, None]
    u64 = (q64 + 1) * np.asarray(grid, np.float64) / 2 - 0.5
    u2 = np.asarray(r0, np.float64) + np.asarray(dl, np.float64)
    np.testing.assert_allclose(u2, u64, atol=3e-7)
    assert np.all((np.asarray(dl) > 0) & (np.asarray(dl) <= 1))


def test_compensated_coords_exact_centers():
    """Points on exact voxel centers keep the reference dl == 1 contract."""
    import numpy as np
    grid = (5, 5)
    # voxel j center: q = (j + 0.5) * 2/5 - 1  ->  u = j exactly
    pts = np.array([[(j + 0.5) * 2 / 5 - 1, 0.0] for j in range(5)],
                   np.float32)
    r0, dl = geometry.pose_voxel_and_deltas(
        jnp.asarray(pts), jnp.eye(2, dtype=jnp.float32)[None],
        jnp.zeros((1, 2), jnp.float32), grid)
    assert np.all(np.asarray(dl[0, :, 0]) == 1.0)
    assert list(np.asarray(r0[0, :, 0])) == [j - 1 for j in range(5)]
