"""Slot-scheduled binned backend vs the independent float64 numpy oracle,
through the Pallas interpreter on CPU.  Covers the single-tile direct path
(no sorts), the multi-tile halo path (tile straddle, edge drops, empty
tiles, uneven segments), and 3D volumes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dprast
from dprast.ops import dispatch, splat_binned
from dprast.utils.testing import (fixtures, raster_numpy,
                                  raster_pullback_numpy)


pytestmark = pytest.mark.slow  # multi-minute: interpret-mode kernels / process groups

def _check(fx, grid, chunk=128, seed=7, tol=8e-6):
    args = tuple(jnp.asarray(v, jnp.float32) for v in fx.values())
    np_args = [np.asarray(a) for a in args]
    out_b = splat_binned.raster_fwd(grid, *args, chunk=chunk)
    out_ref = raster_numpy(grid, *np_args)
    scale = max(float(np.max(np.abs(out_ref))), 1.0)
    np.testing.assert_allclose(np.asarray(out_b, np.float64) / scale,
                               out_ref / scale, atol=tol)
    g = jnp.asarray(np.random.default_rng(seed).standard_normal(
        out_ref.shape), jnp.float32)
    pb_b = splat_binned.raster_pullback(grid, *args, g, chunk=chunk)
    pb_ref = raster_pullback_numpy(grid, *np_args, np.asarray(g))
    for name in pb_b._fields:
        ref = pb_ref[name]
        sc = max(float(np.max(np.abs(ref))), 1.0)
        np.testing.assert_allclose(
            np.asarray(getattr(pb_b, name), np.float64) / sc, ref / sc,
            atol=tol, err_msg=f"grad {name}")


def test_single_tile_direct():
    fx = fixtures(seed=3, n_points=300, batch_size=3, n_in=3, n_out=2)
    _check(fx, (128, 128))


def test_multi_tile_2d():
    fx = fixtures(seed=4, n_points=400, batch_size=3, n_in=3, n_out=2)
    _check(fx, (256, 256))


def test_multi_tile_2d_wide():
    fx = fixtures(seed=5, n_points=350, batch_size=2, n_in=2, n_out=2)
    _check(fx, (128, 512))


def test_volume_3d():
    fx = fixtures(seed=6, n_points=200, batch_size=2, n_in=3, n_out=3)
    _check(fx, (128, 128, 128))


def test_single_pose_batch():
    """batch == 1 takes the squeezed 1-D sort paths (prep without vmap,
    flat segment-keyed unsort) — the volumetric benchmark configs live
    there (XLA's (1, n) batched sort is ~10x slower than the identical
    (n,) sort).  Sort-path equivalence is exact (verified: batch-1 ==
    duplicated-pose batch-2 bit-for-bit); the 2e-5 tolerance covers the
    2-term bf16-split worst case (~2^-16.6 relative per gathered value)
    which this seed's pose-gradient sign cancellation amplifies — an
    accuracy property of the backend, not of the batch-1 paths."""
    fx = fixtures(seed=13, n_points=350, batch_size=1, n_in=3, n_out=3)
    _check(fx, (128, 128, 128), tol=2e-5)
    fx = fixtures(seed=14, n_points=250, batch_size=1, n_in=3, n_out=2)
    _check(fx, (256, 256), tol=2e-5)


def test_sparse_cloud_many_empty_tiles():
    # a tight cluster: most tiles empty (exercises the min-chunk fwd
    # guarantee that writes zeros into never-visited output blocks)
    rng = np.random.default_rng(8)
    pts = jnp.asarray(rng.standard_normal((50, 2)) * 0.02 + 0.5,
                      jnp.float32)
    rot = jnp.asarray(np.tile(np.eye(2, dtype=np.float32), (2, 1, 1)))
    tr = jnp.asarray(rng.standard_normal((2, 2)) * 0.01, jnp.float32)
    fx = dict(points=pts, rotation=rot, translation=tr,
              background=jnp.zeros(2), out_weight=jnp.ones(2),
              point_weight=jnp.ones(50))
    _check(fx, (512, 512))


def test_exact_boundary_coordinates():
    # grid coordinates landing EXACTLY on voxel centres (dl encodes as 0,
    # decoded to the reference's dl == 1 convention), on 127-body tile
    # boundaries (r_loc in {-1, t-1} straddles) and on/past the grid edge
    # (u = -1 dropped, u = 256 kept but fully out-of-grid).  With identity
    # rotation and zero translation, u = k exactly for
    # x = (k + 0.5)/128 - 1 (all steps exact in f32 at grid 256).
    grid = (256, 256)
    u_targets = [-1.0, -0.5, 0.0, 0.75, 1.0, 126.0, 127.0, 127.25,
                 128.0, 254.0, 255.0, 255.5, 256.0]
    xs = [(u + 0.5) / 128.0 - 1.0 for u in u_targets]
    pts = jnp.asarray([[x, y] for x in xs for y in xs], jnp.float32)
    n = pts.shape[0]
    rot = jnp.asarray(np.tile(np.eye(2, dtype=np.float32), (2, 1, 1)))
    tr = jnp.zeros((2, 2), jnp.float32)
    fx = dict(points=pts, rotation=rot, translation=tr,
              background=jnp.zeros(2), out_weight=jnp.ones(2),
              point_weight=jnp.asarray(
                  np.random.default_rng(3).uniform(0.5, 2.0, n),
                  jnp.float32))
    _check(fx, grid)


def test_points_outside_grid():
    rng = np.random.default_rng(9)
    pts = jnp.asarray(rng.standard_normal((100, 2)) * 3.0, jnp.float32)
    rot = jnp.asarray(np.tile(np.eye(2, dtype=np.float32), (2, 1, 1)))
    tr = jnp.zeros((2, 2), jnp.float32)
    fx = dict(points=pts, rotation=rot, translation=tr,
              background=jnp.zeros(2), out_weight=jnp.ones(2),
              point_weight=jnp.ones(100))
    _check(fx, (256, 256))


def test_supported_rules():
    assert splat_binned.supported(2, (128, 128))
    assert splat_binned.supported(2, (1024, 1024))
    assert splat_binned.supported(3, (128, 128, 128))
    # the ext-128 redesign lifts the old tile-alignment restrictions:
    # any 2D/3D grid works (virtual padding to ceil(g/127)*127 + 1)
    assert splat_binned.supported(2, (200, 200))
    assert splat_binned.supported(2, (256, 64))
    assert splat_binned.supported(3, (64, 64, 64))
    assert splat_binned.supported(3, (130, 128, 128))
    assert not splat_binned.supported(1, (128,))
    assert not splat_binned.supported(4, (16, 16, 16, 16))
    # tile-count bound: huge grids stay off this backend entirely
    assert not splat_binned.supported(2, (10_000, 10_000))
    # sparse-volume guard: 1024^3 with 1e5 points stays off this backend
    assert not splat_binned.supported(3, (1024, 1024, 1024), 100_000)
    assert "binned" in dispatch.available_backends()


def test_golden_through_api():
    # README quick-start values through the public API with the binned
    # backend (the exactness contract: dl == 1 at voxel centers)
    points = jnp.array([[0.0, 0.0], [0.2, 0.2], [-0.4, 0.0],
                        [0.0, 0.4], [0.4, -0.4]])
    img = dprast.raster((128, 128), points, jnp.eye(2), jnp.zeros(2),
                        backend="binned")
    ref = dprast.raster((128, 128), points, jnp.eye(2), jnp.zeros(2),
                        backend="xla")
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=4e-6)


def test_resolve_unaligned_3d():
    # once a crash path (ADVICE r1: tile-shape underflow); the ext-128
    # design now simply supports unaligned volumes on the binned backend
    assert dispatch.resolve("auto", 3, (130, 128, 128)) in (
        "binned", "xla", "matmul")


def test_fused_vjp_matches_standalone_pullback():
    """`jax.grad` rides the fused residual pair (`raster_fwd_res` /
    `raster_pullback_res`, dispatch vjp_pair); it must agree exactly with
    the standalone pullback.  Point count deliberately NOT a chunk
    multiple and some points off-grid: regression for the short sort
    input that truncated the slot frame and left kernel output rows
    unwritten (NaN on hardware)."""
    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.standard_normal((500, 3)) * 0.6, jnp.float32)
    rot = jnp.asarray(np.stack([np.eye(3)[:2]] * 3), jnp.float32)
    tr = jnp.asarray(rng.standard_normal((3, 2)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((3, 256, 256)), jnp.float32)
    out, vjp = jax.vjp(
        lambda p: dprast.raster((256, 256), p, rot, tr, backend="binned"),
        pts)
    (gp,) = vjp(g)
    res = dprast.raster_pullback(g, pts, rot, tr, backend="binned")
    assert np.isfinite(np.asarray(gp)).all()
    np.testing.assert_allclose(np.asarray(gp), np.asarray(res.points),
                               atol=1e-6)


def test_prep_packed_key_matches_payload():
    """The point-id plane riding inside the sort key (pack_idx) must
    produce the identical frame as carrying it as a payload operand."""
    rng = np.random.default_rng(11)
    p, nt, chunk = 333, 7, 64
    key = jnp.asarray(rng.integers(0, nt + 1, p), jnp.int32)  # incl. nt
    plane = jnp.asarray(rng.standard_normal(p), jnp.float32)
    ptidx = jnp.arange(p, dtype=jnp.float32)
    fills = [0.0, float(p)]
    d_packed, st_packed = splat_binned._prep_binned(
        key, [plane, ptidx], fills, nt, chunk, True, pack_idx=True)
    d_plain, st_plain = splat_binned._prep_binned(
        key, [plane, ptidx], fills, nt, chunk, True, pack_idx=False)
    np.testing.assert_array_equal(np.asarray(st_packed),
                                  np.asarray(st_plain))
    np.testing.assert_array_equal(np.asarray(d_packed),
                                  np.asarray(d_plain))


def test_default_chunk_points_aware():
    """Sparse clouds on many-tile grids get the smaller chunk, and the
    fused-vjp residual geometry stays consistent between the forward and
    the pullback (both derive the chunk from the same (grid, P))."""
    big = (1024, 1024)
    assert splat_binned._default_chunk(big, 100_000) == 256
    assert splat_binned._default_chunk(big, 10_000) == 128
    assert splat_binned._default_chunk((128, 128), 10) == 1024


def test_explicit_binned_honoured_when_unprofitable():
    """An explicit backend='binned' request must be honoured whenever the
    backend CAN run it, even where auto-dispatch would deem it
    unprofitable (regression: the padding-ratio heuristic used to reject
    explicit requests with a misleading 'does not support' error)."""
    grid = (1024, 1024)
    assert not splat_binned.profitable(2, grid, 1000)
    assert splat_binned.supported(2, grid, 1000)
    assert dispatch.resolve("binned", 2, grid, 1000) == "binned"
    # capability limits still reject: f32 point ids collide at >= 2^24
    assert not splat_binned.supported(2, grid, 1 << 24)
    with pytest.raises(ValueError, match="does not support"):
        dispatch.resolve("binned", 2, grid, 1 << 24)


@pytest.mark.parametrize("grid", [(300, 200), (128, 128, 128)])
def test_fold_unfold_exact_adjoints(grid):
    """<u, fold(x)> == <unfold(u), x> exactly (same sum order): the
    backward's window extraction is the exact adjoint of the forward's
    window summation, so OOB-drop semantics and halo accounting agree
    between the two directions by construction."""
    ts = splat_binned.tile_shape_for(grid)
    nt = splat_binned.n_tiles(grid, ts)
    if len(grid) == 2:
        rows_e = ts[0] + 1
    else:
        rows_e = (ts[0] + 1) * (ts[1] + 1)
    cols_e = ts[-1] + 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, nt, rows_e, cols_e)))
    u = jnp.asarray(rng.standard_normal((2,) + grid))
    lhs = np.vdot(np.asarray(u),
                  np.asarray(splat_binned._fold(x, grid, ts, True)))
    rhs = np.vdot(np.asarray(splat_binned._unfold(u, grid, ts)),
                  np.asarray(x))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    # transposed=True only permutes the window axes
    ut = splat_binned._unfold(u, grid, ts, transposed=True)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(ut, -1, -2)),
        np.asarray(splat_binned._unfold(u, grid, ts)))


def test_uniform_weight_fast_path_matches_array():
    """The pw_uniform fast path (defaulted / scalar point_weight: weight
    plane dropped from the binning sort, scalar applied post-fold) must
    match the explicit per-point array path, forward and through
    `jax.grad` (which rides the uniform residual layout — the point-id
    plane shifts one slot down without the weight plane)."""
    rng = np.random.default_rng(13)
    pts = jnp.asarray(rng.standard_normal((400, 3)) * 0.5, jnp.float32)
    rot = jnp.asarray(np.stack([np.eye(3)[:2]] * 3), jnp.float32)
    tr = jnp.asarray(rng.standard_normal((3, 2)) * 0.1, jnp.float32)
    ow = jnp.asarray(rng.uniform(0.5, 2.0, (3,)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((3, 256, 256)), jnp.float32)
    grid = (256, 256)

    o_def = dprast.raster(grid, pts, rot, tr, None, ow, backend="binned")
    o_arr = dprast.raster(grid, pts, rot, tr, None, ow,
                          point_weight=jnp.ones((400,)), backend="binned")
    np.testing.assert_allclose(np.asarray(o_def), np.asarray(o_arr),
                               atol=1e-6)
    o_scl = dprast.raster(grid, pts, rot, tr, None, ow,
                          point_weight=1.75, backend="binned")
    o_sarr = dprast.raster(grid, pts, rot, tr, None, ow,
                           point_weight=jnp.full((400,), 1.75),
                           backend="binned")
    # scalar-vs-array differ only in f32 rounding ORDER (the fast path
    # multiplies the scalar after the fold); same tolerance as the f64
    # oracle checks
    sc = max(float(np.max(np.abs(np.asarray(o_sarr)))), 1.0)
    np.testing.assert_allclose(np.asarray(o_scl) / sc,
                               np.asarray(o_sarr) / sc, atol=8e-6)

    def loss(pts_, tr_, pw):
        out = dprast.raster(grid, pts_, rot, tr_, None, ow,
                            point_weight=pw, backend="binned")
        return jnp.sum(out * g)

    gu = jax.grad(loss, argnums=(0, 1))(pts, tr, None)
    ga = jax.grad(loss, argnums=(0, 1))(pts, tr, jnp.ones((400,)))
    for a, b in zip(gu, ga):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_xla_fused_vjp_matches_standalone_pullback():
    """The xla oracle's fused residual pair (cached neighbour geometry)
    must agree with its standalone recompute pullback."""
    rng = np.random.default_rng(17)
    pts = jnp.asarray(rng.standard_normal((300, 3)) * 0.6, jnp.float32)
    rot = jnp.asarray(np.stack([np.eye(3)[:2]] * 3), jnp.float32)
    tr = jnp.asarray(rng.standard_normal((3, 2)) * 0.1, jnp.float32)
    pw = jnp.asarray(rng.uniform(0.5, 2.0, (300,)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((3, 64, 64)), jnp.float32)
    out, vjp = jax.vjp(
        lambda p, t, w: dprast.raster((64, 64), p, rot, t,
                                      point_weight=w, backend="xla"),
        pts, tr, pw)
    gp, gt, gw = vjp(g)
    res = dprast.raster_pullback(g, pts, rot, tr, point_weight=pw,
                                 backend="xla")
    np.testing.assert_allclose(np.asarray(gp), np.asarray(res.points),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(res.translation),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(res.point_weight),
                               atol=1e-6)


def test_random_config_sweep_oracle():
    """Seeded random-configuration sweep vs the f64 oracle: random
    grids (odd shapes, tiny axes), point counts, batch sizes and input
    dims — breadth beyond the hand-picked cases above.  Forward and
    full pullback per draw (r5).

    Tolerance is looser than the hand-picked cases': random draws can
    put a point within f32 quantization of a voxel boundary, where the
    f32 backend and the f64 oracle legitimately take different stencil
    branches (a measure-zero kink-straddle; the reference's f32 CUDA
    path vs its f64 CPU has the same property).  The tight ≤1e-5
    envelope is asserted by the curated cases above and `tests_tpu/`."""
    rng = np.random.default_rng(123)
    checked = 0
    for trial in range(10):
        n_out = int(rng.integers(2, 4))
        if n_out == 2:
            grid = tuple(int(rng.integers(2, 300)) for _ in range(2))
        else:
            grid = tuple(int(rng.integers(2, 40)) for _ in range(3))
        if not splat_binned.supported(n_out, grid):
            continue
        n_in = int(rng.integers(n_out, 4))
        p = int(rng.integers(1, 200))
        b = int(rng.integers(1, 6))
        fx = fixtures(seed=1000 + trial, n_points=p, batch_size=b,
                      n_in=n_in, n_out=n_out)
        _check(fx, grid, chunk=128, tol=1e-4)
        checked += 1
    assert checked >= 8, checked
