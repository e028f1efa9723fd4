"""AD correctness: finite-difference checks + backend agreement.

The `jax.test_util.check_grads` items are the analogue of the reference's
`ChainRulesTestUtils.test_rrule` finite-difference suite
(`test/chainrules.jl:2-90`): single + batched, 3D→3D and 3D→2D projection,
with and without optional args.  Backend cross-agreement is the analogue of
`cuda_cpu_agree` (`test/util.jl:1-34`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

import dprast
from dprast.ops import core, splat_matmul
from dprast.utils.testing import fixtures, tree_allclose

GRID = (8, 8)


def _fx(n_in=3, n_out=2, n_points=16, batch=5, seed=1):
    fx = fixtures(seed=seed, n_points=n_points, batch_size=batch, n_in=n_in,
                  n_out=n_out)
    return {k: jnp.asarray(v) for k, v in fx.items()}


@pytest.mark.parametrize("backend", ["xla", "matmul"])
@pytest.mark.parametrize("n_in,n_out", [(2, 2), (3, 2), (3, 3)])
def test_check_grads_batched(backend, n_in, n_out):
    fx = _fx(n_in=n_in, n_out=n_out)
    grid = (8,) * n_out

    def f(points, rotation, translation, background, out_weight,
          point_weight):
        return dprast.raster(grid, points, rotation, translation, background,
                             out_weight, point_weight, backend=backend)

    # order=1 only: the forward is piecewise-bilinear in the pose args, so
    # second derivatives are discontinuous at voxel boundaries (same reason
    # the reference only tests the rrule, not second order).
    check_grads(f, tuple(fx.values()), order=1, modes=["rev"], atol=1e-6,
                rtol=1e-6)


@pytest.mark.parametrize("backend", ["xla", "matmul"])
def test_check_grads_single_pose(backend):
    fx = _fx(n_in=3, n_out=2, batch=1)

    def f(points, rotation, translation):
        return dprast.raster(GRID, points, rotation[0], translation[0],
                             backend=backend)

    check_grads(f, (fx["points"], fx["rotation"], fx["translation"]),
                order=1, modes=["rev"], atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("n_in,n_out", [(2, 2), (3, 2), (3, 3), (4, 3)])
def test_backends_agree(n_in, n_out):
    """matmul backend ≡ xla oracle, forward and full pullback
    (the cuda_cpu_agree analogue, reference test/cuda.jl:2-74)."""
    fx = _fx(n_in=n_in, n_out=n_out, n_points=64, batch=7)
    grid = (6,) * n_out
    args = tuple(fx.values())
    out_x = core.raster_fwd(grid, *args)
    out_m = splat_matmul.raster_fwd(grid, *args)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_x),
                               rtol=1e-9, atol=1e-9)
    g = jnp.asarray(
        np.random.default_rng(9).standard_normal(out_x.shape))
    pb_x = core.raster_pullback(grid, *args, g)
    pb_m = splat_matmul.raster_pullback(grid, *args, g)
    assert tree_allclose(pb_m, pb_x, rtol=1e-8, atol=1e-8)


def test_grad_matches_analytic_pullback():
    """jax.grad through `raster` == the public `raster_pullback` on the same
    cotangent (the reference's rrule-vs-raster_pullback! contract,
    `ext/DiffPointRasterisationChainRulesCoreExt.jl:48-74`)."""
    fx = _fx()
    args = tuple(fx.values())
    out = dprast.raster(GRID, *args)
    g = jnp.asarray(np.random.default_rng(2).standard_normal(out.shape))

    def loss(*a):
        return jnp.sum(dprast.raster(GRID, *a) * g)

    grads = jax.grad(loss, argnums=tuple(range(6)))(*args)
    pb = dprast.raster_pullback(g, *args)
    assert tree_allclose(tuple(grads), tuple(pb), rtol=1e-9, atol=1e-9)


def test_batched_equals_loop_of_singles():
    """Batched forward/pullback ≡ per-pose loop (the reference's threaded
    consistency items, `src/raster.jl:383-431`,
    `src/raster_pullback.jl:271-345`)."""
    fx = _fx(n_points=32, batch=7)
    out_b = dprast.raster(GRID, *fx.values())
    g = jnp.asarray(np.random.default_rng(5).standard_normal(out_b.shape))
    pb_b = dprast.raster_pullback(g, *fx.values())

    d_points = jnp.zeros_like(fx["points"])
    d_pw = jnp.zeros_like(fx["point_weight"])
    for i in range(out_b.shape[0]):
        out_i = dprast.raster(GRID, fx["points"], fx["rotation"][i],
                              fx["translation"][i], fx["background"][i],
                              fx["out_weight"][i], fx["point_weight"])
        np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_b[i]),
                                   rtol=1e-9, atol=1e-9)
        pb_i = dprast.raster_pullback(g[i], fx["points"], fx["rotation"][i],
                                      fx["translation"][i],
                                      fx["background"][i],
                                      fx["out_weight"][i],
                                      fx["point_weight"])
        d_points = d_points + pb_i.points
        d_pw = d_pw + pb_i.point_weight
        np.testing.assert_allclose(np.asarray(pb_i.rotation),
                                   np.asarray(pb_b.rotation[i]), rtol=1e-8,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(pb_i.translation),
                                   np.asarray(pb_b.translation[i]),
                                   rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d_points),
                               np.asarray(pb_b.points), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d_pw),
                               np.asarray(pb_b.point_weight), rtol=1e-8,
                               atol=1e-9)


def test_batched_equals_vmap_of_singles():
    """The batched path must equal vmap over the single-pose path — the
    same contract as the loop consistency test but through JAX's own
    batching machinery."""
    fx = _fx(n_points=24, batch=5)

    out_b = dprast.raster(GRID, *fx.values())

    def single(rot, tr, bg, ow):
        return dprast.raster(GRID, fx["points"], rot, tr, bg, ow,
                             fx["point_weight"])

    out_v = jax.vmap(single)(fx["rotation"], fx["translation"],
                             fx["background"], fx["out_weight"])
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_b),
                               rtol=1e-9, atol=1e-9)


def test_jit_vmap_compose():
    """raster composes with jit and vmap over an extra leading axis."""
    fx = _fx()

    @jax.jit
    def f(pts):
        return dprast.raster(GRID, pts, fx["rotation"], fx["translation"])

    out = f(fx["points"])
    many = jnp.stack([fx["points"], fx["points"] * 0.5])
    out_v = jax.vmap(f)(many)
    assert out_v.shape == (2,) + out.shape
    np.testing.assert_allclose(np.asarray(out_v[0]), np.asarray(out),
                               rtol=1e-12, atol=1e-12)


def test_matmul_bf16_fast_mode_close():
    """The documented fast mode trades ~bf16 accuracy for speed; it must
    stay within its advertised tolerance of the faithful backend."""
    fx = _fx(n_points=64, batch=4)
    args = tuple(jnp.asarray(v, jnp.float32) for v in fx.values())
    ref = dprast.raster(GRID, *args, backend="matmul")
    fast = dprast.raster(GRID, *args, backend="matmul_bf16")
    scale = max(float(jnp.max(jnp.abs(ref))), 1.0)
    np.testing.assert_allclose(np.asarray(fast) / scale,
                               np.asarray(ref) / scale, atol=2e-2)


@pytest.mark.parametrize("grid", [(8, 8), (8, 192)])
def test_binned_bf16_fast_mode_close(grid):
    """The binned fast mode (r5, the matmul_bf16 analogue on the
    flagship backend): single-tile and sorted multi-tile paths both
    within the advertised ~2e-3 envelope, forward and gradients."""
    fx = _fx(n_points=48, batch=3, seed=7)
    args = tuple(jnp.asarray(v, jnp.float32) for v in fx.values())
    ref = dprast.raster(grid, *args, backend="binned")
    fast = dprast.raster(grid, *args, backend="binned_bf16")
    scale = max(float(jnp.max(jnp.abs(ref))), 1.0)
    np.testing.assert_allclose(np.asarray(fast) / scale,
                               np.asarray(ref) / scale, atol=2e-2)

    g = jnp.asarray(
        np.random.default_rng(4).standard_normal(ref.shape), jnp.float32)

    def loss(backend, pts, tr):
        return jnp.sum(dprast.raster(grid, pts, args[1], tr, *args[3:],
                                     backend=backend) * g)

    g_f = jax.grad(lambda *a: loss("binned_bf16", *a), argnums=(0, 1))(
        args[0], args[2])
    g_r = jax.grad(lambda *a: loss("binned", *a), argnums=(0, 1))(
        args[0], args[2])
    for a, b in zip(g_f, g_r):
        sc = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   atol=2e-2)

    # the standalone pullback API in fast mode (all six fields)
    pb_f = dprast.raster_pullback(g, *args, backend="binned_bf16")
    pb_r = dprast.raster_pullback(g, *args, backend="binned")
    for name in pb_r._fields:
        b = np.asarray(getattr(pb_r, name))
        sc = max(float(np.max(np.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(getattr(pb_f, name)) / sc,
                                   b / sc, atol=2e-2,
                                   err_msg=f"fast-mode pullback {name}")


@pytest.mark.parametrize("backend", ["binned"])
@pytest.mark.parametrize("n_in,n_out", [(3, 2), (3, 3)])
def test_check_grads_kernel_backends(backend, n_in, n_out):
    """Finite-difference checks on the Pallas-kernel backends (through the
    interpreter on CPU) — the reference runs `test_rrule` on every path it
    can (`test/chainrules.jl:2-90`).  These backends compute internally in
    f32 (MXU/bf16-split design), so tolerances are f32-scaled."""
    grid = (8,) * n_out
    from dprast.ops import dispatch
    if not dispatch._REGISTRY[backend][2](n_out, grid):
        pytest.skip(f"{backend} does not support {grid}")
    fx = _fx(n_in=n_in, n_out=n_out)

    def f(points, rotation, translation, background, out_weight,
          point_weight):
        return dprast.raster(grid, points, rotation, translation,
                             background, out_weight, point_weight,
                             backend=backend)

    check_grads(f, tuple(fx.values()), order=1, modes=["rev"], atol=5e-3,
                rtol=5e-3)


@pytest.mark.slow
def test_check_grads_binned_multitile_2d():
    """Finite-difference check on a SORTED multi-tile 2D binned frame
    (8, 192): two x-tiles, so the full sort → halo fold/unfold → unsort
    machinery is in the differentiation path — the configuration the
    single-tile (8, 8) case above never reaches (the reference's
    `test_rrule` analogue, `test/chainrules.jl:2-90`).  Runs through the
    Pallas interpreter on CPU.

    eps is chosen for the 96-voxel/unit x scale: the default 3.4e-4
    probe moves coordinates ~0.03 voxels — across the piecewise-linear
    voxel kinks — while 2e-5 stays ~2e-3 voxels, far above the backend's
    2^-23 coordinate quantization and (at this seed) clear of every
    voxel boundary."""
    grid = (8, 192)
    fx = _fx(n_in=3, n_out=2, n_points=16, batch=2, seed=3)

    def f(points, rotation, translation, background, out_weight,
          point_weight):
        return dprast.raster(grid, points, rotation, translation,
                             background, out_weight, point_weight,
                             backend="binned")

    check_grads(f, tuple(fx.values()), order=1, modes=["rev"], atol=5e-3,
                rtol=5e-3, eps=2e-5)


def test_grad_binned_3d_matches_xla():
    """`jax.grad` through the binned 3D path vs the oracle backend.  (The
    finite-difference harness is unusable on fine 3D grids: with the x
    scale at 64 voxels/unit, any probe step either crosses voxel-boundary
    kinks or drowns in the backend's 2^-23 coordinate quantization — so
    the binned VJP is checked against the analytically verified xla VJP.)
    """
    grid = (8, 16, 128)
    fx = _fx(n_in=3, n_out=3)

    def loss(backend, pts, rot, tr):
        return jnp.sum(
            dprast.raster(grid, pts, rot, tr, backend=backend) ** 2)

    g_b = jax.grad(lambda *a: loss("binned", *a), argnums=(0, 1, 2))(
        fx["points"], fx["rotation"], fx["translation"])
    g_x = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(
        fx["points"], fx["rotation"], fx["translation"])
    for a, b in zip(g_b, g_x):
        sc = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   atol=8e-6)


