"""Fused Pallas TPU kernels for the 2D multilinear splat.

Same scatter-free one-hot-pair matmul formulation as
`dprast.ops.splat_matmul` (the TPU-native replacement for the reference's
atomic adds, `src/raster.jl:64`, and CUDA shared-memory reductions,
`ext/DiffPointRasterisationCUDAExt.jl:107-191`), but with the factor
construction fused into the kernel so the (chunk, H)/(chunk, W) one-hot
factors never touch HBM, and with the whole gradient set produced in one
pass over the cotangent image.

Forward grid = (poses, point-chunks): the (H, W) output block stays resident
in VMEM across the inner chunk axis and is accumulated in place — scatter
conflicts are resolved by MXU accumulation, no atomics exist or are needed.

Backward grid = (point-chunks, poses): the (chunk, N_in) point-gradient
block stays resident across the inner pose axis; per-(chunk, pose) partial
pose gradients are written to small (K, B, ...) buffers and reduced outside
(the analogue of the reference's thread-private slabs + final sum,
`src/interface.jl:402-406`, `src/raster_pullback.jl:141-146`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dprast.ops import geometry
from dprast.ops.core import PullbackResult

# Precision modes for the in-kernel matmuls:
#
# - "split" (default): exact-one-hot bf16 formulation.  The one-hot factor
#   is {0,1}-valued and therefore EXACT in bf16; the coefficient-bearing
#   factor is split into hi+lo bf16 parts (error ~2^-18 relative, i.e.
#   ~4e-6 — under the 1e-5 parity target) and both matmuls run at the full
#   native bf16 MXU rate with f32 accumulation.
# - lax.Precision.HIGHEST: f32-faithful multi-pass matmuls.
# - lax.Precision.DEFAULT: 1-pass bf16 on the f32 factors (~4e-3 error).
#
# (Mosaic does not support lax.Precision.HIGH in-kernel.)
#
# The split scheme is ONLY valid inside Mosaic kernels: XLA's algebraic
# simplifier rewrites dot(o, hi) + dot(o, lo) into dot(o, hi + lo) whose
# bf16 add destroys the compensation (measured 1e-3 error via XLA einsums
# vs 4.9e-6 here) — do not port this pattern to the XLA backends.
_PRECISION = "split"

_DEF_CHUNK = 1024


def _interpret_default() -> bool:
    """Pallas TPU kernels run via the interpreter off-TPU (tests/CI)."""
    return not geometry.on_tpu()


def supported(n_out: int, grid_size=None) -> bool:
    if n_out != 2:
        return False
    if grid_size is not None:
        h, w = grid_size
        # one-hot matmul work scales with H*W; beyond ~256^2 the tiled /
        # binned path (ops.splat_matmul chunking or future tile kernel) wins.
        return h * w <= 256 * 256
    return True


def _pad_points(points, point_weight, chunk):
    p = points.shape[0]
    k = max(1, -(-p // chunk))
    pad = k * chunk - p
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pw = jnp.pad(point_weight, (0, pad))  # pad weight 0 => zero contribution
    return pts, pw, k


def _axis_onehot(u, n):
    """One-hot-pair factor and derivative factor for one axis.

    u: (C, 1) fractional 0-based grid coordinate -> (A, dA): (C, n) with
    A = (h==r0)(1-dl) + (h==r0+1) dl, dA = (h==r0+1) - (h==r0).
    Out-of-grid reference voxels simply never match the iota (the
    reference's silent per-neighbour drop, src/raster.jl:62).
    """
    r0f = jnp.ceil(u) - 1
    dl = u - r0f
    r0 = r0f.astype(jnp.int32)
    h = lax.broadcasted_iota(jnp.int32, (u.shape[0], n), 1)
    lo = h == r0
    hi = h == r0 + 1
    a = jnp.where(lo, 1 - dl, 0.0) + jnp.where(hi, dl, 0.0)
    da = jnp.where(hi, 1.0, 0.0) - jnp.where(lo, 1.0, 0.0)
    return a, da


def _fwd_kernel(pts_ref, rot_ref, tr_ref, bgow_ref, pw_ref, out_ref, *,
                grid_size, precision):
    h, w = grid_size
    k = pl.program_id(1)
    pts = pts_ref[...]                       # (C, N_in)
    rot = rot_ref[0]                         # (2, N_in)
    q = lax.dot_general(pts, rot, (((1,), (1,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    uy = (q[:, 0:1] + tr_ref[0, 0, 0] + 1.0) * (h / 2) - 0.5
    ux = (q[:, 1:2] + tr_ref[0, 0, 1] + 1.0) * (w / 2) - 0.5
    a, _ = _axis_onehot(uy, h)               # (C, H)
    b, _ = _axis_onehot(ux, w)               # (C, W)
    wgt = pw_ref[...] * bgow_ref[0, 0, 1]    # (C, 1) * scalar out_weight
    s = lax.dot_general(a * wgt, b, (((0,), (0,)), ((), ())),
                        precision=precision,
                        preferred_element_type=jnp.float32)  # (H, W)

    @pl.when(k == 0)
    def _():
        out_ref[0] = s + bgow_ref[0, 0, 0]

    @pl.when(k > 0)
    def _():
        out_ref[0] = out_ref[0] + s


def _fwd_kernel_split(pts_ref, ptst_ref, rot_ref, tr_ref, bgow_ref, pw_ref,
                      out_ref, *, grid_size):
    """Split-mode forward: S = O_y^T @ [c0*Bx ; c1*Bx] with the stacked
    one-hot O exact in bf16 and the coefficient factor split hi+lo bf16."""
    h, w = grid_size
    k = pl.program_id(1)
    bf16, f32 = jnp.bfloat16, jnp.float32
    pts = pts_ref[...]                       # (C, N_in)
    ptst = ptst_ref[...]                     # (N_in, C)
    rot = rot_ref[0]                         # (2, N_in)
    c = pts.shape[0]

    # both orientations of the transformed coords, no in-kernel transposes
    q = lax.dot_general(pts, rot, (((1,), (1,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=f32)          # (C, 2)
    qt = lax.dot_general(rot, ptst, (((1,), (0,)), ((), ())),
                         precision=lax.Precision.HIGHEST,
                         preferred_element_type=f32)         # (2, C)
    ty, tx = tr_ref[0, 0, 0], tr_ref[0, 0, 1]
    uy_row = (qt[0:1, :] + ty + 1.0) * (h / 2) - 0.5          # (1, C)
    uy_col = (q[:, 0:1] + ty + 1.0) * (h / 2) - 0.5           # (C, 1)
    ux_col = (q[:, 1:2] + tx + 1.0) * (w / 2) - 0.5           # (C, 1)

    r0y_row = jnp.ceil(uy_row) - 1                            # (1, C)
    r0cat = jnp.concatenate([r0y_row, r0y_row + 1], axis=1)   # (1, 2C)
    iota_h = lax.broadcasted_iota(jnp.int32, (h, 2 * c), 0)
    o_t = (iota_h == r0cat.astype(jnp.int32)).astype(bf16)    # (H, 2C) exact

    dly_col = uy_col - (jnp.ceil(uy_col) - 1)                 # (C, 1)
    bx, _ = _axis_onehot(ux_col, w)                           # (C, W) f32
    wgt = pw_ref[...] * bgow_ref[0, 0, 1]                     # (C, 1)
    b_stack = jnp.concatenate(
        [(1 - dly_col) * wgt * bx, dly_col * wgt * bx], axis=0)  # (2C, W)
    b_hi = b_stack.astype(bf16)
    b_lo = (b_stack - b_hi.astype(f32)).astype(bf16)

    dims = (((1,), (0,)), ((), ()))
    s = (lax.dot_general(o_t, b_hi, dims, preferred_element_type=f32)
         + lax.dot_general(o_t, b_lo, dims, preferred_element_type=f32))

    @pl.when(k == 0)
    def _():
        out_ref[0] = s + bgow_ref[0, 0, 0]

    @pl.when(k > 0)
    def _():
        out_ref[0] = out_ref[0] + s


def raster_fwd(grid_size, points, rotation, translation, background,
               out_weight, point_weight, *, chunk: int = _DEF_CHUNK,
               precision=_PRECISION, interpret: bool | None = None):
    """Forward rasterisation (canonical batched args) -> (B, H, W)."""
    assert supported(len(grid_size)), "pallas backend: N_out == 2 only"
    if interpret is None:
        interpret = _interpret_default()
    h, w = grid_size
    bsz = rotation.shape[0]
    n_in = points.shape[1]
    f32 = jnp.float32
    pts, pw, k = _pad_points(points.astype(f32), point_weight.astype(f32),
                             chunk)
    bgow = jnp.stack([background.astype(f32), out_weight.astype(f32)],
                     axis=1)[:, None, :]  # (B, 1, 2) per-pose SMEM scalars

    split = precision == "split"
    if split:
        kernel = functools.partial(_fwd_kernel_split, grid_size=(h, w))
        extra_specs = [pl.BlockSpec((n_in, chunk), lambda b, j: (0, j),
                                    memory_space=pltpu.VMEM)]
        extra_args = [pts.T]
    else:
        kernel = functools.partial(_fwd_kernel, grid_size=(h, w),
                                   precision=precision)
        extra_specs, extra_args = [], []

    out = pl.pallas_call(
        kernel,
        grid=(bsz, k),
        in_specs=[
            pl.BlockSpec((chunk, n_in), lambda b, j: (j, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
            pl.BlockSpec((1, 2, n_in), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, 1), lambda b, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w), f32),
        interpret=interpret,
    )(pts, *extra_args, rotation.astype(f32),
      translation.astype(f32)[:, None, :], bgow, pw[:, None])
    dtype = jnp.result_type(points, rotation, translation)
    return out.astype(dtype)


def _bwd_kernel(pts_ref, rot_ref, tr_ref, ow_ref, pw_ref, g_ref,
                dpts_ref, dpw_ref, dt_ref, dr_ref, dow_ref, *,
                grid_size, precision):
    h, w = grid_size
    b = pl.program_id(1)
    pts = pts_ref[...]                       # (C, N_in)
    rot = rot_ref[0]                         # (2, N_in)
    q = lax.dot_general(pts, rot, (((1,), (1,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    uy = (q[:, 0:1] + tr_ref[0, 0, 0] + 1.0) * (h / 2) - 0.5
    ux = (q[:, 1:2] + tr_ref[0, 0, 1] + 1.0) * (w / 2) - 0.5
    a, da = _axis_onehot(uy, h)              # (C, H)
    bf, db = _axis_onehot(ux, w)             # (C, W)
    g = g_ref[0]                             # (H, W)

    # u0[p,h] = sum_w bf[p,w] g[h,w];  v1[p,w] = sum_h a[p,h] g[h,w]
    u0 = lax.dot_general(bf, g, (((1,), (1,)), ((), ())),
                         precision=precision,
                         preferred_element_type=jnp.float32)  # (C, H)
    v1 = lax.dot_general(a, g, (((1,), (0,)), ((), ())),
                         precision=precision,
                         preferred_element_type=jnp.float32)  # (C, W)

    gw = jnp.sum(v1 * bf, axis=1, keepdims=True)        # (C,1) sum_s g*W_s
    dy = jnp.sum(da * u0, axis=1, keepdims=True)        # ds/du_y / (ow*pw)
    dx = jnp.sum(v1 * db, axis=1, keepdims=True)
    _bwd_finish(gw, dy, dx, pts, rot, ow_ref, pw_ref, dpts_ref, dpw_ref,
                dt_ref, dr_ref, dow_ref, grid_size=(h, w), b=b)


def _bwd_finish(gw, dy, dx, pts, rot, ow_ref, pw_ref, dpts_ref, dpw_ref,
                dt_ref, dr_ref, dow_ref, *, grid_size, b):
    """Shared backward tail: per-(chunk, pose) contractions to the six
    gradients (reference `src/raster_pullback.jl:55-72`), with point grads
    accumulated across the inner pose axis in the resident output block."""
    h, w = grid_size
    ow = ow_ref[0, 0, 0]
    pw = pw_ref[...]                                    # (C, 1)
    coeff = ow * pw
    scaled = jnp.concatenate([dy * (h / 2), dx * (w / 2)], axis=1) * coeff

    dt_ref[0, 0] = jnp.sum(scaled, axis=0, keepdims=True)           # (1, 2)
    dr_ref[0, 0] = lax.dot_general(scaled, pts, (((0,), (0,)), ((), ())),
                                   precision=lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
    dow_ref[0, 0] = jnp.sum(gw * pw).reshape(1, 1)

    d_p = lax.dot_general(scaled, rot, (((1,), (0,)), ((), ())),
                          precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)  # (C, N_in)
    d_pw = gw * ow

    @pl.when(b == 0)
    def _():
        dpts_ref[...] = d_p
        dpw_ref[...] = d_pw

    @pl.when(b > 0)
    def _():
        dpts_ref[...] = dpts_ref[...] + d_p
        dpw_ref[...] = dpw_ref[...] + d_pw


def _bwd_kernel_split(pts_ref, rot_ref, tr_ref, ow_ref, pw_ref, g_ref,
                      dpts_ref, dpw_ref, dt_ref, dr_ref, dow_ref, *,
                      grid_size):
    """Split-mode backward: res = [O0y ; O1y] @ (g_hi + g_lo) with the
    stacked one-hot exact in bf16 and the cotangent split hi+lo bf16
    in-kernel; everything downstream of the two full-rate matmuls is
    elementwise."""
    h, w = grid_size
    b = pl.program_id(1)
    f32 = jnp.float32
    g = g_ref[0]                             # (H, W) f32
    g_hi = g.astype(jnp.bfloat16)
    g_lo = (g - g_hi.astype(f32)).astype(jnp.bfloat16)
    pts = pts_ref[...]                       # (C, N_in)
    rot = rot_ref[0]                         # (2, N_in)
    c = pts.shape[0]
    q = lax.dot_general(pts, rot, (((1,), (1,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=f32)
    uy = (q[:, 0:1] + tr_ref[0, 0, 0] + 1.0) * (h / 2) - 0.5
    ux = (q[:, 1:2] + tr_ref[0, 0, 1] + 1.0) * (w / 2) - 0.5
    r0y = jnp.ceil(uy) - 1
    dly = uy - r0y                                            # (C, 1)
    r0cat = jnp.concatenate([r0y, r0y + 1], axis=0)           # (2C, 1)
    iota_c = lax.broadcasted_iota(jnp.int32, (2 * c, h), 1)
    o = (iota_c == r0cat.astype(jnp.int32)).astype(jnp.bfloat16)  # (2C, H)

    dims = (((1,), (0,)), ((), ()))
    res = (lax.dot_general(o, g_hi, dims, preferred_element_type=f32)
           + lax.dot_general(o, g_lo, dims,
                             preferred_element_type=f32))     # (2C, W)
    p0, p1 = res[:c], res[c:]
    v1 = (1 - dly) * p0 + dly * p1                            # sum_h a*g
    diff = p1 - p0                                            # sum_h da*g

    bx, db = _axis_onehot(ux, w)                              # (C, W) f32
    gw = jnp.sum(v1 * bx, axis=1, keepdims=True)
    dy = jnp.sum(diff * bx, axis=1, keepdims=True)
    dx = jnp.sum(v1 * db, axis=1, keepdims=True)
    _bwd_finish(gw, dy, dx, pts, rot, ow_ref, pw_ref, dpts_ref, dpw_ref,
                dt_ref, dr_ref, dow_ref, grid_size=(h, w), b=b)


def raster_pullback(grid_size, points, rotation, translation, background,
                    out_weight, point_weight, ds_dout, *,
                    chunk: int = _DEF_CHUNK, precision=_PRECISION,
                    interpret: bool | None = None) -> PullbackResult:
    """Analytic pullback (canonical batched args) -> PullbackResult."""
    assert supported(len(grid_size)), "pallas backend: N_out == 2 only"
    if interpret is None:
        interpret = _interpret_default()
    h, w = grid_size
    bsz = rotation.shape[0]
    p, n_in = points.shape
    f32 = jnp.float32
    pts, pw, k = _pad_points(points.astype(f32), point_weight.astype(f32),
                             chunk)
    g = ds_dout.astype(f32)

    if precision == "split":
        kernel = functools.partial(_bwd_kernel_split, grid_size=(h, w))
    else:
        kernel = functools.partial(_bwd_kernel, grid_size=(h, w),
                                   precision=precision)
    g_specs = [pl.BlockSpec((1, h, w), lambda j, b: (b, 0, 0),
                            memory_space=pltpu.VMEM)]
    g_args = [g]

    outs = pl.pallas_call(
        kernel,
        grid=(k, bsz),
        in_specs=[
            pl.BlockSpec((chunk, n_in), lambda j, b: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_in), lambda j, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda j, b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda j, b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, 1), lambda j, b: (j, 0),
                         memory_space=pltpu.VMEM),
            *g_specs,
        ],
        out_specs=[
            pl.BlockSpec((chunk, n_in), lambda j, b: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda j, b: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2), lambda j, b: (j, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, n_in), lambda j, b: (j, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda j, b: (j, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k * chunk, n_in), f32),
            jax.ShapeDtypeStruct((k * chunk, 1), f32),
            jax.ShapeDtypeStruct((k, bsz, 1, 2), f32),
            jax.ShapeDtypeStruct((k, bsz, 2, n_in), f32),
            jax.ShapeDtypeStruct((k, bsz, 1, 1), f32),
        ],
        interpret=interpret,
    )(pts, rotation.astype(f32), translation.astype(f32)[:, None, :],
      out_weight.astype(f32)[:, None, None], pw[:, None], *g_args)

    d_pts_pad, d_pw_pad, d_t_k, d_r_k, d_ow_k = outs
    d_t_k = d_t_k[:, :, 0, :]
    d_ow_k = d_ow_k[:, :, 0, 0]
    dtype = jnp.result_type(points, rotation, ds_dout)
    return PullbackResult(
        points=d_pts_pad[:p].astype(dtype),
        rotation=jnp.sum(d_r_k, axis=0).astype(dtype),
        translation=jnp.sum(d_t_k, axis=0).astype(dtype),
        background=jnp.sum(g.reshape(bsz, -1), axis=-1).astype(dtype),
        out_weight=jnp.sum(d_ow_k, axis=0).astype(dtype),
        point_weight=d_pw_pad[:p, 0].astype(dtype),
    )
