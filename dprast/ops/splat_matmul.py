"""Scatter-free MXU formulation of the multilinear splat.

The splat weight factorises over output axes: with per-axis one-hot-pair
vectors ``a_p(h) = (h == r0_y) (1-dl_y) + (h == r0_y+1) dl_y`` (and likewise
``b_p(w)`` for the second axis), the 2D forward is a single contraction over
points

    out[b] = background[b] + out_weight[b] * einsum('ph,pw->hw', pw * A, B)

i.e. a dense matmul that runs on the TPU MXU with **no scatter and no
atomics** — the TPU-native replacement for the reference's atomic adds
(`src/raster.jl:64`) and its CUDA shared-memory reductions
(`ext/DiffPointRasterisationCUDAExt.jl:107-191`).  Out-of-grid neighbours
drop out automatically because the iota comparison never matches.

The backward needs only two more matmuls per pose:

    U = einsum('pw,hw->ph', B, g)     V = einsum('ph,hw->pw', A, g)
    ds/du_y[p] = <A'_p, U_p>          ds/du_x[p] = <V_p, B'_p>
    sum_s g·W_s per (b,p) = <V_p, B_p>   (drives the two weight gradients)

with ``A'_p(h) = (h == r0+1) - (h == r0)``.  Point/pose/weight gradients then
follow from tiny contractions exactly as in the reference
(`src/raster_pullback.jl:67-72`).

Points are processed in static-size chunks via `lax.scan` so the one-hot
factors live only transiently (in VMEM once Pallas-fused; in a small HBM
buffer on the pure-XLA path here).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

from dprast.ops import geometry
from dprast.ops.core import PullbackResult

# Default matmul precision: HIGHEST gives f32-faithful accumulation on the
# MXU (bf16x3 passes), needed for the 1e-5 gradient-parity target.
_PRECISION = lax.Precision.HIGHEST

# Marker for the int8 fixed-point mode: the heavy contractions run as 6
# int8 MXU passes (see _einsum_i8).  The v5e int8 MXU is 2x the bf16 rate
# and int32 accumulation is EXACT, so this is both the fastest and a
# tightly-bounded-error mode (~2^-21 relative — well under the 1e-5
# parity target, unlike the documented ~4e-3 'matmul_bf16' fast mode).
INT8 = "int8"


def _quant3(x, axes):
    """3-level fixed-point decomposition of f32 `x`: returns
    ([q1, q2, q3] int8, scale) with
    ``x ~= scale * (q1 + q2/128 + q3/128^2) / 127`` and residual
    ``<= scale * 2^-21``.  `axes`: reduction axes for the dynamic scale
    (kept as broadcastable dims)."""
    s = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    s = jnp.maximum(s, jnp.finfo(jnp.float32).tiny * 1e10)
    qs = []
    rem = x * (127.0 / s)
    for _ in range(3):
        q = jnp.clip(jnp.round(rem), -127, 127)
        qs.append(q.astype(jnp.int8))
        rem = (rem - q) * 128.0
    return qs, s * (1.0 / 127.0)


def _einsum_i8(spec, a, b, sa_axes, sb_axes):
    """`jnp.einsum(spec, a, b)` on the int8 MXU with exact int32
    accumulation: both operands are 3-level fixed point and the 6 cross
    passes with weight >= 2^-21 are summed (dropped tail < 2^-21 relative
    to the operand scales).  2x the bf16 MXU rate on v5e."""
    qa, sa = _quant3(a, sa_axes)
    qb, sb = _quant3(b, sb_axes)
    out = None
    for ta in range(3):
        for tb in range(3):
            if ta + tb > 2:
                continue
            part = jnp.einsum(spec, qa[ta], qb[tb],
                              preferred_element_type=jnp.int32)
            term = part.astype(jnp.float32) * (128.0 ** -(ta + tb))
            out = term if out is None else out + term
    # broadcastable scales: contract the kept dims the same way einsum did
    scale = jnp.einsum(spec, sa, sb)
    return out * scale


def _heavy_einsum(spec, a, b, precision, sa_axes=(1, 2), sb_axes=(1, 2)):
    """The splat contractions: int8 cross-pass mode or a plain einsum."""
    if precision == INT8:
        return _einsum_i8(spec, a, b, sa_axes, sb_axes)
    return jnp.einsum(spec, a, b, precision=precision)


def _pick_chunk(n_points: int, batch: int, grid_size) -> int:
    """Static point-chunk size: bound transient factor memory to ~128 MiB
    while keeping the MXU contraction dimension reasonably large.  For 3D
    grids the dominant transient is the fused (B, Pc, Z*Y) plane factor."""
    if len(grid_size) == 3:
        width = grid_size[0] * grid_size[1] + sum(grid_size)
    else:
        width = sum(grid_size)  # H + W
    budget = 128 * 1024 * 1024
    chunk = budget // max(1, 4 * batch * width)
    chunk = max(8, min(n_points, chunk))
    # round to sublane multiple
    return min(int(-(-n_points // 8) * 8), int(-(-chunk // 8) * 8))


def _axis_factors(r0_ax, dl_ax, n: int, valid):
    """One-hot-pair factor matrix and its u-derivative for one output axis.

    r0_ax, dl_ax: (B, Pc) → (A, dA): (B, Pc, n).
    """
    h = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    lo = h == r0_ax[..., None]
    hi = h == (r0_ax[..., None] + 1)
    dl = dl_ax[..., None]
    a = jnp.where(lo, 1 - dl, 0) + jnp.where(hi, dl, 0)
    da = jnp.where(hi, 1.0, 0.0) - jnp.where(lo, 1.0, 0.0)
    v = valid[..., None].astype(a.dtype)
    return a * v, da * v


def _chunked(points, point_weight, chunk):
    """Pad the point axis to a multiple of `chunk` and reshape to
    (K, chunk, ...) for lax.scan. Padded entries are masked via `valid`."""
    p = points.shape[0]
    k = -(-p // chunk)
    pad = k * chunk - p
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pw = jnp.pad(point_weight, (0, pad))
    valid = jnp.arange(k * chunk) < p
    return (pts.reshape(k, chunk, -1), pw.reshape(k, chunk),
            valid.reshape(k, chunk), k, pad)


def supported(n_out: int) -> bool:
    return n_out in (1, 2, 3)


def raster_fwd(grid_size, points, rotation, translation, background,
               out_weight, point_weight, *, chunk: int | None = None,
               precision=_PRECISION):
    """Forward rasterisation via per-axis factor contractions.

    Canonical batched args (see `dprast.ops.core`) → (B, *grid_size).
    """
    n_out = len(grid_size)
    assert supported(n_out), f"matmul path supports N_out in (1,2,3), got {n_out}"
    b = rotation.shape[0]
    p, _ = points.shape
    if chunk is None:
        chunk = _pick_chunk(p, b, grid_size)
    pts_k, pw_k, valid_k, k, _ = _chunked(points, point_weight, chunk)
    dtype = jnp.result_type(points.dtype, rotation.dtype, translation.dtype)

    light = _PRECISION if precision == INT8 else precision

    def step(acc, xs):
        pts_c, pw_c, valid_c = xs
        r0, dl = geometry.pose_voxel_and_deltas(pts_c, rotation,
                                                translation, grid_size)
        facs = [
            _axis_factors(r0[..., i], dl[..., i], grid_size[i], valid_c[None, :])[0]
            for i in range(n_out)
        ]
        # fold the per-point weight into the first factor
        facs[0] = facs[0] * pw_c[None, :, None]
        if n_out == 1:
            upd = jnp.einsum("bph->bh", facs[0], precision=light)
        elif n_out == 2:
            upd = _heavy_einsum("bph,bpw->bhw", facs[0], facs[1],
                                precision)
        else:  # n_out == 3: fuse (z, y) then contract with x on the MXU
            zy = jnp.einsum("bpz,bpy->bpzy", facs[0], facs[1],
                            precision=light)
            zy = zy.reshape(b, chunk, grid_size[0] * grid_size[1])
            upd = _heavy_einsum("bpk,bpx->bkx", zy, facs[2],
                                precision).reshape(
                                    (b,) + tuple(grid_size))
        return acc + upd, None

    acc0 = geometry.zeros_vma((b,) + tuple(grid_size), dtype,
                              points, rotation, translation, out_weight,
                              point_weight)
    acc, _ = lax.scan(step, acc0, (pts_k, pw_k, valid_k))
    out = acc * out_weight.reshape((b,) + (1,) * n_out)
    return out + background.reshape((b,) + (1,) * n_out).astype(out.dtype)


def raster_pullback(grid_size, points, rotation, translation, background,
                    out_weight, point_weight, ds_dout, *,
                    chunk: int | None = None,
                    precision=_PRECISION) -> PullbackResult:
    """Analytic pullback via factor-matrix contractions (gather-free AND
    scatter-free).  Returns `PullbackResult` (see `dprast.ops.core`)."""
    n_out = len(grid_size)
    assert supported(n_out)
    b = rotation.shape[0]
    p, n_in = points.shape
    if chunk is None:
        chunk = _pick_chunk(p, b, grid_size)
    pts_k, pw_k, valid_k, k, pad = _chunked(points, point_weight, chunk)

    g = ds_dout  # (B, *grid)
    light = _PRECISION if precision == INT8 else precision

    def step(carry, xs):
        pts_c, pw_c, valid_c = xs
        r0, dl = geometry.pose_voxel_and_deltas(pts_c, rotation,
                                                translation, grid_size)
        fs = [
            _axis_factors(r0[..., i], dl[..., i], grid_size[i], valid_c[None, :])
            for i in range(n_out)
        ]  # list of (A_i, dA_i), each (B, Pc, n_i)

        if n_out == 1:
            (a0, d0), = fs
            u0 = g  # (B, H)
            gW = jnp.einsum("bph,bh->bp", a0, g, precision=light)
            ds_du = jnp.einsum("bph,bh->bp", d0, g,
                               precision=light)[..., None]
        elif n_out == 2:
            (a0, d0), (a1, d1) = fs
            # U[p,h] = sum_w B[p,w] g[h,w] ; V[p,w] = sum_h A[p,h] g[h,w]
            u0 = _heavy_einsum("bpw,bhw->bph", a1, g, precision)
            v1 = _heavy_einsum("bph,bhw->bpw", a0, g, precision)
            gW = jnp.einsum("bpw,bpw->bp", v1, a1, precision=light)
            ds_du = jnp.stack([
                jnp.einsum("bph,bph->bp", d0, u0, precision=light),
                jnp.einsum("bpw,bpw->bp", v1, d1, precision=light),
            ], axis=-1)
        else:
            (a0, d0), (a1, d1), (a2, d2) = fs
            gz, gy, gx = grid_size
            gf = g.reshape(b, gz * gy, gx)
            # contract x first: E[p, zy] = sum_x A2[p,x] g[zy, x]
            e = _heavy_einsum("bpx,bkx->bpk", a2, gf,
                              precision).reshape(b, chunk, gz, gy)
            ey = jnp.einsum("bpy,bpzy->bpz", a1, e, precision=light)
            gW = jnp.einsum("bpz,bpz->bp", a0, ey, precision=light)
            ds_du_z = jnp.einsum("bpz,bpz->bp", d0, ey, precision=light)
            ds_du_y = jnp.einsum(
                "bpz,bpy,bpzy->bp", a0, d1, e, precision=light)
            # contract z,y first for the x gradient
            ezy = jnp.einsum("bpz,bpy->bpzy", a0, a1, precision=light)
            ezy = ezy.reshape(b, chunk, gz * gy)
            ds_du_x = jnp.einsum("bpk,bpx,bkx->bp", ezy, d2, gf,
                                 precision=light)
            ds_du = jnp.stack([ds_du_z, ds_du_y, ds_du_x], axis=-1)

        # weight gradients from gW = sum_s g · W_s  per (b, p)
        d_ow = jnp.einsum("bp,p->b", gW, pw_c, precision=light)
        d_pw = jnp.einsum("bp,b->p", gW, out_weight,
                          precision=light)

        scale = jnp.asarray(grid_size, dtype=ds_du.dtype) / 2
        coeff = (out_weight[:, None] * pw_c[None, :])[..., None]
        scaled = ds_du * coeff * scale  # (B, Pc, N_out)

        d_t = jnp.sum(scaled, axis=1)                                # (B, N_out)
        d_r = jnp.einsum("bpo,pi->boi", scaled, pts_c,
                         precision=light)
        d_p = jnp.einsum("boi,bpo->pi", rotation, scaled,
                         precision=light)               # (Pc, N_in)

        c_t, c_r, c_ow = carry
        return (c_t + d_t, c_r + d_r, c_ow + d_ow), (d_p, d_pw)

    dtype = jnp.result_type(points.dtype, rotation.dtype, ds_dout.dtype)
    like = (points, rotation, translation, out_weight, point_weight, ds_dout)
    carry0 = (geometry.zeros_vma((b, n_out), dtype, *like),
              geometry.zeros_vma((b, n_out, n_in), dtype, *like),
              geometry.zeros_vma((b,), dtype, *like))
    (d_t, d_r, d_ow), (d_p_k, d_pw_k) = lax.scan(
        step, carry0, (pts_k, pw_k, valid_k))

    d_points = d_p_k.reshape(k * chunk, n_in)[:p]
    d_pw = d_pw_k.reshape(k * chunk)[:p]
    d_bg = jnp.sum(g.reshape(b, -1), axis=-1)

    return PullbackResult(points=d_points, rotation=d_r, translation=d_t,
                          background=d_bg, out_weight=d_ow,
                          point_weight=d_pw)
