"""Experiment: hat-function weight construction for the binned forward.

The production kernel builds per-branch one-hot ROW matrices with integer
compares and multiplies values in afterwards (`o_s[i] * a`).  The bilinear
weight can instead be built directly as a hat function,

    weight(pos) = relu(1 - |(r0 - pos) + dl|)

where ``r0 - pos`` is an exact small integer and ``dl`` an exact f32 — so
the construction is exact to f32 like the compare form, but costs ~6 VPU
ops per plane instead of ~10-16.  This script cross-checks the hat kernel
against the production kernel in interpret mode and times both on TPU.

Usage: python benchmarks/exp_hat.py [--grid 1024,1024] [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--interpret" in sys.argv:
    # the env var alone does not beat pre-registered platform plugins
    # (the axon tunnel); the config update does
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.timing import per_iter
from dprast.ops import splat_binned as sb


def _planes_fwd_hat(data, ts, n_out):
    """Hat-kernel feeds: lane rows carry (r0_y, dl_y) [+ z planes in 3D]
    and the 2S bf16-split branch coefficients c_s (WITHOUT the x factor);
    sub carries (r0_x, dl_x) columns."""
    f32 = jnp.float32
    ix0, dlx = sb._decode_coord(data[:, n_out - 1])
    w = data[:, n_out]
    if n_out == 2:
        iy0, dly = sb._decode_coord(data[:, 0])
        lane = [iy0.astype(f32), dly, w]
    else:
        iz0, dlz = sb._decode_coord(data[:, 0])
        iy0, dly = sb._decode_coord(data[:, 1])
        lane = [iz0.astype(f32), dlz, iy0.astype(f32), dly, w]
    sub = jnp.stack([ix0.astype(f32), dlx], axis=-1)       # (B, s, 2)
    return (jnp.stack(lane, axis=1),
            jnp.zeros(w.shape, jnp.bfloat16)[:, None],     # unused
            sub)


def _planes_fwd_hatrow(data, ts, n_out):
    """Hatrow-kernel feeds: lane rows carry the decoded row-axis hat
    parameters plus w and dlx (the x split factors are applied in-kernel
    as (1, C) lane broadcasts); sub carries the ix0 column (pure one-hot
    x side, exactly as production)."""
    f32 = jnp.float32
    ix0, dlx = sb._decode_coord(data[:, n_out - 1])
    w = data[:, n_out]
    if n_out == 2:
        iy0, dly = sb._decode_coord(data[:, 0])
        lane = [iy0.astype(f32), dly, w, dlx]
    else:
        iz0, dlz = sb._decode_coord(data[:, 0])
        iy0, dly = sb._decode_coord(data[:, 1])
        lane = [iz0.astype(f32), dlz, iy0.astype(f32), dly, w, dlx]
    return (jnp.stack(lane, axis=1),
            jnp.zeros(w.shape, jnp.bfloat16)[:, None],     # unused
            ix0.astype(f32)[..., None])


def _fwd_kernel_hatrow(st_ref, lane_ref, lanev_ref, sub_ref, ext_ref, *,
                       ts, chunk, halo, n_out):
    """Hat construction on the ROW side only; the x columns stay pure
    {0, 1} one-hots, so every matmul is (bf16-split value) x (exact
    one-hot) — the same error contract as the production kernel."""
    b = pl.program_id(0)
    s = pl.program_id(1)
    t_cur = st_ref[b, s]
    t_prev = st_ref[b, jnp.maximum(s - 1, 0)]
    first = jnp.logical_or(s == 0, t_cur != t_prev)

    cols_e = ts[-1] + (1 if halo else 0)
    lane = lane_ref[0]
    if n_out == 2:
        rows_e = ts[0] + (1 if halo else 0)
        iy0 = lane[0:1, :].astype(jnp.int32)
        dly = lane[1:2, :]
        w = lane[2:3, :]
        dlx = lane[3:4, :]
        iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)
        m = jnp.maximum(1.0 - jnp.abs((iy0 - iota_r).astype(jnp.float32)
                                      + dly), 0.0) * w     # (rows_e, C)
    else:
        rows_e = (ts[0] + 1) * (ts[1] + 1)
        tyq = ts[1] + 1
        iz0 = lane[0:1, :].astype(jnp.int32)
        dlz = lane[1:2, :]
        iy0 = lane[2:3, :].astype(jnp.int32)
        dly = lane[3:4, :]
        w = lane[4:5, :]
        dlx = lane[5:6, :]
        iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)
        z_r = iota_r // tyq
        y_r = iota_r % tyq
        hz = jnp.maximum(1.0 - jnp.abs((iz0 - z_r).astype(jnp.float32)
                                       + dlz), 0.0)
        hy = jnp.maximum(1.0 - jnp.abs((iy0 - y_r).astype(jnp.float32)
                                       + dly), 0.0)
        m = hz * hy * w

    lo, hi = sb._x_selects(sub_ref[0][:, 0:1], chunk, cols_e)
    xs = [lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)]
    cxs = [1.0 - dlx, dlx]

    dims = (((1,), (0,)), ((), ()))
    acc = None
    for j in (0, 1):
        mj = m * cxs[j]
        mh = mj.astype(jnp.bfloat16)
        ml = (mj - mh.astype(jnp.float32)).astype(jnp.bfloat16)
        for half in (mh, ml):
            part = lax.dot_general(half, xs[j], dims,
                                   preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part

    @pl.when(first)
    def _():
        ext_ref[0, 0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        ext_ref[0, 0] = ext_ref[0, 0] + acc


def _fwd_kernel_hat(st_ref, lane_ref, lanev_ref, sub_ref, ext_ref, *, ts,
                    chunk, halo, n_out):
    b = pl.program_id(0)
    s = pl.program_id(1)
    t_cur = st_ref[b, s]
    t_prev = st_ref[b, jnp.maximum(s - 1, 0)]
    first = jnp.logical_or(s == 0, t_cur != t_prev)

    cols_e = ts[-1] + (1 if halo else 0)
    lane = lane_ref[0]
    # hat rows: weight at row r = relu(1 - |(r0 - r) + dl|); r0 - r is an
    # exact small int, dl exact f32 -> the sum is exact where the hat is
    # nonzero.  Inert rows (r0 = -3) never reach |.| < 1.
    if n_out == 2:
        rows_e = ts[0] + (1 if halo else 0)
        iy0 = lane[0:1, :].astype(jnp.int32)               # (1, C)
        dly = lane[1:2, :]
        w = lane[2:3, :]
        iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)
        m = jnp.maximum(1.0 - jnp.abs((iy0 - iota_r).astype(jnp.float32)
                                      + dly), 0.0) * w     # (rows_e, C)
    else:
        # flattened (z, y) stencil rows; ty+1 is a power of two by tile
        # design so row -> (z, y) is a shift + mask
        rows_e = (ts[0] + 1) * (ts[1] + 1)
        tyq = ts[1] + 1
        iz0 = lane[0:1, :].astype(jnp.int32)
        dlz = lane[1:2, :]
        iy0 = lane[2:3, :].astype(jnp.int32)
        dly = lane[3:4, :]
        w = lane[4:5, :]
        iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)
        z_r = iota_r // tyq
        y_r = iota_r % tyq
        hz = jnp.maximum(1.0 - jnp.abs((iz0 - z_r).astype(jnp.float32)
                                       + dlz), 0.0)
        hy = jnp.maximum(1.0 - jnp.abs((iy0 - y_r).astype(jnp.float32)
                                       + dly), 0.0)
        m = hz * hy * w
    # value side formed in f32 THEN split (a bf16*bf16 elementwise
    # product would round uncompensated; the MXU products below are
    # exact with f32 accumulation)
    mh = m.astype(jnp.bfloat16)
    ml = (m - mh.astype(jnp.float32)).astype(jnp.bfloat16)

    sub = sub_ref[0]                                       # (C, 2)
    ix0 = sub[:, 0:1].astype(jnp.int32)
    dlx = sub[:, 1:2]
    iota_c = lax.broadcasted_iota(jnp.int32, (chunk, cols_e), 1)
    hx = jnp.maximum(1.0 - jnp.abs((ix0 - iota_c).astype(jnp.float32)
                                   + dlx), 0.0)            # (C, cols_e)
    xh = hx.astype(jnp.bfloat16)
    xl = (hx - xh.astype(jnp.float32)).astype(jnp.bfloat16)

    dims = (((1,), (0,)), ((), ()))
    acc = lax.dot_general(mh, xh, dims,
                          preferred_element_type=jnp.float32)
    acc = acc + lax.dot_general(mh, xl, dims,
                                preferred_element_type=jnp.float32)
    acc = acc + lax.dot_general(ml, xh, dims,
                                preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        ext_ref[0, 0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        ext_ref[0, 0] = ext_ref[0, 0] + acc


def run(grid, p, b, interpret):
    n_out = len(grid)
    chunk = sb._default_chunk(grid, p)
    ts = sb.tile_shape_for(grid)
    nt = sb.n_tiles(grid, ts)
    halo = not sb._single_tile(grid)
    if n_out == 2:
        rows_e = ts[0] + (1 if halo else 0)
    else:
        rows_e = (ts[0] + 1) * (ts[1] + 1)
    cols_e = ts[-1] + (1 if halo else 0)

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    pts = jax.random.normal(ks[0], (p, 3), jnp.float32) * 0.4
    rot = jnp.tile(jnp.eye(3)[:n_out][None], (b, 1, 1))
    tr = jax.random.normal(ks[1], (b, n_out), jnp.float32) * 0.1
    pw = jax.random.uniform(ks[2], (p,), jnp.float32, 0.5, 2.0)

    key, locs, _ = sb._keys_and_local(grid, ts, pts, rot, tr)
    fills = [0.0] * n_out + [0.0]
    if halo:
        data, slot_tile = jax.vmap(
            lambda k, *pls: sb._prep_binned(k, list(pls), fills, nt, chunk,
                                            True)
        )(key, *locs, jnp.broadcast_to(pw[None], key.shape))
    else:
        data, slot_tile = jax.vmap(
            lambda *pls: sb._prep_direct(list(pls), fills, chunk)
        )(*locs, jnp.broadcast_to(pw[None], key.shape))
    s_pad = data.shape[-1]
    n_slots = s_pad // chunk
    print(f"grid={grid} chunk={chunk} s_pad={s_pad}", flush=True)

    def call(kern, planes_fn, label):
        lane, lanev, sub = jax.jit(
            lambda d: planes_fn(d, ts, n_out))(data[:, :n_out + 1])

        def f(lane_, lanev_, sub_, st_):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, n_slots),
                in_specs=[pl.BlockSpec((1, lane_.shape[1], chunk),
                                       lambda bb, s, st: (bb, 0, s),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, lanev_.shape[1], chunk),
                                       lambda bb, s, st: (bb, 0, s),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, chunk, sub_.shape[-1]),
                                       lambda bb, s, st: (bb, s, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 1, rows_e, cols_e),
                                       lambda bb, s, st:
                                       (bb, st[bb, s], 0, 0),
                                       memory_space=pltpu.VMEM),
            )
            return pl.pallas_call(
                functools.partial(kern, ts=ts, chunk=chunk, halo=halo,
                                  n_out=n_out),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((b, nt, rows_e, cols_e),
                                               jnp.float32),
                interpret=interpret,
            )(st_, lane_, lanev_, sub_)

        ext = jax.jit(f)(lane, lanev, sub, slot_tile)
        ext.block_until_ready()
        if not interpret:
            t = per_iter(lambda c, l_, lv, su, st_: f(
                l_ + c * 1e-30, lv, su, st_).ravel()[0],
                lane, lanev, sub, slot_tile)
            print(f"{label:10s} {t*1e3:8.2f} ms", flush=True)
        return ext

    ext_ref = call(sb._fwd_kernel, sb._planes_fwd, "prod")
    ext_hat = call(_fwd_kernel_hat, _planes_fwd_hat, "hat")
    ext_hr = call(_fwd_kernel_hatrow, _planes_fwd_hatrow, "hatrow")
    scale = float(jnp.maximum(jnp.max(jnp.abs(ext_ref)), 1e-9))
    err = float(jnp.max(jnp.abs(ext_ref - ext_hat))) / scale
    err_hr = float(jnp.max(jnp.abs(ext_ref - ext_hr))) / scale
    print(f"hat    vs prod normalized max err: {err:.3e}", flush=True)
    print(f"hatrow vs prod normalized max err: {err_hr:.3e}", flush=True)
    assert err < 3e-5, err
    assert err_hr < 3e-6, err_hr  # same split-vs-one-hot contract as prod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="1024,1024")
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    grid = tuple(int(x) for x in args.grid.split(","))
    run(grid, args.points, args.batch, args.interpret)


if __name__ == "__main__":
    main()
