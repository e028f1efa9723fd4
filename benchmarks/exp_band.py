"""Design experiments for fusing the cotangent-band fetch INTO the
backward gather kernel (r5; STATUS r4's sketched candidate).

E2 here answers the load-bearing question: the fused kernel would carve
windows from the DMA'd band in NATURAL orientation (rows, cols), so the
gather contraction must run "TN" (contracting the SUBLANE axis of both
operands) instead of the shipped "NN" form that consumes pre-transposed
(cols, rows) windows.  If Mosaic's TN lowering costs extra, the fuse
needs an in-kernel transpose (or a carve-by-matmul) and the economics
change.  Usage: python benchmarks/exp_band.py [--grid 1024,1024]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dprast.ops.splat_binned import (_SPLIT_TERMS, _default_chunk,
                                     _keys_and_local, _planes_bwd,
                                     _prep_binned_all, _unfold,
                                     _unfold_pl_2d, n_tiles, tile_shape_for)
from benchmarks.timing import per_iter


def _bwd_kernel_orient(st_ref, lane_ref, g_ref, buf_ref, *, ts, chunk,
                       n_out, transposed):
    """2D-only copy of the production gather kernel with an orientation
    switch: transposed=True consumes (cols_e, rows_e) windows with the
    shipped NN contraction; False consumes natural (rows_e, cols_e)
    windows with a TN contraction (both operands contract dim 0)."""
    b = pl.program_id(0)
    s = pl.program_id(1)
    live = s < st_ref[b, pl.num_programs(1)]

    @pl.when(live)
    def _():
        cols_e = ts[1] + 1
        rows_e = ts[0] + 1
        gt = g_ref[0, 0]
        lane = lane_ref[0]
        rows = [lane[0:1, :], lane[0:1, :] + 1]
        dly = lane[1:2, :]
        g_terms = []
        rem = gt
        for _i in range(_SPLIT_TERMS):
            t_i = rem.astype(jnp.bfloat16)
            g_terms.append(t_i)
            rem = rem - t_i.astype(jnp.float32)
        dims = ((((1,) if transposed else (0,)), (0,)), ((), ()))
        iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)

        def gather_row(r):
            o = (iota_r == r.astype(jnp.int32)).astype(jnp.bfloat16)
            acc = None
            for t_i in g_terms:
                part = lax.dot_general(t_i, o, dims,
                                       preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            return acc

        p0, p1 = [gather_row(r) for r in rows]
        v1 = (1 - dly) * p0 + dly * p1
        ix0 = lane[-2:-1, :].astype(jnp.int32)
        dlx = lane[-1:, :]
        iota = lax.broadcasted_iota(jnp.int32, (cols_e, chunk), 0)
        lo = iota == ix0
        hi = iota == ix0 + 1
        bx = jnp.where(lo, 1 - dlx, 0.0) + jnp.where(hi, dlx, 0.0)
        dbx = jnp.where(hi, 1.0, 0.0) - jnp.where(lo, 1.0, 0.0)
        gw = jnp.sum(v1 * bx, axis=0, keepdims=True)
        duy = jnp.sum((p1 - p0) * bx, axis=0, keepdims=True)
        dux = jnp.sum(v1 * dbx, axis=0, keepdims=True)
        buf_ref[0] = jnp.concatenate([duy, dux, gw], axis=0)

    @pl.when(jnp.logical_not(live))
    def _():
        buf_ref[0] = jnp.zeros((n_out + 1, chunk), jnp.float32)


def _bwd_kernel_presplit(st_ref, lane_ref, ghi_ref, glo_ref, buf_ref, *,
                         ts, chunk, n_out):
    """E3: consumes pre-split bf16 window pairs (hi, lo) — the
    per-instance 2-term split moves out of the kernel (it would fuse
    into the unfold's band writes in production).  Same bytes through
    HBM (2 x bf16 == f32)."""
    b = pl.program_id(0)
    s = pl.program_id(1)
    live = s < st_ref[b, pl.num_programs(1)]

    @pl.when(live)
    def _():
        cols_e = ts[1] + 1
        rows_e = ts[0] + 1
        lane = lane_ref[0]
        rows = [lane[0:1, :], lane[0:1, :] + 1]
        dly = lane[1:2, :]
        g_terms = [ghi_ref[0, 0], glo_ref[0, 0]]
        dims = (((1,), (0,)), ((), ()))
        iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)

        def gather_row(r):
            o = (iota_r == r.astype(jnp.int32)).astype(jnp.bfloat16)
            acc = None
            for t_i in g_terms:
                part = lax.dot_general(t_i, o, dims,
                                       preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            return acc

        p0, p1 = [gather_row(r) for r in rows]
        v1 = (1 - dly) * p0 + dly * p1
        ix0 = lane[-2:-1, :].astype(jnp.int32)
        dlx = lane[-1:, :]
        iota = lax.broadcasted_iota(jnp.int32, (cols_e, chunk), 0)
        lo = iota == ix0
        hi = iota == ix0 + 1
        bx = jnp.where(lo, 1 - dlx, 0.0) + jnp.where(hi, dlx, 0.0)
        dbx = jnp.where(hi, 1.0, 0.0) - jnp.where(lo, 1.0, 0.0)
        gw = jnp.sum(v1 * bx, axis=0, keepdims=True)
        duy = jnp.sum((p1 - p0) * bx, axis=0, keepdims=True)
        dux = jnp.sum(v1 * dbx, axis=0, keepdims=True)
        buf_ref[0] = jnp.concatenate([duy, dux, gw], axis=0)

    @pl.when(jnp.logical_not(live))
    def _():
        buf_ref[0] = jnp.zeros((n_out + 1, chunk), jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="1024,1024")
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    grid = tuple(int(x) for x in args.grid.split(","))
    assert len(grid) == 2
    n_out = 2
    p, b = args.points, args.batch
    chunk = _default_chunk(grid, p)
    ts = tile_shape_for(grid)
    nt = n_tiles(grid, ts)
    rows_e, cols_e = ts[0] + 1, ts[1] + 1

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    pts = jax.random.normal(ks[0], (p, 3), jnp.float32) * 0.4
    rot = jnp.tile(jnp.eye(3)[:n_out][None], (b, 1, 1))
    tr = jax.random.normal(ks[1], (b, n_out), jnp.float32) * 0.1

    def prep(tr_):
        key, locs, _ = _keys_and_local(grid, ts, pts, rot, tr_)
        ptidx = jnp.broadcast_to(
            jnp.arange(p, dtype=jnp.float32)[None, :], key.shape)
        return _prep_binned_all(key, list(locs) + [ptidx],
                                [0.0] * n_out + [float(p)], nt,
                                chunk, False, pack_idx=True)

    data, slot_tile = jax.jit(prep)(tr)
    data.block_until_ready()
    s_pad = data.shape[-1]
    n_slots = s_pad // chunk
    print(f"grid={grid} nt={nt} chunk={chunk} s_pad={s_pad} "
          f"n_slots={n_slots}", flush=True)

    g = jax.random.normal(ks[3], (b,) + grid, jnp.float32)
    g_t = jax.jit(lambda g_: _unfold_pl_2d(g_, grid, ts))(g)
    g_n = jax.jit(lambda g_: _unfold(g_, grid, ts, transposed=False))(g)
    jax.block_until_ready((g_t, g_n))
    lane_b = jax.jit(lambda cd: _planes_bwd(cd, ts, n_out))(data[:, :n_out])
    lane_b.block_until_ready()

    def kernel(lane_, g_ext_, st_, transposed):
        blk = (1, 1, cols_e, rows_e) if transposed else \
            (1, 1, rows_e, cols_e)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_slots),
            in_specs=[pl.BlockSpec((1, lane_.shape[1], chunk),
                                   lambda bb, s, st: (bb, 0, s),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(blk,
                                   lambda bb, s, st: (bb, st[bb, s], 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, n_out + 1, chunk),
                                   lambda bb, s, st: (bb, 0, s),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel_orient, ts=ts, chunk=chunk,
                              n_out=n_out, transposed=transposed),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, n_out + 1, s_pad),
                                           jnp.float32),
        )(st_, lane_, g_ext_)

    # correctness: both orientations must agree bit-exactly
    buf_t = jax.jit(lambda l, gg, st: kernel(l, gg, st, True))(
        lane_b, g_t, slot_tile)
    buf_n = jax.jit(lambda l, gg, st: kernel(l, gg, st, False))(
        lane_b, g_n, slot_tile)
    same = bool(jnp.all(buf_t == buf_n))
    print(f"NN vs TN bit-exact: {same}", flush=True)

    t_nn = per_iter(lambda c, l, gg, st: kernel(
        l + c * 1e-30, gg, st, True).ravel()[0], lane_b, g_t, slot_tile)
    print(f"kernel NN (transposed windows)  {t_nn*1e3:8.2f} ms", flush=True)
    t_tn = per_iter(lambda c, l, gg, st: kernel(
        l + c * 1e-30, gg, st, False).ravel()[0], lane_b, g_n, slot_tile)
    print(f"kernel TN (natural windows)     {t_tn*1e3:8.2f} ms", flush=True)

    # E3: pre-split bf16 windows
    def split2(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    g_hi, g_lo = jax.jit(split2)(g_t)
    jax.block_until_ready((g_hi, g_lo))

    def kernel_ps(lane_, ghi_, glo_, st_):
        blk = pl.BlockSpec((1, 1, cols_e, rows_e),
                           lambda bb, s, st: (bb, st[bb, s], 0, 0),
                           memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_slots),
            in_specs=[pl.BlockSpec((1, lane_.shape[1], chunk),
                                   lambda bb, s, st: (bb, 0, s),
                                   memory_space=pltpu.VMEM), blk, blk],
            out_specs=pl.BlockSpec((1, n_out + 1, chunk),
                                   lambda bb, s, st: (bb, 0, s),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel_presplit, ts=ts, chunk=chunk,
                              n_out=n_out),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, n_out + 1, s_pad),
                                           jnp.float32),
        )(st_, lane_, ghi_, glo_)

    buf_ps = jax.jit(kernel_ps)(lane_b, g_hi, g_lo, slot_tile)
    same_ps = bool(jnp.all(buf_t == buf_ps))
    print(f"presplit bit-exact: {same_ps}", flush=True)
    t_ps = per_iter(lambda c, l, gh, gl, st: kernel_ps(
        l + c * 1e-30, gh, gl, st).ravel()[0],
        lane_b, g_hi, g_lo, slot_tile)
    print(f"kernel NN presplit bf16         {t_ps*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
