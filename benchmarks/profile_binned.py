"""Stage-by-stage timing of the binned backend on the real TPU.

Each stage is timed with the chained-iteration trick (see bench.py): the
stage's inputs are precomputed once, a tiny data-dependent perturbation
chains the iterations, and two K values are linear-fitted.

Usage: python benchmarks/profile_binned.py [--grid 1024,1024] [--points N]
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

from dprast.ops import splat_binned
from dprast.ops.splat_binned import (_default_chunk, _fold, _fold_pl_2d,
                                     _band_pl_ok, _unfold, _unfold_pl_2d,
                                     _keys_and_local, _prep_binned,
                                     _prep_binned_all, n_tiles,
                                     tile_shape_for)
from benchmarks.timing import per_iter as _shared_per_iter


def per_iter(step, args, k1=2, k2=6):
    return _shared_per_iter(step, *args, k1=k1, k2=k2)




def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="1024,1024")
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=0)
    args = ap.parse_args()
    grid = tuple(int(x) for x in args.grid.split(","))
    n_out = len(grid)
    p, b = args.points, args.batch
    chunk = args.chunk or _default_chunk(grid, args.points)
    ts = tile_shape_for(grid)
    nt = n_tiles(grid, ts)

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    pts = jax.random.normal(ks[0], (p, 3), jnp.float32) * 0.4
    rot = jnp.tile(jnp.eye(3)[:n_out][None], (b, 1, 1))
    tr = jax.random.normal(ks[1], (b, n_out), jnp.float32) * 0.1
    bg = jnp.zeros((b,), jnp.float32)
    ow = jnp.ones((b,), jnp.float32)
    pw = jax.random.uniform(ks[2], (p,), jnp.float32, 0.5, 2.0)

    fills = [0.0] * n_out + [0.0, float(p)]

    def prep(tr_):
        key, locs, _ = _keys_and_local(grid, ts, pts, rot, tr_)
        # weight plane = the POINT weight only (out_weight applies at the
        # fold epilogue in production); pw_uniform calls drop it entirely
        w = jnp.broadcast_to(pw[None, :], key.shape)
        ptidx = jnp.broadcast_to(
            jnp.arange(p, dtype=jnp.float32)[None, :], key.shape)
        return _prep_binned_all(key, list(locs) + [w, ptidx], fills, nt,
                                chunk, True, pack_idx=True)

    data, slot_tile = jax.jit(prep)(tr)
    data.block_until_ready()
    s_pad = data.shape[-1]
    print(f"grid={grid} ts={ts} nt={nt} chunk={chunk} "
          f"s_pad={s_pad} n_slots={s_pad // chunk} batch={b}", flush=True)

    # force EVERY sorted plane AND every sort-chunk: a single
    # .ravel()[0] touches only pose 0, and the per-16-pose chunked
    # sorts are independent ops — XLA drops the other chunks' sorts
    # entirely (re-measured r5: prep read 3.6 ms with pose-0 forcing
    # vs ~13 with all four chunks forced at B=64, exactly the 4x)
    from dprast.ops.splat_binned import _SORT_BATCH

    def _force(d):
        return sum(d[k, i].ravel()[0]
                   for k in range(0, d.shape[0], _SORT_BATCH)
                   for i in range(d.shape[1]))

    t = per_iter(lambda c: _force(prep(tr + c * 1e-30)[0]), ())
    print(f"prep fwd (key+3)      {t*1e3:8.2f} ms", flush=True)

    def prep_bwd(tr_):
        key, locs, _ = _keys_and_local(grid, ts, pts, rot, tr_)
        ptidx = jnp.broadcast_to(
            jnp.arange(p, dtype=jnp.float32)[None, :], key.shape)
        return _prep_binned_all(key, list(locs) + [ptidx],
                                [0.0] * n_out + [float(p)], nt,
                                chunk, False, pack_idx=True)

    t = per_iter(lambda c: _force(prep_bwd(tr + c * 1e-30)[0]), ())
    print(f"prep bwd (key+2)      {t*1e3:8.2f} ms", flush=True)

    t = per_iter(lambda c, pts_: _keys_and_local(
        grid, ts, pts_, rot, tr)[1][0].ravel()[0], (pts,))
    print(f"  keys only           {t*1e3:8.2f} ms", flush=True)

    # forward kernel + fold, separately
    from dprast.ops.splat_binned import _fwd_kernel, _out_struct, \
        _single_tile, _planes_fwd, _planes_bwd
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    halo = not _single_tile(grid)
    if n_out == 2:
        rows_e = ts[0] + (1 if halo else 0)
    else:
        rows_e = (ts[0] + 1) * (ts[1] + 1)
    cols_e = ts[-1] + (1 if halo else 0)
    n_slots = s_pad // chunk

    lane = jax.jit(lambda d: _planes_fwd(d[:, :n_out], d[:, n_out], ts,
                                         n_out))(data[:, :n_out + 1])
    lane.block_until_ready()
    t = per_iter(lambda c, d: _planes_fwd(
        d[:, :n_out] + c * 1e-30, d[:, n_out], ts,
        n_out).ravel()[0], (data[:, :n_out + 1],))
    print(f"fwd planes            {t*1e3:8.2f} ms", flush=True)

    def fwd_kernel(lane_, st_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_slots),
            in_specs=[pl.BlockSpec((1, lane_.shape[1], chunk),
                                   lambda bb, s, st: (bb, 0, s),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, rows_e, cols_e),
                                   lambda bb, s, st: (bb, st[bb, s], 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(_fwd_kernel, ts=ts, chunk=chunk, halo=halo,
                              n_out=n_out),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, nt, rows_e, cols_e),
                                           jnp.float32),
            interpret=False,
        )(st_, lane_)

    t = per_iter(lambda c, l_, st_: fwd_kernel(
        l_ + c * 1e-30, st_).ravel()[0],
        (lane, slot_tile))
    print(f"fwd kernel            {t*1e3:8.2f} ms", flush=True)

    ext = jax.jit(fwd_kernel)(lane, slot_tile)
    ext.block_until_ready()
    if halo and _band_pl_ok(grid, ts):
        t = per_iter(lambda c, e: _fold_pl_2d(
            e + c * 1e-30, grid, ts).ravel()[0], (ext,))
        print(f"fold (pallas)         {t*1e3:8.2f} ms", flush=True)
    else:
        t = per_iter(lambda c, e: _fold(
            e + c * 1e-30, grid, ts, halo).ravel()[0], (ext,))
        print(f"fold                  {t*1e3:8.2f} ms", flush=True)

    # backward stages
    g = jax.random.normal(ks[3], (b,) + grid, jnp.float32)
    if n_out == 2 and halo:
        t = per_iter(lambda c, g_: _unfold_pl_2d(
            g_ + c * 1e-30, grid, ts).ravel()[0], (g,))
        print(f"unfold^T (pallas)     {t*1e3:8.2f} ms", flush=True)
    else:
        t = per_iter(lambda c, g_: _unfold(
            g_ + c * 1e-30, grid, ts, transposed=True).ravel()[0], (g,))
        print(f"unfold^T              {t*1e3:8.2f} ms", flush=True)

    from dprast.ops.splat_binned import _bwd_kernel
    if not halo:
        g_ext = jax.jit(lambda g_: jnp.swapaxes(g_, 1, 2))(g)
    elif n_out == 2:
        g_ext = jax.jit(lambda g_: _unfold_pl_2d(g_, grid, ts))(g)
    else:
        g_ext = jax.jit(lambda g_: _unfold(g_, grid, ts,
                                           transposed=True))(g)
    g_ext.block_until_ready()

    coord = data[:, :n_out]
    lane_b = jax.jit(lambda cd: _planes_bwd(cd, ts, n_out))(coord)
    lane_b.block_until_ready()
    t = per_iter(lambda c, cd: _planes_bwd(
        cd + c * 1e-30, ts, n_out).ravel()[0], (coord,))
    print(f"bwd planes            {t*1e3:8.2f} ms", flush=True)

    def bwd_kernel(lane_, g_ext_, st_):
        if halo:
            g_spec = pl.BlockSpec((1, 1, cols_e, rows_e),
                                  lambda bb, s, st: (bb, st[bb, s], 0, 0),
                                  memory_space=pltpu.VMEM)
        else:
            g_spec = pl.BlockSpec((1, ts[1], ts[0]),
                                  lambda bb, s, st: (bb, 0, 0),
                                  memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_slots),
            in_specs=[pl.BlockSpec((1, lane_.shape[1], chunk),
                                   lambda bb, s, st: (bb, 0, s),
                                   memory_space=pltpu.VMEM), g_spec],
            out_specs=pl.BlockSpec((1, n_out + 1, chunk),
                                   lambda bb, s, st: (bb, 0, s),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel, ts=ts, chunk=chunk, halo=halo,
                              n_out=n_out),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, n_out + 1, s_pad),
                                           jnp.float32),
            interpret=False,
        )(st_, lane_, g_ext_)

    t = per_iter(lambda c, la, ge, st_: bwd_kernel(
        la + c * 1e-30, ge, st_).ravel()[0], (lane_b, g_ext, slot_tile))
    print(f"bwd kernel            {t*1e3:8.2f} ms", flush=True)

    buf = jax.jit(bwd_kernel)(lane_b, g_ext, slot_tile)
    buf.block_until_ready()
    idx_rows = data[:, n_out + 1]

    def unsort(c, buf_, idx_):
        # mirrors _pullback_from_frame's batch-size-dependent choice
        if b <= 8:
            seg = (jnp.arange(b, dtype=jnp.int32) << 24)[:, None]
            kf = ((idx_ + c * 1e-30).astype(jnp.int32) + seg).reshape(-1)
            ops = lax.sort((kf,) + tuple(buf_[:, i].reshape(-1)
                                         for i in range(n_out + 1)),
                           dimension=0, num_keys=1, is_stable=False)
            return sum(o.reshape(b, -1)[:, :p].ravel()[0]
                       for o in ops[1:])
        ops = lax.sort((idx_ + c * 1e-30,)
                       + tuple(buf_[:, i] for i in range(n_out + 1)),
                       dimension=1, num_keys=1, is_stable=False)
        return sum(o[:, :p].ravel()[0] for o in ops[1:])

    t = per_iter(unsort, (buf, idx_rows))
    print(f"bwd unsort            {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
