"""Experiment: weight-construction variants for the binned forward kernel.

The production kernel (since the hatrow adoption) builds the weighted row
matrix directly as a hat function,

    weight(pos) = relu(1 - |(r0 - pos) + dl|)

where ``r0 - pos`` is an exact small integer and ``dl`` an exact f32 — so
the construction is exact to f32, while the x side stays a pure {0, 1}
one-hot column pair (the exact bf16-split matmul contract).  This script
cross-checks and times the production kernel against two alternatives:

- ``onehot``: the pre-hatrow production design — per-branch one-hot ROW
  matrices from integer compares, multiplied by 4S precomputed bf16-split
  coefficient lane planes shipped from XLA.
- ``hat``: hat construction on BOTH sides (x too), 3 matmuls instead of 4
  but values on both matmul operands — measured ~1e-5 off the exact form
  (outside the parity budget; kept for the timing data point).

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


# ---------------------------------------------------------------------------
# legacy "onehot" variant (the pre-hatrow production kernel)
# ---------------------------------------------------------------------------


def _planes_fwd_onehot(data, ts, n_out):
    """lane: the S row targets (2D: iy0; 3D: 4 flat (z,y) stencil rows);
    lanev: the 4S bf16-split splat-coefficient lane rows (branch-major,
    x-neighbour fastest, then hi/lo halves); sub: the ix0 column."""
    f32 = jnp.float32
    ix0, dlx = sb._decode_coord(data[:, n_out - 1])
    w = data[:, n_out]
    if n_out == 2:
        iy0, dly = sb._decode_coord(data[:, 0])
        lane = [iy0.astype(f32)]
        coeffs = [(1 - dly) * w, dly * w]
    else:
        iz0, dlz = sb._decode_coord(data[:, 0])
        iy0, dly = sb._decode_coord(data[:, 1])
        lane, wzy = sb._flat_rows_3d(iz0, dlz, iy0, dly, ts)
        coeffs = [c * w for c in wzy]
    a_full = []
    for c in coeffs:
        a_full.append(c * (1 - dlx))
        a_full.append(c * dlx)
    hi_f32 = [lax.reduce_precision(a, 8, 7) for a in a_full]
    hi = [h.astype(jnp.bfloat16) for h in hi_f32]
    lo = [(a - h).astype(jnp.bfloat16) for a, h in zip(a_full, hi_f32)]
    return [jnp.stack(lane, axis=1),
            jnp.stack(hi + lo, axis=1)], ix0.astype(f32)[..., None]


def _fwd_kernel_onehot(st_ref, lane_ref, lanev_ref, sub_ref, ext_ref, *,
                       ts, chunk, halo, n_out):
    b = pl.program_id(0)
    s = pl.program_id(1)
    t_cur = st_ref[b, s]
    t_prev = st_ref[b, jnp.maximum(s - 1, 0)]
    first = jnp.logical_or(s == 0, t_cur != t_prev)

    cols_e = ts[-1] + (1 if halo else 0)
    lane = lane_ref[0]                                    # (S, C) f32
    if n_out == 2:
        rows_e = ts[0] + (1 if halo else 0)
        rows = [lane[0:1, :], lane[0:1, :] + 1]
    else:
        rows_e = (ts[0] + 1) * (ts[1] + 1)
        rows = [lane[i:i + 1, :] for i in range(4)]
    n_br = len(rows)
    iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)
    o_s = [(iota_r == r.astype(jnp.int32)).astype(jnp.bfloat16)
           for r in rows]

    lo, hi = sb._x_selects(sub_ref[0][:, 0:1], chunk, cols_e)
    xs = [lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)]

    vals = lanev_ref[0]                                   # (4S, C) bf16
    dims = (((1,), (0,)), ((), ()))
    acc = None
    for j in (0, 1):
        for half in (0, 1):
            m = None
            for i in range(n_br):
                a = vals[half * 2 * n_br + 2 * i + j:
                         half * 2 * n_br + 2 * i + j + 1, :]
                term = o_s[i] * a
                m = term if m is None else m + term
            part = lax.dot_general(m, xs[j], dims,
                                   preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part

    @pl.when(first)
    def _():
        ext_ref[0, 0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        ext_ref[0, 0] = ext_ref[0, 0] + acc


# ---------------------------------------------------------------------------
# both-sides "hat" variant (x side hat too; 3 matmuls, looser error)
# ---------------------------------------------------------------------------


def _planes_fwd_hat(data, ts, n_out):
    """Hat-kernel feeds: lane rows carry (r0_y, dl_y) [+ z planes in 3D]
    and w; sub carries (r0_x, dl_x) columns."""
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
    return [jnp.stack(lane, axis=1)], sub


def _fwd_kernel_hat(st_ref, lane_ref, sub_ref, ext_ref, *, ts,
                    chunk, halo, n_out):
    b = pl.program_id(0)
    s = pl.program_id(1)
    t_cur = st_ref[b, s]
    t_prev = st_ref[b, jnp.maximum(s - 1, 0)]
    first = jnp.logical_or(s == 0, t_cur != t_prev)

    cols_e = ts[-1] + (1 if halo else 0)
    lane = lane_ref[0]
    if n_out == 2:
        rows_e = ts[0] + (1 if halo else 0)
        iy0 = lane[0:1, :].astype(jnp.int32)               # (1, C)
        dly = lane[1:2, :]
        w = lane[2:3, :]
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
        iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)
        z_r = iota_r // tyq
        y_r = iota_r % tyq
        hz = jnp.maximum(1.0 - jnp.abs((iz0 - z_r).astype(jnp.float32)
                                       + dlz), 0.0)
        hy = jnp.maximum(1.0 - jnp.abs((iy0 - y_r).astype(jnp.float32)
                                       + dly), 0.0)
        m = hz * hy * w
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


def _planes_fwd_prod(data, ts, n_out):
    lane, sub = sb._planes_fwd(data, ts, n_out)
    return [lane], sub


def run(grid, p, b, interpret, chunk=0):
    n_out = len(grid)
    chunk = chunk or sb._default_chunk(grid, p)
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
        lanes, sub = jax.jit(
            lambda d: planes_fn(d, ts, n_out))(data[:, :n_out + 1])

        def f(sub_, st_, *lanes_):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, n_slots),
                in_specs=[pl.BlockSpec((1, ln.shape[1], chunk),
                                       lambda bb, s, st: (bb, 0, s),
                                       memory_space=pltpu.VMEM)
                          for ln in lanes_]
                + [pl.BlockSpec((1, chunk, sub_.shape[-1]),
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
            )(st_, *lanes_, sub_)

        ext = jax.jit(f)(sub, slot_tile, *lanes)
        ext.block_until_ready()
        if not interpret:
            t = per_iter(lambda c, su, st_, l0, *rest: f(
                su, st_, l0 + c * 1e-30, *rest),
                sub, slot_tile, *lanes)
            print(f"{label:10s} {t*1e3:8.2f} ms", flush=True)
        return ext

    ext_ref = call(sb._fwd_kernel, _planes_fwd_prod, "prod")
    ext_oh = call(_fwd_kernel_onehot, _planes_fwd_onehot, "onehot")
    ext_hat = call(_fwd_kernel_hat, _planes_fwd_hat, "hat")
    scale = float(jnp.maximum(jnp.max(jnp.abs(ext_ref)), 1e-9))
    err_oh = float(jnp.max(jnp.abs(ext_ref - ext_oh))) / scale
    err = float(jnp.max(jnp.abs(ext_ref - ext_hat))) / scale
    print(f"onehot vs prod normalized max err: {err_oh:.3e}", flush=True)
    print(f"hat    vs prod normalized max err: {err:.3e}", flush=True)
    assert err_oh < 1e-7, err_oh  # same exact-split contract
    assert err < 3e-5, err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="1024,1024")
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--chunk", type=int, default=0)
    args = ap.parse_args()
    grid = tuple(int(x) for x in args.grid.split(","))
    run(grid, args.points, args.batch, args.interpret, args.chunk)


if __name__ == "__main__":
    main()
